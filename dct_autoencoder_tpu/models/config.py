"""Model configuration.

JSON-schema-compatible with the reference's HF config
(reference: dct_autoencoder/configuration_dct_autoencoder.py:5-41 and
conf/patch14-l.json): nested `encoder_config`/`decoder_config` blocks use
CLIPVisionConfig field names, so the reference's config files load unchanged.
No transformers dependency — plain dataclasses + json.
"""
from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass
class TransformerConfig:
    """CLIP-vision-style transformer stack config (subset of CLIPVisionConfig)."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    dropout: float = 0.0
    attention_dropout: float = 0.0
    # rematerialize each layer in the backward pass (jax.checkpoint): trades
    # ~30% more FLOPs for activation memory ~ O(layers) -> O(1)
    remat: bool = False
    # Megatron-style sequence parallelism: under a (data, model) mesh with
    # tensor parallelism, shard the residual stream's TOKEN axis over the
    # model axis between blocks, so layernorms/residual adds/dropout run on
    # s/tp tokens per chip and the TP all-reduce pair becomes
    # reduce-scatter + all-gather (same bytes, 1/tp activation memory).
    # Expressed as sharding constraints (models/transformer.py); XLA SPMD
    # inserts the collectives. Requires an active (data, model) mesh context.
    sequence_parallel: bool = False
    # int8 serving: build Int8Dense (dynamic per-token activation quant +
    # per-channel int8 weights on the int8 MXU path) instead of nn.Dense.
    # Use models/quant.quantize_model_for_serving to convert a trained model.
    quantize_int8: bool = False
    # 'weight_only' (bf16-rate matmuls, half weight HBM) or 'dynamic'
    # (both-operand int8 on the int8 MXU; see models/quant.py for measured
    # tradeoffs at patch14-L sizes)
    quantize_int8_mode: str = "weight_only"
    # layer indices kept as plain bf16 nn.Dense even when quantize_int8 —
    # the int8 sensitivity lever (docs/int8_study_r3.md): EARLY encoder
    # layers dominate token flips (quant noise amplifies through the stack),
    # so protect low indices first
    quantize_int8_bf16_layers: tuple = ()
    # >0: group-wise weight scales over the input dim (one scale per
    # (group_size, out-channel) block) — cuts the weight rounding error, the
    # dominant flip source (docs/int8_study_r3.md)
    quantize_int8_group_size: int = 0

    def __post_init__(self):
        # keep hashable for flax-module attribute equality / jit staticness
        self.quantize_int8_bf16_layers = tuple(self.quantize_int8_bf16_layers)

    @classmethod
    def from_dict(cls, d: dict) -> "TransformerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["model_type"] = "clip_vision_model"
        return d


@dataclasses.dataclass
class DCTAutoencoderConfig:
    image_channels: int = 3
    patch_size: int = 16
    max_patch_h: int = 32
    max_patch_w: int = 32
    # VQ params
    vq_codebook_size: int = 4096
    # number of codebooks/heads: codes per patch
    vq_num_codebooks: int = 8
    # 'lfq' or 'vq'
    vq_type: str = "lfq"
    encoder_config: TransformerConfig = dataclasses.field(default_factory=TransformerConfig)
    decoder_config: TransformerConfig = dataclasses.field(default_factory=TransformerConfig)
    # attention-mask semantics: 'block' applies the packed block-diagonal mask
    # additively (-inf outside the block); 'bias' replicates the reference's
    # effective behavior of adding the boolean mask (+1.0 inside the block) to
    # the logits (reference modeling_dct_autoencoder.py:143-147 passes a bool
    # mask where HF CLIP expects an additive float mask).
    attn_mask_mode: str = "block"
    # attention kernel: 'auto' (pallas on TPU, xla elsewhere) | 'pallas' | 'xla'
    attention_impl: str = "auto"

    def __post_init__(self):
        if isinstance(self.encoder_config, dict):
            self.encoder_config = TransformerConfig.from_dict(self.encoder_config)
        if isinstance(self.decoder_config, dict):
            self.decoder_config = TransformerConfig.from_dict(self.decoder_config)

    @property
    def patch_dim(self) -> int:
        return self.patch_size**2

    @classmethod
    def from_dict(cls, d: dict) -> "DCTAutoencoderConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_json_file(cls, path: str) -> "DCTAutoencoderConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["encoder_config"] = self.encoder_config.to_dict()
        d["decoder_config"] = self.decoder_config.to_dict()
        return d

    def to_json_file(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)


def with_sequence_parallel(cfg: DCTAutoencoderConfig) -> DCTAutoencoderConfig:
    """The config with Megatron-SP turned on for BOTH transformer stacks
    (see TransformerConfig.sequence_parallel; one shared helper so the CLI,
    the dryrun, and tests cannot diverge)."""
    return dataclasses.replace(
        cfg,
        encoder_config=dataclasses.replace(cfg.encoder_config, sequence_parallel=True),
        decoder_config=dataclasses.replace(cfg.decoder_config, sequence_parallel=True),
    )
