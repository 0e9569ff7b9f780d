"""DCT autoencoder model: patch embed -> CLIP encoder -> quantizer -> CLIP decoder.

TPU-native counterpart of the reference model
(reference: dct_autoencoder/modeling_dct_autoencoder.py:15-200):
  * factorized learned positional embeddings indexed by (channel, patch-row,
    patch-col) (reference :41-59, gathered at :90-112);
  * patch embed = Linear(no bias) + LayerNorm(eps 1e-4) (reference :61-64);
  * two CLIP-architecture transformer stacks (reference :66-68, :81-83);
  * LFQ (default) or classic VQ bottleneck (reference :70-79);
  * proj_out = LayerNorm(eps 1e-4) + Linear(no bias) (reference :85-88).

`DCTAutoencoderModule` is the pure flax module (jit/pjit-friendly; everything
static-shaped).  `DCTAutoencoder` is a thin stateful wrapper owning params +
patchnorm state with the reference's OO API surface (normalize_, encode,
decode, decode_from_codes, forward, save/load).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.stats import compute_entropy_loss
from ..patches.container import DCTPatches
from .config import DCTAutoencoderConfig
from .lfq import LFQ
from .patchnorm import (
    PatchNormState,
    apply_patchnorm,
    inverse_patchnorm,
)
from .transformer import AttentionContext, TransformerEncoder
from .vq import VectorQuantize


class DCTAutoencoderModule(nn.Module):
    config: DCTAutoencoderConfig
    dtype: jnp.dtype = jnp.float32
    # GPipe pipeline parallelism for both transformer stacks
    # (parallel.pipeline.PipelineSpec; None = sequential stacks)
    pipeline: Optional[Any] = None

    def setup(self):
        cfg = self.config
        feature_dim = cfg.encoder_config.hidden_size
        patch_dim = cfg.patch_dim
        randn = nn.initializers.normal(stddev=1.0)

        # factorized learned position embeddings (reference modeling...py:41-59)
        self.encoder_pos_embed_channel = self.param(
            "encoder_pos_embed_channel", randn, (cfg.image_channels, feature_dim)
        )
        self.encoder_pos_embed_height = self.param(
            "encoder_pos_embed_height", randn, (cfg.max_patch_h, feature_dim)
        )
        self.encoder_pos_embed_width = self.param(
            "encoder_pos_embed_width", randn, (cfg.max_patch_w, feature_dim)
        )
        self.decoder_pos_embed_channel = self.param(
            "decoder_pos_embed_channel", randn, (cfg.image_channels, feature_dim)
        )
        self.decoder_pos_embed_height = self.param(
            "decoder_pos_embed_height", randn, (cfg.max_patch_h, feature_dim)
        )
        self.decoder_pos_embed_width = self.param(
            "decoder_pos_embed_width", randn, (cfg.max_patch_w, feature_dim)
        )

        self.patch_embed_linear = nn.Dense(feature_dim, use_bias=False, dtype=self.dtype)
        self.patch_embed_norm = nn.LayerNorm(epsilon=1e-4, dtype=self.dtype)

        self.encoder = TransformerEncoder(
            cfg.encoder_config, dtype=self.dtype, pipeline=self.pipeline
        )
        self.decoder = TransformerEncoder(
            cfg.decoder_config, dtype=self.dtype, pipeline=self.pipeline
        )

        if cfg.vq_type == "lfq":
            self.vq_model = LFQ(
                dim=feature_dim,
                codebook_size=cfg.vq_codebook_size,
                num_codebooks=cfg.vq_num_codebooks,
            )
        elif cfg.vq_type == "vq":
            # reference settings: modeling_dct_autoencoder.py:77 —
            # kmeans_init=True, sample_codebook_temp=20, codebook_dim=16,
            # learnable_codebook=True (gradient codebook), affine_param=True,
            # ema_update=False, threshold_ema_dead_code=15
            self.vq_model = VectorQuantize(
                dim=feature_dim,
                codebook_size=cfg.vq_codebook_size,
                heads=cfg.vq_num_codebooks,
                codebook_dim=16,
                sample_codebook_temp=20.0,
                affine_param=True,
                kmeans_init=True,
                threshold_ema_dead_code=15.0,
            )
        else:
            raise ValueError(cfg.vq_type)

        self.proj_out_norm = nn.LayerNorm(epsilon=1e-4, dtype=self.dtype)
        self.proj_out_linear = nn.Dense(cfg.patch_dim, use_bias=False, dtype=self.dtype)

    # ----------------------------------------------------------------- parts

    def _pos_embedding(self, prefix: str, x: DCTPatches) -> jnp.ndarray:
        c_pos = getattr(self, f"{prefix}_pos_embed_channel")[x.patch_channels]
        h_pos = getattr(self, f"{prefix}_pos_embed_height")[x.h_indices]
        w_pos = getattr(self, f"{prefix}_pos_embed_width")[x.w_indices]
        return (c_pos + h_pos + w_pos).astype(self.dtype)

    def encode(
        self, dct_patches: DCTPatches, training: bool = True
    ) -> Tuple[DCTPatches, jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Normalized patches -> quantized features (reference modeling...py:129-155).

        Returns (patches, codes, commit_loss, distances, vq_z).  vq_z is the
        pre-quantization projection (b, s, heads, codebook_dim) in VQ mode
        (feeding k-means init / dead-code expiry in the train step), None for
        LFQ.  In VQ mode an rng in the 'vq' stream enables gumbel sampling at
        temperature 20 (reference vector_quantize.py:61-98); pass
        rngs={'vq': key} to apply."""
        x = dct_patches
        feats = self.patch_embed_norm(self.patch_embed_linear(x.patches.astype(self.dtype)))
        feats = feats + self._pos_embedding("encoder", x)

        attn = self._attn_context(x)
        feats = self.encoder(feats, attn, deterministic=not training)

        mask = ~x.key_pad_mask
        vq_z = None
        if self.config.vq_type == "vq":
            rng = self.make_rng("vq") if self.has_rng("vq") else None
            feats, codes, commit_loss, vq_z = self.vq_model(
                feats, mask=mask, training=training, rng=rng
            )
            distances = jnp.zeros((), dtype=feats.dtype)
        else:
            feats, codes, commit_loss, distances = self.vq_model(
                feats, mask=mask, training=training
            )
        return x.replace(patches=feats), codes, commit_loss, distances, vq_z

    def _attn_context(self, x: DCTPatches) -> AttentionContext:
        return AttentionContext(
            image_ids=x.batched_image_ids,
            key_pad_mask=x.key_pad_mask,
            mode=self.config.attn_mask_mode,
            impl=self.config.attention_impl,
        )

    def decode(self, x: DCTPatches) -> DCTPatches:
        """Quantized features -> DCT patch predictions (reference modeling...py:165-178)."""
        feats = x.patches.astype(self.dtype) + self._pos_embedding("decoder", x)
        feats = self.decoder(feats, self._attn_context(x))
        feats = self.proj_out_linear(self.proj_out_norm(feats))
        return x.replace(patches=feats)

    def decode_from_codes(self, codes: jnp.ndarray, dct_patches: DCTPatches) -> DCTPatches:
        """Token indices -> decoded patches (reference modeling...py:157-163).

        `dct_patches` supplies the packing metadata (masks/positions/channels).
        """
        feats = self.vq_model.indices_to_codes(codes)
        return self.decode(dct_patches.replace(patches=feats))

    def __call__(self, dct_patches: DCTPatches, training: bool = True) -> Dict[str, Any]:
        x, codes, commit_loss, distances, vq_z = self.encode(dct_patches, training=training)
        x = self.decode(x)
        out = dict(
            dct_patches=x,
            commit_loss=commit_loss,
            codes=codes,
            distances=distances,
        )
        if vq_z is not None:
            out["vq_z"] = vq_z
        return out


class DCTAutoencoder:
    """Stateful wrapper with the reference's API surface.

    Holds (module, params, patchnorm state).  Jitted apply functions are cached
    per (method, training) pair; shapes are static thanks to packing.
    """

    def __init__(
        self,
        config: DCTAutoencoderConfig,
        params: Optional[Any] = None,
        patchnorm: Optional[PatchNormState] = None,
        dtype: jnp.dtype = jnp.float32,
        seed: int = 0,
    ):
        self.config = config
        self.dtype = dtype
        self.module = DCTAutoencoderModule(config, dtype=dtype)
        self.patchnorm = patchnorm or PatchNormState.create(
            config.image_channels, config.max_patch_h, config.max_patch_w, config.patch_dim
        )
        self.patchnorm_frozen = True
        # non-param model state: VQ EMA affine/usage stats ({} for LFQ)
        self.vq_stats: Dict[str, Any] = {}
        if params is None:
            params = self.init_params(jax.random.PRNGKey(seed))
        self.params = params
        self._jit_cache: Dict[Any, Any] = {}

    def init_params(self, rng) -> Any:
        cfg = self.config
        s = 16
        dummy = DCTPatches(
            patches=jnp.zeros((1, s, cfg.patch_dim), dtype=jnp.float32),
            key_pad_mask=jnp.zeros((1, s), dtype=bool),
            attn_mask=jnp.ones((1, 1, s, s), dtype=bool),
            batched_image_ids=jnp.zeros((1, s), dtype=jnp.int32),
            patch_channels=jnp.zeros((1, s), dtype=jnp.int32),
            patch_positions=jnp.zeros((1, s, 2), dtype=jnp.int32),
        )
        variables = self.module.init(rng, dummy, training=False)
        self.vq_stats = variables.get("vq_stats", {})
        return variables["params"]

    @property
    def n_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))

    # ------------------------------------------------------------- patchnorm

    def normalize_(self, x: DCTPatches) -> DCTPatches:
        # jitted: the eager path dispatches ~a dozen ops per call, which is
        # brutal over remote-dispatch links
        if "normalize" not in self._jit_cache:
            self._jit_cache["normalize"] = jax.jit(apply_patchnorm)
        return x.replace(patches=self._jit_cache["normalize"](self.patchnorm, x))

    def inv_normalize_(self, x: DCTPatches) -> DCTPatches:
        if "inv_normalize" not in self._jit_cache:
            self._jit_cache["inv_normalize"] = jax.jit(inverse_patchnorm)
        return x.replace(patches=self._jit_cache["inv_normalize"](self.patchnorm, x))

    # ----------------------------------------------------------------- apply

    def _jitted(self, name: str, training: bool):
        # vq_stats ride along read-only (they parameterize the VQ affine
        # transform at inference; empty dict for LFQ)
        key = (name, training)
        if key not in self._jit_cache:
            if name == "forward":
                fn = lambda params, vq_stats, batch: self.module.apply(
                    {"params": params, "vq_stats": vq_stats}, batch, training=training
                )
            elif name == "encode":
                fn = lambda params, vq_stats, batch: self.module.apply(
                    {"params": params, "vq_stats": vq_stats},
                    batch,
                    training=training,
                    method="encode",
                )
            elif name == "decode":
                fn = lambda params, vq_stats, batch: self.module.apply(
                    {"params": params, "vq_stats": vq_stats}, batch, method="decode"
                )
            elif name == "decode_from_codes":
                fn = lambda params, vq_stats, codes, batch: self.module.apply(
                    {"params": params, "vq_stats": vq_stats},
                    codes,
                    batch,
                    method="decode_from_codes",
                )
            else:
                raise KeyError(name)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def forward(self, batch: DCTPatches, training: bool = False) -> Dict[str, Any]:
        return self._jitted("forward", training)(self.params, self.vq_stats, batch)

    __call__ = forward

    def encode(self, batch: DCTPatches, training: bool = False):
        return self._jitted("encode", training)(self.params, self.vq_stats, batch)

    def decode(self, batch: DCTPatches) -> DCTPatches:
        return self._jitted("decode", False)(self.params, self.vq_stats, batch)

    def decode_from_codes(self, codes: jnp.ndarray, **dct_patches_kwargs) -> DCTPatches:
        x = DCTPatches(patches=jnp.zeros(()), **dct_patches_kwargs)
        return self._jitted("decode_from_codes", False)(
            self.params, self.vq_stats, codes, x
        )

    def entropy_loss(self, distances: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        return compute_entropy_loss(distances, mask)

    # ------------------------------------------------------------ checkpoint

    def save_pretrained(self, path: str) -> None:
        """Save config + params + patchnorm as config.json + npz bundles."""
        os.makedirs(path, exist_ok=True)
        self.config.to_json_file(os.path.join(path, "config.json"))
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        arrs = {self._path_str(p): np.asarray(v) for p, v in flat}
        np.savez(os.path.join(path, "params.npz"), **arrs)
        np.savez(
            os.path.join(path, "patchnorm.npz"),
            n=np.asarray(self.patchnorm.n),
            median=np.asarray(self.patchnorm.median),
            b=np.asarray(self.patchnorm.b),
        )
        if self.vq_stats:
            flat_vq = jax.tree_util.tree_flatten_with_path(self.vq_stats)[0]
            np.savez(
                os.path.join(path, "vq_stats.npz"),
                **{self._path_str(p): np.asarray(v) for p, v in flat_vq},
            )

    @staticmethod
    def _path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p))
        return "/".join(parts)

    @classmethod
    def from_pretrained(cls, path: str, dtype: jnp.dtype = jnp.float32) -> "DCTAutoencoder":
        config = DCTAutoencoderConfig.from_json_file(os.path.join(path, "config.json"))
        model = cls(config, dtype=dtype)
        loaded = np.load(os.path.join(path, "params.npz"))
        flat, treedef = jax.tree_util.tree_flatten_with_path(model.params)
        new_leaves = []
        for p, old in flat:
            key = cls._path_str(p)
            if key in loaded and loaded[key].shape == old.shape:
                new_leaves.append(jnp.asarray(loaded[key]))
            else:
                # parity with from_pretrained(ignore_mismatched_sizes=True)
                new_leaves.append(old)
        model.params = jax.tree_util.tree_unflatten(treedef, new_leaves)
        pn_path = os.path.join(path, "patchnorm.npz")
        if os.path.exists(pn_path):
            pn = np.load(pn_path)
            model.patchnorm = PatchNormState(
                n=jnp.asarray(pn["n"]), median=jnp.asarray(pn["median"]), b=jnp.asarray(pn["b"])
            )
        vq_path = os.path.join(path, "vq_stats.npz")
        if os.path.exists(vq_path) and model.vq_stats:
            loaded_vq = np.load(vq_path)
            flat_vq, treedef_vq = jax.tree_util.tree_flatten_with_path(model.vq_stats)
            leaves = []
            for p, old in flat_vq:
                key = cls._path_str(p)
                if key in loaded_vq and loaded_vq[key].shape == old.shape:
                    leaves.append(jnp.asarray(loaded_vq[key]))
                else:
                    leaves.append(old)
            model.vq_stats = jax.tree_util.tree_unflatten(treedef_vq, leaves)
        return model
