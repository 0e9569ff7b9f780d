"""dct_autoencoder_tpu — a TPU-native (JAX/XLA/Pallas/pjit) DCT-domain image
autoencoder framework.

Re-implements, TPU-first, the capabilities of the reference DCT autoencoder
(`dct-autoencoder`): IPT colorspace + whole-image orthonormal 2-D DCT feature
extraction, importance-sampled variable-length patch tokens, NaViT-style
sequence packing, per-position Laplace patch normalization, a CLIP-architecture
transformer autoencoder with lookup-free quantization (LFQ) or classic VQ,
plus the surrounding training / data / distributed / tooling stack.

Layers (bottom-up):
  ops/       pure-JAX numerics: colorspace, matmul-form DCT, zigzag, masks, stats
  kernels/   Pallas TPU kernels for the hot ops (packed flash attention, ...)
  patches/   DCTPatches pytree container, feature extraction, sequence packing
  models/    patchnorm, transformer, LFQ/VQ quantizers, autoencoder, config
  parallel/  device mesh, shardings, collective-synced statistics
  data/      webdataset-compatible tar shard IO, streaming pipelines
  train/     loss assembly, optimizer, calibration, checkpointing, CLI
  tools/     parity/demo scripts (roundtrip, progressive decode, token dumps)
"""

__version__ = "0.1.0"

from .models.config import DCTAutoencoderConfig
from .models.autoencoder import DCTAutoencoder
from .models.factory import get_model_and_processor, get_max_seq_length
from .patches.container import DCTPatches
from .patches.extractor import DCTAutoencoderFeatureExtractor
from .pipeline import DCTPipeline

__all__ = [
    "DCTAutoencoderConfig",
    "DCTAutoencoder",
    "DCTPatches",
    "DCTAutoencoderFeatureExtractor",
    "DCTPipeline",
    "get_model_and_processor",
    "get_max_seq_length",
]
