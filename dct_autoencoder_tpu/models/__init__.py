from .config import DCTAutoencoderConfig, TransformerConfig
from .autoencoder import DCTAutoencoder, DCTAutoencoderModule
from .patchnorm import (
    PatchNormState,
    apply_patchnorm,
    inverse_patchnorm,
    calibrate_patchnorm_batch,
    update_patchnorm,
)
from .lfq import LFQ
from .vq import VectorQuantize, EMACodebookState, ema_codebook_update, kmeans_init_codebook
from .factory import get_model_and_processor, get_max_seq_length, power_of_two

__all__ = [
    "DCTAutoencoderConfig",
    "TransformerConfig",
    "DCTAutoencoder",
    "DCTAutoencoderModule",
    "PatchNormState",
    "apply_patchnorm",
    "inverse_patchnorm",
    "calibrate_patchnorm_batch",
    "update_patchnorm",
    "LFQ",
    "VectorQuantize",
    "EMACodebookState",
    "ema_codebook_update",
    "kmeans_init_codebook",
    "get_model_and_processor",
    "get_max_seq_length",
    "power_of_two",
]
