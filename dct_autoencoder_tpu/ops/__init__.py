from .colorspace import rgb_to_ipt, ipt_to_rgb, rgb_to_ycbcr, ycbcr_to_rgb, rgb_to_lms, lms_to_rgb
from .dct import dct_matrix, dct2, idct2, dct1d, idct1d
from .zigzag import zigzag, flatten_zigzag, unflatten_zigzag
from .stats import masked_mean, compute_entropy_loss, calculate_perplexity

__all__ = [
    "rgb_to_ipt", "ipt_to_rgb", "rgb_to_ycbcr", "ycbcr_to_rgb",
    "rgb_to_lms", "lms_to_rgb",
    "dct_matrix", "dct2", "idct2", "dct1d", "idct1d",
    "zigzag", "flatten_zigzag", "unflatten_zigzag",
    "masked_mean", "compute_entropy_loss", "calculate_perplexity",
]
