from .colorspace import rgb_to_ipt, ipt_to_rgb, rgb_to_ycbcr, ycbcr_to_rgb, rgb_to_lms, lms_to_rgb
from .dct import dct_matrix, dct2, idct2, dct1d, idct1d
from .zigzag import zigzag, flatten_zigzag, unflatten_zigzag
from .stats import (
    masked_mean,
    compute_entropy_loss,
    calculate_perplexity,
    pad_sequence,
    ema_update_2d,
    get_decay_fn,
)
from .masks import (
    get_circular_mask,
    get_square_dct_basis,
    get_upper_left_tri,
    get_upper_left_tri_p,
    get_upper_left_tri_p_w_channel_preferences,
    gkern,
)

__all__ = [
    "rgb_to_ipt", "ipt_to_rgb", "rgb_to_ycbcr", "ycbcr_to_rgb",
    "rgb_to_lms", "lms_to_rgb",
    "dct_matrix", "dct2", "idct2", "dct1d", "idct1d",
    "zigzag", "flatten_zigzag", "unflatten_zigzag",
    "masked_mean", "compute_entropy_loss", "calculate_perplexity",
    "pad_sequence", "ema_update_2d", "get_decay_fn",
    "get_circular_mask", "get_square_dct_basis", "get_upper_left_tri",
    "get_upper_left_tri_p", "get_upper_left_tri_p_w_channel_preferences", "gkern",
]
