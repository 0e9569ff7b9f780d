from .container import DCTPatches, to_dict, from_dict
from .extractor import DCTAutoencoderFeatureExtractor
from .packing import GroupPatchesState, group_patches_by_max_seq_len, batch_groups

__all__ = [
    "DCTPatches",
    "to_dict",
    "from_dict",
    "DCTAutoencoderFeatureExtractor",
    "GroupPatchesState",
    "group_patches_by_max_seq_len",
    "batch_groups",
]
