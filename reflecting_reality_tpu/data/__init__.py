from reflecting_reality_tpu.data.loader import DataLoader, collate, prefetch_to_device
from reflecting_reality_tpu.data.synmirror import (
    HDF5Dataset, MSDDataset, apply_transforms_depth, apply_transforms_mask,
    apply_transforms_normals, apply_transforms_rgb, extract_data_from_hdf5,
)
from reflecting_reality_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer

__all__ = [
    "CLIPTokenizer", "DataLoader", "HDF5Dataset", "HashTokenizer", "MSDDataset",
    "apply_transforms_depth", "apply_transforms_mask", "apply_transforms_normals",
    "apply_transforms_rgb", "collate", "extract_data_from_hdf5",
    "prefetch_to_device",
]
