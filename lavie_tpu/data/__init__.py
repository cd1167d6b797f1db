from lavie_tpu.data.datasets import (
    MSVDDataset,
    MSRVTTDataset,
    UCF101Dataset,
    VideoFolderDataset,
)
from lavie_tpu.data.loader import DataLoader

__all__ = [
    "MSVDDataset",
    "MSRVTTDataset",
    "UCF101Dataset",
    "VideoFolderDataset",
    "DataLoader",
]
