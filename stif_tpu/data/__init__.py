from stif_tpu.data.datasets import (
    Vimeo7Dataset,
    AdobeDataset,
    AdobeArbitraryDataset,
    create_dataset,
)
from stif_tpu.data.collate import collate_fixed, collate_arbitrary_scale
from stif_tpu.data.loader import DataLoader, ShardedIterSampler

__all__ = [
    "Vimeo7Dataset",
    "AdobeDataset",
    "AdobeArbitraryDataset",
    "create_dataset",
    "collate_fixed",
    "collate_arbitrary_scale",
    "DataLoader",
    "ShardedIterSampler",
]
