from .datasets import (
    BaseImageDataset,
    KodakImageDataset,
    OpenImageImageDataset,
    build_dataset,
)
from .loader import HostDataLoader
