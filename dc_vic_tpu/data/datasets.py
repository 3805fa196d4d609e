"""Image datasets (ref: src/dataset/).

Host-side PIL/numpy pipeline producing NHWC float32 in [-1, 1] (the
reference's Normalize(.5, .5) convention, ref: src/dataset/data_transform.py).
Train transform: optional random resize -> random crop (reflect-pad when the
image is smaller) -> horizontal flip. Eval: full image.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..utils.registry import DATASET_REGISTRY

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(root: str) -> List[str]:
    out = []
    for name in sorted(os.listdir(root)):
        if name.lower().endswith(IMG_EXTS):
            out.append(os.path.join(root, name))
    return out


def load_image(path: str) -> np.ndarray:
    """-> float32 HWC in [-1, 1]."""
    img = Image.open(path).convert("RGB")
    x = np.asarray(img, dtype=np.float32) / 255.0
    return (x - 0.5) * 2.0


def random_resize(x: np.ndarray, rng: np.random.Generator,
                  resize_range: Tuple[float, float]) -> np.ndarray:
    scale = rng.uniform(*resize_range)
    h, w = x.shape[:2]
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    img = Image.fromarray(((x / 2 + 0.5) * 255).astype(np.uint8))
    img = img.resize((nw, nh), Image.BILINEAR)
    return (np.asarray(img, dtype=np.float32) / 255.0 - 0.5) * 2.0


def random_crop(x: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = x.shape[:2]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = x.shape[:2]
    top = rng.integers(0, h - size + 1)
    left = rng.integers(0, w - size + 1)
    return x[top:top + size, left:left + size]


class BaseImageDataset:
    """Indexable dataset of image files with the reference transforms."""

    def __init__(self, paths: Sequence[str], image_size: Optional[int] = None,
                 resize_range: Optional[Tuple[float, float]] = None,
                 is_train: bool = True):
        self.paths = list(paths)
        self.image_size = image_size
        self.resize_range = resize_range
        self.is_train = is_train

    def __len__(self) -> int:
        return len(self.paths)

    def get(self, idx: int, rng: Optional[np.random.Generator] = None
            ) -> Dict[str, np.ndarray]:
        x = load_image(self.paths[idx])
        if self.is_train:
            assert rng is not None
            if self.resize_range:
                x = random_resize(x, rng, tuple(self.resize_range))
            if self.image_size:
                x = random_crop(x, self.image_size, rng)
            if rng.random() < 0.5:
                x = x[:, ::-1].copy()
        return {"real_images": x, "path": self.paths[idx]}


@DATASET_REGISTRY.register("openimage_ImageDataset")
class OpenImageImageDataset(BaseImageDataset):
    """OpenImages train_{i} jpg subsets / validation split
    (ref: src/dataset/openimage_dataset.py:15-33)."""

    def __init__(self, root_dir: str, subset_list: Optional[Sequence[int]] = None,
                 image_size: int = 256, resize_range=None, is_train: bool = True):
        paths: List[str] = []
        if is_train:
            for i in subset_list or []:
                sub = os.path.join(root_dir, f"train_{i}")
                if os.path.isdir(sub):
                    paths.extend(list_images(sub))
        else:
            val = os.path.join(root_dir, "validation")
            paths = list_images(val if os.path.isdir(val) else root_dir)
        super().__init__(paths, image_size=image_size,
                         resize_range=resize_range, is_train=is_train)


@DATASET_REGISTRY.register("Kodak_ImageDataset")
class KodakImageDataset(BaseImageDataset):
    """Kodak eval set (ref: src/dataset/kodak_dataset.py:16-26)."""

    def __init__(self, root_dir: str, is_train: bool = False, **kw):
        assert not is_train, "Kodak is evaluation-only"
        super().__init__(list_images(root_dir), is_train=False)


def build_dataset(cfg: Dict, is_train: bool):
    """Keyed by name+type (ref: src/dataset/__init__.py:24-39)."""
    cfg = dict(cfg)
    name = cfg.pop("name")
    dtype = cfg.pop("type", "ImageDataset")
    key = f"{name}_{dtype}"
    return DATASET_REGISTRY.get(key)(is_train=is_train, **cfg)
