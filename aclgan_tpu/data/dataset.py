"""Dataset listing + image decode (reference: data.py).

Folder mode recursively collects files by extension whitelist, sorted
(data.py:81-101 / 104-131); file-list mode reads relative paths from a text
file (data.py:14-24 / 27-44). Decoding converts to RGB (data.py:10-11).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image

IMG_EXTENSIONS = [
    ".jpg", ".JPG", ".jpeg", ".JPEG",
    ".png", ".PNG", ".ppm", ".PPM", ".bmp", ".BMP",
]  # data.py:81-84


def is_image_file(filename: str) -> bool:
    return any(filename.endswith(ext) for ext in IMG_EXTENSIONS)


def list_images_folder(root: str) -> List[str]:
    """Recursive, sorted walk collecting image paths (data.py:87-101)."""
    images: List[str] = []
    if not os.path.isdir(root):
        raise RuntimeError(f"{root} is not a directory")
    for dirpath, _, fnames in sorted(os.walk(root)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                images.append(os.path.join(dirpath, fname))
    if not images:
        raise RuntimeError(f"Found 0 images in: {root}")
    return images


def list_images_filelist(root: str, list_path: str) -> List[str]:
    """Paths from a text file, one per line, joined onto root (data.py:14-24)."""
    with open(list_path, "r") as f:
        return [os.path.join(root, line.strip()) for line in f if line.strip()]


def load_image(path: str) -> Image.Image:
    """PIL open + RGB convert (default_loader, data.py:10-11)."""
    return Image.open(path).convert("RGB")


def load_image_array(path: str) -> np.ndarray:
    """Decode to an (H, W, 3) uint8 array."""
    return np.asarray(load_image(path), dtype=np.uint8)
