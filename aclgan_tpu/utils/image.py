"""Image grid + save utilities (replacing torchvision.utils make_grid/save_image).

__write_images (utils.py:115-124): expand grayscale rows to 3 channels, stack
all row-tensors, one grid with nrow=display_size, padding=0,
normalize=True (min-max over the whole grid), saved as jpg.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image


def _to_nhwc_f32(x) -> np.ndarray:
    arr = np.asarray(x, dtype=np.float32)
    if arr.ndim != 4:
        raise ValueError(f"expected NHWC batch, got {arr.shape}")
    if arr.shape[-1] == 1:  # grayscale (masks) -> 3 channels (utils.py:116)
        arr = np.repeat(arr, 3, axis=-1)
    return arr


def make_grid(images: np.ndarray, nrow: int, normalize: bool = True) -> np.ndarray:
    """(N, H, W, C) -> (rows*H, nrow*W, C) uint8 grid; min-max normalized over
    the whole tensor like vutils.make_grid(normalize=True), padding 0."""
    arr = _to_nhwc_f32(images)
    if normalize:
        # normalize BEFORE padding, as torchvision does (make_grid normalizes
        # the input tensor, then assembles with pad_value) — otherwise the
        # zero filler tiles of a ragged batch skew the min-max range
        lo, hi = float(arr.min()), float(arr.max())
        arr = (arr - lo) / max(hi - lo, 1e-5)
    n, h, w, c = arr.shape
    ncols = nrow
    nrows = (n + ncols - 1) // ncols
    if n < nrows * ncols:
        arr = np.concatenate([arr, np.zeros((nrows * ncols - n, h, w, c), np.float32)], 0)
    grid = arr.reshape(nrows, ncols, h, w, c).transpose(0, 2, 1, 3, 4).reshape(
        nrows * h, ncols * w, c)
    grid = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    return grid


def save_image(images: np.ndarray, path: str, nrow: int = 8, normalize: bool = True) -> None:
    grid = make_grid(images, nrow, normalize)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path, quality=95)


def write_2images(image_outputs: Sequence[np.ndarray], display_image_num: int,
                  image_directory: str, postfix: str) -> None:
    """One jpg per call: rows = each output tensor's first display_image_num
    images (write_2images + __write_images, utils.py:115-124 — despite the
    name, the reference writes a single gen_a2b_<postfix>.jpg)."""
    rows = [_to_nhwc_f32(np.asarray(t)[:display_image_num]) for t in image_outputs]
    stacked = np.concatenate(rows, axis=0)
    save_image(stacked, os.path.join(image_directory, f"gen_a2b_{postfix}.jpg"),
               nrow=display_image_num, normalize=True)
