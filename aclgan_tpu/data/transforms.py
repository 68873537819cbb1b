"""Image transforms matching the reference's torchvision pipeline.

Train: RandomHorizontalFlip -> Resize(shortest side) -> RandomCrop(h, w)
       -> ToTensor -> Normalize(0.5, 0.5)  (utils.py:76-100; note the list is
       built back-to-front there, so flip runs first).
Test loaders use the same chain with crop size = new_size (utils.py:58-63).
Inference (test CLI) resizes without cropping (test.py:89-91).

Decode/resize/crop/flip use the native C++ fast path (aclgan_tpu.data.native)
when built, PIL otherwise — value-identical. Normalization to [-1, 1] float:
the default loaders emit raw uint8 (tpu.uint8_transfer) and normalize
IN-GRAPH (trainer.to_model_range); the float32-emit path normalizes the
assembled batch here in numpy (normalize_batch — the native
aclgan_normalize_batch binding exists and is tested but is deliberately not
wired in, so the bitwise uint8==float32 contract never depends on the C
compiler's FMA choices). NHWC out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
from PIL import Image


@dataclass(frozen=True)
class TransformSpec:
    new_size: Optional[int]    # resize shortest side to this (None = no resize)
    crop_h: Optional[int]      # random-crop target (None = no crop)
    crop_w: Optional[int]
    flip: bool                 # random horizontal flip (train only)


def resize_shortest(img: Image.Image, new_size: Optional[int]) -> Image.Image:
    """torchvision Resize(int): shortest side -> new_size, bilinear.

    None skips the resize (same convention as TransformSpec.new_size=None).
    The long side TRUNCATES (int(), not round()) exactly as torchvision's
    F.resize does — round() deviated by 1px on ~half of aspect ratios
    (native/aclgan_data.cpp matches)."""
    if new_size is None:
        return img
    w, h = img.size
    if w <= h:
        ow = new_size
        oh = max(1, int(new_size * h / w))
    else:
        oh = new_size
        ow = max(1, int(new_size * w / h))
    if (ow, oh) == (w, h):
        return img
    return img.resize((ow, oh), Image.BILINEAR)


def apply_transform(
    img: Image.Image, spec: TransformSpec, rng: np.random.Generator
) -> np.ndarray:
    """PIL image -> (H, W, 3) uint8 after flip/resize/crop."""
    if spec.flip and rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if spec.new_size is not None:
        img = resize_shortest(img, spec.new_size)
    arr = np.asarray(img, dtype=np.uint8)
    if spec.crop_h is not None:
        h, w = arr.shape[:2]
        th, tw = spec.crop_h, spec.crop_w
        if h < th or w < tw:  # torchvision RandomCrop would raise; pad-to-fit instead
            pad_h, pad_w = max(0, th - h), max(0, tw - w)
            arr = np.pad(arr, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            h, w = arr.shape[:2]
        top = int(rng.integers(0, h - th + 1))
        left = int(rng.integers(0, w - tw + 1))
        arr = arr[top:top + th, left:left + tw]
    return arr


def normalize_batch(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 NHWC -> float32 in [-1, 1] (ToTensor + Normalize(.5,.5))."""
    return batch_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
