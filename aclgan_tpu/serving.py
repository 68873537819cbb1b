"""Serving API: checkpointed generator behind a fixed-shape jitted callable.

The reference's only inference surface is per-image CLI scripts
(test.py/test_batch.py). For deployment this wraps a generator checkpoint as
a `Translator`: fixed (batch, H, W) compiled once, uint8-in/uint8-out, with
automatic resize, batch padding (static shapes — no recompiles at serve
time), and style control (random, fixed seed, or style image).

    tr = Translator("configs/male2female.yaml", "gen_00350000.msgpack")
    outs = tr(list_of_uint8_images)            # list of HxWx3 uint8
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from aclgan_tpu.config import Config, load_config
from aclgan_tpu.data.transforms import normalize_batch, resize_shortest
from aclgan_tpu.trainer import ACLGAN


class Translator:
    def __init__(
        self,
        config: Union[str, Config],
        checkpoint: str,
        a2b: bool = True,
        batch_size: int = 8,
        size: Optional[int] = None,
        seed: int = 0,
    ):
        cfg = load_config(config) if isinstance(config, str) else config
        self.cfg = cfg
        self.a2b = a2b
        self.batch_size = batch_size
        size_a, size_b = cfg.data.resolved_sizes()
        self.size = size or (size_a if a2b else size_b) or 256
        self.model = ACLGAN(cfg)

        from aclgan_tpu.cli.test import load_generator_params

        self.gen_params = load_generator_params(checkpoint, self.model)
        self._key = jax.random.PRNGKey(seed)

        model = self.model

        @jax.jit
        def _translate(params, x, z):
            img, mask = model.translate(params, x, z, a2b=a2b)
            img01 = jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
            return img01.astype(jnp.uint8), mask

        self._translate = _translate

    # ------------------------------------------------------------------
    def encode_style(self, style_image: np.ndarray) -> np.ndarray:
        """Style code from a reference image (test.py:99-101)."""
        arr = self._prep(style_image)
        x = jnp.asarray(normalize_batch(arr[None]))
        key = "AB" if self.a2b else "BA"
        _, s = self.model.gen_encode(self.gen_params[key],
                                     x.astype(self.model.dtype))
        return np.asarray(s)

    def _prep(self, img: np.ndarray) -> np.ndarray:
        """uint8 HWC -> square (size, size) center crop after shortest-side resize."""
        pil = Image.fromarray(np.asarray(img, np.uint8))
        pil = resize_shortest(pil, self.size)
        arr = np.asarray(pil, np.uint8)
        h, w = arr.shape[:2]
        top = (h - self.size) // 2
        left = (w - self.size) // 2
        return arr[top:top + self.size, left:left + self.size]

    def __call__(
        self,
        images: Sequence[np.ndarray],
        styles: Optional[np.ndarray] = None,
        return_masks: bool = False,
    ):
        """Translate a list of uint8 HWC images. Batches are padded to the
        compiled batch size; one style per image (random if None)."""
        n = len(images)
        prepped = np.stack([self._prep(im) for im in images])
        if styles is None:
            self._key, sub = jax.random.split(self._key)
            styles = np.asarray(jax.random.normal(
                sub, (n, self.cfg.gen.style_dim)))
        styles = np.asarray(styles, np.float32)
        if styles.ndim == 1:
            styles = np.broadcast_to(styles[None], (n, styles.shape[0]))

        outs: List[np.ndarray] = []
        masks: List[np.ndarray] = []
        bs = self.batch_size
        for start in range(0, n, bs):
            chunk = prepped[start:start + bs]
            zc = styles[start:start + bs]
            pad = bs - chunk.shape[0]
            if pad:  # static shapes: pad the tail batch
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
                zc = np.concatenate([zc, np.repeat(zc[-1:], pad, 0)])
            x = jnp.asarray(normalize_batch(chunk))
            img_u8, mask = self._translate(self.gen_params, x, jnp.asarray(zc))
            img_u8 = np.asarray(img_u8)[:bs - pad if pad else bs]
            outs.extend(list(img_u8))
            if mask is not None:
                masks.extend(list(np.asarray(mask, np.float32)[:bs - pad if pad else bs]))
        if return_masks:
            return outs, (masks if masks else None)
        return outs
