"""Serving API: checkpointed generator behind fixed-shape jitted callables.

The reference's only inference surface is per-image CLI scripts
(test.py/test_batch.py). For deployment this wraps a generator checkpoint as:

- `Translator`: fixed (batch, H, W) compiled once, uint8-in/uint8-out, with
  automatic resize, batch padding (static shapes — no recompiles at serve
  time), and style control (random, fixed seed, or style image).
- `BucketedTranslator`: a fixed menu of square size buckets; each request
  image is routed to the nearest bucket, so mixed-size traffic compiles at
  most one executable per bucket and never again.
- `AsyncTranslator`: a request queue + worker thread that coalesces
  concurrent single-image requests into device batches (latency window +
  max batch), returning futures.

    tr = Translator("configs/male2female.yaml", "gen_00350000.msgpack")
    outs = tr(list_of_uint8_images)            # list of HxWx3 uint8

    srv = AsyncTranslator(BucketedTranslator(cfg, ckpt, buckets=(128, 256)))
    fut = srv.submit(img)                      # concurrent callers batched
    out = fut.result()
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Union

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
        # Requests are padded to this compiled batch, so it trades bulk
        # throughput against small-request latency/memory. Per-launch
        # overhead on the axon tunnel is ~70 ms and throughput rises with
        # batch until ~128 (measured at 256^2 on v5e: 619 img/s at batch
        # 64, 968.8 at 128, 959 at 256 — BENCH_NOTES); set 128 for bulk
        # translation, lower for latency-sensitive / large-image serving.
        batch_size: int = 32,
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

    def _prep(self, img: np.ndarray, size: Optional[int] = None) -> np.ndarray:
        """uint8 HWC -> square (size, size) center crop after shortest-side resize."""
        size = size or self.size
        pil = Image.fromarray(np.asarray(img, np.uint8))
        pil = resize_shortest(pil, size)
        arr = np.asarray(pil, np.uint8)
        h, w = arr.shape[:2]
        top = (h - size) // 2
        left = (w - size) // 2
        return arr[top:top + size, left:left + size]

    def random_style(self, n: int = 1) -> np.ndarray:
        """Draw n style codes from the serving RNG stream."""
        self._key, sub = jax.random.split(self._key)
        return np.asarray(jax.random.normal(sub, (n, self.cfg.gen.style_dim)))

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
        styles = self._resolve_styles(styles, n)
        outs, masks = self._run_batches(prepped, styles)
        if return_masks:
            return outs, (masks if masks else None)
        return outs

    def _resolve_styles(self, styles, n: int) -> np.ndarray:
        if styles is None:
            styles = self.random_style(n)
        styles = np.asarray(styles, np.float32)
        if styles.ndim == 1:
            styles = np.broadcast_to(styles[None], (n, styles.shape[0]))
        return styles

    def _run_batches(self, prepped: np.ndarray, styles: np.ndarray):
        """Feed same-size prepped images through the compiled step in padded
        fixed-size batches."""
        outs: List[np.ndarray] = []
        masks: List[np.ndarray] = []
        n = prepped.shape[0]
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
        return outs, masks


class BucketedTranslator(Translator):
    """Multi-size serving without per-size recompiles.

    A fixed menu of square `buckets` (each a multiple of the generator stride
    2**n_downsample); every request image is resized/cropped to its nearest
    bucket, and images are grouped per bucket before hitting the device. The
    jitted translate specializes per input shape, so steady-state traffic
    compiles exactly len(buckets) executables — call `warmup()` to pay that
    upfront. The reference CLI recompiles per odd-sized image; this replaces
    that with static shapes (SURVEY §2.8 + ROADMAP serving item).
    """

    def __init__(self, config, checkpoint, buckets: Sequence[int] = (128, 192, 256),
                 **kw):
        super().__init__(config, checkpoint, **kw)
        stride = 2 ** self.cfg.gen.n_downsample
        bad = [b for b in buckets if b % stride or b <= 0]
        if bad:
            raise ValueError(f"buckets {bad} not positive multiples of the "
                             f"generator stride {stride}")
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))

    def pick_bucket(self, img: np.ndarray) -> int:
        """Smallest bucket >= the image's shortest side; else the largest
        bucket (never upscale more than the menu requires)."""
        short = min(img.shape[0], img.shape[1])
        for b in self.buckets:
            if b >= short:
                return b
        return self.buckets[-1]

    def __call__(self, images, styles=None, return_masks: bool = False):
        n = len(images)
        styles = self._resolve_styles(styles, n)
        by_bucket: Dict[int, List[int]] = {}
        for i, im in enumerate(images):
            by_bucket.setdefault(self.pick_bucket(np.asarray(im)), []).append(i)

        outs: List[Optional[np.ndarray]] = [None] * n
        masks: List[Optional[np.ndarray]] = [None] * n
        got_masks = False
        for bucket, idxs in by_bucket.items():
            prepped = np.stack([self._prep(images[i], bucket) for i in idxs])
            o, m = self._run_batches(prepped, styles[idxs])
            for j, i in enumerate(idxs):
                outs[i] = o[j]
                if m:
                    masks[i] = m[j]
                    got_masks = True
        if return_masks:
            return outs, (masks if got_masks else None)
        return outs

    def warmup(self):
        """Compile every (bucket, batch_size) executable upfront."""
        for b in self.buckets:
            dummy = np.zeros((b, b, 3), np.uint8)
            self([dummy] * 1)

    def compiled_shapes(self) -> int:
        """Number of distinct executables compiled so far (one per bucket at
        steady state; tests assert no recompiles on repeat traffic)."""
        return self._translate._cache_size()


class AsyncTranslator:
    """Async request batching over a (Bucketed)Translator.

    Concurrent callers `submit()` single images and receive futures; a worker
    thread coalesces queued requests — up to `max_batch` or until
    `max_wait_ms` after the first request of a batch — into one device call.
    Throughput of the batched path at single-request latency ~max_wait_ms.
    """

    def __init__(self, translator: Translator, max_batch: Optional[int] = None,
                 max_wait_ms: float = 5.0):
        self.translator = translator
        self.max_batch = max_batch or translator.batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="aclgan-serve")
        self._worker.start()

    def submit(self, image: np.ndarray,
               style: Optional[np.ndarray] = None) -> Future:
        if self._stop.is_set():
            raise RuntimeError("AsyncTranslator is closed")
        fut: Future = Future()
        self._q.put((image, style, fut))
        return fut

    def translate(self, image: np.ndarray,
                  style: Optional[np.ndarray] = None) -> np.ndarray:
        return self.submit(image, style).result()

    def _loop(self):
        while True:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run(batch)

    def _run(self, batch):
        images = [np.asarray(im) for im, _, _ in batch]
        # mixed per-request styles: fill None slots from the serving RNG
        styles = np.stack([
            (s if s is not None else self.translator.random_style(1)[0])
            for _, s, _ in batch
        ]).astype(np.float32)
        try:
            outs = self.translator(images, styles=styles)
        except Exception as e:  # surface device errors to every waiter
            for _, _, fut in batch:
                fut.set_exception(e)
            return
        for (_, _, fut), out in zip(batch, outs):
            fut.set_result(out)

    def close(self, drain: bool = True):
        """Stop the worker; by default lets queued requests finish."""
        if drain:
            while not self._q.empty():
                time.sleep(0.01)
        self._stop.set()
        self._worker.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
