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


def prep_image(img: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> square (size, size): shortest-side resize + center crop.

    Shared by `Translator` and the AOT `ExportedTranslator` (export.py) so
    both serving surfaces feed the model the exact same pixels."""
    arr0 = np.asarray(img)
    if arr0.ndim != 3 or arr0.shape[-1] != 3:
        # fail here with a clear message — a grayscale/RGBA array would
        # otherwise surface as an opaque conv dimension error inside jit
        raise ValueError(f"expected HxWx3 RGB image, got shape {arr0.shape}")
    pil = Image.fromarray(arr0.astype(np.uint8, copy=False))
    pil = resize_shortest(pil, size)
    arr = np.asarray(pil, np.uint8)
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top:top + size, left:left + size]


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
        # scale-out: shard each compiled batch over a data-parallel device
        # mesh (params replicated, batch axis split — the forward is
        # collective-free, so XLA partitions it with zero communication and
        # throughput scales ~linearly per chip). -1 = all visible devices.
        devices: int = 1,
    ):
        cfg = load_config(config) if isinstance(config, str) else config
        self.cfg = cfg
        self.a2b = a2b
        self.batch_size = batch_size
        size_a, size_b = cfg.data.resolved_sizes()
        self.size = size or (size_a if a2b else size_b) or 256
        stride = 2 ** cfg.gen.n_downsample
        if self.size % stride:
            # the encoder floors odd sizes; the decoder would then emit a
            # different resolution than the input (and the focus blend would
            # crash on the shape mismatch)
            raise ValueError(f"size {self.size} must be a multiple of the "
                             f"generator stride {stride} (2**n_downsample)")
        self.model = ACLGAN(cfg)

        from aclgan_tpu.cli.test import load_generator_params

        self.gen_params = load_generator_params(checkpoint, self.model)
        self._key = jax.random.PRNGKey(seed)
        self._key_lock = threading.Lock()  # random_style is called from both
        # direct callers and the AsyncTranslator worker thread

        model = self.model

        def _translate(params, x, z):
            img, mask = model.translate(params, x, z, a2b=a2b)
            img01 = jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
            return img01.astype(jnp.uint8), mask

        n_dev = len(jax.devices()) if devices == -1 else devices
        self.mesh = None
        if n_dev > 1:
            from aclgan_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                  replicate,
                                                  replicated_sharding)

            if batch_size % n_dev:
                raise ValueError(f"batch_size {batch_size} not divisible by "
                                 f"{n_dev} devices")
            self.mesh = make_mesh(n_dev)
            self.gen_params = replicate(self.gen_params, self.mesh)
            b_shard = batch_sharding(self.mesh)
            self._translate = jax.jit(
                _translate,
                in_shardings=(replicated_sharding(self.mesh), b_shard, b_shard))
        else:
            self._translate = jax.jit(_translate)

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
        return prep_image(img, size or self.size)

    def random_style(self, n: int = 1) -> np.ndarray:
        """Draw n style codes from the serving RNG stream (thread-safe)."""
        with self._key_lock:
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
        if n == 0:
            return ([], None) if return_masks else []
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
            # ship raw uint8 (4x fewer host->device bytes in the request hot
            # path); model.translate normalizes in-graph with bitwise-
            # identical math (trainer.to_model_range, tpu.uint8_transfer)
            x = jnp.asarray(chunk)
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
        # duck-typed: any (Bucketed)Translator or export.ExportedTranslator —
        # needs __call__(images, styles=), random_style(n), batch_size, and a
        # style dimension (attr on ExportedTranslator, config on Translator)
        self._style_dim = getattr(translator, "style_dim", None) or \
            translator.cfg.gen.style_dim
        self.max_batch = max_batch or translator.batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # outstanding-request accounting: queue-empty does NOT mean processed
        # (a dequeued batch may still be in flight), so close(drain=True)
        # waits on this counter instead of q.empty()
        self._pending = 0
        self._pending_lock = threading.Lock()
        self._idle = threading.Condition(self._pending_lock)
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="aclgan-serve")
        self._worker.start()

    def submit(self, image: np.ndarray,
               style: Optional[np.ndarray] = None) -> Future:
        fut: Future = Future()
        # the closed-check, pending increment, and enqueue are one atomic
        # step wrt close() (which sets _stop under the same lock): a submit
        # that wins the race has its item visible to the shutdown sweep, a
        # submit that loses raises — no future can be stranded in between
        with self._pending_lock:
            if self._stop.is_set():
                raise RuntimeError("AsyncTranslator is closed")
            self._pending += 1
            self._q.put((image, style, fut))
        return fut

    def _retire(self):
        with self._pending_lock:
            self._pending -= 1
            if self._pending <= 0:
                self._idle.notify_all()

    def _resolve(self, fut: Future, *, result=None, exc: Optional[Exception] = None):
        """Complete a future and retire it from the pending count. Must never
        raise: a caller may have cancelled the future (set_result on a
        cancelled/done future raises InvalidStateError), and an escape here
        would leak the pending count and poison the rest of the batch."""
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(result)
        except Exception:
            pass  # future already cancelled/done — outcome dropped by caller
        finally:
            self._retire()

    def translate(self, image: np.ndarray,
                  style: Optional[np.ndarray] = None) -> np.ndarray:
        return self.submit(image, style).result()

    def _loop(self):
        while True:
            # never START a batch after close(): drain=True waits for
            # pending==0 before setting _stop, so this still drains; for
            # drain=False it makes shutdown prompt (only the in-flight batch
            # finishes) and leaves the backlog to close()'s sweep — the
            # worker provably never dequeues again, so the sweep can't race
            # it over queue items
            if self._stop.is_set():
                return
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
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
            try:
                self._run(batch)
            except Exception as e:  # last-ditch: never let the worker die
                # with futures unresolved — a dead worker would leave every
                # later submit() pending forever
                for _, _, fut in batch:
                    if not fut.done():
                        self._resolve(fut, exc=e)

    def _prep_request(self, image, style):
        """Validate/convert ONE request; raises on malformed input so a bad
        request fails only its own future, not the whole coalesced batch.
        A None style stays None here — _run draws ONE random_style(k) for all
        style-less requests of the coalesced batch (one device dispatch per
        batch, not per request; per-request draws measurably serialize the
        worker at high concurrency)."""
        arr = np.asarray(image)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(
                f"expected HxWx3 RGB image, got shape {arr.shape}")
        arr = arr.astype(np.uint8, copy=False)
        if style is None:
            return arr, None
        z = np.asarray(style, np.float32).reshape(-1)
        if z.shape[0] != self._style_dim:
            raise ValueError(
                f"style must have {self._style_dim} "
                f"elements, got {z.shape[0]}")
        return arr, z

    def _run(self, batch):
        # per-request validation: malformed requests fail individually and
        # are dropped from the device batch (innocent requests that shared
        # the latency window proceed)
        good = []
        for im, s, fut in batch:
            if not fut.set_running_or_notify_cancel():
                self._retire()  # caller cancelled while queued — skip it
                continue
            try:
                arr, z = self._prep_request(im, s)
            except Exception as e:
                self._resolve(fut, exc=e)
                continue
            good.append((arr, z, fut))
        if not good:
            return
        missing = [i for i, (_, z, _) in enumerate(good) if z is None]
        if missing:  # one batched draw for every default-style request
            zs = self.translator.random_style(len(missing))
            for j, i in enumerate(missing):
                arr, _, fut = good[i]
                good[i] = (arr, zs[j], fut)
        try:
            images = [arr for arr, _, _ in good]
            styles = np.stack([z for _, z, _ in good]).astype(np.float32)
            outs = self.translator(images, styles=styles)
        except Exception as e:  # surface device errors to every waiter
            for _, _, fut in good:
                self._resolve(fut, exc=e)
            return
        for (_, _, fut), out in zip(good, outs):
            self._resolve(fut, result=out)

    def close(self, drain: bool = True):
        """Stop the worker; by default lets in-flight + queued requests
        finish (bounded by worker liveness — a dead worker can't drain)."""
        if drain:
            with self._idle:
                while self._pending > 0 and self._worker.is_alive():
                    self._idle.wait(timeout=0.1)
        with self._pending_lock:  # atomic wrt submit()'s closed-check
            self._stop.set()
        self._worker.join(timeout=10)
        # fail anything left behind (enqueued during shutdown or stranded by
        # a worker crash) instead of leaving futures forever pending
        leftovers = []
        while True:
            try:
                leftovers.append(self._q.get_nowait())
            except queue.Empty:
                break
        for _, _, fut in leftovers:
            if not fut.done():
                self._resolve(fut, exc=RuntimeError("AsyncTranslator closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
