"""Host input pipeline: threaded decode/augment workers + device prefetch.

Replaces the reference's torch DataLoader with num_workers processes
(utils.py:86,99) with a thread pool (PIL decode releases the GIL) feeding a
bounded queue of ready NHWC float32 batches, plus an async `device_put`
prefetcher so the TPU never waits on the host. drop_last=True and
shuffle=train semantics match the reference.
"""

from __future__ import annotations

import os
import queue
import threading
import zlib
from typing import Iterator, List, Sequence

import numpy as np

from aclgan_tpu.config import Config
from aclgan_tpu.data.dataset import (
    list_images_filelist,
    list_images_folder,
    load_image,
)
from aclgan_tpu.data.transforms import TransformSpec, apply_transform, normalize_batch


class _Dataset:
    """Index -> decoded/augmented (H, W, 3) uint8 sample."""

    def __len__(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def get(self, index: int, rng: np.random.Generator) -> np.ndarray:
        raise NotImplementedError


class ImageDataset(_Dataset):
    """use_native=True routes JPEGs through the C++ decode/augment core
    (aclgan_tpu.data.native) when built; PIL otherwise. RNG draws are
    identical in count either way, so the augmentation stream stays
    deterministic per (seed, epoch, batch)."""

    def __init__(self, paths: Sequence[str], spec: TransformSpec,
                 use_native: bool = True):
        self.paths = list(paths)
        self.spec = spec
        self._native = None
        if use_native:
            from aclgan_tpu.data import native

            self._native = native if native.available() else None

    def __len__(self) -> int:
        return len(self.paths)

    def get(self, index: int, rng: np.random.Generator) -> np.ndarray:
        # corrupt/unreadable file: warn once, substitute the nearest readable
        # neighbor (scanning forward — a single retry would crash on two
        # adjacent bad files, or on a 1-image dataset retry the same file)
        last_exc: Exception | None = None
        for off in range(len(self.paths)):
            i = (index + off) % len(self.paths)
            try:
                out = self._get(i, rng)
            except Exception as exc:
                last_exc = exc
                if not getattr(self, "_warned", False):
                    import warnings

                    warnings.warn(f"failed to load {self.paths[i]}: {exc}; "
                                  f"substituting a neighbor sample")
                    self._warned = True
                continue
            return out
        raise RuntimeError(
            f"every file in the dataset failed to load "
            f"(last: {last_exc})")

    def _get(self, index: int, rng: np.random.Generator) -> np.ndarray:
        path = self.paths[index]
        spec = self.spec
        flip = bool(spec.flip and rng.random() < 0.5)
        if self._native is not None and path.lower().endswith((".jpg", ".jpeg")):
            top_frac, left_frac = rng.random(), rng.random()
            with open(path, "rb") as f:
                data = f.read()
            out = self._native.decode_jpeg_augment(
                data, spec.new_size, spec.crop_h, spec.crop_w,
                flip, top_frac, left_frac)
            if out is not None:
                return out
            # fall through to PIL on decode failure / too-small image
            rng2 = np.random.default_rng([int(top_frac * 1e9)])
            img = load_image(path)
            return apply_transform(img, spec, rng2)
        img = load_image(path)
        # replay the flip decision already drawn, then let apply_transform
        # draw the crop position from the same stream
        if flip:
            from PIL import Image as _Image

            img = img.transpose(_Image.FLIP_LEFT_RIGHT)
        no_flip_spec = TransformSpec(spec.new_size, spec.crop_h, spec.crop_w, False)
        return apply_transform(img, no_flip_spec, rng)


class SyntheticDataset(_Dataset):
    """Procedural smooth-blob images; for smoke tests and benchmarking the
    compute path without a real dataset (no reference analog)."""

    def __init__(self, size: int, image_hw: tuple[int, int], seed: int = 0):
        self.size = size
        self.hw = image_hw
        self.seed = seed
        h, w = image_hw
        # cache the coordinate grids: regenerating them per sample dominated
        # host time at 256² (measured ~0.5s/iter vs 0.28s device)
        self._yy = np.arange(h, dtype=np.float32)[:, None]
        self._xx = np.arange(w, dtype=np.float32)[None, :]

    def __len__(self) -> int:
        return self.size

    def get(self, index: int, rng: np.random.Generator) -> np.ndarray:
        h, w = self.hw
        local = np.random.default_rng(self.seed * 1000003 + index)
        img = np.zeros((h, w, 3), np.float32)
        for _ in range(3):
            cy, cx = local.uniform(0, h), local.uniform(0, w)
            s = local.uniform(h / 8, h / 3)
            # separable gaussian: two 1-D exps + outer product
            gy = np.exp(-np.square(self._yy - cy) / (2 * s * s))
            gx = np.exp(-np.square(self._xx - cx) / (2 * s * s))
            img += (gy * gx)[..., None] * local.uniform(0, 255, size=(3,)).astype(np.float32)
        return np.clip(img, 0, 255).astype(np.uint8)


class DataLoader:
    """Epoch-shuffled, drop-last batch iterator with worker threads.

    `__iter__` yields NHWC batches: float32 in [-1, 1] by default, or raw
    uint8 with `emit="uint8"` (the trainer normalizes in-graph —
    trainer.to_model_range; 4x smaller host->device transfer). The
    host-side helpers `iter_padded` (eval) and `first_n` (display batches)
    always yield normalized float32 regardless of `emit`. `shuffle=train`,
    `drop_last=True` (utils.py:86,99). Deterministic per (seed, epoch).
    """

    def __init__(
        self,
        dataset: _Dataset,
        batch_size: int,
        train: bool,
        num_workers: int = 4,
        seed: int = 0,
        prefetch_batches: int = 4,
        emit: str = "float32",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.epoch = 0
        # emit="uint8" yields raw uint8 NHWC batches (4x smaller host->device
        # transfer; the trainer normalizes in-graph with bitwise-identical
        # math — trainer.to_model_range). "float32" = normalized [-1,1].
        if emit not in ("float32", "uint8"):
            raise ValueError(f"emit must be 'float32' or 'uint8', got {emit!r}")
        self._finalize = (lambda b: b) if emit == "uint8" else normalize_batch

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size  # drop_last

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.train:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        n = len(self) * self.batch_size
        return idx[:n]

    def __iter__(self) -> Iterator[np.ndarray]:
        indices = self._epoch_indices()
        batches = indices.reshape(-1, self.batch_size)
        epoch = self.epoch
        self.epoch += 1

        if self.num_workers == 0:
            for bi, batch_idx in enumerate(batches):
                rng = np.random.default_rng((self.seed, epoch, bi))
                samples = [self.dataset.get(int(i), rng) for i in batch_idx]
                yield self._finalize(np.stack(samples))
            return

        out_q: "queue.Queue" = queue.Queue()  # completion tokens (<= n_batches)
        stop = threading.Event()
        n_batches = len(batches)
        next_to_yield = 0
        done: dict[int, object] = {}
        done_lock = threading.Lock()
        work_q: "queue.Queue" = queue.Queue()
        for bi in range(n_batches):
            work_q.put(bi)
        # Work-ahead budget: a worker takes a permit before STARTING a batch;
        # the consumer returns it when the batch is yielded. This bounds
        # `done` to prefetch_batches + num_workers entries even when batch 0
        # is the slow one — without it every completed-but-unyieldable batch
        # would accumulate in RAM (a bounded out_q alone cannot provide this:
        # the consumer must drain tokens even when it cannot yield in order).
        budget = threading.Semaphore(self.prefetch_batches + self.num_workers)

        def worker():
            while not stop.is_set():
                if not budget.acquire(timeout=0.1):
                    continue  # re-check stop: consumer may have abandoned us
                try:
                    bi = work_q.get_nowait()
                except queue.Empty:
                    budget.release()
                    return
                try:
                    rng = np.random.default_rng((self.seed, epoch, bi))
                    samples = [self.dataset.get(int(i), rng)
                               for i in batches[bi]]
                    result: object = self._finalize(np.stack(samples))
                except BaseException as e:  # propagate to the consumer — a
                    result = e              # dead thread would hang the loop
                with done_lock:
                    done[bi] = result
                out_q.put(bi)

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            received = 0
            while received < n_batches:
                out_q.get()
                received += 1
                # yield in order to stay deterministic
                while True:
                    with done_lock:
                        if next_to_yield in done:
                            batch = done.pop(next_to_yield)
                        else:
                            break
                    next_to_yield += 1
                    budget.release()
                    if isinstance(batch, BaseException):
                        raise batch
                    yield batch
        finally:
            stop.set()

    def iter_padded(self) -> Iterator[tuple]:
        """Full-coverage eval iteration: every dataset item exactly once, in
        order, with the tail batch padded (last item repeated) so jitted
        consumers keep a static shape. Yields (batch, n_valid) — consumers
        must trim outputs to n_valid. Fixes the reference's silent tail drop
        (drop_last=True, utils.py:86,99) for metrics like IS/FID where every
        image must contribute."""
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, 0xE7A1))
        for start in range(0, n, self.batch_size):
            idx = list(range(start, min(start + self.batch_size, n)))
            n_valid = len(idx)
            while len(idx) < self.batch_size:
                idx.append(idx[-1])
            samples = [self.dataset.get(int(i), rng) for i in idx]
            yield normalize_batch(np.stack(samples)), n_valid

    def first_n(self, n: int) -> np.ndarray:
        """First n dataset items un-augmented-order (display batches,
        train.py:44-47 stacks dataset[0..display_size))."""
        rng = np.random.default_rng((self.seed, 0xD15B))
        samples = [self.dataset.get(i, rng) for i in range(min(n, len(self.dataset)))]
        return normalize_batch(np.stack(samples))


def _make_dataset(cfg: Config, which: str, train: bool) -> _Dataset:
    data = cfg.data
    size_a, size_b = data.resolved_sizes()
    new_size = size_a if which.endswith("a") else size_b
    if train:
        spec = TransformSpec(new_size=new_size, crop_h=data.crop_image_height,
                             crop_w=data.crop_image_width, flip=True)
    else:
        spec = TransformSpec(new_size=new_size, crop_h=new_size, crop_w=new_size,
                             flip=False)  # utils.py:58-63: test crops to new_size
    if data.synthetic:
        hw = (spec.crop_h or new_size or 256, spec.crop_w or new_size or 256)
        # zlib.crc32, NOT hash(): str hashing is randomized per interpreter,
        # which would make "deterministic per (seed, epoch)" false across
        # runs/processes and add variance to paired benchmark comparisons
        return SyntheticDataset(size=max(64, cfg.batch_size * 8), image_hw=hw,
                                seed=zlib.crc32(which.encode()) % (2 ** 31))
    if data.data_root:
        sub = {"train_a": "trainA", "train_b": "trainB",
               "test_a": "testA", "test_b": "testB"}[which]
        return ImageDataset(list_images_folder(os.path.join(data.data_root, sub)), spec)
    folder = getattr(data, f"data_folder_{which}")
    lst = getattr(data, f"data_list_{which}")
    if folder is None or lst is None:
        raise ValueError(f"No data_root and no data_folder/list for {which}")
    return ImageDataset(list_images_filelist(folder, lst), spec)


def get_all_data_loaders(cfg: Config, seed: int = 0):
    """(train_a, train_b, test_a, test_b) — utils.py:43-73.

    Train loaders emit uint8 when cfg.tpu.uint8_transfer (the trainer
    normalizes in-graph; 4x smaller H2D transfer — BENCH_NOTES "H2D");
    test loaders keep float32 (display/eval consumers are host-side)."""
    train_emit = "uint8" if cfg.tpu.uint8_transfer else "float32"
    loaders = []
    for which, train in [("train_a", True), ("train_b", True),
                         ("test_a", False), ("test_b", False)]:
        ds = _make_dataset(cfg, which, train)
        loaders.append(DataLoader(ds, cfg.batch_size, train,
                                  num_workers=cfg.data.num_workers, seed=seed,
                                  emit=train_emit if train else "float32"))
    return tuple(loaders)


def device_prefetch(iterator, n: int = 2, sharding=None):
    """Asynchronously device_put upcoming host batches (double buffering).

    The TPU-native replacement for the host->device copy in the hot loop
    (train.py:67): jax transfers are async, so keeping `n` batches in flight
    overlaps H2D DMA with compute. With a sharding, each process contributes
    its local batch to the global sharded array (multi-host safe: the loader
    yields the per-process slice; jax assembles the global batch).
    """
    import jax

    buf: List = []
    it = iter(iterator)

    def put(x):
        if sharding is not None:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x)

    try:
        for _ in range(n):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
