"""Data pipeline tests: listing, transforms, loader semantics."""

import os
import numpy as np
import pytest
from PIL import Image

from aclgan_tpu.data.dataset import is_image_file, list_images_folder
from aclgan_tpu.data.loader import DataLoader, ImageDataset, SyntheticDataset
from aclgan_tpu.data.transforms import (
    TransformSpec,
    apply_transform,
    normalize_batch,
    resize_shortest,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(10):
        arr = rng.randint(0, 255, size=(40 + i, 50, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i:03d}.jpg")
    (root / "sub").mkdir()
    Image.fromarray(np.zeros((30, 30, 3), np.uint8)).save(root / "sub" / "extra.png")
    (root / "notes.txt").write_text("not an image")
    return str(root)


def test_extension_whitelist():
    assert is_image_file("a.jpg") and is_image_file("b.PNG") and is_image_file("c.ppm")
    assert not is_image_file("d.txt") and not is_image_file("e.gif")


def test_folder_listing_recursive_sorted(image_dir):
    paths = list_images_folder(image_dir)
    assert len(paths) == 11  # 10 jpg + 1 nested png, txt excluded
    assert paths == sorted(paths)


def test_resize_shortest_side():
    img = Image.fromarray(np.zeros((100, 200, 3), np.uint8))
    out = resize_shortest(img, 50)
    assert out.size == (100, 50)  # (w, h): shortest side (h=100) -> 50
    img = Image.fromarray(np.zeros((200, 100, 3), np.uint8))
    out = resize_shortest(img, 50)
    assert out.size == (50, 100)


def test_transform_crop_shape_and_range(image_dir):
    spec = TransformSpec(new_size=32, crop_h=32, crop_w=32, flip=True)
    rng = np.random.default_rng(0)
    img = Image.open(list_images_folder(image_dir)[0])
    arr = apply_transform(img, spec, rng)
    assert arr.shape == (32, 32, 3)
    assert arr.dtype == np.uint8


def test_normalize_batch_range():
    batch = np.array([[[[0, 128, 255]]]], np.uint8)
    out = normalize_batch(batch)
    np.testing.assert_allclose(out[0, 0, 0], [-1.0, 128 * 2 / 255 - 1, 1.0], atol=1e-6)


def test_loader_drop_last_and_shapes(image_dir):
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=True)
    ds = ImageDataset(list_images_folder(image_dir), spec)
    loader = DataLoader(ds, batch_size=4, train=True, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 11 // 4  # drop_last=True (utils.py:86)
    for b in batches:
        assert b.shape == (4, 16, 16, 3)
        assert b.dtype == np.float32
        assert b.min() >= -1.0 and b.max() <= 1.0


def test_loader_deterministic_across_workers(image_dir):
    """Same seed => identical batches regardless of worker count (the ordered
    hand-off in loader.py)."""
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=True)
    ds = ImageDataset(list_images_folder(image_dir), spec)
    l0 = DataLoader(ds, batch_size=2, train=True, num_workers=0, seed=7)
    l3 = DataLoader(ds, batch_size=2, train=True, num_workers=3, seed=7)
    for b0, b3 in zip(l0, l3):
        np.testing.assert_array_equal(b0, b3)


def test_loader_epochs_differ(image_dir):
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=False)
    ds = ImageDataset(list_images_folder(image_dir), spec)
    loader = DataLoader(ds, batch_size=2, train=True, num_workers=0, seed=1)
    e0 = np.concatenate(list(loader))
    e1 = np.concatenate(list(loader))
    assert not np.array_equal(e0, e1)  # reshuffled per epoch


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(8, (16, 16), seed=3)
    rng = np.random.default_rng(0)
    a = ds.get(2, rng)
    b = ds.get(2, rng)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8


def test_corrupt_image_fallback(image_dir, tmp_path):
    """Production resilience: unreadable files substitute a neighbor sample
    with one warning instead of killing the epoch."""
    import warnings

    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    good = list_images_folder(image_dir)[0]
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=False)
    ds = ImageDataset([str(bad), good], spec, use_native=False)
    rng = np.random.default_rng(0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = ds.get(0, rng)
    assert out.shape == (16, 16, 3)
    assert any("substituting" in str(x.message) for x in w)


def test_iter_padded_covers_all_images(image_dir):
    """Eval iteration pads the tail batch instead of dropping it (the
    reference's drop_last would lose len % batch images from IS/FID)."""
    paths = list_images_folder(image_dir)  # 11 images
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=False)
    loader = DataLoader(ImageDataset(paths, spec), batch_size=4, train=False,
                        num_workers=0, seed=0)
    batches = list(loader.iter_padded())
    assert [n for _, n in batches] == [4, 4, 3]
    for b, _ in batches:
        assert b.shape == (4, 16, 16, 3)  # static shape incl. padded tail
    # padded entries repeat the last valid item
    last_b, last_n = batches[-1]
    np.testing.assert_array_equal(last_b[3], last_b[2])
    # plain iteration drops the tail; padded covers everything
    assert sum(b.shape[0] for b in loader) == 8
    assert sum(n for _, n in batches) == 11


def test_abandoned_iterator_workers_exit(image_dir):
    """Workers blocked in the bounded out_q must exit when the consumer
    abandons the epoch (zip() with a shorter domain abandons one iterator
    per epoch; leaked threads accumulate over a 350k-iter run)."""
    import threading
    import time

    paths = list_images_folder(image_dir)
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=False)
    loader = DataLoader(ImageDataset(paths, spec), batch_size=1, train=False,
                        num_workers=2, seed=0, prefetch_batches=1)
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)  # workers now racing to fill the size-1 out_q
    time.sleep(0.3)  # let at least one worker block in out_q.put
    it.close()  # abandon: generator finally sets the stop event
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = set(threading.enumerate()) - before
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"worker threads leaked: {leaked}"


def test_uint8_emit_matches_float_bitwise():
    """emit='uint8' + in-graph normalize == emit='float32' host normalize,
    down to the bit (tpu.uint8_transfer contract)."""
    import jax.numpy as jnp
    from aclgan_tpu.trainer import to_model_range

    ds = SyntheticDataset(8, (16, 16), seed=5)
    f32 = list(DataLoader(ds, batch_size=4, train=True, num_workers=0, seed=9))
    u8 = list(DataLoader(ds, batch_size=4, train=True, num_workers=0, seed=9,
                         emit="uint8"))
    assert len(f32) == len(u8)
    for bf, bu in zip(f32, u8):
        assert bu.dtype == np.uint8 and bf.dtype == np.float32
        np.testing.assert_array_equal(np.asarray(to_model_range(jnp.asarray(bu))), bf)


def test_uint8_emit_rejects_unknown():
    ds = SyntheticDataset(8, (16, 16), seed=5)
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=4, train=True, num_workers=0, emit="int16")


def test_worker_exception_propagates_not_hangs(image_dir):
    """A dataset error inside a worker thread must raise in the consumer —
    the pre-fix behavior was a dead thread and an out_q.get() that blocked
    the training loop forever with no message."""
    paths = list_images_folder(image_dir)
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=False)

    class Exploding(ImageDataset):
        def get(self, index, rng):
            if index == 3:
                raise RuntimeError("boom at index 3")
            return super().get(index, rng)

    loader = DataLoader(Exploding(paths, spec), batch_size=2, train=False,
                        num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="boom at index 3"):
        for _ in loader:
            pass


def test_work_ahead_is_bounded_when_head_batch_is_slow(image_dir):
    """Workers must not run arbitrarily far ahead of the consumer when the
    next-to-yield batch is slow: completed-but-unyieldable batches are capped
    at prefetch_batches + num_workers (the `done` dict used to grow without
    bound because draining out_q tokens freed queue slots)."""
    import threading
    import time

    paths = list_images_folder(image_dir)
    spec = TransformSpec(new_size=16, crop_h=16, crop_w=16, flip=False)
    gate = threading.Event()
    max_started = {"n": 0}
    lock = threading.Lock()

    class SlowHead(ImageDataset):
        def get(self, index, rng):
            with lock:
                max_started["n"] += 1
            if index == 0:
                gate.wait(10.0)  # batch 0 stalls; others race ahead
            return super().get(index, rng)

    n_workers, prefetch = 2, 1
    loader = DataLoader(SlowHead(paths, spec), batch_size=1, train=False,
                        num_workers=n_workers, seed=0,
                        prefetch_batches=prefetch)
    assert len(loader) >= 8, "fixture too small for the race"
    it = iter(loader)
    t = threading.Thread(target=lambda: next(it), daemon=True)
    t.start()
    time.sleep(1.0)  # let the non-head workers run as far as they can
    started_while_blocked = max_started["n"]
    gate.set()
    t.join(10.0)
    for _ in it:  # drain the rest; also verifies nothing deadlocked
        pass
    # batch 0's worker + at most (prefetch + workers - 1) others may start
    assert started_while_blocked <= 1 + prefetch + n_workers, (
        f"{started_while_blocked} batches started while batch 0 was blocked")


def test_synthetic_seed_stable_across_interpreters(tmp_path):
    """_make_dataset's synthetic seed must not depend on randomized str
    hashing: the same (seed, epoch, batch) must produce the same bytes in
    every process (BENCH_NOTES same-day pairing relies on it)."""
    import subprocess
    import sys

    prog = (
        "import numpy as np\n"
        "from aclgan_tpu.config import Config\n"
        "from aclgan_tpu.data.loader import _make_dataset\n"
        "cfg = Config(); cfg.data.synthetic = True\n"
        "ds = _make_dataset(cfg, 'train_a', train=True)\n"
        "print(ds.get(0, np.random.default_rng(0)).sum())\n"
    )
    outs = set()
    for hash_seed in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=hash_seed,
                   JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=120,
                           cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r.returncode == 0, r.stderr
        outs.add(r.stdout.strip().splitlines()[-1])
    assert len(outs) == 1, f"synthetic data differed across interpreters: {outs}"
