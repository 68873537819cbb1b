"""Native C++ decode/augment core vs the PIL path (content + determinism)."""

import numpy as np
import pytest
from PIL import Image

from aclgan_tpu.data import native


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    rng = np.random.RandomState(0)
    # smooth image so JPEG decode differences stay small
    base = rng.rand(8, 8, 3)
    arr = np.asarray(Image.fromarray(
        (base * 255).astype(np.uint8)).resize((96, 80), Image.BILINEAR))
    path = root / "img.jpg"
    Image.fromarray(arr).save(path, quality=95)
    return str(path)


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_decode_matches_pil(jpeg_file):
    with open(jpeg_file, "rb") as f:
        data = f.read()
    out = native.decode_jpeg_augment(data, new_size=None, crop_h=None,
                                     crop_w=None, flip=False,
                                     crop_top_frac=0.0, crop_left_frac=0.0)
    pil = np.asarray(Image.open(jpeg_file).convert("RGB"))
    assert out.shape == pil.shape
    # same libjpeg under the hood -> identical decode
    np.testing.assert_array_equal(out, pil)


@needs_native
def test_resize_close_to_pil(jpeg_file):
    with open(jpeg_file, "rb") as f:
        data = f.read()
    out = native.decode_jpeg_augment(data, new_size=40, crop_h=None,
                                     crop_w=None, flip=False,
                                     crop_top_frac=0.0, crop_left_frac=0.0)
    from aclgan_tpu.data.transforms import resize_shortest

    pil = np.asarray(resize_shortest(Image.open(jpeg_file).convert("RGB"), 40))
    assert out.shape == pil.shape
    # same antialiased triangle filter, independent float vs fixed-point
    # accumulation: at most 1 LSB apart
    diff = np.abs(out.astype(np.int16) - pil.astype(np.int16))
    assert int(diff.max()) <= 1, diff.max()


@needs_native
def test_downscale_is_antialiased(jpeg_file):
    """Downscale must area-average like PIL (ADVICE r1: the old 2-tap path
    point-sampled on downscale, diverging from the PIL fallback). A
    high-frequency image makes point sampling vs antialiasing differ by tens
    of levels; the paths must stay within 1 LSB."""
    import io

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (357, 441, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=100)
    data = buf.getvalue()
    out = native.decode_jpeg_augment(data, new_size=128, crop_h=None,
                                     crop_w=None, flip=False,
                                     crop_top_frac=0.0, crop_left_frac=0.0)
    from aclgan_tpu.data.transforms import resize_shortest

    decoded = Image.open(io.BytesIO(data)).convert("RGB")
    pil = np.asarray(resize_shortest(decoded, 128))
    diff = np.abs(out.astype(np.int16) - pil.astype(np.int16))
    assert int(diff.max()) <= 1, (diff.max(), diff.mean())


@needs_native
def test_crop_flip_deterministic(jpeg_file):
    with open(jpeg_file, "rb") as f:
        data = f.read()
    a = native.decode_jpeg_augment(data, 64, 48, 48, True, 0.3, 0.7)
    b = native.decode_jpeg_augment(data, 64, 48, 48, True, 0.3, 0.7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48, 48, 3)
    c = native.decode_jpeg_augment(data, 64, 48, 48, False, 0.3, 0.7)
    assert not np.array_equal(a, c)  # flip changes content


@needs_native
def test_flip_is_mirror(jpeg_file):
    """flip + mirrored crop position == mirror of unflipped crop."""
    with open(jpeg_file, "rb") as f:
        data = f.read()
    full = native.decode_jpeg_augment(data, None, None, None, False, 0.0, 0.0)
    flipped = native.decode_jpeg_augment(data, None, None, None, True, 0.0, 0.0)
    np.testing.assert_array_equal(flipped, full[:, ::-1])


def test_normalize_batch_native_matches_numpy():
    if not native.available():
        pytest.skip("native library not built")
    batch = np.random.RandomState(1).randint(0, 255, (2, 4, 4, 3), dtype=np.uint8)
    got = native.normalize_batch_native(batch)
    want = batch.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
