"""Serving Translator: end-to-end uint8 API over a checkpoint."""

import numpy as np
import pytest

import jax

from aclgan_tpu.serving import AsyncTranslator, BucketedTranslator, Translator
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import save_checkpoint
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(root), state, iterations=0)
    return cfg, str(root / "gen_00000001.msgpack")


def test_translator_batches_and_pads(ckpt):
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, a2b=True, batch_size=4, size=16, seed=1)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (24, 20, 3), dtype=np.uint8) for _ in range(6)]
    outs = tr(imgs)
    assert len(outs) == 6
    for o in outs:
        assert o.shape == (16, 16, 3) and o.dtype == np.uint8


def test_translator_style_control(ckpt):
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=2, size=16, seed=2)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    z1 = np.zeros((cfg.gen.style_dim,), np.float32)
    z2 = np.full((cfg.gen.style_dim,), 2.0, np.float32)
    a = tr([img], styles=z1)[0]
    b = tr([img], styles=z2)[0]
    a2 = tr([img], styles=z1)[0]
    np.testing.assert_array_equal(a, a2)  # deterministic given style
    assert not np.array_equal(a, b)       # style changes output

    style_code = tr.encode_style(img)
    assert style_code.shape == (1, cfg.gen.style_dim)
    outs, masks = tr([img], styles=style_code[0], return_masks=True)
    assert masks is not None and masks[0].shape == (16, 16, 1)


def test_bucketed_mixed_sizes_no_recompiles(ckpt):
    cfg, gen_path = ckpt
    tr = BucketedTranslator(cfg, gen_path, buckets=(8, 16, 24),
                            batch_size=2, seed=3)
    rng = np.random.RandomState(2)

    def imgs():
        # shortest sides 7, 8, 14, 30 -> buckets 8, 8, 16, 24
        return [rng.randint(0, 255, (s, s + 5, 3), dtype=np.uint8)
                for s in (7, 8, 14, 30)]

    outs = tr(imgs())
    assert [o.shape for o in outs] == [(8, 8, 3), (8, 8, 3),
                                       (16, 16, 3), (24, 24, 3)]
    compiled = tr.compiled_shapes()
    # second round of the same traffic shape mix: zero new executables
    tr(imgs())
    assert tr.compiled_shapes() == compiled


def test_bucketed_rejects_bad_stride(ckpt):
    cfg, gen_path = ckpt
    with pytest.raises(ValueError, match="stride"):
        BucketedTranslator(cfg, gen_path, buckets=(10,))


def test_bucketed_warmup_precompiles(ckpt):
    cfg, gen_path = ckpt
    tr = BucketedTranslator(cfg, gen_path, buckets=(8, 12), batch_size=2)
    tr.warmup()
    compiled = tr.compiled_shapes()
    assert compiled >= 2
    rng = np.random.RandomState(3)
    tr([rng.randint(0, 255, (8, 8, 3), dtype=np.uint8),
        rng.randint(0, 255, (12, 12, 3), dtype=np.uint8)])
    assert tr.compiled_shapes() == compiled


def test_async_translator_batches_concurrent_requests(ckpt):
    cfg, gen_path = ckpt
    base = BucketedTranslator(cfg, gen_path, buckets=(8, 16),
                              batch_size=4, seed=4)
    base.warmup()
    calls = []
    orig = BucketedTranslator.__call__

    def counting(self, images, **kw):
        calls.append(len(images))
        return orig(self, images, **kw)

    base.__class__ = type("Counting", (BucketedTranslator,),
                          {"__call__": counting})
    rng = np.random.RandomState(4)
    with AsyncTranslator(base, max_batch=4, max_wait_ms=200.0) as srv:
        futs = [srv.submit(rng.randint(0, 255, (8 + 8 * (i % 2),) * 2 + (3,),
                                       dtype=np.uint8))
                for i in range(8)]
        outs = [f.result(timeout=60) for f in futs]
    for i, o in enumerate(outs):
        assert o.shape == (8 + 8 * (i % 2), 8 + 8 * (i % 2), 3)
        assert o.dtype == np.uint8
    # 8 requests coalesced into batched calls, not 8 singletons
    assert len(calls) <= 4 and max(calls) > 1


def test_async_translator_style_and_errors(ckpt):
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=2, size=16, seed=5)
    img = np.random.RandomState(5).randint(0, 255, (16, 16, 3), np.uint8)
    z = np.zeros((cfg.gen.style_dim,), np.float32)
    with AsyncTranslator(tr, max_wait_ms=1.0) as srv:
        a = srv.translate(img, style=z)
        b = srv.translate(img, style=z)
        np.testing.assert_array_equal(a, b)  # deterministic given style
        bad = srv.submit(np.zeros((16, 16, 4), np.uint8))  # 4-channel input
        with pytest.raises(Exception):
            bad.result(timeout=60)
    with pytest.raises(RuntimeError):
        srv.submit(img)


def test_async_bad_request_fails_alone(ckpt):
    """One malformed request in a coalesced batch fails only its own future;
    requests sharing the latency window still succeed, and the worker thread
    survives to serve later submissions (ADVICE r2 medium/low)."""
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=4, size=16, seed=6)
    rng = np.random.RandomState(6)
    good_img = rng.randint(0, 255, (16, 16, 3), np.uint8)
    with AsyncTranslator(tr, max_batch=4, max_wait_ms=300.0) as srv:
        f_good1 = srv.submit(good_img)
        f_bad_img = srv.submit(np.zeros((16, 16, 4), np.uint8))
        f_bad_style = srv.submit(good_img,
                                 style=np.zeros((cfg.gen.style_dim + 3,),
                                                np.float32))
        f_good2 = srv.submit(good_img)
        assert f_good1.result(timeout=60).shape == (16, 16, 3)
        assert f_good2.result(timeout=60).shape == (16, 16, 3)
        with pytest.raises(ValueError, match="RGB"):
            f_bad_img.result(timeout=60)
        with pytest.raises(ValueError, match="style"):
            f_bad_style.result(timeout=60)
        # worker still alive after the failures
        assert srv.submit(good_img).result(timeout=60).dtype == np.uint8


def test_async_close_drains_in_flight(ckpt):
    """close(drain=True) waits for processed-ness, not queue-emptiness: a
    request dequeued but still in flight when close() is called must still
    resolve (ADVICE r2 low: drain races)."""
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=2, size=16, seed=7)
    img = np.random.RandomState(7).randint(0, 255, (16, 16, 3), np.uint8)
    srv = AsyncTranslator(tr, max_wait_ms=1.0)
    futs = [srv.submit(img) for _ in range(5)]
    srv.close(drain=True)
    for f in futs:
        assert f.result(timeout=1).shape == (16, 16, 3)


def test_translator_data_parallel_matches_single_device(ckpt):
    """Mesh-sharded serving (params replicated, batch split over the 8-device
    CPU mesh): same outputs as the single-device path, and the compiled
    batch actually lands sharded."""
    cfg, gen_path = ckpt
    kw = dict(a2b=True, batch_size=8, size=16, seed=4)
    tr1 = Translator(cfg, gen_path, **kw)
    trN = Translator(cfg, gen_path, devices=len(jax.devices()), **kw)
    assert trN.mesh is not None and trN.mesh.devices.size == len(jax.devices())
    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(11)]
    styles = rng.randn(11, cfg.gen.style_dim).astype(np.float32)
    outs1, masks1 = tr1(imgs, styles=styles, return_masks=True)
    outsN, masksN = trN(imgs, styles=styles, return_masks=True)
    assert len(outsN) == 11
    for a, b in zip(outs1, outsN):
        np.testing.assert_array_equal(a, b)
    if masks1 is not None:
        # float masks see sharded-vs-unsharded fusion-order reassociation;
        # the uint8 images above still round identically
        for a, b in zip(masks1, masksN):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_translator_data_parallel_batch_divisibility(ckpt):
    cfg, gen_path = ckpt
    with pytest.raises(ValueError, match="divisible"):
        Translator(cfg, gen_path, batch_size=6, size=16, devices=4)


def test_async_cancelled_future_does_not_poison_batch(ckpt):
    """A caller-cancelled future must not leak the pending count, fail the
    rest of its coalesced batch, or hang close(drain=True) (self-review r3:
    set_result on a cancelled future raises InvalidStateError)."""
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=4, size=16, seed=8)
    rng = np.random.RandomState(8)
    img = rng.randint(0, 255, (16, 16, 3), np.uint8)
    srv = AsyncTranslator(tr, max_batch=4, max_wait_ms=300.0)
    try:
        f1 = srv.submit(img)
        f_cancel = srv.submit(img)
        f_cancel.cancel()  # may race the worker; either way must be benign
        f2 = srv.submit(img)
        assert f1.result(timeout=60).shape == (16, 16, 3)
        assert f2.result(timeout=60).shape == (16, 16, 3)
        # worker alive and accounting intact after the cancellation
        assert srv.submit(img).result(timeout=60).dtype == np.uint8
    finally:
        srv.close(drain=True)  # must not hang on a leaked pending count
    with pytest.raises(RuntimeError):
        srv.submit(img)


def test_translator_rejects_non_stride_size(ckpt):
    """An odd serving size would make the decoder emit a different resolution
    than the input (encoder floors) — reject at construction."""
    cfg, gen_path = ckpt
    stride = 2 ** cfg.gen.n_downsample
    with pytest.raises(ValueError, match="multiple of the generator stride"):
        Translator(cfg, gen_path, batch_size=2, size=stride * 3 + 1)


def test_translator_sync_path_validates_inputs(ckpt):
    """The direct-call path must fail malformed input with a clear message
    (the async path already did) and handle the empty list."""
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=2, size=16, seed=1)
    assert tr([]) == []
    outs, masks = tr([], return_masks=True)
    assert outs == [] and masks is None
    gray = np.zeros((16, 16), np.uint8)
    with pytest.raises(ValueError, match="HxWx3"):
        tr([gray])


def test_translator_ships_uint8_to_device(ckpt, monkeypatch):
    """The request hot path must hand the compiled step raw uint8 (4x fewer
    host->device bytes); normalization happens in-graph."""
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=2, size=16, seed=1)
    seen = {}
    orig = tr._translate

    def spy(params, x, z):
        seen["dtype"] = x.dtype
        return orig(params, x, z)

    monkeypatch.setattr(tr, "_translate", spy)
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    tr([img])
    assert seen["dtype"] == np.uint8
