"""AOT export artifact: roundtrip parity with the live serving path."""

import numpy as np
import pytest

import jax

from aclgan_tpu.export import (ExportedTranslator, export_translator,
                               load_artifact, save_artifact)
from aclgan_tpu.serving import Translator
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import save_checkpoint
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(root), state, iterations=0)
    return cfg, str(root / "gen_00000001.msgpack")


@pytest.fixture(scope="module")
def artifact(ckpt, tmp_path_factory):
    cfg, gen_path = ckpt
    exported, meta = export_translator(cfg, gen_path, a2b=True, batch_size=2,
                                       size=16, platforms=("cpu",))
    path = str(tmp_path_factory.mktemp("art") / "tiny_a2b.aclx")
    save_artifact(exported, meta, path)
    return cfg, gen_path, path


def test_artifact_matches_live_translator(artifact):
    """The frozen graph must produce byte-identical outputs to the live
    serving path (same pixels, same styles)."""
    cfg, gen_path, path = artifact
    live = Translator(cfg, gen_path, a2b=True, batch_size=2, size=16, seed=7)
    frozen = ExportedTranslator(path)

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (20, 24, 3), dtype=np.uint8)
            for _ in range(3)]  # 3 imgs -> exercises tail-batch padding
    styles = rng.randn(3, cfg.gen.style_dim).astype(np.float32)

    out_live, mask_live = live(imgs, styles=styles, return_masks=True)
    out_froz, mask_froz = frozen(imgs, styles=styles, return_masks=True)
    assert len(out_froz) == 3
    for a, b in zip(out_live, out_froz):
        np.testing.assert_array_equal(a, b)
    assert mask_froz is not None  # tiny_config is a focus config
    # the StableHLO-roundtripped program is compiled separately from the live
    # jit, so float masks carry reassociation noise (~2e-6 measured); the
    # uint8 images above still quantize identically
    for a, b in zip(mask_live, mask_froz):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_artifact_is_self_contained(artifact):
    """Serving the artifact must not need model code: the raw deserialized
    .call runs with nothing but jax."""
    _, _, path = artifact
    exported, meta = load_artifact(path)
    x = np.zeros((meta["batch_size"], meta["size"], meta["size"], 3), np.uint8)
    z = np.zeros((meta["batch_size"], meta["style_dim"]), np.float32)
    out = exported.call(x, z)
    assert out["image"].shape == x.shape and out["image"].dtype == np.uint8
    assert meta["focus"] and out["mask"].shape == x.shape[:3] + (1,)


def test_artifact_embeds_weights(ckpt, tmp_path):
    """Two different checkpoints -> two artifacts with different outputs
    (weights live in the artifact, not alongside it)."""
    cfg, gen_path = ckpt
    model = ACLGAN(cfg)
    other_state = model.init_state(jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path), other_state, iterations=0)
    other_path = str(tmp_path / "gen_00000001.msgpack")

    x = np.full((2, 16, 16, 3), 128, np.uint8)
    z = np.ones((2, cfg.gen.style_dim), np.float32)
    outs = []
    for cp in (gen_path, other_path):
        exported, _ = export_translator(cfg, cp, batch_size=2, size=16,
                                        platforms=("cpu",))
        outs.append(np.asarray(exported.call(x, z)["image"]))
    assert not np.array_equal(outs[0], outs[1])


def test_export_for_tpu_from_cpu(ckpt):
    """Cross-platform lowering: a TPU(+CPU) artifact serializes on a CPU-only
    box (export is AOT — no execution happens at export time)."""
    cfg, gen_path = ckpt
    exported, meta = export_translator(cfg, gen_path, batch_size=1, size=16,
                                       platforms=("tpu", "cpu"))
    assert set(p.lower() for p in exported.platforms) == {"tpu", "cpu"}
    assert len(bytes(exported.serialize())) > 0
    assert meta["platforms"] == ["tpu", "cpu"]


def test_export_validates_inputs(ckpt, tmp_path):
    cfg, gen_path = ckpt
    with pytest.raises(ValueError, match="stride"):
        export_translator(cfg, gen_path, size=10, platforms=("cpu",))
    with pytest.raises(ValueError, match="batch_size"):
        export_translator(cfg, gen_path, batch_size=0, size=16,
                          platforms=("cpu",))
    bad = tmp_path / "not_an_artifact.aclx"
    bad.write_bytes(b"NOTMAGIC" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        load_artifact(str(bad))


def test_async_serving_over_artifact(artifact):
    """AsyncTranslator duck-types over an ExportedTranslator: coalesced
    async requests serve from the frozen artifact."""
    from aclgan_tpu.serving import AsyncTranslator

    cfg, _, path = artifact
    frozen = ExportedTranslator(path, seed=2)
    with AsyncTranslator(frozen, max_wait_ms=1.0) as srv:
        futs = [srv.submit(np.zeros((16, 16, 3), np.uint8),
                           style=np.full((cfg.gen.style_dim,), i, np.float32))
                for i in range(3)]
        outs = [f.result(timeout=60) for f in futs]
        with pytest.raises(ValueError, match="style must have"):
            srv.submit(np.zeros((16, 16, 3), np.uint8),
                       style=np.zeros(3, np.float32)).result(timeout=60)
    assert all(o.shape == (16, 16, 3) and o.dtype == np.uint8 for o in outs)
    assert not np.array_equal(outs[0], outs[1])  # styles differ


def test_export_cli(artifact, tmp_path, capsys):
    from aclgan_tpu.cli.export import main as export_main
    from aclgan_tpu.config import save_config

    cfg, gen_path, _ = artifact
    cfg_path = str(tmp_path / "tiny.yaml")
    save_config(cfg, cfg_path)
    out_path = str(tmp_path / "cli.aclx")
    export_main(["--config", cfg_path, "--checkpoint", gen_path,
                 "--output", out_path, "--batch", "2", "--size", "16",
                 "--platforms", "cpu"])
    assert "wrote" in capsys.readouterr().out
    tr = ExportedTranslator(out_path, seed=1)
    out = tr([np.zeros((16, 16, 3), np.uint8)])
    assert out[0].shape == (16, 16, 3)
