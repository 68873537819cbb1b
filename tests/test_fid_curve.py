"""Smoke test for tools/fid_curve.py — the snapshot-selection sweep.

The tool is the round-4 quality-benchmark deliverable (per-style FID spread +
bootstrap CI), so its code path gets an end-to-end run at miniature scale:
tiny model, 4-image testA/testB folders, one gen + one ema snapshot,
--styles 2 --bootstrap 2.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

import yaml


def _load_tool(name):
    path = os.path.join(os.path.dirname(__file__), "..", "tools", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def curve_run(tmp_path_factory):
    """Mini config + data folders + snapshots + fine-tuned-format inception."""
    import flax.serialization

    import jax

    from aclgan_tpu.config import load_config
    from aclgan_tpu.eval.inception import InceptionV3
    from aclgan_tpu.trainer import ACLGAN

    root = tmp_path_factory.mktemp("fidcurve")
    data_root = root / "data"
    rng = np.random.RandomState(0)
    for sub in ("testA", "testB"):
        d = data_root / sub
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=92)

    cfg_dict = {
        "image_save_iter": 4, "image_display_iter": 2, "display_size": 2,
        "snapshot_save_iter": 2, "log_iter": 1,
        "max_iter": 2, "batch_size": 2, "weight_decay": 0.0001,
        "beta1": 0.5, "beta2": 0.999, "init": "kaiming", "lr": 0.0001,
        "lr_policy": "step", "step_size": 100000, "gamma": 0.5,
        "gan_w": 1, "gan_cw": 0.2, "focus_loss": 0.025, "focus_delta": 0.001,
        "focus_upper": 0.5, "focus_lower": 0.3, "focus_epsilon": 0.01,
        "recon_x_w": 1, "vgg_w": 0, "alpha": 1, "G_update": 2, "D_update": 1,
        "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 8, "output_dim": 4,
                "activ": "relu", "n_downsample": 2, "n_res": 2,
                "pad_type": "reflect"},
        "dis": {"dim": 8, "norm": "none", "activ": "lrelu", "n_layer": 2,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
        "input_dim_a": 3, "input_dim_b": 6, "num_workers": 0,
        "new_size": 32, "crop_image_height": 32, "crop_image_width": 32,
        "data_root": str(data_root),
        "tpu": {"compute_dtype": "float32", "use_pallas": False,
                "donate_state": False},
    }
    cfg_path = root / "mini.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))

    # snapshots: fresh-init weights in the gen/ema file format
    cfg = load_config(str(cfg_path))
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    run_dir = root / "outputs" / "mini"
    ckpt_dir = run_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    blob = flax.serialization.to_bytes(jax.device_get(state.gen_params))
    (ckpt_dir / "gen_00000002.msgpack").write_bytes(blob)
    (ckpt_dir / "ema_00000002.msgpack").write_bytes(blob)

    # fine-tuned-protocol inception weights (2-class, flax msgpack)
    inception = InceptionV3(num_classes=2)
    variables = inception.init(jax.random.PRNGKey(1),
                               np.zeros((1, 75, 75, 3), np.float32))
    w_path = root / "inception.msgpack"
    w_path.write_bytes(flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, dict(variables))))
    return str(cfg_path), str(run_dir), str(w_path)


def test_fid_curve_styles_and_bootstrap(curve_run, monkeypatch):
    cfg_path, run_dir, w_path = curve_run
    tool = _load_tool("fid_curve.py")
    monkeypatch.setattr(sys, "argv", [
        "fid_curve.py", "--config", cfg_path, "--run_dir", run_dir,
        "--inception_weights", w_path, "--n", "4", "--batch", "4",
        "--styles", "2", "--bootstrap", "2"])
    tool.main()

    out = json.load(open(os.path.join(run_dir, "fid_curve_gen.json")))
    assert out["styles"] == 2 and out["bootstrap"] == 2
    (row,) = out["rows"]
    assert row["iteration"] == 2
    assert np.isfinite(row["fid"])
    assert len(row["fid_styles"]) == 2
    assert all(np.isfinite(v) for v in row["fid_styles"])
    assert row["fid_spread"] >= 0
    lo, hi = row["fid_ci95"]
    assert np.isfinite(lo) and np.isfinite(hi) and lo <= hi
    assert lo >= 0.0  # FID is non-negative; the recentered CI is clipped
    # the f32-vs-f64 formulation discrepancy is recorded for transparency
    assert np.isfinite(row["fid_f32_minus_f64"])
    # fid is the mean of the per-style FIDs
    assert abs(row["fid"] - np.mean(row["fid_styles"])) < 1e-2


def test_fid_curve_ema_prefix(curve_run, monkeypatch):
    """--prefix ema sweeps the ema_* family and writes its own JSON."""
    cfg_path, run_dir, w_path = curve_run
    tool = _load_tool("fid_curve.py")
    monkeypatch.setattr(sys, "argv", [
        "fid_curve.py", "--config", cfg_path, "--run_dir", run_dir,
        "--inception_weights", w_path, "--n", "4", "--batch", "4",
        "--prefix", "ema"])
    tool.main()
    out = json.load(open(os.path.join(run_dir, "fid_curve_ema.json")))
    assert out["prefix"] == "ema"
    assert out["rows"][0]["iteration"] == 2
    assert out["complete"] is True


def test_fid_curve_start_after_merges_partial(curve_run, monkeypatch):
    """An interrupted sweep resumes: --start_after skips done snapshots and
    merges their rows from the (incrementally written) output file."""
    import shutil

    cfg_path, run_dir, w_path = curve_run
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    extra = os.path.join(ckpt_dir, "gen_00000004.msgpack")
    shutil.copyfile(os.path.join(ckpt_dir, "gen_00000002.msgpack"), extra)
    out_path = os.path.join(run_dir, "fid_curve_gen.json")
    # simulate the partial earlier run: one row, marked incomplete; metadata
    # matches the resuming invocation (required since the ADVICE r4 fix)
    prior_row = {"iteration": 2, "fid": 123.456,
                 "target_domain_rate": 0.5, "n_fake": 4, "n_real": 4}
    json.dump({"rows": [prior_row], "best": prior_row, "n": 4, "styles": 1,
               "bootstrap": 0, "prefix": "gen", "complete": False, "ci": None,
               "protocol": "synchronized 2x style, eval blend, pool3 FID"},
              open(out_path, "w"))
    try:
        tool = _load_tool("fid_curve.py")
        monkeypatch.setattr(sys, "argv", [
            "fid_curve.py", "--config", cfg_path, "--run_dir", run_dir,
            "--inception_weights", w_path, "--n", "4", "--batch", "4",
            "--start_after", "2"])
        tool.main()
        out = json.load(open(out_path))
        assert [r["iteration"] for r in out["rows"]] == [2, 4]
        assert out["rows"][0]["fid"] == 123.456  # preserved, not recomputed
        assert np.isfinite(out["rows"][1]["fid"])
        assert out["complete"] is True
    finally:
        os.remove(extra)


def test_fid_curve_start_after_refuses_mismatched_prior(curve_run,
                                                        monkeypatch):
    """Merging rows computed under different flags (n, styles, bootstrap,
    protocol) is refused: FID is strongly n-biased, so a mixed `best` would
    compare incomparable numbers (ADVICE r4)."""
    import shutil

    cfg_path, run_dir, w_path = curve_run
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    extra = os.path.join(ckpt_dir, "gen_00000004.msgpack")
    shutil.copyfile(os.path.join(ckpt_dir, "gen_00000002.msgpack"), extra)
    out_path = os.path.join(run_dir, "fid_curve_gen.json")
    prior_row = {"iteration": 2, "fid": 1.0,
                 "target_domain_rate": 0.5, "n_fake": 500, "n_real": 500}
    json.dump({"rows": [prior_row], "best": prior_row, "n": 500, "styles": 3,
               "bootstrap": 100, "prefix": "gen", "complete": False,
               "ci": None,
               "protocol": "synchronized 2x style, eval blend, pool3 FID"},
              open(out_path, "w"))
    tool = _load_tool("fid_curve.py")
    monkeypatch.setattr(sys, "argv", [
        "fid_curve.py", "--config", cfg_path, "--run_dir", run_dir,
        "--inception_weights", w_path, "--n", "4", "--batch", "4",
        "--start_after", "2"])
    try:
        with pytest.raises(SystemExit, match="merge refused"):
            tool.main()
    finally:
        os.remove(out_path)
        os.remove(extra)
