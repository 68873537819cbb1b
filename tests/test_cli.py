"""End-to-end CLI smoke tests on a miniature config (SURVEY §4 integration):
train 4 iterations -> checkpoint + logs + grids; resume; single-image test CLI
from the produced checkpoint."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import yaml


@pytest.fixture(scope="module")
def mini_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    cfg = {
        "image_save_iter": 4, "image_display_iter": 2, "display_size": 2,
        "snapshot_save_iter": 2, "log_iter": 1,
        "max_iter": 4, "batch_size": 2, "weight_decay": 0.0001,
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
        "new_size": 16, "crop_image_height": 16, "crop_image_width": 16,
        "data_kind": "mini", "synthetic": True,
        "tpu": {"compute_dtype": "float32", "use_pallas": False,
                "donate_state": False},
    }
    path = root / "mini.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path), str(root)


def test_train_cli_end_to_end(mini_yaml):
    from aclgan_tpu.cli.train import main

    cfg_path, out_root = mini_yaml
    main(["--config", cfg_path, "--output_path", out_root])

    run = os.path.join(out_root, "outputs", "mini")
    ckpts = os.listdir(os.path.join(run, "checkpoints"))
    assert any(f.startswith("gen_") for f in ckpts)
    assert any(f.startswith("dis_") for f in ckpts)
    assert "optimizer.msgpack" in ckpts
    assert os.path.exists(os.path.join(run, "config.yaml"))
    assert os.path.exists(os.path.join(run, "images", "gen_a2b_train_current.jpg"))
    assert os.path.exists(os.path.join(run, "index.html"))
    scalars = os.path.join(out_root, "logs", "mini", "scalars.jsonl")
    with open(scalars) as f:
        recs = [json.loads(line) for line in f]
    assert any("loss_gen_total" in r for r in recs)
    assert all(np.isfinite(r.get("loss_dis_total", 0.0)) for r in recs)


def test_train_cli_resume(mini_yaml):
    from aclgan_tpu.cli.train import main

    cfg_path, out_root = mini_yaml
    main(["--config", cfg_path, "--output_path", out_root,
          "--resume", "--max_iter", "6"])
    ckpts = os.listdir(os.path.join(out_root, "outputs", "mini", "checkpoints"))
    assert any(f.startswith("gen_000000") for f in ckpts)


def test_test_cli_from_checkpoint(mini_yaml, tmp_path):
    from aclgan_tpu.cli.test import main
    from aclgan_tpu.utils.checkpoint import get_model_list

    cfg_path, out_root = mini_yaml
    ckpt = get_model_list(os.path.join(out_root, "outputs", "mini", "checkpoints"), "gen")
    assert ckpt

    img_path = tmp_path / "in.jpg"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (24, 24, 3), dtype=np.uint8)).save(img_path)
    out_dir = tmp_path / "out"
    main(["--config", cfg_path, "--input", str(img_path),
          "--output_folder", str(out_dir), "--checkpoint", ckpt,
          "--num_style", "2", "--seed", "3"])
    files = sorted(os.listdir(out_dir))
    assert "output000.jpg" in files and "output001.jpg" in files
    assert "output000_mask.jpg" in files and "input.jpg" in files


def test_train_cli_display_size_clamped(tmp_path):
    """A dataset smaller than display_size must clamp the display batch
    instead of shape-mismatching the jitted sample_fn (the reference crashes
    here, train.py:44-47)."""
    import numpy as np
    from PIL import Image

    from aclgan_tpu.cli.train import main

    root = tmp_path / "tiny"
    for sub in ("trainA", "trainB", "testA", "testB"):
        d = root / sub
        d.mkdir(parents=True)
        arr = np.random.RandomState(hash(sub) % 97).randint(
            0, 255, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / "only.jpg")

    cfg = {
        "image_save_iter": 1, "image_display_iter": 1, "display_size": 2,
        "snapshot_save_iter": 2, "log_iter": 1,
        "max_iter": 1, "batch_size": 1, "weight_decay": 0.0001,
        "beta1": 0.5, "beta2": 0.999, "init": "kaiming", "lr": 0.0001,
        "lr_policy": "step", "step_size": 100000, "gamma": 0.5,
        "gan_w": 1, "gan_cw": 0.2, "focus_loss": 0.025, "focus_delta": 0.001,
        "focus_upper": 0.5, "focus_lower": 0.3, "focus_epsilon": 0.01,
        "recon_x_w": 1, "vgg_w": 0, "alpha": 1, "G_update": 1, "D_update": 1,
        "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 8, "output_dim": 4,
                "activ": "relu", "n_downsample": 2, "n_res": 2,
                "pad_type": "reflect"},
        "dis": {"dim": 8, "norm": "none", "activ": "lrelu", "n_layer": 2,
                "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"},
        "input_dim_a": 3, "input_dim_b": 6, "num_workers": 0,
        "new_size": 16, "crop_image_height": 16, "crop_image_width": 16,
        "data_root": str(root),
        "tpu": {"compute_dtype": "float32", "use_pallas": False,
                "donate_state": False},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    main(["--config", str(cfg_path), "--output_path", str(tmp_path)])
    imgs = list((tmp_path / "outputs" / "tiny" / "images").glob("*.jpg"))
    assert imgs, "no display grids written"
