"""Config schema: full reference key coverage, YAML round-trip, validation."""

import pytest
import yaml

from aclgan_tpu.config import Config, from_dict, load_config, save_config

# the exact top-level surface of configs/male2female.yaml (SURVEY §2.10)
REFERENCE_YAML = """
image_save_iter: 10000
image_display_iter: 1000
display_size: 16
snapshot_save_iter: 10000
log_iter: 1
max_iter: 350000
batch_size: 3
weight_decay: 0.0001
beta1: 0.5
beta2: 0.999
init: kaiming
lr: 0.0001
lr_policy: step
step_size: 100000
gamma: 0.5
gan_w: 1
gan_cw: 0.2
focus_loss: 0.025
focus_delta: 0.001
focus_upper: 0.5
focus_lower: 0.3
focus_epsilon: 0.01
recon_x_w: 1
recon_s_w: 1
recon_c_w: 1
recon_x_cyc_w: 1
vgg_w: 0
alpha: 1
G_update: 2
D_update: 1
gen:
  dim: 64
  mlp_dim: 256
  style_dim: 8
  output_dim: 4
  activ: relu
  n_downsample: 2
  n_res: 4
  pad_type: reflect
dis:
  dim: 64
  norm: none
  activ: lrelu
  n_layer: 4
  gan_type: lsgan
  num_scales: 3
  pad_type: reflect
input_dim_a: 3
input_dim_b: 6
num_workers: 8
new_size: 256
crop_image_height: 256
crop_image_width: 256
data_root: ./datasets/male2female
data_kind: male2female
"""


def test_reference_yaml_loads_fully():
    cfg = from_dict(yaml.safe_load(REFERENCE_YAML))
    assert cfg.max_iter == 350000
    assert cfg.batch_size == 3
    assert cfg.gan_cw == 0.2
    assert cfg.gen.style_dim == 8 and cfg.gen.output_dim == 4
    assert cfg.dis.num_scales == 3 and cfg.dis.gan_type == "lsgan"
    assert cfg.data.input_dim_b == 6
    assert cfg.data.data_root == "./datasets/male2female"
    assert cfg.use_focus
    # parsed-but-unused keys accepted like the reference (male2female.yaml:30-32)
    assert cfg.recon_s_w == 1 and cfg.recon_c_w == 1 and cfg.recon_x_cyc_w == 1


def test_defaults_match_male2female():
    """Config() defaults are the shipped male2female experiment."""
    cfg = Config()
    ref = from_dict(yaml.safe_load(REFERENCE_YAML))
    for f in ["max_iter", "lr", "gamma", "gan_w", "gan_cw", "focus_loss",
              "alpha", "G_update", "D_update"]:
        assert getattr(cfg, f) == getattr(ref, f), f


def test_new_size_ab_fallback():
    """new_size vs new_size_a/b key fallback (utils.py:46-50)."""
    cfg = from_dict({"new_size": 128})
    assert cfg.data.resolved_sizes() == (128, 128)
    cfg = from_dict({"new_size": None, "new_size_a": 100, "new_size_b": 200})
    assert cfg.data.resolved_sizes() == (100, 200)


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="Unknown config key"):
        from_dict({"not_a_key": 1})
    with pytest.raises(ValueError, match="Unknown gen config keys"):
        from_dict({"gen": {"bogus": 1}})


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.batch_size = 7
    cfg.gen.dim = 32
    path = tmp_path / "cfg.yaml"
    save_config(cfg, path)
    back = load_config(path)
    assert back.batch_size == 7
    assert back.gen.dim == 32
    assert back.tpu.compute_dtype == cfg.tpu.compute_dtype
