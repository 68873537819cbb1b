"""Config-variant coverage: the selectable-but-unused-by-male2female menu
(networks.py:312-418 norm/act options, nsgan loss, spectral norm) must train.
"""

import numpy as np

import jax

from aclgan_tpu.trainer import ACLGAN
from tests.helpers import tiny_config


def _step(cfg):
    # minimal topology: these tests exercise op/loss variants, not scale.
    # (16x16 is the floor: the style encoder always has 4 stride-2 convs,
    # networks.py:126, so smaller inputs reach zero spatial size)
    cfg.gen.dim = 4
    cfg.gen.mlp_dim = 8
    cfg.gen.n_res = 1
    cfg.dis.dim = 4
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    new_state, metrics = model.train_step(state, x, x, jax.random.PRNGKey(2),
                                          True, True)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    return model, state, new_state, metrics


def test_nsgan_spectral_prelu_zero_pad():
    cfg = tiny_config()
    cfg.dis.gan_type = "nsgan"
    cfg.dis.norm = "sn"
    cfg.dis.activ = "prelu"
    cfg.dis.pad_type = "zero"
    cfg.init = "xavier"
    model, state, new_state, metrics = _step(cfg)
    # spectral u/v vectors exist and were power-iterated in the D step
    u_before = jax.tree_util.tree_leaves(state.dis_spectral["A"])[0]
    u_after = jax.tree_util.tree_leaves(new_state.dis_spectral["A"])[0]
    assert u_before.shape == u_after.shape
    assert not np.allclose(np.asarray(u_before), np.asarray(u_after))


def test_selu_gaussian_init_no_focus_constant_lr():
    cfg = tiny_config()
    cfg.focus_loss = 0.0
    cfg.gen.output_dim = 3
    cfg.gen.activ = "selu"
    cfg.init = "gaussian"
    cfg.lr_policy = "constant"
    cfg.alpha = 0.5
    _step(cfg)


def test_dis_instance_norm_variant():
    cfg = tiny_config()
    cfg.dis.norm = "in"
    _step(cfg)


def test_dis_layer_norm_variant():
    cfg = tiny_config()
    cfg.dis.norm = "ln"
    _step(cfg)


def test_dis_batch_norm_variant(tmp_path):
    """dis.norm='bn' (networks.py:330-331): trains, advances running stats
    once per train-mode D forward, and round-trips them through a snapshot."""
    cfg = tiny_config()
    cfg.dis.norm = "bn"
    model, state, new_state, _ = _step(cfg)
    mean0 = jax.tree_util.tree_leaves(state.dis_stats["A"])
    mean1 = jax.tree_util.tree_leaves(new_state.dis_stats["A"])
    assert mean0 and len(mean0) == len(mean1)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(mean0, mean1))

    from aclgan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path), new_state, 0)
    restored, it, _ = load_checkpoint(str(tmp_path), state)
    assert it == 1
    for a, b in zip(jax.tree_util.tree_leaves(new_state.dis_stats),
                    jax.tree_util.tree_leaves(restored.dis_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_checkpoint_config_mismatch_rejected(tmp_path):
    """A snapshot written under dis.norm='none' must be refused by a 'bn'
    config (and vice versa) with a clear error, not a deep flax failure."""
    import pytest

    from aclgan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = tiny_config()
    model, state, _, _ = _step(cfg)
    save_checkpoint(str(tmp_path), state, 0)

    cfg_bn = tiny_config()
    cfg_bn.dis.norm = "bn"
    model_bn, state_bn, _, _ = _step(cfg_bn)
    with pytest.raises(RuntimeError, match="dis.norm"):
        load_checkpoint(str(tmp_path), state_bn)
