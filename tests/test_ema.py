"""EMA generator weights (tpu.ema_decay): update math, checkpoint contract,
serving compatibility. Off by default (the reference has no EMA)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from tests.helpers import tiny_config


def _ema_cfg(decay=0.5):
    cfg = tiny_config()
    cfg.tpu.ema_decay = decay
    return cfg


def _max_diff(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
    return max(jax.tree_util.tree_leaves(leaves))


@pytest.fixture(scope="module")
def stepped():
    """One D+G step with decay 0.5 (big decay so diffs are visible)."""
    model = ACLGAN(_ema_cfg())
    state0 = model.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                           minval=-1, maxval=1)
    state1, _ = model.train_step(state0, x, x, jax.random.PRNGKey(2),
                                 True, True)
    return model, state0, state1, x


def test_ema_update_math(stepped):
    """ema_1 = d*ema_0 + (1-d)*params_1, with ema_0 = the init weights."""
    _, state0, state1, _ = stepped
    expected = jax.tree_util.tree_map(
        lambda e, p: 0.5 * e + 0.5 * p, state0.gen_params, state1.gen_params)
    assert _max_diff(state1.ema_params, expected) < 1e-7
    # and it is genuinely distinct from both endpoints
    assert _max_diff(state1.ema_params, state1.gen_params) > 0
    assert _max_diff(state1.ema_params, state0.gen_params) > 0


def test_ema_untouched_by_dis_only_step(stepped):
    model, _, state1, x = stepped
    state2, _ = model.train_step(state1, x, x, jax.random.PRNGKey(3),
                                 True, False)  # D-only iteration
    assert _max_diff(state2.ema_params, state1.ema_params) == 0


def test_ema_checkpoint_roundtrip_and_serving(stepped, tmp_path):
    model, _, state1, _ = stepped
    save_checkpoint(str(tmp_path), state1, iterations=0)
    assert (tmp_path / "ema_00000001.msgpack").exists()

    template = model.init_state(jax.random.PRNGKey(9))
    restored, it, _ = load_checkpoint(str(tmp_path), template)
    assert _max_diff(restored.ema_params, state1.ema_params) == 0

    # the ema file is a drop-in gen checkpoint: serve it directly
    from aclgan_tpu.serving import Translator

    tr = Translator(_ema_cfg(), str(tmp_path / "ema_00000001.msgpack"),
                    batch_size=1, size=16)
    out = tr([np.zeros((16, 16, 3), np.uint8)])
    assert out[0].shape == (16, 16, 3)


def _ptr(leaf):
    if isinstance(leaf, np.ndarray):
        return leaf.__array_interface__["data"][0]
    return leaf.unsafe_buffer_pointer()


def _assert_no_buffer_aliasing(ema, gen):
    ptrs = {_ptr(leaf) for leaf in jax.tree_util.tree_leaves(gen)}
    for leaf in jax.tree_util.tree_leaves(ema):
        assert _ptr(leaf) not in ptrs


def test_ema_init_does_not_alias_gen_buffers():
    """Regression (r4): init seeded EMA with jnp.asarray — a no-op ALIAS of
    the gen param buffers. With tpu.donate_state (default on) the first
    train_step then donates the same PJRT buffer through two argument slots;
    the TPU runtime rejects that with an async InvalidArgument that killed
    every EMA training run ~100 iterations in (first materialization). CPU
    ignores donation, so only this aliasing assertion catches it off-chip."""
    model = ACLGAN(_ema_cfg())
    state = model.init_state(jax.random.PRNGKey(0))
    _assert_no_buffer_aliasing(state.ema_params, state.gen_params)


def test_ema_mid_run_seed_does_not_alias(tmp_path):
    """Same aliasing hazard on the resume path that seeds EMA from the live
    weights (checkpoint.py load_checkpoint)."""
    off = ACLGAN(tiny_config())
    state = off.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, iterations=0)
    on = ACLGAN(_ema_cfg())
    template = on.init_state(jax.random.PRNGKey(4))
    restored, _, _ = load_checkpoint(str(tmp_path), template)
    _assert_no_buffer_aliasing(restored.ema_params, restored.gen_params)


def test_ema_enabled_mid_run_seeds_from_gen(tmp_path, capsys):
    """Resuming an EMA-less snapshot with ema_decay newly on seeds the EMA
    from the live weights instead of failing."""
    off = ACLGAN(tiny_config())
    state = off.init_state(jax.random.PRNGKey(0))
    assert state.ema_params is None
    save_checkpoint(str(tmp_path), state, iterations=0)
    assert not (tmp_path / "ema_00000001.msgpack").exists()

    on = ACLGAN(_ema_cfg())
    template = on.init_state(jax.random.PRNGKey(4))
    restored, _, _ = load_checkpoint(str(tmp_path), template)
    assert "seeding EMA" in capsys.readouterr().out
    assert _max_diff(restored.ema_params, restored.gen_params) == 0


def test_ema_retention_prunes(stepped, tmp_path):
    model, _, state1, x = stepped
    save_checkpoint(str(tmp_path), state1, iterations=0, keep=1)
    state2, _ = model.train_step(state1, x, x, jax.random.PRNGKey(5),
                                 True, True)
    save_checkpoint(str(tmp_path), state2, iterations=1, keep=1)
    names = sorted(p.name for p in tmp_path.glob("ema_*.msgpack"))
    assert names == ["ema_00000002.msgpack"]
