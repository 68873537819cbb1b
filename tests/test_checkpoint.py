"""Checkpoint round-trip + discovery contract (trainer.py:301-331, utils.py:211-220)."""

import numpy as np

import jax
import jax.numpy as jnp

from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import (
    get_model_list,
    load_checkpoint,
    parse_iteration,
    save_checkpoint,
)
from tests.helpers import tiny_config


def _flat(tree):
    return jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                            for x in jax.tree_util.tree_leaves(tree)])


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    state, _ = model.train_step(state, x, x, jax.random.PRNGKey(2), True, True)

    save_checkpoint(str(tmp_path), state, iterations=int(state.step) - 1,
                    rng_key=jax.random.PRNGKey(42))
    template = model.init_state(jax.random.PRNGKey(99))
    restored, iterations, rng_key = load_checkpoint(str(tmp_path), template)
    # rng round-trips bit-exactly (resume-determinism upgrade over reference)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rng_key)),
                                  np.asarray(jax.random.key_data(jax.random.PRNGKey(42))))

    assert iterations == int(state.step)
    np.testing.assert_array_equal(np.asarray(_flat(restored.gen_params)),
                                  np.asarray(_flat(state.gen_params)))
    np.testing.assert_array_equal(np.asarray(_flat(restored.dis_params)),
                                  np.asarray(_flat(state.dis_params)))
    np.testing.assert_array_equal(np.asarray(_flat(restored.gen_opt_state)),
                                  np.asarray(_flat(state.gen_opt_state)))
    assert int(restored.step) == int(state.step)


def test_discovery_latest_and_iteration_parse(tmp_path):
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    for it in [3, 9, 12]:
        save_checkpoint(str(tmp_path), state, iterations=it)
    latest = get_model_list(str(tmp_path), "gen")
    assert latest.endswith("gen_00000013.msgpack")
    assert parse_iteration(latest) == 13
    assert get_model_list(str(tmp_path), "dis").endswith("dis_00000013.msgpack")
    assert get_model_list(str(tmp_path / "nope"), "gen") is None


def test_resume_continues_training(tmp_path):
    """Restored state produces identical next-step results to the original."""
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    state, _ = model.train_step(state, x, x, jax.random.PRNGKey(2), True, True)
    save_checkpoint(str(tmp_path), state, iterations=0)

    restored, _, rng_key = load_checkpoint(str(tmp_path), model.init_state(jax.random.PRNGKey(5)))
    assert rng_key is None  # this checkpoint was saved without an rng key
    s1, m1 = model.train_step(state, x, x, jax.random.PRNGKey(3), True, True)
    s2, m2 = model.train_step(restored, x, x, jax.random.PRNGKey(3), True, True)
    np.testing.assert_allclose(float(m1["loss_gen_total"]),
                               float(m2["loss_gen_total"]), rtol=1e-6)


def test_resume_reproduces_uninterrupted_stream(tmp_path):
    """4 straight steps == 2 steps + checkpoint + resume + 2 steps, bitwise.

    train_step derives its per-iteration key as fold_in(base_key, state.step)
    in-graph, so restoring (base key, step) reproduces the exact z stream —
    the guarantee the train CLI's --resume relies on (the reference restores
    weights/moments/iteration but loses its RNG stream, trainer.py:301-322)."""
    cfg = tiny_config()
    model = ACLGAN(cfg)
    base = jax.random.PRNGKey(7)
    x_a = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    x_b = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), minval=-1, maxval=1)
    state0 = model.init_state(jax.random.PRNGKey(0))

    cadence = [(True, True), (True, False)] * 2  # D every iter, G every 2nd

    su = state0
    for dd, dg in cadence:
        su, _ = model.train_step(su, x_a, x_b, base, dd, dg)

    si = state0
    for dd, dg in cadence[:2]:
        si, _ = model.train_step(si, x_a, x_b, base, dd, dg)
    save_checkpoint(str(tmp_path), si, iterations=int(si.step) - 1, rng_key=base)
    restored, _, rng = load_checkpoint(str(tmp_path), model.init_state(jax.random.PRNGKey(9)))
    for dd, dg in cadence[2:]:
        restored, _ = model.train_step(restored, x_a, x_b, rng, dd, dg)

    np.testing.assert_array_equal(np.asarray(_flat(su.gen_params)),
                                  np.asarray(_flat(restored.gen_params)))
    np.testing.assert_array_equal(np.asarray(_flat(su.dis_params)),
                                  np.asarray(_flat(restored.dis_params)))
    np.testing.assert_array_equal(np.asarray(_flat(su.gen_opt_state)),
                                  np.asarray(_flat(restored.gen_opt_state)))
    np.testing.assert_array_equal(np.asarray(_flat(su.dis_opt_state)),
                                  np.asarray(_flat(restored.dis_opt_state)))
    assert int(su.step) == int(restored.step)


def test_snapshot_set_mismatch_raises(tmp_path):
    """A crash between the three snapshot writes must be detected, not
    silently paired (optimizer.msgpack is rewritten in place while gen/dis
    are per-iteration; reference hazard at trainer.py:324-331)."""
    import os
    import pytest

    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, iterations=0)
    save_checkpoint(str(tmp_path), state, iterations=1)

    # crash after gen_2 but before dis_2: newest gen=2, newest dis=1
    os.remove(tmp_path / "dis_00000002.msgpack")
    with pytest.raises(RuntimeError, match="Snapshot set mismatch"):
        load_checkpoint(str(tmp_path), model.init_state(jax.random.PRNGKey(9)))

    # restore the pair but make the optimizer stamp stale (crash between
    # dis write and optimizer rewrite)
    save_checkpoint(str(tmp_path), state, iterations=1)
    import shutil
    other = tmp_path / "other"
    save_checkpoint(str(other), state, iterations=0)  # opt stamped iter 1
    shutil.copy(other / "optimizer.msgpack", tmp_path / "optimizer.msgpack")
    with pytest.raises(RuntimeError, match="Snapshot set mismatch"):
        load_checkpoint(str(tmp_path), model.init_state(jax.random.PRNGKey(9)))


def test_unstamped_optimizer_still_loads(tmp_path):
    """Pre-stamp snapshots (no saved_iteration key) remain loadable."""
    import flax.serialization

    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, iterations=3)
    legacy = {"gen": jax.device_get(state.gen_opt_state),
              "dis": jax.device_get(state.dis_opt_state),
              "step": np.int32(4)}
    with open(tmp_path / "optimizer.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(legacy))
    restored, iterations, _ = load_checkpoint(
        str(tmp_path), model.init_state(jax.random.PRNGKey(9)))
    assert iterations == 4 and int(restored.step) == 4


def test_first_snapshot_missing_dis_raises_diagnostic(tmp_path):
    """Crash between the gen and dis writes of the VERY FIRST snapshot: no
    dis file exists at all — must raise the torn-snapshot diagnostic, not an
    opaque TypeError from parse_iteration(None)."""
    import os
    import pytest

    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, iterations=0)
    os.remove(tmp_path / "dis_00000001.msgpack")
    with pytest.raises(RuntimeError, match="Snapshot set mismatch"):
        load_checkpoint(str(tmp_path), model.init_state(jax.random.PRNGKey(9)))


def test_missing_optimizer_requires_import_marker(tmp_path):
    """gen+dis present but optimizer.msgpack absent = torn first snapshot ->
    RuntimeError; with cli/convert.py's imported.marker it is a deliberate
    import and resumes with fresh moments."""
    import os
    import pytest

    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, iterations=0)
    os.remove(tmp_path / "optimizer.msgpack")

    with pytest.raises(RuntimeError, match="Snapshot set mismatch"):
        load_checkpoint(str(tmp_path), model.init_state(jax.random.PRNGKey(9)))

    (tmp_path / "imported.marker").touch()
    restored, it, rng = load_checkpoint(
        str(tmp_path), model.init_state(jax.random.PRNGKey(9)))
    assert it == 1 and rng is None
    assert int(restored.step) == 1
