"""Trainer integration tests: step semantics, gradient isolation, schedules.

Mirrors the test strategy SURVEY §4 derives for the (test-less) reference:
2-iteration training on tiny synthetic data with finite losses, both
optimizers stepping, and parameter isolation between the D and G updates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aclgan_tpu.trainer import ACLGAN
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    ka, kb = jax.random.split(key)
    x_a = jax.random.uniform(ka, (cfg.batch_size, 16, 16, 3), minval=-1, maxval=1)
    x_b = jax.random.uniform(kb, (cfg.batch_size, 16, 16, 3), minval=-1, maxval=1)
    return cfg, model, state, x_a, x_b


def _flat(tree):
    return jnp.concatenate([x.reshape(-1) for x in jax.tree_util.tree_leaves(tree)])


def test_train_step_runs_and_metrics_finite(setup):
    cfg, model, state, x_a, x_b = setup
    new_state, metrics = model.train_step(state, x_a, x_b, jax.random.PRNGKey(2),
                                          True, True)
    # the reference's full scalar set (trainer.py attrs picked up by
    # write_loss reflection, utils.py:174-178)
    for name in ["loss_dis_A", "loss_dis_B", "loss_dis_2", "loss_dis_total",
                 "loss_gen_adv_A", "loss_gen_adv_B", "loss_gen_adv_2",
                 "loss_gen_focus_A_size", "loss_gen_focus_A_digit",
                 "loss_gen_focus_B_size", "loss_gen_focus_B_digit",
                 "loss_gen_focus_A2_size", "loss_gen_focus_A2_digit",
                 "loss_idt_A", "loss_idt_B", "loss_gen_total"]:
        assert name in metrics, name
        assert np.isfinite(float(metrics[name])), name
    assert int(new_state.step) == 1


def test_dis_only_step_leaves_gen_unchanged(setup):
    cfg, model, state, x_a, x_b = setup
    new_state, metrics = model.train_step(state, x_a, x_b, jax.random.PRNGKey(3),
                                          True, False)
    assert "loss_gen_total" not in metrics
    np.testing.assert_array_equal(np.asarray(_flat(new_state.gen_params)),
                                  np.asarray(_flat(state.gen_params)))
    assert float(jnp.abs(_flat(new_state.dis_params) - _flat(state.dis_params)).max()) > 0


def test_gen_only_step_leaves_dis_unchanged(setup):
    cfg, model, state, x_a, x_b = setup
    new_state, metrics = model.train_step(state, x_a, x_b, jax.random.PRNGKey(4),
                                          False, True)
    assert "loss_dis_total" not in metrics
    np.testing.assert_array_equal(np.asarray(_flat(new_state.dis_params)),
                                  np.asarray(_flat(state.dis_params)))
    assert float(jnp.abs(_flat(new_state.gen_params) - _flat(state.gen_params)).max()) > 0


def test_two_iterations_losses_evolve(setup):
    cfg, model, state, x_a, x_b = setup
    s1, m1 = model.train_step(state, x_a, x_b, jax.random.PRNGKey(5), True, True)
    s2, m2 = model.train_step(s1, x_a, x_b, jax.random.PRNGKey(6), True, True)
    assert int(s2.step) == 2
    assert np.isfinite(float(m2["loss_gen_total"]))
    # optimizer state advanced (adam count)
    counts = [x for x in jax.tree_util.tree_leaves(s2.gen_opt_state)
              if getattr(x, "dtype", None) == jnp.int32]
    assert any(int(c) == 2 for c in counts)


def test_step_lr_schedule():
    """StepLR: lr * gamma^(it // step_size), stepped per iteration
    (utils.py:263-271, train.py:101)."""
    cfg = tiny_config()
    model = ACLGAN(cfg)
    assert float(model.learning_rate(jnp.asarray(0))) == pytest.approx(1e-4)
    assert float(model.learning_rate(jnp.asarray(99999))) == pytest.approx(1e-4)
    assert float(model.learning_rate(jnp.asarray(100000))) == pytest.approx(5e-5)
    assert float(model.learning_rate(jnp.asarray(250000))) == pytest.approx(2.5e-5)


def test_no_focus_variant():
    """focus_loss=0 => 3-channel decoder output, no masks, x_B_recon present."""
    cfg = tiny_config()
    cfg.focus_loss = 0.0
    cfg.gen.output_dim = 3
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    new_state, metrics = model.train_step(state, x, x, jax.random.PRNGKey(2), True, True)
    assert "loss_gen_focus_A_size" not in metrics
    assert np.isfinite(float(metrics["loss_gen_total"]))


def test_sample_outputs(setup):
    """Focus-branch sample returns the 9-tuple grid rows (trainer.py:230-237)."""
    cfg, model, state, x_a, x_b = setup
    b = cfg.display_size
    zs = [jax.random.normal(jax.random.PRNGKey(10 + i), (b, cfg.gen.style_dim))
          for i in range(3)]
    outs = model.sample(state.gen_params, x_a[:b], x_b[:b], *zs)
    assert len(outs) == 9
    for i, o in enumerate(outs):
        assert o.shape[0] == b
        assert np.isfinite(np.asarray(o, np.float32)).all(), i


def test_adam_weight_decay_is_coupled_l2():
    """torch Adam weight_decay adds wd*param to the gradient before moments
    (trainer.py:39-42). Check one update against a hand-computed torch-Adam
    step on a single-parameter problem."""
    import optax

    cfg = tiny_config()
    wd, lr, b1, b2, eps = cfg.weight_decay, cfg.lr, cfg.beta1, cfg.beta2, 1e-8
    model = ACLGAN(cfg)
    p0 = {"w": jnp.asarray([2.0])}
    g = {"w": jnp.asarray([0.5])}
    opt_state = model.tx.init(p0)
    updates, _ = model.tx.update(g, opt_state, p0)
    new_p = optax.apply_updates(p0, jax.tree_util.tree_map(lambda u: -lr * u, updates))

    # torch-Adam step 1: g' = g + wd*p ; m = (1-b1)g' ; v = (1-b2)g'^2
    # mhat = m/(1-b1) = g' ; vhat = v/(1-b2) = g'^2 ; p -= lr * mhat/(sqrt(vhat)+eps)
    gp = 0.5 + wd * 2.0
    want = 2.0 - lr * gp / (np.sqrt(gp ** 2) + eps)
    np.testing.assert_allclose(np.asarray(new_p["w"]), [want], rtol=1e-6)


def test_sample_outputs_no_focus():
    """Non-focus sample returns the 7-tuple incl. x_B_recon (trainer.py:239-245;
    per-sample semantics — the reference's full-batch x_B_recon bug is fixed)."""
    cfg = tiny_config()
    cfg.focus_loss = 0.0
    cfg.gen.output_dim = 3
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    b = 2
    x_a = jax.random.uniform(jax.random.PRNGKey(1), (b, 16, 16, 3), minval=-1, maxval=1)
    x_b = jax.random.uniform(jax.random.PRNGKey(2), (b, 16, 16, 3), minval=-1, maxval=1)
    zs = [jax.random.normal(jax.random.PRNGKey(3 + i), (b, cfg.gen.style_dim))
          for i in range(3)]
    outs = model.sample(state.gen_params, x_a, x_b, *zs)
    assert len(outs) == 7
    for o in outs:
        assert o.shape == (b, 16, 16, 3)
        assert np.isfinite(np.asarray(o, np.float32)).all()


@pytest.mark.parametrize("remat", ["decode", "encode", "all"])
def test_selective_remat_matches_no_remat(remat):
    """jax.checkpoint is semantics-preserving: the generator loss and its
    gradients with any remat family selected must match remat=False up to
    f32 fusion noise (TPU memory knob for batch 32, BENCH_NOTES.md).
    Post-Adam params are NOT compared — at step 1 Adam normalizes each grad
    to ±lr, so a 1e-7 wiggle on a near-zero grad flips the whole update."""
    def run(r):
        cfg = tiny_config()
        cfg.tpu.remat = r
        model = ACLGAN(cfg)
        state = model.init_state(jax.random.PRNGKey(0))
        x_a = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                                 minval=-1, maxval=1)
        x_b = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3),
                                 minval=-1, maxval=1)
        z1, z2, z3 = model._draw_z(jax.random.PRNGKey(3), 2)

        @jax.jit
        def loss_and_grad(gp):
            return jax.value_and_grad(
                lambda p: model._gen_loss_fn(p, state.dis_params,
                                             state.dis_spectral,
                                             state.dis_stats,
                                             x_a, x_b, z1, z2, z3)[0])(gp)

        loss, grads = loss_and_grad(state.gen_params)
        return float(loss), np.asarray(_flat(grads))

    l0, g0 = run(False)
    l1, g1 = run(remat)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    # measured CPU fusion noise: p99.9 absdiff 7.6e-5, max absdiff ~2e-4 —
    # the recomputed backward regroups f32 conv reductions. atol sits 3 OOM
    # below the p99 grad magnitude (0.3)
    np.testing.assert_allclose(g0, g1, rtol=1e-3, atol=2.5e-4)


def test_remat_rejects_unknown_value():
    cfg = tiny_config()
    cfg.tpu.remat = "bogus"
    model = ACLGAN(cfg)
    with pytest.raises(ValueError, match="tpu.remat"):
        _ = model._remat_set


def test_bf16_moment_dtype():
    """tpu.moment_dtype=bfloat16 stores Adam mu in bf16 and still trains."""
    cfg = tiny_config()
    cfg.tpu.moment_dtype = "bfloat16"
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    mus = [l for l in jax.tree_util.tree_leaves(state.gen_opt_state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment buffers found in the optimizer state"
    x_a = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                             minval=-1, maxval=1)
    x_b = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3),
                             minval=-1, maxval=1)
    new_state, metrics = model.train_step(state, x_a, x_b,
                                          jax.random.PRNGKey(3), True, True)
    assert np.isfinite(float(metrics["loss_gen_total"]))
    assert not np.array_equal(np.asarray(_flat(new_state.gen_params)),
                              np.asarray(_flat(state.gen_params)))


def test_train_step_uint8_inputs_match_float(setup):
    """train_step on raw uint8 batches equals train_step on the host-
    normalized float batches (tpu.uint8_transfer path)."""
    import numpy as np

    _, model, state, x_a, x_b = setup
    rng = np.random.default_rng(11)
    ua = rng.integers(0, 256, x_a.shape, dtype=np.uint8)
    ub = rng.integers(0, 256, x_b.shape, dtype=np.uint8)
    fa = ua.astype(np.float32) * (2.0 / 255.0) - 1.0
    fb = ub.astype(np.float32) * (2.0 / 255.0) - 1.0
    _, m_u = model.train_step(state, jnp.asarray(ua), jnp.asarray(ub),
                              jax.random.PRNGKey(8), True, True)
    _, m_f = model.train_step(state, jnp.asarray(fa), jnp.asarray(fb),
                              jax.random.PRNGKey(8), True, True)
    # not bitwise: XLA fuses the in-graph normalize into the bf16 input cast,
    # so inputs can differ by 1 ulp of bf16 from the host-normalized path
    for k in m_f:
        assert float(m_u[k]) == pytest.approx(float(m_f[k]), rel=1e-4), k


def test_step_increment_tracks_global_iteration(setup):
    """Cadences that skip BOTH updates on some iterations (e.g. D_update=2,
    G_update=2) must still advance state.step per loop iteration — the
    reference steps its LR scheduler unconditionally every iteration
    (train.py:101). The CLI folds skipped iterations into the next call's
    static step_increment."""
    cfg, model, state, x_a, x_b = setup
    key = jax.random.PRNGKey(3)

    # reference loop over global iterations 0..4 with D_update=G_update=2:
    # updates run at it 0, 2, 4; its 1 and 3 are skipped entirely
    s = state
    pending = 0
    for it in range(5):
        if it % 2 == 0:
            s, m = model.train_step(s, x_a, x_b, key, True, True, 1 + pending)
            pending = 0
        else:
            pending += 1
    # 5 iterations processed (none pending): step == the global count
    assert int(s.step) == 5

    # increment=1 must stay bitwise-identical to the implicit default
    a, _ = model.train_step(state, x_a, x_b, key, True, True)
    b, _ = model.train_step(state, x_a, x_b, key, True, True, 1)
    np.testing.assert_array_equal(np.asarray(_flat(a.gen_params)),
                                  np.asarray(_flat(b.gen_params)))
    assert int(a.step) == int(b.step) == int(state.step) + 1

    # the skipped iterations change the fold_in stream exactly as if the
    # executed iteration's global index were used: a call at global it=2
    # (inc=2 from step=1... i.e. pre-advanced) equals a call whose state
    # already counted the skipped iteration
    s1, m1 = model.train_step(state.replace(step=state.step + 1),
                              x_a, x_b, key, True, True, 2)
    s2, m2 = model.train_step(state.replace(step=state.step + 2),
                              x_a, x_b, key, True, True, 1)
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=0, atol=0)
    assert int(s1.step) == int(s2.step) == 3
