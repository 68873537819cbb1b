"""Distributed-equivalence tests on the 8-device CPU mesh (SURVEY §4):
data-parallel training must match single-device training on the same global
batch, because per-sample norms make every loss term a mean over samples."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from aclgan_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from aclgan_tpu.trainer import ACLGAN
from tests.helpers import tiny_config


def _flat(tree):
    return jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                            for x in jax.tree_util.tree_leaves(tree)])


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    cfg = tiny_config()
    cfg.batch_size = 8
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x_a = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3), minval=-1, maxval=1)
    x_b = jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3), minval=-1, maxval=1)
    return cfg, model, state, x_a, x_b


def test_dp_losses_match_single_device(setup):
    cfg, model, state, x_a, x_b = setup
    key = jax.random.PRNGKey(3)

    _, single_metrics = model.train_step(state, x_a, x_b, key, True, True)

    mesh = make_mesh(8)
    bsh = batch_sharding(mesh)
    state_r = replicate(state, mesh)
    x_a_s = jax.device_put(x_a, bsh)
    x_b_s = jax.device_put(x_b, bsh)
    _, dp_metrics = model.train_step(state_r, x_a_s, x_b_s, key, True, True)

    for name in single_metrics:
        np.testing.assert_allclose(float(single_metrics[name]),
                                   float(dp_metrics[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_dp_gradients_match_single_device(setup):
    """Gradient equivalence in relative L2 (param-update comparison is too
    brittle: Adam step 1 is ±lr·sign(g), so reduction-order noise on
    near-zero gradients flips signs)."""
    cfg, model, state, x_a, x_b = setup
    b = x_a.shape[0]
    zs = [jax.random.normal(jax.random.PRNGKey(20 + i), (b, cfg.gen.style_dim))
          for i in range(3)]

    def gen_grads(gp, dp, ds, xa, xb):
        grad_fn = jax.grad(model._gen_loss_fn, has_aux=True)
        g, _ = grad_fn(gp, dp, ds, state.dis_stats, xa, xb, *zs)
        return g

    gen_grads_j = jax.jit(gen_grads)
    g_single = gen_grads_j(state.gen_params, state.dis_params,
                           state.dis_spectral, x_a, x_b)

    mesh = make_mesh(8)
    bsh = batch_sharding(mesh)
    g_dp = gen_grads_j(replicate(state.gen_params, mesh),
                       replicate(state.dis_params, mesh),
                       replicate(state.dis_spectral, mesh),
                       jax.device_put(x_a, bsh), jax.device_put(x_b, bsh))

    fs, fd = np.asarray(_flat(g_single)), np.asarray(_flat(g_dp))
    rel = np.linalg.norm(fs - fd) / (np.linalg.norm(fs) + 1e-12)
    assert rel < 1e-3, rel  # f32 reduction-order noise is ~1e-4


def test_dp_output_shardings_replicated_params(setup):
    """Params must come back replicated (no unintended resharding)."""
    cfg, model, state, x_a, x_b = setup
    mesh = make_mesh(8)
    state_r = replicate(state, mesh)
    x_a_s = jax.device_put(x_a, batch_sharding(mesh))
    x_b_s = jax.device_put(x_b, batch_sharding(mesh))
    new_state, _ = model.train_step(state_r, x_a_s, x_b_s,
                                    jax.random.PRNGKey(0), True, True)
    leaf = jax.tree_util.tree_leaves(new_state.gen_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_mesh_helpers():
    mesh = make_mesh(4)
    assert mesh.devices.shape == (4,)
    assert mesh.axis_names == ("data",)
    with pytest.raises(ValueError):
        make_mesh(1000)
