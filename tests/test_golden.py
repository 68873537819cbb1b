"""Fixed-seed golden regression (SURVEY §4 'parity/regression'): pins the full
loss surface of one train step and a translate output on the tiny config.
Catches accidental semantic drift in any op/loss/init change. Values were
generated on CPU f32 with matmul precision 'highest' (tests/conftest.py).
"""

import pytest

import jax
import jax.numpy as jnp

from aclgan_tpu.trainer import ACLGAN
from tests.helpers import tiny_config

GOLDEN_METRICS = {
    # regenerated after train_step began deriving the per-iteration key as
    # fold_in(base_key, step) in-graph (the z draws moved)
    "loss_dis_2": 2.000438,
    "loss_dis_A": 2.000381,
    "loss_dis_B": 2.000756,
    "loss_dis_total": 4.401225,
    "loss_gen_adv_2": 1.999905,
    "loss_gen_adv_A": 1.999918,
    "loss_gen_adv_B": 1.999446,
    "loss_gen_focus_A2_digit": 7065.561523,
    "loss_gen_focus_A2_size": 0.658488,
    "loss_gen_focus_A_digit": 7963.907227,
    "loss_gen_focus_A_size": 0.924039,
    "loss_gen_focus_B_digit": 6185.440918,
    "loss_gen_focus_B_size": 0.544895,
    "loss_gen_total": 5.888464,
    "loss_idt_A": 0.554038,
    "loss_idt_B": 0.589752,
}
GOLDEN_TRANSLATE_MEAN = 0.1298891305923462
GOLDEN_MASK_MEAN = 0.2158968448638916


def test_train_step_metrics_golden():
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x_a = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    x_b = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), minval=-1, maxval=1)
    _, metrics = model.train_step(state, x_a, x_b, jax.random.PRNGKey(3), True, True)
    assert set(metrics) == set(GOLDEN_METRICS)
    for name, want in GOLDEN_METRICS.items():
        assert float(metrics[name]) == pytest.approx(want, rel=2e-3), name


def test_translate_golden():
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    x_a = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.gen.style_dim))
    img, mask = model.translate(state.gen_params, x_a, z)
    assert float(jnp.mean(img)) == pytest.approx(GOLDEN_TRANSLATE_MEAN, rel=1e-3)
    assert float(jnp.mean(mask)) == pytest.approx(GOLDEN_MASK_MEAN, rel=1e-3)
