"""Parity tests for normalization ops against torch (used as an oracle).

The reference's semantics are defined by torch modules (networks.py:333,
477-536); asserting against torch CPU directly pins our reimplementation to
the same math without porting any reference code.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from aclgan_tpu.ops.norms import adaptive_instance_norm, instance_norm, sample_layer_norm

RTOL, ATOL = 1e-5, 1e-5


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_instance_norm_matches_torch():
    x = _rand((2, 5, 7, 3))  # NHWC
    got = np.asarray(instance_norm(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    want = torch.nn.InstanceNorm2d(3, affine=False)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_adain_matches_torch_batchnorm_trick():
    """AdaptiveInstanceNorm2d reshapes to (1, B*C, H, W) and calls batch_norm
    (networks.py:493-503); our direct IN + affine must match it."""
    b, h, w, c = 3, 6, 5, 4
    x = _rand((b, h, w, c))
    scale = _rand((b, c), seed=1)
    shift = _rand((b, c), seed=2)

    got = np.asarray(adaptive_instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()  # (B,C,H,W)
    x_reshaped = xt.view(1, b * c, h, w)
    weight = torch.from_numpy(scale).reshape(-1)
    bias = torch.from_numpy(shift).reshape(-1)
    running_mean = torch.zeros(b * c)
    running_var = torch.ones(b * c)
    out = F.batch_norm(x_reshaped, running_mean, running_var, weight, bias, True, 0.1, 1e-5)
    want = out.view(b, c, h, w).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch", [1, 4])
def test_sample_layer_norm_matches_reference_formula(batch):
    """Custom LayerNorm: per-sample full-tensor stats, Bessel std, (std+eps)
    divisor, per-channel affine (networks.py:520-536)."""
    c = 6
    x = _rand((batch, 4, 5, c))
    gamma = _rand((c,), seed=3)
    beta = _rand((c,), seed=4)
    got = np.asarray(sample_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW like the reference
    mean = xt.reshape(batch, -1).mean(1).view(batch, 1, 1, 1)
    std = xt.reshape(batch, -1).std(1).view(batch, 1, 1, 1)  # Bessel-corrected
    want = (xt - mean) / (std + 1e-5)
    want = want * torch.from_numpy(gamma).view(1, c, 1, 1) + torch.from_numpy(beta).view(1, c, 1, 1)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_instance_norm_bf16_input_f32_stats():
    x = _rand((2, 8, 8, 4))
    out = instance_norm(jnp.asarray(x, jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_torch_batch_norm_matches_torch_over_steps():
    """TorchBatchNorm (blocks' norm='bn', networks.py:330-331) vs
    nn.BatchNorm2d with default args: train-mode outputs, the running
    mean/var trajectory over 3 train steps (torch momentum convention AND
    the Bessel-corrected running-var update — the two ways flax's own
    BatchNorm observably differs), and the eval-mode output from those
    stats."""
    import jax

    from aclgan_tpu.ops.norms import TorchBatchNorm

    torch.manual_seed(0)
    C = 5
    bn_t = torch.nn.BatchNorm2d(C)  # affine ones/zeros, momentum 0.1, eps 1e-5
    with torch.no_grad():  # non-trivial affine so scale/bias order is pinned
        bn_t.weight.copy_(torch.linspace(0.5, 1.5, C))
        bn_t.bias.copy_(torch.linspace(-0.2, 0.2, C))

    mod = TorchBatchNorm(C)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, C)), True)
    params = {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
              "bias": jnp.asarray(bn_t.bias.detach().numpy())}
    stats = variables["batch_stats"]

    bn_t.train()
    for step in range(3):
        x = _rand((2, 4, 4, C), seed=10 + step)
        want = bn_t(torch.from_numpy(x).permute(0, 3, 1, 2))
        got, upd = mod.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(got), want.detach().permute(0, 2, 3, 1).numpy(),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["mean"]),
                                   bn_t.running_mean.numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(stats["var"]),
                                   bn_t.running_var.numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f"step {step}")

    bn_t.eval()
    x = _rand((2, 4, 4, C), seed=99)
    want = bn_t(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = mod.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(got),
                               want.detach().permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)
