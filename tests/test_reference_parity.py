"""End-to-end weight-port parity against the ACTUAL reference implementation.

Imports the reference PyTorch modules from /root/reference (read-only, CPU
forward), exports their randomly-initialized state dicts, ports them through
aclgan_tpu.utils.torch_import, and asserts our generator/discriminator
reproduce the torch outputs on the same inputs. This pins the AdaIN slicing
order (networks.py:154-163), every norm's semantics, and the name mapping in
one shot. Skipped when the reference checkout isn't present.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

GEN_PARAMS = {"dim": 16, "mlp_dim": 32, "style_dim": 8, "output_dim": 4,
              "activ": "relu", "n_downsample": 2, "n_res": 2,
              "pad_type": "reflect"}
DIS_PARAMS = {"dim": 16, "norm": "none", "activ": "lrelu", "n_layer": 3,
              "gan_type": "lsgan", "num_scales": 2, "pad_type": "reflect"}


@pytest.fixture(scope="module")
def reference_networks():
    sys.path.insert(0, REF)
    try:
        import networks as ref_networks  # the reference module
    finally:
        sys.path.remove(REF)
    return ref_networks


def _to_t(x_nhwc):
    import torch

    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _from_t(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_generator_forward_parity(reference_networks):
    import torch

    from aclgan_tpu.config import GenConfig
    from aclgan_tpu.models.generator import AdaINGenerator
    from aclgan_tpu.utils.torch_import import map_generator_state_dict

    torch.manual_seed(0)
    ref = reference_networks.AdaINGen(3, GEN_PARAMS).eval()

    cfg = GenConfig(**{k: v for k, v in GEN_PARAMS.items()})
    gen = AdaINGenerator(cfg, fast_upsample=False)
    template = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    ported = map_generator_state_dict(ref.state_dict(), cfg)
    ported = jax.tree_util.tree_map(jnp.asarray, ported)
    # same tree structure as a fresh init
    assert (jax.tree_util.tree_structure(ported)
            == jax.tree_util.tree_structure(template))

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    z = rng.randn(2, 8).astype(np.float32)

    with torch.no_grad():
        content_t, style_t = ref.encode(_to_t(x))
        dec_t = ref.decode(content_t, torch.from_numpy(z).view(2, 8, 1, 1))

    content_j, style_j = gen.apply({"params": ported}, jnp.asarray(x),
                                   method=AdaINGenerator.encode)
    dec_j = gen.apply({"params": ported}, content_j, jnp.asarray(z),
                      method=AdaINGenerator.decode)

    np.testing.assert_allclose(np.asarray(content_j), _from_t(content_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(style_j),
                               style_t.detach().numpy().reshape(2, 8),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dec_j), _from_t(dec_t),
                               rtol=1e-3, atol=2e-3)


def test_generator_fast_upsample_parity(reference_networks):
    """The collapsed-tap decoder matches the torch reference too."""
    import torch

    from aclgan_tpu.config import GenConfig
    from aclgan_tpu.models.generator import AdaINGenerator
    from aclgan_tpu.utils.torch_import import map_generator_state_dict

    torch.manual_seed(2)
    ref = reference_networks.AdaINGen(3, GEN_PARAMS).eval()
    cfg = GenConfig(**GEN_PARAMS)
    gen = AdaINGenerator(cfg, fast_upsample=True)
    ported = jax.tree_util.tree_map(
        jnp.asarray, map_generator_state_dict(ref.state_dict(), cfg))

    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(_to_t(x))  # encode + self-recon decode
    out_j = gen.apply({"params": ported}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), _from_t(out_t),
                               rtol=1e-3, atol=2e-3)


def test_lsgan_loss_head_parity(reference_networks):
    """calc_dis_loss / calc_gen_loss / calc_gen_d2_loss (lsgan path, CPU-safe)
    vs our pure loss functions on the same ported discriminator."""
    import torch

    from aclgan_tpu import losses
    from aclgan_tpu.config import DisConfig
    from aclgan_tpu.models.discriminator import MsDiscriminator
    from aclgan_tpu.utils.torch_import import map_discriminator_state_dict

    torch.manual_seed(6)
    ref = reference_networks.MsImageDis(3, DIS_PARAMS).eval()
    cfg = DisConfig(**DIS_PARAMS)
    dis = MsDiscriminator(cfg)
    ported = jax.tree_util.tree_map(
        jnp.asarray, map_discriminator_state_dict(ref.state_dict(), cfg))

    rng = np.random.RandomState(7)
    fake = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    real = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want_dis = float(ref.calc_dis_loss(_to_t(fake), _to_t(real)))
        want_gen = float(ref.calc_gen_loss(_to_t(fake)))
        want_d2 = float(ref.calc_gen_d2_loss(_to_t(fake), _to_t(real)))

    fake_outs = dis.apply({"params": ported}, jnp.asarray(fake))
    real_outs = dis.apply({"params": ported}, jnp.asarray(real))
    got_dis = float(losses.dis_loss(fake_outs, real_outs, "lsgan"))
    got_gen = float(losses.gen_loss(fake_outs, "lsgan"))
    got_d2 = float(losses.gen_d2_loss(fake_outs, real_outs, "lsgan"))

    np.testing.assert_allclose(got_dis, want_dis, rtol=1e-4)
    np.testing.assert_allclose(got_gen, want_gen, rtol=1e-4)
    np.testing.assert_allclose(got_d2, want_d2, rtol=1e-4)


def test_discriminator_forward_parity(reference_networks):
    import torch

    from aclgan_tpu.config import DisConfig
    from aclgan_tpu.models.discriminator import MsDiscriminator
    from aclgan_tpu.utils.torch_import import map_discriminator_state_dict

    torch.manual_seed(4)
    ref = reference_networks.MsImageDis(3, DIS_PARAMS).eval()
    cfg = DisConfig(**{k: v for k, v in DIS_PARAMS.items()})
    dis = MsDiscriminator(cfg)
    ported = jax.tree_util.tree_map(
        jnp.asarray, map_discriminator_state_dict(ref.state_dict(), cfg))

    rng = np.random.RandomState(5)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        outs_t = ref.forward(_to_t(x))
    outs_j = dis.apply({"params": ported}, jnp.asarray(x))
    assert len(outs_t) == len(outs_j)
    for t, j in zip(outs_t, outs_j):
        np.testing.assert_allclose(np.asarray(j), _from_t(t),
                                   rtol=1e-4, atol=1e-4)


def test_spectral_norm_dis_forward_and_grad_parity(reference_networks):
    """SN discriminator (dis.norm='sn') vs the reference SpectralNorm wrapper
    (networks.py:542-600): forward after one power-iteration step, the updated
    u vector, and d(loss)/d(weight_bar) must all match. Pins the gradient
    semantics: torch updates u/v via .data on requires_grad=False params, so
    gradients flow through w alone in sigma = u·(w·v)."""
    import torch

    from aclgan_tpu.config import DisConfig
    from aclgan_tpu.models.discriminator import MsDiscriminator
    from aclgan_tpu.utils.torch_import import (
        map_discriminator_spectral, map_discriminator_state_dict)

    sn_params = dict(DIS_PARAMS, norm="sn")
    torch.manual_seed(8)
    ref = reference_networks.MsImageDis(3, sn_params)
    cfg = DisConfig(**sn_params)
    dis = MsDiscriminator(cfg)

    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    ported = jax.tree_util.tree_map(
        jnp.asarray, map_discriminator_state_dict(sd, cfg))
    spectral = jax.tree_util.tree_map(
        jnp.asarray, map_discriminator_spectral(sd, cfg))

    rng = np.random.RandomState(9)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    # torch: one forward = one power-iteration update, then backward
    xt = _to_t(x)
    outs_t = ref.forward(xt)
    loss_t = sum(torch.mean(o ** 2) for o in outs_t)
    loss_t.backward()

    def loss_fn(params):
        outs, updated = dis.apply({"params": params, "spectral": spectral},
                                  jnp.asarray(x), mutable=["spectral"])
        total = sum(jnp.mean(jnp.square(o)) for o in outs)
        return total, (outs, updated["spectral"])

    (loss_j, (outs_j, new_spec)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(ported)

    for t, j in zip(outs_t, outs_j):
        np.testing.assert_allclose(np.asarray(j), _from_t(t),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    # updated u after the power-iteration step
    u_want = ref.state_dict()["cnns.0.1.conv.module.weight_u"].numpy()
    u_got = np.asarray(new_spec["scale_0"]["ConvBlock_1"]["SpectralConv_0"]["u"])
    np.testing.assert_allclose(u_got, u_want, rtol=1e-5, atol=1e-6)

    # gradient parity on an SN weight_bar and on the plain first conv
    sn_module = ref.cnns[0][1].conv.module
    g_want = sn_module.weight_bar.grad.numpy()          # (out,in,kh,kw)
    g_got = np.asarray(
        grads["scale_0"]["ConvBlock_1"]["SpectralConv_0"]["kernel"]
    ).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-3, atol=1e-5)

    g_want0 = ref.cnns[0][0].conv.weight.grad.numpy()
    g_got0 = np.asarray(
        grads["scale_0"]["ConvBlock_0"]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(g_got0, g_want0, rtol=1e-3, atol=1e-5)
