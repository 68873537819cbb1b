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


# ---------------------------------------------------------------------------
# Full-graph train-step oracle parity (VERDICT r2 item 3): run the reference's
# composed gen_update/dis_update (trainer.py:90-170, 247-293) with injected
# z's and ported weights, and assert every loss scalar and EVERY parameter
# gradient (ported through the same name mapper) matches ours end-to-end.
# This pins the focus size/digit losses, both blends, the alpha*z2 path, pair
# ordering, and the 1/2-weighted dis_A/gen_adv_A pairs in one cross-framework
# check.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reference_trainer(reference_networks):
    """Import the reference trainer module with CPU-safe shims: a stub
    torchvision (not installed here; only needed by unused loader builders)
    and .cuda() as identity on tensors/modules."""
    import types

    import torch

    stubs = {}
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.utils = types.ModuleType("torchvision.utils")
        stubs = {"torchvision": tv, "torchvision.transforms": tv.transforms,
                 "torchvision.utils": tv.utils}
        sys.modules.update(stubs)

    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    sys.path.insert(0, REF)
    try:
        import trainer as ref_trainer
    finally:
        sys.path.remove(REF)
    yield ref_trainer
    torch.Tensor.cuda = orig_t_cuda
    torch.nn.Module.cuda = orig_m_cuda
    for name in stubs:
        sys.modules.pop(name, None)


def _grad_state_dict(net):
    """state_dict-shaped dict of gradients (zeros for buffers), suitable for
    the same torch->flax name mappers used for weights."""
    import torch

    grads = {k: (p.grad.detach().clone() if p.grad is not None
                 else torch.zeros_like(p))
             for k, p in net.named_parameters()}
    return {k: grads.get(k, torch.zeros_like(v))
            for k, v in net.state_dict().items()}


def _assert_tree_close(got, want, rel_l2, what):
    """Relative-L2 gradient comparison, per leaf and whole-tree.

    Element-wise tolerances are too brittle here: the fake images reach the
    discriminators through 2-3 chained decodes with a norm layer at every
    step, so the two frameworks' images genuinely differ by ~1e-4 absolute
    (the isolated-discriminator grads match torch to 1e-7 — measured), and
    the D-side grads inherit that noise, which is O(10%) of the smallest
    leaves (biases). A systematic semantic slip (swapped pair, wrong 1/2
    weight, missing loss term) moves whole leaves by O(1) relative L2 and
    the whole-tree norm by far more than 1%, so both bounds still bite."""
    flat_g, _ = jax.tree_util.tree_flatten(got)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    assert len(flat_g) == len(flat_w)
    num = den = 0.0
    for i, (g, w) in enumerate(zip(flat_g, flat_w)):
        g = np.asarray(g, np.float64).ravel()
        w = np.asarray(w, np.float64).ravel()
        assert g.shape == w.shape
        d2 = float(np.sum((g - w) ** 2))
        w2 = float(np.sum(w ** 2))
        num += d2
        den += w2
        err = np.sqrt(d2) / (np.sqrt(w2) + 1e-12)
        # loose per-leaf bound: a misrouted/mismapped leaf (mapper bug,
        # swapped slot) shows rel L2 >= 1. Leaves whose true gradient is
        # ~zero (conv biases feeding InstanceNorm cancel exactly; both
        # frameworks leave ~1e-9 roundoff) carry no signal — skip them.
        if np.sqrt(w2) > 1e-6:
            assert err < 0.5, f"{what} leaf {i}: rel L2 {err:.2e} >= 0.5"
    tree_err = np.sqrt(num) / (np.sqrt(den) + 1e-12)
    # tight whole-network bound: a wrong loss term/weight moves this by >=3%
    assert tree_err < rel_l2, f"{what}: tree rel L2 {tree_err:.2e} >= {rel_l2}"


def _run_oracle(reference_trainer, monkeypatch, focus_delta, focus_epsilon,
                check_grads):
    import copy

    import torch

    from aclgan_tpu.config import DataConfig, DisConfig, GenConfig, TpuConfig
    from aclgan_tpu.trainer import ACLGAN
    from aclgan_tpu.utils.torch_import import (
        map_discriminator_state_dict, map_generator_state_dict)
    from tests.helpers import tiny_config

    hp = {
        "lr": 1e-4, "beta1": 0.5, "beta2": 0.999, "weight_decay": 0.0,
        "init": "kaiming", "lr_policy": "constant", "display_size": 2,
        "input_dim_a": 3, "input_dim_b": 6, "alpha": 0.7, "vgg_w": 0,
        "gan_w": 1.0, "gan_cw": 0.2, "recon_x_w": 1.0,
        "focus_loss": 0.025, "focus_delta": focus_delta, "focus_upper": 0.5,
        "focus_lower": 0.3, "focus_epsilon": focus_epsilon,
        "gen": dict(GEN_PARAMS), "dis": dict(DIS_PARAMS),
    }
    torch.manual_seed(11)
    ref = reference_trainer.aclgan_Trainer(hp)
    # shift the decoders' mask-channel bias so the masks sit around ~0.83,
    # not the freshly-initialized ~0.5 where the digit loss's
    # sign(m-0.5)/(|m-0.5|+eps)^2 gradient has its sign discontinuity
    with torch.no_grad():
        for gen in (ref.gen_AB, ref.gen_BA):
            for k, v in gen.state_dict().items():
                if k.startswith("dec.") and k.endswith(".bias") and v.numel() == 4:
                    v[3] += 0.8
    orig_sd = copy.deepcopy(ref.state_dict())

    gen_cfg = GenConfig(**GEN_PARAMS)
    dis_cfg = DisConfig(**DIS_PARAMS)
    cfg = tiny_config(
        weight_decay=0.0, alpha=0.7, gan_w=1.0, gan_cw=0.2, recon_x_w=1.0,
        focus_loss=0.025, focus_delta=focus_delta, focus_upper=0.5,
        focus_lower=0.3, focus_epsilon=focus_epsilon, gen=gen_cfg, dis=dis_cfg,
        data=DataConfig(input_dim_a=3, input_dim_b=6, num_workers=0,
                        new_size=16, crop_image_height=16, crop_image_width=16,
                        synthetic=True),
        tpu=TpuConfig(compute_dtype="float32", use_pallas=False,
                      donate_state=False, fast_upsample=False),
    )
    model = ACLGAN(cfg)

    jtree = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    gen_params = {"AB": jtree(map_generator_state_dict(ref.gen_AB.state_dict(), gen_cfg)),
                  "BA": jtree(map_generator_state_dict(ref.gen_BA.state_dict(), gen_cfg))}
    dis_params = {"A": jtree(map_discriminator_state_dict(ref.dis_A.state_dict(), dis_cfg)),
                  "B": jtree(map_discriminator_state_dict(ref.dis_B.state_dict(), dis_cfg)),
                  "2": jtree(map_discriminator_state_dict(ref.dis_2.state_dict(), dis_cfg))}
    spectral = {"A": {}, "B": {}, "2": {}}

    rng = np.random.RandomState(13)
    x_a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    x_b = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    z1, z2, z3 = (rng.randn(2, 8).astype(np.float32) for _ in range(3))

    # inject the SAME z triple into both reference updates (each draws
    # z_1..z_3 via ambient torch.randn, trainer.py:99-101, 254-256)
    queue = [torch.from_numpy(z).view(2, 8, 1, 1) for z in (z1, z2, z3)] * 2
    monkeypatch.setattr(torch, "randn", lambda *a, **k: queue.pop(0).clone())

    ta, tb = _to_t(x_a), _to_t(x_b)

    # --- reference dis_update on the original weights ---
    ref.dis_update(ta, tb, hp)
    want_dis = {k: float(getattr(ref, k)) for k in
                ("loss_dis_A", "loss_dis_B", "loss_dis_2", "loss_dis_total")}
    dis_grads_t = {name: _grad_state_dict(getattr(ref, f"dis_{name}"))
                   for name in ("A", "B", "2")}

    # --- reference gen_update, restored to the same original weights ---
    ref.load_state_dict(orig_sd)
    ref.gen_update(ta, tb, hp)
    gen_scalars = ("loss_gen_adv_A", "loss_gen_adv_B", "loss_gen_adv_2",
                   "loss_gen_focus_B_size", "loss_gen_focus_B_digit",
                   "loss_gen_focus_A_size", "loss_gen_focus_A_digit",
                   "loss_gen_focus_A2_size", "loss_gen_focus_A2_digit",
                   "loss_idt_A", "loss_idt_B", "loss_gen_total")
    want_gen = {k: float(getattr(ref, k)) for k in gen_scalars}
    gen_grads_t = {name: _grad_state_dict(getattr(ref, f"gen_{name}"))
                   for name in ("AB", "BA")}

    # --- ours: same weights, same inputs, same z's ---
    jx_a, jx_b = jnp.asarray(x_a), jnp.asarray(x_b)
    jz = tuple(jnp.asarray(z) for z in (z1, z2, z3))

    fwd = model.generator_forward(gen_params, jx_a, jx_b, *jz, with_recon=False)
    fwd = jax.tree_util.tree_map(jax.lax.stop_gradient, fwd)
    stats = {"A": {}, "B": {}, "2": {}}
    (_, (m_dis, *_aux)), d_grads = jax.value_and_grad(
        model._dis_loss_fn, has_aux=True)(dis_params, spectral, stats,
                                          fwd, jx_a, jx_b)

    (_, (m_gen, *_aux)), g_grads = jax.value_and_grad(
        model._gen_loss_fn, has_aux=True)(
        gen_params, dis_params, spectral, stats, jx_a, jx_b, *jz)

    for k, want in want_dis.items():
        np.testing.assert_allclose(float(m_dis[k]), want, rtol=1e-3,
                                   err_msg=k)
    for k, want in want_gen.items():
        # focus size/digit losses are SUMS over every mask pixel
        # (trainer.py:149-158), so per-pixel conv-reordering noise (~1e-4
        # after the deep decode graph) accumulates linearly instead of
        # averaging out — 1% tolerance for those (3% for digit, whose
        # 1/(|m-0.5|+eps) is additionally ill-conditioned for the few pixels
        # still near 0.5); the mean-aggregated losses hold 0.1%
        rtol = (3e-2 if k.endswith("_digit")
                else 1e-2 if "_focus_" in k else 1e-3)
        np.testing.assert_allclose(float(m_gen[k]), want, rtol=rtol,
                                   atol=1e-12, err_msg=k)

    if not check_grads:
        return

    # every parameter gradient, ported through the same name mapping
    for name in ("A", "B", "2"):
        _assert_tree_close(
            d_grads[name],
            jtree(map_discriminator_state_dict(dis_grads_t[name], dis_cfg)),
            rel_l2=1e-2, what=f"dis_{name} grads")
    for name in ("AB", "BA"):
        _assert_tree_close(
            g_grads[name],
            jtree(map_generator_state_dict(gen_grads_t[name], gen_cfg)),
            # generator grads pass through 2-3 chained decodes AND the
            # discriminators, so their cross-framework noise floor is ~3%
            # tree rel-L2 (D-side grads, one decode shallower, hold 1%)
            rel_l2=5e-2, what=f"gen_{name} grads")


def test_full_graph_oracle_parity_shipped_losses(reference_trainer, monkeypatch):
    """Loss-scalar parity at the SHIPPED focus hyperparameters
    (configs/male2female.yaml:24-29): every loss_* attribute the reference
    sets in gen_update/dis_update matches ours, alpha=0.7 exercising the
    alpha*z2 path. Gradients are checked in the _smooth variant below —
    at eps=0.01 the digit-loss gradient is dominated by whichever mask
    pixels sit near the |m-0.5| -> 0 pole, where ~1e-4 cross-framework
    image noise (accumulated over 2-3 chained decodes with a norm at every
    layer) flips per-pixel gradient signs: measured rel-L2 against torch is
    ~0.2-0.4 REGARDLESS of implementation correctness, so a gradient
    assertion there would pin noise, not semantics."""
    _run_oracle(reference_trainer, monkeypatch,
                focus_delta=0.001, focus_epsilon=0.01, check_grads=False)


def test_full_graph_oracle_parity_gradients(reference_trainer, monkeypatch):
    """End-to-end gradient parity for all 5 networks with the focus size /
    digit terms made well-conditioned (delta=0, eps=10): pins the composed
    adversarial heads, both mask blends, the alpha*z2 path, pair ordering,
    the 1/2-weighted pairs, and the identity recons through the FULL
    backward. The size/digit gradient semantics themselves are pinned by
    test_focus_loss_gradients_vs_torch on raw mask tensors (no image
    noise)."""
    _run_oracle(reference_trainer, monkeypatch,
                focus_delta=0.0, focus_epsilon=10.0, check_grads=True)


# ---------------------------------------------------------------------------
# Multi-step training-trajectory oracle (VERDICT r3 item 1): the single-step
# oracle above pins losses and gradients; this pins what happens to them over
# TIME — torch Adam with COUPLED weight_decay (L2 added to the gradient
# before the moments, trainer.py:39-42), the per-iteration StepLR schedule
# (utils.py:263-271 stepped every loop iteration at train.py:101, crossing a
# decay boundary mid-run), the dis-then-gen ordering inside one iteration
# (train.py:71-74: gen_update sees the ALREADY-stepped discriminators), and
# the epoch-local D_update/G_update cadence — by running N composed
# iterations through both frameworks from identical weights with identical
# batches and injected identical z-draws, then comparing per-iteration loss
# trajectories, the per-iteration learning rate, and every network's total
# parameter movement.
# ---------------------------------------------------------------------------

def test_multi_step_trajectory_parity(reference_trainer, monkeypatch):
    import copy

    import torch

    from aclgan_tpu.config import DataConfig, DisConfig, GenConfig, TpuConfig
    from aclgan_tpu.trainer import ACLGAN
    from aclgan_tpu.utils.torch_import import (
        map_discriminator_state_dict, map_generator_state_dict)
    from tests.helpers import tiny_config

    n_iters = 10
    step_size = 4          # StepLR boundaries crossed at iterations 4 and 8
    gamma = 0.5
    lr, wd = 1e-4, 1e-4    # wd > 0 so coupled-vs-decoupled L2 is observable
    d_update, g_update = 1, 2   # shipped cadence: D every iter, G every 2nd

    hp = {
        "lr": lr, "beta1": 0.5, "beta2": 0.999, "weight_decay": wd,
        "init": "kaiming", "lr_policy": "step", "step_size": step_size,
        "gamma": gamma, "display_size": 2,
        "input_dim_a": 3, "input_dim_b": 6, "alpha": 0.7, "vgg_w": 0,
        "gan_w": 1.0, "gan_cw": 0.2, "recon_x_w": 1.0,
        # smooth focus terms (see the gradient-oracle docstring: at the
        # shipped eps the digit-loss grad near |m-0.5|=0 pins noise)
        "focus_loss": 0.025, "focus_delta": 0.0, "focus_upper": 0.5,
        "focus_lower": 0.3, "focus_epsilon": 10.0,
        "gen": dict(GEN_PARAMS), "dis": dict(DIS_PARAMS),
    }
    torch.manual_seed(21)
    ref = reference_trainer.aclgan_Trainer(hp)
    with torch.no_grad():  # bias masks off the digit-loss pole (as above)
        for gen in (ref.gen_AB, ref.gen_BA):
            for k, v in gen.state_dict().items():
                if k.startswith("dec.") and k.endswith(".bias") and v.numel() == 4:
                    v[3] += 0.8
    init_sd = {
        "AB": copy.deepcopy(ref.gen_AB.state_dict()),
        "BA": copy.deepcopy(ref.gen_BA.state_dict()),
        "A": copy.deepcopy(ref.dis_A.state_dict()),
        "B": copy.deepcopy(ref.dis_B.state_dict()),
        "2": copy.deepcopy(ref.dis_2.state_dict()),
    }

    gen_cfg = GenConfig(**GEN_PARAMS)
    dis_cfg = DisConfig(**DIS_PARAMS)
    cfg = tiny_config(
        weight_decay=wd, lr=lr, lr_policy="step", step_size=step_size,
        gamma=gamma, alpha=0.7, gan_w=1.0, gan_cw=0.2, recon_x_w=1.0,
        focus_loss=0.025, focus_delta=0.0, focus_upper=0.5, focus_lower=0.3,
        focus_epsilon=10.0, D_update=d_update, G_update=g_update,
        gen=gen_cfg, dis=dis_cfg,
        data=DataConfig(input_dim_a=3, input_dim_b=6, num_workers=0,
                        new_size=16, crop_image_height=16, crop_image_width=16,
                        synthetic=True),
        tpu=TpuConfig(compute_dtype="float32", use_pallas=False,
                      donate_state=False, fast_upsample=False),
    )
    model = ACLGAN(cfg)

    jtree = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    gen_params = {"AB": jtree(map_generator_state_dict(init_sd["AB"], gen_cfg)),
                  "BA": jtree(map_generator_state_dict(init_sd["BA"], gen_cfg))}
    dis_params = {k: jtree(map_discriminator_state_dict(init_sd[k], dis_cfg))
                  for k in ("A", "B", "2")}
    state = model.init_state(jax.random.PRNGKey(0), (16, 16))
    state = state.replace(gen_params=gen_params, dis_params=dis_params,
                          gen_opt_state=model.tx.init(gen_params),
                          dis_opt_state=model.tx.init(dis_params))
    init_gen = jax.device_get(gen_params)
    init_dis = jax.device_get(dis_params)

    # fixed per-iteration batches; both frameworks see the same data
    rng = np.random.RandomState(23)
    batches = [(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32),
                rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
               for _ in range(n_iters)]

    # precompute OUR per-iteration z-draws and feed the identical values to
    # the reference's ambient torch.randn (trainer.py:99-101, 254-256):
    # per iteration, dis_update draws z_1..z_3 first, then gen_update (when
    # the cadence runs it) draws its own fresh triple — same key derivation
    # train_step uses (fold_in(base, step) -> split -> kd, kg)
    base_key = jax.random.PRNGKey(42)
    queue = []
    for it in range(n_iters):
        kd, kg = jax.random.split(jax.random.fold_in(base_key, it))
        if it % d_update == 0:
            for z in model._draw_z(kd, 2):
                queue.append(torch.from_numpy(np.asarray(z)).view(2, 8, 1, 1))
        if it % g_update == 0:
            for z in model._draw_z(kg, 2):
                queue.append(torch.from_numpy(np.asarray(z)).view(2, 8, 1, 1))
    monkeypatch.setattr(torch, "randn", lambda *a, **k: queue.pop(0).clone())

    # --- reference: N composed iterations of the train.py loop ---
    ref_dis_losses, ref_gen_losses, ref_lrs = [], [], []
    for it in range(n_iters):
        ta, tb = _to_t(batches[it][0]), _to_t(batches[it][1])
        ref_lrs.append(float(ref.dis_opt.param_groups[0]["lr"]))
        if it % d_update == 0:
            ref.dis_update(ta, tb, hp)
            ref_dis_losses.append(float(ref.loss_dis_total))
        if it % g_update == 0:
            ref.gen_update(ta, tb, hp)
            ref_gen_losses.append(float(ref.loss_gen_total))
        ref.update_learning_rate()
    assert queue == []  # every injected draw consumed — cadence matched

    # --- ours: same loop through the REAL jitted train_step ---
    our_dis_losses, our_gen_losses, our_lrs = [], [], []
    for it in range(n_iters):
        do_dis = it % d_update == 0
        do_gen = it % g_update == 0
        our_lrs.append(float(model.learning_rate(state.step)))
        state, metrics = model.train_step(
            state, jnp.asarray(batches[it][0]), jnp.asarray(batches[it][1]),
            base_key, do_dis, do_gen)
        if do_dis:
            our_dis_losses.append(float(metrics["loss_dis_total"]))
        if do_gen:
            our_gen_losses.append(float(metrics["loss_gen_total"]))

    # learning-rate trajectory: exact (pins the StepLR off-by-one; with
    # step_size=4 the sequence is lr,lr,lr,lr, lr/2,... lr/4,...)
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6)
    np.testing.assert_allclose([our_lrs[0], our_lrs[-1]],
                               [lr, lr * gamma ** 2], rtol=1e-6)

    # per-iteration loss trajectories: cross-framework forward noise is
    # ~1e-4 relative at step 0 and compounds through the coupled
    # param-update feedback; a semantic slip (decoupled wd, schedule
    # off-by-one, stale-D gen update) moves late-trajectory losses by far
    # more than 2%
    np.testing.assert_allclose(our_dis_losses, ref_dis_losses, rtol=2e-2)
    np.testing.assert_allclose(our_gen_losses, ref_gen_losses, rtol=2e-2)
    # and the early steps, before divergence compounds, much tighter
    np.testing.assert_allclose(our_dis_losses[:3], ref_dis_losses[:3], rtol=2e-3)
    np.testing.assert_allclose(our_gen_losses[:2], ref_gen_losses[:2], rtol=2e-3)

    # total parameter MOVEMENT (final - initial) per network: Adam's
    # m/sqrt(v) normalization makes each step O(lr), so ten composed updates
    # move every net by ~10*lr; a wd-coupling or moment-semantics slip
    # redirects that movement wholesale
    final_gen = jax.device_get(state.gen_params)
    final_dis = jax.device_get(state.dis_params)

    def _delta(final, initial):
        return jax.tree_util.tree_map(
            lambda f, i: np.asarray(f, np.float64) - np.asarray(i, np.float64),
            final, initial)

    def _movement_close(got, want, bound, what):
        """Whole-network movement comparison (rel L2). Per-leaf bounds don't
        apply here: Adam normalizes each step to ~lr regardless of gradient
        size, so a leaf whose gradient is dominated by cross-framework noise
        random-walks ±lr per step in both frameworks independently (measured
        rel L2 ~1.6 on such a leaf with everything semantically correct).
        Per-leaf mapper-slot detection is already pinned by the single-step
        gradient oracle above; this check is about the composed update rule,
        which any systematic slip (decoupled wd, schedule off-by-one, stale-D
        gen update) shifts wholesale."""
        flat_g = [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(got)]
        flat_w = [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(want)]
        g = np.concatenate(flat_g)
        w = np.concatenate(flat_w)
        err = np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-12)
        assert err < bound, f"{what}: movement rel L2 {err:.3f} >= {bound}"

    for name in ("AB", "BA"):
        want = _delta(jtree(map_generator_state_dict(
            getattr(ref, f"gen_{name}").state_dict(), gen_cfg)), init_gen[name])
        _movement_close(_delta(final_gen[name], init_gen[name]), want,
                        0.10, f"gen_{name} 10-step movement")
    for name in ("A", "B", "2"):
        want = _delta(jtree(map_discriminator_state_dict(
            getattr(ref, f"dis_{name}").state_dict(), dis_cfg)), init_dis[name])
        _movement_close(_delta(final_dis[name], init_dis[name]), want,
                        0.10, f"dis_{name} 10-step movement")


def test_focus_loss_gradients_vs_torch():
    """d(size)/dm and d(digit)/dm vs torch autograd on the same standalone
    mask tensor at the SHIPPED focus hyperparameters — covers exactly the
    term excluded from the end-to-end gradient oracle (no cross-framework
    image noise here, so the comparison is tight)."""
    import torch
    import torch.nn.functional as F

    from aclgan_tpu import losses

    rng = np.random.RandomState(17)
    m01 = rng.uniform(0.05, 0.95, (2, 16, 16, 1)).astype(np.float32)
    upper, lower, delta, eps = 0.5, 0.3, 0.001, 0.01

    mt = torch.from_numpy(m01).requires_grad_(True)
    size_t = (F.relu(torch.sum(mt - upper)) ** 2) * delta +              (F.relu(torch.sum(lower - mt)) ** 2) * delta
    digit_t = torch.sum(1 / (torch.abs(mt - 0.5) + eps))
    (size_t + digit_t).backward()

    def both(m):
        return (losses.focus_size_loss(m, upper, lower, delta)
                + losses.focus_digit_loss(m, eps))

    got = jax.grad(both)(jnp.asarray(m01))
    np.testing.assert_allclose(float(both(jnp.asarray(m01))),
                               float((size_t + digit_t).detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), mt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
