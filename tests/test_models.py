"""Generator / discriminator architecture tests: shapes, param counts, AdaIN plumbing."""

import numpy as np

import jax
import jax.numpy as jnp

from aclgan_tpu.config import DisConfig, GenConfig
from aclgan_tpu.models.discriminator import MsDiscriminator
from aclgan_tpu.models.generator import (
    AdaINGenerator,
    _slice_adain,
    content_dim,
    num_adain_params,
)


def small_gen_cfg(**kw):
    base = dict(dim=16, mlp_dim=32, style_dim=8, output_dim=4, activ="relu",
                n_downsample=2, n_res=2, pad_type="reflect")
    base.update(kw)
    return GenConfig(**base)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_generator_shapes():
    cfg = small_gen_cfg()
    gen = AdaINGenerator(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = gen.init(jax.random.PRNGKey(0), x)["params"]

    content, style = gen.apply({"params": params}, x, method=AdaINGenerator.encode)
    assert content.shape == (2, 8, 8, content_dim(cfg))  # 32 / 2^2, 16*4
    assert style.shape == (2, cfg.style_dim)

    out = gen.apply({"params": params}, content, style, method=AdaINGenerator.decode)
    assert out.shape == (2, 32, 32, cfg.output_dim)
    # tanh output range
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_generator_param_count_analytic():
    """Exact parameter count vs closed form of the architecture
    (networks.py:114-133, 212-264, 280-292)."""
    cfg = small_gen_cfg()
    gen = AdaINGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

    d, s = cfg.dim, cfg.style_dim
    def conv(cin, cout, k):
        return cin * cout * k * k + cout

    # StyleEncoder: 7x7 3->d, 4x4 d->2d, 2d->4d, 2x 4x4 4d->4d, 1x1 4d->style
    style_enc = (conv(3, d, 7) + conv(d, 2 * d, 4) + conv(2 * d, 4 * d, 4)
                 + 2 * conv(4 * d, 4 * d, 4) + conv(4 * d, s, 1))
    # ContentEncoder: 7x7 3->d, 4x4 d->2d, 2d->4d, n_res resblocks @4d (2 convs each)
    cd = content_dim(cfg)
    content_enc = (conv(3, d, 7) + conv(d, 2 * d, 4) + conv(2 * d, cd, 4)
                   + cfg.n_res * 2 * conv(cd, cd, 3))
    # Decoder: n_res adain resblocks @cd, upsample convs 5x5 cd->cd/2 (+ln affine),
    # cd/2->cd/4 (+ln), 7x7 cd/4->out
    dec = (cfg.n_res * 2 * conv(cd, cd, 3)
           + conv(cd, cd // 2, 5) + 2 * (cd // 2)
           + conv(cd // 2, cd // 4, 5) + 2 * (cd // 4)
           + conv(cd // 4, cfg.output_dim, 7))
    # MLP: s->mlp, mlp->mlp, mlp->num_adain
    na = num_adain_params(cfg)
    mlp = ((s * cfg.mlp_dim + cfg.mlp_dim) + (cfg.mlp_dim ** 2 + cfg.mlp_dim)
           + (cfg.mlp_dim * na + na))

    assert _param_count(params) == style_enc + content_enc + dec + mlp


def test_adain_slicing_order():
    """Slicing must match assign_adain_params (networks.py:154-163):
    traversal order, per-layer [shift(C) | scale(C)]."""
    dim, n_res = 4, 2
    total = 2 * dim * 2 * n_res
    vec = jnp.arange(total, dtype=jnp.float32)[None, :]  # batch 1
    sliced = _slice_adain(vec, dim, n_res)
    assert len(sliced) == n_res
    offset = 0
    for block in sliced:
        for scale, shift in block:
            np.testing.assert_array_equal(np.asarray(shift)[0], np.arange(offset, offset + dim))
            np.testing.assert_array_equal(np.asarray(scale)[0], np.arange(offset + dim, offset + 2 * dim))
            offset += 2 * dim
    assert offset == total


def test_discriminator_scales_and_shapes():
    """num_scales logit maps, halving resolution per conv and per scale
    (networks.py:38-57)."""
    cfg = DisConfig(dim=8, norm="none", activ="lrelu", n_layer=3,
                    gan_type="lsgan", num_scales=3, pad_type="reflect")
    dis = MsDiscriminator(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = dis.init(jax.random.PRNGKey(0), x)["params"]
    outs = dis.apply({"params": params}, x)
    assert len(outs) == 3
    # scale 0: 32 -> 16 -> 8 -> 4 after 3 stride-2 convs
    assert outs[0].shape == (2, 4, 4, 1)
    # input downsampled between scales: 16 -> 2, 8 -> 1
    assert outs[1].shape == (2, 2, 2, 1)
    assert outs[2].shape == (2, 1, 1, 1)


def test_decode_batch_independence():
    """Per-sample norms everywhere => decoding a batch equals decoding items
    individually (this justifies the trainer's batched sub-network calls)."""
    cfg = small_gen_cfg()
    gen = AdaINGenerator(cfg)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 16, 16, 3))
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    c, s = gen.apply({"params": params}, x, method=AdaINGenerator.encode)
    full = gen.apply({"params": params}, c, s, method=AdaINGenerator.decode)
    one = gen.apply({"params": params}, c[:1], s[:1], method=AdaINGenerator.decode)
    np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(one), rtol=1e-5, atol=1e-5)
