"""ConvBlock / LinearBlock / MLP parity and shape tests."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from aclgan_tpu.ops.blocks import MLP, ConvBlock, LinearBlock, ResBlock


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_convblock_matches_torch_conv_reflect_pad():
    """pad(reflect,1) -> 4x4 s2 conv -> lrelu vs the torch equivalent
    (Conv2dBlock semantics, networks.py:312-371) with copied weights."""
    x = _rand((2, 8, 8, 3))
    block = ConvBlock(features=5, kernel_size=4, stride=2, padding=1,
                      norm="none", activ="lrelu", pad_type="reflect")
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(block.apply(params, jnp.asarray(x)))

    kernel = np.asarray(params["params"]["Conv_0"]["kernel"])  # (kh,kw,in,out)
    bias = np.asarray(params["params"]["Conv_0"]["bias"])
    conv = torch.nn.Conv2d(3, 5, 4, 2, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(bias))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = torch.nn.ReflectionPad2d(1)(xt)
    want = torch.nn.LeakyReLU(0.2)(conv(xt)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_convblock_shapes():
    x = jnp.zeros((2, 16, 16, 3))
    for k, s, p, out_hw in [(7, 1, 3, 16), (4, 2, 1, 8), (3, 1, 1, 16), (5, 1, 2, 16), (1, 1, 0, 16)]:
        block = ConvBlock(features=8, kernel_size=k, stride=s, padding=p, pad_type="reflect")
        params = block.init(jax.random.PRNGKey(0), x)
        y = block.apply(params, x)
        assert y.shape == (2, out_hw, out_hw, 8), (k, s, p, y.shape)


def test_resblock_identity_add():
    """ResBlock output = convs(x) + x (networks.py:306-310)."""
    x = jnp.asarray(_rand((1, 8, 8, 4)))
    block = ResBlock(dim=4, norm="in", activ="relu", pad_type="reflect")
    params = block.init(jax.random.PRNGKey(1), x)
    y = block.apply(params, x)
    assert y.shape == x.shape


def test_mlp_structure():
    """3 LinearBlocks, final no norm/act (networks.py:280-292)."""
    x = jnp.asarray(_rand((2, 8)))
    mlp = MLP(out_dim=32, dim=16, n_blk=3)
    params = mlp.init(jax.random.PRNGKey(0), x)
    y = mlp.apply(params, x)
    assert y.shape == (2, 32)
    # final block has no activation => outputs can be negative
    assert np.asarray(y).min() < 0


def test_linearblock_matches_torch():
    x = _rand((3, 6))
    block = LinearBlock(features=4, norm="none", activ="relu")
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(block.apply(params, jnp.asarray(x)))
    kernel = np.asarray(params["params"]["Dense_0"]["kernel"])  # (in,out)
    bias = np.asarray(params["params"]["Dense_0"]["bias"])
    lin = torch.nn.Linear(6, 4)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(kernel.T))
        lin.bias.copy_(torch.from_numpy(bias))
    want = torch.relu(lin(torch.from_numpy(x))).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_make_grid_ragged_batch_normalizes_before_padding():
    """Filler tiles of a ragged batch must not skew min-max normalization
    (torchvision normalizes the input, then pads)."""
    import numpy as np

    from aclgan_tpu.utils.image import make_grid

    imgs = np.full((3, 4, 4, 3), 0.5, np.float32)
    imgs[0, 0, 0, 0] = 1.0  # range [0.5, 1.0], all positive
    grid = make_grid(imgs, nrow=2, normalize=True)
    # real pixels must span the full range: min real pixel -> 0, max -> 255
    assert grid[:4, :4].max() == 255
    assert grid[:4, 4:8].min() == 0  # a 0.5-valued real tile maps to 0
    # filler tile (bottom-right) stays black
    assert grid[4:, 4:].max() == 0
