"""torch .pt checkpoint import: a synthetic reference-layout state dict maps
onto our param tree and reproduces outputs (the SURVEY §5.4 parity tool)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aclgan_tpu.models.discriminator import MsDiscriminator
from aclgan_tpu.models.generator import AdaINGenerator
from aclgan_tpu.utils.torch_import import (
    map_discriminator_state_dict,
    map_generator_state_dict,
)
from tests.helpers import tiny_config


def _gen_state_dict_from_flax(params, gen_cfg):
    """Build a reference-named torch state dict carrying our param values —
    tests the NAME MAPPING without reimplementing the torch model."""
    sd = {}

    def conv(prefix, blk):
        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
            np.asarray(blk["Conv_0"]["kernel"]).transpose(3, 2, 0, 1).copy())
        sd[f"{prefix}.conv.bias"] = torch.from_numpy(
            np.asarray(blk["Conv_0"]["bias"]).copy())
        if "ln_gamma" in blk:
            sd[f"{prefix}.norm.gamma"] = torch.from_numpy(np.asarray(blk["ln_gamma"]).copy())
            sd[f"{prefix}.norm.beta"] = torch.from_numpy(np.asarray(blk["ln_beta"]).copy())

    se = params["enc_style"]
    for i in range(5):
        conv(f"enc_style.model.{i}", se[f"ConvBlock_{i}"])
    sd["enc_style.model.6.weight"] = torch.from_numpy(
        np.asarray(se["Conv_0"]["kernel"]).transpose(3, 2, 0, 1).copy())
    sd["enc_style.model.6.bias"] = torch.from_numpy(np.asarray(se["Conv_0"]["bias"]).copy())

    ce = params["enc_content"]
    nd = gen_cfg.n_downsample
    for i in range(nd + 1):
        conv(f"enc_content.model.{i}", ce[f"ConvBlock_{i}"])
    for i in range(gen_cfg.n_res):
        for j in range(2):
            conv(f"enc_content.model.{nd + 1}.model.{i}.model.{j}",
                 ce["ResBlocks_0"][f"ResBlock_{i}"][f"ConvBlock_{j}"])

    de = params["dec"]
    for i in range(gen_cfg.n_res):
        for j in range(2):
            conv(f"dec.model.0.model.{i}.model.{j}",
                 de["ResBlocks_0"][f"ResBlock_{i}"][f"ConvBlock_{j}"])
    for k, tm in enumerate(range(2, 2 + 2 * nd, 2)):
        conv(f"dec.model.{tm}", de[f"ConvBlock_{k}"])
    conv(f"dec.model.{2 * nd + 1}", de[f"ConvBlock_{nd}"])

    for i in range(3):
        blk = params["mlp"][f"LinearBlock_{i}"]["Dense_0"]
        sd[f"mlp.model.{i}.fc.weight"] = torch.from_numpy(
            np.asarray(blk["kernel"]).T.copy())
        sd[f"mlp.model.{i}.fc.bias"] = torch.from_numpy(np.asarray(blk["bias"]).copy())
    return sd


def test_generator_import_roundtrip():
    cfg = tiny_config()
    gen = AdaINGenerator(cfg.gen)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    sd = _gen_state_dict_from_flax(params, cfg.gen)
    imported = map_generator_state_dict(sd, cfg.gen)
    out_orig = gen.apply({"params": params}, x)
    out_imp = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray, imported)}, x)
    np.testing.assert_allclose(np.asarray(out_orig), np.asarray(out_imp),
                               rtol=1e-6, atol=1e-6)


def test_discriminator_import_roundtrip():
    cfg = tiny_config()
    dis = MsDiscriminator(cfg.dis)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 3).astype(np.float32))
    params = dis.init(jax.random.PRNGKey(0), x)["params"]

    sd = {}
    for s in range(cfg.dis.num_scales):
        scale = params[f"scale_{s}"]
        for layer in range(cfg.dis.n_layer):
            blk = scale[f"ConvBlock_{layer}"]["Conv_0"]
            sd[f"cnns.{s}.{layer}.conv.weight"] = torch.from_numpy(
                np.asarray(blk["kernel"]).transpose(3, 2, 0, 1).copy())
            sd[f"cnns.{s}.{layer}.conv.bias"] = torch.from_numpy(
                np.asarray(blk["bias"]).copy())
        sd[f"cnns.{s}.{cfg.dis.n_layer}.weight"] = torch.from_numpy(
            np.asarray(scale["Conv_0"]["kernel"]).transpose(3, 2, 0, 1).copy())
        sd[f"cnns.{s}.{cfg.dis.n_layer}.bias"] = torch.from_numpy(
            np.asarray(scale["Conv_0"]["bias"]).copy())

    imported = map_discriminator_state_dict(sd, cfg.dis)
    out_orig = dis.apply({"params": params}, x)
    out_imp = dis.apply({"params": jax.tree_util.tree_map(jnp.asarray, imported)}, x)
    for a, b in zip(out_orig, out_imp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_import_shape_mismatch_raises():
    cfg = tiny_config()
    gen = AdaINGenerator(cfg.gen)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    sd = _gen_state_dict_from_flax(params, cfg.gen)
    sd["mlp.model.0.fc.weight"] = torch.zeros(3, 3)  # wrong shape
    from aclgan_tpu.utils.torch_import import _check_compat

    bad = map_generator_state_dict(sd, cfg.gen)
    with pytest.raises(ValueError, match="shape mismatch"):
        _check_compat(bad, params)
