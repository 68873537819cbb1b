"""Import reference PyTorch checkpoints into our flax param trees.

The reference saves `torch.save({'AB': gen_AB.state_dict(), 'BA': ...})`
(trainer.py:329). This maps those state-dict keys onto our module tree so a
trained reference model can be run through the TPU framework for parity
evaluation (SURVEY §5.4: "a one-shot .pt import tool").

Name mapping (reference module paths -> flax paths):

  enc_style.model.{0..4}.conv      -> enc_style/ConvBlock_{0..4}/Conv_0
  enc_style.model.6                -> enc_style/Conv_0           (final 1x1)
  enc_content.model.{0..2}.conv    -> enc_content/ConvBlock_{0..2}/Conv_0
  enc_content.model.3.model.{i}.model.{j}.conv
                                   -> enc_content/ResBlocks_0/ResBlock_{i}/ConvBlock_{j}/Conv_0
  dec.model.0.model.{i}.model.{j}.conv
                                   -> dec/ResBlocks_0/ResBlock_{i}/ConvBlock_{j}/Conv_0
  dec.model.{2,4}.conv(+norm γβ)   -> dec/ConvBlock_{0,1}/Conv_0 (+ln_gamma/ln_beta)
  dec.model.5.conv                 -> dec/ConvBlock_2/Conv_0
  mlp.model.{0..2}.fc              -> mlp/LinearBlock_{0..2}/Dense_0
  cnns.{s}.{0..n-1}.conv           -> scale_{s}/ConvBlock_{0..n-1}/Conv_0
  cnns.{s}.{n}                     -> scale_{s}/Conv_0            (final 1x1)

Weight layout: conv (out,in,kh,kw) -> (kh,kw,in,out); linear (out,in) -> (in,out).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _get(sd: Dict[str, Any], key: str) -> np.ndarray:
    t = sd[key]
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def map_generator_state_dict(sd: Dict[str, Any], gen_cfg) -> Dict[str, Any]:
    """torch AdaINGen state_dict -> flax AdaINGenerator params dict."""
    p: Dict[str, Any] = {"enc_style": {}, "enc_content": {}, "dec": {}, "mlp": {}}

    def conv_block(prefix, torch_prefix, has_ln=False):
        blk = {"Conv_0": {"kernel": _conv_w(_get(sd, f"{torch_prefix}.conv.weight")),
                          "bias": _get(sd, f"{torch_prefix}.conv.bias")}}
        if has_ln:
            blk["ln_gamma"] = _get(sd, f"{torch_prefix}.norm.gamma")
            blk["ln_beta"] = _get(sd, f"{torch_prefix}.norm.beta")
        return blk

    # style encoder: model.0..4 conv blocks, model.5 pool, model.6 final conv
    for i in range(5):
        p["enc_style"][f"ConvBlock_{i}"] = conv_block(None, f"enc_style.model.{i}")
    p["enc_style"]["Conv_0"] = {
        "kernel": _conv_w(_get(sd, "enc_style.model.6.weight")),
        "bias": _get(sd, "enc_style.model.6.bias")}

    # content encoder: model.0..n_downsample conv blocks, then ResBlocks
    n_down = gen_cfg.n_downsample
    for i in range(n_down + 1):
        p["enc_content"][f"ConvBlock_{i}"] = conv_block(None, f"enc_content.model.{i}")
    res = {}
    for i in range(gen_cfg.n_res):
        res[f"ResBlock_{i}"] = {
            f"ConvBlock_{j}": conv_block(
                None, f"enc_content.model.{n_down + 1}.model.{i}.model.{j}")
            for j in range(2)}
    p["enc_content"]["ResBlocks_0"] = res

    # decoder: model.0 ResBlocks(adain), model.{1,3} Upsample, model.{2,4} ln
    # conv blocks, model.5 output conv
    res = {}
    for i in range(gen_cfg.n_res):
        res[f"ResBlock_{i}"] = {
            f"ConvBlock_{j}": conv_block(None, f"dec.model.0.model.{i}.model.{j}")
            for j in range(2)}
    p["dec"]["ResBlocks_0"] = res
    for k, tm in enumerate(range(2, 2 + 2 * n_down, 2)):
        p["dec"][f"ConvBlock_{k}"] = conv_block(None, f"dec.model.{tm}", has_ln=True)
    p["dec"][f"ConvBlock_{n_down}"] = conv_block(None, f"dec.model.{2 * n_down + 1}")

    # mlp: model.0..2 .fc linear layers
    for i in range(3):
        p["mlp"][f"LinearBlock_{i}"] = {"Dense_0": {
            "kernel": np.ascontiguousarray(_get(sd, f"mlp.model.{i}.fc.weight").T),
            "bias": _get(sd, f"mlp.model.{i}.fc.bias")}}
    return p


def map_discriminator_state_dict(sd: Dict[str, Any], dis_cfg) -> Dict[str, Any]:
    """torch MsImageDis state_dict -> flax MsDiscriminator params dict.

    With dis norm='sn' the reference wraps every non-first conv in
    SpectralNorm (networks.py:360-363), which renames the torch keys to
    `...conv.module.{weight_bar,bias}` (+ non-trainable weight_u/weight_v —
    see map_discriminator_spectral); the flax side then uses a SpectralConv_0
    submodule instead of Conv_0. The first block of each scale is always
    norm='none' (networks.py:40) and the final 1x1 is a bare nn.Conv2d
    (networks.py:46), so both keep the plain layout.
    """
    sn = getattr(dis_cfg, "norm", "none") == "sn"
    bn = getattr(dis_cfg, "norm", "none") == "bn"
    p: Dict[str, Any] = {}
    for s in range(dis_cfg.num_scales):
        scale = {}
        for layer in range(dis_cfg.n_layer):
            if sn and layer > 0:
                scale[f"ConvBlock_{layer}"] = {"SpectralConv_0": {
                    "kernel": _conv_w(_get(sd, f"cnns.{s}.{layer}.conv.module.weight_bar")),
                    "bias": _get(sd, f"cnns.{s}.{layer}.conv.module.bias")}}
            else:
                scale[f"ConvBlock_{layer}"] = {"Conv_0": {
                    "kernel": _conv_w(_get(sd, f"cnns.{s}.{layer}.conv.weight")),
                    "bias": _get(sd, f"cnns.{s}.{layer}.conv.bias")}}
                if bn and layer > 0:
                    # BatchNorm2d affine weights (networks.py:330-331);
                    # running stats go to the batch_stats collection
                    # (map_discriminator_stats)
                    scale[f"ConvBlock_{layer}"]["TorchBatchNorm_0"] = {
                        "scale": _get(sd, f"cnns.{s}.{layer}.norm.weight"),
                        "bias": _get(sd, f"cnns.{s}.{layer}.norm.bias")}
        scale["Conv_0"] = {
            "kernel": _conv_w(_get(sd, f"cnns.{s}.{dis_cfg.n_layer}.weight")),
            "bias": _get(sd, f"cnns.{s}.{dis_cfg.n_layer}.bias")}
        p[f"scale_{s}"] = scale
    return p


def _sn_v(v: np.ndarray, w_bar: np.ndarray) -> np.ndarray:
    """Reorder the torch power-iteration v vector to our column order.

    torch flattens the (out,in,kh,kw) weight as (out, in*kh*kw)
    (networks.py:560), our SpectralConv flattens (kh,kw,in,out) as
    (out, kh*kw*in): v is a permutation (in,kh,kw) -> (kh,kw,in).
    """
    _out, cin, kh, kw = w_bar.shape
    return np.ascontiguousarray(v.reshape(cin, kh, kw).transpose(1, 2, 0).ravel())


def map_discriminator_spectral(sd: Dict[str, Any], dis_cfg) -> Dict[str, Any]:
    """torch MsImageDis(norm='sn') weight_u/weight_v -> flax 'spectral' collection."""
    p: Dict[str, Any] = {}
    for s in range(dis_cfg.num_scales):
        scale = {}
        for layer in range(1, dis_cfg.n_layer):
            pre = f"cnns.{s}.{layer}.conv.module"
            scale[f"ConvBlock_{layer}"] = {"SpectralConv_0": {
                "u": _get(sd, f"{pre}.weight_u"),
                "v": _sn_v(_get(sd, f"{pre}.weight_v"),
                           _get(sd, f"{pre}.weight_bar")),
            }}
        p[f"scale_{s}"] = scale
    return p


def map_discriminator_stats(sd: Dict[str, Any], dis_cfg) -> Dict[str, Any]:
    """torch MsImageDis(norm='bn') running_mean/var -> flax 'batch_stats'."""
    p: Dict[str, Any] = {}
    for s in range(dis_cfg.num_scales):
        scale = {}
        for layer in range(1, dis_cfg.n_layer):
            scale[f"ConvBlock_{layer}"] = {"TorchBatchNorm_0": {
                "mean": _get(sd, f"cnns.{s}.{layer}.norm.running_mean"),
                "var": _get(sd, f"cnns.{s}.{layer}.norm.running_var")}}
        p[f"scale_{s}"] = scale
    return p


def _check_compat(mapped: Any, template: Any, path: str = "") -> None:
    import jax

    m_flat = jax.tree_util.tree_leaves_with_path(mapped)
    t_map = {jax.tree_util.keystr(k): v.shape
             for k, v in jax.tree_util.tree_leaves_with_path(template)}
    for k, v in m_flat:
        ks = jax.tree_util.keystr(k)
        if ks not in t_map:
            raise KeyError(f"imported key {ks} not in template")
        if tuple(v.shape) != tuple(t_map[ks]):
            raise ValueError(f"shape mismatch at {ks}: {v.shape} vs {t_map[ks]}")
    if len(m_flat) != len(t_map):
        missing = set(t_map) - {jax.tree_util.keystr(k) for k, _ in m_flat}
        raise KeyError(f"missing imported keys: {sorted(missing)[:5]}...")


def import_torch_gen_checkpoint(path: str, template_gen_params: Any, gen_cfg=None):
    """Load a reference gen_%08d.pt and return {'AB','BA'} flax params."""
    import torch

    if gen_cfg is None:
        from aclgan_tpu.config import GenConfig

        gen_cfg = GenConfig()
    ckpt = torch.load(path, map_location="cpu")
    out = {}
    for k in ("AB", "BA"):
        out[k] = map_generator_state_dict(ckpt[k], gen_cfg)
        _check_compat(out[k], template_gen_params[k])
    return out


def import_torch_dis_checkpoint(path: str, template_dis_params: Any, dis_cfg=None):
    """Load a reference dis_%08d.pt and return {'A','B','2'} flax params."""
    import torch

    if dis_cfg is None:
        from aclgan_tpu.config import DisConfig

        dis_cfg = DisConfig()
    ckpt = torch.load(path, map_location="cpu")
    out = {}
    for k in ("A", "B", "2"):
        out[k] = map_discriminator_state_dict(ckpt[k], dis_cfg)
        _check_compat(out[k], template_dis_params[k])
    return out


def import_torch_dis_stats(path: str, template_stats: Any, dis_cfg):
    """Load the bn running mean/var of a reference norm='bn' discriminator
    checkpoint as our {'A','B','2'} 'batch_stats' collections."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    out = {}
    for k in ("A", "B", "2"):
        out[k] = map_discriminator_stats(ckpt[k], dis_cfg)
        _check_compat(out[k], template_stats[k])
    return out


def import_torch_dis_spectral(path: str, template_spectral: Any, dis_cfg):
    """Load the power-iteration u/v vectors of a reference SN discriminator
    checkpoint as our {'A','B','2'} 'spectral' collections."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    out = {}
    for k in ("A", "B", "2"):
        out[k] = map_discriminator_spectral(ckpt[k], dis_cfg)
        _check_compat(out[k], template_spectral[k])
    return out
