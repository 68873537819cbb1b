"""AdaIN generator: style encoder + content encoder + AdaIN decoder + MLP.

TPU-native rebuild of AdaINGen (networks.py:112-171) and its submodules
(StyleEncoder networks.py:212-228, ContentEncoder networks.py:230-245,
Decoder networks.py:247-264). The defining difference from the reference: the
MLP's AdaIN parameter vector is *sliced and passed down the call* into the
decoder's residual blocks instead of being mutated onto module attributes
(assign_adain_params, networks.py:154-163). Slicing order matches the
reference's module-traversal order exactly (resblock0.conv0, resblock0.conv1,
resblock1.conv0, ...; per layer: first C entries = shift/"mean", next C =
scale/"std") so ported PyTorch weights reproduce outputs bit-for-bit modulo
dtype.

Layout is NHWC throughout; style codes are (N, style_dim).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aclgan_tpu.config import GenConfig
from aclgan_tpu.ops.blocks import MLP, ConvBlock, ResBlocks
from aclgan_tpu.ops.initializers import make_initializer
from aclgan_tpu.ops.pool import global_avg_pool, upsample_nearest_2x


def content_dim(cfg: GenConfig) -> int:
    """Channels at the content bottleneck (networks.py:242)."""
    return cfg.dim * (2 ** cfg.n_downsample)


def num_adain_params(cfg: GenConfig) -> int:
    """2 params (scale, shift) per channel, 2 AdaIN convs per resblock
    (get_num_adain_params, networks.py:165-171)."""
    return 2 * content_dim(cfg) * 2 * cfg.n_res


class StyleEncoder(nn.Module):
    """7x7 s1 -> 2x downsample(dim doubling) -> extra downsamples -> GAP -> 1x1.

    (networks.py:212-228; always built with 4 downsamples, networks.py:126)
    """

    dim: int
    style_dim: int
    n_downsample: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(norm="none", activ=self.activ, pad_type=self.pad_type,
                      init_type=self.init_type, dtype=self.dtype)
        dim = self.dim
        x = ConvBlock(dim, 7, 1, 3, **common)(x)
        for _ in range(2):
            x = ConvBlock(dim * 2, 4, 2, 1, **common)(x)
            dim *= 2
        for _ in range(self.n_downsample - 2):
            x = ConvBlock(dim, 4, 2, 1, **common)(x)
        x = global_avg_pool(x)
        x = nn.Conv(
            self.style_dim, (1, 1), (1, 1), "VALID", use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=make_initializer(self.init_type),
            bias_init=nn.initializers.zeros,
        )(x)
        return x.reshape(x.shape[0], self.style_dim)  # (N, style_dim)


class ContentEncoder(nn.Module):
    """7x7 s1 -> n_downsample x (4x4 s2, dim doubling) -> ResBlocks('in').

    (networks.py:230-245)
    """

    dim: int
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(norm="in", activ=self.activ, pad_type=self.pad_type,
                      init_type=self.init_type, dtype=self.dtype)
        dim = self.dim
        x = ConvBlock(dim, 7, 1, 3, **common)(x)
        for _ in range(self.n_downsample):
            x = ConvBlock(dim * 2, 4, 2, 1, **common)(x)
            dim *= 2
        x = ResBlocks(self.n_res, dim, norm="in", activ=self.activ,
                      pad_type=self.pad_type, init_type=self.init_type,
                      dtype=self.dtype)(x)
        return x


def _slice_adain(adain_vec: jnp.ndarray, dim: int, n_res: int):
    """Slice the MLP output into per-resblock ((scale, shift), (scale, shift)).

    Matches assign_adain_params consumption order (networks.py:154-163):
    traversal order over AdaIN layers; per layer the first `dim` entries are
    the shift ("mean"->bias) and the next `dim` the scale ("std"->weight).
    """
    out: List[Tuple] = []
    offset = 0
    for _ in range(n_res):
        convs = []
        for _ in range(2):
            shift = adain_vec[:, offset:offset + dim]
            scale = adain_vec[:, offset + dim:offset + 2 * dim]
            convs.append((scale, shift))
            offset += 2 * dim
        out.append(tuple(convs))
    return out


class Decoder(nn.Module):
    """ResBlocks('adain') -> n_upsample x (nearest 2x + 5x5 'ln' conv) -> 7x7 tanh.

    (networks.py:247-264). `adain_vec` is the raw MLP output (N, num_adain).
    """

    dim: int                  # channels at the bottleneck (content_dim)
    output_dim: int
    n_upsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32
    fast_upsample: bool = True  # collapsed-tap upsample+conv (exact, 2.8x fewer MACs)

    @nn.compact
    def __call__(self, x: jnp.ndarray, adain_vec: jnp.ndarray) -> jnp.ndarray:
        adain = _slice_adain(adain_vec, self.dim, self.n_res)
        x = ResBlocks(self.n_res, self.dim, norm="adain", activ=self.activ,
                      pad_type=self.pad_type, init_type=self.init_type,
                      dtype=self.dtype)(x, adain=adain)
        dim = self.dim
        for _ in range(self.n_upsample):
            if self.fast_upsample:
                x = ConvBlock(dim // 2, 5, 1, 2, norm="ln", activ=self.activ,
                              pad_type=self.pad_type, init_type=self.init_type,
                              dtype=self.dtype, fast_upsample=True)(x)
            else:
                x = upsample_nearest_2x(x)
                x = ConvBlock(dim // 2, 5, 1, 2, norm="ln", activ=self.activ,
                              pad_type=self.pad_type, init_type=self.init_type,
                              dtype=self.dtype)(x)
            dim //= 2
        x = ConvBlock(self.output_dim, 7, 1, 3, norm="none", activ="tanh",
                      pad_type=self.pad_type, init_type=self.init_type,
                      dtype=self.dtype)(x)
        return x


class AdaINGenerator(nn.Module):
    """The full generator with encode/decode entry points (networks.py:112-152)."""

    cfg: GenConfig
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32
    fast_upsample: bool = True

    def setup(self):
        c = self.cfg
        self.enc_style = StyleEncoder(
            dim=c.dim, style_dim=c.style_dim, n_downsample=4, activ=c.activ,
            pad_type=c.pad_type, init_type=self.init_type, dtype=self.dtype)
        self.enc_content = ContentEncoder(
            dim=c.dim, n_downsample=c.n_downsample, n_res=c.n_res, activ=c.activ,
            pad_type=c.pad_type, init_type=self.init_type, dtype=self.dtype)
        self.dec = Decoder(
            dim=content_dim(c), output_dim=c.output_dim, n_upsample=c.n_downsample,
            n_res=c.n_res, activ=c.activ, pad_type=c.pad_type,
            init_type=self.init_type, dtype=self.dtype, fast_upsample=self.fast_upsample)
        self.mlp = MLP(
            out_dim=num_adain_params(c), dim=c.mlp_dim, n_blk=3, norm="none",
            activ=c.activ, init_type=self.init_type, dtype=self.dtype)

    def encode(self, images: jnp.ndarray):
        """images (N,H,W,C) -> (content (N,h,w,Cc), style (N, style_dim))."""
        return self.enc_content(images), self.enc_style(images)

    def encode_content(self, images: jnp.ndarray) -> jnp.ndarray:
        """Content code only — the trainer uses this on paths whose style
        output is discarded (`c_1, _ = encode(...)`, trainer.py:103,125),
        skipping the style encoder's ~20% of encode FLOPs."""
        return self.enc_content(images)

    def encode_style(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.enc_style(images)

    def decode(self, content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        """Run MLP(style) -> AdaIN params -> decoder (networks.py:147-152)."""
        adain_vec = self.mlp(style)
        return self.dec(content, adain_vec)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """Self-reconstruction; used for parameter init (networks.py:135-139)."""
        content, style = self.encode(images)
        return self.decode(content, style)
