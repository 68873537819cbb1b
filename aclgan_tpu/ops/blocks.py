"""Core building blocks (flax.linen, NHWC, functional AdaIN).

Reimplements the block layer of the reference (networks.py:269-418) with the
key TPU-first difference: AdaIN parameters are *call arguments* threaded down
from the style MLP instead of module state mutated from outside
(networks.py:154-163). Everything is a pure `init`/`apply` module; convs run
in a configurable compute dtype (bf16 on TPU) with float32 params.

Structure parity map:
- ConvBlock    <- Conv2dBlock   (networks.py:312-371): pad -> conv -> norm -> act
- LinearBlock  <- LinearBlock   (networks.py:373-418)
- ResBlock(s)  <- ResBlock(s)   (networks.py:269-278, 297-310)
- MLP          <- MLP           (networks.py:280-292)
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aclgan_tpu.ops.activations import apply_activation
from aclgan_tpu.ops.initializers import make_initializer
from aclgan_tpu.ops.norms import (
    TorchBatchNorm,
    adaptive_instance_norm,
    instance_norm,
    sample_layer_norm,
)
from aclgan_tpu.ops.spectral import SpectralConv, SpectralDense

from aclgan_tpu.ops.pad import PAD_MODES as _PAD_MODES

AdainParams = Tuple[jnp.ndarray, jnp.ndarray]  # (scale, shift), each (N, C)


class _ConvParams(nn.Module):
    """Raw conv kernel+bias parameters with nn.Conv-compatible naming, for
    paths that consume the kernel directly (fast upsample-conv)."""

    shape: Tuple[int, int, int, int]
    kernel_init: object

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
        return kernel, bias


class ConvBlock(nn.Module):
    """pad -> conv(VALID) -> norm -> activation."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    norm: str = "none"           # none / in / ln / adain / bn / sn
    activ: str = "relu"
    pad_type: str = "zero"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32
    fast_upsample: bool = False  # input is pre-upsample; fuse 2x-nearest+conv

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        adain: Optional[AdainParams] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        if self.pad_type not in _PAD_MODES:
            raise ValueError(f"Unsupported padding type: {self.pad_type!r}")

        # polyphase gates for the Cin=3 image-consuming heads — OPT-IN
        # measurement knobs, off by default: the fused-step arbitration found
        # no transfer of the standalone wins (ops/head_conv.py docstring).
        # Param trees stay identical to the nn.Conv path.
        head7_mode = ""
        dis4_poly = False
        if (self.kernel_size == 7 and self.stride == 1 and self.padding == 3
                and self.features > 8):
            from aclgan_tpu.ops.head_conv import use_poly_head7

            head7_mode = use_poly_head7(x.shape, self.features, self.norm)
        elif self.kernel_size == 4 and self.stride == 2 and self.padding == 1:
            from aclgan_tpu.ops.head_conv import use_poly_dis4

            dis4_poly = use_poly_dis4(x.shape, self.features, self.norm)

        if self.fast_upsample:
            # exact fast equivalent of upsample2x -> pad(2) -> 5x5 conv
            # (ops/upsample_conv.py); same param tree as the nn.Conv path.
            # Default: single lhs-dilated conv (no depth-to-space transpose;
            # measured faster fwd+bwd than the phase formulation at both
            # decoder layers — BENCH_NOTES round 2).
            from aclgan_tpu.ops.upsample_conv import (
                upsample2x_conv5x5, upsample2x_conv5x5_dilated)

            if not (self.kernel_size == 5 and self.stride == 1 and self.padding == 2):
                raise ValueError("fast_upsample requires the decoder's 5x5/s1/p2 shape")
            if self.norm == "sn":
                # the fused path builds a raw kernel; silently skipping the
                # spectral-norm wrap would train an unconstrained conv
                raise ValueError("fast_upsample does not support norm='sn'")
            kernel, bias = _ConvParams(
                (5, 5, x.shape[-1], self.features),
                make_initializer(self.init_type), name="Conv_0")()
            up_fn = (upsample2x_conv5x5
                     if os.environ.get("ACLGAN_UPSAMPLE") == "phase"
                     else upsample2x_conv5x5_dilated)
            x = up_fn(x.astype(self.dtype), kernel, bias, self.pad_type)
        elif (self.kernel_size == 7 and self.stride == 1 and self.padding == 3
              and self.features <= 8 and self.norm != "sn"
              and x.shape[2] % 32 == 0
              and os.environ.get("ACLGAN_FINAL_CONV") != "direct"):
            # lane-packed small-Cout head (ops/final_conv.py): the natural
            # GEMM would use features/128 MXU lanes. Same param tree as the
            # nn.Conv path.
            from aclgan_tpu.ops.final_conv import packed_conv_small_cout

            kernel, bias = _ConvParams(
                (7, 7, x.shape[-1], self.features),
                make_initializer(self.init_type), name="Conv_0")()
            x = packed_conv_small_cout(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.pad_type, 32)
            x = x + bias.astype(self.dtype)
        elif head7_mode:
            # Cin=3 7x7 encoder head: natural fwd / polyphase bwd ("mixed",
            # default) or fully polyphase ("poly") — ops/head_conv.py
            from aclgan_tpu.ops.head_conv import gen_head_conv7, head7_polyphase

            kernel, bias = _ConvParams(
                (7, 7, x.shape[-1], self.features),
                make_initializer(self.init_type), name="Conv_0")()
            head_fn = head7_polyphase if head7_mode == "poly" else gen_head_conv7
            x = head_fn(x.astype(self.dtype), kernel.astype(self.dtype),
                        self.pad_type)
            x = x + bias.astype(self.dtype)
        elif dis4_poly:
            # Cin=3 4x4 s2 discriminator head as a polyphase 2x2 s1 conv
            # (pure kernel reshuffle) — ops/head_conv.py
            from aclgan_tpu.ops.head_conv import dis_head_conv4s2

            kernel, bias = _ConvParams(
                (4, 4, x.shape[-1], self.features),
                make_initializer(self.init_type), name="Conv_0")()
            x = dis_head_conv4s2(x.astype(self.dtype),
                                 kernel.astype(self.dtype), self.pad_type)
            x = x + bias.astype(self.dtype)
        else:
            p = self.padding
            if p:
                from aclgan_tpu.ops.pad import pad2d

                x = pad2d(x, p, self.pad_type)
            kernel_init = make_initializer(self.init_type)
            conv_cls = SpectralConv if self.norm == "sn" else nn.Conv
            x = conv_cls(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=kernel_init,
                bias_init=nn.initializers.zeros,
            )(x)

        # NOTE no Pallas fused-IN path here: measured slower than XLA's own
        # fusion pipeline at every model shape, and the r3 trace bounds any
        # rewrite at ~+4% (docs/adr-pallas-instance-norm.md). The kernel
        # survives as a tested negative result in ops/pallas/instance_norm.py.

        if self.norm == "in":
            x = instance_norm(x)
        elif self.norm == "ln":
            gamma = self.param(
                "ln_gamma", nn.initializers.uniform(scale=1.0), (self.features,), jnp.float32
            )
            beta = self.param("ln_beta", nn.initializers.zeros, (self.features,), jnp.float32)
            x = sample_layer_norm(x, gamma, beta)
        elif self.norm == "adain":
            if adain is None:
                raise ValueError("AdaIN ConvBlock called without adain params")
            scale, shift = adain
            x = adaptive_instance_norm(x, scale, shift)
        elif self.norm == "bn":
            # torch-exact batch norm (networks.py:330-331); running stats in
            # the `batch_stats` collection, threaded by the trainer
            x = TorchBatchNorm(self.features, dtype=self.dtype)(x, train)
        elif self.norm not in ("none", "sn"):
            raise ValueError(f"Unsupported normalization: {self.norm!r}")

        prelu_alpha = None
        if self.activ == "prelu":
            prelu_alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (), jnp.float32)
        return apply_activation(x, self.activ, prelu_alpha)


class LinearBlock(nn.Module):
    """dense -> norm -> activation (networks.py:373-418)."""

    features: int
    norm: str = "none"
    activ: str = "relu"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        dense_cls = SpectralDense if self.norm == "sn" else nn.Dense
        x = dense_cls(
            features=self.features,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=make_initializer(self.init_type),
            bias_init=nn.initializers.zeros,
        )(x)
        if self.norm == "ln":
            gamma = self.param(
                "ln_gamma", nn.initializers.uniform(scale=1.0), (self.features,), jnp.float32
            )
            beta = self.param("ln_beta", nn.initializers.zeros, (self.features,), jnp.float32)
            # 2D variant of the custom layer norm: stats over the feature dim
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            n = x.shape[-1]
            var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / max(n - 1, 1)
            x = ((x32 - mean) / (jnp.sqrt(var) + 1e-5) * gamma + beta).astype(x.dtype)
        elif self.norm == "bn":
            # torch-exact batch norm (networks.py:393-394)
            x = TorchBatchNorm(self.features, dtype=self.dtype)(x, train)
        elif self.norm == "in":
            # InstanceNorm1d over (N, F): per-sample normalization, biased var
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            x = ((x32 - mean) / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        elif self.norm not in ("none", "sn"):
            raise ValueError(f"Unsupported normalization: {self.norm!r}")

        prelu_alpha = None
        if self.activ == "prelu":
            prelu_alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (), jnp.float32)
        return apply_activation(x, self.activ, prelu_alpha)


class ResBlock(nn.Module):
    """Two 3x3 s1 ConvBlocks (second activation 'none') + identity (networks.py:297-310)."""

    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "zero"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        adain: Optional[Tuple[AdainParams, AdainParams]] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        residual = x
        a0, a1 = adain if adain is not None else (None, None)
        common = dict(
            features=self.dim,
            kernel_size=3,
            stride=1,
            padding=1,
            norm=self.norm,
            pad_type=self.pad_type,
            init_type=self.init_type,
            dtype=self.dtype,
        )
        x = ConvBlock(activ=self.activ, **common)(x, adain=a0, train=train)
        x = ConvBlock(activ="none", **common)(x, adain=a1, train=train)
        return x + residual


class ResBlocks(nn.Module):
    """Stack of ResBlocks (networks.py:269-278)."""

    num_blocks: int
    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "zero"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, adain=None, train: bool = True):
        for i in range(self.num_blocks):
            block_adain = adain[i] if adain is not None else None
            x = ResBlock(
                dim=self.dim,
                norm=self.norm,
                activ=self.activ,
                pad_type=self.pad_type,
                init_type=self.init_type,
                dtype=self.dtype,
            )(x, adain=block_adain, train=train)
        return x


class MLP(nn.Module):
    """Style MLP producing AdaIN parameters (networks.py:280-292).

    3 LinearBlocks: in -> dim -> dim -> out, final block norm/act 'none'.
    """

    out_dim: int
    dim: int = 256
    n_blk: int = 3
    norm: str = "none"
    activ: str = "relu"
    init_type: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)  # flatten (networks.py:292)
        x = LinearBlock(self.dim, self.norm, self.activ, self.init_type, self.dtype)(x, train)
        for _ in range(self.n_blk - 2):
            x = LinearBlock(self.dim, self.norm, self.activ, self.init_type, self.dtype)(x, train)
        return LinearBlock(self.out_dim, "none", "none", self.init_type, self.dtype)(x, train)
