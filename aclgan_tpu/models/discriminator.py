"""Multi-scale PatchGAN discriminator (MsImageDis, networks.py:21-57).

`num_scales` independent conv stacks; the input is average-pool-downsampled
(3x3/s2/p1, count_include_pad=False — networks.py:33) between scales. Returns
the list of per-scale logit maps. Loss heads live in aclgan_tpu.losses as pure
functions (the reference couples them to the module, networks.py:60-106).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from aclgan_tpu.config import DisConfig
from aclgan_tpu.ops.blocks import ConvBlock
from aclgan_tpu.ops.initializers import make_initializer
from aclgan_tpu.ops.pool import avg_pool_3x3_s2


class _ScaleNet(nn.Module):
    """One scale: 4x4 s2 conv (no norm) -> (n_layer-1) dim-doubling convs -> 1x1.

    (_make_net, networks.py:38-47)
    """

    cfg: DisConfig
    init_type: str = "gaussian"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = self.cfg
        common = dict(activ=c.activ, pad_type=c.pad_type,
                      init_type=self.init_type, dtype=self.dtype)
        dim = c.dim
        x = ConvBlock(dim, 4, 2, 1, norm="none", **common)(x, train=train)
        for _ in range(c.n_layer - 1):
            x = ConvBlock(dim * 2, 4, 2, 1, norm=c.norm, **common)(x, train=train)
            dim *= 2
        x = nn.Conv(
            1, (1, 1), (1, 1), "VALID", use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=make_initializer(self.init_type),
            bias_init=nn.initializers.zeros,
        )(x)
        return x


class MsDiscriminator(nn.Module):
    """num_scales PatchGAN stacks over a downsampling pyramid (networks.py:49-57)."""

    cfg: DisConfig
    init_type: str = "gaussian"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> List[jnp.ndarray]:
        outputs = []
        for scale in range(self.cfg.num_scales):
            outputs.append(_ScaleNet(self.cfg, self.init_type, self.dtype,
                                     name=f"scale_{scale}")(x, train))
            if scale + 1 < self.cfg.num_scales:
                x = avg_pool_3x3_s2(x)
        return outputs
