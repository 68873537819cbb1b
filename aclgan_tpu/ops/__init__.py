from aclgan_tpu.ops.norms import (  # noqa: F401
    adaptive_instance_norm,
    instance_norm,
    sample_layer_norm,
)
from aclgan_tpu.ops.pool import avg_pool_3x3_s2, global_avg_pool, upsample_nearest_2x  # noqa: F401
from aclgan_tpu.ops.activations import apply_activation  # noqa: F401
from aclgan_tpu.ops.initializers import make_initializer  # noqa: F401
from aclgan_tpu.ops.blocks import ConvBlock, LinearBlock, MLP, ResBlock, ResBlocks  # noqa: F401
