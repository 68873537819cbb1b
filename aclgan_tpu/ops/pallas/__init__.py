from aclgan_tpu.ops.pallas.instance_norm import fused_instance_norm  # noqa: F401
