from aclgan_tpu.models.generator import AdaINGenerator, num_adain_params  # noqa: F401
from aclgan_tpu.models.discriminator import MsDiscriminator  # noqa: F401
