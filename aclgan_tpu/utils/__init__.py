from aclgan_tpu.utils.checkpoint import (  # noqa: F401
    get_model_list,
    load_checkpoint,
    resume,
    save_checkpoint,
)
from aclgan_tpu.utils.image import make_grid, save_image, write_2images  # noqa: F401
from aclgan_tpu.utils.logging import MetricWriter, write_html  # noqa: F401
from aclgan_tpu.utils.timer import Timer  # noqa: F401
