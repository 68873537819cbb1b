from aclgan_tpu.data.dataset import (  # noqa: F401
    IMG_EXTENSIONS,
    is_image_file,
    list_images_filelist,
    list_images_folder,
    load_image,
)
from aclgan_tpu.data.loader import DataLoader, SyntheticDataset, get_all_data_loaders  # noqa: F401
from aclgan_tpu.data.transforms import TransformSpec, apply_transform  # noqa: F401
