from .utils import (
    dviz,
    enable_x64,
    get_haiku_dict,
    get_keys,
    initialize_inducing_points,
    preprocess_sparse_image,
    random_sample_dict,
    split_dict,
    split_in_batches,
)
from .fn import set_fn, set_kernel_fn, _set_noise_kernel_fn

__all__ = [
    "enable_x64",
    "get_keys",
    "split_in_batches",
    "split_dict",
    "random_sample_dict",
    "get_haiku_dict",
    "dviz",
    "preprocess_sparse_image",
    "initialize_inducing_points",
    "set_fn",
    "set_kernel_fn",
    "_set_noise_kernel_fn",
]
