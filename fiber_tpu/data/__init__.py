from fiber_tpu.data.mlm import mlm_mask  # noqa: F401
from fiber_tpu.data.transforms import (normalize_on_device,  # noqa: F401
                                       IMAGENET_INCEPTION_MEAN,
                                       IMAGENET_INCEPTION_STD)
