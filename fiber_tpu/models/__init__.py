from fiber_tpu.models.swin import SwinTransformer  # noqa: F401
from fiber_tpu.models.roberta import RobertaEncoderModel  # noqa: F401
from fiber_tpu.models.fiber import FiberCoarse  # noqa: F401
