from controllora_tpu.annotators.canny import CannyDetector, canny  # noqa: F401
from controllora_tpu.annotators.util import HWC3, resize_image  # noqa: F401
from controllora_tpu.annotators.hed import HEDdetector, nms  # noqa: F401
from controllora_tpu.annotators.midas import MidasDetector  # noqa: F401
from controllora_tpu.annotators.mlsd import MLSDdetector  # noqa: F401
from controllora_tpu.annotators.openpose import OpenposeDetector  # noqa: F401
from controllora_tpu.annotators.uniformer import UniformerDetector  # noqa: F401
