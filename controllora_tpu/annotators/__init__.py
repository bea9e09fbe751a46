from controllora_tpu.annotators.canny import CannyDetector, canny  # noqa: F401
from controllora_tpu.annotators.util import HWC3, resize_image  # noqa: F401
