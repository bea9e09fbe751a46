from controllora_tpu.pipelines.hires import hires_fix  # noqa: F401
from controllora_tpu.pipelines.text_to_image import StableDiffusionControlLoRAPipeline  # noqa: F401
