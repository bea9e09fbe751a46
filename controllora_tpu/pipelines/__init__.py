from controllora_tpu.pipelines.text_to_image import StableDiffusionControlLoRAPipeline  # noqa: F401
