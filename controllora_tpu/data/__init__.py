from controllora_tpu.data.registry import DatasetBase  # noqa: F401
from controllora_tpu.data.fill50k import Fill50kSynthetic  # noqa: F401
