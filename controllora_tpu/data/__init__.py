from controllora_tpu.data.registry import DatasetBase  # noqa: F401
from controllora_tpu.data.fill50k import Fill50kSynthetic  # noqa: F401
from controllora_tpu.data.process_datasets import (  # noqa: F401
    DanbooruSketch,
    DiffusionDBCanny,
    MPIIPose,
)
from controllora_tpu.data.dreambooth import DreamBoothDataset  # noqa: F401
