from controllora_tpu.schedulers.common import DiffusionSchedule  # noqa: F401
from controllora_tpu.schedulers.ddpm import DDPMScheduler  # noqa: F401
from controllora_tpu.schedulers.ddim import DDIMScheduler  # noqa: F401
from controllora_tpu.schedulers.dpmsolver import DPMSolverMultistepScheduler  # noqa: F401
from controllora_tpu.schedulers.pndm import PNDMScheduler  # noqa: F401
from controllora_tpu.schedulers.euler import EulerDiscreteScheduler  # noqa: F401
from controllora_tpu.schedulers.unipc import UniPCMultistepScheduler  # noqa: F401
