"""ControlLoRA-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
HighCWu/ControlLoRA — lightweight spatial-control adapters for a frozen Stable Diffusion 1.5.

Design stance (vs the PyTorch reference, see SURVEY.md):
  * Pure-functional everywhere: the reference's *stateful* attention-processor injection
    (reference models.py:810-835 `inject_control_states`) becomes explicit argument threading —
    the UNet forward takes an ``adapters`` pytree of per-attention-layer adapter stacks.
  * NHWC layouts, bf16 frozen weights, fp32 adapters — TPU-native dtype/layout policy
    (the reference casts frozen parts to fp16 and keeps adapters fp32,
    reference train_text_to_image_control_lora.py:437-447).
  * Data/model parallelism via jax.sharding.Mesh + jit shardings (the reference uses
    accelerate/DDP, reference train_text_to_image_control_lora.py:683-685).
"""

__version__ = "0.1.0"

from controllora_tpu.config import ControlLoRAConfig  # noqa: F401
