"""DDPM scheduler: training-side noising plus ancestral sampling step.

Functional equivalent of diffusers' DDPMScheduler as used by the reference trainer
(reference train_text_to_image_control_lora.py:756-783): `add_noise`, `get_velocity`, and
an ancestral `step` for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from controllora_tpu.schedulers.common import DiffusionSchedule


class DDPMScheduler:
    def __init__(self, schedule: DiffusionSchedule | None = None, clip_sample: bool = False):
        self.schedule = schedule or DiffusionSchedule.create()
        self.clip_sample = clip_sample

    # training API ------------------------------------------------------------
    def add_noise(self, x0, noise, t):
        return self.schedule.add_noise(x0, noise, t)

    def get_velocity(self, x0, noise, t):
        return self.schedule.get_velocity(x0, noise, t)

    def training_target(self, x0, noise, t):
        """The regression target under the schedule's prediction type
        (reference train_text_to_image_control_lora.py:774-783)."""
        p = self.schedule.prediction_type
        if p == "epsilon":
            return noise
        if p == "v_prediction":
            return self.get_velocity(x0, noise, t)
        raise ValueError(f"unsupported prediction type {p!r}")

    # sampling API ------------------------------------------------------------
    def step(self, model_output, t, sample, rng):
        """One ancestral reverse step x_t -> x_{t-1}; t is a scalar int array."""
        s = self.schedule
        acp_t = s.alphas_cumprod[t]
        acp_prev = jnp.where(t > 0, s.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
        beta_t = 1.0 - acp_t / acp_prev

        x0 = s.pred_original_sample(sample, model_output, t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        # posterior mean coefficients
        coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
        coef_xt = jnp.sqrt(acp_t / acp_prev) * (1.0 - acp_prev) / (1.0 - acp_t)
        mean = coef_x0 * x0 + coef_xt * sample

        var = jnp.clip(beta_t * (1.0 - acp_prev) / (1.0 - acp_t), 1e-20)
        noise = jax.random.normal(rng, sample.shape, dtype=sample.dtype)
        return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
