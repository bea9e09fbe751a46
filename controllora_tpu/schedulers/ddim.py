"""DDIM sampler as a pure step function over a precomputed timestep grid."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from controllora_tpu.schedulers.common import DiffusionSchedule, leading_timesteps


class DDIMScheduler:
    def __init__(self, schedule: DiffusionSchedule | None = None):
        self.schedule = schedule or DiffusionSchedule.create()

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return leading_timesteps(
            self.schedule.num_train_timesteps, num_inference_steps, self.schedule.steps_offset
        )

    def step(self, model_output, t, t_prev, sample, eta: float = 0.0, noise=None):
        """Deterministic (eta=0) DDIM update x_t -> x_{t_prev}.

        ``t`` / ``t_prev`` are scalar int arrays; ``t_prev < 0`` denotes the final step
        (alpha_prod_prev = 1).
        """
        s = self.schedule
        acp_t = s.alphas_cumprod[t]
        acp_prev = jnp.where(t_prev >= 0, s.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)

        x0 = s.pred_original_sample(sample, model_output, t)
        eps = (sample - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)

        sigma = eta * jnp.sqrt(
            (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
        )
        dir_xt = jnp.sqrt(jnp.clip(1.0 - acp_prev - sigma**2, 0.0)) * eps
        prev = jnp.sqrt(acp_prev) * x0 + dir_xt
        if eta > 0.0 and noise is not None:
            prev = prev + sigma * noise
        return prev
