"""PNDM (pseudo linear multistep) sampler.

The reference gradio apps run the StableDiffusionPipeline default scheduler (PNDM) when
not overridden (SURVEY.md §3.2); provided for sampling parity. Implementation follows
the standard PLMS method with the 3-step Runge-Kutta warmup replaced by linear
multistep bootstrapping of lower order (the skip_prk_steps=True configuration SD
actually uses), as pure scan-friendly steps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from controllora_tpu.schedulers.common import DiffusionSchedule, leading_timesteps


@struct.dataclass
class PNDMState:
    sample: jnp.ndarray
    ets: jnp.ndarray  # (4, ...) ring buffer of recent eps predictions
    count: jnp.ndarray  # number of valid entries


class PNDMScheduler:
    def __init__(self, schedule: DiffusionSchedule | None = None):
        self.schedule = schedule or DiffusionSchedule.create()

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return leading_timesteps(
            self.schedule.num_train_timesteps, num_inference_steps,
            self.schedule.steps_offset,
        )

    def init_state(self, sample: jnp.ndarray) -> PNDMState:
        return PNDMState(
            sample=sample,
            ets=jnp.zeros((4,) + sample.shape, sample.dtype),
            count=jnp.zeros((), jnp.int32),
        )

    def _prev_sample(self, sample, t, t_prev, eps):
        s = self.schedule
        acp_t = s.alphas_cumprod[t]
        acp_prev = jnp.where(t_prev >= 0, s.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        # PNDM transfer formula (Liu et al. 2022, eq. 11)
        sample_coeff = jnp.sqrt(acp_prev / acp_t)
        denom = acp_t * jnp.sqrt(1.0 - acp_prev) + jnp.sqrt(
            acp_prev * acp_t * (1.0 - acp_t)
        )
        eps_coeff = (acp_prev - acp_t) / denom
        return sample_coeff * sample - eps_coeff * eps

    def step(self, state: PNDMState, model_output, t, t_prev) -> PNDMState:
        """Linear-multistep update with order ramping 1->4 as history fills."""
        ets = jnp.roll(state.ets, 1, axis=0).at[0].set(model_output)
        count = jnp.minimum(state.count + 1, 4)
        e0, e1, e2, e3 = ets[0], ets[1], ets[2], ets[3]
        order1 = e0
        order2 = (3 * e0 - e1) / 2
        order3 = (23 * e0 - 16 * e1 + 5 * e2) / 12
        order4 = (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24
        eps = jnp.select(
            [count == 1, count == 2, count == 3],
            [order1, order2, order3],
            order4,
        )
        prev = self._prev_sample(state.sample, t, t_prev, eps)
        return PNDMState(sample=prev, ets=ets, count=count)
