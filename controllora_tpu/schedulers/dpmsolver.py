"""DPM-Solver++ (2M) multistep sampler.

Functional rebuild of the inference scheduler used everywhere in the reference
(DPMSolverMultistepScheduler: reference train_text_to_image_control_lora.py:824,
test_text_to_image_control_lora.py, apps). algorithm dpmsolver++, solver_order 2,
midpoint, lower_order_final — the diffusers defaults the reference runs with.

TPU-native shape: all per-step coefficients are precomputed host-side into small tables;
the per-step update is a pure function of ``(sample, prev_model_output, step_index)`` so a
whole sampling run is a single `lax.scan` over the UNet.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from controllora_tpu.schedulers.common import DiffusionSchedule, linspace_timesteps


@struct.dataclass
class DPMSolverState:
    sample: jnp.ndarray
    prev_x0: jnp.ndarray  # previous converted model output (zeros before first step)


class DPMSolverMultistepScheduler:
    def __init__(
        self,
        schedule: DiffusionSchedule | None = None,
        solver_order: int = 2,
        lower_order_final: bool = True,
    ):
        self.schedule = schedule or DiffusionSchedule.create()
        assert solver_order in (1, 2)
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return linspace_timesteps(self.schedule.num_train_timesteps, num_inference_steps)

    def tables(self, num_inference_steps: int):
        """Per-inference-step (alpha, sigma, lambda) arrays of length steps+1.

        Index i is the state *before* applying model output at grid point i; the final
        entry is the clean endpoint (alpha=1, sigma=0 limit approximated by t=0 tables'
        continuation: diffusers uses lambda at the *next grid timestep*, and the last
        update targets t_prev = timesteps[i+1] with timesteps[-1] implicitly 0).
        """
        acp = np.asarray(self.schedule.alphas_cumprod)
        ts = self.timesteps(num_inference_steps)
        # target grid: each step i moves from ts[i] to ts[i+1] (0 after the last)
        ts_ext = np.concatenate([ts, [0]])
        alpha = np.sqrt(acp[ts_ext])
        sigma = np.sqrt(1.0 - acp[ts_ext])
        lam = np.log(alpha) - np.log(sigma)
        return (
            jnp.asarray(ts, jnp.int32),
            jnp.asarray(alpha, jnp.float32),
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(lam, jnp.float32),
        )

    def convert_model_output(self, model_output, t, sample):
        """epsilon/v -> x0 (dpmsolver++ data-prediction form)."""
        return self.schedule.pred_original_sample(sample, model_output, t)

    def step(
        self,
        state: DPMSolverState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        num_inference_steps: int,
        tables=None,
        first_index: int = 0,
    ) -> DPMSolverState:
        """One multistep update. ``step_index`` is a scalar int array in [0, steps).

        ``first_index``: the first grid index this trajectory actually executes —
        0 for full sampling, >0 when img2img starts mid-schedule (the order-1
        warm-up then happens at the first executed step, where no prev_x0
        history exists yet)."""
        ts, alpha, sigma, lam = tables if tables is not None else self.tables(
            num_inference_steps
        )
        i = step_index
        t = ts[i]
        x0 = self.convert_model_output(model_output, t, state.sample)

        a_t, s_t, l_t = alpha[i + 1], sigma[i + 1], lam[i + 1]
        a_s, s_s, l_s = alpha[i], sigma[i], lam[i]
        h = l_t - l_s

        # first-order (DPM-Solver++ 1S) update
        first = (s_t / s_s) * state.sample - a_t * (jnp.exp(-h) - 1.0) * x0

        if self.solver_order == 1:
            return DPMSolverState(sample=first, prev_x0=x0)

        # second-order multistep (2M, midpoint) update using the previous x0
        l_s1 = lam[jnp.maximum(i - 1, 0)]
        h_0 = l_s - l_s1
        r0 = h_0 / h
        d1 = (x0 - state.prev_x0) / r0
        second = (
            (s_t / s_s) * state.sample
            - a_t * (jnp.exp(-h) - 1.0) * x0
            - 0.5 * a_t * (jnp.exp(-h) - 1.0) * d1
        )

        use_first = i == first_index
        if self.lower_order_final and num_inference_steps < 15:
            use_first = jnp.logical_or(use_first, i == num_inference_steps - 1)
        new_sample = jnp.where(use_first, first, second)
        return DPMSolverState(sample=new_sample, prev_x0=x0)

    def init_state(self, sample: jnp.ndarray) -> DPMSolverState:
        return DPMSolverState(sample=sample, prev_x0=jnp.zeros_like(sample))
