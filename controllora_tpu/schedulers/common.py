"""Shared diffusion noise-schedule tables.

The reference relies on diffusers' DDPMScheduler / DPMSolverMultistepScheduler (reference
train_text_to_image_control_lora.py:399, :824). Here the schedule is a small immutable table
pytree built once outside jit; all step math is pure and `lax.scan`-compatible.

SD1.5 schedule: scaled_linear betas in [0.00085, 0.012], 1000 train steps, epsilon
prediction.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DiffusionSchedule:
    """Precomputed per-timestep coefficient tables (float32, length = num_train_timesteps)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    steps_offset: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        steps_offset: int = 1,
    ) -> "DiffusionSchedule":
        if beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        elif beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
                )
                ** 2
            )
        elif beta_schedule == "squaredcos_cap_v2":
            t = np.arange(num_train_timesteps, dtype=np.float64)

            def f(u):
                return np.cos((u / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2

            betas = np.clip(1.0 - f(t + 1) / f(t), 0, 0.999)
        else:
            raise ValueError(f"unknown beta_schedule {beta_schedule!r}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            betas=jnp.asarray(betas, jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            steps_offset=steps_offset,
        )

    # ------------------------------------------------------------------ training math

    def _gather(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """Gather per-sample coefficients and broadcast to an ndim-array shape."""
        v = table[t].astype(jnp.float32)
        return v.reshape(v.shape + (1,) * (ndim - v.ndim))

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0) sample — the trainer's noising step."""
        acp = self._gather(self.alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(acp) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - acp) * noise.astype(
            jnp.float32
        )

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v-prediction target (diffusers convention)."""
        acp = self._gather(self.alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(acp) * noise.astype(jnp.float32) - jnp.sqrt(1.0 - acp) * x0.astype(
            jnp.float32
        )

    def pred_original_sample(
        self, sample: jnp.ndarray, model_output: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """x0 estimate from a model output under this schedule's prediction_type."""
        acp = self._gather(self.alphas_cumprod, t, sample.ndim)
        alpha_t = jnp.sqrt(acp)
        sigma_t = jnp.sqrt(1.0 - acp)
        if self.prediction_type == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if self.prediction_type == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(f"unknown prediction_type {self.prediction_type!r}")


def linspace_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """DPM-Solver style inference grid: linspace over [0, T-1], drop the 0 endpoint,
    descending (matches diffusers DPMSolverMultistepScheduler.set_timesteps)."""
    ts = (
        np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int32)
    )
    return ts.copy()


def leading_timesteps(
    num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 1
) -> np.ndarray:
    """DDIM/PNDM style 'leading' grid with steps_offset (diffusers DDIMScheduler)."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)
    return ts + steps_offset
