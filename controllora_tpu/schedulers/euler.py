"""Euler discrete sampler (Karras et al. 2022 ODE form, diffusers conventions).

Beyond-reference: the reference only ever instantiates DDPM/DPMSolver++ via diffusers
(reference train_text_to_image_control_lora.py:399, :824), but Euler is the most common
alternative in the SD ecosystem, so the pipeline offers it for drop-in parity with
diffusers' `EulerDiscreteScheduler` defaults (timestep_spacing="linspace",
interpolation_type="linear", epsilon/v prediction).

TPU-native shape: the sigma/timestep grid is a small host-precomputed table; the
per-step update is one fused multiply-add, `lax.scan`-compatible. Unlike
DDIM/DPM-Solver++, Euler works in the VARIANCE-EXPLODING parameterization
x = x0 + sigma*eps: the initial noise scales by sigma_max (`init_state`) and the UNet
input must be pre-scaled by 1/sqrt(sigma^2+1) (`model_input`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from controllora_tpu.schedulers.common import DiffusionSchedule


class EulerDiscreteScheduler:
    def __init__(self, schedule: DiffusionSchedule | None = None):
        self.schedule = schedule or DiffusionSchedule.create()

    def tables(self, num_inference_steps: int):
        """(timesteps float32 (n,), sigmas float32 (n+1,)) — descending grid.

        diffusers linspace spacing: float timesteps over [0, T-1], sigmas linearly
        interpolated from sigma(t) = sqrt((1-acp)/acp); final entry 0 (the clean
        endpoint), so the last Euler step lands exactly on x0.
        """
        T = self.schedule.num_train_timesteps
        acp = np.asarray(self.schedule.alphas_cumprod, np.float64)
        sig = np.sqrt((1.0 - acp) / acp)
        ts = np.linspace(0, T - 1, num_inference_steps, dtype=np.float64)[::-1].copy()
        sigmas = np.interp(ts, np.arange(T, dtype=np.float64), sig)
        sigmas = np.concatenate([sigmas, [0.0]])
        return (
            jnp.asarray(ts, jnp.float32),
            jnp.asarray(sigmas, jnp.float32),
        )

    # ---------------------------------------------------------------- protocol

    def init_state(self, sample: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
        """x_T = sigma_max * noise (diffusers init_noise_sigma ~= 14.6 for SD1.5)."""
        return sample * sigmas[0]

    def model_input(self, sample: jnp.ndarray, sigma) -> jnp.ndarray:
        """diffusers scale_model_input: the UNet was trained in the
        variance-preserving frame, so divide by sqrt(sigma^2 + 1)."""
        return sample / jnp.sqrt(sigma**2 + 1.0)

    def step(
        self,
        sample: jnp.ndarray,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sigmas: jnp.ndarray,
    ) -> jnp.ndarray:
        """x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * dx/dsigma, with
        dx/dsigma = (x - x0_hat) / sigma (the probability-flow ODE derivative)."""
        i = step_index
        s = sigmas[i]
        if self.schedule.prediction_type == "epsilon":
            # x0 = x - sigma*eps  =>  derivative = eps, exactly
            deriv = model_output
        elif self.schedule.prediction_type == "v_prediction":
            x0 = sample / (s**2 + 1.0) - model_output * (s / jnp.sqrt(s**2 + 1.0))
            deriv = (sample - x0) / s
        else:
            raise ValueError(
                f"euler: unsupported prediction_type {self.schedule.prediction_type!r}"
            )
        return sample + (sigmas[i + 1] - s) * deriv
