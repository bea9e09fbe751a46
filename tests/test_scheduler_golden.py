"""Analytic golden-value scheduler tests (VERDICT round-1 item 3).

Every constant below is a float64 literal computed independently from the published
formulas — NOT from this repo's code:

  * SD1.5 betas: scaled_linear, beta_start=0.00085, beta_end=0.012, 1000 steps
    (runwayml/stable-diffusion-v1-5 scheduler/scheduler_config.json; the reference
    consumes it at train_text_to_image_control_lora.py:399).
  * DPM-Solver++ tables: alpha_t = sqrt(acp), sigma_t = sqrt(1-acp),
    lambda_t = log(alpha_t) - log(sigma_t) on the 4-step linspace grid
    (Lu et al. 2022, eq. 4; diffusers DPMSolverMultistepScheduler conventions).
  * The 4-step 2M trajectory: hand-run of the multistep update equations on scalars
    (first-order at i=0 and, via lower_order_final, at the last step).

A transposed table, off-by-one grid, or wrong epsilon in dpmsolver.py/common.py fails
these with no fixtures needed.
"""

import jax.numpy as jnp
import numpy as np

from controllora_tpu.schedulers import DPMSolverMultistepScheduler
from controllora_tpu.schedulers.common import DiffusionSchedule, linspace_timesteps

# ---- float64 golden literals (independent derivation, see module docstring)

BETAS_GOLDEN = {
    0: 0.00085,
    1: 0.0008546986554056862,
    499: 0.004803792980550717,
    998: 0.011982376333083366,
    999: 0.012,
}
ACP_GOLDEN = {
    0: 0.99915,
    250: 0.6737926252333215,
    500: 0.2763326838229746,
    749: 0.056623491598269717,
    999: 0.004660098513077238,
}
TS4_GOLDEN = np.array([999, 749, 500, 250], np.int32)
ALPHA4_GOLDEN = np.array(
    [0.0682649142171675, 0.2379569112219053, 0.5256735525237831,
     0.8208487225020951, 0.9995749096490968]
)
SIGMA4_GOLDEN = np.array(
    [0.9976672298351403, 0.971275711835589, 0.8506863794472235,
     0.571145668605373, 0.029154759474226803]
)
LAMBDA4_GOLDEN = np.array(
    [-2.682023850149251, -1.4065207622691644, -0.4813631313660098,
     0.36269454391471156, 3.534711923512526]
)
# x=1.7, eps_i = [0.3, -0.5, 0.2, 0.1], 4-step 2M with lower_order_final
TRAJ4_GOLDEN = np.array(
    [5.173923168889776, 12.452974232601479, 19.204863555432897, 23.31976904537836]
)


def test_sd15_betas_golden():
    sch = DiffusionSchedule.create()
    betas = np.asarray(sch.betas, np.float64)
    for i, v in BETAS_GOLDEN.items():
        np.testing.assert_allclose(betas[i], v, rtol=1e-6)


def test_sd15_alphas_cumprod_golden():
    sch = DiffusionSchedule.create()
    acp = np.asarray(sch.alphas_cumprod, np.float64)
    for i, v in ACP_GOLDEN.items():
        np.testing.assert_allclose(acp[i], v, rtol=2e-5)


def test_dpm_4step_grid_golden():
    np.testing.assert_array_equal(linspace_timesteps(1000, 4), TS4_GOLDEN)


def test_dpm_4step_tables_golden():
    sch = DPMSolverMultistepScheduler()
    ts, alpha, sigma, lam = sch.tables(4)
    np.testing.assert_array_equal(np.asarray(ts), TS4_GOLDEN)
    np.testing.assert_allclose(np.asarray(alpha, np.float64), ALPHA4_GOLDEN, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma, np.float64), SIGMA4_GOLDEN, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lam, np.float64), LAMBDA4_GOLDEN, rtol=3e-5)


def test_dpm_4step_trajectory_golden():
    """Full 2M multistep run against the hand-computed scalar trajectory."""
    sch = DPMSolverMultistepScheduler()
    tables = sch.tables(4)
    state = sch.init_state(jnp.full((1, 1, 1, 1), 1.7, jnp.float32))
    eps_seq = [0.3, -0.5, 0.2, 0.1]
    for i, e in enumerate(eps_seq):
        state = sch.step(
            state, jnp.full((1, 1, 1, 1), e, jnp.float32), jnp.asarray(i), 4, tables
        )
        np.testing.assert_allclose(
            float(state.sample[0, 0, 0, 0]), TRAJ4_GOLDEN[i], rtol=3e-4
        )


def test_ddpm_add_noise_golden():
    """add_noise at t=500: sqrt(acp)·x0 + sqrt(1-acp)·eps with the golden acp."""
    sch = DiffusionSchedule.create()
    x0 = jnp.full((1, 2, 2, 1), 0.5, jnp.float32)
    eps = jnp.full((1, 2, 2, 1), -1.25, jnp.float32)
    noisy = sch.add_noise(x0, eps, jnp.asarray([500]))
    acp = ACP_GOLDEN[500]
    expect = np.sqrt(acp) * 0.5 + np.sqrt(1 - acp) * -1.25
    np.testing.assert_allclose(np.asarray(noisy), expect, rtol=2e-5)
