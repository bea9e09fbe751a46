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


def test_euler_tables_and_trajectory_golden():
    """EulerDiscrete vs independent float64 literals: 4-step linspace grid lands on
    integer timesteps [999, 666, 333, 0], sigmas = sqrt((1-acp)/acp) there (+0
    endpoint), and the scalar epsilon-prediction trajectory
    x_{i+1} = x_i + (sigma_{i+1}-sigma_i)*eps from x = 1.3*sigma_max."""
    from controllora_tpu.schedulers import EulerDiscreteScheduler

    SIGMAS4_GOLDEN = np.array(
        [14.61464123, 2.91830712, 0.93235797, 0.02916716, 0.0]
    )
    EULER_TRAJ4_GOLDEN = np.array(
        [14.32049995, 14.71768978, 14.26609438, 14.26901109]
    )
    sch = EulerDiscreteScheduler()
    ts, sigmas = sch.tables(4)
    np.testing.assert_allclose(np.asarray(ts), [999.0, 666.0, 333.0, 0.0])
    np.testing.assert_allclose(np.asarray(sigmas, np.float64), SIGMAS4_GOLDEN,
                               rtol=2e-5, atol=1e-7)
    # model_input scale at step 0 equals sqrt(acp[999]) (VE<->VP frame identity)
    np.testing.assert_allclose(
        float(sch.model_input(jnp.float32(1.0), sigmas[0])), ALPHA4_GOLDEN[0],
        rtol=2e-5,
    )
    x = sch.init_state(jnp.full((1, 1, 1, 1), 1.3, jnp.float32), sigmas)
    for i, e in enumerate([0.4, -0.2, 0.5, -0.1]):
        x = sch.step(x, jnp.full((1, 1, 1, 1), e, jnp.float32), jnp.asarray(i), sigmas)
        np.testing.assert_allclose(float(x[0, 0, 0, 0]), EULER_TRAJ4_GOLDEN[i],
                                   rtol=3e-4)


def test_unipc_corrector_polynomial_exactness():
    """The UniPC corrector's precomputed weights must reproduce the EXACT
    exponential integral x_t = (sigma_t/sigma_s)x_s + sigma_t * int e^lambda
    q(lambda) dlambda for quadratic q — the defining order condition of the
    order-2 bh2 corrector. Exact value via Gauss-Legendre quadrature over the
    golden lambda grid (independent literals above), not via scheduler code."""
    from controllora_tpu.schedulers import UniPCMultistepScheduler

    sch = UniPCMultistepScheduler()
    ts, ratio, A, r1, rc1, rc2 = sch.tables(4)

    q = lambda lam: 0.7 - 1.1 * lam + 0.8 * lam**2
    # transition j: grid point j -> j+1; s1 = point j-1 (needs j >= 1)
    for j in (1, 2, 3):
        l_s1, l_s0, l_t = LAMBDA4_GOLDEN[j - 1], LAMBDA4_GOLDEN[j], LAMBDA4_GOLDEN[j + 1]
        s_s0, s_t = SIGMA4_GOLDEN[j], SIGMA4_GOLDEN[j + 1]
        x_s = 2.3
        nodes, weights = np.polynomial.legendre.leggauss(40)
        mid, half = (l_s0 + l_t) / 2, (l_t - l_s0) / 2
        integral = half * np.sum(weights * np.exp(mid + half * nodes) * q(mid + half * nodes))
        exact = (s_t / s_s0) * x_s + s_t * integral

        m1, m0, m_t = q(l_s1), q(l_s0), q(l_t)
        d1 = (m1 - m0) / float(r1[j])
        corr = (float(ratio[j]) * x_s - float(A[j]) * m0
                - float(A[j]) * (float(rc1[j]) * d1 + float(rc2[j]) * (m_t - m0)))
        np.testing.assert_allclose(corr, exact, rtol=2e-4)


def test_unipc_4step_trajectory_golden():
    """Full predictor-corrector run against an independent float64 hand-run
    (epsilon sequence as the DPM golden; first step must equal DPM++'s first-order
    update, later steps diverge through the corrector)."""
    from controllora_tpu.schedulers import UniPCMultistepScheduler

    UNIPC_TRAJ4_GOLDEN = np.array(
        [5.17392317, 12.69821336, 19.47522368, 23.64648348]
    )
    sch = UniPCMultistepScheduler()
    tables = sch.tables(4)
    state = sch.init_state(jnp.full((1, 1, 1, 1), 1.7, jnp.float32))
    for i, e in enumerate([0.3, -0.5, 0.2, 0.1]):
        state = sch.step(
            state, jnp.full((1, 1, 1, 1), e, jnp.float32), jnp.asarray(i), 4, tables
        )
        np.testing.assert_allclose(
            float(state.sample[0, 0, 0, 0]), UNIPC_TRAJ4_GOLDEN[i], rtol=3e-4
        )
    np.testing.assert_allclose(UNIPC_TRAJ4_GOLDEN[0], TRAJ4_GOLDEN[0], rtol=1e-7)


def test_ddpm_add_noise_golden():
    """add_noise at t=500: sqrt(acp)·x0 + sqrt(1-acp)·eps with the golden acp."""
    sch = DiffusionSchedule.create()
    x0 = jnp.full((1, 2, 2, 1), 0.5, jnp.float32)
    eps = jnp.full((1, 2, 2, 1), -1.25, jnp.float32)
    noisy = sch.add_noise(x0, eps, jnp.asarray([500]))
    acp = ACP_GOLDEN[500]
    expect = np.sqrt(acp) * 0.5 + np.sqrt(1 - acp) * -1.25
    np.testing.assert_allclose(np.asarray(noisy), expect, rtol=2e-5)
