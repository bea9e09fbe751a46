import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DiffusionSchedule,
    DPMSolverMultistepScheduler,
)


def test_schedule_tables():
    s = DiffusionSchedule.create()
    assert s.betas.shape == (1000,)
    # SD1.5 scaled_linear endpoints
    np.testing.assert_allclose(float(s.betas[0]), 0.00085, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.012, rtol=1e-6)
    acp = np.asarray(s.alphas_cumprod)
    assert acp[0] > 0.999 - 1e-3 and acp[-1] < 0.01
    assert np.all(np.diff(acp) < 0)


def test_add_noise_and_velocity():
    sch = DDPMScheduler()
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.full((2, 4, 4, 1), 2.0)
    t = jnp.array([0, 999])
    noisy = sch.add_noise(x0, noise, t)
    acp = np.asarray(sch.schedule.alphas_cumprod)
    expect0 = np.sqrt(acp[0]) * 1.0 + np.sqrt(1 - acp[0]) * 2.0
    expect1 = np.sqrt(acp[999]) * 1.0 + np.sqrt(1 - acp[999]) * 2.0
    np.testing.assert_allclose(np.asarray(noisy[0, 0, 0, 0]), expect0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(noisy[1, 0, 0, 0]), expect1, rtol=1e-5)
    v = sch.get_velocity(x0, noise, t)
    np.testing.assert_allclose(
        np.asarray(v[0, 0, 0, 0]), np.sqrt(acp[0]) * 2 - np.sqrt(1 - acp[0]) * 1, rtol=1e-5
    )


def test_dpm_timesteps_grid():
    sch = DPMSolverMultistepScheduler()
    ts = sch.timesteps(20)
    assert len(ts) == 20
    assert ts[0] == 999 and ts[-1] > 0
    assert np.all(np.diff(ts) < 0)


def _analytic_eps(schedule, x, t, target):
    """Model that always predicts noise consistent with clean sample == target."""
    acp = schedule.alphas_cumprod[t]
    return (x - jnp.sqrt(acp) * target) / jnp.sqrt(1.0 - acp)


@pytest.mark.parametrize("steps", [4, 10, 25])
def test_dpmsolver_exact_on_analytic_model(steps):
    """With a model whose implied x0 is constant, the probability-flow ODE has the exact
    solution x_t = alpha_t * x0 + sigma_t * eps0 — the solver must track it to fp error."""
    sch = DPMSolverMultistepScheduler()
    target = jnp.full((1, 4, 4, 1), 0.7)
    tables = sch.tables(steps)
    ts, alpha, sigma, _ = tables
    x_init = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    # implied initial eps at the first grid point
    eps0 = (x_init - alpha[0] * target) / sigma[0]
    state = sch.init_state(x_init)
    for i in range(steps):
        eps = _analytic_eps(sch.schedule, state.sample, ts[i], target)
        state = sch.step(state, eps, jnp.asarray(i), steps, tables)
    exact = alpha[steps] * target + sigma[steps] * eps0
    np.testing.assert_allclose(np.asarray(state.sample), np.asarray(exact), atol=1e-4)
    # and the final state is close to x0 (sigma_0 ~ 0.03)
    np.testing.assert_allclose(np.asarray(state.sample), np.asarray(target), atol=0.2)


@pytest.mark.parametrize("steps", [10, 50])
def test_ddim_converges_to_x0(steps):
    sch = DDIMScheduler()
    target = jnp.full((1, 4, 4, 1), -0.3)
    ts = sch.timesteps(steps)
    x = jax.random.normal(jax.random.PRNGKey(1), target.shape)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        eps = _analytic_eps(sch.schedule, x, jnp.asarray(int(t)), target)
        x = sch.step(eps, jnp.asarray(int(t)), jnp.asarray(int(t_prev)), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-4)


def test_ddpm_ancestral_step_runs():
    sch = DDPMScheduler()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 1))
    eps = jnp.zeros_like(x)
    out = sch.step(eps, jnp.asarray(500), x, jax.random.PRNGKey(3))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("steps", [10, 50])
def test_pndm_tracks_analytic_solution(steps):
    from controllora_tpu.schedulers import PNDMScheduler

    sch = PNDMScheduler()
    target = jnp.full((1, 4, 4, 1), 0.4)
    ts = sch.timesteps(steps)
    x = jax.random.normal(jax.random.PRNGKey(3), target.shape)
    state = sch.init_state(x)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else ts[i] - (ts[0] - ts[1] if len(ts) > 1 else 1)
        eps = _analytic_eps(sch.schedule, state.sample, jnp.asarray(int(t)), target)
        state = sch.step(state, eps, jnp.asarray(int(t)), jnp.asarray(int(t_prev)))
    # PNDM ends near t=1; alpha there ~1 so the state approximates x0 closely
    np.testing.assert_allclose(np.asarray(state.sample), np.asarray(target), atol=0.2)


def test_dpmsolver_scan_compatible():
    """Whole sampling loop as one lax.scan (the TPU-native shape)."""
    sch = DPMSolverMultistepScheduler()
    steps = 8
    tables = sch.tables(steps)
    ts = tables[0]
    target = jnp.full((1, 4, 4, 1), 0.25)

    def body(state, i):
        eps = _analytic_eps(sch.schedule, state.sample, ts[i], target)
        return sch.step(state, eps, i, steps, tables), None

    state = sch.init_state(jax.random.normal(jax.random.PRNGKey(0), target.shape))
    state, _ = jax.lax.scan(body, state, jnp.arange(steps))
    np.testing.assert_allclose(np.asarray(state.sample), np.asarray(target), atol=0.2)
