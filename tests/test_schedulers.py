"""Scheduler/sampler correctness tests against analytic diffusion problems.

Rather than porting golden numbers, these tests use model functions whose
exact denoising trajectories are known in closed form:
  * a delta data distribution (exact epsilon known; every correct sampler
    must land exactly on x0), and
  * a Gaussian data distribution (posterior epsilon is linear in x_t; the
    probability-flow ODE can be integrated to arbitrary precision with a
    fine-grid reference integrator).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import SchedulerConfig
from diffcodec_tpu.sampling.schedulers import (NoiseSchedule, UniPC,
                                               cfg_combine,
                                               controlnet_keep_schedule,
                                               ddpm_step, unipc_timesteps)


@pytest.fixture(scope="module")
def schedule():
    return NoiseSchedule.create(SchedulerConfig())


def test_add_noise_and_x0_roundtrip(schedule):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    t = jnp.asarray([10, 800])
    xt = schedule.add_noise(x0, eps, t)
    x0_rec = schedule.pred_original_sample(xt, eps, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=2e-4, atol=2e-4)


def test_velocity_consistency(schedule):
    # v-pred: x0 = sa*xt - so*v must invert add_noise too
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
    t = jnp.asarray([321])
    xt = schedule.add_noise(x0, eps, t)
    v = schedule.velocity(x0, eps, t)
    vsched = NoiseSchedule.create(
        SchedulerConfig(prediction_type="v_prediction"))
    x0_rec = vsched.pred_original_sample(xt, v, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-4, atol=1e-4)


def test_unipc_timestep_grid():
    ts = unipc_timesteps(1000, 10)
    assert len(ts) == 10
    # diffusers 'linspace' drops the trailing 0; the final UniPC step
    # integrates from ts[-1] to sigma=0
    assert ts[0] == 999 and ts[-1] == 100
    assert all(ts[i] > ts[i + 1] for i in range(9))


def _delta_eps_model(schedule, x0_true):
    def model(x, t):
        abar = schedule.alphas_cumprod[t]
        sa = jnp.sqrt(abar)
        so = jnp.sqrt(1 - abar)
        return (x - sa * x0_true) / so
    return model


@pytest.mark.parametrize("steps", [5, 20])
def test_unipc_exact_on_delta_data(schedule, steps):
    """With the exact epsilon of a delta data distribution, UniPC must land
    exactly on x0 (all higher-order difference terms vanish)."""
    rng = np.random.default_rng(2)
    x0_true = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    model = _delta_eps_model(schedule, x0_true)
    unipc = UniPC(schedule, steps)
    tables = unipc.tables()
    z = jnp.asarray(rng.standard_normal(x0_true.shape).astype(np.float32))
    state = unipc.init_state(z)
    for i in range(steps):
        eps = model(state.sample, tables.timesteps[i])
        state = unipc.step(tables, state, eps, i)
    np.testing.assert_allclose(np.asarray(state.sample), np.asarray(x0_true),
                               rtol=1e-3, atol=1e-3)


def _gaussian_eps_np(abar, x, mu, s2):
    """Posterior-mean epsilon for x0 ~ N(mu, s2)."""
    sa = np.sqrt(abar)
    so = np.sqrt(1 - abar)
    x0_hat = (sa * s2 * x + so ** 2 * mu) / (sa ** 2 * s2 + so ** 2)
    return (x - sa * x0_hat) / so


def _reference_ode_solution(schedule, x_start, t_grid_start, mu, s2,
                            substeps=40000, lam_end=14.0):
    """Integrate the probability-flow ODE in lambda-space on a very fine grid
    using the exact first-order (DPM-Solver-1 / exponential-integrator) update,
    which converges to the true solution as substeps -> inf.  Integrates all
    the way to sigma ~= 0 (lam_end large), matching UniPC's final step."""
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    alpha = np.sqrt(abar)
    sigma = np.sqrt(1 - abar)
    lam = np.log(alpha) - np.log(sigma)
    lam_start = lam[t_grid_start]
    lams = np.linspace(lam_start, lam_end, substeps)
    # invert lambda -> abar: lam = 0.5*log(abar/(1-abar)) -> abar = sigmoid(2lam)
    x = x_start.astype(np.float64)
    for k in range(len(lams) - 1):
        l0, l1 = lams[k], lams[k + 1]
        ab0 = 1.0 / (1.0 + np.exp(-2 * l0))
        ab1 = 1.0 / (1.0 + np.exp(-2 * l1))
        a0, s0 = np.sqrt(ab0), np.sqrt(1 - ab0)
        a1, s1 = np.sqrt(ab1), np.sqrt(1 - ab1)
        eps = _gaussian_eps_np(ab0, x, mu, s2)
        x0_hat = (x - s0 * eps) / a0
        h = l1 - l0
        x = (s1 / s0) * x - a1 * np.expm1(-h) * x0_hat
    return x


def _generic_unipc_numpy(schedule, eps_model, z, N):
    """Direct transcription of the UniPC algorithm (data-prediction, bh2,
    solver order 2, corrector, lower-order warmup/final) with the generic
    R-matrix/b-vector construction — the oracle for the table-based jax
    implementation."""
    import math

    ts = unipc_timesteps(1000, N)
    abar_full = np.asarray(schedule.alphas_cumprod, np.float64)
    alpha = np.sqrt(abar_full[ts])
    sigma = np.sqrt(1 - abar_full[ts])
    lam = np.log(alpha) - np.log(sigma)

    def lam_i(i):
        return lam[i] if i < N else 50.0

    def alpha_sigma(i):
        return (alpha[i], sigma[i]) if i < N else (1.0, 0.0)

    def x0_of(x, i):
        e = eps_model(x, abar_full[ts[i]])
        return (x - sigma[i] * e) / alpha[i]

    def update(x_base, l0, i_target, order, m_hist, t_hist, m_extra=None):
        """Shared UniP/UniC update from lambda l0 to grid index i_target.
        m_extra, when given, is the corrector's D1_t model output."""
        m0 = m_hist[-1]
        lt = lam_i(i_target)
        at, st = alpha_sigma(i_target)
        s0 = sigma[i_target - 1]
        h = lt - l0
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1
        rks, D1s = [], []
        for k in range(1, order):
            li = t_hist[-(k + 1)]
            mi = m_hist[-(k + 1)]
            rk = (li - l0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        for k in range(1, order + 1):
            R.append(np.power(rks, k - 1))
            b.append(h_phi_k * math.factorial(k) / B_h)
            h_phi_k = h_phi_k / hh - 1 / math.factorial(k + 1)
        x_t = (st / s0) * x_base - at * h_phi_1 * m0
        if m_extra is not None:  # corrector
            rhos = (np.asarray([0.5]) if order == 1 else
                    np.linalg.solve(np.asarray(R), np.asarray(b)))
            corr = sum(r * d for r, d in zip(rhos[:-1], D1s))
            x_t = x_t - at * B_h * (corr + rhos[-1] * (m_extra - m0))
        elif order >= 2:
            rhos = ([0.5] if order == 2 else
                    np.linalg.solve(np.asarray(R[:-1])[:, :-1],
                                    np.asarray(b[:-1])))
            x_t = x_t - at * B_h * sum(r * d for r, d in zip(rhos, D1s))
        return x_t

    x = z.astype(np.float64).copy()
    m_hist, t_hist = [], []
    last = None
    lower = 0
    prev_order = None
    for i in range(N):
        m_t = x0_of(x, i)
        if i > 0:
            x = update(last, t_hist[-1], i, prev_order, m_hist, t_hist,
                       m_extra=m_t)
        m_hist = (m_hist + [m_t])[-3:]
        t_hist = (t_hist + [lam_i(i)])[-3:]
        this_order = min(2, N - i, lower + 1)
        last = x
        x = update(x, lam_i(i), i + 1, this_order, m_hist, t_hist)
        prev_order = this_order
        lower = min(lower + 1, 2)
    return x


def test_unipc_matches_generic_algorithm_on_gaussian_data(schedule):
    """Table-based jax UniPC == generic R-matrix numpy UniPC, step grid 20."""
    rng = np.random.default_rng(3)
    mu = rng.standard_normal(4)
    s2 = 0.25
    z = rng.standard_normal(4)

    def eps_np(x, abar):
        sa, so = np.sqrt(abar), np.sqrt(1 - abar)
        x0h = (sa * s2 * x + so ** 2 * mu) / (sa ** 2 * s2 + so ** 2)
        return (x - sa * x0h) / so

    N = 20
    unipc = UniPC(schedule, N)
    tables = unipc.tables()
    abar_full = np.asarray(schedule.alphas_cumprod, np.float64)
    ts = unipc_timesteps(1000, N)
    state = unipc.init_state(jnp.asarray(z[None].astype(np.float32)))
    for i in range(N):
        x = np.asarray(state.sample)[0].astype(np.float64)
        eps = eps_np(x, abar_full[ts[i]])
        state = unipc.step(tables, state,
                           jnp.asarray(eps[None].astype(np.float32)), i)
    got = np.asarray(state.sample)[0]
    want = _generic_unipc_numpy(schedule, eps_np, z, N)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_unipc_error_decreases_with_steps(schedule):
    """ODE error vs a fine reference must shrink with step count.  (The
    absolute floor is set by the scheduler's final sigma->0 jump, which is
    O(sigma_min^2) by design — same as diffusers.)"""
    rng = np.random.default_rng(4)
    mu = rng.standard_normal(3)
    s2 = 0.5
    z = rng.standard_normal(3)

    def eps_np(x, abar):
        sa, so = np.sqrt(abar), np.sqrt(1 - abar)
        x0h = (sa * s2 * x + so ** 2 * mu) / (sa ** 2 * s2 + so ** 2)
        return (x - sa * x0h) / so

    abar_full = np.asarray(schedule.alphas_cumprod, np.float64)

    def run(steps):
        unipc = UniPC(schedule, steps)
        tables = unipc.tables()
        ts = unipc_timesteps(1000, steps)
        state = unipc.init_state(jnp.asarray(z[None].astype(np.float32)))
        for i in range(steps):
            x = np.asarray(state.sample)[0].astype(np.float64)
            eps = eps_np(x, abar_full[ts[i]])
            state = unipc.step(tables, state,
                               jnp.asarray(eps[None].astype(np.float32)), i)
        return np.asarray(state.sample)[0]

    def err(steps):
        got = run(steps)
        want = _reference_ode_solution(
            schedule, z, int(unipc_timesteps(1000, steps)[0]), mu, s2,
            substeps=20000)
        return np.abs(got - want).max()

    e10, e40 = err(10), err(40)
    assert e40 < e10 / 2.5


def test_ddpm_step_converges_on_delta(schedule):
    rng = np.random.default_rng(5)
    x0_true = jnp.asarray(rng.standard_normal((1, 2, 2, 1)).astype(np.float32))
    model = _delta_eps_model(schedule, x0_true)
    key = jax.random.PRNGKey(0)
    ts = np.arange(999, -1, -50)  # 20 steps
    x = jnp.asarray(rng.standard_normal(x0_true.shape).astype(np.float32))
    for k, t in enumerate(ts):
        prev = ts[k + 1] if k + 1 < len(ts) else -1
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape)
        eps = model(x, jnp.asarray(t))
        x = ddpm_step(schedule, eps, int(t), int(prev), x, noise,
                      clip_sample=False)
    # ancestral sampling of a delta distribution concentrates on x0
    assert np.abs(np.asarray(x) - np.asarray(x0_true)).max() < 0.2


def test_cfg_and_keep_schedule():
    u = jnp.asarray([1.0])
    c = jnp.asarray([3.0])
    np.testing.assert_allclose(np.asarray(cfg_combine(u, c, 2.0)), [5.0])
    keep = controlnet_keep_schedule(10, 0.0, 1.0)
    np.testing.assert_allclose(keep, 1.0)
    keep = controlnet_keep_schedule(10, 0.2, 0.8)
    assert keep[0] == 0.0 and keep[-1] == 0.0 and keep[5] == 1.0
