"""Step-for-step parity of our table-based UniPC against a vendored
transcription of diffusers' `UniPCMultistepScheduler`.

The reference samples through diffusers' exact implementation
(`/root/reference/pipeline.py:263-266` retrieve_timesteps →
`scheduler.step` at `:375`; scheduler built by
`/root/reference/validation.py:37` as
`UniPCMultistepScheduler.from_pretrained(SD-1.5, subfolder="scheduler")`,
i.e. scaled_linear betas 0.00085..0.012, 1000 train steps, epsilon
prediction, and the UniPC defaults: solver_order=2, solver_type='bh2',
predict_x0=True, lower_order_final=True, corrector enabled,
timestep_spacing='linspace', final_sigmas_type='zero').

diffusers is not installed in this image, so the scheduler's update math
is vendored below as a stateful numpy oracle — a faithful transcription
of `diffusers/schedulers/scheduling_unipc_multistep.py` (v0.35 line):
`set_timesteps` (linspace grid + interp'd karras-convention sigmas with a
zero final sigma), `convert_model_output` (epsilon → x0),
`multistep_uni_p_bh_update` / `multistep_uni_c_bh_update` (general-order
R-matrix solve with the order-2 predictor shortcut rhos_p=[0.5] and the
order-1 corrector shortcut rhos_c=[0.5]), and `step`'s
warmup/lower_order_final order logic.  This is the same vendored-oracle
move as `tests/test_bd_oracle.py` made for the `bjontegaard` package.

Our implementation under test: `diffcodec_tpu/sampling/schedulers.py`
(UniPC tables + fori_loop-friendly step).  Also covers DDPM `add_noise`
against the diffusers formula used at the reference's train step
(`/root/reference/train_controlnet.py:1085-1095`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffcodec_tpu.config import SchedulerConfig
from diffcodec_tpu.sampling.schedulers import (NoiseSchedule, UniPC,
                                               unipc_timesteps)


# ---------------------------------------------------------------------------
# Vendored oracle: numpy transcription of diffusers UniPCMultistepScheduler
# ---------------------------------------------------------------------------

class DiffusersUniPCOracle:
    """Stateful numpy transcription of diffusers' UniPCMultistepScheduler.

    Config fixed to the reference's operating point: prediction_type
    'epsilon', predict_x0=True, solver_type='bh2', thresholding off,
    timestep_spacing 'linspace', final_sigmas_type 'zero', no karras
    sigmas, corrector never disabled.  `solver_order` is a parameter so
    the default (2) is tested as one point of a family rather than the
    only shape the oracle can take.
    """

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, beta_schedule="scaled_linear",
                 solver_order=2, lower_order_final=True):
        if beta_schedule == "scaled_linear":
            betas = (np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                 num_train_timesteps, dtype=np.float64) ** 2)
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        else:
            raise ValueError(beta_schedule)
        self.num_train_timesteps = num_train_timesteps
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        # karras-convention sigma table: sigma(t) = sqrt((1-abar)/abar)
        self.sigmas_full = np.sqrt(
            (1.0 - self.alphas_cumprod) / self.alphas_cumprod)

    # -- set_timesteps: 'linspace' spacing, final_sigmas_type='zero' --------
    def set_timesteps(self, num_inference_steps):
        self.timesteps = (np.linspace(0, self.num_train_timesteps - 1,
                                      num_inference_steps + 1)
                          .round()[::-1][:-1].copy().astype(np.int64))
        sigmas = np.interp(self.timesteps,
                           np.arange(len(self.sigmas_full)),
                           self.sigmas_full)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_inference_steps = num_inference_steps
        self.model_outputs = [None] * self.solver_order
        self.timestep_list = [None] * self.solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.step_index = 0

    @staticmethod
    def _sigma_to_alpha_sigma_t(sigma):
        alpha_t = 1.0 / np.sqrt(sigma ** 2 + 1.0)
        return alpha_t, sigma * alpha_t

    def _lambda(self, sigma):
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        with np.errstate(divide="ignore"):
            return np.log(alpha_t) - np.log(sigma_t)

    def convert_model_output(self, model_output, sample):
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        # epsilon prediction, no thresholding
        return (sample - sigma_t * model_output) / alpha_t

    # -- predictor: x(t_{i}) -> x(t_{i+1}) ----------------------------------
    def multistep_uni_p_bh_update(self, sample, order):
        m0 = self.model_outputs[-1]
        x = sample
        sigma_t_k = self.sigmas[self.step_index + 1]
        sigma_s0_k = self.sigmas[self.step_index]
        # diffusers rebinds sigma_t/sigma_s0 to VP-space sigmas here
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t_k)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0_k)
        lambda_t = self._lambda(sigma_t_k)
        lambda_s0 = self._lambda(sigma_s0_k)
        h = lambda_t - lambda_s0

        rks, D1s = [], []
        for i in range(1, order):
            si = self.step_index - i
            mi = self.model_outputs[-(i + 1)]
            lambda_si = self._lambda(self.sigmas[si])
            rk = (lambda_si - lambda_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)

        hh = -h  # predict_x0 path
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1.0
        B_h = np.expm1(hh)  # bh2
        R, b = [], []
        factorial_i = 1.0
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        R = np.stack(R)
        b = np.asarray(b)

        if D1s:
            D1s = np.stack(D1s, axis=1)  # (B, K, ...)
            if order == 2:
                rhos_p = np.asarray([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
        else:
            D1s = None

        x_t_ = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
        if D1s is not None:
            pred_res = np.einsum("k,bk...->b...", rhos_p, D1s)
        else:
            pred_res = 0.0
        return x_t_ - alpha_t * B_h * pred_res

    # -- corrector: recompute x(t_i) from x(t_{i-1}) -------------------------
    def multistep_uni_c_bh_update(self, this_model_output, last_sample,
                                  this_sample, order):
        m0 = self.model_outputs[-1]
        x = last_sample
        model_t = this_model_output
        sigma_t_k = self.sigmas[self.step_index]
        sigma_s0_k = self.sigmas[self.step_index - 1]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t_k)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0_k)
        lambda_t = self._lambda(sigma_t_k)
        lambda_s0 = self._lambda(sigma_s0_k)
        h = lambda_t - lambda_s0

        rks, D1s = [], []
        for i in range(1, order):
            si = self.step_index - (i + 1)
            mi = self.model_outputs[-(i + 1)]
            lambda_si = self._lambda(self.sigmas[si])
            rk = (lambda_si - lambda_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)

        hh = -h
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1.0
        B_h = np.expm1(hh)  # bh2
        R, b = [], []
        factorial_i = 1.0
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        R = np.stack(R)
        b = np.asarray(b)

        D1s = np.stack(D1s, axis=1) if D1s else None
        if order == 1:
            rhos_c = np.asarray([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)

        x_t_ = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
        if D1s is not None:
            corr_res = np.einsum("k,bk...->b...", rhos_c[:-1], D1s)
        else:
            corr_res = 0.0
        D1_t = model_t - m0
        return x_t_ - alpha_t * B_h * (corr_res + rhos_c[-1] * D1_t)

    # -- step: corrector → history shift → order logic → predictor ----------
    def step(self, model_output, timestep, sample):
        use_corrector = self.step_index > 0 and self.last_sample is not None

        model_output_convert = self.convert_model_output(model_output,
                                                         sample=sample)
        if use_corrector:
            sample = self.multistep_uni_c_bh_update(
                this_model_output=model_output_convert,
                last_sample=self.last_sample, this_sample=sample,
                order=self.this_order)

        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
            self.timestep_list[i] = self.timestep_list[i + 1]
        self.model_outputs[-1] = model_output_convert
        self.timestep_list[-1] = timestep

        if self.lower_order_final:
            this_order = min(self.solver_order,
                             len(self.timesteps) - self.step_index)
        else:
            this_order = self.solver_order
        self.this_order = min(this_order, self.lower_order_nums + 1)

        self.last_sample = sample
        prev_sample = self.multistep_uni_p_bh_update(sample=sample,
                                                     order=self.this_order)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev_sample, sample


# ---------------------------------------------------------------------------
# The driven "model": a fixed deterministic function of (x, t) so both
# loops see identical outputs whenever their states agree.
# ---------------------------------------------------------------------------

def make_fake_model(shape, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=shape).astype(np.float64) * 0.3
    b = rng.normal(size=shape).astype(np.float64)

    def fn(x, t):
        x = np.asarray(x, np.float64)
        return np.tanh(0.7 * x + b) + w * np.cos(x) + 1e-3 * float(t)

    return fn


SD = dict(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
          beta_schedule="scaled_linear")


@pytest.fixture(scope="module")
def schedule():
    return NoiseSchedule.create(SchedulerConfig(**SD))


@pytest.mark.parametrize("steps", [30, 40, 50])
def test_unipc_matches_diffusers_oracle_exact_math(steps):
    """Per-step latent agreement <= 1e-10 against the diffusers
    transcription over the reference's 30/40/50-step linspace grids,
    with OUR real `UniPC.step` run in float64 (enable_x64) so the
    comparison isolates update math from float32 carry rounding: any
    bh2 / lower-order-final / spacing mismatch would show at ~1e-3-1e-1,
    not 1e-10.  Teacher-forced (both see the same eps sequence)."""
    enable_x64 = jax.enable_x64

    shape = (2, 8, 8, 4)
    model = make_fake_model(shape)

    oracle = DiffusersUniPCOracle(**SD)
    oracle.set_timesteps(steps)

    with enable_x64():
        schedule64 = NoiseSchedule.create(SchedulerConfig(**SD),
                                          dtype=jnp.float64)
        unipc = UniPC(schedule=schedule64, num_inference_steps=steps)
        tables = unipc.tables(dtype=jnp.float64)

        # grids must be identical before any stepping
        np.testing.assert_array_equal(np.asarray(tables.timesteps),
                                      oracle.timesteps)

        x_ref = np.random.default_rng(1).normal(size=shape)
        state = unipc.init_state(jnp.asarray(x_ref, jnp.float64),
                                 dtype=jnp.float64)
        x_ora = x_ref.copy()

        for i in range(steps):
            t = int(oracle.timesteps[i])
            eps = model(x_ora, t)
            x_ora, _ = oracle.step(eps, t, x_ora)
            state = unipc.step(tables, state,
                               jnp.asarray(eps, jnp.float64), i)

            ours = np.asarray(state.sample, np.float64)
            err = np.max(np.abs(ours - x_ora))
            assert err <= 1e-10, \
                f"step {i}: max|ours - diffusers| = {err:.3e}"


@pytest.mark.parametrize("steps", [30, 50])
def test_unipc_f32_production_path_tracks_oracle(schedule, steps):
    """The production float32 jitted step against the float64 oracle,
    teacher-forced: bounds the f32 coefficient/carry rounding at 3e-5
    per step (the x0 conversion at t~999 amplifies rounding by
    1/alpha ~ 15x; exact-math parity is the enable_x64 test above)."""
    shape = (2, 8, 8, 4)
    model = make_fake_model(shape)
    oracle = DiffusersUniPCOracle(**SD)
    oracle.set_timesteps(steps)
    unipc = UniPC(schedule=schedule, num_inference_steps=steps)
    tables = unipc.tables()
    x_ref = np.random.default_rng(1).normal(size=shape)
    state = unipc.init_state(jnp.asarray(x_ref, jnp.float32))
    x_ora = x_ref.copy()
    step_jit = jax.jit(unipc.step)
    for i in range(steps):
        t = int(oracle.timesteps[i])
        eps = model(x_ora, t)
        x_ora, _ = oracle.step(eps, t, x_ora)
        state = step_jit(tables, state, jnp.asarray(eps, jnp.float32), i)
        err = np.max(np.abs(np.asarray(state.sample, np.float64) - x_ora))
        assert err <= 3e-5, f"step {i}: f32 drift {err:.3e}"


def test_unipc_closed_loop_tracks_oracle(schedule):
    """Closed loop (each sampler feeds its own state to the model): bounds
    the float32-vs-float64 feedback accumulation.  The x0 conversion at
    t~999 multiplies eps rounding by 1/alpha ~ 15x, so f32 drift reaches
    ~1e-5 over 30 steps even with bit-identical update math — asserted
    at 5e-5 as the regression envelope."""
    steps = 30
    shape = (2, 8, 8, 4)
    model = make_fake_model(shape)
    oracle = DiffusersUniPCOracle(**SD)
    oracle.set_timesteps(steps)
    unipc = UniPC(schedule=schedule, num_inference_steps=steps)
    tables = unipc.tables()

    x_ref = np.random.default_rng(1).normal(size=shape)
    state = unipc.init_state(jnp.asarray(x_ref, jnp.float32))
    x_ora = x_ref.copy()
    step_jit = jax.jit(unipc.step)
    for i in range(steps):
        t = int(oracle.timesteps[i])
        x_ora, _ = oracle.step(model(x_ora, t), t, x_ora)
        eps_ours = model(np.asarray(state.sample, np.float64), t)
        state = step_jit(tables, state, jnp.asarray(eps_ours, jnp.float32), i)
        err = np.max(np.abs(np.asarray(state.sample, np.float64) - x_ora))
        assert err <= 5e-5, f"step {i}: closed-loop drift {err:.3e}"


def test_unipc_corrected_sample_matches_oracle():
    """The corrector output (our `last_sample` carry) must equal the
    oracle's corrected sample too — it feeds the next predictor.
    float64 exact-math comparison (enable_x64)."""
    enable_x64 = jax.enable_x64

    steps = 30
    shape = (1, 4, 4, 4)
    model = make_fake_model(shape, seed=3)
    oracle = DiffusersUniPCOracle(**SD)
    oracle.set_timesteps(steps)
    with enable_x64():
        schedule64 = NoiseSchedule.create(SchedulerConfig(**SD),
                                          dtype=jnp.float64)
        unipc = UniPC(schedule=schedule64, num_inference_steps=steps)
        tables = unipc.tables(dtype=jnp.float64)

        x0 = np.random.default_rng(2).normal(size=shape)
        state = unipc.init_state(jnp.asarray(x0, jnp.float64),
                                 dtype=jnp.float64)
        x_ora = x0.copy()
        for i in range(steps):
            t = int(oracle.timesteps[i])
            eps = model(x_ora, t)
            x_ora, corrected = oracle.step(eps, t, x_ora)
            state = unipc.step(tables, state,
                               jnp.asarray(eps, jnp.float64), i)
            err = np.max(np.abs(np.asarray(state.last_sample, np.float64)
                                - corrected))
            assert err <= 1e-10, f"step {i}: corrector mismatch {err:.3e}"


def test_unipc_order1_no_corrector_warmup_first_step(schedule):
    """Step 0 has no corrector and order 1; verify our step 0 alone equals
    the oracle's (isolates the warmup logic from accumulation)."""
    steps = 30
    shape = (1, 4, 4, 4)
    oracle = DiffusersUniPCOracle(**SD)
    oracle.set_timesteps(steps)
    unipc = UniPC(schedule=schedule, num_inference_steps=steps)
    tables = unipc.tables()
    x0 = np.random.default_rng(4).normal(size=shape)
    eps = np.random.default_rng(5).normal(size=shape)
    t = int(oracle.timesteps[0])
    ref, _ = oracle.step(eps, t, x0.copy())
    state = unipc.step(tables, unipc.init_state(jnp.asarray(x0, jnp.float32)),
                       jnp.asarray(eps, jnp.float32), 0)
    np.testing.assert_allclose(np.asarray(state.sample), ref, atol=1e-5)


def test_unipc_final_step_lower_order(schedule):
    """lower_order_final drops the last predictor to order 1 and lands on
    x0 exactly (zero final sigma): p_cx[N-1]=0, p_cm0[N-1]=1."""
    for steps in (30, 50):
        unipc = UniPC(schedule=NoiseSchedule.create(SchedulerConfig(**SD)),
                      num_inference_steps=steps)
        tables = unipc.tables()
        assert float(tables.p_cx[steps - 1]) == 0.0
        assert float(tables.p_cm0[steps - 1]) == 1.0
        assert float(tables.p_cd1[steps - 1]) == 0.0


def test_timestep_grid_matches_oracle_exact():
    for steps in (5, 30, 40, 50):
        oracle = DiffusersUniPCOracle(**SD)
        oracle.set_timesteps(steps)
        np.testing.assert_array_equal(
            unipc_timesteps(1000, steps), oracle.timesteps)


def test_ddpm_add_noise_matches_diffusers_formula(schedule):
    """diffusers DDPMScheduler.add_noise: sqrt(abar_t) x0 +
    sqrt(1-abar_t) eps, gathered per-sample (reference train step,
    train_controlnet.py:1085-1095)."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 6, 6, 3))
    eps = rng.normal(size=(4, 6, 6, 3))
    ts = np.asarray([0, 17, 500, 999])
    betas = (np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2)
    abar = np.cumprod(1.0 - betas)
    want = (np.sqrt(abar[ts])[:, None, None, None] * x0
            + np.sqrt(1.0 - abar[ts])[:, None, None, None] * eps)
    got = schedule.add_noise(jnp.asarray(x0, jnp.float32),
                             jnp.asarray(eps, jnp.float32),
                             jnp.asarray(ts))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
