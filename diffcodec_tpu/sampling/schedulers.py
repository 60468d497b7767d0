"""Diffusion noise schedules and samplers: DDPM (training) and UniPC
(inference), jit-friendly (static shapes, no data-dependent Python control
flow).

Parity targets:
  * DDPMScheduler.add_noise as used at `train_controlnet.py:1085-1095`
    (scaled_linear betas 0.00085..0.012, 1000 steps, epsilon prediction).
  * UniPCMultistepScheduler as used by the pipeline
    (`pipeline.py:263-266, 375`) — diffusers defaults: data-prediction,
    bh2 variant, solver_order 2, lower_order_final, corrector enabled,
    'linspace' timestep grid.
  * x0 reconstruction (`controlnet/utils.py:54-90`).
  * the residual DDPM's squaredcos_cap_v2 schedule (`residual_train.py:45-53`).

TPU-first design: the UniPC timestep grid is static, so every per-step
scalar (alpha/sigma ratios, expm1 terms, predictor/corrector weights) is
precomputed on the host in float64 and baked into [N]-shaped tables; the
jitted loop body is a handful of gathers and fused multiply-adds.  The
multistep history is a fixed two-slot carry, so the whole denoise loop is a
single `lax.fori_loop` program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffcodec_tpu.config import SchedulerConfig


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, T,
                           dtype=np.float64) ** 2
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = [min(1 - alpha_bar((i + 1) / T) / alpha_bar(i / T), 0.999)
                 for i in range(T)]
        return np.asarray(betas, dtype=np.float64)
    raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed alphas_cumprod table shared by all samplers."""
    cfg: SchedulerConfig
    alphas_cumprod: jnp.ndarray  # [T] float32

    @classmethod
    def create(cls, cfg: SchedulerConfig = SchedulerConfig(),
               dtype=jnp.float32):
        # dtype=float64 (under jax.experimental.enable_x64) exists for the
        # diffusers-oracle parity tests; production is always float32.
        betas = make_betas(cfg)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(cfg=cfg,
                   alphas_cumprod=jnp.asarray(alphas_cumprod, dtype))

    def _coeffs(self, timesteps, ndim):
        abar = self.alphas_cumprod[timesteps]
        if abar.dtype not in (jnp.float32, jnp.float64):
            abar = abar.astype(jnp.float32)
        shape = (-1,) + (1,) * (ndim - 1)
        return (jnp.sqrt(abar).reshape(shape),
                jnp.sqrt(1.0 - abar).reshape(shape))

    # ---- DDPM training API -------------------------------------------------
    def add_noise(self, sample, noise, timesteps):
        """q(x_t | x_0): sqrt(abar_t) x0 + sqrt(1-abar_t) eps (fp32)."""
        sa, so = self._coeffs(timesteps, sample.ndim)
        return sa * sample.astype(jnp.float32) + so * noise.astype(jnp.float32)

    def velocity(self, sample, noise, timesteps):
        """v-prediction target: sqrt(abar) eps - sqrt(1-abar) x0."""
        sa, so = self._coeffs(timesteps, sample.ndim)
        return sa * noise.astype(jnp.float32) - so * sample.astype(jnp.float32)

    def pred_original_sample(self, sample, model_output, timesteps):
        """x̂0 from (x_t, model output, t) — `controlnet/utils.py:54-90`."""
        sa, so = self._coeffs(timesteps, sample.ndim)
        ct = jnp.result_type(jnp.float32, sample.dtype)
        sample = sample.astype(ct)
        model_output = model_output.astype(ct)
        if self.cfg.prediction_type == "epsilon":
            return (sample - so * model_output) / sa
        if self.cfg.prediction_type == "v_prediction":
            return sa * sample - so * model_output
        raise ValueError(self.cfg.prediction_type)


# ---------------------------------------------------------------------------
# DDPM ancestral sampler (for the residual pixel DDPM, residual_train.py)
# ---------------------------------------------------------------------------

def ddpm_step(schedule: NoiseSchedule, model_output, timestep, prev_timestep,
              sample, noise, clip_sample: bool = True):
    """One ancestral DDPM step x_t -> x_{t-1} (epsilon parameterization).

    `timestep`/`prev_timestep` are python ints or traced int32 scalars;
    prev_timestep < 0 denotes the final step (no noise added).
    """
    timestep = jnp.asarray(timestep)
    prev_timestep = jnp.asarray(prev_timestep)
    abar_t = schedule.alphas_cumprod[timestep]
    abar_prev = jnp.where(prev_timestep >= 0,
                          schedule.alphas_cumprod[jnp.maximum(prev_timestep,
                                                              0)], 1.0)
    alpha_t = abar_t / abar_prev
    beta_t = 1.0 - alpha_t
    x0 = schedule.pred_original_sample(
        sample, model_output,
        jnp.broadcast_to(timestep, (sample.shape[0],)))
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    coef_x0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
    mean = coef_x0 * x0 + coef_xt * sample.astype(jnp.float32)
    var = beta_t * (1.0 - abar_prev) / (1.0 - abar_t)
    sigma = jnp.sqrt(jnp.clip(var, 1e-20, None))
    return jnp.where(prev_timestep >= 0, mean + sigma * noise, mean)


# ---------------------------------------------------------------------------
# UniPC multistep sampler (solver order 2, bh2, data prediction)
# ---------------------------------------------------------------------------

def unipc_timesteps(num_train_timesteps: int,
                    num_inference_steps: int) -> np.ndarray:
    """diffusers 'linspace' timestep grid, descending [N]."""
    steps = np.linspace(0, num_train_timesteps - 1,
                        num_inference_steps + 1).round()[::-1][:-1]
    return steps.astype(np.int64)


class UniPCTables(NamedTuple):
    """Per-step coefficient tables, all shape [N] float32 (host-precomputed
    in float64).  Index i is the step taking x(t_i) -> x(t_{i+1})."""
    timesteps: jnp.ndarray   # [N] int32 grid (descending)
    # predictor x(t_i) -> x(t_{i+1})
    p_cx: jnp.ndarray        # sigma_{i+1}/sigma_i
    p_cm0: jnp.ndarray       # -alpha_{i+1} * expm1(-h_i)
    p_cd1: jnp.ndarray       # -alpha_{i+1} * B(h_i) * rho_p (0 if order 1)
    p_invr: jnp.ndarray      # 1 / r_i  (r = (lam_{i-1}-lam_i)/h_i)
    # corrector of x(t_i) recomputed from x(t_{i-1})
    c_on: jnp.ndarray        # 1.0 if corrector applies at step i else 0.0
    c_cx: jnp.ndarray        # sigma_i/sigma_{i-1}
    c_cm0: jnp.ndarray       # -alpha_i * expm1(-h_{i-1})
    c_cd1t: jnp.ndarray      # -alpha_i * B(h_{i-1}) * rho_t
    c_cd1h: jnp.ndarray      # -alpha_i * B(h_{i-1}) * rho_hist (0 if order<2)
    c_invr: jnp.ndarray      # 1 / r for the history term of the corrector


class UniPCState(NamedTuple):
    sample: jnp.ndarray      # x at t_i (uncorrected prediction)
    last_sample: jnp.ndarray  # x at t_{i-1} (post-corrector)
    m_prev: jnp.ndarray      # x0 prediction at t_{i-1}
    m_prev2: jnp.ndarray     # x0 prediction at t_{i-2}


@dataclasses.dataclass(frozen=True)
class UniPC:
    """UniPC sampler matching diffusers `UniPCMultistepScheduler` defaults
    (solver_order=2, solver_type='bh2', predict_x0=True, lower_order_final,
    corrector enabled).

    Usage inside a jitted loop:
        tables = unipc.tables()
        state  = unipc.init_state(latents)
        for i (fori_loop): eps = model(state.sample, tables.timesteps[i]);
                           state = unipc.step(tables, state, eps, i)
        final latents = state.sample
    """
    schedule: NoiseSchedule
    num_inference_steps: int

    def tables(self, dtype=jnp.float32) -> UniPCTables:
        N = self.num_inference_steps
        ts = unipc_timesteps(self.schedule.cfg.num_train_timesteps, N)
        abar = np.asarray(self.schedule.alphas_cumprod, np.float64)
        alpha = np.sqrt(abar[ts])
        sigma = np.sqrt(1.0 - abar[ts])
        lam = np.log(alpha) - np.log(sigma)
        # index N == final state (t=-1): alpha=1, sigma=0

        p_cx = np.zeros(N)
        p_cm0 = np.zeros(N)
        p_cd1 = np.zeros(N)
        p_invr = np.zeros(N)
        c_on = np.zeros(N)
        c_cx = np.zeros(N)
        c_cm0 = np.zeros(N)
        c_cd1t = np.zeros(N)
        c_cd1h = np.zeros(N)
        c_invr = np.zeros(N)

        def step_h(i):
            """h for the step t_i -> t_{i+1} (inf at the final step)."""
            if i + 1 < N:
                return lam[i + 1] - lam[i]
            return np.inf

        # effective predictor order at step i (diffusers:
        # this_order = min(solver_order, N - i, lower_order_nums + 1))
        p_order = [min(2, N - i, i + 1) for i in range(N)]

        for i in range(N):
            h = step_h(i)
            if i + 1 < N:
                a_next, s_next = alpha[i + 1], sigma[i + 1]
                p_cx[i] = s_next / sigma[i]
                p_cm0[i] = -a_next * np.expm1(-h)
            else:
                p_cx[i] = 0.0   # sigma_final = 0
                p_cm0[i] = 1.0  # -1 * expm1(-inf) = 1; x -> x0
            if p_order[i] >= 2 and np.isfinite(h):
                B_h = np.expm1(-h)
                r = (lam[i - 1] - lam[i]) / h
                p_invr[i] = 1.0 / r
                # bh2 order-2 predictor weight rho = 0.5
                p_cd1[i] = -alpha[i + 1] * B_h * 0.5

            if i >= 1:
                # corrector of x(t_i) built on the step t_{i-1} -> t_i
                hc = lam[i] - lam[i - 1]
                B_h = np.expm1(-hc)
                c_on[i] = 1.0
                c_cx[i] = sigma[i] / sigma[i - 1]
                c_cm0[i] = -alpha[i] * np.expm1(-hc)
                order_c = p_order[i - 1]  # diffusers uses last step's order
                if order_c >= 2:
                    r = (lam[i - 2] - lam[i - 1]) / hc
                    c_invr[i] = 1.0 / r
                    hh = -hc
                    h_phi_1 = np.expm1(hh)
                    h_phi_2 = h_phi_1 / hh - 1.0
                    h_phi_3 = h_phi_2 / hh - 0.5
                    b1 = h_phi_2 / B_h           # phi_{k+1} k!/B_h, k=1
                    b2 = 2.0 * h_phi_3 / B_h     # k=2
                    # solve [[1,1],[r,1]] @ [rho_h, rho_t] = [b1, b2]
                    rho_h = (b2 - b1) / (r - 1.0)
                    rho_t = b1 - rho_h
                else:
                    rho_h, rho_t = 0.0, 0.5
                c_cd1t[i] = -alpha[i] * B_h * rho_t
                c_cd1h[i] = -alpha[i] * B_h * rho_h

        # dtype=float64 (under jax.experimental.enable_x64) is used by the
        # diffusers-oracle parity test to separate update-math agreement
        # from float32 carry rounding; production always uses float32.
        cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
        return UniPCTables(
            timesteps=jnp.asarray(ts, jnp.int32),
            p_cx=cast(p_cx), p_cm0=cast(p_cm0), p_cd1=cast(p_cd1),
            p_invr=cast(p_invr), c_on=cast(c_on), c_cx=cast(c_cx),
            c_cm0=cast(c_cm0), c_cd1t=cast(c_cd1t), c_cd1h=cast(c_cd1h),
            c_invr=cast(c_invr))

    def init_state(self, latents: jnp.ndarray,
                   dtype=jnp.float32) -> UniPCState:
        z = jnp.zeros_like(latents, dtype=dtype)
        return UniPCState(sample=latents.astype(dtype), last_sample=z,
                          m_prev=z, m_prev2=z)

    def convert_to_x0(self, sample, model_output, t):
        B = sample.shape[0]
        return self.schedule.pred_original_sample(
            sample, model_output, jnp.broadcast_to(t, (B,)).astype(jnp.int32))

    def step(self, tables: UniPCTables, state: UniPCState,
             model_output: jnp.ndarray, i) -> UniPCState:
        """One UniPC step: corrector on x(t_i), then predictor to t_{i+1}.

        `i` may be traced (fori_loop index).  `model_output` is the raw
        network output at (state.sample, t_i).
        """
        t = tables.timesteps[i]
        m_t = self.convert_to_x0(state.sample, model_output, t)

        # ---- corrector: recompute x(t_i) from last_sample ----
        d1_t = m_t - state.m_prev
        d1_h = (state.m_prev2 - state.m_prev) * tables.c_invr[i]
        x_corr = (tables.c_cx[i] * state.last_sample
                  + tables.c_cm0[i] * state.m_prev
                  + tables.c_cd1t[i] * d1_t
                  + tables.c_cd1h[i] * d1_h)
        x = jnp.where(tables.c_on[i] > 0, x_corr, state.sample)

        # ---- predictor: x(t_i) -> x(t_{i+1}) ----
        d1 = (state.m_prev - m_t) * tables.p_invr[i]
        x_next = (tables.p_cx[i] * x
                  + tables.p_cm0[i] * m_t
                  + tables.p_cd1[i] * d1)
        return UniPCState(sample=x_next, last_sample=x, m_prev=m_t,
                          m_prev2=state.m_prev)


def cfg_combine(noise_uncond, noise_text, guidance_scale):
    """Classifier-free guidance combine (`pipeline.py:370-372`)."""
    return noise_uncond + guidance_scale * (noise_text - noise_uncond)


def controlnet_keep_schedule(num_steps: int, start: float, end: float):
    """Per-step keep flags (`pipeline.py:292-295`)."""
    keeps = []
    for i in range(num_steps):
        keeps.append(1.0 - float(i / num_steps < start or
                                 (i + 1) / num_steps > end))
    return np.asarray(keeps, np.float32)
