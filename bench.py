"""Benchmark: decoded inter-frames per second on one TPU chip.

Runs the flagship decode path — SD-1.5-scale DualFlowControlNet + UNet,
512x512 conditioning, 30-step UniPC with CFG, VAE decode — and reports
steady-state frames/sec for the full operating-point matrix:

  * exact           — bit-exact reference semantics (every step recomputes
                      ControlNet and the UNet down path, matching
                      /root/reference/pipeline.py:341-350).  ALWAYS the
                      first line printed.
  * cnint2/cnint3   — opt-in ControlNet residual caching every k-th step
                      (SamplerConfig.controlnet_interval).
  * encint2         — opt-in UNet encoder propagation (Faster-Diffusion,
                      PAPERS.md; SamplerConfig.unet_encoder_interval).
  * cnint3_encint3  — both caches combined at interval 3.
  * 1080p tiled     — full-HD overlap-tiled decode (512px tiles/overlap 64,
                      patch_utils parity), exact and combined-cache modes.
  * distilled4step_mechanism — K-step consistency-student sampler
                      (train/distill.py, no CFG doubling); measures the
                      MECHANISM's throughput with untrained weights — a
                      quality operating point additionally requires a
                      distilled student checkpoint.

Approximation quality cost for the cached modes is quantified in
artifacts/approx_drift.json (scripts/approx_drift.py): exact-vs-cached
latent MSE / pixel PSNR at fixed seed.

Baseline: the reference PyTorch GPU pipeline has no published throughput
(SURVEY.md section 6); BASELINE.json's north star is >=10x the PyTorch
pipeline.  We use 0.25 frames/sec as the PyTorch single-A100 estimate for
this operating point (30 UniPC steps x CFG x (ControlNet+UNet) at 512px,
extractor recomputed per step as the reference does), so
vs_baseline = fps / 0.25.  Derivation: 69.0 TFLOPs/frame measured via XLA
cost analysis (scripts/flops_report.py) at an assumed 5.5% effective A100
MFU — see BASELINE.md "Throughput baseline derivation" for the full
arithmetic and the 0.25-0.40 fps plausibility band.

Output: one JSON line per operating point, exact mode first; the LAST
line is always a re-emit of the exact record (the driver parses the final
line as the headline — BENCH_r03 recorded the distilled mechanism point as
the headline because it happened to print last, over-crediting by 8x).

The bare run (as the driver invokes it) is sized to finish inside the
driver budget even on a cold compile cache: exact + exact_fusedconv +
distilled4 (~400-600 s of cold compiles; the full 8-point matrix measured
~1,250 s of compiles in r03 and timed out, rc=124).  Set BENCH_FULL=1 for
the full matrix: caching intervals, 2-GOP distilled, and the 1080p tiled
points.

Env knobs: BENCH_SMALL=1 (tiny wiring check), BENCH_BATCH=n (GOP batch),
BENCH_POINTS=exact,cnint3 (filter the matrix), BENCH_FULL=1 (full matrix
incl. 1080p), BENCH_1080=1/0 (force the tiled full-HD points on/off),
BENCH_DISTILL=0 (skip the distilled point), BENCH_BUDGET_S=n (wall-clock
budget, default 780 — sized under the observed ~900 s driver kill; when
a point's estimated cold compile no longer fits, the exact headline is
re-emitted and the process exits 0 instead of being killed mid-compile).
"""

import json
import os
import sys
import time

# Wall-clock budget guard (VERDICT r04 #1): the driver kills bench.py at
# ~900 s; two rounds of recorded headlines were degraded by rc=124.  The
# clock starts HERE (before the jax import — backend/tunnel init can cost
# minutes cold) and every compile is gated on a conservative estimate
# fitting the remaining budget.  When a point no longer fits, the exact
# summary line is emitted and we exit 0 so the recorded headline is the
# exact point.
T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "780"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, SamplerConfig,
                                  SchedulerConfig, UNetConfig, VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
from diffcodec_tpu.sampling.schedulers import NoiseSchedule

BASELINE_FPS = 0.25  # estimated reference PyTorch pipeline, see docstring

# (suffix, controlnet_interval, unet_encoder_interval, fused_conv);
# exact MUST be first.  fused_conv enables the halo-DMA SiLU+conv3x3
# Pallas kernel in the VAE's qualifying stages (ops/conv_pallas.py) —
# quality-neutral (bf16-rounding-level deltas, measured max|d|=0.03 on
# [-1,1] pixels) but not bit-identical to the XLA lowering, so the
# headline exact point keeps it off.
POINTS = [
    ("exact", 1, 1, False),
    ("exact_fusedconv", 1, 1, True),
]
# the cached-mode tail runs only under BENCH_FULL=1 (driver-budget guard)
FULL_POINTS = [
    ("cnint2", 2, 1, True),
    ("cnint3", 3, 1, True),
    ("encint2", 1, 2, True),
    ("cnint3_encint3", 3, 3, True),
]


def emit(name, fps, extra=None):
    rec = {"metric": name, "value": round(fps, 4),
           "unit": "frames/sec/chip",
           "vs_baseline": round(fps / BASELINE_FPS, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


# Observed cold-cache compile+first-run seconds per point on the driver
# (BENCH_r04 stderr: exact 632.5, exact_fusedconv 236.5; the rest from
# warm-cache runs scaled by the same cold/warm ratio).  Deliberately
# pessimistic — an over-estimate only skips an optional point, an
# under-estimate risks rc=124 and the round's headline.
COLD_FIRST_EST = {
    "exact": 680.0,
    "exact_fusedconv": 280.0,
    "cnint2": 280.0,
    "cnint3": 280.0,
    "encint2": 280.0,
    "cnint3_encint3": 280.0,
    "distilled": 600.0,  # measured truly-cold 2026-08-21: outlived a 900 s
                         # kill starting at t+310 (the r03-scaled 220 was a
                         # machine-warm figure)
    "tiled": 260.0,
}
_MEASURE_MARGIN_S = 30.0  # steady-state timing loop after the first call


def _remaining():
    return BUDGET_S - (time.time() - T0)


class BudgetGuard:
    """Gates each point's compile on the remaining wall-clock budget.

    After the first point completes we know whether the persistent
    compile cache was warm (first call tens of seconds) or cold
    (hundreds); subsequent estimates are scaled by that observed ratio,
    floored at 10% so a warm run never extrapolates to zero.

    The scale is the MAX ratio observed so far, not the last: with the
    pinned cache entries (.gitignore / scripts/pin_bench_cache.py) a run
    can be MIXED warm/cold, and a cache-hit point's tiny first-call time
    says nothing about the next point's coldness (rehearsed 2026-08-21:
    scaling from a 32 s fused cache hit under-estimated a >590 s truly
    cold distilled compile; the dead-man exact re-emit preserved the
    headline, but rc was 124).  Monotonic pessimism never hurts the
    all-warm case — the max of small ratios is still small.
    """

    def __init__(self):
        self.scale = 1.0  # assume cold until the first point lands
        self._seen = []

    def observe(self, est_key, first_seconds):
        est = COLD_FIRST_EST[est_key]
        self._seen.append(max(0.1, min(1.2, first_seconds / est)))
        self.scale = max(self._seen)

    def fits(self, est_key):
        need = COLD_FIRST_EST[est_key] * self.scale + _MEASURE_MARGIN_S
        return _remaining() > need


def build(small, dtype=jnp.bfloat16):
    unet_cfg = UNetConfig() if not small else UNetConfig.tiny()
    cn_cfg = (ControlNetConfig(unet=unet_cfg) if not small
              else ControlNetConfig.tiny())
    vae_cfg = VAEConfig()
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    controlnet = DualFlowControlNet(cn_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    schedule = NoiseSchedule.create(SchedulerConfig())
    return unet_cfg, unet, controlnet, vae, schedule


def init_params(unet_cfg, unet, controlnet, vae, H, dtype):
    h = H // 8
    L, D = 77, unet_cfg.cross_attention_dim

    def make():
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        sample = jnp.zeros((1, h, h, 4), dtype)
        t0 = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, L, D), dtype)
        params = {
            "controlnet": controlnet.init(k1, sample, t0, ctx,
                                          jnp.zeros((1, H, H, 6), dtype),
                                          jnp.zeros((1, H, H, 4), dtype)),
            "unet": unet.init(k2, sample, t0, ctx),
            "vae": vae.init(k3, jnp.zeros((1, 64, 64, 3), dtype)),
        }
        # frozen weights live on device in the compute dtype (the reference
        # casts the frozen stack to weight_dtype,
        # train_controlnet.py:984-993); keeps 2.5 GB of HBM free for
        # multi-GOP batches
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            params)

    # Throughput depends on shapes, not values, so the real init program
    # (113 s cold compile; ~1,200 eager tunnel round-trips if not jitted)
    # is replaced by eval_shape + ONE trivial RNG-free fill program:
    # varied small values from an iota in every float leaf (per-leaf
    # threefry normals measured another 138 s of cold compile).
    leaves, treedef = jax.tree.flatten(jax.eval_shape(make))

    def fill():
        outs = []
        for i, leaf in enumerate(leaves):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                v = jnp.arange(leaf.size, dtype=jnp.float32)
                v = ((v + 17.0 * i) % 251.0) * 1e-4 - 0.0125
                outs.append(v.reshape(leaf.shape).astype(leaf.dtype))
            else:
                outs.append(jnp.zeros(leaf.shape, leaf.dtype))
        return jax.tree.unflatten(treedef, outs)

    return jax.jit(fill)()


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    # default batch = the 7 inter frames of a GOP-8 (the decoder's real
    # unit of work; inter frames are conditionally independent given the
    # anchors and decode as one batch)
    B = int(os.environ.get("BENCH_BATCH", "7"))
    H = 128 if small else 512
    steps = 5 if small else 30
    dtype = jnp.bfloat16
    full = os.environ.get("BENCH_FULL") == "1"
    matrix = POINTS + FULL_POINTS if full else list(POINTS)
    want = os.environ.get("BENCH_POINTS")
    points = matrix if not want else [
        p for p in POINTS + FULL_POINTS if p[0] in want.split(",")]
    # legacy single-point knobs (round-2 CLI compat)
    if "BENCH_CN_INTERVAL" in os.environ or "BENCH_ENC_INTERVAL" in os.environ:
        ci = int(os.environ.get("BENCH_CN_INTERVAL", "1"))
        ei = int(os.environ.get("BENCH_ENC_INTERVAL", "1"))
        points = [(f"cnint{ci}_encint{ei}" if (ci > 1 or ei > 1) else "exact",
                   ci, ei, False)]

    print(f"# t+{time.time() - T0:.0f}s: imports done, building models",
          file=sys.stderr, flush=True)
    unet_cfg, unet, controlnet, vae, schedule = build(small, dtype)
    params = init_params(unet_cfg, unet, controlnet, vae, H, dtype)
    jax.block_until_ready(params)
    print(f"# t+{time.time() - T0:.0f}s: params initialized",
          file=sys.stderr, flush=True)

    L, D = 77, unet_cfg.cross_attention_dim
    text = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), dtype) * 0.02
    uncond = jnp.zeros((B, L, D), dtype)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (B, H, H, 6),
                              dtype=jnp.float32).astype(dtype)
    flow = (jax.random.normal(jax.random.PRNGKey(3), (B, H, H, 4)) *
            4.0).astype(dtype)

    base = ("decoded_frames_per_sec_512px_30step_unipc_cfg"
            if not small else "decoded_frames_per_sec_small")
    pipes = {}
    exact_record = None
    guard = BudgetGuard()

    def emit_exact_summary():
        # The driver parses the FINAL JSON line as the round's headline,
        # which must be the exact point.  Called (a) before every
        # post-exact compile — a dead-man switch so a driver kill
        # mid-compile still leaves the exact record as the last line —
        # and (b) at every exit path.
        if exact_record is not None:
            emit(exact_record[0], exact_record[1])

    def bail(reason):
        print(f"# budget guard: {reason} (elapsed={time.time() - T0:.0f}s "
              f"of {BUDGET_S:.0f}s) — emitting exact headline and exiting",
              file=sys.stderr)
        emit_exact_summary()
        sys.exit(0)

    for suffix, ci, ei, fused in points:
        if exact_record is not None:
            if not guard.fits(suffix if suffix in COLD_FIRST_EST
                              else "exact_fusedconv"):
                bail(f"{suffix} does not fit")
            emit_exact_summary()
        # read at trace time by ops/conv_pallas.silu_conv3x3; each point
        # jits its own pipeline object, so the setting binds per point
        os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1" if fused else "0"
        pipe = DualFlowPipeline(
            unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
            sampler=SamplerConfig(num_inference_steps=steps,
                                  guidance_scale=3.5,
                                  controlnet_conditioning_scale=1.35,
                                  controlnet_interval=ci,
                                  unet_encoder_interval=ei,
                                  freeu=True))
        pipes[suffix] = pipe
        sample_fn = pipe.jit_sample()
        t_start = time.time()
        out = sample_fn(params, jax.random.PRNGKey(10), text, uncond, cond,
                        flow)
        out.block_until_ready()
        compile_and_first = time.time() - t_start
        times = []
        for i in range(3 if suffix == "exact" else 2):
            t1 = time.time()
            out = sample_fn(params, jax.random.PRNGKey(11 + i), text, uncond,
                            cond, flow)
            out.block_until_ready()
            times.append(time.time() - t1)
        best = min(times)
        fps = B / best
        name = base if suffix == "exact" else f"{base}_{suffix}"
        emit(name, fps)
        if suffix == "exact":
            exact_record = (name, fps)
        guard.observe(suffix if suffix in COLD_FIRST_EST
                      else "exact_fusedconv", compile_and_first)
        print(f"# {suffix}: first(compile+run)={compile_and_first:.1f}s "
              f"steady={best:.3f}s/batch batch={B} times={times}",
              file=sys.stderr)

    dpipe = None
    if os.environ.get("BENCH_DISTILL", "1") == "1" and not guard.fits(
            "distilled"):
        bail("distilled point does not fit")
    if os.environ.get("BENCH_DISTILL", "1") == "1":
        emit_exact_summary()
        # K-step consistency-student decode (train/distill.py).  Labelled
        # "mechanism": with an untrained student this measures the speed of
        # the K-step no-CFG sampler, not a validated quality point — the
        # student must first be distilled (scripts/train_distill.py).
        # BENCH_DISTILL=0 skips it.
        from diffcodec_tpu.config import DistillConfig
        from diffcodec_tpu.sampling.distilled import DistilledPipeline
        K = int(os.environ.get("BENCH_DISTILL_STEPS", "4"))
        os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
        dpipe = DistilledPipeline(
            unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
            config=DistillConfig(num_student_steps=K))
        dfn = dpipe.jit_sample()
        t0 = time.time()
        dfn(params, jax.random.PRNGKey(20), text, cond,
            flow).block_until_ready()
        first = time.time() - t0
        guard.observe("distilled", first)
        times = []
        for i in range(2):
            t0 = time.time()
            dfn(params, jax.random.PRNGKey(21 + i), text, cond,
                flow).block_until_ready()
            times.append(time.time() - t0)
        emit(f"decoded_frames_per_sec_512px_distilled{K}step_mechanism"
             if not small else f"{base}_distilled{K}step_mechanism",
             B / min(times))
        print(f"# distilled{K}step: first={first:.1f}s "
              f"steady={min(times):.3f}s/batch batch={B}", file=sys.stderr)
        if full and not small and B == 7 and guard.fits("distilled"):
            # two GOPs in flight: the fused VAE decode (149 ms vs 320 at
            # batch 7) freed enough HBM for batch 14, which amortizes the
            # K-step loop's small-batch floors (+21% measured).  The exact
            # CFG pipe does NOT benefit (16.9 s/batch at CFG 28 —
            # measured, stays at one GOP).
            b2 = 2 * B
            text2 = jnp.concatenate([text, text], 0)
            cond2 = jnp.concatenate([cond, cond], 0)
            flow2 = jnp.concatenate([flow, flow], 0)
            dfn(params, jax.random.PRNGKey(30), text2, cond2,
                flow2).block_until_ready()
            times = []
            for i in range(2):
                t0 = time.time()
                dfn(params, jax.random.PRNGKey(31 + i), text2, cond2,
                    flow2).block_until_ready()
                times.append(time.time() - t0)
            emit(f"decoded_frames_per_sec_512px_distilled{K}step_"
                 f"twogop_mechanism", b2 / min(times))
            print(f"# distilled{K}step 2-GOP: steady={min(times):.3f}"
                  f"s/batch batch={b2}", file=sys.stderr)

    run_1080 = os.environ.get("BENCH_1080", "1" if full else "0") == "1"
    if small or not run_1080:
        emit_exact_summary()
        return
    # full-HD tiled operating points (patch_utils parity path): one 1080p
    # frame = 15 overlapping 512px tiles in 3 equal chunks of 5 (CFG batch
    # 10 stays inside the measured HBM envelope; the exact pipe falls off
    # a memory cliff at tile_batch 8 / CFG 16 — 85 s/chunk vs ~3.6 s).
    from diffcodec_tpu.sampling.tiled import sample_tiled
    H2, W2 = 1080, 1920
    rng = np.random.default_rng(0)
    # uint8 conditioning: raw 1-byte transfer, normalized on device (the
    # real decoder's conditioning is decoded anchor pixels = uint8 source)
    cond_hd = rng.integers(0, 256, (1, H2, W2, 6), dtype=np.uint8)
    flow_hd = np.zeros((1, H2, W2, 4), np.float32)
    text_hd = np.asarray(text[:1], np.float32)
    if dpipe is not None:
        pipes[f"distilled{K}step_mechanism"] = dpipe
    for suffix in ("exact_fusedconv", "cnint3_encint3",
                   *([f"distilled{K}step_mechanism"] if dpipe else [])):
        if suffix not in pipes:
            continue
        if not guard.fits("tiled"):
            bail(f"1080p {suffix} does not fit")
        emit_exact_summary()
        # sample_tiled re-jits via _jitted_sampler, so re-pin the fused
        # flag this point was built with before the tiled trace
        os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
        pipe = pipes[suffix]
        # CFG pipes: tile_batch 7 = CFG batch 14, the flagship pipe's
        # proven envelope (batch 16 falls off the HBM cliff).  The
        # distilled student has no CFG doubling and the fused VAE freed
        # the HBM, so all 15 tiles go in ONE launch (measured 3.29 vs
        # 5.13 s/frame at tile_batch 5).  BENCH_TILE_BATCH/_OVERLAP
        # override for sweeps (overlap 32 = 12 tiles, 20% less redundant
        # compute; 64 is the patch_exp.ipynb parity default).
        tb = (15 if suffix.startswith("distilled")
              else int(os.environ.get("BENCH_TILE_BATCH", "7")))
        ov = int(os.environ.get("BENCH_TILE_OVERLAP", "64"))
        t0 = time.time()
        sample_tiled(pipe, params, jax.random.PRNGKey(5), text_hd, text_hd,
                     cond_hd, flow_hd, tile=(512, 512), overlap=ov,
                     feather=min(64, ov), tile_batch=tb)
        first = time.time() - t0
        t0 = time.time()
        sample_tiled(pipe, params, jax.random.PRNGKey(6), text_hd, text_hd,
                     cond_hd, flow_hd, tile=(512, 512), overlap=ov,
                     feather=min(64, ov), tile_batch=tb)
        dt = time.time() - t0
        if suffix.startswith("distilled"):
            name = f"decoded_frames_per_sec_1080p_tiled_{suffix}"
        else:
            name = ("decoded_frames_per_sec_1080p_tiled_30step"
                    + ("" if suffix == "exact" else f"_{suffix}"))
        emit(name, 1.0 / dt, extra={"seconds_per_frame": round(dt, 2)})
        print(f"# 1080p {suffix}: first(compile+run)={first:.1f}s "
              f"steady={dt:.1f}s/frame", file=sys.stderr)
    emit_exact_summary()


if __name__ == "__main__":
    main()
