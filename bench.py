"""Benchmark: decoded inter-frames per second on one TPU chip.

Runs the flagship decode path — SD-1.5-scale DualFlowControlNet + UNet,
512x512 conditioning, 30-step UniPC with CFG, VAE decode — and reports
steady-state frames/sec.

Baseline: the reference PyTorch GPU pipeline has no published throughput
(SURVEY.md section 6); BASELINE.json's north star is >=10x the PyTorch
pipeline.  We use 0.25 frames/sec as the PyTorch single-A100 estimate for
this operating point (30 UniPC steps x CFG x (ControlNet+UNet) at 512px,
extractor recomputed per step as the reference does), so
vs_baseline = fps / 0.25.  Derivation: 69.0 TFLOPs/frame measured via XLA
cost analysis (scripts/flops_report.py) at an assumed 5.5% effective A100
MFU -- see BASELINE.md "Throughput baseline derivation" for the full
arithmetic and the 0.25-0.40 fps plausibility band.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

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


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    # default batch = the 7 inter frames of a GOP-8 (the decoder's real
    # unit of work; inter frames are conditionally independent given the
    # anchors and decode as one batch)
    B = int(os.environ.get("BENCH_BATCH", "7"))
    H = 128 if small else 512
    steps = 5 if small else 30
    dtype = jnp.bfloat16

    unet_cfg = UNetConfig() if not small else UNetConfig.tiny()
    cn_cfg = ControlNetConfig(unet=unet_cfg) if not small else \
        ControlNetConfig.tiny()
    vae_cfg = VAEConfig()
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    controlnet = DualFlowControlNet(cn_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    schedule = NoiseSchedule.create(SchedulerConfig())
    # opt-in approximate modes (quality-affecting; default exact):
    # BENCH_CN_INTERVAL=k caches ControlNet residuals for k-1 steps,
    # BENCH_ENC_INTERVAL=k caches the UNet down path for k-1 steps.
    cn_interval = int(os.environ.get("BENCH_CN_INTERVAL", "1"))
    enc_interval = int(os.environ.get("BENCH_ENC_INTERVAL", "1"))
    pipe = DualFlowPipeline(
        unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
        sampler=SamplerConfig(num_inference_steps=steps, guidance_scale=3.5,
                              controlnet_conditioning_scale=1.35,
                              controlnet_interval=cn_interval,
                              unet_encoder_interval=enc_interval,
                              freeu=True))

    h = H // 8
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    L, D = 77, unet_cfg.cross_attention_dim
    sample = jnp.zeros((B, h, h, 4), dtype)
    t0 = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, L, D), dtype)
    cond = jnp.zeros((B, H, H, 6), dtype)
    flow = jnp.zeros((B, H, H, 4), dtype)
    params = {
        "controlnet": controlnet.init(k1, sample, t0, ctx, cond, flow),
        "unet": unet.init(k2, sample, t0, ctx),
        "vae": vae.init(k3, jnp.zeros((1, 64, 64, 3), dtype)),
    }
    # frozen weights live on device in the compute dtype (the reference
    # casts the frozen stack to weight_dtype, train_controlnet.py:984-993);
    # keeps 2.5 GB of HBM free for multi-GOP batches
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    text = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), dtype) * 0.02
    uncond = jnp.zeros((B, L, D), dtype)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (B, H, H, 6),
                              dtype=jnp.float32).astype(dtype)
    flow = (jax.random.normal(jax.random.PRNGKey(3), (B, H, H, 4)) *
            4.0).astype(dtype)

    sample_fn = jax.jit(pipe.sample)
    t_start = time.time()
    out = sample_fn(params, jax.random.PRNGKey(10), text, uncond, cond, flow)
    out.block_until_ready()
    compile_and_first = time.time() - t_start

    times = []
    for i in range(3):
        t1 = time.time()
        out = sample_fn(params, jax.random.PRNGKey(11 + i), text, uncond,
                        cond, flow)
        out.block_until_ready()
        times.append(time.time() - t1)
    best = min(times)
    fps = B / best
    name = ("decoded_frames_per_sec_512px_30step_unipc_cfg"
            if not small else "decoded_frames_per_sec_small")
    if cn_interval > 1:
        name += f"_cnint{cn_interval}"
    if enc_interval > 1:
        name += f"_encint{enc_interval}"
    print(json.dumps({
        "metric": name,
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    print(f"# first(compile+run)={compile_and_first:.1f}s "
          f"steady={best:.3f}s/batch batch={B} times={times}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
