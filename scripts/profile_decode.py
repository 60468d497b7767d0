"""Decode-path component profile on the real TPU (committed MFU evidence).

Times each component of the flagship decode at the bench operating point
(512px, CFG batch) with the op chained inside one jit (amortizes tunnel
dispatch), and derives MFU from the XLA-cost-analysis FLOPs of the same
lowered graphs (cf. scripts/flops_report.py).  Writes
artifacts/profile_decode.json.

Usage: python scripts/profile_decode.py [--batch 7] [--out artifacts/...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

V5E_BF16_PEAK = 197e12


def flops_of(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def chained_time(fn, out_to_in, *args, rep=8, n=3):
    """Average seconds per op with `rep` sequential applications in one jit.

    out_to_in(out, args) -> new args for the next application (keeps the
    chain data-dependent so XLA cannot elide iterations).
    """
    @jax.jit
    def f(*a):
        for _ in range(rep):
            out = fn(*a)
            a = out_to_in(out, a)
        return out

    s = float(jnp.sum(jnp.abs(f(*args))))  # compile + warm
    t0 = time.time()
    for _ in range(n):
        s = float(jnp.sum(jnp.abs(f(*args))))
    return (time.time() - t0) / n / rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--out", default="artifacts/profile_decode.json")
    args = ap.parse_args()

    from diffcodec_tpu.config import (ControlNetConfig, SchedulerConfig,
                                      UNetConfig, VAEConfig)
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule

    dtype = jnp.bfloat16
    B = args.batch          # frames per batch
    Bc = 2 * B              # CFG doubles every model call
    H = 512
    h = H // 8
    L, D = 77, 768

    unet_cfg = UNetConfig()
    cn_cfg = ControlNetConfig(unet=unet_cfg)
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    cn = DualFlowControlNet(cn_cfg, dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    NoiseSchedule.create(SchedulerConfig())

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    z = jnp.zeros
    sample = jax.random.normal(rng, (Bc, h, h, 4), dtype)
    t0 = jnp.full((Bc,), 500, jnp.int32)
    ctx = jax.random.normal(k1, (Bc, L, D), dtype) * 0.02
    cond = jax.random.uniform(k2, (B, H, H, 6), dtype=jnp.float32
                              ).astype(dtype)
    flow = (jax.random.normal(k3, (B, H, H, 4)) * 4.0).astype(dtype)

    p_cn = cn.init(k1, sample[:1], t0[:1], ctx[:1], cond[:1], flow[:1])
    p_unet = unet.init(k2, sample[:1], t0[:1], ctx[:1])
    p_vae = vae.init(k3, z((1, 64, 64, 3), dtype))

    # components -------------------------------------------------------
    def extractor_fn(c, f):
        return cn.apply(p_cn, method=cn.extract_pyramid,
                        controlnet_cond=c, flow_cond=f)[0]

    pyramid = cn.apply(p_cn, method=cn.extract_pyramid,
                       controlnet_cond=jnp.concatenate([cond, cond]),
                       flow_cond=jnp.concatenate([flow, flow]))

    def trunk_fn(s):
        down, mid = cn.apply(p_cn, s, t0, ctx, pyramid,
                             method=cn.backbone)
        return mid + 0 * down[0].mean()

    def unet_fn(s):
        down, mid = cn.apply(p_cn, s, t0, ctx, pyramid, method=cn.backbone)
        return unet.apply(p_unet, s, t0, ctx,
                          down_block_additional_residuals=down,
                          mid_block_additional_residual=mid)

    def unet_only_fn(s):
        return unet.apply(p_unet, s, t0, ctx)

    latents = sample[:B]

    def vae_fn(zz):
        return vae.apply(p_vae, zz, method=AutoencoderKL.decode)

    rows = {}

    def renorm(out, a):
        s = out.astype(jnp.float32)
        s = (s / (jnp.sqrt(jnp.mean(s * s)) + 1e-6)).astype(dtype)
        return (s.reshape(a[0].shape),) + a[1:]

    # extractor (runs once per frame batch — hoisted out of the loop)
    t_ext = chained_time(
        lambda c, f: extractor_fn(c, f),
        lambda out, a: (a[0] + 0 * out.mean().astype(dtype), a[1]),
        jnp.concatenate([cond, cond]), jnp.concatenate([flow, flow]),
        rep=4)
    f_ext = flops_of(extractor_fn, jnp.concatenate([cond, cond]),
                     jnp.concatenate([flow, flow]))
    rows["extractor_cfg_batch"] = (t_ext, f_ext)

    # controlnet trunk (per denoise step)
    t_trunk = chained_time(trunk_fn, renorm, sample)
    f_trunk = flops_of(trunk_fn, sample)
    rows["controlnet_trunk_step"] = (t_trunk, f_trunk)

    # unet alone and unet+trunk (per denoise step)
    t_unet = chained_time(unet_only_fn, renorm, sample)
    f_unet = flops_of(unet_only_fn, sample)
    rows["unet_step"] = (t_unet, f_unet)
    t_full = chained_time(unet_fn, renorm, sample)
    f_full = flops_of(unet_fn, sample)
    rows["trunk_plus_unet_step"] = (t_full, f_full)

    # vae decode (once per frame batch)
    t_vae = chained_time(
        vae_fn, lambda out, a: (a[0] + 0 * out.mean().astype(dtype),),
        latents, rep=4)
    f_vae = flops_of(vae_fn, latents)
    rows["vae_decode_batch"] = (t_vae, f_vae)

    steps = 30
    est_total = steps * t_full + t_ext + t_vae
    report = {
        "batch_frames": B,
        "cfg_batch": Bc,
        "per_component": {
            name: {
                "ms": round(t * 1e3, 2),
                "gflops": round(f / 1e9, 1),
                "tflops_per_s": round(f / t / 1e12, 1),
                "mfu_vs_v5e_bf16_peak": round(f / t / V5E_BF16_PEAK, 3),
            } for name, (t, f) in rows.items()
        },
        "estimated_batch_seconds_30steps": round(est_total, 3),
        "estimated_fps": round(B / est_total, 3),
        "note": "chained-op timing (dispatch amortized); flops from XLA "
                "cost analysis of the same lowered graphs",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(report, fo, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
