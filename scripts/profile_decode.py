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
    chain data-dependent so XLA cannot elide iterations).  The chain runs
    inside a `lax.fori_loop` — unrolling `rep` copies of an SD-scale
    network produces a program large enough to crash the remote compile
    helper, and the loop keeps compile time O(1) in `rep`.
    """
    @jax.jit
    def f(*a):
        out = jax.lax.fori_loop(
            0, rep, lambda i, c: tuple(out_to_in(fn(*c), c)), tuple(a))
        return out[-1]  # the fed-back data tensor (leading args = params)

    last = None
    for attempt in range(3):
        # the remote compile helper occasionally dies mid-compile on long
        # programs (transport broken pipe); a retry restarts the compile
        try:
            s = float(jnp.sum(jnp.abs(f(*args))))  # compile + warm
            break
        except Exception as e:  # jax.errors.JaxRuntimeError transport
            last = e
            if "remote_compile" not in str(e):
                raise
            print(f"compile transport error (attempt {attempt + 1}), "
                  f"retrying: {e}", file=sys.stderr, flush=True)
            time.sleep(20)
    else:
        raise last
    assert s == s, "NaN in chained output"
    t0 = time.time()
    for _ in range(n):
        s = float(jnp.sum(jnp.abs(f(*args))))
    return (time.time() - t0) / n / rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--out", default="artifacts/profile_decode.json")
    ap.add_argument("--only", default="",
                    help="comma list of components to (re)measure this "
                         "run: extractor,trunk,unet,full,vae.  Results "
                         "merge into --out so a crashed component does "
                         "not lose the others.")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

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

    # params must flow in as ARGUMENTS, never closures: closed-over param
    # trees are captured as inline constants at lowering time (3.4 GB of
    # MLIR for the SD UNet), which crashes the remote compile helper.
    # Cast to the compute dtype like bench.py does (frozen-stack parity
    # with train_controlnet.py:984-993).
    def bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            tree)

    p_cn = bf16(cn.init(k1, sample[:1], t0[:1], ctx[:1], cond[:1],
                        flow[:1]))
    p_unet = bf16(unet.init(k2, sample[:1], t0[:1], ctx[:1]))
    p_vae = bf16(vae.init(k3, z((1, 64, 64, 3), dtype)))

    # components -------------------------------------------------------
    def extractor_fn(p, c, f):
        # sum over EVERY pyramid level: returning one level lets XLA
        # dead-code-eliminate the other scales' splat paths (the round-2
        # 86 ms figure came from a variant of that trap; see
        # scripts/profile_extractor.py for the standalone op breakdown)
        outs = cn.apply(p, method=cn.extract_pyramid,
                        controlnet_cond=c, flow_cond=f)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    pyramid = jax.jit(lambda p, c, f: cn.apply(
        p, method=cn.extract_pyramid, controlnet_cond=c, flow_cond=f))(
            p_cn, jnp.concatenate([cond, cond]),
            jnp.concatenate([flow, flow]))

    def trunk_fn(p, pyr, s):
        down, mid = cn.apply(p, s, t0, ctx, pyr, method=cn.backbone)
        return mid + 0 * down[0].mean()

    def unet_fn(ps, pyr, s):
        down, mid = cn.apply(ps[0], s, t0, ctx, pyr, method=cn.backbone)
        return unet.apply(ps[1], s, t0, ctx,
                          down_block_additional_residuals=down,
                          mid_block_additional_residual=mid)

    def unet_only_fn(p, s):
        return unet.apply(p, s, t0, ctx)

    latents = sample[:B]

    def vae_fn(p, zz):
        return vae.apply(p, zz, method=AutoencoderKL.decode)

    rows = {}

    def renorm(out, a):
        # feed the output back into the next iteration's LAST input (the
        # data tensor; leading args are param pytrees) so XLA cannot
        # elide any chained application.  Same-shape outputs are
        # RMS-normalized to stop magnitude drift across the chain; for
        # other shapes, perturb the input by a tiny output-derived scalar
        # (NOT `0 * out` — the algebraic simplifier may fold that away
        # and skip the component entirely).
        x = a[-1]
        if out.shape == x.shape:
            s = out.astype(jnp.float32)
            s = (s / (jnp.sqrt(jnp.mean(s * s)) + 1e-6)).astype(x.dtype)
            return a[:-1] + (s,)
        s = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(x.dtype)
        return a[:-1] + (x + s,)

    # extractor (runs once per frame batch — hoisted out of the loop; the
    # pipeline extracts at frame batch B and duplicates for CFG after)
    if want("extractor"):
        t_ext = chained_time(extractor_fn, renorm, p_cn, cond, flow,
                             rep=16)
        f_ext = flops_of(extractor_fn, p_cn, cond, flow)
        rows["extractor_batch"] = (t_ext, f_ext)

    # controlnet trunk (per denoise step)
    if want("trunk"):
        t_trunk = chained_time(trunk_fn, renorm, p_cn, pyramid, sample)
        f_trunk = flops_of(trunk_fn, p_cn, pyramid, sample)
        rows["controlnet_trunk_step"] = (t_trunk, f_trunk)

    # unet alone and unet+trunk (per denoise step)
    if want("unet"):
        t_unet = chained_time(unet_only_fn, renorm, p_unet, sample)
        f_unet = flops_of(unet_only_fn, p_unet, sample)
        rows["unet_step"] = (t_unet, f_unet)
    if want("full"):
        t_full = chained_time(unet_fn, renorm, (p_cn, p_unet), pyramid,
                              sample)
        f_full = flops_of(unet_fn, (p_cn, p_unet), pyramid, sample)
        rows["trunk_plus_unet_step"] = (t_full, f_full)

    # vae decode (once per frame batch), XLA path and the opt-in fused
    # SiLU+conv3x3 Pallas path (ops/conv_pallas.py)
    if want("vae"):
        t_vae = chained_time(vae_fn, renorm, p_vae, latents, rep=4)
        f_vae = flops_of(vae_fn, p_vae, latents)
        rows["vae_decode_batch"] = (t_vae, f_vae)
    if want("vae_fused"):
        os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
        t_vf = chained_time(vae_fn, renorm, p_vae, latents, rep=4)
        rows["vae_decode_batch_fusedconv"] = (
            t_vf, flops_of(vae_fn, p_vae, latents))
        os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "0"

    # merge with any prior partial runs of other components
    per_component = {}
    if only is not None and os.path.exists(args.out):
        with open(args.out) as fi:
            per_component = json.load(fi).get("per_component", {})
    per_component.update({
        name: {
            "ms": round(t * 1e3, 2),
            "gflops": round(f / 1e9, 1),
            "tflops_per_s": round(f / t / 1e12, 1),
            "mfu_vs_v5e_bf16_peak": round(f / t / V5E_BF16_PEAK, 3),
        } for name, (t, f) in rows.items()
    })

    report = {
        "batch_frames": B,
        "cfg_batch": Bc,
        "per_component": per_component,
        "note": "chained-op timing (dispatch amortized); flops from XLA "
                "cost analysis of the same lowered graphs",
    }
    steps = 30
    have = per_component
    if ("trunk_plus_unet_step" in have and "extractor_batch" in have
            and "vae_decode_batch" in have):
        est_total = (steps * have["trunk_plus_unet_step"]["ms"]
                     + have["extractor_batch"]["ms"]
                     + have["vae_decode_batch"]["ms"]) / 1e3
        report["estimated_batch_seconds_30steps"] = round(est_total, 3)
        report["estimated_fps"] = round(B / est_total, 3)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(report, fo, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
