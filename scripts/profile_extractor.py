#!/usr/bin/env python
"""Micro-profile of the BiDirFeatureExtractor (the 86 ms / 2.4 TF/s
component from artifacts/profile_decode.json): times the whole module and
each constituent op family standalone at the same shapes, so the residual
attribution (convs vs splats vs occlusion vs resizes) is measured, not
guessed.

Writes artifacts/profile_extractor.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from profile_decode import chained_time

from diffcodec_tpu.models.extractors import BiDirFeatureExtractor
from diffcodec_tpu.ops.flow import (compute_occlusion_mask,
                                    resize_and_normalize_flow)
from diffcodec_tpu.ops.softsplat import softsplat

INJECT = (320, 320, 640, 1280)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7,
                    help="frames per extractor call (pipeline hoists the "
                         "pyramid at frame batch, then duplicates for CFG)")
    ap.add_argument("--out", default="artifacts/profile_extractor.json")
    ap.add_argument("--height", type=int, default=512)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    B, H = args.batch, args.height
    ext = BiDirFeatureExtractor(inject_channels=INJECT, dtype=dtype)
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(kc, (B, H, H, 6), jnp.float32).astype(dtype)
    flow = (jax.random.normal(kf, (B, H, H, 4)) * 4.0).astype(dtype)
    params = ext.init(jax.random.PRNGKey(1), cond, flow)

    report = {"batch": B, "height": H, "ms": {}}

    def time_ms(name, fn, out_to_in, *xs, rep=8):
        # rep beats the ~30 ms per-call tunnel round-trip floor: resolution
        # is ~30/rep ms, so small ops use large rep
        ms = chained_time(fn, out_to_in, *xs, rep=rep) * 1e3
        report["ms"][name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms (rep={rep})", flush=True)

    # non-elidable feedback everywhere below (NOT `0 * out`, which the
    # algebraic simplifier folds away — see profile_decode.renorm)
    # whole module (at the pipeline's true hoisted batch: the pyramid is
    # extracted at frame batch B and duplicated for CFG afterwards)
    def ext_all(p, c, f):
        # a scalar touching EVERY pyramid level — returning a single level
        # lets XLA dead-code-eliminate the other scales' splat paths
        outs = ext.apply(p, c, f)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    # feedback must perturb BOTH cond and flow: with flow loop-invariant,
    # XLA hoists the occlusion masks, flow resizes, and splat geometry out
    # of the chained loop and the number reads ~16x too low (an earlier
    # revision of this script hit exactly that)
    time_ms("extractor_total", ext_all,
            lambda out, a: (a[0], a[1] + (out * 1e-12).astype(a[1].dtype),
                            a[2] + (out * 1e-12).astype(a[2].dtype)),
            params, cond, flow, rep=16)

    # splat family: the warper splats at each scale (both directions
    # batched = 2B), learned metric soft mode, fp32 islands
    for idx, inject in enumerate(INJECT):
        res = H // (8 * 2 ** idx)
        half = inject // 2
        feats = jax.random.normal(jax.random.PRNGKey(2 + idx),
                                  (2 * B, res, res, half), jnp.float32)
        fl = jax.random.normal(jax.random.PRNGKey(6 + idx),
                               (2 * B, res, res, 2), jnp.float32) * 2.0
        metric = jax.random.normal(jax.random.PRNGKey(10 + idx),
                                   (2 * B, res, res, 1), jnp.float32)
        # feedback must perturb the FLOW too: with flow loop-invariant the
        # one-hot construction (the dominant cost of the matmul-form splat)
        # hoists out of the chain and the op reads ~50x too low — this is
        # how the round-2 profile missed ~41 ms/decode of splat cost
        # (artifacts/extractor_knockout.json)
        time_ms(f"warper_splat_s{idx}_{res}px_{half}ch",
                lambda v, f, m: softsplat(v, f, m, "soft"),
                lambda out, a: (out, a[1] + (jnp.sum(out) * 1e-12
                                             ).astype(a[1].dtype), a[2]),
                feats, fl, metric, rep=64)

    # occlusion masks at each scale (batch 2B like the module: both
    # directions in one launch)
    for idx in range(len(INJECT)):
        res = H // (8 * 2 ** idx)
        f2 = jax.random.normal(jax.random.PRNGKey(20 + idx),
                               (2 * B, res, res, 2), jnp.float32) * 2.0
        b2 = -f2 + 0.1
        time_ms(f"occlusion_s{idx}_{res}px",
                lambda a_, b_: compute_occlusion_mask(a_, b_),
                lambda out, a: (a[0] + (jnp.sum(out.astype(jnp.float32)) *
                                        1e-12).astype(a[0].dtype),
                                a[1] + (jnp.sum(out.astype(jnp.float32)) *
                                        1e-12).astype(a[1].dtype)),
                f2, b2, rep=64)

    # flow resizes (full res -> each scale, both directions)
    def all_resizes(fl4):
        outs = []
        for idx in range(len(INJECT)):
            res = H // (8 * 2 ** idx)
            outs.append(resize_and_normalize_flow(fl4[..., 0:2], res, res))
            outs.append(resize_and_normalize_flow(fl4[..., 2:4], res, res))
        return sum(o.mean() for o in outs)

    time_ms("flow_resizes_all_scales",
            lambda f: all_resizes(f),
            lambda out, a: (a[0] + (out.astype(jnp.float32) *
                                    1e-12).astype(a[0].dtype),),
            flow.astype(jnp.float32), rep=64)

    # conv family: the pre-extractor + per-scale feature convs, exactly the
    # module minus splats/occlusion/fuse — measured via a second module
    # apply with splats stubbed is invasive, so instead derive it:
    splat_ms = sum(v for k, v in report["ms"].items()
                   if k.startswith("warper_splat"))
    occ_ms = sum(v for k, v in report["ms"].items()
                 if k.startswith("occlusion"))
    resize_ms = report["ms"]["flow_resizes_all_scales"]
    report["ms"]["derived_conv_and_fuse_residual"] = round(
        report["ms"]["extractor_total"] - splat_ms - occ_ms - resize_ms, 2)
    report["note"] = ("standalone op timings at module shapes; "
                      "derived_conv_and_fuse_residual = total - splats - "
                      "occlusion - resizes (launch overlap makes this a "
                      "lower bound on conv time)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
