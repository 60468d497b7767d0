#!/usr/bin/env python
"""Knock-out attribution for the BiDirFeatureExtractor's 44 ms conv+fuse
residual (artifacts/profile_extractor.json): standalone constituents sum
to ~14 ms, so ~35 ms lives in interactions the standalone timings miss
(layout transitions around the fp32 splat islands, fusion breaks, etc).

Times the module with individual op families stubbed to identity at the
same shapes; the delta vs the full module attributes the cost IN CONTEXT.
Writes artifacts/extractor_knockout.json.
"""

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

import diffcodec_tpu.models.extractors as ex

INJECT = (320, 320, 640, 1280)


def time_module(name, report, B=7, H=512):
    dtype = jnp.bfloat16
    ext = ex.BiDirFeatureExtractor(inject_channels=INJECT, dtype=dtype)
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    cond = jax.random.uniform(kc, (B, H, H, 6), jnp.float32).astype(dtype)
    flow = (jax.random.normal(kf, (B, H, H, 4)) * 4.0).astype(dtype)
    params = ext.init(jax.random.PRNGKey(1), cond, flow)

    def ext_all(p, c, f):
        outs = ext.apply(p, c, f)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    ms = chained_time(
        ext_all,
        lambda out, a: (a[0], a[1] + (out * 1e-12).astype(a[1].dtype),
                        a[2] + (out * 1e-12).astype(a[2].dtype)),
        params, cond, flow, rep=16) * 1e3
    report[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms", flush=True)


def main():
    report = {}
    orig_splat = ex.softsplat
    orig_occ = ex.compute_occlusion_mask
    orig_fuse = ex.soft_fuse
    orig_resize = ex.resize_and_normalize_flow

    time_module("full", report)

    # splats -> identity (keeps shapes/dtypes; also inside occlusion the
    # module's own call sites — occlusion has its own softsplat import, so
    # patch only the warper-level one here)
    ex.softsplat = lambda v, f, m, mode: v
    time_module("no_warper_splat", report)
    ex.softsplat = orig_splat

    ex.compute_occlusion_mask = lambda f, b: jnp.zeros(
        f.shape[:3] + (1,), f.dtype)
    time_module("no_occlusion", report)
    ex.compute_occlusion_mask = orig_occ

    ex.soft_fuse = lambda wf, wl, cf, cl, of=None, ol=None: wf
    time_module("no_soft_fuse", report)
    ex.soft_fuse = orig_fuse

    ex.resize_and_normalize_flow = lambda f, h, w: jnp.zeros(
        (f.shape[0], h, w, 2), f.dtype)
    time_module("no_flow_resize", report)
    ex.resize_and_normalize_flow = orig_resize

    # everything flow-dependent out at once: how much is the pure conv
    # spine (pre-chains + pyramid convs + metric nets + zero convs)?
    ex.softsplat = lambda v, f, m, mode: v
    ex.compute_occlusion_mask = lambda f, b: jnp.zeros(
        f.shape[:3] + (1,), f.dtype)
    ex.soft_fuse = lambda wf, wl, cf, cl, of=None, ol=None: wf
    ex.resize_and_normalize_flow = lambda f, h, w: jnp.zeros(
        (f.shape[0], h, w, 2), f.dtype)
    time_module("conv_spine_only", report)
    ex.softsplat = orig_splat
    ex.compute_occlusion_mask = orig_occ
    ex.soft_fuse = orig_fuse
    ex.resize_and_normalize_flow = orig_resize

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/extractor_knockout.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote artifacts/extractor_knockout.json")


if __name__ == "__main__":
    main()
