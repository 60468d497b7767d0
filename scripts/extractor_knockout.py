#!/usr/bin/env python
"""Knock-out attribution for the BiDirFeatureExtractor's 44 ms conv+fuse
residual (artifacts/profile_extractor.json): standalone constituents sum
to ~14 ms, so ~35 ms lives in interactions the standalone timings miss
(layout transitions around the fp32 splat islands, fusion breaks, etc).

Times the module with individual op families stubbed to identity at the
same shapes; the delta vs the full module attributes the cost IN CONTEXT.
Writes artifacts/extractor_knockout.json.
"""

import contextlib
import json
import os
import sys
from unittest import mock

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


# Stub op families to near-free but DATA-DEPENDENT outputs: a pure
# jnp.zeros stub lets XLA constant-fold every downstream consumer (the
# warped*(1-mask) multiply, the soft_fuse occlusion terms), which would
# over-attribute cost to the stubbed family.  A broadcast 1e-6*mean keeps
# every downstream edge live for ~one reduction's cost.
def _dep_fill(x, shape, dtype):
    return jnp.broadcast_to(
        (jnp.mean(x.astype(jnp.float32)) * 1e-6).astype(dtype), shape)


STUBS = {
    # splats -> pass-through + live dep on flow (keeps shapes/dtypes; the
    # occlusion helper has its own softsplat import, so patching the
    # warper-level name leaves occlusion intact)
    "softsplat": lambda v, f, m, mode: v + _dep_fill(f, v.shape, v.dtype),
    "compute_occlusion_mask": lambda f, b: _dep_fill(
        b, f.shape[:3] + (1,), f.dtype),
    "soft_fuse": lambda wf, wl, cf, cl, of=None, ol=None: (
        wf + _dep_fill(wl, wf.shape, wf.dtype)),
    "resize_and_normalize_flow": lambda f, h, w: _dep_fill(
        f, (f.shape[0], h, w, 2), f.dtype),
}


@contextlib.contextmanager
def knocked_out(*names):
    """Patch the named ex.* ops with their stubs; always restores."""
    with contextlib.ExitStack() as stack:
        for n in names:
            stack.enter_context(mock.patch.object(ex, n, STUBS[n]))
        yield


def main():
    report = {}
    time_module("full", report)
    with knocked_out("softsplat"):
        time_module("no_warper_splat", report)
    with knocked_out("compute_occlusion_mask"):
        time_module("no_occlusion", report)
    with knocked_out("soft_fuse"):
        time_module("no_soft_fuse", report)
    with knocked_out("resize_and_normalize_flow"):
        time_module("no_flow_resize", report)
    # everything flow-dependent out at once: how much is the pure conv
    # spine (pre-chains + pyramid convs + metric nets + zero convs)?
    with knocked_out(*STUBS):
        time_module("conv_spine_only", report)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/extractor_knockout.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote artifacts/extractor_knockout.json")


if __name__ == "__main__":
    main()
