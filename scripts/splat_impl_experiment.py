#!/usr/bin/env python
"""Head-to-head softsplat forward implementations at the extractor's
in-context shapes — with flow-VARYING feedback (the standalone profile's
flow-invariant feedback let XLA hoist the one-hot construction and hid
~41 ms/decode of splat cost; see artifacts/extractor_knockout.json).

Implementations:
  * pallas   — ops/softsplat_pallas.py (one-hot, W-column fori_loop)
  * xla      — ops/softsplat._splat_sum_xla (one-hot two-matmul scan)
  * scatter  — flat jnp .at[].add (XLA scatter-add; deterministic on TPU,
               linear cost, and its VJP is a gather)

Both one-hot forms cost 4*H^2*W^2*C MACs (quadratic in pixels); scatter
moves ~4*H*W*C floats.  Writes artifacts/splat_impl_experiment.json.
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

from diffcodec_tpu.ops.softsplat import (_splat_sum_scatter as
                                         splat_sum_scatter,
                                         _splat_sum_xla)
from diffcodec_tpu.ops.softsplat_pallas import splat_sum_pallas


# (H, W, C) at the extractor's call sites (warper + occl), swept over
# the three production batch sizes: 4 (train grad-accum micro-batch),
# 14 (CFG decode), 28 (2-GOP CFG) — VERDICT r04 #8 / ADVICE r03: confirm
# the B=14 crossovers hold across B or fold B into the dispatch.
HWC_SHAPES = [
    (64, 64, 161),
    (32, 32, 161),
    (16, 16, 321),
    (8, 8, 641),
    (64, 64, 3),
    (32, 32, 3),
]
BATCHES = [4, 14, 28]
SHAPES = [(b, h, w, c) for (h, w, c) in HWC_SHAPES for b in BATCHES]


def main():
    report = {}
    # correctness cross-check at one shape (vs the xla one-hot form)
    v = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    f = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 2)) * 3.0
    a = _splat_sum_xla(v, f)
    b = splat_sum_scatter(v, f)
    err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))
    print("scatter vs xla rel err:", err, flush=True)
    report["scatter_vs_xla_rel_err"] = err
    assert err < 1e-5

    impls = {
        "pallas": lambda vv, ff: splat_sum_pallas(vv, ff),
        "xla": lambda vv, ff: _splat_sum_xla(vv, ff),
        "scatter": splat_sum_scatter,
    }

    def fb(out, a):
        # perturb vals AND flow so nothing hoists
        d = (jnp.sum(out) * 1e-12)
        return (a[0] + d.astype(a[0].dtype),
                a[1] + d.astype(a[1].dtype))

    for (B, H, W, C) in SHAPES:
        vv = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C),
                               jnp.float32)
        ff = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, 2),
                               jnp.float32) * 2.0
        for name, fn in impls.items():
            try:
                ms = chained_time(fn, fb, vv, ff, rep=16) * 1e3
            except Exception as e:  # noqa: BLE001 - record and move on
                print(f"{name} {H}x{W}x{C}: FAILED {type(e).__name__}",
                      flush=True)
                report[f"{name}_B{B}_{H}x{W}x{C}_ms"] = None
                continue
            report[f"{name}_B{B}_{H}x{W}x{C}_ms"] = round(ms, 3)
            print(f"{name} B{B} {H}x{W}x{C}: {ms:.3f} ms", flush=True)

    # gradient-path timing at the hot shape (training runs the VJP): the
    # one-hot form's VJP is two more quadratic matmuls; scatter's is a
    # gather.
    vv = jax.random.normal(jax.random.PRNGKey(2), (14, 64, 64, 161))
    ff = jax.random.normal(jax.random.PRNGKey(3), (14, 64, 64, 2)) * 2.0

    for name, fn in (("xla", _splat_sum_xla), ("scatter",
                                               splat_sum_scatter)):
        g = jax.grad(lambda v_, f_: jnp.sum(fn(v_, f_) ** 2) * 1e-6,
                     argnums=(0, 1))

        def run(v_, f_):
            gv, gf = g(v_, f_)
            return gv + jnp.pad(gf, ((0, 0),) * 3 + ((0, 159),))

        ms = chained_time(
            run, lambda out, a: (out, a[1] + (jnp.sum(out) * 1e-12)
                                 .astype(a[1].dtype)), vv, ff, rep=8) * 1e3
        report[f"{name}_grad_64x64x161_ms"] = round(ms, 3)
        print(f"{name} grad 64x64x161: {ms:.3f} ms", flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/splat_impl_experiment.json", "w") as f_:
        json.dump(report, f_, indent=2)
    print("wrote artifacts/splat_impl_experiment.json")


if __name__ == "__main__":
    main()
