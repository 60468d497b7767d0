"""EXPERIMENT: stride-2 conv3x3 halo-DMA Pallas kernel vs XLA's direct
strided-conv lowering (the VAE encoder's Downsample2D stages).

The encoder's three downsamplers cost 18.8 ms of the 121.7 ms batch-8
encode (artifacts/profile_vae_encode.json: 6.8 + 7.26 + 4.77 ms at only
11-16% MFU) — XLA's stride-2 conv lowering leaves the MXU mostly idle at
these shapes.  This was flagged as the one untried kernel idea in
ROADMAP "Round-4-end state of the perf frontier"; the earlier
space-to-depth reformulation (`ops/conv_im2col.py`, commit 7923fe4) was a
measured NEGATIVE because its (2,2)-phase transpose is a lane-crossing
relayout — this kernel instead streams halo row-tiles HBM->VMEM
(double-buffered DMA, 2*Th+2 input rows per Th output rows), splits row
phases with a free leading-dim reshape, and takes column phases as
stride-2 sublane slices feeding nine [Th*Wo,C]@[C,O] MXU taps (f32
accumulation).

Run: python scripts/downsample_kernel_experiment.py  (PROTO_CPU=1 for the
interpret-mode correctness check.)

RESULT (v5e, 2026-08-19): NEGATIVE at every shape — 0.59x to 0.93x vs
XLA direct, across three kernel schedules and th in {8,16,32}; full table
and root-cause analysis in the `downsample_conv_qualifies` docstring,
numbers in artifacts/downsample_conv_experiment.json.  XLA's stride-2
lowering sustains 27-40 TF/s steady-state at these shapes once the
per-call pad/dispatch visible in the cold profile is amortized; the halo
kernel loses the 3x operand reuse its stride-1 sibling gets from each
sublane slice.  The gate returns False; Downsample2D stays on nn.Conv.

Reference op: the HF VAE Encoder's Downsample2D (asymmetric (0,1) pad,
loaded at /root/reference/train_controlnet.py:805-808); the UNet's
symmetric-pad variant is gated by the same table.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("PROTO_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from diffcodec_tpu.ops.conv_pallas import (downsample_conv3x3_pallas,
                                           downsample_conv3x3_ref)


def chain(f, x, rep=10):
    @jax.jit
    def loop(x0):
        def body(_, xx):
            o = f(xx)
            s = (jnp.sum(o).astype(jnp.float32) * 1e-20).astype(x0.dtype)
            return xx + s
        return jax.lax.fori_loop(0, rep, body, x0)

    r = loop(x)
    float(jnp.sum(r.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t = time.time()
        r = loop(x)
        float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, time.time() - t)
    return best / rep


def main():
    interp = os.environ.get("PROTO_CPU") == "1"
    rng = np.random.RandomState(0)
    # the three VAE encoder downsample stages at train batch 8, plus the
    # UNet/latent-res shapes (64px) to bound the gate from below
    shapes = ([(1, 32, 32, 128, 128)] if interp else
              [(8, 512, 512, 128, 128),
               (8, 256, 256, 256, 256),
               (8, 128, 128, 512, 512),
               (8, 64, 64, 512, 512),
               (14, 64, 64, 320, 320)])
    results = []
    for B, H, W, C, O in shapes:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
        kb = k.astype(jnp.bfloat16)
        bb = bias.astype(jnp.bfloat16)

        got = downsample_conv3x3_pallas(x, kb, bb, asymmetric_pad=True,
                                        th=8, interpret=interp)
        want = downsample_conv3x3_ref(x, kb, bb, True)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    want.astype(jnp.float32))))
        den = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
        print(f"[{B},{H},{W},{C}->{O}] max|err|={err:.5f} "
              f"max|ref|={den:.2f} rel={err / max(den, 1e-9):.2e}")
        if interp:
            continue

        t_pal = chain(lambda xx: downsample_conv3x3_pallas(
            xx, kb, bb, asymmetric_pad=True, th=8), x)
        t_xla = chain(lambda xx: downsample_conv3x3_ref(xx, kb, bb, True), x)
        gflop = 2 * 9 * B * (H // 2) * (W // 2) * C * O / 1e9
        row = {"shape": [B, H, W, C, O],
               "pallas_ms": round(t_pal * 1e3, 2),
               "xla_ms": round(t_xla * 1e3, 2),
               "speedup": round(t_xla / t_pal, 2),
               "pallas_tflops": round(gflop / t_pal / 1e3, 1),
               "xla_tflops": round(gflop / t_xla / 1e3, 1)}
        print(row)
        results.append(row)
    if results:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            "downsample_conv_experiment.json")
        with open(out, "w") as f:
            json.dump({"note": "stride-2 halo kernel vs XLA direct, "
                               "chained x10 best-of-3, bf16",
                       "results": results}, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
