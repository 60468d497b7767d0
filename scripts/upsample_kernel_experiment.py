"""EXPERIMENT: fused nearest-2x-upsample + conv3x3 Pallas kernel vs the
production phase-conv XLA module (`models.layers._UpsampleConv`).

The VAE decoder's three Upsample2D stages cost ~46 ms of the 224 ms fused
decode at batch 7 (artifacts/profile_vae.json: 6.4 + 16.5 + 23.4 ms at
42-62 TF/s).  The phase-conv module already collapses 36 taps -> 16 at
input resolution; what it cannot avoid under XLA is (a) four separate
convs each re-reading x from HBM and (b) the stack+transpose interleave
pass over the full 2x output.  The Pallas kernel streams x once
(double-buffered halo DMA), runs all 16 collapsed taps per tile, and
interleaves row phases in-register; column phases interleave in one XLA
reshape pass.

Run: python scripts/upsample_kernel_experiment.py  (PROTO_CPU=1 for the
interpret-mode correctness check.)  Measured numbers recorded below after
the TPU run.
"""
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

from diffcodec_tpu.models.layers import _UpsampleConv
from diffcodec_tpu.ops.conv_pallas import (upsample_conv3x3_pallas,
                                           upsample_conv3x3_ref)


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
    # the three VAE decoder upsample stages at GOP batch 7
    shapes = ([(1, 32, 16, 128, 128)] if interp else
              [(7, 64, 64, 512, 512),
               (7, 128, 128, 512, 512),
               (7, 256, 256, 256, 256)])
    for B, H, W, C, O in shapes:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
        mod = _UpsampleConv(O, dtype=jnp.bfloat16)
        params = {"params": {"kernel": k, "bias": bias}}

        got = upsample_conv3x3_pallas(x, k.astype(jnp.bfloat16),
                                      bias.astype(jnp.bfloat16),
                                      th=8, interpret=interp)
        want = upsample_conv3x3_ref(x, k, bias)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    want.astype(jnp.float32))))
        den = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
        print(f"[{B},{H},{W},{C}->{O}] max|err|={err:.5f} "
              f"rel={err / den:.6f}")
        assert err / den < 2e-2
        if interp:
            print("interpret-mode OK")
            return

        gf = 2 * 16 * B * H * W * C * O / 1e9
        kb = k.astype(jnp.bfloat16)
        bb = bias.astype(jnp.bfloat16)
        for th in (8, 16, 32):
            if H % th:
                continue
            t = chain(lambda xx, th=th: upsample_conv3x3_pallas(
                xx, kb, bb, th=th), x)
            print(f"  pallas th={th}: {t*1e3:7.2f} ms  {gf/t/1e3:6.1f} TF/s")
        t = chain(lambda xx: mod.apply(params, xx), x)
        print(f"  xla phase-conv: {t*1e3:6.2f} ms  {gf/t/1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
