"""Per-stage timing of the VAE decoder on the real TPU.

The decoder is ~7% of decode wall clock but runs at only ~25% MFU
(artifacts/profile_decode.json); this breaks it down by stage (mid /
up blocks / conv_out) at the bench operating point to locate the waste.
Writes artifacts/profile_vae.json.

Usage: python scripts/profile_vae.py [--batch 7]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp

from profile_decode import V5E_BF16_PEAK, chained_time, flops_of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--out", default="artifacts/profile_vae.json")
    args = ap.parse_args()

    from diffcodec_tpu.config import VAEConfig
    from diffcodec_tpu.models.layers import (AttentionBlock2D, GroupNorm32,
                                             ResnetBlock2D, Upsample2D)

    dtype = jnp.bfloat16
    B = args.batch
    cfg = VAEConfig()
    base = cfg.base_channels  # 128
    rng = jax.random.PRNGKey(0)

    # decoder stages at 512px output: (name, module ctor, input shape)
    def resnets(ch_in, ch, n=3):
        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                for j in range(n):
                    x = ResnetBlock2D(ch, use_time_emb=False, dtype=dtype,
                                      name=f"r{j}")(x)
                return x
        return Stage()

    class Mid(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ResnetBlock2D(512, use_time_emb=False, dtype=dtype,
                              name="r0")(x)
            x = AttentionBlock2D(dtype=dtype, name="attn")(x)
            return ResnetBlock2D(512, use_time_emb=False, dtype=dtype,
                                 name="r1")(x)

    class Ups(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            return Upsample2D(self.ch, dtype=dtype, name="up")(x)

    class OutHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            # mirror models.vae.Decoder's out-head dispatch
            from diffcodec_tpu.models.layers import SiluConv
            from diffcodec_tpu.models.vae import _out_head
            from diffcodec_tpu.ops.conv_pallas import (
                gn_silu_conv_qualifies, head_projection_qualifies)
            norm = GroupNorm32(32, 1e-6, dtype=dtype, name="norm")
            conv = SiluConv(3, dtype=dtype, name="conv")
            return _out_head(x, norm, conv,
                             gn_silu_conv_qualifies(x, 3)
                             or head_projection_qualifies(x, 3))

    stages = [
        ("mid_64_512", Mid(), (B, 64, 64, 512)),
        ("up0_res_64_512", resnets(512, 512), (B, 64, 64, 512)),
        ("up0_upsample_to128", Ups(512), (B, 64, 64, 512)),
        ("up1_res_128_512", resnets(512, 512), (B, 128, 128, 512)),
        ("up1_upsample_to256", Ups(512), (B, 128, 128, 512)),
        ("up2_res_256_256", resnets(512, 256), (B, 256, 256, 256)),
        ("up2_upsample_to512", Ups(256), (B, 256, 256, 256)),
        ("up3_res_512_128", resnets(256, base), (B, 512, 512, base)),
        ("out_head_512_128", OutHead(), (B, 512, 512, base)),
    ]

    def renorm(out, a):
        x = a[-1]
        if out.shape == x.shape:
            s = out.astype(jnp.float32)
            s = (s / (jnp.sqrt(jnp.mean(s * s)) + 1e-6)).astype(x.dtype)
            return a[:-1] + (s,)
        s = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(x.dtype)
        return a[:-1] + (x + s,)

    per = {}
    total = 0.0
    for name, mod, shape in stages:
        x = jax.random.normal(rng, shape, dtype)
        # params as ARGS, not closures (closures lower to inline MLIR
        # constants and bloat what goes to the remote compile helper)
        params = jax.tree.map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v,
            mod.init(jax.random.PRNGKey(1), x))
        fn = lambda p, xx: mod.apply(p, xx)
        t = chained_time(fn, renorm, params, x, rep=8)
        f = flops_of(fn, params, x)
        hbm_gb = 0.0
        per[name] = {
            "ms": round(t * 1e3, 2),
            "gflops": round(f / 1e9, 1),
            "tflops_per_s": round(f / t / 1e12, 1),
            "mfu_vs_v5e_bf16_peak": round(f / t / V5E_BF16_PEAK, 3),
        }
        total += t
        print(name, per[name], flush=True)

    report = {"batch_frames": B, "per_stage": per,
              "sum_ms": round(total * 1e3, 2),
              "note": "stage modules re-initialized standalone; params "
                      "random — timing-only parity with the real decoder"}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(report, fo, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
