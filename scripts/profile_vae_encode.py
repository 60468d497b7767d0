"""Per-stage timing of the VAE ENCODER on the real TPU.

The encoder is the training step's VAE share (ROADMAP #4: 44 ms at batch
4); this breaks it down by stage at the training operating point to
locate which conv regimes to attack with the halo-DMA kernel family.
Writes artifacts/profile_vae_encode.json (the fused-conv flag state is
recorded; run twice with DIFFCODEC_FUSED_SILU_CONV=0/1 to compare).

Usage: python scripts/profile_vae_encode.py [--batch 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp

from profile_decode import V5E_BF16_PEAK, chained_time, flops_of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="artifacts/profile_vae_encode.json")
    args = ap.parse_args()

    from diffcodec_tpu.models.layers import (AttentionBlock2D, Downsample2D,
                                             GroupNorm32, ResnetBlock2D)

    dtype = jnp.bfloat16
    B = args.batch
    rng = jax.random.PRNGKey(0)

    def resnets(ch, n=2):
        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                for j in range(n):
                    x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6,
                                      dtype=dtype, name=f"r{j}")(x)
                return x
        return Stage()

    class ConvIn(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(128, (3, 3), padding="SAME", dtype=dtype,
                           name="conv_in")(x)

    class Down(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            return Downsample2D(self.ch, asymmetric_pad=True, dtype=dtype,
                                name="down")(x)

    class Mid(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ResnetBlock2D(512, use_time_emb=False, eps=1e-6,
                              dtype=dtype, name="r0")(x)
            x = AttentionBlock2D(dtype=dtype, name="attn")(x)
            return ResnetBlock2D(512, use_time_emb=False, eps=1e-6,
                                 dtype=dtype, name="r1")(x)

    class OutHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = GroupNorm32(32, 1e-6, dtype=dtype, name="norm")(x)
            h = nn.silu(h)
            return nn.Conv(8, (3, 3), padding="SAME", dtype=dtype,
                           name="conv_out")(h)

    # SD-1.5 encoder at 512px input: mults (1,2,4,4), 2 resnets per block
    stages = [
        ("conv_in_512_3to128", ConvIn(), (B, 512, 512, 3)),
        ("down0_res_512_128", resnets(128), (B, 512, 512, 128)),
        ("down0_downsample_to256", Down(128), (B, 512, 512, 128)),
        ("down1_res_256_256", resnets(256), (B, 256, 256, 128)),
        ("down1_downsample_to128", Down(256), (B, 256, 256, 256)),
        ("down2_res_128_512", resnets(512), (B, 128, 128, 256)),
        ("down2_downsample_to64", Down(512), (B, 128, 128, 512)),
        ("down3_res_64_512", resnets(512), (B, 64, 64, 512)),
        ("mid_64_512", Mid(), (B, 64, 64, 512)),
        ("out_head_64_512to8", OutHead(), (B, 64, 64, 512)),
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
        params = jax.tree.map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v,
            mod.init(jax.random.PRNGKey(1), x))
        fn = lambda p, xx: mod.apply(p, xx)
        t = chained_time(fn, renorm, params, x, rep=8)
        f = flops_of(fn, params, x)
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
              "fused_silu_conv":
                  os.environ.get("DIFFCODEC_FUSED_SILU_CONV", "0"),
              "note": "stage modules re-initialized standalone; params "
                      "random — timing-only parity with the real encoder"}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(report, fo, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
