#!/usr/bin/env python
"""Attention matmul ORIENTATION experiment at the SD decode shapes
(VERDICT r04 #3: attack or close the head_dim-40 MXU-padding gap).

The roofline in BASELINE.md charges attention its PADDED cost because the
40-wide head dim lands on the 128-granule LANE axis in both matmuls of
the standard orientation:

  logits: [q,d] @ [d,k]  - d=40 is the contraction (1 lane-tile, pads 3.2x)
  pv:     [q,k] @ [k,d]  - d=40 is the OUTPUT lane dim (pads 3.2x)

But only lanes are 128-granule; SUBLANES are 8 (f32) / 16 (bf16)-granule,
and MXU cost scales with streamed rows at sublane granularity.  So the
transposed PV orientation

  pv_T:   o^T = v^T @ p^T  -> [d,k] @ [k,q]  (einsum "bkhd,bhqk->bhdq")

streams d=40 rows (pads to 48 sublanes, 1.2x) against N=q lanes instead
of padding d to 128 output lanes: model cost 48/128 = 0.375x of pv_std.
The logits matmul cannot be helped (a contraction below one 128-lane tile
costs one tile in any orientation).  Predicted full-attention win if the
model holds: (1 + 0.375)/2 = 0.69x -> ~1.45x on the attention blocks.

This script measures (chained, data-dependent feedback so nothing hoists):
  * isolated pv_std vs pv_T matmuls,
  * full attention fwd: standard / pv_T (incl. the transpose back to
    [B,L,H,D]) / k-major logits variant,
at the CFG decode batch (B=14, H=8, L=4096, D=40) and the 32x32 level
(L=1024, D=80).  Writes artifacts/attn_orientation_experiment.json; the
result gates any change to models/layers.Attention.
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

SHAPES = [  # (B, H, L, D): CFG decode batch at the two long-seq levels
    (14, 8, 4096, 40),
    (14, 8, 1024, 80),
]


def attn_std(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attn_pvT(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bkhd,bhqk->bhdq", v, p)   # [B,H,D,Lq]
    return o.transpose(0, 3, 1, 2)            # back to [B,Lq,H,D]


def attn_kmajor(q, k, v, scale):
    # k on sublanes end-to-end: logits transposed, softmax over sublanes,
    # pv contracts k from the sublane axis of p
    s = jnp.einsum("bkhd,bqhd->bhkq", k, q,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-2).astype(v.dtype)
    o = jnp.einsum("bhkq,bkhd->bhdq", p, v)
    return o.transpose(0, 3, 1, 2)


def main():
    report = {}
    for (B, H, L, D) in SHAPES:
        key = f"B{B}_H{H}_L{L}_D{D}"
        rep = 8
        kq, kk, kv, kp = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)
        scale = 1.0 / (D ** 0.5)
        # bf16 end-to-end: the f32 intermediate would be 7.5 GB at the
        # 4096-seq shape (OOMs alongside the chained-feedback buffers);
        # values are timing filler, only the shape/dtype matter
        probs = jax.nn.softmax(
            jax.random.normal(kp, (B, H, L, L), jnp.bfloat16), -1)

        entry = {}

        # --- isolated PV matmuls (feedback through a tiny v bump) -------
        def pv_std(p, vv):
            return jnp.einsum("bhqk,bkhd->bqhd", p, vv)

        def pv_T(p, vv):
            return jnp.einsum("bkhd,bhqk->bhdq", vv, p)

        def fb_v(out, args):
            # v' depends on out; p stays an input (the matmul itself can
            # never hoist because v changes every iteration)
            bump = (jnp.sum(out[..., :1, :1]) * 1e-12).astype(args[1].dtype)
            return (args[0], args[1] + bump)

        entry["pv_std_ms"] = chained_time(pv_std, fb_v, probs, v,
                                          rep=rep) * 1e3
        entry["pv_T_ms"] = chained_time(pv_T, fb_v, probs, v,
                                        rep=rep) * 1e3

        # --- full attention forward variants ----------------------------
        def fb_qkv(out, args):
            o = out.astype(jnp.bfloat16)
            return (o, o, o, args[3])

        for name, fn in (("attn_std", attn_std), ("attn_pvT", attn_pvT),
                         ("attn_kmajor", attn_kmajor)):
            entry[f"{name}_ms"] = chained_time(
                lambda qq, kk_, vv, sc: fn(qq, kk_, vv, sc),
                fb_qkv, q, k, v, scale, rep=rep) * 1e3

        # numeric agreement of the variants (same math, fp reassociation).
        # B=2 slice, jitted: agreement is B-independent and the eager
        # full-batch f32 logits (7.5 GB at L=4096) OOM next to the
        # timing buffers
        qs, ks, vs = q[:2], k[:2], v[:2]
        for name, fn in (("attn_pvT", attn_pvT),
                         ("attn_kmajor", attn_kmajor)):
            d = jax.jit(lambda a, b, c, f=fn: jnp.max(jnp.abs(
                f(a, b, c, scale).astype(jnp.float32)
                - attn_std(a, b, c, scale).astype(jnp.float32))))(qs, ks, vs)
            entry[f"{name}_maxdiff"] = float(d)

        report[key] = {k2: (round(v2, 3) if isinstance(v2, float) else v2)
                       for k2, v2 in entry.items()}
        print(key, report[key], flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/attn_orientation_experiment.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote artifacts/attn_orientation_experiment.json")


if __name__ == "__main__":
    main()
