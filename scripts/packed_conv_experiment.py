#!/usr/bin/env python
"""Packed-lane ("space-into-lanes") reformulation of the extractor's
small-channel 512px pre-extractor conv chain — the experiment record.

Why: a bf16 NHWC activation with C=16 stores 128 lanes per pixel-word
(8x padded HBM traffic) and contracts 16-of-128 MXU columns; XLA runs the
BiDirFeatureExtractor pre-chain at ~1-2 TF/s effective
(artifacts/profile_extractor.json: 44 ms derived conv residual).  The
reformulation packs P = 128/C pixels into each 128-lane word
([B,H,W/P,128]) and expresses conv3x3 as a sum of <=9 dense
[M,128]@[128,128] matmuls: row taps are H slices, cross-word column taps
live in block-structured weights (word offset -1/0/+1), so HBM traffic is
dense and silu runs on dense words.  Every pre-chain stage satisfies
stride*P_out == P_in, so the word count (W/P) is invariant through the
chain and no repacking is needed between stages.

This is NOT the measured-negative im2col (materializes 27x) or
space-to-depth (stride-2 only) rescheduling from ops/conv_im2col.py: no
patch tensor is built and the packing survives the whole chain.

Run on TPU: python scripts/packed_conv_experiment.py
"""

import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from profile_decode import chained_time

# (cout, stride) per stage; cin follows from the previous stage (input 3)
CHAIN = [(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]


def ref_chain(x, kernels, biases):
    """The current module path: flax-Conv-identical numerics."""
    h = x
    for (cout, s), k, b in zip(CHAIN, kernels, biases):
        h = lax.conv_general_dilated(
            h, k.astype(h.dtype), (s, s), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.silu(h + b.astype(h.dtype))
    return h


def _pack_words(kernel, cin, cin_pad, cout, p_in, p_out, stride):
    """[3,3,cin,cout] -> [3, n_off, p_in*cin_pad, p_out*cout] block weights.

    Word offset d in {-1,0(,+1 if stride 1)}; entry rows (d, j_in, c) map
    input pixel w_rel = d*p_in + j_in to output pixel j_out's tap
    dc = w_rel - stride*j_out + 1 when 0 <= dc < 3."""
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_pad - cin), (0, 0)))
    n_off = 3 if stride == 1 else 2
    Wb = jnp.zeros((3, n_off, p_in * cin_pad, p_out * cout), kernel.dtype)
    for oi in range(n_off):
        d = oi - 1
        for j_in in range(p_in):
            w_rel = d * p_in + j_in
            for j_out in range(p_out):
                dc = w_rel - stride * j_out + 1
                if 0 <= dc < 3:
                    Wb = Wb.at[:, oi,
                               j_in * cin_pad:(j_in + 1) * cin_pad,
                               j_out * cout:(j_out + 1) * cout].set(k[:, dc])
    return Wb


def packed_conv3x3(xp, kernel, bias, cin, cin_pad, cout, stride):
    """xp [B,H,Wg,p_in*cin_pad] -> [B,H/stride,Wg,p_out*cout] (f32 acc,
    bias added, NO activation).  Requires stride*p_out == p_in."""
    B, H, Wg, L = xp.shape
    p_in = L // cin_pad
    p_out = p_in // stride
    assert p_in * cin_pad == L and stride * p_out == p_in
    H_out = H // stride
    Wb = _pack_words(kernel, cin, cin_pad, cout, p_in, p_out, stride)
    Wb = Wb.astype(xp.dtype)
    n_off = Wb.shape[1]
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, 1 if stride == 1 else 0),
                        (0, 0)))
    acc = jnp.zeros((B, H_out, Wg, p_out * cout), jnp.float32)
    for dr in range(3):
        for oi in range(n_off):
            xs = xpad[:, dr:dr + stride * H_out:stride, oi:oi + Wg, :]
            acc = acc + lax.dot_general(
                xs, Wb[dr, oi], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc + jnp.tile(bias, p_out).astype(jnp.float32)


def packed_chain(x, kernels, biases):
    """Whole pre-chain in packed space: pack once, unpack once."""
    B, H, W, C = x.shape
    cin, cin_pad = 3, 16
    p = 128 // cin_pad
    h = jnp.pad(x.reshape(B, H, W // p, p, C),
                ((0, 0),) * 3 + ((0, 0), (0, cin_pad - C))).reshape(
                    B, H, W // p, p * cin_pad)
    for (cout, s), k, b in zip(CHAIN, kernels, biases):
        h = packed_conv3x3(h, k, b, cin, cin_pad, cout, s)
        h = jax.nn.silu(h.astype(x.dtype))
        cin = cin_pad = cout
    B_, H_, Wg, L = h.shape
    p_out = L // cin
    return h.reshape(B_, H_, Wg, p_out, cin).reshape(B_, H_, Wg * p_out, cin)


def make_params(key, dtype):
    kernels, biases = [], []
    cin = 3
    for cout, _ in CHAIN:
        key, k1, k2 = jax.random.split(key, 3)
        kernels.append(jax.nn.initializers.lecun_normal()(
            k1, (3, 3, cin, cout), jnp.float32).astype(dtype))
        biases.append(jax.random.normal(k2, (cout,), jnp.float32)
                      .astype(dtype) * 0.1)
        cin = cout
    return kernels, biases


def main():
    report = {}
    # ---- exactness (f32, small) ----
    kernels, biases = make_params(jax.random.PRNGKey(0), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    r = jax.jit(ref_chain)(x, kernels, biases)
    p = jax.jit(packed_chain)(x, kernels, biases)
    err = float(jnp.max(jnp.abs(r - p)) / (jnp.max(jnp.abs(r)) + 1e-12))
    print(f"f32 rel max err: {err:.3e}", flush=True)
    report["f32_rel_max_err"] = err
    # CPU: 4e-7.  TPU: ~2e-4 — XLA runs f32 convs/dots at default MXU
    # precision (bf16 passes), so the two schedules round differently.
    assert err < 1e-3, err

    # bf16 drift vs the bf16 ref (different contraction grouping)
    kb, bb = make_params(jax.random.PRNGKey(0), jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    rb = jax.jit(ref_chain)(xb, kb, bb).astype(jnp.float32)
    pb = jax.jit(packed_chain)(xb, kb, bb).astype(jnp.float32)
    errb = float(jnp.max(jnp.abs(rb - pb)) / (jnp.max(jnp.abs(rb)) + 1e-12))
    print(f"bf16 rel max err vs bf16 ref: {errb:.3e}", flush=True)
    report["bf16_rel_max_err"] = errb

    # ---- timing at module shape (one chain at the extractor's B=7; the
    # module runs two such chains) ----
    B, H = int(os.environ.get("PCE_BATCH", "7")), 512
    kb, bb = make_params(jax.random.PRNGKey(0), jnp.bfloat16)
    xb = jax.random.normal(jax.random.PRNGKey(2), (B, H, H, 3),
                           jnp.float32).astype(jnp.bfloat16)

    def fb(out, a):
        return (a[0] + (jnp.sum(out.astype(jnp.float32)) * 1e-12
                        ).astype(a[0].dtype),) + a[1:]

    for name, fn in (("ref", ref_chain), ("packed", packed_chain)):
        ms = chained_time(lambda xx: fn(xx, kb, bb), fb, xb, rep=16) * 1e3
        report[f"{name}_chain_ms_b{B}"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms (B={B}, 512px, bf16)", flush=True)

    # fwd+bwd (the train step runs the extractor under grad)
    def loss_of(fn):
        def loss(kk, bbias, xx):
            return jnp.sum(fn(xx, list(kk), list(bbias))
                           .astype(jnp.float32) ** 2) * 1e-6
        return jax.grad(loss, argnums=(0, 1))

    for name, fn in (("ref", ref_chain), ("packed", packed_chain)):
        g = loss_of(fn)

        def run(xx):
            gk, gb = g(tuple(kb), tuple(bb), xx)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in gk) + \
                sum(jnp.sum(t.astype(jnp.float32)) for t in gb)

        ms = chained_time(
            lambda xx: run(xx), lambda out, a:
            (a[0] + (out * 1e-12).astype(a[0].dtype),), xb, rep=8) * 1e3
        report[f"{name}_chain_grad_ms_b{B}"] = round(ms, 3)
        print(f"{name} grad: {ms:.3f} ms", flush=True)

    out = "artifacts/packed_conv_experiment.json"
    os.makedirs("artifacts", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
