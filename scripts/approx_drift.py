#!/usr/bin/env python
"""Quantify the output drift of the opt-in approximate decode modes.

The reference pipeline recomputes ControlNet and the full UNet at every
step (/root/reference/pipeline.py:308-385); our caching knobs
(SamplerConfig.controlnet_interval / unet_encoder_interval) trade exactness
for speed.  This script bounds that approximation: it runs the flagship
512px/30-step operating point from IDENTICAL initial latents, weights and
conditioning, and records exact-vs-cached deltas

  * latent MSE / relative latent error on the final pre-VAE latents
  * pixel PSNR (outputs mapped to [0,1]) and max abs pixel delta

for every cached operating point in bench.py's matrix.  Weights are the
fixed-seed random init (no pretrained checkpoints in this image), so the
numbers bound the *mechanical* divergence of the cached loop, not RD cost
on real content; they are regenerated unchanged from any checkout
(fixed seeds throughout).

Writes artifacts/approx_drift.json.  Runtime: ~6 compiles + runs on one
chip (persistent compile cache applies).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from bench import build, init_params
from diffcodec_tpu.config import SamplerConfig
from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
from diffcodec_tpu.models.vae import decode_from_latents

MODES = [("exact", 1, 1), ("cnint2", 2, 1), ("cnint3", 3, 1),
         ("encint2", 1, 2), ("encint3", 1, 3), ("cnint2_encint2", 2, 2),
         ("cnint3_encint3", 3, 3)]


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    B = int(os.environ.get("BENCH_BATCH", "7"))
    H = 128 if small else 512
    steps = 5 if small else 30
    dtype = jnp.bfloat16

    unet_cfg, unet, controlnet, vae, schedule = build(small, dtype)
    params = init_params(unet_cfg, unet, controlnet, vae, H, dtype)
    # re-randomize every leaf: flax init zeroes the ControlNet's zero-convs,
    # which makes the injected residuals 0 for every timestep — caching a
    # constant is numerically a no-op and the drift reads as pure bf16
    # program-structure noise.  Non-zero weights make the residuals (and
    # the UNet encoder features) actually vary with t, which is what the
    # caching approximates away.
    leaves, treedef = jax.tree.flatten(params)
    rng_np = np.random.default_rng(0)
    leaves = [jnp.asarray(rng_np.standard_normal(x.shape) * 0.02, x.dtype)
              for x in leaves]
    params = jax.tree.unflatten(treedef, leaves)
    L, D = 77, unet_cfg.cross_attention_dim
    text = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), dtype) * 0.02
    uncond = jnp.zeros((B, L, D), dtype)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (B, H, H, 6),
                              dtype=jnp.float32).astype(dtype)
    flow = (jax.random.normal(jax.random.PRNGKey(3), (B, H, H, 4)) *
            4.0).astype(dtype)
    latents0 = jax.random.normal(jax.random.PRNGKey(10),
                                 (B, H // 8, H // 8, 4), jnp.float32)

    results = {}
    ref_lat = ref_img = None
    for suffix, ci, ei in MODES:
        pipe = DualFlowPipeline(
            unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
            sampler=SamplerConfig(num_inference_steps=steps,
                                  guidance_scale=3.5,
                                  controlnet_conditioning_scale=1.35,
                                  controlnet_interval=ci,
                                  unet_encoder_interval=ei, freeu=True))

        def f(params, latents, text, uncond, cond, flow, _pipe=pipe):
            final = _pipe.denoise(params, latents, text, uncond, cond, flow)
            img = decode_from_latents(_pipe.vae, params["vae"], final)
            return final, jnp.clip(img, -1.0, 1.0)

        t0 = time.time()
        last = None
        for attempt in range(3):
            # the remote compile helper occasionally drops the transport
            # mid-compile; retrying restarts the compile (cache-warm)
            try:
                lat, img = jax.jit(f)(params, latents0, text, uncond, cond,
                                      flow)
                break
            except Exception as e:
                last = e
                if "remote_compile" not in str(e):
                    raise
                print(f"compile transport error (attempt {attempt + 1}), "
                      f"retrying: {e}", file=sys.stderr, flush=True)
                time.sleep(20)
        else:
            raise last
        lat = jnp.asarray(lat, jnp.float32)
        img = jnp.asarray(img, jnp.float32)
        lat.block_until_ready()
        dt = time.time() - t0
        if suffix == "exact":
            ref_lat, ref_img = lat, img
            results[suffix] = {"latent_mse": 0.0, "pixel_psnr_db": None,
                               "note": "reference output"}
        else:
            lmse = float(jnp.mean((lat - ref_lat) ** 2))
            lrel = float(jnp.sqrt(jnp.mean((lat - ref_lat) ** 2) /
                                  jnp.mean(ref_lat ** 2)))
            # pixel metrics on [0,1]
            d = (img - ref_img) / 2.0
            pmse = float(jnp.mean(d ** 2))
            psnr = float(10.0 * jnp.log10(1.0 / max(pmse, 1e-12)))
            results[suffix] = {
                "latent_mse": round(lmse, 6),
                "latent_rel_rms": round(lrel, 5),
                "pixel_mse_01": round(pmse, 8),
                "pixel_psnr_db": round(psnr, 2),
                "pixel_max_abs_01": round(float(jnp.max(jnp.abs(d))), 4),
            }
        print(f"{suffix}: {results[suffix]} ({dt:.1f}s incl compile)",
              file=sys.stderr)

    out = {
        "operating_point": {"resolution": H, "steps": steps, "batch": B,
                            "guidance_scale": 3.5, "freeu": True,
                            "dtype": "bfloat16",
                            "weights": "fixed-seed random init"},
        "metric_defs": {
            "latent_mse": "mean squared error on final pre-VAE latents",
            "latent_rel_rms": "RMS latent error / RMS exact latent",
            "pixel_psnr_db": "PSNR of decoded output vs exact, [0,1] range",
        },
        "interpretation": (
            "at this weight draw every cached mode's latent drift is "
            "1e-4..5e-4 relative RMS — below the bf16 output quantization "
            "(pixel deltas cap at one ulp, 2^-12, so PSNR saturates at "
            "~89 dB, the bf16 floor).  The bound is mechanical, not an RD "
            "statement: residual/encoder smoothness across timesteps is "
            "weight-dependent, so rerun this script when pretrained "
            "weights land (scripts/approx_drift.py, fixed seeds)."),
        "modes": results,
    }
    path = os.path.join(ROOT, "artifacts", "approx_drift.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["modes"], indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
