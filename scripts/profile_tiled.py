#!/usr/bin/env python
"""Per-stage profile of the tiled 1080p decode (VERDICT round-2 weak #4).

Breaks the full-HD path (sampling/tiled.py: crop -> one bf16 upload ->
chunked jitted sampler -> fetch -> feathered merge) into measured stages at
the production setting (512px tiles, overlap 64, 30-step UniPC+CFG), for
exact and combined-cache (cn/enc interval 3) operating points.

Writes artifacts/profile_tiled.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--steps", type=int, default=30)
    # 5 tiles/chunk: 15-tile 1080p frames split into 3 equal chunks, and
    # CFG batch 10 stays inside the measured HBM envelope — the exact pipe
    # falls off a memory cliff at tile_batch 8 (CFG 16): 85 s/chunk vs
    # ~3.6 s at 5
    ap.add_argument("--tile_batch", type=int, default=5)
    # overlap 64 = patch_exp.ipynb parity (15 tiles at 1080p); 32 = the
    # opt-in reduced-redundancy grid (12 tiles, ~20% less compute)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--out", default="artifacts/profile_tiled.json")
    # comma-separated subset of {exact, cnint3_encint3}: each point jits
    # its own pipeline per chunk shape (~10 min of cold compiles each)
    ap.add_argument("--points", default="exact,cnint3_encint3")
    args = ap.parse_args()

    from bench import build, init_params
    from diffcodec_tpu.config import SamplerConfig
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
    from diffcodec_tpu.sampling.tiled import (_crop_batch, _jitted_sampler,
                                              sample_tiled, tile_grid)
    from diffcodec_tpu.ops.tiling import merge_tiles

    dtype = jnp.bfloat16
    T = 512
    unet_cfg, unet, controlnet, vae, schedule = build(False, dtype)
    params = init_params(unet_cfg, unet, controlnet, vae, T, dtype)
    H, W = args.height, args.width
    coords = tile_grid(H, W, (T, T), args.overlap)
    n_tiles = len(coords)
    rng = np.random.default_rng(0)
    # uint8 conditioning: raw transfer + on-device normalize (lossless;
    # the decoder's conditioning is decoded uint8 anchor pixels)
    cond = rng.integers(0, 256, (1, H, W, 6), dtype=np.uint8)
    flow = np.zeros((1, H, W, 4), np.float32)
    L, D = 77, unet_cfg.cross_attention_dim
    text = rng.standard_normal((1, L, D)).astype(np.float32) * 0.02

    report = {"resolution": [H, W], "tile": T, "overlap": args.overlap,
              "n_tiles": n_tiles, "steps": args.steps,
              "tile_batch": args.tile_batch, "points": {}}

    wanted = args.points.split(",")
    for suffix, ci, ei in (("exact", 1, 1), ("cnint3_encint3", 3, 3)):
        if suffix not in wanted:
            continue
        pipe = DualFlowPipeline(
            unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
            sampler=SamplerConfig(num_inference_steps=args.steps,
                                  guidance_scale=3.5,
                                  controlnet_conditioning_scale=1.35,
                                  controlnet_interval=ci,
                                  unet_encoder_interval=ei, freeu=True))
        # warm: compile every chunk shape through the public entry
        t0 = time.time()
        out = sample_tiled(pipe, params, jax.random.PRNGKey(1), text, text,
                           cond, flow, tile=(T, T), overlap=args.overlap,
                           tile_batch=args.tile_batch)
        first = time.time() - t0

        # staged, steady-state
        t0 = time.time()
        cond_t = _crop_batch(cond, coords, T, T)
        flow_t = _crop_batch(flow, coords, T, T)
        t_crop = time.time() - t0

        t0 = time.time()
        cond_d = (jnp.asarray(cond_t).astype(jnp.float32) / 255.0
                  ).astype(dtype)
        flow_d = jnp.asarray(flow_t, dtype)
        text_d = jnp.asarray(np.repeat(text, n_tiles, axis=0), dtype)
        cond_d.block_until_ready()
        t_upload = time.time() - t0

        sample_fn = _jitted_sampler(pipe)
        step = args.tile_batch
        t0 = time.time()
        outs = []
        for s in range(0, n_tiles, step):
            sl = slice(s, s + step)
            outs.append(sample_fn(params, jax.random.fold_in(
                jax.random.PRNGKey(2), s), text_d[sl], text_d[sl],
                cond_d[sl], flow_d[sl]))
        jax.block_until_ready(outs)
        t_sample = time.time() - t0

        t0 = time.time()
        # mirror sample_tiled's fetch: bf16 -> f16 on device (2 bytes/el)
        cat = jnp.concatenate(outs)
        if cat.dtype == jnp.bfloat16:
            cat = cat.astype(jnp.float16)
        tiles_out = np.asarray(cat).astype(np.float32)
        t_fetch = time.time() - t0

        t0 = time.time()
        per_frame = [tiles_out[k][:y2 - y1, :x2 - x1]
                     for k, (y1, y2, x1, x2) in enumerate(coords)]
        merge_tiles(per_frame, coords, (H, W), feather=min(64, args.overlap),
                    as_uint8=False)
        t_merge = time.time() - t0

        total = t_crop + t_upload + t_sample + t_fetch + t_merge
        report["points"][suffix] = {
            "first_incl_compile_s": round(first, 1),
            "stages_s": {
                "host_crop": round(t_crop, 3),
                "upload_u8cond_bf16flow": round(t_upload, 3),
                "sampler_chunks": round(t_sample, 3),
                "fetch": round(t_fetch, 3),
                "host_merge": round(t_merge, 3),
            },
            "seconds_per_frame": round(total, 2),
            "fps": round(1.0 / total, 4),
        }
        print(suffix, report["points"][suffix], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
