#!/usr/bin/env python
"""Demo: decode high-resolution conditioning via overlap tiling
(the `patch_exp.ipynb` replacement).

Crops the (anchors, flow) conditioning into tiles, batches all tiles of all
frames through the jitted sampler in one call, merges with cosine
feathering, and reports the tile grid + timing.  Use --tiny for a fast CPU
wiring check; the full model at 1080p with 512x512/overlap-64 tiles is the
reference's production setting (BASELINE.md "sampling operating points").
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--tile_batch", type=int, default=0,
                    help="tiles per sampler call (0 = all at once)")
    ap.add_argument("--out", default="/tmp/tiled_demo")
    args = ap.parse_args()
    if args.tiny:
        args.height, args.width = 96, 128
        args.tile, args.overlap, args.steps = 64, 16, 2

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from diffcodec_tpu.config import (ControlNetConfig, SamplerConfig,
                                      SchedulerConfig, UNetConfig, VAEConfig)
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.sampling.tiled import sample_tiled, tile_grid
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.tiny:
        unet_cfg, cn_cfg = UNetConfig.tiny(), ControlNetConfig.tiny()
        vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                            layers_per_block=1)
        dtype = jnp.float32
    else:
        unet_cfg = UNetConfig()
        cn_cfg = ControlNetConfig(unet=unet_cfg)
        vae_cfg = VAEConfig()
        dtype = jnp.bfloat16
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    cn = DualFlowControlNet(cn_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    pipe = DualFlowPipeline(
        unet=unet, controlnet=cn, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        sampler=SamplerConfig(num_inference_steps=args.steps,
                              guidance_scale=3.5, freeu=not args.tiny))

    T = args.tile
    coords = tile_grid(args.height, args.width, (T, T), args.overlap)
    print(f"{args.height}x{args.width} -> {len(coords)} tiles of {T}x{T} "
          f"(overlap {args.overlap})")

    z = jnp.zeros
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    L, D = 77, unet_cfg.cross_attention_dim
    params = {
        "unet": unet.init(k1, z((1, T // 8, T // 8, 4)), z((1,), jnp.int32),
                          z((1, L, D))),
        "controlnet": cn.init(k2, z((1, T // 8, T // 8, 4)),
                              z((1,), jnp.int32), z((1, L, D)),
                              z((1, T, T, 6)), z((1, T, T, 4))),
        "vae": vae.init(k3, z((1, 64, 64, 3))),
    }
    rng = np.random.default_rng(0)
    B = args.frames
    cond = rng.random((B, args.height, args.width, 6), dtype=np.float32)
    flow = np.zeros((B, args.height, args.width, 4), np.float32)
    text = z((B, L, D))

    t0 = time.time()
    out = sample_tiled(pipe, params, jax.random.PRNGKey(1), text, text,
                       cond, flow, tile=(T, T), overlap=args.overlap,
                       tile_batch=args.tile_batch or None)
    dt = time.time() - t0
    print(f"decoded {B} frame(s) at {args.height}x{args.width} in {dt:.1f}s "
          f"({B / dt:.3f} fps incl. compile on first run)")
    os.makedirs(args.out, exist_ok=True)
    for b in range(B):
        u8 = np.clip((out[b] + 1) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(args.out, f"frame_{b:02d}.png"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
