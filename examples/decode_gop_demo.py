#!/usr/bin/env python
"""Demo: decode a GOP of inter frames (the `pipeline.ipynb` replacement).

Builds the full-size (or --tiny) DualFlow pipeline, fabricates a moving
synthetic scene with exact flows, encodes it with the codec, decodes the
inter frames through the diffusion sampler, and reports PSNR per frame.

With random weights the diffusion output is noise-like — the point of the
demo is the end-to-end wiring (anchors -> bitstream -> conditioning ->
sampler -> frames); load converted SD-1.5 + DualFlowControlNet weights via
`models.hf_import.load_torch_state_dict` + `convert_state_dict` for real
reconstructions.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--gop", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="/tmp/diffcodec_demo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffcodec_tpu.codec.runner import encode_video, decode_video
    from diffcodec_tpu.config import (CodecConfig, ControlNetConfig,
                                      SamplerConfig, SchedulerConfig,
                                      UNetConfig, VAEConfig)
    from diffcodec_tpu.eval.metrics import psnr
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    S = args.size

    # moving-texture synthetic video with exact flows (+2 px/frame in x)
    rng = np.random.default_rng(0)
    texture = (rng.random((S, 2 * S, 3)) * 255).astype(np.uint8)
    frames = np.stack([texture[:, 2 * t:2 * t + S] for t in range(8)])
    flows = {t: np.full((S, S, 2), -2.0, np.float32) for t in range(8)}

    enc = encode_video(frames, os.path.join(args.out, "enc"),
                       CodecConfig(gop_size=args.gop,
                                   flow_rate_mode="dense"),
                       flows_fwd=flows, flows_bwd=flows)
    print("bpp:", enc.meta["bpp"])

    if args.tiny:
        unet_cfg, cn_cfg = UNetConfig.tiny(), ControlNetConfig.tiny()
        vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                            layers_per_block=1)
    else:
        unet_cfg = UNetConfig()
        cn_cfg = ControlNetConfig(unet=unet_cfg)
        vae_cfg = VAEConfig()
    unet = UNet2DConditionModel(unet_cfg, dtype=jnp.bfloat16)
    cn = DualFlowControlNet(cn_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    pipe = DualFlowPipeline(
        unet=unet, controlnet=cn, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        sampler=SamplerConfig(num_inference_steps=args.steps,
                              guidance_scale=3.5))
    z = jnp.zeros
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    L, D = 77, unet_cfg.cross_attention_dim
    params = {
        "unet": unet.init(k1, z((1, S // 8, S // 8, 4)), z((1,), jnp.int32),
                          z((1, L, D))),
        "controlnet": cn.init(k2, z((1, S // 8, S // 8, 4)),
                              z((1,), jnp.int32), z((1, L, D)),
                              z((1, S, S, 6)), z((1, S, S, 4))),
        "vae": vae.init(k3, z((1, 64, 64, 3))),
    }
    text = z((1, L, D))

    def sample_fn(cond, flow):
        B = cond.shape[0]
        t = jnp.broadcast_to(text, (B, L, D))
        return pipe.sample(params, jax.random.PRNGKey(1), t, t,
                           jnp.asarray(cond), jnp.asarray(flow))

    decoded = decode_video(enc, sample_fn)
    p = np.asarray(psnr(jnp.asarray(frames, jnp.float32),
                        jnp.asarray(decoded, jnp.float32)))
    for i, v in enumerate(p):
        tag = "intra" if i % args.gop == 0 else "inter"
        print(f"frame {i} ({tag}): psnr {float(v):.2f}")


if __name__ == "__main__":
    main()
