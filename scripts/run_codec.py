#!/usr/bin/env python
"""Encode / decode a video with the DiffCodec-TPU pipeline.

The CLI face of the codec layer (the reference drives this through
notebooks + eval scripts; SURVEY.md section 3.2):

  # encode: frames dir (+ optional .flo flow dirs) -> bitstream dir
  python scripts/run_codec.py encode --frames path/to/frames \
      --out enc_out --gop 8 --mode sparse \
      --flow_fwd path/to/Flow --flow_bwd path/to/Flow_b

  # decode: bitstream dir -> reconstructed frames (tiny random weights
  # unless --checkpoint / --sd_checkpoint_dir provide real ones)
  python scripts/run_codec.py decode --bitstream enc_out --out dec_frames \
      --steps 30 --guidance 3.5 --cond_scale 1.35

  # evaluate: decoded vs original frames
  python scripts/run_codec.py eval --orig path/to/frames --pred dec_frames \
      --gop 8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def cmd_encode(args):
    import numpy as np
    from diffcodec_tpu.codec.runner import encode_video
    from diffcodec_tpu.config import CodecConfig
    from diffcodec_tpu.eval.codec_eval import load_frames
    from diffcodec_tpu.utils.flo_io import read_flo
    from diffcodec_tpu.codec.gop import gop_schedule

    frames = load_frames(args.frames)
    N = frames.shape[0]
    flows_fwd = flows_bwd = None
    if args.mode != "none":
        flows_fwd, flows_bwd = {}, {}
        for item in gop_schedule(N, args.gop):
            t = item.target
            flows_fwd[t] = read_flo(os.path.join(
                args.flow_fwd, f"flow_{t:04d}.flo"))
            flows_bwd[t] = read_flo(os.path.join(
                args.flow_bwd, f"flow_{t:04d}.flo"))
    enc = encode_video(frames, args.out,
                       CodecConfig(gop_size=args.gop,
                                   flow_rate_mode=args.mode),
                       flows_fwd=flows_fwd, flows_bwd=flows_bwd,
                       intra_quality=args.intra_quality)
    print(json.dumps(enc.meta["bpp"], indent=2))


def _build_pipeline(args):
    import jax
    import jax.numpy as jnp
    from diffcodec_tpu.config import (ControlNetConfig, SamplerConfig,
                                      SchedulerConfig, UNetConfig, VAEConfig)
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule

    dtype = jnp.bfloat16
    unet_cfg = UNetConfig() if not args.tiny else UNetConfig.tiny()
    cn_cfg = ControlNetConfig(unet=unet_cfg) if not args.tiny else \
        ControlNetConfig.tiny()
    vae_cfg = VAEConfig() if not args.tiny else VAEConfig(
        base_channels=8, channel_mults=(1, 1, 2, 2), layers_per_block=1)
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    cn = DualFlowControlNet(cn_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    pipe = DualFlowPipeline(
        unet=unet, controlnet=cn, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        sampler=SamplerConfig(
            num_inference_steps=args.steps, guidance_scale=args.guidance,
            controlnet_conditioning_scale=args.cond_scale,
            controlnet_interval=args.cn_interval,
            unet_encoder_interval=args.enc_interval))
    return pipe, {"unet": unet_cfg, "controlnet": cn_cfg, "vae": vae_cfg}


def cmd_decode(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from diffcodec_tpu.codec.runner import EncodedVideo, decode_video
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    enc = EncodedVideo.load(args.bitstream)
    H, W = enc.meta["height"], enc.meta["width"]
    pipe, cfgs = _build_pipeline(args)
    z = jnp.zeros
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    L, D = 77, cfgs["unet"].cross_attention_dim
    params = {
        "unet": pipe.unet.init(k1, z((1, H // 8, W // 8, 4)),
                               z((1,), jnp.int32), z((1, L, D))),
        "controlnet": pipe.controlnet.init(
            k2, z((1, H // 8, W // 8, 4)), z((1,), jnp.int32), z((1, L, D)),
            z((1, H, W, 6)), z((1, H, W, 4))),
        "vae": pipe.vae.init(k3, z((1, 64, 64, 3))),
    }
    text = z((1, L, D))
    if args.sd_checkpoint_dir:
        # the weights-readiness path: torch-layout SD-1.5 root (+ optional
        # DualFlowControlNet safetensors) through the hf_import converters
        from diffcodec_tpu.config import CLIPTextConfig
        from diffcodec_tpu.models.clip_text import CLIPTextEncoder
        from diffcodec_tpu.models.weights import load_sd_checkpoint_dir
        from diffcodec_tpu.utils.tokenizer import default_tokenizer

        clip_cfg = CLIPTextConfig() if not args.tiny else \
            CLIPTextConfig.tiny()
        text_encoder = CLIPTextEncoder(clip_cfg, dtype=jnp.bfloat16)
        text_template = text_encoder.init(
            jax.random.PRNGKey(4),
            z((1, clip_cfg.max_length), jnp.int32))
        loaded = load_sd_checkpoint_dir(
            args.sd_checkpoint_dir,
            templates={**params, "text": text_template},
            configs={"unet": cfgs["unet"], "controlnet": cfgs["controlnet"],
                     "vae": cfgs["vae"], "text": clip_cfg},
            controlnet_path=args.controlnet_checkpoint or None)
        params.update({k: v for k, v in loaded.items() if k in params})
        tokenizer = default_tokenizer(clip_cfg.max_length)
        tpos, tneg = pipe.encode_prompt(
            text_encoder, loaded["text"], tokenizer, [args.prompt],
            [args.negative_prompt])
        text = jnp.asarray(tpos, jnp.bfloat16)
        uncond = jnp.asarray(tneg, jnp.bfloat16)
        L, D = text.shape[1], text.shape[2]
    else:
        uncond = text

    if args.distilled_checkpoint:
        # consistency-student decode (sampling/distilled.py): restore the
        # EMA params from a scripts/train_distill.py run and sample in
        # --student_steps evaluations with no CFG batch doubling
        from diffcodec_tpu.config import DistillConfig, TrainConfig
        from diffcodec_tpu.sampling.distilled import DistilledPipeline
        from diffcodec_tpu.train.checkpoint import restore_checkpoint
        from diffcodec_tpu.train.distill import DistillState
        from diffcodec_tpu.train.trainer import make_optimizer

        template = DistillState.create(
            {"unet": params["unet"], "controlnet": params["controlnet"]},
            make_optimizer(TrainConfig()))
        restored, step = restore_checkpoint(args.distilled_checkpoint,
                                            template)
        if restored is None:
            raise SystemExit(
                f"no checkpoint-N dir under {args.distilled_checkpoint}")
        print(f"distilled student from step {step} "
              f"({args.student_steps}-step decode)")
        params = dict(params)
        params["unet"] = restored.ema_params["unet"]
        params["controlnet"] = restored.ema_params["controlnet"]
        dpipe = DistilledPipeline(
            unet=pipe.unet, controlnet=pipe.controlnet, vae=pipe.vae,
            schedule=pipe.schedule,
            config=DistillConfig(
                num_student_steps=args.student_steps,
                guidance_scale=args.guidance,
                controlnet_conditioning_scale=args.cond_scale))
        jit_distilled = dpipe.jit_sample()

        def sample_fn(cond, flow):
            B = cond.shape[0]
            t = jnp.broadcast_to(text, (B, L, D))
            return jit_distilled(params, jax.random.PRNGKey(args.seed), t,
                                 jnp.asarray(cond), jnp.asarray(flow))
    else:
        jit_sample = jax.jit(pipe.sample)

        def sample_fn(cond, flow):
            B = cond.shape[0]
            t = jnp.broadcast_to(text, (B, L, D))
            u = jnp.broadcast_to(uncond, (B, L, D))
            return jit_sample(params, jax.random.PRNGKey(args.seed), t, u,
                              jnp.asarray(cond), jnp.asarray(flow))

    out = decode_video(enc, sample_fn, max_batch=args.max_batch,
                       transfer_dtype=jnp.bfloat16)
    os.makedirs(args.out, exist_ok=True)
    for i, frame in enumerate(out):
        Image.fromarray(frame).save(
            os.path.join(args.out, f"frame_{i:04d}.png"))
    print(f"decoded {len(out)} frames -> {args.out}")


def cmd_eval(args):
    from diffcodec_tpu.eval.codec_eval import evaluate_video
    out = evaluate_video(args.orig, args.pred, args.gop)
    print(json.dumps(out, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode")
    pe.add_argument("--frames", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--gop", type=int, default=8)
    pe.add_argument("--mode", choices=["none", "sparse", "dense"],
                    default="sparse")
    pe.add_argument("--flow_fwd", default="")
    pe.add_argument("--flow_bwd", default="")
    pe.add_argument("--intra_quality", type=int, default=30)

    pd = sub.add_parser("decode")
    pd.add_argument("--bitstream", required=True)
    pd.add_argument("--out", required=True)
    pd.add_argument("--steps", type=int, default=30)
    pd.add_argument("--guidance", type=float, default=3.5)
    pd.add_argument("--cond_scale", type=float, default=1.35)
    pd.add_argument("--cn_interval", type=int, default=1,
                    help="cache ControlNet residuals for k-1 steps "
                         "(opt-in approximation; 1 = exact)")
    pd.add_argument("--enc_interval", type=int, default=1,
                    help="cache the UNet down path for k-1 steps "
                         "(opt-in approximation; 1 = exact)")
    pd.add_argument("--seed", type=int, default=0)
    pd.add_argument("--tiny", action="store_true",
                    help="tiny random models (smoke testing)")
    pd.add_argument("--max_batch", type=int, default=7,
                    help="inter frames per sampler call")
    pd.add_argument("--sd_checkpoint_dir", default="",
                    help="diffusers-layout SD-1.5 root (vae/ unet/ "
                         "text_encoder/ [controlnet/]) of torch weights")
    pd.add_argument("--controlnet_checkpoint", default="",
                    help="DualFlowControlNet torch state dict "
                         "(.safetensors/.bin), overrides controlnet/ "
                         "in --sd_checkpoint_dir")
    pd.add_argument("--prompt", default="")
    pd.add_argument("--negative_prompt", default="")
    pd.add_argument("--distilled_checkpoint", default="",
                    help="orbax run dir from scripts/train_distill.py: "
                         "decode with the consistency student's EMA "
                         "weights in --student_steps evaluations, no CFG "
                         "(sampling/distilled.py)")
    pd.add_argument("--student_steps", type=int, default=4,
                    help="K for the distilled decode path")

    pv = sub.add_parser("eval")
    pv.add_argument("--orig", required=True)
    pv.add_argument("--pred", required=True)
    pv.add_argument("--gop", type=int, default=8)

    args = p.parse_args(argv)
    {"encode": cmd_encode, "decode": cmd_decode, "eval": cmd_eval}[args.cmd](
        args)


if __name__ == "__main__":
    main()
