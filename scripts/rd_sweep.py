#!/usr/bin/env python
"""Full RD sweep: encode/decode every video at every (GOP, rate-mode) point
and regenerate the benchmark_results-format JSONs.

The BASELINE.json config-5 driver: walks `{dataset_root}/{video}/frames`
(+ optional Flow/Flow_b .flo dirs), runs the codec at GOPs x rate modes,
evaluates PSNR/MS-SSIM (inter-only and all frames), and writes

  {out}/bpp_results.json          (calculate_storage_stats_UVC.py format)
  {out}/inter_bpp_results.json
  {out}/metric_results.json
  {out}/rd_curves_{metric}.pdf

Decoding uses the DualFlow pipeline (converted SD-1.5 weights via
--sd_checkpoint_dir / --controlnet_checkpoint when available; random
weights otherwise — the sweep machinery itself is what this script wires).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_root", required=True,
                    help="dir of {video}/frames[/Flow,/Flow_b]")
    ap.add_argument("--out", required=True)
    ap.add_argument("--gops", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--modes", nargs="+",
                    default=["none", "sparse", "dense"])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--cond_scale", type=float, default=1.35)
    ap.add_argument("--intra_quality", type=int, default=30)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--max_frames", type=int, default=96)
    ap.add_argument("--cn_interval", type=int, default=1)
    ap.add_argument("--enc_interval", type=int, default=1)
    ap.add_argument("--sd_checkpoint_dir", default="",
                    help="torch-layout SD-1.5 root (unet/vae/text_encoder"
                         "/controlnet) -> converted flax weights")
    ap.add_argument("--controlnet_checkpoint", default="",
                    help="DualFlowControlNet safetensors overriding the "
                         "controlnet/ subfolder")
    ap.add_argument("--aux_checkpoint_dir", default="",
                    help="root of lpips/ i3d/ cmp/ inception/ torch "
                         "checkpoints; enables LPIPS/FVD/FID metrics and "
                         "CMP sparse-flow densification")
    ap.add_argument("--prompt", default="a high quality video frame")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--distilled_checkpoint", default="",
                    help="orbax run dir from scripts/train_distill.py: "
                         "sweep with the consistency student's EMA "
                         "weights in --student_steps evaluations, no CFG "
                         "(sampling/distilled.py) — compare its RD curve "
                         "to the teacher's")
    ap.add_argument("--student_steps", type=int, default=4)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from diffcodec_tpu.codec.gop import gop_schedule
    from diffcodec_tpu.codec.runner import decode_video, encode_video
    from diffcodec_tpu.config import CodecConfig
    from diffcodec_tpu.eval.codec_eval import load_frames
    from diffcodec_tpu.eval.metrics import calculate_metrics_batch
    from diffcodec_tpu.eval.plots import plot_rd_curves
    from diffcodec_tpu.utils.flo_io import read_flo
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_codec import _build_pipeline

    pipe, cfgs = _build_pipeline(args)
    unet_cfg = cfgs["unet"]
    videos = sorted(d for d in os.listdir(args.dataset_root)
                    if os.path.isdir(os.path.join(args.dataset_root, d)))
    if not videos:
        raise SystemExit(f"no videos under {args.dataset_root}")

    params_cache = {}
    loaded_sd = {}
    prompt_embeds = None
    if args.sd_checkpoint_dir:
        from diffcodec_tpu.config import CLIPTextConfig
        from diffcodec_tpu.models.clip_text import CLIPTextEncoder
        from diffcodec_tpu.models.weights import load_sd_checkpoint_dir
        from diffcodec_tpu.utils.tokenizer import default_tokenizer

        clip_cfg = CLIPTextConfig() if not args.tiny else \
            CLIPTextConfig.tiny()
        text_encoder = CLIPTextEncoder(clip_cfg, dtype=jnp.bfloat16)
        z = jnp.zeros
        text_template = text_encoder.init(
            jax.random.PRNGKey(4), z((1, clip_cfg.max_length), jnp.int32))
        Ht = 64  # converted conv params are resolution-independent
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        L, D = 8, unet_cfg.cross_attention_dim
        templates = {
            "unet": pipe.unet.init(k1, z((1, Ht // 8, Ht // 8, 4)),
                                   z((1,), jnp.int32), z((1, L, D))),
            "controlnet": pipe.controlnet.init(
                k2, z((1, Ht // 8, Ht // 8, 4)), z((1,), jnp.int32),
                z((1, L, D)), z((1, Ht, Ht, 6)), z((1, Ht, Ht, 4))),
            "vae": pipe.vae.init(k3, z((1, 64, 64, 3))),
            "text": text_template,
        }
        loaded_sd = load_sd_checkpoint_dir(
            args.sd_checkpoint_dir, templates=templates,
            configs={"unet": unet_cfg, "controlnet": cfgs["controlnet"],
                     "vae": cfgs["vae"], "text": clip_cfg},
            controlnet_path=args.controlnet_checkpoint or None)
        tokenizer = default_tokenizer(clip_cfg.max_length)
        prompt_embeds = pipe.encode_prompt(
            text_encoder, loaded_sd["text"], tokenizer, [args.prompt],
            [args.negative_prompt])

    # aux nets: LPIPS / FVD(I3D) / FID(InceptionV3-64) metric gates and the
    # CMP densifier for 'sparse' flow mode (test_utils.py:27-82 metric set)
    lpips_fn = fid_fn = fvd_fn = densify_fn = None
    if args.aux_checkpoint_dir:
        from diffcodec_tpu.codec.runner import make_cmp_densifier
        from diffcodec_tpu.eval.frechet import make_i3d_feature_fn
        from diffcodec_tpu.eval.inception import make_fid64_feature_fn
        from diffcodec_tpu.models.cmp import CMP
        from diffcodec_tpu.models.weights import load_aux_checkpoints
        from diffcodec_tpu.train.lpips import LPIPS

        aux = load_aux_checkpoints(args.aux_checkpoint_dir, strict=False)
        if "lpips" in aux:
            lp = LPIPS()
            lp_apply = jax.jit(lambda a, b: lp.apply(aux["lpips"], a, b))
            lpips_fn = lambda q, o: lp_apply(jnp.asarray(q, jnp.float32),
                                             jnp.asarray(o, jnp.float32))
        if "inception" in aux:
            fid_fn = make_fid64_feature_fn(aux["inception"])
        if "i3d" in aux:
            fvd_fn = make_i3d_feature_fn(aux["i3d"])
        if "cmp" in aux:
            densify_fn = make_cmp_densifier(CMP(), aux["cmp"])
        print(f"aux checkpoints loaded: {sorted(aux)}")

    student_ema, dpipe = None, None
    if args.distilled_checkpoint:
        from diffcodec_tpu.config import DistillConfig, TrainConfig
        from diffcodec_tpu.sampling.distilled import DistilledPipeline
        from diffcodec_tpu.train.checkpoint import restore_checkpoint
        from diffcodec_tpu.train.distill import DistillState
        from diffcodec_tpu.train.trainer import make_optimizer

        z = jnp.zeros
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        Ht, L, D = 64, 8, unet_cfg.cross_attention_dim
        templ = {
            "unet": pipe.unet.init(k1, z((1, Ht // 8, Ht // 8, 4)),
                                   z((1,), jnp.int32), z((1, L, D))),
            "controlnet": pipe.controlnet.init(
                k2, z((1, Ht // 8, Ht // 8, 4)), z((1,), jnp.int32),
                z((1, L, D)), z((1, Ht, Ht, 6)), z((1, Ht, Ht, 4))),
        }
        restored, sstep = restore_checkpoint(
            args.distilled_checkpoint,
            DistillState.create(templ, make_optimizer(TrainConfig())))
        if restored is None:
            raise SystemExit(
                f"no checkpoints under {args.distilled_checkpoint}")
        student_ema = restored.ema_params
        dpipe = DistilledPipeline(
            unet=pipe.unet, controlnet=pipe.controlnet, vae=pipe.vae,
            schedule=pipe.schedule,
            config=DistillConfig(num_student_steps=args.student_steps,
                                 guidance_scale=args.guidance,
                                 controlnet_conditioning_scale=
                                 args.cond_scale))
        print(f"sweeping with distilled student (step {sstep}, "
              f"K={args.student_steps})")

    def get_params(H, W):
        if (H, W) not in params_cache:
            z = jnp.zeros
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
            L, D = 77, unet_cfg.cross_attention_dim
            params = {
                "unet": pipe.unet.init(k1, z((1, H // 8, W // 8, 4)),
                                       z((1,), jnp.int32), z((1, L, D))),
                "controlnet": pipe.controlnet.init(
                    k2, z((1, H // 8, W // 8, 4)), z((1,), jnp.int32),
                    z((1, L, D)), z((1, H, W, 6)), z((1, H, W, 4))),
                "vae": pipe.vae.init(k3, z((1, 64, 64, 3))),
            }
            params.update({k: v for k, v in loaded_sd.items()
                           if k in params})
            if prompt_embeds is not None:
                text = jnp.asarray(prompt_embeds[0])
            else:
                text = z((1, L, D))
            params_cache[(H, W)] = (params, text)
        return params_cache[(H, W)]

    bpp_results, inter_bpp, metrics_out = {}, {}, {}
    for gop in args.gops:
        g = str(gop)
        bpp_results[g], inter_bpp[g], metrics_out[g] = {}, {}, {}
        for video in videos:
            vdir = os.path.join(args.dataset_root, video)
            frames = load_frames(os.path.join(vdir, "frames"))
            frames = frames[:args.max_frames]
            N, H, W = frames.shape[:3]
            flows_f = flows_b = None
            flow_dir = os.path.join(vdir, "Flow")
            if os.path.isdir(flow_dir):
                flows_f, flows_b = {}, {}
                for item in gop_schedule(N, gop):
                    t = item.target
                    flows_f[t] = read_flo(os.path.join(
                        vdir, "Flow", f"flow_{t:04d}.flo"))
                    flows_b[t] = read_flo(os.path.join(
                        vdir, "Flow_b", f"flow_{t:04d}.flo"))
            bpp_results[g][video] = {}
            inter_bpp[g][video] = {}
            metrics_out[g][video] = {}
            for mode in args.modes:
                if mode != "none" and flows_f is None:
                    continue
                tag = f"gop{gop}_{mode}"
                enc = encode_video(
                    frames, os.path.join(args.out, "bitstreams", video, tag),
                    CodecConfig(gop_size=gop, flow_rate_mode=mode),
                    flows_fwd=flows_f, flows_bwd=flows_b,
                    intra_quality=args.intra_quality)
                bpp_results[g][video][mode] = enc.meta["bpp"]["total"]
                inter_bpp[g][video][mode] = enc.meta["bpp"]["flow"]

                params, text = get_params(H, W)
                uncond = (jnp.asarray(prompt_embeds[1])
                          if prompt_embeds is not None else text)

                if student_ema is not None:
                    sparams = dict(params)
                    sparams["unet"] = student_ema["unet"]
                    sparams["controlnet"] = student_ema["controlnet"]

                    def sample_fn(cond, flow):
                        B = cond.shape[0]
                        t = jnp.broadcast_to(text, (B,) + text.shape[1:])
                        return dpipe.sample(sparams, jax.random.PRNGKey(0),
                                            t, jnp.asarray(cond),
                                            jnp.asarray(flow))
                else:
                    def sample_fn(cond, flow):
                        B = cond.shape[0]
                        t = jnp.broadcast_to(text, (B,) + text.shape[1:])
                        u = jnp.broadcast_to(uncond,
                                             (B,) + uncond.shape[1:])
                        return pipe.sample(params, jax.random.PRNGKey(0),
                                           t, u, jnp.asarray(cond),
                                           jnp.asarray(flow))

                decoded = decode_video(enc, sample_fn,
                                       densify_fn=densify_fn)
                inter_idx = [i for i in range(N) if i % gop != 0]
                # I3D's temporal receptive field needs a real clip length;
                # gated per-call so a 16-frame run still gets the
                # all-frames FVD even when the inter subset is shorter
                metrics_out[g][video][mode] = {
                    "all": calculate_metrics_batch(
                        frames, decoded, lpips_fn=lpips_fn, fid_fn=fid_fn,
                        fvd_fn=fvd_fn if N >= 16 else None),
                    "inter": calculate_metrics_batch(
                        frames[inter_idx], decoded[inter_idx],
                        lpips_fn=lpips_fn, fid_fn=fid_fn,
                        fvd_fn=fvd_fn if len(inter_idx) >= 16 else None),
                }
                print(f"{video} {tag}: bpp={enc.meta['bpp']['total']:.5f} "
                      f"psnr={metrics_out[g][video][mode]['all']['psnr']:.2f}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "bpp_results.json"), "w") as f:
        json.dump(bpp_results, f, indent=4)
    with open(os.path.join(args.out, "inter_bpp_results.json"), "w") as f:
        json.dump(inter_bpp, f, indent=4)
    with open(os.path.join(args.out, "metric_results.json"), "w") as f:
        json.dump(metrics_out, f, indent=4)

    # RD curves: mean over videos, one point per (gop, mode)
    for metric in ("psnr", "ms_ssim"):
        pts = []
        for g in bpp_results:
            for mode in args.modes:
                vals = [(bpp_results[g][v][mode],
                         metrics_out[g][v][mode]["all"][metric])
                        for v in bpp_results[g] if mode in bpp_results[g][v]]
                if vals:
                    import numpy as np
                    pts.append((float(np.mean([x[0] for x in vals])),
                                float(np.mean([x[1] for x in vals]))))
        if pts:
            plot_rd_curves({"Ours": pts}, metric,
                           os.path.join(args.out, f"rd_{metric}.pdf"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
