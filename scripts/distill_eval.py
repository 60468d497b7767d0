#!/usr/bin/env python
"""Quality gate for a distilled student: K-step student vs 30-step teacher.

The distillation quality question — "how close is the K-step consistency
student (train/distill.py) to the 30-step CFG teacher it distilled from?"
— is answered here the same way scripts/approx_drift.py answers it for
the caching knobs: decode the SAME conditioning from fixed seeds through
both paths and record

  * pixel PSNR between student and teacher outputs (mapped to [0,1])
  * max abs pixel delta
  * per-K curve (K = 1, 2, 4, 8) so the step/quality tradeoff is explicit

Run it when a trained student lands:

  python scripts/distill_eval.py \
      --distilled_checkpoint runs/distill \
      [--sd_checkpoint_dir ckpts/sd15 --controlnet_checkpoint ckpts/cn.bin]

Without --distilled_checkpoint it uses the fixed-seed random init for
BOTH teacher and student (warm-start state, i.e. an UNdistilled student):
the resulting numbers bound the *mechanical* gap of the K-step sampler
machinery, and double as a repo-checkout-reproducible smoke of this gate
(the weights-readiness pattern of tests/test_weights_drill.py).

Writes artifacts/distill_eval.json.
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp


def psnr01(a, b):
    mse = float(jnp.mean((a - b) ** 2)) / 4.0  # [-1,1] -> [0,1] scale
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--distilled_checkpoint", default="",
                    help="orbax run dir from scripts/train_distill.py "
                         "(EMA params); empty = undistilled warm start")
    ap.add_argument("--sd_checkpoint_dir", default="")
    ap.add_argument("--controlnet_checkpoint", default="")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30,
                    help="teacher UniPC steps")
    ap.add_argument("--k_values", default="1,2,4,8")
    ap.add_argument("--small", action="store_true",
                    help="tiny models (harness smoke)")
    ap.add_argument("--out", default=os.path.join(ROOT, "artifacts",
                                                  "distill_eval.json"))
    args = ap.parse_args(argv)

    from bench import build, init_params
    from diffcodec_tpu.config import DistillConfig, SamplerConfig
    from diffcodec_tpu.sampling.distilled import DistilledPipeline
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline

    dtype = jnp.bfloat16
    B, H = args.batch, (128 if args.small else args.height)
    unet_cfg, unet, controlnet, vae, schedule = build(args.small, dtype)
    params = init_params(unet_cfg, unet, controlnet, vae, H, dtype)

    if args.sd_checkpoint_dir:
        from diffcodec_tpu.models.weights import load_sd_checkpoint_dir
        from diffcodec_tpu.config import (ControlNetConfig, UNetConfig,
                                          VAEConfig)
        loaded = load_sd_checkpoint_dir(
            args.sd_checkpoint_dir,
            templates={k: params[k] for k in ("unet", "controlnet", "vae")},
            configs={"unet": unet_cfg,
                     "controlnet": ControlNetConfig(unet=unet_cfg),
                     "vae": VAEConfig()},
            controlnet_path=args.controlnet_checkpoint or None)
        params.update({k: v for k, v in loaded.items() if k in params})

    student = {"unet": params["unet"], "controlnet": params["controlnet"]}
    student_step = 0
    if args.distilled_checkpoint:
        from diffcodec_tpu.config import TrainConfig
        from diffcodec_tpu.train.checkpoint import restore_checkpoint
        from diffcodec_tpu.train.distill import DistillState
        from diffcodec_tpu.train.trainer import make_optimizer
        template = DistillState.create(dict(student),
                                       make_optimizer(TrainConfig()))
        restored, student_step = restore_checkpoint(
            args.distilled_checkpoint, template)
        if restored is None:
            raise SystemExit(f"no checkpoints in "
                             f"{args.distilled_checkpoint}")
        student = {"unet": restored.ema_params["unet"],
                   "controlnet": restored.ema_params["controlnet"]}

    L, D = 77, unet_cfg.cross_attention_dim
    text = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), dtype) * 0.02
    uncond = jnp.zeros((B, L, D), dtype)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (B, H, H, 6),
                              dtype=jnp.float32).astype(dtype)
    flow = (jax.random.normal(jax.random.PRNGKey(3), (B, H, H, 4)) *
            4.0).astype(dtype)

    teacher_pipe = DualFlowPipeline(
        unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
        sampler=SamplerConfig(num_inference_steps=args.steps,
                              guidance_scale=3.5,
                              controlnet_conditioning_scale=1.35,
                              freeu=True))
    ref = jax.jit(teacher_pipe.sample)(params, jax.random.PRNGKey(10),
                                       text, uncond, cond, flow)
    ref = np.asarray(ref, np.float32)

    results = {"student_checkpoint_step": int(student_step),
               "teacher_steps": args.steps, "height": H, "batch": B,
               "distilled": bool(args.distilled_checkpoint), "per_k": {}}
    sparams = dict(student)
    sparams["vae"] = params["vae"]
    for K in [int(k) for k in args.k_values.split(",")]:
        dpipe = DistilledPipeline(
            unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
            config=DistillConfig(num_student_steps=K))
        out = dpipe.jit_sample()(sparams, jax.random.PRNGKey(10), text,
                                 cond, flow)
        out = np.asarray(out, np.float32)
        rec = {"psnr_vs_teacher_db": round(psnr01(jnp.asarray(out),
                                                  jnp.asarray(ref)), 3),
               "max_abs_pixel_delta": round(float(np.abs(out - ref).max()),
                                            4)}
        results["per_k"][f"K{K}"] = rec
        print(f"K={K}: {rec}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
