#!/usr/bin/env python
"""Consistency-distill the DualFlow decoder into a K-step student.

No reference counterpart (the reference always decodes with the 30-step
CFG UniPC loop, `pipeline.py:341-350`): this harness trains the student
of diffcodec_tpu/train/distill.py from a TRAINED teacher — the frozen
SD-1.5 stack plus a trained DualFlowControlNet — so the codec can decode
in `--num_student_steps` denoiser evaluations without CFG doubling.

Teacher inputs mirror scripts/train_controlnet.py's checkpoint plumbing:
  --sd_checkpoint_dir        torch-layout SD-1.5 dir (vae/unet/text)
  --controlnet_checkpoint    torch-layout trained ControlNet state dict

Example:
  python scripts/train_distill.py \
      --index_file data/index.txt --caption_file data/captions.txt \
      --sd_checkpoint_dir ckpts/sd15 --controlnet_checkpoint ckpts/cn.bin \
      --output_dir runs/distill --max_train_steps 20000 \
      --guidance_scale 3.5 --num_student_steps 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # data
    p.add_argument("--index_file", required=True)
    p.add_argument("--caption_file", default="")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    # teacher
    p.add_argument("--sd_checkpoint_dir", default="")
    p.add_argument("--controlnet_checkpoint", default="")
    # distillation
    p.add_argument("--num_teacher_steps", type=int, default=50)
    p.add_argument("--num_student_steps", type=int, default=4)
    p.add_argument("--guidance_scale", type=float, default=3.5)
    p.add_argument("--controlnet_conditioning_scale", type=float,
                   default=1.35)
    p.add_argument("--ema_decay", type=float, default=0.995)
    p.add_argument("--distill_loss", choices=["huber", "l2"],
                   default="huber")
    p.add_argument("--no_freeu", action="store_true")
    # optimization
    p.add_argument("--learning_rate", type=float, default=1e-6)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=20000)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--seed", type=int, default=0)
    # logging / checkpointing
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default="")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (wiring smoke test)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffcodec_tpu.config import (CLIPTextConfig, ControlNetConfig,
                                      DistillConfig, MeshConfig,
                                      SchedulerConfig, TrainConfig,
                                      UNetConfig, VAEConfig)
    from diffcodec_tpu.models.clip_text import CLIPTextEncoder
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.parallel.mesh import make_mesh, shard_batch
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.train.checkpoint import (restore_checkpoint,
                                                save_checkpoint)
    from diffcodec_tpu.train.dataset import UniDataset
    from diffcodec_tpu.train.distill import (ConsistencyDistiller,
                                             DistillState)
    from diffcodec_tpu.train.trainer import make_optimizer
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache
    from diffcodec_tpu.utils.logging import (MetricsLogger, StepTimer,
                                             create_logger)
    from diffcodec_tpu.utils.tokenizer import default_tokenizer

    enable_persistent_cache()
    logger = create_logger("distill")
    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

    if args.tiny:
        unet_cfg = UNetConfig.tiny()
        cn_cfg = ControlNetConfig.tiny()
        vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                            layers_per_block=1)
        clip_cfg = CLIPTextConfig.tiny()
    else:
        unet_cfg = UNetConfig()
        cn_cfg = ControlNetConfig(unet=unet_cfg)
        vae_cfg = VAEConfig()
        clip_cfg = CLIPTextConfig()
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text_encoder = CLIPTextEncoder(clip_cfg, dtype=dtype)
    controlnet = DualFlowControlNet(cn_cfg, dtype=dtype)

    rng = jax.random.PRNGKey(args.seed)
    B, H = args.train_batch_size, args.resolution
    h = H // 8
    z = jnp.zeros
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    logger.info("initialising teacher stack")
    cn_params = controlnet.init(
        k1, z((1, h, h, 4)), z((1,), jnp.int32),
        z((1, clip_cfg.max_length, unet_cfg.cross_attention_dim)),
        z((1, H, H, 6)), z((1, H, H, 4)))
    frozen = {
        "unet": unet.init(k2, z((1, h, h, 4)), z((1,), jnp.int32),
                          z((1, clip_cfg.max_length,
                             unet_cfg.cross_attention_dim))),
        "controlnet": cn_params,
        "vae": vae.init(k3, z((1, 64, 64, 3))),
    }
    text_params = text_encoder.init(k4, z((1, clip_cfg.max_length),
                                          jnp.int32))

    from diffcodec_tpu.models import hf_import
    if args.sd_checkpoint_dir:
        for name, model_cfg, nm_fn in (
                ("vae", vae_cfg, hf_import.vae_name_map),
                ("unet", unet_cfg, hf_import.unet_name_map)):
            for ext in (".safetensors", ".bin"):
                path = os.path.join(args.sd_checkpoint_dir, name + ext)
                if os.path.exists(path):
                    frozen[name], _, _ = hf_import.convert_state_dict(
                        hf_import.load_torch_state_dict(path),
                        nm_fn(model_cfg), frozen[name], strict=False)
                    logger.info("loaded teacher %s from %s", name, path)
                    break
        for ext in (".safetensors", ".bin"):
            path = os.path.join(args.sd_checkpoint_dir, "text" + ext)
            if os.path.exists(path):
                text_params, _, _ = hf_import.convert_state_dict(
                    hf_import.load_torch_state_dict(path),
                    hf_import.clip_text_name_map(clip_cfg), text_params,
                    strict=False)
                break
    if args.controlnet_checkpoint and os.path.exists(
            args.controlnet_checkpoint):
        frozen["controlnet"], _, _ = hf_import.convert_state_dict(
            hf_import.load_torch_state_dict(args.controlnet_checkpoint),
            hf_import.controlnet_name_map(cn_cfg), frozen["controlnet"],
            strict=False)
        logger.info("loaded teacher controlnet from %s",
                    args.controlnet_checkpoint)

    dcfg = DistillConfig(
        num_teacher_steps=args.num_teacher_steps,
        num_student_steps=args.num_student_steps,
        guidance_scale=args.guidance_scale,
        controlnet_conditioning_scale=args.controlnet_conditioning_scale,
        ema_decay=args.ema_decay, loss=args.distill_loss,
        freeu=not args.no_freeu)
    tcfg = TrainConfig(learning_rate=args.learning_rate,
                       lr_scheduler=args.lr_scheduler,
                       lr_warmup_steps=args.lr_warmup_steps,
                       max_train_steps=args.max_train_steps,
                       max_grad_norm=args.max_grad_norm,
                       adam_weight_decay=0.0, seed=args.seed)
    schedule = NoiseSchedule.create(SchedulerConfig())
    distiller = ConsistencyDistiller(unet=unet, controlnet=controlnet,
                                     vae=vae, schedule=schedule, config=dcfg)
    mesh = make_mesh(MeshConfig(fsdp_size=args.fsdp))

    # student warm-starts from the teacher (both unet + controlnet train)
    student = {"unet": jax.tree.map(jnp.copy, frozen["unet"]),
               "controlnet": jax.tree.map(jnp.copy, frozen["controlnet"])}
    state = DistillState.create(student, make_optimizer(tcfg))

    start_step = 0
    if args.resume_from_checkpoint:
        step = None if args.resume_from_checkpoint == "latest" else \
            int(args.resume_from_checkpoint)
        restored, start_step = restore_checkpoint(args.output_dir, state,
                                                  step)
        if restored is not None:
            state = restored
            logger.info("resumed from step %d", start_step)
    state = distiller.shard_state(mesh, state)
    step_fn = distiller.jit_train_step(mesh)

    dataset = UniDataset(args.caption_file or "/dev/null", args.index_file,
                         resolution=args.resolution, drop_txt_prob=0.0,
                         seed=args.seed)
    tokenizer = default_tokenizer(clip_cfg.max_length)

    def embed_text(texts):
        ids = jnp.asarray(tokenizer(texts))
        return np.asarray(text_encoder.apply(text_params, ids))

    # the CFG teacher needs the uncond embedding; constant per batch size
    uncond_row = embed_text([""])

    metrics_logger = MetricsLogger(os.path.join(args.output_dir, "tb"))
    timer = StepTimer()
    step = start_step
    logger.info("distilling from step %d to %d", step, args.max_train_steps)
    if args.dataloader_num_workers > 0:
        from diffcodec_tpu.train.prefetch import PrefetchLoader
        loader = PrefetchLoader(dataset, B,
                                num_workers=args.dataloader_num_workers,
                                seed=args.seed, text_encoder=embed_text)
        batches = loader.epoch
    else:
        batches = lambda: dataset.iter_batches(B, text_encoder=embed_text)
    while step < args.max_train_steps:
        for batch in batches():
            if step >= args.max_train_steps:
                break
            batch.pop("text")
            batch["uncond_embeds"] = np.broadcast_to(
                uncond_row, batch["text_embeds"].shape).copy()
            with timer:
                state, metrics = step_fn(state, frozen,
                                         shard_batch(mesh, batch),
                                         jax.random.PRNGKey(args.seed))
            step = int(state.step)
            if step % args.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["steps_per_sec"] = timer.steps_per_sec
                metrics_logger.log(metrics, step)
            if args.checkpointing_steps and \
                    step % args.checkpointing_steps == 0:
                save_checkpoint(args.output_dir, step,
                                jax.device_get(state),
                                total_limit=args.checkpoints_total_limit)
                logger.info("saved checkpoint-%d", step)
    save_checkpoint(args.output_dir, step, jax.device_get(state),
                    total_limit=args.checkpoints_total_limit)
    logger.info("done at step %d (decode with sampling/distilled.py "
                "DistilledPipeline using the EMA params)", step)


if __name__ == "__main__":
    main()
