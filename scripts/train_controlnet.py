#!/usr/bin/env python
"""Train the DualFlowControlNet (or ResControlNet) on TPU.

CLI parity with the reference harness (`train_controlnet.py:320-680` /
`train_rescontrolnet.py`, launched via `train_control.sh`) for the flags
that matter; the accelerate/DeepSpeed machinery is replaced by the
data x fsdp mesh (see diffcodec_tpu/parallel).

Example:
  python scripts/train_controlnet.py \
      --index_file data/index.txt --caption_file data/captions.txt \
      --output_dir runs/dualflow --resolution 512 \
      --train_batch_size 8 --learning_rate 1e-5 --max_train_steps 100000 \
      --perceptual_weight 0.01 --edge_weight 0.05 \
      --checkpointing_steps 500 --checkpoints_total_limit 5 \
      --resume_from_checkpoint latest --fsdp 1
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
    p.add_argument("--report_to", default="tensorboard",
                   choices=["tensorboard", "wandb", "all"],
                   help="scalar sinks (train_controlnet.py:519-523); "
                        "wandb degrades to a logged no-op when the "
                        "package is unavailable")
    p.add_argument("--tracker_project_name", default="diffcodec_tpu",
                   help="wandb project (reference --tracker_project_name)")
    p.add_argument("--caption_file", default="")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--dataloader_drop_text_prob", type=float, default=0.3)
    p.add_argument("--dataloader_num_workers", type=int, default=4,
                   help="prefetch worker threads (0 = synchronous), the "
                        "reference's DataLoader num_workers role")
    # model
    p.add_argument("--model_variant", choices=["dualflow", "res"],
                   default="dualflow")
    p.add_argument("--pretrained_checkpoint", default="",
                   help="torch state dict (safetensors/.bin) to warm-start "
                        "the controlnet from (shape-filtered)")
    p.add_argument("--sd_checkpoint_dir", default="",
                   help="dir with SD-1.5 torch state dicts (vae/unet/text)")
    # optimization (train_controlnet.py flag names)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--max_train_steps", type=int, default=100000)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat the ControlNet+UNet forwards in backward "
                        "(reference train_controlnet.py:421)")
    p.add_argument("--lowp_adam", action="store_true",
                   help="bf16 Adam moments — the --use_8bit_adam analogue "
                        "(reference train_controlnet.py:469)")
    p.add_argument("--adam_update_chunks", type=int, default=0,
                   help="serialize the Adam update over N leaf groups "
                        "(bounds the f32 moment-transient peak to "
                        "~tree/N; see TrainConfig.adam_update_chunks)")
    p.add_argument("--long_attn_impl", default="",
                   choices=["", "einsum", "qchunk", "flash", "chunked"],
                   help="override the long self-attention impl for every "
                        "'auto' Attention (trace-time env "
                        "DIFFCODEC_LONG_ATTN_IMPL).  'flash' bounds the "
                        "train-step attention memory: the einsum branch "
                        "saves 12 GB of logits+probs for backward at "
                        "batch 16 (scripts/bench_train.py OOM table)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--perceptual_weight", type=float, default=0.0)
    p.add_argument("--lpips_checkpoint", default="",
                   help="torch lpips-alex state dict for the perceptual "
                        "loss (random init if absent)")
    p.add_argument("--edge_weight", type=float, default=0.0)
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["no", "bf16"])
    p.add_argument("--seed", type=int, default=0)
    # checkpointing
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default="",
                   help="'latest' or a step number")
    # validation
    p.add_argument("--validation_steps", type=int, default=0)
    p.add_argument("--validation_index_file", default="")
    # parallelism
    p.add_argument("--fsdp", type=int, default=1,
                   help="fsdp axis size (ZeRO-style sharding degree)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--latent_cache_dir", default="",
                   help="precompute frozen-VAE latent moments here (once) "
                        "and skip the encoder in every train step — "
                        "same math given the same rng, ~18%% faster at "
                        "batch 8 (train/latent_cache.py).  Disables "
                        "ColorJitter (cached pixels must be the pixels "
                        "trained on); dualflow variant only.")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (harness smoke tests)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffcodec_tpu.config import (CLIPTextConfig, ControlNetConfig,
                                      MeshConfig, SchedulerConfig,
                                      TrainConfig, UNetConfig, VAEConfig)
    from diffcodec_tpu.models.clip_text import CLIPTextEncoder
    from diffcodec_tpu.models.controlnet import (DualFlowControlNet,
                                                 ResControlNet)
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.parallel.mesh import make_mesh, shard_batch
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.train.checkpoint import (restore_checkpoint,
                                                save_checkpoint,
                                                warm_start_filter)
    from diffcodec_tpu.train.dataset import UniDataset
    from diffcodec_tpu.train.residue import make_residue_batch
    from diffcodec_tpu.train.trainer import (ControlNetTrainer, TrainState,
                                             make_optimizer)
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache
    from diffcodec_tpu.utils.logging import (MetricsLogger, StepTimer,
                                             create_logger)
    from diffcodec_tpu.utils.tokenizer import default_tokenizer

    enable_persistent_cache()
    logger = create_logger("train")
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
    if args.model_variant == "dualflow":
        controlnet = DualFlowControlNet(cn_cfg, dtype=dtype)
    else:
        controlnet = ResControlNet(cn_cfg, dtype=dtype)

    rng = jax.random.PRNGKey(args.seed)
    B, H = args.train_batch_size, args.resolution
    h = H // 8
    z = jnp.zeros
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    logger.info("initialising models (SD-1.5 scale)")
    init_args = [z((1, h, h, 4)), z((1,), jnp.int32),
                 z((1, clip_cfg.max_length, unet_cfg.cross_attention_dim)),
                 z((1, H, H, 6)), z((1, H, H, 4))]
    if args.model_variant == "res":
        init_args.append(z((1, H, H, 3)))
    cn_params = controlnet.init(k1, *init_args)
    frozen = {
        "unet": unet.init(k2, init_args[0], init_args[1], init_args[2]),
        "vae": vae.init(k3, z((1, 64, 64, 3))),
        "text": text_encoder.init(k4, z((1, clip_cfg.max_length),
                                        jnp.int32)),
    }
    lpips_model = None
    if args.perceptual_weight:
        # the perceptual loss needs the LPIPS net wired into the trainer
        # (frozen alex features + linear heads; import real weights via
        # --lpips_checkpoint, hf_import.convert_lpips_alex layout)
        from diffcodec_tpu.train.lpips import LPIPS
        lpips_model = LPIPS()
        frozen["lpips"] = lpips_model.init(
            jax.random.PRNGKey(args.seed + 7),
            z((1, 64, 64, 3)), z((1, 64, 64, 3)))
        if args.lpips_checkpoint and os.path.exists(args.lpips_checkpoint):
            from diffcodec_tpu.models import hf_import
            frozen["lpips"], _, _ = hf_import.convert_state_dict(
                hf_import.load_torch_state_dict(args.lpips_checkpoint),
                hf_import.lpips_alex_name_map(), frozen["lpips"],
                strict=False)
            logger.info("loaded LPIPS weights from %s",
                        args.lpips_checkpoint)

    # optional warm starts from torch checkpoints
    if args.sd_checkpoint_dir:
        from diffcodec_tpu.models import hf_import
        for name, model_cfg, nm_fn in (
                ("vae", vae_cfg, hf_import.vae_name_map),
                ("unet", unet_cfg, hf_import.unet_name_map),
                ("text", clip_cfg, hf_import.clip_text_name_map)):
            for ext in (".safetensors", ".bin"):
                path = os.path.join(args.sd_checkpoint_dir, name + ext)
                if os.path.exists(path):
                    sd = hf_import.load_torch_state_dict(path)
                    frozen[name], _, _ = hf_import.convert_state_dict(
                        sd, nm_fn(model_cfg), frozen[name], strict=False)
                    logger.info("loaded %s from %s", name, path)
                    break
    if args.pretrained_checkpoint and os.path.exists(
            args.pretrained_checkpoint):
        from diffcodec_tpu.models.hf_import import (controlnet_name_map,
                                                    convert_state_dict,
                                                    load_torch_state_dict)
        loaded, _, _ = convert_state_dict(
            load_torch_state_dict(args.pretrained_checkpoint),
            controlnet_name_map(cn_cfg), cn_params, strict=False)
        cn_params, copied = warm_start_filter(cn_params, loaded)
        logger.info("warm-started %d tensors", copied)

    tcfg = TrainConfig(
        learning_rate=args.learning_rate, lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps, adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2, adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon, max_grad_norm=args.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lpips_weight=args.perceptual_weight, edge_weight=args.edge_weight,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        seed=args.seed, remat=args.gradient_checkpointing,
        lowp_adam_moments=args.lowp_adam,
        adam_update_chunks=args.adam_update_chunks)
    if args.long_attn_impl:
        # read at trace time by models/layers.Attention ('auto' modules)
        os.environ["DIFFCODEC_LONG_ATTN_IMPL"] = args.long_attn_impl
    schedule = NoiseSchedule.create(SchedulerConfig())
    trainer = ControlNetTrainer(unet=unet, controlnet=controlnet, vae=vae,
                                schedule=schedule, config=tcfg,
                                lpips=lpips_model)
    mesh = make_mesh(MeshConfig(fsdp_size=args.fsdp))
    state = TrainState.create(cn_params, make_optimizer(tcfg))

    start_step = 0
    if args.resume_from_checkpoint:
        step = None if args.resume_from_checkpoint == "latest" else \
            int(args.resume_from_checkpoint)
        restored, start_step = restore_checkpoint(args.output_dir, state,
                                                  step)
        if restored is not None:
            state = restored
            logger.info("resumed from step %d", start_step)
    state = trainer.shard_state(mesh, state)
    step_fn = trainer.jit_train_step(mesh)

    dataset = UniDataset(args.caption_file or "/dev/null", args.index_file,
                         resolution=args.resolution,
                         drop_txt_prob=args.dataloader_drop_text_prob,
                         transform=not args.latent_cache_dir,
                         seed=args.seed)
    if args.latent_cache_dir:
        if args.model_variant == "res":
            raise SystemExit(
                "--latent_cache_dir is dualflow-only: the res variant's "
                "encode target (the residual) is built in-loop, after the "
                "cacheable dataset stage")
        from diffcodec_tpu.train.latent_cache import (
            LatentCachedDataset, cache_complete, precompute_latent_moments)
        if not cache_complete(args.latent_cache_dir, len(dataset)):
            logger.info("precomputing latent moments -> %s",
                        args.latent_cache_dir)
            n = precompute_latent_moments(vae, frozen["vae"], dataset,
                                          args.latent_cache_dir,
                                          batch_size=B)
            logger.info("cached %d samples", n)
        dataset = LatentCachedDataset(dataset, args.latent_cache_dir)
    tokenizer = default_tokenizer(clip_cfg.max_length)

    def embed_text(texts):
        ids = jnp.asarray(tokenizer(texts))
        return np.asarray(text_encoder.apply(frozen["text"], ids))

    metrics_logger = MetricsLogger(
        os.path.join(args.output_dir, "tb"),
        wandb_project=(args.tracker_project_name
                       if args.report_to in ("wandb", "all") else None))
    timer = StepTimer()
    step = start_step

    val_batch = None
    if args.validation_steps and args.validation_index_file:
        from diffcodec_tpu.config import SamplerConfig
        from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
        from diffcodec_tpu.train.validation import run_validation
        val_ds = UniDataset(args.caption_file or "/dev/null",
                            args.validation_index_file,
                            resolution=args.resolution, drop_txt_prob=0.0,
                            transform=False, seed=args.seed)
        val_batch = next(val_ds.iter_batches(
            min(args.train_batch_size, len(val_ds)),
            text_encoder=embed_text, shuffle=False))
        val_pipe = DualFlowPipeline(
            unet=unet, controlnet=controlnet, vae=vae, schedule=schedule,
            sampler=SamplerConfig(num_inference_steps=20,
                                  guidance_scale=3.5))

        def do_validation(state, step):
            """In-loop sampling validation (log_validation parity,
            train_controlnet.py:84-255)."""
            params = {"unet": frozen["unet"], "vae": frozen["vae"],
                      "controlnet": jax.device_get(state.params)}
            run_validation(
                val_pipe, params,
                {k: val_batch[k] for k in ("cond", "flow", "image")},
                jnp.asarray(val_batch["text_embeds"]),
                jnp.zeros_like(jnp.asarray(val_batch["text_embeds"])),
                jax.random.PRNGKey(args.seed),
                out_dir=os.path.join(args.output_dir, "validation"),
                logger=metrics_logger, step=step)
    logger.info("training from step %d to %d", step, args.max_train_steps)
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
            if args.model_variant == "res":
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                batch = make_residue_batch(batch)
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
            if val_batch is not None and \
                    step % args.validation_steps == 0:
                do_validation(state, step)
    save_checkpoint(args.output_dir, step, jax.device_get(state),
                    total_limit=args.checkpoints_total_limit)
    logger.info("done at step %d", step)


if __name__ == "__main__":
    main()
