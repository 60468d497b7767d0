#!/usr/bin/env python
"""Train the standalone residual pixel DDPM.

Parity target: `residual_train.py` — small UNet2DModel (64,128,128,256)
on warp residuals, 500-step squaredcos_cap_v2 DDPM, AdamW 4e-4, 30 epochs;
the warped/residual pairs come from the same transform as
`controlnet/residual_utils.py` (here `train.residue.make_residue_batch`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index_file", required=True)
    p.add_argument("--caption_file", default="/dev/null")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=4e-4)
    p.add_argument("--num_epochs", type=int, default=30)
    p.add_argument("--num_train_timesteps", type=int, default=500)
    p.add_argument("--checkpointing_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffcodec_tpu.config import SchedulerConfig
    from diffcodec_tpu.models.unet2d import UNet2DModel
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.train.checkpoint import save_checkpoint
    from diffcodec_tpu.train.dataset import UniDataset
    from diffcodec_tpu.train.residue import make_residue_batch
    from diffcodec_tpu.utils.jax_cache import enable_persistent_cache
    from diffcodec_tpu.utils.logging import MetricsLogger, create_logger

    enable_persistent_cache()
    logger = create_logger("residual_train")
    schedule = NoiseSchedule.create(SchedulerConfig(
        num_train_timesteps=args.num_train_timesteps,
        beta_schedule="squaredcos_cap_v2", beta_start=0.0001,
        beta_end=0.02))
    unet = UNet2DModel()
    rng = jax.random.PRNGKey(args.seed)
    params = unet.init(rng, jnp.zeros((1, args.resolution, args.resolution,
                                       3)), jnp.zeros((1,), jnp.int32))
    tx = optax.adamw(args.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, residual, rng):
        rng_n, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_n, residual.shape)
        t = jax.random.randint(rng_t, (residual.shape[0],), 0,
                               schedule.cfg.num_train_timesteps)
        noisy = schedule.add_noise(residual, noise, t)

        def loss_fn(p):
            pred = unet.apply(p, noisy, t)
            return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    dataset = UniDataset(args.caption_file, args.index_file,
                         resolution=args.resolution, seed=args.seed)
    mlog = MetricsLogger(os.path.join(args.output_dir, "tb"))
    step = 0
    for epoch in range(args.num_epochs):
        for batch in dataset.iter_batches(args.train_batch_size):
            batch.pop("text")
            rb = make_residue_batch({k: jnp.asarray(v)
                                     for k, v in batch.items()})
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state,
                                                 rb["residual"], sub)
            step += 1
            if step % 10 == 0:
                mlog.log({"loss": float(loss), "epoch": epoch}, step)
            if step % args.checkpointing_steps == 0:
                save_checkpoint(args.output_dir, step,
                                {"params": jax.device_get(params)})
    save_checkpoint(args.output_dir, step,
                    {"params": jax.device_get(params)})
    logger.info("done: %d steps", step)


if __name__ == "__main__":
    main()
