"""CMP training CLI driven by reference-format YAML experiment configs.

The reference vendors CMP's models/losses/utils for inference in the
codec (its training loop lives in the upstream CMP project; checkpoint
format `ckpt_iter_{N}.pth.tar`, `cmp/models/single_stage_model.py:48-65`).
This harness completes the training side on TPU: one config file drives
model, optimizer, schedule, sparse-sampling and cadence — the same YAML
files under `cmp/experiments/` run unchanged (`train/cmp_config.py`).

Data: `--synthetic N` trains on generated (image, dense flow) pairs with
sparse guidance sampled by the config's `sample_strategy`/`nms_ks`/
`sample_bg_ratio` knobs through `codec.sparse_flow.flow_sampler` — the
smoke/drill mode for this image.  Real data plugs in through
`--data_npz`, a .npz with arrays `images` [N,H,W,3] uint8 and `flows`
[N,H,W,2] float32 (produced offline from the config's train_source
lists).

Checkpoints: orbax `checkpoint-{iter}` dirs with rotation +
`--resume latest` (the repo-wide scheme, `train/checkpoint.py`).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from diffcodec_tpu.codec.sparse_flow import flow_sampler
from diffcodec_tpu.train.checkpoint import (restore_checkpoint,
                                            save_checkpoint)
from diffcodec_tpu.train.cmp_config import (build_cmp_model,
                                            build_cmp_optimizer,
                                            load_cmp_config)
from diffcodec_tpu.train.cmp_train import (CMPTrainer,
                                           distributed_given_iteration_indices)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True,
                   help="reference-format CMP experiment YAML")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N generated samples (smoke/drill mode)")
    p.add_argument("--data_npz", default=None,
                   help=".npz with images [N,H,W,3] u8, flows [N,H,W,2] f32")
    p.add_argument("--total_iter", type=int, default=None,
                   help="override the config's model.total_iter")
    p.add_argument("--crop", type=int, default=None,
                   help="override the config's data.crop_size (square)")
    p.add_argument("--resume", default=None,
                   help="'latest' or a checkpoint step to resume from")
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _synthetic_bank(n, crop, rng):
    imgs = rng.uniform(-1, 1, (n, crop, crop, 3)).astype(np.float32)
    # smooth dense flows: random affine field per sample
    yy, xx = np.meshgrid(np.linspace(-1, 1, crop), np.linspace(-1, 1, crop),
                         indexing="ij")
    flows = np.empty((n, crop, crop, 2), np.float32)
    for i in range(n):
        a = rng.uniform(-3, 3, (2, 3))
        flows[i, ..., 0] = a[0, 0] * xx + a[0, 1] * yy + a[0, 2]
        flows[i, ..., 1] = a[1, 0] * xx + a[1, 1] * yy + a[1, 2]
    return imgs, flows


def _load_npz(path, crop):
    data = np.load(path)
    imgs = data["images"].astype(np.float32) / 127.5 - 1.0
    flows = data["flows"].astype(np.float32)
    assert imgs.shape[1] >= crop and imgs.shape[2] >= crop, imgs.shape
    return imgs[:, :crop, :crop], flows[:, :crop, :crop]


def main(argv=None):
    args = parse_args(argv)
    cfg = load_cmp_config(args.config)
    total_iter = args.total_iter or cfg.schedule.total_iter
    crop = args.crop or cfg.data.crop_size[0]
    save_freq = args.save_freq or cfg.trainer.save_freq
    batch = cfg.data.batch_size
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        imgs, flows = _synthetic_bank(args.synthetic, crop, rng)
    elif args.data_npz:
        imgs, flows = _load_npz(args.data_npz, crop)
    else:
        raise SystemExit("need --synthetic N or --data_npz (the config's "
                         "train_source lists are torch-dataset paths; "
                         "convert offline)")

    # sparse guidance via the config's sampling knobs (host-side numpy,
    # matching the reference dataset's per-sample CPU sampling)
    def sample_sparse(flow):
        sparse, mask = flow_sampler(
            flow, strategy=tuple(cfg.data.sample_strategy),
            bg_ratio=cfg.data.sample_bg_ratio, nms_ks=cfg.data.nms_ks,
            max_num_guide=cfg.data.max_num_guide, rng=rng)
        return np.concatenate(
            [sparse, mask[..., :2].astype(np.float32)], axis=-1)

    model = build_cmp_model(cfg)
    tx = build_cmp_optimizer(cfg)
    trainer = CMPTrainer(model=model, nbins=cfg.module.nbins,
                         fmax=float(cfg.module.fmax))

    init_img = jnp.zeros((batch, crop, crop, 3), jnp.float32)
    init_sp = jnp.zeros((batch, crop, crop, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), init_img, init_sp)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    start_iter = 0
    if args.resume:
        want = None if args.resume == "latest" else int(args.resume)
        state, step = restore_checkpoint(
            args.output_dir, {"params": params, "batch_stats": batch_stats,
                              "opt_state": opt_state}, step=want)
        if state is not None:
            params = state["params"]
            batch_stats = state["batch_stats"]
            opt_state = state["opt_state"]
            start_iter = step
            print(f"resumed from checkpoint-{step}")

    step_fn = jax.jit(lambda p, bs, o, b: trainer.train_step(p, bs, o, tx, b))

    # seed-0 global shuffle with resume, exactly the reference sampler
    order = distributed_given_iteration_indices(
        len(imgs), total_iter, batch, world_size=1, rank=0,
        last_iter=start_iter - 1)

    t0 = time.time()
    for it in range(start_iter, total_iter):
        idx = order[(it - start_iter) * batch:(it - start_iter + 1) * batch]
        b = {"image": jnp.asarray(imgs[idx]),
             "sparse": jnp.asarray(np.stack([sample_sparse(flows[i])
                                             for i in idx])),
             "flow_target": jnp.asarray(flows[idx])}
        params, batch_stats, opt_state, loss = step_fn(
            params, batch_stats, opt_state, b)
        if (it + 1) % cfg.trainer.print_freq == 0 or it + 1 == total_iter:
            print(f"iter {it + 1}/{total_iter} loss_flow={float(loss):.4f} "
                  f"({(time.time() - t0) / (it - start_iter + 1):.2f} s/it)")
        if (it + 1) % save_freq == 0 or it + 1 == total_iter:
            path = save_checkpoint(
                args.output_dir, it + 1,
                {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state})
            print("saved", path)
    print("done")


if __name__ == "__main__":
    main()
