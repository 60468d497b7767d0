#!/usr/bin/env python
"""Export a trained DiffCodec-TPU checkpoint to the reference torch layout.

Loads an orbax `checkpoint-N` produced by scripts/train_controlnet.py and
writes a `.safetensors` state dict with the reference DualFlowControlNet
tensor names (`flownet.py:23-47` module layout), so checkpoints interchange
with the torch pipeline (`validation.py:52-53` loads this format).

  python scripts/export_checkpoint.py --checkpoint_dir runs/dualflow \
      --out dualflow_controlnet.safetensors [--step 97000] [--tiny]

With --distilled the checkpoint dir is a scripts/train_distill.py run:
the consistency student's EMA weights export as TWO state dicts —
`<out_dir>/controlnet.safetensors` (reference DualFlowControlNet names)
and `<out_dir>/unet.safetensors` (diffusers UNet2DConditionModel names)
— so a distilled student rides the same interchange formats as the
teacher stack (the student's param trees are architecture-identical by
design, train/distill.py).

  python scripts/export_checkpoint.py --distilled \
      --checkpoint_dir runs/distill --out export_dir [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--distilled", action="store_true",
                    help="checkpoint_dir is a train_distill.py run; "
                         "export the EMA student (controlnet + unet) "
                         "into the --out directory")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file

    from diffcodec_tpu.config import ControlNetConfig, UNetConfig
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.hf_import import (controlnet_name_map,
                                                export_state_dict)
    from diffcodec_tpu.train.checkpoint import restore_checkpoint
    from diffcodec_tpu.train.trainer import TrainState, make_optimizer
    from diffcodec_tpu.config import TrainConfig

    unet_cfg = UNetConfig.tiny() if args.tiny else UNetConfig()
    cn_cfg = ControlNetConfig.tiny() if args.tiny else \
        ControlNetConfig(unet=unet_cfg)
    net = DualFlowControlNet(cn_cfg)
    H = 64 if args.tiny else 512
    h = H // 8
    z = jnp.zeros
    template = net.init(
        jax.random.PRNGKey(0), z((1, h, h, 4)), z((1,), jnp.int32),
        z((1, 3, cn_cfg.unet.cross_attention_dim)), z((1, H, H, 6)),
        z((1, H, H, 4)))

    def as_sd(tree, name_map):
        sd = export_state_dict(jax.device_get(tree), name_map)
        return {k: np.ascontiguousarray(v) for k, v in sd.items()}

    if args.distilled:
        from diffcodec_tpu.models.hf_import import unet_name_map
        from diffcodec_tpu.models.unet2d_condition import \
            UNet2DConditionModel
        from diffcodec_tpu.train.distill import DistillState

        unet = UNet2DConditionModel(unet_cfg)
        unet_template = unet.init(
            jax.random.PRNGKey(1), z((1, h, h, 4)), z((1,), jnp.int32),
            z((1, 3, unet_cfg.cross_attention_dim)))
        state = DistillState.create(
            {"unet": unet_template, "controlnet": template},
            make_optimizer(TrainConfig()))
        restored, step = restore_checkpoint(args.checkpoint_dir, state,
                                            args.step)
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
        os.makedirs(args.out, exist_ok=True)
        for name, tree, nm in (
                ("controlnet", restored.ema_params["controlnet"],
                 controlnet_name_map(cn_cfg)),
                ("unet", restored.ema_params["unet"],
                 unet_name_map(unet_cfg))):
            path = os.path.join(args.out, f"{name}.safetensors")
            sd = as_sd(tree, nm)
            save_file(sd, path)
            print(f"exported student {name} (EMA, step {step}) -> {path} "
                  f"({len(sd)} tensors)")
        return

    state = TrainState.create(template, make_optimizer(TrainConfig()))
    restored, step = restore_checkpoint(args.checkpoint_dir, state,
                                        args.step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
    sd = as_sd(restored.params, controlnet_name_map(cn_cfg))
    save_file(sd, args.out)
    print(f"exported checkpoint-{step} -> {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
