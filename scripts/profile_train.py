#!/usr/bin/env python
"""Per-component profile of the ControlNet training step.

The full step measured 501 ms at batch 4 (~33 TF/s = 17% MFU) while the
same networks run 96 TF/s in the decode loop; this script attributed the
gap to a flat ~6.9 ms/block materialized-logits attention floor at small
batch (einsum dispatch at L=4096), which the batch-aware flash dispatch
in models/layers.Attention now fixes: full step 387 ms, UNet fwd 108->41
ms, trunk fwd 44->18 ms.  It measures: forward and forward+backward cost
of each stage (VAE encode, extractor pyramid, ControlNet backbone, frozen
UNet, losses) measured standalone via sequential dispatches with one
device-side sync (see the in-code notes for why not the chained-fori
harness here, and the closure-vs-argument compile-helper trap).

Writes artifacts/profile_train.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, SchedulerConfig,
                                  TrainConfig, UNetConfig, VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.trainer import ControlNetTrainer, TrainState, \
    make_optimizer


def main():
    B = int(os.environ.get("TB_BATCH", "4"))
    H = 512
    h = H // 8
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(UNetConfig(), dtype=dtype)
    cn = DualFlowControlNet(ControlNetConfig(), dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    schedule = NoiseSchedule.create(SchedulerConfig())
    cfg = TrainConfig(learning_rate=1e-5, lr_warmup_steps=0,
                      max_train_steps=100)

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    z = jnp.zeros
    L, D = 77, 768
    cn_params = cn.init(k1, z((1, h, h, 4)), z((1,), jnp.int32),
                        z((1, L, D)), z((1, H, H, 6)), z((1, H, H, 4)))
    frozen = {
        "unet": unet.init(k2, z((1, h, h, 4)), z((1,), jnp.int32),
                          z((1, L, D))),
        "vae": vae.init(k3, z((1, 64, 64, 3))),
    }
    frozen = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, frozen)

    img = (jax.random.uniform(k1, (B, H, H, 3)) * 2 - 1).astype(dtype)
    cond = jax.random.uniform(k2, (B, H, H, 6)).astype(dtype)
    flow = (jax.random.normal(k3, (B, H, H, 4)) * 4.0).astype(dtype)
    text = (jax.random.normal(k1, (B, L, D)) * 0.02).astype(dtype)
    noisy = jax.random.normal(k2, (B, h, h, 4), dtype)
    t0 = jnp.zeros((B,), jnp.int32)

    results = {}

    # Timing scheme: N sequential dispatches of one jitted component with a
    # single device-side scalar sync at the end.  Program order on the
    # device stream makes the final float() a barrier over all N
    # executions; per-call outputs are real program outputs so nothing is
    # DCE'd across calls (the chained-fori_loop harness is DCE-safe too
    # but its single giant HLO reproducibly crashes the remote compile
    # helper for the SD-scale trunk fwd+bwd programs — broken pipe at
    # every retry).  Dispatch overhead is measured with a trivial program
    # and reported for reference.
    import time as _time

    def _sync(o):
        leaves = [x for x in jax.tree.leaves(o)
                  if hasattr(x, "dtype") and
                  jnp.issubdtype(x.dtype, jnp.floating)]
        return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in leaves))

    def rec(name, fn, *args, n=16):
        jfn = jax.jit(fn)
        _sync(jfn(*args))            # compile + warm
        t0 = _time.perf_counter()
        for _ in range(n):
            out = jfn(*args)
        _sync(out)
        ms = (_time.perf_counter() - t0) / n * 1e3
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)

    # ---- the full jitted train step (reference timing) ----------------
    trainer = ControlNetTrainer(unet=unet, controlnet=cn, vae=vae,
                                schedule=schedule, config=cfg)
    state = TrainState.create(cn_params, make_optimizer(cfg))
    batch = {"image": img.astype(jnp.float32), "cond": cond, "flow": flow,
             "text_embeds": text}
    # donation is load-bearing: without it the 5 GB fp32 state
    # double-buffers across the step and the chip OOMs
    step_jit = jax.jit(trainer.train_step, donate_argnums=(0,))
    st, m = step_jit(state, frozen, batch, jax.random.PRNGKey(1))
    float(m["loss_mse"])
    times = []
    for i in range(4):
        t1 = time.time()
        st, m = step_jit(st, frozen, batch, jax.random.PRNGKey(2 + i))
        float(m["loss_mse"])
        times.append(time.time() - t1)
    results["full_train_step"] = round(min(times) * 1e3, 2)
    print(f"full_train_step: {results['full_train_step']} ms", flush=True)

    # the donated step consumed the original cn_params buffers; keep the
    # updated params tree for the component profiles and free the Adam
    # moments (the weights are random either way)
    cn_params = st.params
    del st, state, m

    # ---- dispatch-overhead floor --------------------------------------
    # NB: every big tree (params, pyramid, residuals) must be an ARGUMENT
    # of the jitted fn, never a closure — closed-over arrays serialize as
    # HLO literal constants, and a 400M-param literal blob reproducibly
    # kills the remote compile helper (broken pipe on upload).
    rec("dispatch_floor_trivial_program", lambda x: x + 1.0, noisy, n=32)

    # ---- forward components -------------------------------------------
    rec("vae_encode_fwd",
        lambda vp, im: vae.apply(vp, im, method=vae.encode),
        frozen["vae"], img)

    rec("extractor_pyramid_fwd",
        lambda p, c, f: cn.apply(p, c, f, method=cn.extract_pyramid),
        cn_params, cond, flow)

    pyramid = jax.jit(
        lambda p, c, f: cn.apply(p, c, f, method=cn.extract_pyramid))(
            cn_params, cond, flow)

    rec("controlnet_backbone_fwd",
        lambda p, pyr, x: cn.apply(p, x, t0, text, pyr, 1.0,
                                   method=cn.backbone),
        cn_params, pyramid, noisy)

    down, mid = jax.jit(
        lambda p, pyr, x: cn.apply(p, x, t0, text, pyr, 1.0,
                                   method=cn.backbone))(
            cn_params, pyramid, noisy)
    down = tuple(down)
    rec("unet_fwd",
        lambda up, d, m, x: unet.apply(
            up, x, t0, text, down_block_additional_residuals=d,
            mid_block_additional_residual=m),
        frozen["unet"], down, mid, noisy)

    # ---- forward+backward components ----------------------------------
    def cn_loss(p, c, f, x):
        pyr = cn.apply(p, c, f, method=cn.extract_pyramid)
        d, m = cn.apply(p, x, t0, text, pyr, 1.0, method=cn.backbone)
        s = sum(jnp.sum(jnp.abs(r.astype(jnp.float32))) for r in d)
        return s + jnp.sum(jnp.abs(m.astype(jnp.float32)))

    rec("controlnet_full_fwdbwd", jax.grad(cn_loss, argnums=0),
        cn_params, cond, flow, noisy, n=8)

    # UNet fwd + backward THROUGH it to the residual inputs (what training
    # pays: the UNet is frozen but gradients flow through its mid/up path
    # back to the ControlNet residuals)
    def unet_loss(up, d, m, x):
        out = unet.apply(up, x, t0, text,
                         down_block_additional_residuals=d,
                         mid_block_additional_residual=m)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    rec("unet_fwd_plus_residual_bwd", jax.grad(unet_loss, argnums=(1, 2)),
        frozen["unet"], down, mid, noisy, n=8)

    out = {"batch": B, "height": H, "ms": results,
           "note": "sequential-dispatch standalone timings (final-output "
                   "device sync; subtract dispatch_floor_trivial_program "
                   "for per-call overhead); full_train_step is the jitted "
                   "ControlNetTrainer step (noise sampling, loss, Adam)"}
    path = os.path.join(ROOT, "artifacts", "profile_train.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
