"""Per-component FLOPs report grounding the bench baseline (BASELINE.md).

Lowers the flagship components at the 512px operating point on the CPU
backend and reads XLA's own cost analysis, then derives the reference
PyTorch A100 frame time from the same arithmetic the bench's
`vs_baseline` uses (see BASELINE.md "Throughput baseline derivation").

Reference op shapes: `pipeline.py:308-385` (denoise loop: ControlNet+UNet
x 2 for CFG per step, extractor recomputed inside ControlNet every step),
`pipeline.py:390-398` (VAE decode).

Usage: python scripts/flops_report.py  (CPU-only; prints a JSON report)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# default: CPU cost analysis.  FLOPS_BACKEND=tpu keeps the default (axon)
# backend so the heavyweight graphs (the fwd+bwd train step) compile on
# the remote TPU toolchain instead of this one-core host.  Caveat: the
# two backends' optimized HLO differs, so counts disagree by up to ~8%
# (measured: UNet fwd 788 CPU vs 863 TPU GFLOPs, VAE decode 2504 vs 2221)
# — treat cross-backend comparisons at that granularity.
if os.environ.get("FLOPS_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from diffcodec_tpu.config import ControlNetConfig, UNetConfig, VAEConfig
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.extractors import BiDirFeatureExtractor
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL

H = 512          # pixel operating point (validation.py:102-146)
STEPS = 30       # UniPC steps
CFG = 2          # classifier-free guidance doubles every model call
A100_BF16_PEAK = 312e12


def flops_of(fn, *args) -> float:
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def main():
    dtype = jnp.float32  # count FLOPs; dtype does not change the op count
    h = H // 8
    B, L, D = 1, 77, 768

    unet_cfg = UNetConfig()
    cn_cfg = ControlNetConfig(unet=unet_cfg)
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    controlnet = DualFlowControlNet(cn_cfg, dtype=dtype)
    vae = AutoencoderKL(VAEConfig(), dtype=dtype)
    extractor = BiDirFeatureExtractor(inject_channels=cn_cfg.inject_channels,
                                      dtype=dtype)

    sample = jnp.zeros((B, h, h, 4), dtype)
    t0 = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, L, D), dtype)
    cond = jnp.zeros((B, H, H, 6), dtype)
    flow = jnp.zeros((B, H, H, 4), dtype)
    z = jnp.zeros((B, h, h, 4), dtype)

    k = jax.random.PRNGKey(0)
    p_cn = controlnet.init(k, sample, t0, ctx, cond, flow)
    p_unet = unet.init(k, sample, t0, ctx)
    p_vae = vae.init(k, jnp.zeros((1, 64, 64, 3), dtype))
    p_ext = extractor.init(k, cond, flow)

    f_ext = flops_of(lambda p, c, f: extractor.apply(p, c, f),
                     p_ext, cond, flow)
    f_cn = flops_of(
        lambda p, s, t, c, cc, fc: controlnet.apply(p, s, t, c, cc, fc),
        p_cn, sample, t0, ctx, cond, flow)

    def unet_fwd(p, s, t, c):
        # residual injection sites take zeros here; their FLOPs are adds
        # already counted inside the UNet graph
        return unet.apply(p, s, t, c)

    f_unet = flops_of(unet_fwd, p_unet, sample, t0, ctx)
    f_vae_dec = flops_of(
        lambda p, zz: vae.apply(p, zz, method=AutoencoderKL.decode), p_vae, z)

    # Reference per-frame total: the torch pipeline recomputes the full
    # ControlNet (extractor included) and UNet twice per step for CFG
    # (`pipeline.py:313-372`), then one VAE decode (`pipeline.py:390`).
    ref_per_frame = STEPS * CFG * (f_cn + f_unet) + f_vae_dec
    # Our per-frame total: extractor hoisted out of the loop
    # (sampling/pipeline.py), so the loop reruns only the ControlNet trunk.
    ours_per_frame = (STEPS * CFG * (f_cn - f_ext + f_unet) + f_vae_dec +
                      CFG * f_ext)

    # ---- train step (grounds scripts/bench_train.py's samples/s) ----
    # FLOPs measured from XLA's cost analysis of the REAL jitted train
    # step: VAE encode, ControlNet fwd+bwd (param+data grads), frozen UNet
    # fwd + data-grad bwd (weight grads DCE'd away since UNet params are
    # not differentiated), Adam update.  Reference step:
    # train_controlnet.py:1040-1105 (same op set, torch autograd).
    from diffcodec_tpu.config import SchedulerConfig, TrainConfig
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule
    from diffcodec_tpu.train.trainer import (ControlNetTrainer, TrainState,
                                             make_optimizer)
    tcfg = TrainConfig(learning_rate=1e-5, lr_warmup_steps=0,
                       max_train_steps=10)
    trainer = ControlNetTrainer(unet=unet, controlnet=controlnet, vae=vae,
                                schedule=NoiseSchedule.create(
                                    SchedulerConfig()), config=tcfg)
    state = TrainState.create(p_cn, make_optimizer(tcfg))
    frozen = {"unet": p_unet, "vae": p_vae}
    batch = {"image": jnp.zeros((B, H, H, 3), dtype),
             "cond": cond, "flow": flow,
             "text_embeds": jnp.zeros((B, L, D), dtype)}
    f_train = flops_of(trainer.train_step, state, frozen, batch,
                       jax.random.PRNGKey(0))

    # measured on v5e (scripts/bench_train.py): 508 ms/step at batch 4
    v5e_step_s, v5e_batch = 0.508, 4
    v5e_flops_per_s = v5e_batch * f_train / v5e_step_s
    V5E_SPEC_PEAK = 197e12      # bf16 spec peak
    V5E_SUSTAINED = 152e12      # measured sustained matmul (BASELINE.md)

    report = {
        "gflops": {
            "extractor_512px": round(f_ext / 1e9, 1),
            "controlnet_incl_extractor": round(f_cn / 1e9, 1),
            "unet_forward_64x64": round(f_unet / 1e9, 1),
            "vae_decode_512px": round(f_vae_dec / 1e9, 1),
        },
        "per_frame_tflops": {
            "reference_pipeline": round(ref_per_frame / 1e12, 2),
            "ours_hoisted": round(ours_per_frame / 1e12, 2),
        },
        "a100_fps_estimate": {
            f"mfu_{int(mfu * 100)}pct": round(
                A100_BF16_PEAK * mfu / ref_per_frame, 3)
            for mfu in (0.075, 0.15, 0.25)
        },
        "train": {
            "step_tflops_per_sample": round(f_train / 1e12, 3),
            "v5e_measured": {
                "ms_per_step": v5e_step_s * 1e3, "batch": v5e_batch,
                "samples_per_s_chip": round(v5e_batch / v5e_step_s, 2),
                "mfu_vs_spec_197tf": round(v5e_flops_per_s / V5E_SPEC_PEAK,
                                           3),
                "mfu_vs_sustained_152tf": round(
                    v5e_flops_per_s / V5E_SUSTAINED, 3),
            },
            # reference trains this step on A100s (train_control.sh:3);
            # band of plausible torch-DDP MFUs for SD-ControlNet training
            "a100_samples_per_s_estimate": {
                f"mfu_{int(mfu * 100)}pct": round(
                    A100_BF16_PEAK * mfu / f_train, 2)
                for mfu in (0.15, 0.25, 0.35)
            },
        },
        "operating_point": {"px": H, "steps": STEPS, "cfg": CFG},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
