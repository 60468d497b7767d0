"""Training-step throughput at the reference operating point.

Times the full DualFlowControlNet training step (VAE encode, frozen-UNet
forward, ControlNet forward/backward, Adam update) at 512px on one chip.
Measured 2026-08-18 on v5e: 501 ms/step at batch 4 = 8.0 samples/s/chip
with the original einsum-attention dispatch; **387 ms = 10.34 samples/s**
after the batch-aware flash dispatch (Attention 'auto': B*H <= 64 at
L >= 2048 takes the Pallas flash kernel — the training batch was paying a
flat ~6.9 ms/block materialized-logits floor, artifacts/profile_train.json);
**354 ms = 11.29 samples/s** with DIFFCODEC_FUSED_SILU_CONV=1 on top (the
fused kernel's custom_vjp keeps the backward on the XLA reference
gradient — losses agree to bf16 rounding).  Batch 8 amortizes the
remaining small-batch floors further: **561 ms = 14.27 samples/s/chip**
(TB_BATCH=8; batch 12 no longer compiles on one chip — HBM).  FLOPs grounding:
3.93 TF/sample => 22.5% of spec peak at 354 ms (was 15.7% at 501); see
BASELINE.md "Training throughput derivation".

2026-08-18 later session, with the widened fused-conv gates: batch 8 =
**550 ms = 14.55 samples/s/chip** (14.77 with TB_LOWP=1 — less moment
traffic).  Batch >8 measured as a dead end on ONE chip, recorded so
nobody retries it blind:
  * b16 remat:        OOM 17.79/15.75G (remat halves activations but the
    CN+UNet recompute would add ~350 ms anyway — a predictable NET LOSS
    at this MFU; remat pays only where batch scaling is superlinear or
    under multichip fsdp, which is why the flag stays).
  * b12 remat:        OOM 20.55G — XLA picks a WORSE schedule than b16.
  * b12 lowp:         OOM 18.64G.
  * b16 remat+lowp:   OOM 17.73G — bf16 moments cut RESIDENT state by
    1.4 GB but not the PEAK: the Adam update casts moments to f32
    transiently, and XLA's buffer assignment keeps whole-tree f32
    copies live at the peak point.

2026-08-19 (round 4), with the measured splat dispatch (ops/softsplat.py
_dispatch_tpu routing the extractor shapes to the linear-cost XLA
scatter-add; the old one-hot forms were quadratic in pixels): batch 8 =
**430 ms = 18.61 samples/s/chip** fused, **421-422 ms = 18.95-18.99**
with TB_LOWP=1 on top (~38% MFU at 3.93 TF/sample).  The batch>8 dead
end was RETRIED with the scatter splat and stands: b12, b16, b12+lowp
all fail to compile; b16 remat+lowp OOMs at 17.65G vs 15.75G HBM (the
splat fix shrank extractor temps but the binding constraint is the
Adam-update transient f32 tree copies, unchanged).  Single-chip batch 8
remains the frontier; larger batches are a multichip-fsdp job.

With the latent-moments cache on top (TB_LATCACHE=1 — the step skips the
frozen VAE encoder entirely, train/latent_cache.py): batch 8 =
**354 ms = 22.63 samples/s/chip** (fused+lowp; same loss at print
precision).  Requires ColorJitter off, so it is an opt-in operating
point, not the parity default.

2026-08-21 (round 5), chunked-Adam retry of batch>8 (VERDICT r04 #4 —
donate_argnums was already on the step; TB_CHUNKS serializes the Adam
update so whole-tree f32 moment transients are never simultaneously
live, equality-tested in tests/test_train_sharding.py):
  * b12 lowp+chunks8:  XLA compile still running at the 900 s kill on
    this 1-core box — no result obtainable here.
  * b16 lowp+chunks8:  compile-time OOM 17.63G/15.75G, and the
    allocation table now names a DIFFERENT binding constraint than the
    round-4 attribution: the ControlNet-trunk einsum self-attention's
    backward residuals — f32[16,8,4096,4096] logits (8.00G) + bf16
    probs (4.00G).  Chunking DID retire the Adam-transient peak; the
    next wall is attention activations, which the inference-tuned
    'auto' dispatch materializes at B*heads > 64 (batch<=8 trains on
    the bounded-memory flash kernel already).
  * b16 lowp+chunks8 + DIFFCODEC_LONG_ATTN_IMPL=flash (the attention
    fix, models/layers.py trace-time override): compile exceeded a
    1,200 s budget on this box — the candidate configuration for any
    multi-core host, unresolvable here.  Untested variant: flash
    without chunks (the barrier chain may itself be a compile-time
    hazard at b16 scale).
Single-chip batch 8 (18.6-19.0 samples/s, 22.6 with TB_LATCACHE=1)
remains the measured frontier; larger batches stay a multichip-fsdp
job.

Usage: python scripts/bench_train.py   (TB_BATCH=n to vary the batch,
TB_REMAT=1 for gradient checkpointing, TB_LOWP=1 for bf16 Adam
moments, TB_LATCACHE=1 for precomputed latent moments)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from diffcodec_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp

from diffcodec_tpu.config import (ControlNetConfig, MeshConfig,
                                  SchedulerConfig, TrainConfig, UNetConfig,
                                  VAEConfig)
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.parallel.mesh import make_mesh, shard_batch
from diffcodec_tpu.sampling.schedulers import NoiseSchedule
from diffcodec_tpu.train.trainer import (ControlNetTrainer, TrainState,
                                         make_optimizer)

B = int(os.environ.get("TB_BATCH", "4"))
REMAT = os.environ.get("TB_REMAT") == "1"
LOWP = os.environ.get("TB_LOWP") == "1"
CHUNKS = int(os.environ.get("TB_CHUNKS", "0"))  # sequential Adam groups
H = 512
unet = UNet2DConditionModel(UNetConfig(), dtype=jnp.bfloat16)
cn = DualFlowControlNet(ControlNetConfig(), dtype=jnp.bfloat16)
vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
schedule = NoiseSchedule.create(SchedulerConfig())
cfg = TrainConfig(learning_rate=1e-5, lr_warmup_steps=0, max_train_steps=100,
                  remat=REMAT, lowp_adam_moments=LOWP,
                  adam_update_chunks=CHUNKS)
mesh = make_mesh(MeshConfig(), devices=jax.devices()[:1])

rng = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(rng, 3)
h = H // 8
z = jnp.zeros
L, D = 77, 768
cn_params = cn.init(k1, z((1, h, h, 4)), z((1,), jnp.int32), z((1, L, D)),
                    z((1, H, H, 6)), z((1, H, H, 4)))
frozen = {"unet": unet.init(k2, z((1, h, h, 4)), z((1,), jnp.int32),
                            z((1, L, D))),
          "vae": vae.init(k3, z((1, 64, 64, 3)))}
frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, frozen)
batch = {
    "image": jax.random.uniform(k1, (B, H, H, 3)) * 2 - 1,
    "cond": jax.random.uniform(k2, (B, H, H, 6)),
    "flow": jax.random.normal(k3, (B, H, H, 4)) * 4.0,
    "text_embeds": jax.random.normal(k1, (B, L, D)) * 0.02,
}
if os.environ.get("TB_LATCACHE") == "1":
    # precomputed latent moments (train/latent_cache.py): the step skips
    # the frozen-VAE encoder entirely
    mean, logvar = vae.apply(frozen["vae"], batch["image"].astype(
        jnp.bfloat16), method=vae.encode)
    batch["latent_moments"] = jnp.concatenate([mean, logvar], -1).astype(
        jnp.float32)
trainer = ControlNetTrainer(unet=unet, controlnet=cn, vae=vae,
                            schedule=schedule, config=cfg)
state = trainer.shard_state(mesh, TrainState.create(cn_params,
                                                    make_optimizer(cfg)))
step = trainer.jit_train_step(mesh)
sb = shard_batch(mesh, batch)
t0 = time.time()
state, m = step(state, frozen, sb, jax.random.PRNGKey(1))
l = float(m["loss_mse"]); print(f"compile+first {time.time()-t0:.1f}s loss {l:.4f}")
times = []
for i in range(5):
    t1 = time.time()
    state, m = step(state, frozen, sb, jax.random.PRNGKey(2 + i))
    l = float(m["loss_mse"])
    times.append(time.time() - t1)
best = min(times)
print(f"train step: {best*1e3:.0f} ms/step batch={B} -> "
      f"{B/best:.2f} samples/s/chip  times={[round(t,3) for t in times]}")
