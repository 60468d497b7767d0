"""DiffCodec-TPU: a TPU-native perceptual video codec framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`Maryamsana-1998/DiffCodec-Controlling-Latent-Diffusion-for-Perceptual-Video-Compression`:
latent-diffusion based video compression where I-frames are stored as
compressed anchors and inter frames are *regenerated* at the decoder by a
ControlNet-conditioned SD-1.5 denoising loop, conditioned on softsplat-warped
feature pyramids built from the two neighbouring anchors and bidirectional
optical flow.

Layering (mirrors SURVEY.md section 7):
  ops/       Pallas/XLA kernels: softsplat forward warp, occlusion masks,
             flow resize, Sobel, tiling merges.
  models/    flax.linen modules (NHWC): SD-1.5 VAE / UNet / CLIP text,
             DualFlowControlNet, ResControlNet, extractors, CMP, residual UNet.
  sampling/  DDPM/UniPC schedulers + the jitted denoise pipeline (CFG, FreeU,
             hoisted control pyramid).
  train/     optax training harness, losses (MSE/LPIPS/Sobel), data pipeline,
             orbax checkpointing.
  parallel/  device mesh + sharding rules (dp / fsdp / tile-sharding).
  codec/     GOP orchestration, sparse-flow coding, bpp accounting.
  eval/      PSNR/MS-SSIM/LPIPS/FID/FVD metrics, BD-rate, RD plots.
  utils/     .flo IO, image IO, logging, profiling hooks.
"""

__version__ = "0.1.0"
