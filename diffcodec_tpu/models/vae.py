"""SD-1.5 AutoencoderKL (VAE) in flax, NHWC.

Architecture parity with the frozen HF `AutoencoderKL` the reference loads
(`train_controlnet.py:806`): encoder downs (128,256,512,512) x2 resnets,
mid resnet-attn-resnet, 8ch moments + quant convs, decoder ups x3 resnets.
Latents are scaled by `scaling_factor` (0.18215) at the codec boundary
(`train_controlnet.py:1082`, `pipeline.py:391`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import VAEConfig
from diffcodec_tpu.models.layers import (AttentionBlock2D, Downsample2D,
                                         GroupNorm32, ResnetBlock2D,
                                         SiluConv, Upsample2D)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.base_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        for i, mult in enumerate(c.channel_mults):
            ch = c.base_channels * mult
            for j in range(c.layers_per_block):
                h = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6,
                                  dtype=self.dtype,
                                  name=f"down_{i}_resnet_{j}")(h)
            if i < len(c.channel_mults) - 1:
                # HF's VAE encoder downsample pads right/bottom only
                h = Downsample2D(ch, asymmetric_pad=True, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
        h = ResnetBlock2D(h.shape[-1], use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_resnet_0")(h)
        h = AttentionBlock2D(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(h.shape[-1], use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_resnet_1")(h)
        h = GroupNorm32(32, 1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(h)


def _out_head(h, norm, conv, qualifies: bool):
    """GN -> SiLU -> conv3x3, fused into the Pallas GN kernel when the
    shape/flag gate passes (the decoder's 512px out-head runs at 1.4 TF/s
    under XLA — pure HBM round-trip waste, artifacts/profile_vae.json)."""
    if qualifies:
        sc, sh = norm(h, return_affine=True)
        return conv(h, scale=sc, shift=sh)
    return conv(norm(h))


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        top = c.base_channels * c.channel_mults[-1]
        h = nn.Conv(top, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock2D(top, use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_resnet_0")(h)
        h = AttentionBlock2D(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(top, use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_resnet_1")(h)
        for i, mult in enumerate(reversed(c.channel_mults)):
            ch = c.base_channels * mult
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6,
                                  dtype=self.dtype,
                                  name=f"up_{i}_resnet_{j}")(h)
            if i < len(c.channel_mults) - 1:
                h = Upsample2D(ch, dtype=self.dtype,
                               name=f"up_{i}_upsample")(h)
        from diffcodec_tpu.ops.conv_pallas import (gn_silu_conv_qualifies,
                                                   head_projection_qualifies)
        norm = GroupNorm32(32, 1e-6, dtype=self.dtype, name="conv_norm_out")
        conv = SiluConv(c.in_channels, dtype=self.dtype, name="conv_out")
        return _out_head(h, norm, conv,
                         gn_silu_conv_qualifies(h, c.in_channels)
                         or head_projection_qualifies(h, c.in_channels))


class AutoencoderKL(nn.Module):
    """VAE with `encode` returning (mean, logvar) moments and `decode`."""
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar


def encode_to_latents(vae: AutoencoderKL, params, images, rng=None):
    """images [B,H,W,3] in [-1,1] -> scaled latents [B,H/8,W/8,4].

    Samples from the posterior when rng is given (training parity with
    `latent_dist.sample()`, train_controlnet.py:1081), else uses the mode.
    """
    mean, logvar = vae.apply(params, images, method=vae.encode)
    if rng is not None:
        std = jnp.exp(0.5 * logvar)
        mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * vae.cfg.scaling_factor


def decode_from_latents(vae: AutoencoderKL, params, latents):
    """Scaled latents -> images in [-1,1] (clamped by callers as needed)."""
    return vae.apply(params, latents / vae.cfg.scaling_factor,
                     method=vae.decode)
