"""SD-1.5 conditional UNet in flax, NHWC, with ControlNet residual injection
and FreeU.

Architecture parity with HF `UNet2DConditionModel` as frozen by the reference
(`train_controlnet.py:810-814`, used at `train_controlnet.py:1113-1122` and
`pipeline.py:358-367` with `down_block_additional_residuals` /
`mid_block_additional_residual`).  FreeU parity with the settings enabled at
`validation.py:106`.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import UNetConfig
from diffcodec_tpu.models.layers import (Downsample2D, GroupNorm32,
                                         ResnetBlock2D, TimestepEmbedding,
                                         Transformer2D, Upsample2D,
                                         timestep_embedding)


def _fourier_filter_fft(x: jnp.ndarray, threshold: int,
                        scale: float) -> jnp.ndarray:
    """Reference FFT implementation of FreeU low-frequency scaling (NHWC).

    FFT over the spatial dims; the centred [2*threshold, 2*threshold]
    low-frequency block is scaled by `scale`.  Kept as the oracle for
    `fourier_filter`, which computes the same linear operator with two
    tiny matmuls instead of FFTs in the denoise hot loop.
    """
    orig_dtype = x.dtype
    B, H, W, C = x.shape
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    crow, ccol = H // 2, W // 2
    rows = jnp.arange(H)[None, :, None, None]
    cols = jnp.arange(W)[None, None, :, None]
    in_box = ((rows >= crow - threshold) & (rows < crow + threshold) &
              (cols >= ccol - threshold) & (cols < ccol + threshold))
    mask = jnp.where(in_box, scale, 1.0)
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(orig_dtype)


@functools.lru_cache(maxsize=None)
def _box_projector(n: int, threshold: int):
    """1-D operator P = F^-1 diag(sel) F selecting the centred frequency
    box of FreeU (rows [n//2-threshold, n//2+threshold) in fftshifted
    coordinates).  Returns (Re(P), Im(P)) as numpy float32 [n, n].

    P is circulant with entries p(j-l) = (1/n) sum_{k in S} e^{2 pi i
    k (j-l)/n}; the selected set S is NOT symmetric under k -> -k (the
    shifted box is off-centre by half a bin), so P has a small imaginary
    part that the reference's `.real` projection folds in.
    """
    import numpy as np
    c = n // 2
    sel = np.zeros(n)
    sel[max(c - threshold, 0):min(c + threshold, n)] = 1.0
    sel = np.fft.ifftshift(sel)
    P = np.fft.ifft(sel[:, None] * np.fft.fft(np.eye(n), axis=0), axis=0)
    return (np.ascontiguousarray(P.real, dtype=np.float32),
            np.ascontiguousarray(P.imag, dtype=np.float32))


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """FreeU low-frequency scaling of skip features (NHWC).

    Mathematically identical to `_fourier_filter_fft` (tested to ~1e-4):
    masking a fixed frequency box is a linear map, and the box mask is
    separable, so  Re(IFFT2(mask * FFT2(x))) = x + (scale-1) *
    (Re(Pr) x Re(Pc)^T - Im(Pr) x Im(Pc)^T)  with the tiny circulant
    projectors P = F^-1 diag(box) F precomputed on the host.  Replaces
    six fp32 complex FFT pairs per denoise step with four [H,H]/[W,W]
    matmuls — FFTs are a poor fit for the MXU and were a measurable
    slice of the step time.
    """
    orig_dtype = x.dtype
    B, H, W, C = x.shape
    pr_re, pr_im = _box_projector(H, threshold)
    pc_re, pc_im = _box_projector(W, threshold)
    xf = x.astype(jnp.float32)
    # y[i,v] = sum_{j,w} Pr[i,j] x[j,w] Pc[v,w], real part for real x
    low = (jnp.einsum("ij,bjwc,vw->bivc", jnp.asarray(pr_re), xf,
                      jnp.asarray(pc_re))
           - jnp.einsum("ij,bjwc,vw->bivc", jnp.asarray(pr_im), xf,
                        jnp.asarray(pc_im)))
    out = xf + (scale - 1.0) * low
    return out.astype(orig_dtype)


def apply_freeu(resolution_idx: int, hidden: jnp.ndarray, res: jnp.ndarray,
                s1: float, s2: float, b1: float, b2: float):
    """Scale backbone half-channels by b*, fourier-filter the skip by s*."""
    C = hidden.shape[-1]
    half = C // 2
    if resolution_idx == 0:
        hidden = hidden.at[..., :half].multiply(b1)
        res = fourier_filter(res, 1, s1)
    elif resolution_idx == 1:
        hidden = hidden.at[..., :half].multiply(b2)
        res = fourier_filter(res, 1, s2)
    return hidden, res


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    layers: int
    has_attn: bool
    heads: int
    transformer_depth: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        res_out = []
        for j in range(self.layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{j}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.heads, self.out_channels // self.heads,
                                  depth=self.transformer_depth,
                                  dtype=self.dtype,
                                  name=f"attentions_{j}")(x, context)
            res_out.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
            res_out.append(x)
        return x, res_out


class MidBlock(nn.Module):
    channels: int
    heads: int
    transformer_depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, dtype=self.dtype,
                          name="resnets_0")(x, temb)
        x = Transformer2D(self.heads, self.channels // self.heads,
                          depth=self.transformer_depth, dtype=self.dtype,
                          name="attentions_0")(x, context)
        return ResnetBlock2D(self.channels, dtype=self.dtype,
                             name="resnets_1")(x, temb)


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    layers: int
    has_attn: bool
    heads: int
    transformer_depth: int
    add_upsample: bool
    resolution_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack: list, temb, context,
                 freeu: Optional[Tuple[float, float, float, float]] = None):
        for j in range(self.layers):
            res = res_stack.pop()
            if freeu is not None and self.resolution_idx in (0, 1):
                s1, s2, b1, b2 = freeu
                x, res = apply_freeu(self.resolution_idx, x, res,
                                     s1=s1, s2=s2, b1=b1, b2=b2)
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{j}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.heads, self.out_channels // self.heads,
                                  depth=self.transformer_depth,
                                  dtype=self.dtype,
                                  name=f"attentions_{j}")(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsample")(x)
        return x


class UNet2DConditionModel(nn.Module):
    """Text/time-conditioned denoising UNet with ControlNet injection.

    The forward is factored into `encode` (conv_in + down blocks — the
    skip/feature producer) and `decode` (residual injection + mid + up +
    out head) so the sampler can cache the encoder across denoise steps
    (Faster-Diffusion-style encoder propagation,
    `SamplerConfig.unet_encoder_interval`).  `__call__(x, t, ctx, ...)`
    composes them and is exactly the frozen HF UNet forward.
    """
    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.time_embedding = TimestepEmbedding(c.block_out_channels[0] * 4,
                                                dtype=self.dtype)
        self.conv_in = nn.Conv(c.block_out_channels[0], (3, 3),
                               padding="SAME", dtype=self.dtype)
        self.down_blocks = [
            CrossAttnDownBlock(
                out_channels=ch, layers=c.layers_per_block,
                has_attn=c.cross_attention_blocks[i],
                heads=c.attention_heads,
                transformer_depth=c.transformer_depth,
                add_downsample=i != len(c.block_out_channels) - 1,
                dtype=self.dtype)
            for i, ch in enumerate(c.block_out_channels)]
        self.mid_block = MidBlock(c.block_out_channels[-1],
                                  heads=c.attention_heads,
                                  transformer_depth=c.transformer_depth,
                                  dtype=self.dtype)
        rev_channels = list(reversed(c.block_out_channels))
        rev_attn = list(reversed(c.cross_attention_blocks))
        self.up_blocks = [
            CrossAttnUpBlock(
                out_channels=ch, layers=c.layers_per_block + 1,
                has_attn=rev_attn[i], heads=c.attention_heads,
                transformer_depth=c.transformer_depth,
                add_upsample=i != len(rev_channels) - 1, resolution_idx=i,
                dtype=self.dtype)
            for i, ch in enumerate(rev_channels)]
        self.conv_norm_out = GroupNorm32(32, dtype=self.dtype)
        self.conv_out = nn.Conv(c.out_channels, (3, 3), padding="SAME",
                                dtype=self.dtype)

    def _temb(self, timesteps, batch):
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (batch,))
        t_emb = timestep_embedding(timesteps, self.cfg.block_out_channels[0])
        return self.time_embedding(t_emb.astype(self.dtype))

    def encode(self, sample, timesteps, encoder_hidden_states):
        """conv_in + down blocks: (hidden, skip-stack tuple)."""
        temb = self._temb(timesteps, sample.shape[0])
        context = encoder_hidden_states.astype(self.dtype)
        x = self.conv_in(sample.astype(self.dtype))
        res_stack = [x]
        for block in self.down_blocks:
            x, res_out = block(x, temb, context)
            res_stack.extend(res_out)
        return x, tuple(res_stack)

    def decode(self, x, res_stack, timesteps, encoder_hidden_states,
               down_block_additional_residuals: Optional[Sequence] = None,
               mid_block_additional_residual: Optional[jnp.ndarray] = None,
               freeu: Optional[Tuple[float, float, float, float]] = None):
        """ControlNet residual injection + mid + up blocks + out head.

        Recomputes the (cheap) time embedding so a cached `encode` can be
        combined with fresh per-step timesteps and ControlNet residuals.
        """
        temb = self._temb(timesteps, x.shape[0])
        context = encoder_hidden_states.astype(self.dtype)
        res_stack = list(res_stack)
        if down_block_additional_residuals is not None:
            res_stack = [r + a for r, a in
                         zip(res_stack, down_block_additional_residuals)]
        x = self.mid_block(x, temb, context)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual
        for block in self.up_blocks:
            x = block(x, res_stack, temb, context, freeu=freeu)
        assert not res_stack

        x = self.conv_norm_out(x)
        x = nn.silu(x)
        return self.conv_out(x)

    def __call__(self, sample, timesteps, encoder_hidden_states,
                 down_block_additional_residuals: Optional[Sequence] = None,
                 mid_block_additional_residual: Optional[jnp.ndarray] = None,
                 freeu: Optional[Tuple[float, float, float, float]] = None):
        x, res_stack = self.encode(sample, timesteps, encoder_hidden_states)
        return self.decode(x, res_stack, timesteps, encoder_hidden_states,
                           down_block_additional_residuals,
                           mid_block_additional_residual, freeu)
