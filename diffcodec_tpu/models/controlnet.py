"""DualFlowControlNet and ResControlNet in flax, NHWC.

A ControlNet is the mirrored UNet down path (conv_in, down blocks, mid block)
with zero-conv residual heads, plus — in the DiffCodec variants — FDN
(SPADE-style) injection of the warped conditioning pyramid after conv_in and
after every down block.

Parity targets:
  * DualFlowControlNet:  `controlnet/flownet.py:23-138`
  * ResControlNet:       `controlnet/flow_resnet.py:23-144` (adds the
    WarpExtractor pyramid of the pre-warped prediction, injected as P* + W*)
Key wiring facts preserved:
  * FDN is applied to the running `sample` AFTER its residuals are collected,
    so the residual list holds pre-FDN features (`flownet.py:86-108`).
  * the last two down blocks both use the deepest FDN/pyramid level
    (`flownet.py:104-106` `else` branch).
  * residual heads are zero-initialised 1x1 convs; output is scaled by
    `conditioning_scale` (`flownet.py:120-128`).

TPU-first design note: the conditioning pyramid is timestep-independent, but
the reference recomputes it inside every denoise step (`pipeline.py:341-350`).
Here `extract_pyramid` and `backbone` are separate methods so the sampler
hoists the extractor out of the jitted denoise loop — a 30-50x saving on the
extractor+warp work per frame.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from diffcodec_tpu.config import ControlNetConfig
from diffcodec_tpu.models.extractors import (FDN, BiDirFeatureExtractor,
                                             BiDirResidueExtractor,
                                             WarpExtractor)
from diffcodec_tpu.models.layers import (TimestepEmbedding, ZeroConv,
                                         timestep_embedding)
from diffcodec_tpu.models.unet2d_condition import (CrossAttnDownBlock,
                                                   MidBlock)


class ControlNetTrunk(nn.Module):
    """Shared ControlNet spine: conv_in + FDN-injected down path + mid +
    zero-conv heads.  The injection pyramid is supplied by the caller."""
    cfg: ControlNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, pyramid,
                 conditioning_scale=1.0):
        c = self.cfg.unet
        inject = self.cfg.inject_channels
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = TimestepEmbedding(c.block_out_channels[0] * 4,
                                 dtype=self.dtype,
                                 name="time_embedding")(t_emb.astype(self.dtype))
        context = encoder_hidden_states.astype(self.dtype)

        x = nn.Conv(c.block_out_channels[0], (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        # FDN modules are shared per (pyramid level, feature width): the
        # reference's fdn08 instance is applied after BOTH of the last two
        # down blocks (flownet.py:104-106), which have equal widths in the
        # SD-1.5 config
        fdns = {}

        def apply_fdn(x, lvl):
            key = (lvl, x.shape[-1])
            if key not in fdns:
                fdns[key] = FDN(dtype=self.dtype,
                                name=f"fdn_{lvl}_{x.shape[-1]}")
            return fdns[key](x, pyramid[lvl])

        x = apply_fdn(x, 0)

        res_stack = [x]
        for i, ch in enumerate(c.block_out_channels):
            is_last = i == len(c.block_out_channels) - 1
            x, res_out = CrossAttnDownBlock(
                out_channels=ch, layers=c.layers_per_block,
                has_attn=c.cross_attention_blocks[i], heads=c.attention_heads,
                transformer_depth=c.transformer_depth,
                add_downsample=not is_last, dtype=self.dtype,
                name=f"down_blocks_{i}")(x, temb, context)
            res_stack.extend(res_out)
            # deepest pyramid level reused for the final (non-downsampling)
            # block, flownet.py:104-106
            lvl = min(i + 1, len(inject) - 1)
            x = apply_fdn(x, lvl)

        x = MidBlock(c.block_out_channels[-1], heads=c.attention_heads,
                     transformer_depth=c.transformer_depth, dtype=self.dtype,
                     name="mid_block")(x, temb, context)

        # cast the (possibly traced f32) scale to the compute dtype so the
        # residuals stay bf16 end to end
        scale = jnp.asarray(conditioning_scale).astype(x.dtype)
        down_res = tuple(
            ZeroConv(r.shape[-1], (1, 1), dtype=self.dtype,
                     name=f"controlnet_down_blocks_{k}")(r) * scale
            for k, r in enumerate(res_stack))
        mid_res = ZeroConv(x.shape[-1], (1, 1), dtype=self.dtype,
                           name="controlnet_mid_block")(x) * scale
        return down_res, mid_res


class DualFlowControlNet(nn.Module):
    """ControlNet conditioned on (I0, I1) anchors + bidirectional flow.

    `extract_pyramid` (timestep-independent, hoistable) and `backbone` are
    exposed separately; `__call__` runs both for API parity with
    `flownet.py:51-138`.
    """
    cfg: ControlNetConfig = ControlNetConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = BiDirFeatureExtractor(
            inject_channels=self.cfg.inject_channels, dtype=self.dtype)
        self.trunk = ControlNetTrunk(self.cfg, dtype=self.dtype)

    def extract_pyramid(self, controlnet_cond, flow_cond):
        """cond [B,H,W,6], flow [B,H,W,4] -> timestep-independent pyramid."""
        return self.feature_extractor(controlnet_cond, flow_cond)

    def backbone(self, sample, timesteps, encoder_hidden_states, pyramid,
                 conditioning_scale=1.0):
        return self.trunk(sample, timesteps, encoder_hidden_states, pyramid,
                          conditioning_scale)

    def __call__(self, sample, timesteps, encoder_hidden_states,
                 controlnet_cond, flow_cond, conditioning_scale=1.0):
        pyramid = self.extract_pyramid(controlnet_cond, flow_cond)
        return self.backbone(sample, timesteps, encoder_hidden_states,
                             pyramid, conditioning_scale)


class ResControlNet(nn.Module):
    """Residual ControlNet: adds the warped-prediction pyramid (P* + W*)."""
    cfg: ControlNetConfig = ControlNetConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = BiDirResidueExtractor(
            inject_channels=self.cfg.inject_channels, dtype=self.dtype)
        self.warp_extractor = WarpExtractor(
            inject_channels=self.cfg.inject_channels, dtype=self.dtype)
        self.trunk = ControlNetTrunk(self.cfg, dtype=self.dtype)

    def extract_pyramid(self, controlnet_cond, flow_cond, warp_cond):
        """warp_cond [B,H,W,3] = fused pre-warped prediction
        (flow_resnet.py:84); pyramid = P + W per scale."""
        prev_frame = controlnet_cond[..., 0:3]
        next_frame = controlnet_cond[..., 3:6]
        fwd = flow_cond[..., 0:2]
        bwd = flow_cond[..., 2:4]
        P = self.feature_extractor(prev_frame, next_frame, fwd, bwd)
        W = self.warp_extractor(warp_cond)
        return [p + w for p, w in zip(P, W)]

    def backbone(self, sample, timesteps, encoder_hidden_states, pyramid,
                 conditioning_scale=1.0):
        return self.trunk(sample, timesteps, encoder_hidden_states, pyramid,
                          conditioning_scale)

    def __call__(self, sample, timesteps, encoder_hidden_states,
                 controlnet_cond, flow_cond, warp_cond,
                 conditioning_scale=1.0):
        pyramid = self.extract_pyramid(controlnet_cond, flow_cond, warp_cond)
        return self.backbone(sample, timesteps, encoder_hidden_states,
                             pyramid, conditioning_scale)
