"""Small unconditional pixel-space UNet (the residual DDPM).

Parity target: `residual_train.py:74-82` — HF `UNet2DModel` with
sample_size 256, in/out 3 channels, blocks (64, 128, 128, 256) with
attention in the deepest two blocks, trained as a 500-step squaredcos DDPM
on warp residuals.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from diffcodec_tpu.models.layers import (AttentionBlock2D, Downsample2D,
                                         GroupNorm32, ResnetBlock2D,
                                         TimestepEmbedding, Upsample2D,
                                         timestep_embedding)


class UNet2DModel(nn.Module):
    """Unconditional UNet: (sample, t) -> epsilon."""
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (64, 128, 128, 256)
    layers_per_block: int = 2
    attn_blocks: Tuple[bool, ...] = (False, False, True, True)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps):
        ch0 = self.block_out_channels[0]
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(timesteps, ch0)
        temb = TimestepEmbedding(ch0 * 4, dtype=self.dtype,
                                 name="time_embedding")(t_emb.astype(self.dtype))

        x = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        res_stack = [x]
        for i, ch in enumerate(self.block_out_channels):
            is_last = i == len(self.block_out_channels) - 1
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(x, temb)
                if self.attn_blocks[i]:
                    x = AttentionBlock2D(dtype=self.dtype,
                                         name=f"down_{i}_attn_{j}")(x)
                res_stack.append(x)
            if not is_last:
                x = Downsample2D(ch, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
                res_stack.append(x)

        mid_ch = self.block_out_channels[-1]
        x = ResnetBlock2D(mid_ch, dtype=self.dtype, name="mid_res_0")(x, temb)
        x = AttentionBlock2D(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(mid_ch, dtype=self.dtype, name="mid_res_1")(x, temb)

        rev = list(reversed(self.block_out_channels))
        rev_attn = list(reversed(self.attn_blocks))
        for i, ch in enumerate(rev):
            is_last = i == len(rev) - 1
            for j in range(self.layers_per_block + 1):
                res = res_stack.pop()
                x = jnp.concatenate([x, res], axis=-1)
                x = ResnetBlock2D(ch, dtype=self.dtype,
                                  name=f"up_{i}_res_{j}")(x, temb)
                if rev_attn[i]:
                    x = AttentionBlock2D(dtype=self.dtype,
                                         name=f"up_{i}_attn_{j}")(x)
            if not is_last:
                x = Upsample2D(ch, dtype=self.dtype,
                               name=f"up_{i}_upsample")(x)
        assert not res_stack

        x = GroupNorm32(32, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(x)
