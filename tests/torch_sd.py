"""Hand re-declared torch modules mirroring HF diffusers' SD-1.5 blocks.

These are *independent* torch implementations of the published
Stable-Diffusion-1.5 architecture (the frozen stack the reference loads at
`train_controlnet.py:805-814`), written from the publicly documented op
order of `diffusers` `UNet2DConditionModel` / `AutoencoderKL` /
`ControlNetModel`, at configurable (tiny) widths.  They exist so the
flax models + `models/hf_import` converters can be parity-tested against a
real torch forward without `diffusers` installed — the same method used
for the FID-64 Inception prefix and I3D (`test_torch_parity.py`).

State-dict attribute names intentionally match the HF checkpoints' names,
so `unet_name_map` / `vae_name_map` / `controlnet_name_map` convert these
modules' state dicts directly.

Key HF semantics encoded here (and verified against the published source):
  * UNet resnet GroupNorm eps 1e-5; VAE resnet/attn GroupNorm eps 1e-6;
    Transformer2D GroupNorm eps 1e-6; LayerNorm eps 1e-5 (torch default).
  * GEGLU uses exact (erf) GELU.
  * UNet Downsample2D pads symmetrically (downsample_padding=1); the VAE
    encoder's Downsample2D is built with padding=0 and F.pads (0,1,0,1)
    (right/bottom) in forward.
  * Upsample2D = nearest-2x interpolate + 3x3 conv.
  * Timesteps: flip_sin_to_cos=True, downscale_freq_shift=0.
  * VAE mid attention: single head, biased q/k/v/out linears, residual.
  * FreeU (validation.py:106): per-up-block apply_freeu at resolution idx
    0/1 — backbone half-channel scaling + fourier low-band scaling of the
    skip.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def get_timestep_embedding(timesteps, dim, max_period=10000.0):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half, dtype=torch.float32) / half
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    # flip_sin_to_cos=True -> [cos, sin]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbeddingTorch(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def _gn(channels, eps):
    groups = 32
    while channels % groups:
        groups //= 2
    return nn.GroupNorm(groups, channels, eps=eps)


class ResnetBlock2DTorch(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, eps=1e-5):
        super().__init__()
        self.norm1 = _gn(cin, eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = _gn(cout, eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return h + res


class AttentionTorch(nn.Module):
    """SD attention: bias-free q/k/v, biased out, fp32 softmax."""

    def __init__(self, query_dim, heads, dim_head, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        B, L, _ = x.shape
        q = self.to_q(x).view(B, L, self.heads, self.dim_head)
        k = self.to_k(context).view(B, -1, self.heads, self.dim_head)
        v = self.to_v(context).view(B, -1, self.heads, self.dim_head)
        scale = self.dim_head ** -0.5
        logits = torch.einsum("bqhd,bkhd->bhqk", q.float(),
                              k.float()) * scale
        probs = logits.softmax(dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v.float())
        out = out.reshape(B, L, -1).to(x.dtype)
        return self.to_out[0](out)


class GEGLUTorch(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForwardTorch(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList([GEGLUTorch(dim, dim * mult),
                                  nn.Identity(),
                                  nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlockTorch(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = AttentionTorch(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = AttentionTorch(dim, heads, dim_head,
                                    context_dim=context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForwardTorch(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DTorch(nn.Module):
    def __init__(self, channels, heads, context_dim, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(32 if channels % 32 == 0 else
                                 _gn(channels, 1e-6).num_groups,
                                 channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlockTorch(channels, heads, channels // heads,
                                       context_dim)
            for _ in range(depth)])
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, context):
        B, C, H, W = x.shape
        residual = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        for block in self.transformer_blocks:
            h = block(h, context)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + residual


class Downsample2DTorch(nn.Module):
    def __init__(self, channels, asymmetric_pad=False):
        super().__init__()
        self.asymmetric_pad = asymmetric_pad
        self.conv = nn.Conv2d(channels, channels, 3, stride=2,
                              padding=0 if asymmetric_pad else 1)

    def forward(self, x):
        if self.asymmetric_pad:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2DTorch(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownBlockTorch(nn.Module):
    """CrossAttnDownBlock2D / DownBlock2D."""

    def __init__(self, cin, cout, temb_dim, layers, has_attn, heads,
                 context_dim, depth, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2DTorch(cin if j == 0 else cout, cout, temb_dim)
            for j in range(layers)])
        self.attentions = nn.ModuleList([
            Transformer2DTorch(cout, heads, context_dim, depth)
            for _ in range(layers)]) if has_attn else None
        self.downsamplers = (nn.ModuleList([Downsample2DTorch(cout)])
                             if add_downsample else None)

    def forward(self, x, temb, context):
        res_out = []
        for j, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, context)
            res_out.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            res_out.append(x)
        return x, res_out


class MidBlockTorch(nn.Module):
    """UNetMidBlock2DCrossAttn."""

    def __init__(self, channels, temb_dim, heads, context_dim, depth):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2DTorch(channels, channels, temb_dim),
            ResnetBlock2DTorch(channels, channels, temb_dim)])
        self.attentions = nn.ModuleList([
            Transformer2DTorch(channels, heads, context_dim, depth)])

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


def fourier_filter(x, threshold, scale):
    """FreeU low-frequency scaling (HF diffusers `fourier_filter`)."""
    B, C, H, W = x.shape
    x_freq = torch.fft.fftn(x.float(), dim=(-2, -1))
    x_freq = torch.fft.fftshift(x_freq, dim=(-2, -1))
    mask = torch.ones_like(x_freq.real)
    crow, ccol = H // 2, W // 2
    mask[..., crow - threshold:crow + threshold,
         ccol - threshold:ccol + threshold] = scale
    x_freq = x_freq * mask
    x_freq = torch.fft.ifftshift(x_freq, dim=(-2, -1))
    return torch.fft.ifftn(x_freq, dim=(-2, -1)).real.to(x.dtype)


def apply_freeu(resolution_idx, hidden, res, s1, s2, b1, b2):
    if resolution_idx == 0:
        half = hidden.shape[1] // 2
        hidden[:, :half] = hidden[:, :half] * b1
        res = fourier_filter(res, threshold=1, scale=s1)
    elif resolution_idx == 1:
        half = hidden.shape[1] // 2
        hidden[:, :half] = hidden[:, :half] * b2
        res = fourier_filter(res, threshold=1, scale=s2)
    return hidden, res


class UpBlockTorch(nn.Module):
    """CrossAttnUpBlock2D / UpBlock2D with optional FreeU."""

    def __init__(self, prev_out, cout, skips, temb_dim, has_attn, heads,
                 context_dim, depth, add_upsample, resolution_idx):
        super().__init__()
        self.resolution_idx = resolution_idx
        self.resnets = nn.ModuleList([
            ResnetBlock2DTorch((prev_out if j == 0 else cout) + skips[j],
                               cout, temb_dim)
            for j in range(len(skips))])
        self.attentions = nn.ModuleList([
            Transformer2DTorch(cout, heads, context_dim, depth)
            for _ in range(len(skips))]) if has_attn else None
        self.upsamplers = (nn.ModuleList([Upsample2DTorch(cout)])
                           if add_upsample else None)

    def forward(self, x, res_stack, temb, context, freeu=None):
        for j, resnet in enumerate(self.resnets):
            res = res_stack.pop()
            if freeu is not None and self.resolution_idx in (0, 1):
                x, res = apply_freeu(self.resolution_idx, x, res, *freeu)
            x = torch.cat([x, res], dim=1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNetTrunkTorch(nn.Module):
    """conv_in + time embedding + down blocks + mid block — the part shared
    by UNet2DConditionModel and ControlNetModel."""

    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        temb_dim = chans[0] * 4
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbeddingTorch(chans[0], temb_dim)
        self.down_blocks = nn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(DownBlockTorch(
                prev, ch, temb_dim, cfg.layers_per_block,
                cfg.cross_attention_blocks[i], cfg.attention_heads,
                cfg.cross_attention_dim, cfg.transformer_depth,
                add_downsample=i != len(chans) - 1))
            prev = ch
        self.mid_block = MidBlockTorch(chans[-1], temb_dim,
                                       cfg.attention_heads,
                                       cfg.cross_attention_dim,
                                       cfg.transformer_depth)

    def time_emb(self, timesteps, batch):
        t = timesteps.expand(batch)
        return self.time_embedding(
            get_timestep_embedding(t, self.cfg.block_out_channels[0]))


class UNet2DConditionTorch(UNetTrunkTorch):
    def __init__(self, cfg):
        super().__init__(cfg)
        chans = cfg.block_out_channels
        temb_dim = chans[0] * 4
        rev = list(reversed(chans))
        rev_attn = list(reversed(cfg.cross_attention_blocks))
        # skip widths per up block, reversed from the down path's res list
        skip_stack = [chans[0]]
        prev = chans[0]
        for i, ch in enumerate(chans):
            skip_stack += [ch] * cfg.layers_per_block
            if i != len(chans) - 1:
                skip_stack.append(ch)
            prev = ch
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, ch in enumerate(rev):
            skips = [skip_stack.pop()
                     for _ in range(cfg.layers_per_block + 1)]
            self.up_blocks.append(UpBlockTorch(
                prev, ch, skips, temb_dim, rev_attn[i],
                cfg.attention_heads, cfg.cross_attention_dim,
                cfg.transformer_depth,
                add_upsample=i != len(rev) - 1, resolution_idx=i))
            prev = ch
        self.conv_norm_out = _gn(chans[0], 1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context,
                down_block_additional_residuals=None,
                mid_block_additional_residual=None, freeu=None):
        temb = self.time_emb(timesteps, sample.shape[0])
        x = self.conv_in(sample)
        res_stack = [x]
        for block in self.down_blocks:
            x, res_out = block(x, temb, context)
            res_stack.extend(res_out)
        if down_block_additional_residuals is not None:
            res_stack = [r + a for r, a in
                         zip(res_stack, down_block_additional_residuals)]
        x = self.mid_block(x, temb, context)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual
        for block in self.up_blocks:
            x = block(x, res_stack, temb, context, freeu=freeu)
        assert not res_stack
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------

class VAEAttentionTorch(nn.Module):
    """HF AutoencoderKL mid attention: 1 head, biased linears, residual."""

    def __init__(self, channels):
        super().__init__()
        self.group_norm = nn.GroupNorm(32 if channels % 32 == 0 else
                                       _gn(channels, 1e-6).num_groups,
                                       channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        logits = torch.einsum("bqc,bkc->bqk", q.float(), k.float())
        probs = (logits * C ** -0.5).softmax(dim=-1)
        out = torch.einsum("bqk,bkc->bqc", probs, v.float()).to(x.dtype)
        out = self.to_out[0](out)
        return x + out.reshape(B, H, W, C).permute(0, 3, 1, 2)


class _VAEDownBlockTorch(nn.Module):
    def __init__(self, cin, cout, layers, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2DTorch(cin if j == 0 else cout, cout, None, eps=1e-6)
            for j in range(layers)])
        self.downsamplers = (nn.ModuleList(
            [Downsample2DTorch(cout, asymmetric_pad=True)])
            if add_downsample else None)

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _VAEUpBlockTorch(nn.Module):
    def __init__(self, cin, cout, layers, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2DTorch(cin if j == 0 else cout, cout, None, eps=1e-6)
            for j in range(layers)])
        self.upsamplers = (nn.ModuleList([Upsample2DTorch(cout)])
                           if add_upsample else None)

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _VAEMidTorch(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2DTorch(channels, channels, None, eps=1e-6),
            ResnetBlock2DTorch(channels, channels, None, eps=1e-6)])
        self.attentions = nn.ModuleList([VAEAttentionTorch(channels)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class EncoderTorch(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        base = cfg.base_channels
        self.conv_in = nn.Conv2d(cfg.in_channels, base, 3, padding=1)
        self.down_blocks = nn.ModuleList()
        prev = base
        for i, mult in enumerate(cfg.channel_mults):
            ch = base * mult
            self.down_blocks.append(_VAEDownBlockTorch(
                prev, ch, cfg.layers_per_block,
                add_downsample=i < len(cfg.channel_mults) - 1))
            prev = ch
        self.mid_block = _VAEMidTorch(prev)
        self.conv_norm_out = _gn(prev, 1e-6)
        self.conv_out = nn.Conv2d(prev, 2 * cfg.latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class DecoderTorch(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        base = cfg.base_channels
        top = base * cfg.channel_mults[-1]
        self.conv_in = nn.Conv2d(cfg.latent_channels, top, 3, padding=1)
        self.mid_block = _VAEMidTorch(top)
        self.up_blocks = nn.ModuleList()
        prev = top
        rev = list(reversed(cfg.channel_mults))
        for i, mult in enumerate(rev):
            ch = base * mult
            self.up_blocks.append(_VAEUpBlockTorch(
                prev, ch, cfg.layers_per_block + 1,
                add_upsample=i < len(rev) - 1))
            prev = ch
        self.conv_norm_out = _gn(prev, 1e-6)
        self.conv_out = nn.Conv2d(prev, cfg.in_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKLTorch(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = EncoderTorch(cfg)
        self.decoder = DecoderTorch(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# ---------------------------------------------------------------------------
# ControlNet trunk (diffusers ControlNetModel) + the reference's
# DualFlowControlNet FDN wiring (`flownet.py:51-138`)
# ---------------------------------------------------------------------------

class FDNTorch(nn.Module):
    """SPADE-style feature denormalization (`control_utils.py:19-34`)."""

    def __init__(self, norm_nc, label_nc):
        super().__init__()
        self.param_free_norm = nn.GroupNorm(32 if norm_nc % 32 == 0 else
                                            _gn(norm_nc, 1e-5).num_groups,
                                            norm_nc, affine=False)
        self.conv_gamma = nn.Conv2d(label_nc, norm_nc, 3, padding=1)
        self.conv_beta = nn.Conv2d(label_nc, norm_nc, 3, padding=1)

    def forward(self, x, cond):
        normalized = self.param_free_norm(x)
        gamma = self.conv_gamma(cond)
        beta = self.conv_beta(cond)
        return normalized * (1 + gamma) + beta


class DualFlowControlNetTrunkTorch(UNetTrunkTorch):
    """The reference DualFlowControlNet minus the feature extractor: takes
    the warped pyramid directly.  Mirrors `flownet.py:51-138`: conv_in ->
    fdn(level 0) -> down blocks with FDN applied to the running sample
    AFTER its residuals are collected (the deepest FDN instance is reused
    for every block past the pyramid depth) -> mid -> zero-conv heads *
    conditioning_scale."""

    def __init__(self, cfg, inject_channels):
        super().__init__(cfg)
        chans = cfg.block_out_channels
        self.inject_channels = inject_channels
        fdn_names = ["fdn64", "fdn32", "fdn16", "fdn08"]
        for lvl, ch_in in enumerate(inject_channels):
            # norm width: level 0 normalizes conv_in output; level l>=1
            # normalizes block l-1's output (the deepest level also serves
            # all later blocks, which share its width in SD-1.5)
            norm_nc = chans[0] if lvl == 0 else chans[lvl - 1]
            setattr(self, fdn_names[lvl], FDNTorch(norm_nc, ch_in))
        self._fdn_names = fdn_names[:len(inject_channels)]
        self.controlnet_down_blocks = nn.ModuleList()
        n_heads = [chans[0]]
        for i, ch in enumerate(chans):
            n_heads += [ch] * cfg.layers_per_block
            if i != len(chans) - 1:
                n_heads.append(ch)
        for ch in n_heads:
            conv = nn.Conv2d(ch, ch, 1)
            nn.init.zeros_(conv.weight)
            nn.init.zeros_(conv.bias)
            self.controlnet_down_blocks.append(conv)
        self.controlnet_mid_block = nn.Conv2d(chans[-1], chans[-1], 1)
        nn.init.zeros_(self.controlnet_mid_block.weight)
        nn.init.zeros_(self.controlnet_mid_block.bias)

    def forward(self, sample, timesteps, context, pyramid,
                conditioning_scale=1.0):
        temb = self.time_emb(timesteps, sample.shape[0])
        n_lvl = len(self.inject_channels)
        x = self.conv_in(sample)
        x = getattr(self, self._fdn_names[0])(x, pyramid[0])
        res_stack = [x]
        for i, block in enumerate(self.down_blocks):
            x, res_out = block(x, temb, context)
            res_stack.extend(res_out)
            lvl = min(i + 1, n_lvl - 1)
            x = getattr(self, self._fdn_names[lvl])(x, pyramid[lvl])
        x = self.mid_block(x, temb, context)
        down_res = [ctrl(r) * conditioning_scale
                    for ctrl, r in zip(self.controlnet_down_blocks,
                                       res_stack)]
        mid_res = self.controlnet_mid_block(x) * conditioning_scale
        return down_res, mid_res
