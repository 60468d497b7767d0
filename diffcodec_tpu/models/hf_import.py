"""HF (torch) -> flax weight converters for the frozen SD-1.5 stack.

The reference loads `stable-diffusion-v1-5` AutoencoderKL /
UNet2DConditionModel / CLIPTextModel (`train_controlnet.py:790-814`) and
DualFlowControlNet safetensors checkpoints (`validation.py:52-53`).  This
module maps those torch state dicts onto the flax parameter trees of
`diffcodec_tpu.models.*`.

Design: each model has a `*_name_map(cfg)` producing
(torch_name, flax_path tuple, kind) triples — a single source of truth used
by the converter AND by tests (which synthesize a torch-shaped state dict
from a freshly-initialised flax tree and round-trip it).  Kinds:
  conv    OIHW -> HWIO kernel (+ .bias -> bias)
  linear  [out,in] -> [in,out] kernel (+ bias)
  norm    weight/bias -> scale/bias
  embed   [num,dim] kept
  raw     copied as-is
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from diffcodec_tpu.config import (CLIPTextConfig, ControlNetConfig,
                                  UNetConfig, VAEConfig)

Entry = Tuple[str, Tuple[str, ...], str]


def _conv(tname: str, fpath: Sequence[str]) -> List[Entry]:
    fpath = tuple(fpath)
    return [(tname + ".weight", fpath + ("kernel",), "conv_kernel"),
            (tname + ".bias", fpath + ("bias",), "bias")]


def _conv_nobias(tname: str, fpath: Sequence[str]) -> List[Entry]:
    return [(tname + ".weight", tuple(fpath) + ("kernel",), "conv_kernel")]


def _linear(tname: str, fpath: Sequence[str], bias=True) -> List[Entry]:
    fpath = tuple(fpath)
    out = [(tname + ".weight", fpath + ("kernel",), "linear_kernel")]
    if bias:
        out.append((tname + ".bias", fpath + ("bias",), "bias"))
    return out


def _norm(tname: str, fpath: Sequence[str]) -> List[Entry]:
    fpath = tuple(fpath)
    return [(tname + ".weight", fpath + ("scale",), "raw"),
            (tname + ".bias", fpath + ("bias",), "raw")]


def _gn(tname: str, fpath: Sequence[str]) -> List[Entry]:
    """Our GroupNorm32 nests the flax GroupNorm under 'norm'."""
    return _norm(tname, tuple(fpath) + ("norm",))


# ---------------------------------------------------------------------------
# building blocks shared by UNet / ControlNet
# ---------------------------------------------------------------------------

def _resnet_map(t: str, f: Tuple[str, ...], time_emb=True) -> List[Entry]:
    out = []
    out += _gn(f"{t}.norm1", f + ("norm1",))
    out += _conv(f"{t}.conv1", f + ("conv1",))
    if time_emb:
        out += _linear(f"{t}.time_emb_proj", f + ("time_emb_proj",))
    out += _gn(f"{t}.norm2", f + ("norm2",))
    out += _conv(f"{t}.conv2", f + ("conv2",))
    return out


def _resnet_shortcut_map(t: str, f: Tuple[str, ...],
                         torch_name="conv_shortcut") -> List[Entry]:
    return _conv(f"{t}.{torch_name}", f + ("conv_shortcut",))


def _attention_map(t: str, f: Tuple[str, ...]) -> List[Entry]:
    out = []
    out += _linear(f"{t}.to_q", f + ("to_q",), bias=False)
    out += _linear(f"{t}.to_k", f + ("to_k",), bias=False)
    out += _linear(f"{t}.to_v", f + ("to_v",), bias=False)
    out += _linear(f"{t}.to_out.0", f + ("to_out",))
    return out


def _transformer2d_map(t: str, f: Tuple[str, ...], depth: int) -> List[Entry]:
    out = []
    out += _gn(f"{t}.norm", f + ("norm",))
    out += _conv(f"{t}.proj_in", f + ("proj_in",))
    for d in range(depth):
        tb = f"{t}.transformer_blocks.{d}"
        fb = f + (f"blocks_{d}",)
        out += _norm(f"{tb}.norm1", fb + ("norm1",))
        out += _attention_map(f"{tb}.attn1", fb + ("attn1",))
        out += _norm(f"{tb}.norm2", fb + ("norm2",))
        out += _attention_map(f"{tb}.attn2", fb + ("attn2",))
        out += _norm(f"{tb}.norm3", fb + ("norm3",))
        out += _linear(f"{tb}.ff.net.0.proj", fb + ("ff", "net_0", "proj"))
        out += _linear(f"{tb}.ff.net.2", fb + ("ff", "net_2"))
    out += _conv(f"{t}.proj_out", f + ("proj_out",))
    return out


def _unet_trunk_map(cfg: UNetConfig, shortcut_dims_change) -> List[Entry]:
    """conv_in + time embedding + down blocks + mid block (shared between
    the UNet and the ControlNet trunk)."""
    out = []
    out += _conv("conv_in", ("conv_in",))
    out += _linear("time_embedding.linear_1",
                   ("time_embedding", "linear_1"))
    out += _linear("time_embedding.linear_2",
                   ("time_embedding", "linear_2"))
    prev_ch = cfg.block_out_channels[0]
    for i, ch in enumerate(cfg.block_out_channels):
        fb = (f"down_blocks_{i}",)
        tb = f"down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            f_res = fb + (f"resnets_{j}",)
            out += _resnet_map(f"{tb}.resnets.{j}", f_res)
            in_ch = prev_ch if j == 0 else ch
            if in_ch != ch:
                out += _resnet_shortcut_map(f"{tb}.resnets.{j}", f_res)
            if cfg.cross_attention_blocks[i]:
                out += _transformer2d_map(f"{tb}.attentions.{j}",
                                          fb + (f"attentions_{j}",),
                                          cfg.transformer_depth)
        if i < len(cfg.block_out_channels) - 1:
            out += _conv(f"{tb}.downsamplers.0.conv",
                         fb + ("downsample", "conv"))
        prev_ch = ch
    # mid block
    mid_ch = cfg.block_out_channels[-1]
    out += _resnet_map("mid_block.resnets.0", ("mid_block", "resnets_0"))
    out += _transformer2d_map("mid_block.attentions.0",
                              ("mid_block", "attentions_0"),
                              cfg.transformer_depth)
    out += _resnet_map("mid_block.resnets.1", ("mid_block", "resnets_1"))
    return out


def unet_name_map(cfg: UNetConfig) -> List[Entry]:
    out = _unet_trunk_map(cfg, True)
    # up blocks
    rev = list(reversed(cfg.block_out_channels))
    rev_attn = list(reversed(cfg.cross_attention_blocks))
    for i, ch in enumerate(rev):
        fb = (f"up_blocks_{i}",)
        tb = f"up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            f_res = fb + (f"resnets_{j}",)
            out += _resnet_map(f"{tb}.resnets.{j}", f_res)
            # up-block resnets always concat a skip -> in != out, shortcut
            out += _resnet_shortcut_map(f"{tb}.resnets.{j}", f_res)
            if rev_attn[i]:
                out += _transformer2d_map(f"{tb}.attentions.{j}",
                                          fb + (f"attentions_{j}",),
                                          cfg.transformer_depth)
        if i < len(rev) - 1:
            out += _conv(f"{tb}.upsamplers.0.conv", fb + ("upsample", "conv"))
    out += _gn("conv_norm_out", ("conv_norm_out",))
    out += _conv("conv_out", ("conv_out",))
    return out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_attn_map(t: str, f: Tuple[str, ...]) -> List[Entry]:
    out = _gn(f"{t}.group_norm", f + ("group_norm",))
    out += _linear(f"{t}.to_q", f + ("to_q",))
    out += _linear(f"{t}.to_k", f + ("to_k",))
    out += _linear(f"{t}.to_v", f + ("to_v",))
    out += _linear(f"{t}.to_out.0", f + ("to_out",))
    return out


def vae_name_map(cfg: VAEConfig) -> List[Entry]:
    out = []
    # encoder
    out += _conv("encoder.conv_in", ("encoder", "conv_in"))
    prev = cfg.base_channels
    for i, mult in enumerate(cfg.channel_mults):
        ch = cfg.base_channels * mult
        for j in range(cfg.layers_per_block):
            f_res = ("encoder", f"down_{i}_resnet_{j}")
            t_res = f"encoder.down_blocks.{i}.resnets.{j}"
            out += _resnet_map(t_res, f_res, time_emb=False)
            in_ch = prev if j == 0 else ch
            if in_ch != ch:
                out += _resnet_shortcut_map(t_res, f_res)
        if i < len(cfg.channel_mults) - 1:
            out += _conv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                         ("encoder", f"down_{i}_downsample", "conv"))
        prev = ch
    out += _resnet_map("encoder.mid_block.resnets.0",
                       ("encoder", "mid_resnet_0"), time_emb=False)
    out += _vae_attn_map("encoder.mid_block.attentions.0",
                         ("encoder", "mid_attn"))
    out += _resnet_map("encoder.mid_block.resnets.1",
                       ("encoder", "mid_resnet_1"), time_emb=False)
    out += _gn("encoder.conv_norm_out", ("encoder", "conv_norm_out"))
    out += _conv("encoder.conv_out", ("encoder", "conv_out"))
    # decoder
    out += _conv("decoder.conv_in", ("decoder", "conv_in"))
    out += _resnet_map("decoder.mid_block.resnets.0",
                       ("decoder", "mid_resnet_0"), time_emb=False)
    out += _vae_attn_map("decoder.mid_block.attentions.0",
                         ("decoder", "mid_attn"))
    out += _resnet_map("decoder.mid_block.resnets.1",
                       ("decoder", "mid_resnet_1"), time_emb=False)
    rev = list(reversed(cfg.channel_mults))
    prev = cfg.base_channels * rev[0]
    for i, mult in enumerate(rev):
        ch = cfg.base_channels * mult
        for j in range(cfg.layers_per_block + 1):
            f_res = ("decoder", f"up_{i}_resnet_{j}")
            t_res = f"decoder.up_blocks.{i}.resnets.{j}"
            out += _resnet_map(t_res, f_res, time_emb=False)
            in_ch = prev if j == 0 else ch
            if in_ch != ch:
                out += _resnet_shortcut_map(t_res, f_res)
        if i < len(rev) - 1:
            out += _conv(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                         ("decoder", f"up_{i}_upsample", "conv"))
        prev = ch
    out += _gn("decoder.conv_norm_out", ("decoder", "conv_norm_out"))
    out += _conv("decoder.conv_out", ("decoder", "conv_out"))
    out += _conv("quant_conv", ("quant_conv",))
    out += _conv("post_quant_conv", ("post_quant_conv",))
    return out


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def clip_text_name_map(cfg: CLIPTextConfig) -> List[Entry]:
    p = "text_model"
    out: List[Entry] = [
        (f"{p}.embeddings.token_embedding.weight",
         ("token_embedding", "embedding"), "raw"),
        (f"{p}.embeddings.position_embedding.weight",
         ("position_embedding",), "raw"),
    ]
    for i in range(cfg.layers):
        t = f"{p}.encoder.layers.{i}"
        f = (f"layers_{i}",)
        out += _norm(f"{t}.layer_norm1", f + ("layer_norm1",))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out += _linear(f"{t}.self_attn.{proj}",
                           f + ("self_attn", proj))
        out += _norm(f"{t}.layer_norm2", f + ("layer_norm2",))
        out += _linear(f"{t}.mlp.fc1", f + ("fc1",))
        out += _linear(f"{t}.mlp.fc2", f + ("fc2",))
    out += _norm(f"{p}.final_layer_norm", ("final_layer_norm",))
    return out


# ---------------------------------------------------------------------------
# DualFlowControlNet (trunk + extractor + FDNs + zero-conv heads)
# ---------------------------------------------------------------------------

def controlnet_name_map(cfg: ControlNetConfig) -> List[Entry]:
    """Torch names follow the reference DualFlowControlNet module layout
    (`flownet.py:23-47`): diffusers ControlNetModel base + feature_extractor
    + fdn64/32/16/08.  Flax paths follow our DualFlowControlNet."""
    u = cfg.unet
    out: List[Entry] = []
    # trunk (diffusers ControlNetModel down path)
    for tname, fpath, kind in _unet_trunk_map(u, True):
        out.append((tname, ("trunk",) + fpath, kind))
    # zero-conv residual heads: conv_in + per-block (layers + downsample)
    n_heads = 1
    for i in range(len(u.block_out_channels)):
        n_heads += u.layers_per_block
        if i < len(u.block_out_channels) - 1:
            n_heads += 1
    for k in range(n_heads):
        out += [(f"controlnet_down_blocks.{k}.weight",
                 ("trunk", f"controlnet_down_blocks_{k}", "conv", "kernel"),
                 "conv_kernel"),
                (f"controlnet_down_blocks.{k}.bias",
                 ("trunk", f"controlnet_down_blocks_{k}", "conv", "bias"),
                 "bias")]
    out += [("controlnet_mid_block.weight",
             ("trunk", "controlnet_mid_block", "conv", "kernel"),
             "conv_kernel"),
            ("controlnet_mid_block.bias",
             ("trunk", "controlnet_mid_block", "conv", "bias"), "bias")]
    # FDNs: reference names fdn64/fdn32/fdn16/fdn08 map onto the trunk's
    # per-(level, width) shared modules fdn_{lvl}_{ch} (the deepest torch
    # instance is applied after both of the last two blocks).
    n_blocks = len(u.block_out_channels)
    n_levels = len(cfg.inject_channels)
    fdn_torch = ["fdn64", "fdn32", "fdn16", "fdn08"][:n_levels]
    fdn_pairs = [(fdn_torch[0], (0, u.block_out_channels[0]))]
    for i in range(n_blocks):
        lvl = min(i + 1, n_levels - 1)
        fdn_pairs.append((fdn_torch[lvl], (lvl, u.block_out_channels[i])))
    seen = set()
    for t, (lvl, ch) in fdn_pairs:
        if (lvl, ch) in seen:
            continue  # shared flax module, already mapped
        seen.add((lvl, ch))
        f = (f"fdn_{lvl}_{ch}",)
        # param_free_norm is affine=False (control_utils.py:24) -> no params
        out += _conv(f"{t}.conv_gamma", ("trunk",) + f + ("conv_gamma",))
        out += _conv(f"{t}.conv_beta", ("trunk",) + f + ("conv_beta",))
    # feature extractor
    out += feature_extractor_name_map(
        cfg.inject_channels, torch_prefix="feature_extractor.",
        flax_prefix=("feature_extractor",))
    return out


def feature_extractor_name_map(inject_channels: Sequence[int],
                               torch_prefix: str = "",
                               flax_prefix: Tuple[str, ...] = ()
                               ) -> List[Entry]:
    """Bi_Dir_FeatureExtractor weights (`extractors.py:209-315` module
    attribute names) -> our BiDirFeatureExtractor.  Standalone so the bare
    torch extractor's state dict (no prefix) converts directly in parity
    tests."""
    out: List[Entry] = []
    fe = flax_prefix
    tp = torch_prefix
    for side, torch_side in (("first_pre", "first_pre_extractor"),
                             ("last_pre", "last_pre_extractor")):
        for k, torch_idx in enumerate((0, 2, 4, 6, 8)):
            out += _conv(f"{tp}{torch_side}.{torch_idx}",
                         fe + (f"{side}_{k}",))
    for idx in range(len(inject_channels)):
        out += _conv(f"{tp}extractors_first.{idx}.0",
                     fe + (f"extractor_first_{idx}",))
        out += _conv(f"{tp}extractors_last.{idx}.0",
                     fe + (f"extractor_last_{idx}",))
        out += _conv(f"{tp}wrapper.{idx}.metric_net.0",
                     fe + (f"warper_{idx}", "metric_0"))
        out += _conv(f"{tp}wrapper.{idx}.metric_net.2",
                     fe + (f"warper_{idx}", "metric_2"))
        out += _conv(f"{tp}zero_convs.{idx}",
                     fe + (f"zero_conv_{idx}", "conv"))
    return out


def residue_extractor_name_map(inject_channels: Sequence[int],
                               torch_prefix: str = "",
                               flax_prefix: Tuple[str, ...] = ()
                               ) -> List[Entry]:
    """Bi_Dir_ResidueExtractor weights (`extractors.py:67-207` attribute
    names) -> our BiDirResidueExtractor.  The reference's
    flow_feature_encoders are declared but never used in forward
    (`extractors.py:123-128`) and our model omits them; their torch keys
    surface as `unused` on conversion."""
    out: List[Entry] = []
    fe = flax_prefix
    tp = torch_prefix
    for side in ("prev", "next"):
        for k, torch_idx in enumerate((0, 2, 4)):
            out += _conv(f"{tp}{side}_pre.{torch_idx}",
                         fe + (f"{side}_pre_{k}",))
    for idx in range(len(inject_channels)):
        out += _conv(f"{tp}prev_pyramids.{idx}.0",
                     fe + (f"prev_pyramid_{idx}",))
        out += _conv(f"{tp}next_pyramids.{idx}.0",
                     fe + (f"next_pyramid_{idx}",))
        out += _conv(f"{tp}flow_refiners.{idx}",
                     fe + (f"flow_refiner_{idx}",))
        out += _conv(f"{tp}warpers.{idx}.metric_net.0",
                     fe + (f"warper_{idx}", "metric_0"))
        out += _conv(f"{tp}warpers.{idx}.metric_net.2",
                     fe + (f"warper_{idx}", "metric_2"))
        out += _conv(f"{tp}zero_convs.{idx}",
                     fe + (f"zero_conv_{idx}", "conv"))
    return out


def warp_extractor_name_map(inject_channels: Sequence[int],
                            torch_prefix: str = "",
                            flax_prefix: Tuple[str, ...] = ()
                            ) -> List[Entry]:
    """WarpExtractor weights (`extractors.py:26-65`, enc1..enc5 ConvBlocks
    + zero convs) -> our WarpExtractor."""
    out: List[Entry] = []
    fe = flax_prefix
    tp = torch_prefix
    names = [("enc1", ("enc1",))] + [
        (f"enc{i + 2}", (f"enc_{i + 2}",))
        for i in range(len(inject_channels))]
    for tname, fname in names:
        out += _conv(f"{tp}{tname}.block.0", fe + fname + ("conv1",))
        out += _conv(f"{tp}{tname}.block.2", fe + fname + ("conv2",))
    for idx in range(len(inject_channels)):
        out += _conv(f"{tp}zero_convs.{idx}",
                     fe + (f"zero_conv_{idx}", "conv"))
    return out


def rescontrolnet_name_map(cfg: ControlNetConfig) -> List[Entry]:
    """ResControlNet (`flow_resnet.py:23-48`): trunk + FDNs like the
    DualFlow map, plus the residue + warp extractors."""
    base = controlnet_name_map(cfg)
    out = [e for e in base if not e[0].startswith("feature_extractor.")]
    out += residue_extractor_name_map(
        cfg.inject_channels, torch_prefix="feature_extractor.",
        flax_prefix=("feature_extractor",))
    out += warp_extractor_name_map(
        cfg.inject_channels, torch_prefix="warp_extractor.",
        flax_prefix=("warp_extractor",))
    return out


# ---------------------------------------------------------------------------
# LPIPS (alex)
# ---------------------------------------------------------------------------

def lpips_alex_name_map() -> List[Entry]:
    """torch `lpips.LPIPS(net='alex')` state dict -> our LPIPS module.
    AlexNet convs live at net.slice{1..5}.<idx>; lins at lin{k}.model.1."""
    out: List[Entry] = []
    slices = [("net.slice1.0", ("net", "conv1")),
              ("net.slice2.3", ("net", "conv2")),
              ("net.slice3.6", ("net", "conv3")),
              ("net.slice4.8", ("net", "conv4")),
              ("net.slice5.10", ("net", "conv5"))]
    for t, f in slices:
        out += _conv(t, f)
    for k in range(5):
        out += _conv_nobias(f"lin{k}.model.1", (f"lin{k}",))
    return out


# ---------------------------------------------------------------------------
# state-dict file loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file (.safetensors or torch.save format,
    the two formats the reference ships checkpoints in,
    `validation.py:52-53` / `train_controlnet.py:822-832`) as numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# converter core
# ---------------------------------------------------------------------------

def _transform(kind: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if kind == "conv_kernel":
        return value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if kind == "convT_kernel":
        # torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
        # (transpose_kernel=True) [kh, kw, out, in]; measured-equivalent
        # with strides s, kernel k, torch padding p <-> flax padding
        # ((k-1-p,)*2,)*2 (e.g. k=4,s=2,p=1 -> ((2,2),(2,2)))
        return value.transpose(2, 3, 1, 0)
    if kind == "conv3d_kernel":
        return value.transpose(2, 3, 4, 1, 0)  # OITHW -> THWIO
    if kind == "linear_kernel":
        return value.T
    return value


def _inverse_transform(kind: str, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if kind == "conv_kernel":
        return value.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    if kind == "convT_kernel":
        return value.transpose(3, 2, 0, 1)  # [kh,kw,out,in] -> [in,out,kh,kw]
    if kind == "conv3d_kernel":
        return value.transpose(4, 3, 0, 1, 2)  # THWIO -> OITHW
    if kind == "linear_kernel":
        return value.T
    return value


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       name_map: List[Entry], template: Dict,
                       strict: bool = True):
    """Build a flax params tree from a torch state dict.

    `template` is a freshly-initialised flax params dict (the {'params': ...}
    wrapper included or not — auto-detected); converted leaves are verified
    against the template's shapes.
    Returns (params, missing_names, unused_names).
    """
    import jax

    wrapped = "params" in template and isinstance(template["params"], dict)
    tree = jax.tree.map(np.asarray, template)
    root = tree["params"] if wrapped else tree
    missing, used = [], set()
    for tname, fpath, kind in name_map:
        if tname not in state_dict:
            missing.append(tname)
            continue
        val = _transform(kind, state_dict[tname])
        node = root
        try:
            for p in fpath[:-1]:
                node = node[p]
            want_shape = np.shape(node[fpath[-1]])
        except KeyError:
            raise KeyError(f"flax path {fpath} not found (torch {tname})")
        if tuple(want_shape) != tuple(val.shape):
            raise ValueError(
                f"shape mismatch for {tname} -> {fpath}: "
                f"{val.shape} vs template {want_shape}")
        node[fpath[-1]] = val.astype(np.asarray(node[fpath[-1]]).dtype)
        used.add(tname)
    unused = [k for k in state_dict if k not in used]
    if strict and missing:
        raise KeyError(f"missing {len(missing)} torch params, first: "
                       f"{missing[:5]}")
    return tree, missing, unused


def export_state_dict(params: Dict, name_map: List[Entry]) -> Dict[str,
                                                                   np.ndarray]:
    """Inverse: flax params -> torch-layout state dict (for tests and for
    writing reference-compatible checkpoints)."""
    wrapped = "params" in params and isinstance(params["params"], dict)
    root = params["params"] if wrapped else params
    out = {}
    for tname, fpath, kind in name_map:
        node = root
        for p in fpath:
            node = node[p]
        out[tname] = _inverse_transform(kind, np.asarray(node))
    return out
