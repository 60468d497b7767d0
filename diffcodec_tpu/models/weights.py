"""Pretrained-checkpoint directory loading (the weights-readiness path).

The reference consumes a diffusers `save_pretrained` layout: an SD-1.5
root with `vae/`, `unet/`, `text_encoder/` subfolders
(`train_controlnet.py:790-814`) plus a trained DualFlowControlNet state
dict (`validation.py:52-53`, safetensors).  `load_sd_checkpoint_dir`
converts all of them through `models.hf_import` into a flax pipeline
params dict, so the day real weights land on disk the decode CLI
(`scripts/run_codec.py decode --sd_checkpoint_dir ...`) is a no-op.

`synthesize_sd_checkpoint_dir` writes a randomly-initialized checkpoint
set in the exact torch layout — the rehearsal fixture for the drill (the
numeric fidelity of the converters themselves is covered by
tests/test_torch_parity.py against real torch forwards).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from diffcodec_tpu.models import hf_import

# diffusers save_pretrained weight filenames, in preference order
_WEIGHT_NAMES = ("diffusion_pytorch_model.safetensors",
                 "model.safetensors",
                 "diffusion_pytorch_model.bin",
                 "pytorch_model.bin")


def find_weight_file(subdir: str) -> Optional[str]:
    for name in _WEIGHT_NAMES:
        path = os.path.join(subdir, name)
        if os.path.exists(path):
            return path
    return None


def load_sd_checkpoint_dir(sd_dir: str, templates: Dict[str, Dict],
                           configs: Dict[str, object],
                           controlnet_path: Optional[str] = None,
                           strict: bool = True) -> Dict[str, Dict]:
    """Load an SD-1.5 checkpoint root into flax params.

    templates: {'vae': ..., 'unet': ..., 'text': ..., 'controlnet': ...}
    freshly-initialized flax params (any subset).  configs: matching
    {'vae': VAEConfig, 'unet': UNetConfig, 'text': CLIPTextConfig,
    'controlnet': ControlNetConfig}.  controlnet_path overrides the
    `controlnet/` subfolder (e.g. a checkpoint-97000 safetensors file).
    Returns {name: converted_params} for every template with weights found.
    """
    name_maps = {
        "vae": lambda: hf_import.vae_name_map(configs["vae"]),
        "unet": lambda: hf_import.unet_name_map(configs["unet"]),
        "text": lambda: hf_import.clip_text_name_map(configs["text"]),
        "controlnet": lambda: hf_import.controlnet_name_map(
            configs["controlnet"]),
    }
    subdirs = {"vae": "vae", "unet": "unet", "text": "text_encoder",
               "controlnet": "controlnet"}
    out = {}
    for name, template in templates.items():
        if name == "controlnet" and controlnet_path:
            path = controlnet_path
        else:
            path = find_weight_file(os.path.join(sd_dir, subdirs[name]))
        if path is None:
            if strict:
                raise FileNotFoundError(
                    f"no weight file for '{name}' under {sd_dir}/"
                    f"{subdirs[name]} (expected one of {_WEIGHT_NAMES})")
            continue
        sd = hf_import.load_torch_state_dict(path)
        params, missing, _ = hf_import.convert_state_dict(
            sd, name_maps[name](), template, strict=strict)
        out[name] = params
    return out


def synthesize_sd_checkpoint_dir(out_dir: str, unet_cfg, cn_cfg, vae_cfg,
                                 clip_cfg, seed: int = 0) -> str:
    """Write a random-init torch-layout SD checkpoint root (drill fixture).

    Initializes the flax models, exports each through the inverse name maps
    to safetensors files in the diffusers directory layout.
    """
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from diffcodec_tpu.models.clip_text import CLIPTextEncoder
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL

    rng = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    H = 8 * 8  # tiny spatial extent is enough to materialize all params
    h = H // 8
    L, D = 8, unet_cfg.cross_attention_dim
    z = jnp.zeros

    unet = UNet2DConditionModel(unet_cfg)
    cn = DualFlowControlNet(cn_cfg)
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextEncoder(clip_cfg)

    sample = z((1, h, h, 4))
    t0 = z((1,), jnp.int32)
    ctx = z((1, L, D))
    jobs = [
        ("unet", unet.init(k1, sample, t0, ctx),
         hf_import.unet_name_map(unet_cfg),
         "diffusion_pytorch_model.safetensors"),
        ("controlnet",
         cn.init(k2, sample, t0, ctx, z((1, H, H, 6)), z((1, H, H, 4))),
         hf_import.controlnet_name_map(cn_cfg),
         "diffusion_pytorch_model.safetensors"),
        ("vae", vae.init(k3, z((1, H, H, 3))),
         hf_import.vae_name_map(vae_cfg), "diffusion_pytorch_model.safetensors"),
        ("text_encoder",
         text.init(k4, z((1, clip_cfg.max_length), jnp.int32)),
         hf_import.clip_text_name_map(clip_cfg), "model.safetensors"),
    ]
    for sub, params, name_map, fname in jobs:
        # re-randomize leaves so the fixture isn't all zero-init convs
        leaves, treedef = jax.tree.flatten(params)
        rng_np = np.random.default_rng(seed)
        leaves = [np.asarray(rng_np.standard_normal(np.shape(x)) * 0.02,
                             np.float32) for x in leaves]
        params = jax.tree.unflatten(treedef, leaves)
        sd = hf_import.export_state_dict(params, name_map)
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  os.path.join(out_dir, sub, fname))
    return out_dir
