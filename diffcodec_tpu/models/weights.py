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


def _aux_specs():
    """The auxiliary torch networks the RD sweep's full metric/codec gate
    needs beyond the SD stack: LPIPS-alex (perceptual metric + train loss,
    `controlnet/lpips_loss.py:96-107`), I3D (FVD, `fvd_utils.py`), the
    InceptionV3 FID-64 prefix (`test_utils.py:47-56`), and CMP (sparse->
    dense flow completion at decode, `cmp/models/cmp.py:30-43`).

    Returns {name: (subdir, build_template(), params_map, stats_map)}.
    stats_map is None for networks without BatchNorm running stats.
    """
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.eval.inception import (InceptionFID64,
                                              inception64_batch_stats_map,
                                              inception64_name_map)
    from diffcodec_tpu.models.cmp import (CMP, cmp_batch_stats_map,
                                          cmp_name_map)
    from diffcodec_tpu.models.i3d import (InceptionI3D, i3d_batch_stats_map,
                                          i3d_name_map)
    from diffcodec_tpu.train.lpips import LPIPS

    z, k = jnp.zeros, jax.random.PRNGKey(0)

    def lpips_tmpl():
        return LPIPS().init(k, z((1, 64, 64, 3)), z((1, 64, 64, 3)))

    def i3d_tmpl():
        return InceptionI3D(num_classes=400).init(k, z((1, 16, 64, 64, 3)))

    def cmp_tmpl():
        return CMP().init(k, z((1, 64, 64, 3)), z((1, 64, 64, 4)))

    def fid_tmpl():
        return InceptionFID64().init(k, z((1, 299, 299, 3)))

    return {
        "lpips": ("lpips", lpips_tmpl, hf_import.lpips_alex_name_map, None),
        "i3d": ("i3d", i3d_tmpl, i3d_name_map, i3d_batch_stats_map),
        "cmp": ("cmp", cmp_tmpl, cmp_name_map, cmp_batch_stats_map),
        "inception": ("inception", fid_tmpl, inception64_name_map,
                      inception64_batch_stats_map),
    }


def load_aux_checkpoints(root: str, which=None, strict: bool = True
                         ) -> Dict[str, Dict]:
    """Load the auxiliary torch checkpoints under `root` into flax variables.

    Layout: {root}/{lpips,i3d,cmp,inception}/<any _WEIGHT_NAMES file>.
    Returns {name: variables} where variables carries 'params' (and
    'batch_stats' where the net has running stats) — directly applyable.
    Missing subdirs are skipped when strict=False (so a partial aux set
    still enables the metrics it covers).
    """
    import jax

    out = {}
    for name, (sub, tmpl_fn, pmap_fn, smap_fn) in _aux_specs().items():
        if which is not None and name not in which:
            continue
        path = find_weight_file(os.path.join(root, sub))
        if path is None:
            if strict:
                raise FileNotFoundError(
                    f"no weight file for '{name}' under {root}/{sub}")
            continue
        sd = hf_import.load_torch_state_dict(path)
        template = tmpl_fn()
        params, _, _ = hf_import.convert_state_dict(
            sd, pmap_fn(), template["params"], strict=strict)
        variables = {"params": params}
        if smap_fn is not None:
            stats, _, _ = hf_import.convert_state_dict(
                sd, smap_fn(), template["batch_stats"], strict=strict)
            variables["batch_stats"] = stats
        out[name] = variables
    return out


def synthesize_aux_checkpoints(out_dir: str, which=None,
                               seed: int = 0) -> str:
    """Write random-init torch-layout aux checkpoints (drill fixture for
    `load_aux_checkpoints`) — one safetensors file per net, state-dict key
    names exactly as the torch originals publish them."""
    import jax
    from safetensors.numpy import save_file

    for name, (sub, tmpl_fn, pmap_fn, smap_fn) in _aux_specs().items():
        if which is not None and name not in which:
            continue
        template = tmpl_fn()
        rng_np = np.random.default_rng(seed)
        template = jax.tree.map(
            lambda x: np.asarray(rng_np.standard_normal(np.shape(x)) * 0.02,
                                 np.float32), template)
        sd = hf_import.export_state_dict(template["params"], pmap_fn())
        if smap_fn is not None:
            # running_var must stay positive for BN-folded forwards
            stats = jax.tree.map(lambda x: np.abs(x) + 0.5,
                                 template["batch_stats"])
            sd.update(hf_import.export_state_dict(stats, smap_fn()))
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  os.path.join(out_dir, sub,
                               "diffusion_pytorch_model.safetensors"))
    return out_dir


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
