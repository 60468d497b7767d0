"""HF->flax converter tests: synthesize a torch-layout state dict from a
fresh flax tree via the inverse map, convert it back, and require exact
tree equality + full name-map coverage of the flax tree."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.config import (CLIPTextConfig, ControlNetConfig,
                                  UNetConfig, VAEConfig)
from diffcodec_tpu.models.clip_text import CLIPTextEncoder
from diffcodec_tpu.models.controlnet import DualFlowControlNet
from diffcodec_tpu.models.hf_import import (clip_text_name_map,
                                            controlnet_name_map,
                                            convert_state_dict,
                                            export_state_dict,
                                            lpips_alex_name_map,
                                            unet_name_map, vae_name_map)
from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
from diffcodec_tpu.models.vae import AutoencoderKL
from diffcodec_tpu.train.lpips import LPIPS


def _randomize(tree, seed=0):
    leaves, treedef = jax.tree.flatten(tree)
    rng = np.random.default_rng(seed)
    leaves = [jnp.asarray(rng.standard_normal(np.shape(l)).astype(np.float32))
              for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _roundtrip(template, name_map):
    params = _randomize(template)
    sd = export_state_dict(params, name_map)
    # torch-side sanity: conv weights are OIHW
    converted, missing, unused = convert_state_dict(sd, name_map, template)
    assert not missing and not unused
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(converted)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    return sd


def _flax_paths(tree):
    return {tuple(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _map_paths(name_map, wrapped=True):
    return {("params",) + fpath if wrapped else fpath
            for _, fpath, _ in name_map}


def test_unet_converter_roundtrip_and_coverage():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    template = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                         jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 32)))
    nm = unet_name_map(cfg)
    sd = _roundtrip(template, nm)
    # full coverage: every flax leaf appears in the map
    assert _flax_paths(template) == _map_paths(nm)
    # torch layout: conv_in OIHW
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    assert sd["time_embedding.linear_1.weight"].shape == (128, 32)


def test_vae_converter_roundtrip_and_coverage():
    cfg = VAEConfig(base_channels=32, channel_mults=(1, 2),
                    layers_per_block=1)
    vae = AutoencoderKL(cfg)
    template = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    nm = vae_name_map(cfg)
    _roundtrip(template, nm)
    assert _flax_paths(template) == _map_paths(nm)


def test_clip_converter_roundtrip_and_coverage():
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg)
    template = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    nm = clip_text_name_map(cfg)
    _roundtrip(template, nm)
    assert _flax_paths(template) == _map_paths(nm)


def test_controlnet_converter_roundtrip_and_coverage():
    cfg = ControlNetConfig.tiny()
    net = DualFlowControlNet(cfg)
    B, H = 1, 64
    template = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((B, H // 8, H // 8, 4)),
                        jnp.zeros((B,), jnp.int32),
                        jnp.zeros((B, 3, cfg.unet.cross_attention_dim)),
                        jnp.zeros((B, H, H, 6)), jnp.zeros((B, H, H, 4)))
    nm = controlnet_name_map(cfg)
    _roundtrip(template, nm)
    assert _flax_paths(template) == _map_paths(nm)


def test_lpips_converter_roundtrip_and_coverage():
    lp = LPIPS()
    template = lp.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       jnp.zeros((1, 32, 32, 3)))
    nm = lpips_alex_name_map()
    _roundtrip(template, nm)
    assert _flax_paths(template) == _map_paths(nm)


def test_convert_rejects_shape_mismatch():
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg)
    template = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    nm = clip_text_name_map(cfg)
    sd = export_state_dict(template, nm)
    bad = dict(sd)
    key = "text_model.final_layer_norm.weight"
    bad[key] = np.zeros((7,), np.float32)
    with pytest.raises(ValueError):
        convert_state_dict(bad, nm, template)


def test_convert_strict_missing():
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg)
    template = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    nm = clip_text_name_map(cfg)
    sd = export_state_dict(template, nm)
    del sd["text_model.final_layer_norm.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(sd, nm, template)
    out, missing, unused = convert_state_dict(sd, nm, template, strict=False)
    assert len(missing) == 1
