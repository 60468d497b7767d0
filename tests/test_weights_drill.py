"""Weights-readiness drill: torch-layout checkpoints -> decode CLI.

Rehearses the day real SD-1.5 / DualFlowControlNet weights arrive:
synthesize a random-init checkpoint set in the exact diffusers directory
layout (`models.weights.synthesize_sd_checkpoint_dir`), then run the full
`scripts/run_codec.py` encode -> decode --sd_checkpoint_dir -> eval loop
on a tiny clip.  Converter numerics are covered separately by
tests/test_torch_parity.py; this covers the file layout, the CLI plumbing
and the prompt-encoding path.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_checkpoint_dir(tmp_path_factory):
    from diffcodec_tpu.config import (CLIPTextConfig, ControlNetConfig,
                                      UNetConfig, VAEConfig)
    from diffcodec_tpu.models.weights import synthesize_sd_checkpoint_dir

    out = str(tmp_path_factory.mktemp("sd_ckpt"))
    unet_cfg = UNetConfig.tiny()
    cn_cfg = ControlNetConfig.tiny()
    vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 1, 2, 2),
                        layers_per_block=1)
    clip_cfg = CLIPTextConfig.tiny()
    synthesize_sd_checkpoint_dir(out, unet_cfg, cn_cfg, vae_cfg, clip_cfg)
    return out, (unet_cfg, cn_cfg, vae_cfg, clip_cfg)


def test_checkpoint_dir_layout(tiny_checkpoint_dir):
    out, _ = tiny_checkpoint_dir
    for sub, fname in (("unet", "diffusion_pytorch_model.safetensors"),
                       ("controlnet", "diffusion_pytorch_model.safetensors"),
                       ("vae", "diffusion_pytorch_model.safetensors"),
                       ("text_encoder", "model.safetensors")):
        assert os.path.exists(os.path.join(out, sub, fname)), (sub, fname)


def test_load_sd_checkpoint_dir_values(tiny_checkpoint_dir):
    """Loaded flax params equal the on-disk torch values (spot leaves)."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    from diffcodec_tpu.models.clip_text import CLIPTextEncoder
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.models.weights import load_sd_checkpoint_dir

    out, (unet_cfg, cn_cfg, vae_cfg, clip_cfg) = tiny_checkpoint_dir
    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextEncoder(clip_cfg)
    tv = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tt = text.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, clip_cfg.max_length), jnp.int32))
    loaded = load_sd_checkpoint_dir(
        out, templates={"vae": tv, "text": tt},
        configs={"vae": vae_cfg, "text": clip_cfg})
    disk = load_file(os.path.join(out, "text_encoder", "model.safetensors"))
    got = np.asarray(
        loaded["text"]["params"]["token_embedding"]["embedding"])
    np.testing.assert_array_equal(
        got, disk["text_model.embeddings.token_embedding.weight"])
    disk_vae = load_file(os.path.join(
        out, "vae", "diffusion_pytorch_model.safetensors"))
    got_k = np.asarray(
        loaded["vae"]["params"]["decoder"]["conv_in"]["kernel"])
    np.testing.assert_array_equal(
        got_k, disk_vae["decoder.conv_in.weight"].transpose(2, 3, 1, 0))

@pytest.mark.slow
def test_decode_cli_with_checkpoint_dir(tiny_checkpoint_dir, tmp_path):
    """Full drill: encode a tiny clip, decode with --sd_checkpoint_dir,
    eval — the exact command path real weights will use."""
    from PIL import Image

    from scripts.run_codec import main

    out, _ = tiny_checkpoint_dir
    rng = np.random.default_rng(0)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(4):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                        ).save(frames_dir / f"frame_{i:04d}.png")

    enc_dir = str(tmp_path / "enc")
    dec_dir = str(tmp_path / "dec")
    main(["encode", "--frames", str(frames_dir), "--out", enc_dir,
          "--gop", "2", "--mode", "none"])
    main(["decode", "--bitstream", enc_dir, "--out", dec_dir,
          "--steps", "2", "--tiny", "--sd_checkpoint_dir", out,
          "--prompt", "a video frame", "--max_batch", "2"])
    decoded = sorted(os.listdir(dec_dir))
    assert len(decoded) == 4
    main(["eval", "--orig", str(frames_dir), "--pred", dec_dir,
          "--gop", "2"])
