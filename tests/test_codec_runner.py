"""End-to-end codec integration test: encode -> decode with a tiny
diffusion decoder, all three flow-rate modes."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.codec.runner import (EncodedVideo, decode_dense_flow,
                                        decode_video, encode_dense_flow,
                                        encode_video)
from diffcodec_tpu.config import (CodecConfig, ControlNetConfig,
                                  SamplerConfig, SchedulerConfig, UNetConfig,
                                  VAEConfig)


def _synthetic_video(n=8, H=64, W=64, seed=0):
    """Moving-gradient video (smooth, JPEG-friendly)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32)
    base = base / base.max() * 200 + 20
    frames = []
    for t in range(n):
        shifted = np.roll(base, shift=t * 2, axis=1)
        frames.append(shifted)
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


def test_dense_flow_roundtrip():
    rng = np.random.default_rng(1)
    flow = rng.standard_normal((32, 48, 2)).astype(np.float32) * 5
    data = encode_dense_flow(flow)
    got = decode_dense_flow(data)
    assert got.shape == flow.shape
    np.testing.assert_allclose(got, flow, atol=0.05)  # f16 quantization
    assert len(data) < flow.nbytes  # actually compressed


@pytest.mark.parametrize("mode", ["none", "sparse", "dense"])
def test_encode_decode_roundtrip(tmp_path, mode):
    frames = _synthetic_video()
    N, H, W = frames.shape[:3]
    cfg = CodecConfig(gop_size=4, flow_rate_mode=mode)
    flows = {t: np.full((H, W, 2), 2.0, np.float32) for t in range(N)}
    enc = encode_video(frames, str(tmp_path / "enc"), cfg,
                       flows_fwd=flows, flows_bwd=flows,
                       sparse_bg_ratio=40 / (H * W))
    assert enc.meta["bpp"]["total"] > 0
    if mode == "none":
        assert enc.meta["bpp"]["flow"] == 0
    else:
        assert enc.meta["bpp"]["flow"] > 0
    # reports exist and are parseable
    from diffcodec_tpu.codec.bits import parse_avg_size_any
    intra_avg = parse_avg_size_any(
        str(tmp_path / "enc" / "intra" / "compression_report.txt"))
    assert intra_avg > 0

    # decoder stub: returns the average of the two anchors (checks wiring
    # without diffusion cost); verifies cond/flow batch layout
    captured = {}

    def sample_fn(cond, flow):
        captured["cond"] = cond
        captured["flow"] = flow
        avg01 = 0.5 * (cond[..., :3] + cond[..., 3:])
        return avg01 * 2.0 - 1.0

    reloaded = EncodedVideo.load(str(tmp_path / "enc"))
    out = decode_video(reloaded, sample_fn)
    assert out.shape == frames.shape
    # intra frames survive JPEG roundtrip approximately
    assert np.abs(out[0].astype(int) - frames[0].astype(int)).mean() < 12
    # inter frames = anchor average (stub decoder output propagated)
    n_inter = captured["cond"].shape[0]
    assert n_inter == 6  # 8 frames, gop 4 -> 6 inter
    if mode != "none":
        assert np.abs(captured["flow"]).max() > 0
    else:
        assert np.abs(captured["flow"]).max() == 0

@pytest.mark.slow
def test_decode_with_tiny_diffusion_decoder(tmp_path):
    """Full path incl. the real jitted pipeline on a tiny model."""
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from diffcodec_tpu.models.vae import AutoencoderKL
    from diffcodec_tpu.sampling.pipeline import DualFlowPipeline
    from diffcodec_tpu.sampling.schedulers import NoiseSchedule

    frames = _synthetic_video(n=4, H=32, W=32)
    cfg = CodecConfig(gop_size=2, flow_rate_mode="none")
    enc = encode_video(frames, str(tmp_path / "enc"), cfg)

    unet = UNet2DConditionModel(UNetConfig.tiny())
    cn = DualFlowControlNet(ControlNetConfig.tiny())
    vae = AutoencoderKL(VAEConfig(base_channels=8,
                                  channel_mults=(1, 1, 2, 2),
                                  layers_per_block=1))
    pipe = DualFlowPipeline(
        unet=unet, controlnet=cn, vae=vae,
        schedule=NoiseSchedule.create(SchedulerConfig()),
        sampler=SamplerConfig(num_inference_steps=2, guidance_scale=1.0,
                              freeu=False))
    B, H = 2, 32
    z = jnp.zeros
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "unet": unet.init(k1, z((B, 4, 4, 4)), z((B,), jnp.int32),
                          z((B, 5, 32))),
        "controlnet": cn.init(k2, z((B, 4, 4, 4)), z((B,), jnp.int32),
                              z((B, 5, 32)), z((B, H, H, 6)),
                              z((B, H, H, 4))),
        "vae": vae.init(k3, z((B, H, H, 3))),
    }
    text = z((2, 5, 32))

    def sample_fn(cond, flow):
        return pipe.sample(params, jax.random.PRNGKey(1), text, text,
                           jnp.asarray(cond), jnp.asarray(flow))

    out = decode_video(enc, sample_fn)
    assert out.shape == frames.shape
    assert out.dtype == np.uint8


def test_sparse_decode_with_cmp_densifier(tmp_path):
    """'sparse' mode decode through a real (tiny) CMP densifier — the full
    sparse-motion decompression path (SURVEY.md section 3.5)."""
    from diffcodec_tpu.models.cmp import CMP

    frames = _synthetic_video(n=4, H=64, W=64)
    cfg = CodecConfig(gop_size=2, flow_rate_mode="sparse")
    N, H, W = frames.shape[:3]
    flows = {t: np.full((H, W, 2), 1.5, np.float32) for t in range(N)}
    enc = encode_video(frames, str(tmp_path / "enc"), cfg,
                       flows_fwd=flows, flows_bwd=flows,
                       sparse_bg_ratio=30 / (H * W))

    cmp = CMP(img_enc_dim=8, sparse_enc_dim=4, nbins=9, fmax=50.0)
    variables = cmp.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                         jnp.zeros((1, H, W, 4)))

    calls = {"n": 0}

    def densify_fn(sparse, mask, anchor):
        calls["n"] += 1
        inp = np.concatenate([sparse, mask[..., :2].astype(np.float32)], -1)
        out = cmp.apply(variables, jnp.asarray(anchor[None]),
                        jnp.asarray(inp[None]))
        return np.asarray(out)[0]

    def sample_fn(cond, flow):
        assert np.isfinite(np.asarray(flow)).all()
        return (0.5 * (cond[..., :3] + cond[..., 3:])) * 2 - 1

    out = decode_video(EncodedVideo.load(str(tmp_path / "enc")), sample_fn,
                       densify_fn=densify_fn)
    assert out.shape == frames.shape
    assert calls["n"] == 2 * 2  # 2 inter frames x fwd/bwd


def test_decode_video_chunked_batches(tmp_path):
    """Long sequences decode in max_batch chunks with tail padding (only
    two program shapes)."""
    frames = _synthetic_video(n=12, H=32, W=32)
    enc = encode_video(frames, str(tmp_path / "enc"),
                       CodecConfig(gop_size=4, flow_rate_mode="none"))
    seen = []

    def sample_fn(cond, flow):
        seen.append(cond.shape[0])
        return (0.5 * (cond[..., :3] + cond[..., 3:])) * 2 - 1

    out = decode_video(EncodedVideo.load(str(tmp_path / "enc")), sample_fn,
                       max_batch=4)
    # 9 inter frames -> chunks of 4, 4, then padded tail 4
    assert seen == [4, 4, 4]
    assert out.shape == frames.shape
    # chunked result identical to unchunked
    seen2 = []

    def sample_fn2(cond, flow):
        seen2.append(cond.shape[0])
        return (0.5 * (cond[..., :3] + cond[..., 3:])) * 2 - 1

    out2 = decode_video(EncodedVideo.load(str(tmp_path / "enc")),
                        sample_fn2, max_batch=0)
    assert seen2 == [9]
    np.testing.assert_array_equal(out, out2)


def test_decode_video_device_u8_fetch_bit_identical(tmp_path):
    """The pipelined device-side uint8 conversion (nan_to_num -> clip ->
    truncating cast, fetched at 1 byte/px) is bit-identical to the former
    host-side f32-fetch path, including non-finite sampler outputs."""
    frames = _synthetic_video(n=9, H=32, W=32)
    enc = encode_video(frames, str(tmp_path / "enc"),
                       CodecConfig(gop_size=4, flow_rate_mode="none"))

    @jax.jit
    def net(cond, flow):
        x = jnp.tanh(cond[..., :3] * 2.0 - 1.0 + 0.1 * flow[..., :1])
        x = x.at[0, 0, 0, 0].set(jnp.nan)
        x = x.at[0, 0, 1, 0].set(jnp.inf)
        return x.at[0, 0, 2, 0].set(-jnp.inf)

    # device-array-returning sample_fn: exercises the jitted _to_u8 fetch
    out_dev = decode_video(EncodedVideo.load(str(tmp_path / "enc")),
                           net, max_batch=2)

    # host-array-returning sample_fn: exercises the former host math
    def net_host(cond, flow):
        return np.asarray(net(cond, flow), np.float32)

    out_host = decode_video(EncodedVideo.load(str(tmp_path / "enc")),
                            net_host, max_batch=2)
    np.testing.assert_array_equal(out_dev, out_host)
