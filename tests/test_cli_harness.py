"""CLI harness tests (the reference's vendored-diffusers test strategy,
`controlnet/test_controlnet.py:36-96`, rebuilt natively): launch real
training runs in-process on tiny models and assert checkpoint rotation and
resume semantics; drive the codec CLI end to end."""

import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from diffcodec_tpu.train.checkpoint import list_checkpoints
from diffcodec_tpu.utils.flo_io import write_flo


def _make_dataset(tmp_path, n=4, res=32):
    from PIL import Image
    rng = np.random.default_rng(0)
    frames = []
    for s in range(n):
        d = tmp_path / "data" / f"{s:05d}" / "0001"
        (d / "Flow").mkdir(parents=True)
        (d / "Flow_b").mkdir()
        for name in ("frame.png", "r1.png", "r2.png"):
            Image.fromarray((rng.random((res, res, 3)) * 255).astype(
                np.uint8)).save(d / name)
        flow = rng.standard_normal((res, res, 2)).astype(np.float32)
        write_flo(str(d / "Flow" / "frame.flo"), flow)
        write_flo(str(d / "Flow_b" / "frame.flo"), -flow)
        frames.append(str(d / "frame.png"))
    idx = tmp_path / "index.txt"
    idx.write_text("\n".join(frames))
    return str(idx)

@pytest.mark.slow
def test_train_cli_checkpoint_rotation_and_resume(tmp_path):
    import train_controlnet as cli

    idx = _make_dataset(tmp_path)
    out = str(tmp_path / "run")
    common = ["--index_file", idx, "--output_dir", out, "--tiny",
              "--resolution", "32", "--train_batch_size", "2",
              "--learning_rate", "1e-4", "--lr_warmup_steps", "0",
              "--checkpointing_steps", "2", "--checkpoints_total_limit", "2",
              "--log_every", "1"]
    # parity with test_controlnet.py:52-55: rotation honors the limit
    cli.main(common + ["--max_train_steps", "6"])
    steps = [s for s, _ in list_checkpoints(out)]
    assert steps == [4, 6]

    # parity with test_controlnet.py:79-96: resume continues the counter
    cli.main(common + ["--max_train_steps", "8",
                       "--resume_from_checkpoint", "latest"])
    steps = [s for s, _ in list_checkpoints(out)]
    assert steps[-1] == 8
    assert len(steps) <= 2

@pytest.mark.slow
def test_codec_cli_encode_eval(tmp_path):
    import run_codec as cli
    from PIL import Image

    rng = np.random.default_rng(1)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    yy, xx = np.mgrid[0:32, 0:32]
    for i in range(4):
        img = np.stack([(yy + i) % 256, xx, (yy + xx) // 2],
                       -1).astype(np.uint8)
        Image.fromarray(img).save(frames_dir / f"frame_{i:04d}.png")

    out = str(tmp_path / "enc")
    cli.main(["encode", "--frames", str(frames_dir), "--out", out,
              "--gop", "2", "--mode", "none"])
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["num_frames"] == 4 and meta["bpp"]["total"] > 0

    # decode with the tiny pipeline
    dec = str(tmp_path / "dec")
    cli.main(["decode", "--bitstream", out, "--out", dec, "--steps", "2",
              "--guidance", "1.0", "--tiny"])
    assert len(os.listdir(dec)) == 4

    # eval CLI runs (PSNR finite)
    cli.main(["eval", "--orig", str(frames_dir), "--pred", dec,
              "--gop", "2"])

@pytest.mark.slow
def test_train_cli_in_loop_validation(tmp_path):
    """--validation_steps triggers sampling validation with panel output
    (log_validation parity)."""
    import train_controlnet as cli

    idx = _make_dataset(tmp_path)
    out = str(tmp_path / "runv")
    cli.main(["--index_file", idx, "--validation_index_file", idx,
              "--output_dir", out, "--tiny", "--resolution", "32",
              "--train_batch_size", "2", "--max_train_steps", "2",
              "--checkpointing_steps", "100", "--validation_steps", "2",
              "--log_every", "1"])
    val_dir = os.path.join(out, "validation")
    assert os.path.isdir(val_dir) and len(os.listdir(val_dir)) > 0

@pytest.mark.slow
def test_export_checkpoint_cli(tmp_path):
    """Train 2 tiny steps, export to the reference torch layout, reimport
    through the converter and verify tensor equality."""
    import export_checkpoint as exp_cli
    import train_controlnet as train_cli
    from safetensors.numpy import load_file

    idx = _make_dataset(tmp_path)
    out = str(tmp_path / "run")
    train_cli.main(["--index_file", idx, "--output_dir", out, "--tiny",
                    "--resolution", "32", "--train_batch_size", "2",
                    "--max_train_steps", "2", "--checkpointing_steps", "2",
                    "--log_every", "1"])
    st = str(tmp_path / "cn.safetensors")
    exp_cli.main(["--checkpoint_dir", out, "--out", st, "--tiny"])
    sd = load_file(st)
    assert any(k.startswith("controlnet_down_blocks") for k in sd)
    assert any(k.startswith("feature_extractor.") for k in sd)
    # reimport through the converter round-trips
    import jax
    import jax.numpy as jnp
    from diffcodec_tpu.config import ControlNetConfig
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.hf_import import (controlnet_name_map,
                                                convert_state_dict)
    cfg = ControlNetConfig.tiny()
    net = DualFlowControlNet(cfg)
    z = jnp.zeros
    template = net.init(jax.random.PRNGKey(0), z((1, 8, 8, 4)),
                        z((1,), jnp.int32),
                        z((1, 3, cfg.unet.cross_attention_dim)),
                        z((1, 64, 64, 6)), z((1, 64, 64, 4)))
    converted, missing, unused = convert_state_dict(
        sd, controlnet_name_map(cfg), template)
    assert not missing and not unused

@pytest.mark.slow
def test_distill_cli_smoke_and_resume(tmp_path):
    """Consistency-distillation harness: tiny end-to-end run, checkpoint
    rotation, and resume (train/distill.py; no reference counterpart)."""
    import train_distill as cli

    idx = _make_dataset(tmp_path)
    out = str(tmp_path / "distill")
    common = ["--index_file", idx, "--output_dir", out, "--tiny",
              "--resolution", "32", "--train_batch_size", "2",
              "--num_teacher_steps", "10", "--num_student_steps", "2",
              "--learning_rate", "1e-4", "--lr_warmup_steps", "0",
              "--checkpointing_steps", "2", "--checkpoints_total_limit", "2",
              "--dataloader_num_workers", "0", "--log_every", "1"]
    cli.main(common + ["--max_train_steps", "4"])
    steps = [s for s, _ in list_checkpoints(out)]
    assert steps == [2, 4]
    cli.main(common + ["--max_train_steps", "6",
                       "--resume_from_checkpoint", "latest"])
    steps = [s for s, _ in list_checkpoints(out)]
    assert steps[-1] == 6 and len(steps) <= 2

@pytest.mark.slow
def test_codec_cli_distilled_decode(tmp_path):
    """decode --distilled_checkpoint: consistency-student decode through
    the codec CLI (train 2 tiny distill steps, then K-step decode)."""
    import run_codec as codec_cli
    import train_distill as distill_cli
    from PIL import Image

    idx = _make_dataset(tmp_path)
    run = str(tmp_path / "distill_run")
    distill_cli.main(["--index_file", idx, "--output_dir", run, "--tiny",
                      "--resolution", "32", "--train_batch_size", "2",
                      "--num_teacher_steps", "10", "--max_train_steps", "2",
                      "--checkpointing_steps", "2",
                      "--dataloader_num_workers", "0", "--log_every", "1"])

    rng = np.random.default_rng(2)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(4):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(
            np.uint8)).save(frames_dir / f"frame_{i:04d}.png")
    enc = str(tmp_path / "enc")
    codec_cli.main(["encode", "--frames", str(frames_dir), "--out", enc,
                    "--gop", "2", "--mode", "none"])
    dec = str(tmp_path / "dec")
    codec_cli.main(["decode", "--bitstream", enc, "--out", dec, "--tiny",
                    "--distilled_checkpoint", run, "--student_steps", "2"])
    assert len(os.listdir(dec)) == 4

@pytest.mark.slow
def test_export_distilled_student_roundtrip(tmp_path):
    """--distilled export: the EMA student round-trips through the
    reference/diffusers torch layouts (export -> convert back -> equal)."""
    import export_checkpoint as exp_cli
    import train_distill as distill_cli
    import jax
    import jax.numpy as jnp
    import numpy as np_
    from safetensors.numpy import load_file

    from diffcodec_tpu.config import ControlNetConfig, UNetConfig
    from diffcodec_tpu.models.controlnet import DualFlowControlNet
    from diffcodec_tpu.models.hf_import import (controlnet_name_map,
                                                convert_state_dict,
                                                unet_name_map)
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel

    idx = _make_dataset(tmp_path)
    run = str(tmp_path / "run")
    distill_cli.main(["--index_file", idx, "--output_dir", run, "--tiny",
                      "--resolution", "32", "--train_batch_size", "2",
                      "--num_teacher_steps", "10", "--max_train_steps", "2",
                      "--checkpointing_steps", "2",
                      "--dataloader_num_workers", "0", "--log_every", "1"])
    out = str(tmp_path / "export")
    exp_cli.main(["--distilled", "--tiny", "--checkpoint_dir", run,
                  "--out", out])
    assert sorted(os.listdir(out)) == ["controlnet.safetensors",
                                       "unet.safetensors"]

    # reimport through the converters and compare to the saved EMA tree
    from diffcodec_tpu.config import TrainConfig
    from diffcodec_tpu.train.checkpoint import restore_checkpoint
    from diffcodec_tpu.train.distill import DistillState
    from diffcodec_tpu.train.trainer import make_optimizer

    z = jnp.zeros
    unet_cfg, cn_cfg = UNetConfig.tiny(), ControlNetConfig.tiny()
    unet = UNet2DConditionModel(unet_cfg)
    cn = DualFlowControlNet(cn_cfg)
    H, h = 64, 8
    unet_t = unet.init(jax.random.PRNGKey(1), z((1, h, h, 4)),
                       z((1,), jnp.int32),
                       z((1, 3, unet_cfg.cross_attention_dim)))
    cn_t = cn.init(jax.random.PRNGKey(0), z((1, h, h, 4)),
                   z((1,), jnp.int32),
                   z((1, 3, cn_cfg.unet.cross_attention_dim)),
                   z((1, H, H, 6)), z((1, H, H, 4)))
    state = DistillState.create({"unet": unet_t, "controlnet": cn_t},
                                make_optimizer(TrainConfig()))
    restored, _ = restore_checkpoint(run, state)

    for name, template, nm, want in (
            ("unet", unet_t, unet_name_map(unet_cfg),
             restored.ema_params["unet"]),
            ("controlnet", cn_t, controlnet_name_map(cn_cfg),
             restored.ema_params["controlnet"])):
        sd = load_file(os.path.join(out, f"{name}.safetensors"))
        back, _, _ = convert_state_dict(sd, nm, template, strict=False)
        for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(want)):
            np_.testing.assert_allclose(np_.asarray(a), np_.asarray(b),
                                        atol=1e-6)


@pytest.mark.slow
def test_train_cli_latent_cache(tmp_path):
    """--latent_cache_dir: precomputes moments once, trains from them,
    and reuses the cache on a second run."""
    import train_controlnet as cli

    idx = _make_dataset(tmp_path)
    out = str(tmp_path / "run")
    cache = str(tmp_path / "latcache")
    common = ["--index_file", idx, "--output_dir", out, "--tiny",
              "--resolution", "32", "--train_batch_size", "2",
              "--learning_rate", "1e-4", "--lr_warmup_steps", "0",
              "--checkpointing_steps", "2", "--log_every", "1",
              "--dataloader_num_workers", "0",
              "--latent_cache_dir", cache]
    cli.main(common + ["--max_train_steps", "2"])
    moments = [f for f in os.listdir(cache) if f.endswith(".npy")]
    assert len(moments) == 4
    meta = json.load(open(os.path.join(cache, "latent_cache_meta.json")))
    assert meta["count"] == 4
    stamps = {f: os.path.getmtime(os.path.join(cache, f)) for f in moments}
    # second run resumes and REUSES the cache (no recompute)
    cli.main(common + ["--max_train_steps", "4",
                       "--resume_from_checkpoint", "latest"])
    for f, t in stamps.items():
        assert os.path.getmtime(os.path.join(cache, f)) == t
    # res variant refuses the flag
    with pytest.raises(SystemExit):
        cli.main(common + ["--max_train_steps", "2",
                           "--model_variant", "res"])
