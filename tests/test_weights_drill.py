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


@pytest.fixture(scope="module")
def aux_checkpoint_dir(tmp_path_factory):
    from diffcodec_tpu.models.weights import synthesize_aux_checkpoints

    out = str(tmp_path_factory.mktemp("aux_ckpt"))
    synthesize_aux_checkpoints(out)
    return out


def test_aux_checkpoints_load_and_forward(aux_checkpoint_dir):
    """Every net the RD sweep's metric/codec gate needs loads from its
    torch-layout file and runs forward: LPIPS, I3D (FVD), InceptionV3-64
    (FID), CMP (sparse-flow densifier).  Converter numerics are covered by
    tests/test_torch_parity.py + tests/test_metric_oracles.py; this drills
    the file layout and apply plumbing."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.eval.frechet import make_i3d_feature_fn
    from diffcodec_tpu.eval.inception import make_fid64_feature_fn
    from diffcodec_tpu.models.cmp import CMP
    from diffcodec_tpu.models.i3d import InceptionI3D
    from diffcodec_tpu.models.weights import load_aux_checkpoints
    from diffcodec_tpu.train.lpips import LPIPS

    aux = load_aux_checkpoints(aux_checkpoint_dir)
    assert set(aux) == {"lpips", "i3d", "cmp", "inception"}

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((2, 64, 64, 3), np.float32) * 2 - 1)
    b = jnp.asarray(rng.random((2, 64, 64, 3), np.float32) * 2 - 1)
    lp = np.asarray(LPIPS().apply(aux["lpips"], a, b))
    assert lp.shape[0] == 2 and np.isfinite(lp).all()

    vids = rng.random((1, 16, 64, 64, 3), np.float32)
    feats = make_i3d_feature_fn(aux["i3d"])(vids)
    assert feats.shape[0] == 1 and np.isfinite(feats).all()

    imgs = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    f = make_fid64_feature_fn(aux["inception"], batch_size=3)(imgs)
    assert f.shape == (3, 64) and np.isfinite(f).all()

    img = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    sp = jnp.asarray(rng.random((1, 64, 64, 4), np.float32))
    dense = np.asarray(CMP().apply(aux["cmp"], img, sp))
    assert dense.shape == (1, 64, 64, 2) and np.isfinite(dense).all()


def test_load_aux_checkpoints_partial(aux_checkpoint_dir, tmp_path):
    """strict=False skips absent nets (a partial aux set still enables the
    metrics it covers)."""
    import shutil

    from diffcodec_tpu.models.weights import load_aux_checkpoints

    partial = tmp_path / "partial"
    shutil.copytree(os.path.join(aux_checkpoint_dir, "lpips"),
                    partial / "lpips")
    aux = load_aux_checkpoints(str(partial), strict=False)
    assert set(aux) == {"lpips"}
    with pytest.raises(FileNotFoundError):
        load_aux_checkpoints(str(partial), strict=True)


@pytest.mark.slow
def test_rd_sweep_full_gate(tiny_checkpoint_dir, aux_checkpoint_dir,
                            tmp_path):
    """rd_sweep runs the COMPLETE gate set from on-disk torch files: SD
    stack + prompt encoding via --sd_checkpoint_dir, LPIPS/FID metrics and
    the CMP densifier via --aux_checkpoint_dir (FVD is exercised separately
    above; 4-frame clips are shorter than I3D's temporal receptive field)."""
    from PIL import Image

    from scripts.rd_sweep import main as sweep_main

    sd_dir, _ = tiny_checkpoint_dir
    rng = np.random.default_rng(0)
    root = tmp_path / "dataset" / "vid0" / "frames"
    root.mkdir(parents=True)
    for i in range(4):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                        ).save(root / f"frame_{i:04d}.png")

    out = str(tmp_path / "sweep_out")
    sweep_main(["--dataset_root", str(tmp_path / "dataset"), "--out", out,
                "--gops", "2", "--modes", "none", "--steps", "2", "--tiny",
                "--sd_checkpoint_dir", sd_dir,
                "--aux_checkpoint_dir", aux_checkpoint_dir])
    with open(os.path.join(out, "metric_results.json")) as f:
        res = json.load(f)
    m = res["2"]["vid0"]["none"]["all"]
    assert {"psnr", "ms_ssim", "lpips", "fid"} <= set(m)
    # ms_ssim is excluded: 5-level MS-SSIM with the 11px window needs
    # >=176px inputs (pytorch_msssim semantics) and is degenerate at this
    # toy 32px resolution; its numerics are oracle-tested at real sizes in
    # tests/test_metric_oracles.py
    assert all(np.isfinite(m[k]) for k in ("psnr", "lpips", "fid")), m


@pytest.mark.slow
def test_distill_eval_gate_from_checkpoint(tmp_path, monkeypatch):
    """The distillation quality gate (scripts/distill_eval.py) runs from
    an on-disk student checkpoint — the weights-readiness drill for the
    distilled decode path: when a trained student lands, the same command
    produces the real K/quality curve."""
    import sys as _sys
    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    if scripts not in _sys.path:
        _sys.path.insert(0, scripts)
    import train_distill
    import distill_eval
    from tests.test_cli_harness import _make_dataset

    idx = _make_dataset(tmp_path)
    run = str(tmp_path / "run")
    train_distill.main(["--index_file", idx, "--output_dir", run, "--tiny",
                        "--resolution", "32", "--train_batch_size", "2",
                        "--num_teacher_steps", "10", "--max_train_steps",
                        "2", "--checkpointing_steps", "2",
                        "--dataloader_num_workers", "0", "--log_every", "1"])
    out = str(tmp_path / "distill_eval.json")
    distill_eval.main(["--small", "--k_values", "1,2", "--batch", "1",
                       "--steps", "3", "--distilled_checkpoint", run,
                       "--out", out])
    with open(out) as f:
        rec = json.load(f)
    assert rec["distilled"] and rec["student_checkpoint_step"] == 2
    assert set(rec["per_k"]) == {"K1", "K2"}
    for r in rec["per_k"].values():
        assert np.isfinite(r["psnr_vs_teacher_db"])


@pytest.mark.slow
def test_rd_sweep_distilled_student(tmp_path):
    """rd_sweep --distilled_checkpoint: the RD gate runs end to end with
    the consistency student's K-step no-CFG decoder (the sweep that
    compares student vs teacher RD curves when real weights land)."""
    import sys as _sys
    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    if scripts not in _sys.path:
        _sys.path.insert(0, scripts)
    from PIL import Image
    import train_distill
    from scripts.rd_sweep import main as sweep_main
    from tests.test_cli_harness import _make_dataset

    idx = _make_dataset(tmp_path)
    run = str(tmp_path / "run")
    train_distill.main(["--index_file", idx, "--output_dir", run, "--tiny",
                        "--resolution", "32", "--train_batch_size", "2",
                        "--num_teacher_steps", "10", "--max_train_steps",
                        "2", "--checkpointing_steps", "2",
                        "--dataloader_num_workers", "0", "--log_every", "1"])

    rng = np.random.default_rng(0)
    root = tmp_path / "dataset" / "vid0" / "frames"
    root.mkdir(parents=True)
    for i in range(4):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                        ).save(root / f"frame_{i:04d}.png")
    out = str(tmp_path / "sweep_out")
    sweep_main(["--dataset_root", str(tmp_path / "dataset"), "--out", out,
                "--gops", "2", "--modes", "none", "--tiny",
                "--distilled_checkpoint", run, "--student_steps", "2"])
    with open(os.path.join(out, "metric_results.json")) as f:
        res = json.load(f)
    m = res["2"]["vid0"]["none"]["all"]
    assert np.isfinite(m["psnr"])


@pytest.mark.slow
def test_weights_day_playbook(tiny_checkpoint_dir, aux_checkpoint_dir,
                              tmp_path):
    """The one-command weights-day playbook (scripts/weights_day.py) runs
    end-to-end from synthesized checkpoints: RD sweep -> BD tables +
    reference side-by-side -> distilled gate, emitting the single
    report.  This is the exact command the first hour with real
    checkpoints uses (VERDICT r03 #4)."""
    import sys as _sys

    from PIL import Image

    from diffcodec_tpu.utils.flo_io import write_flo

    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    if scripts not in _sys.path:
        _sys.path.insert(0, scripts)
    import train_distill
    import weights_day
    from tests.test_cli_harness import _make_dataset

    sd_dir, _ = tiny_checkpoint_dir
    rng = np.random.default_rng(0)
    vdir = tmp_path / "dataset" / "vid0"
    (vdir / "frames").mkdir(parents=True)
    (vdir / "Flow").mkdir()
    (vdir / "Flow_b").mkdir()
    H = W = 64  # CMP (sparse mode) needs >= 64px
    # 16 frames: the FVD gate needs a clip at least I3D's temporal
    # receptive field long (rd_sweep gates fvd_fn on N >= 16), so the
    # drill exercises the FULL metric plumbing incl. I3D features
    for i in range(16):
        Image.fromarray((rng.random((H, W, 3)) * 255).astype(np.uint8)
                        ).save(vdir / "frames" / f"frame_{i:04d}.png")
        flow = rng.normal(0, 1.5, (H, W, 2)).astype(np.float32)
        write_flo(str(vdir / "Flow" / f"flow_{i:04d}.flo"), flow)
        write_flo(str(vdir / "Flow_b" / f"flow_{i:04d}.flo"), -flow)

    # a 2-step tiny distilled student checkpoint for stage 3
    idx = _make_dataset(tmp_path)
    run = str(tmp_path / "distill_run")
    train_distill.main(["--index_file", idx, "--output_dir", run, "--tiny",
                        "--resolution", "32", "--train_batch_size", "2",
                        "--num_teacher_steps", "10", "--max_train_steps",
                        "2", "--checkpointing_steps", "2",
                        "--dataloader_num_workers", "0", "--log_every",
                        "1"])

    out = str(tmp_path / "wd_out")
    report = weights_day.main(
        ["--sd_checkpoint_dir", sd_dir,
         "--aux_checkpoint_dir", aux_checkpoint_dir,
         "--dataset_root", str(tmp_path / "dataset"), "--out", out,
         "--gops", "2", "--modes", "none", "sparse", "--steps", "2",
         "--tiny", "--distilled_checkpoint", run, "--student_steps", "2"])

    # single report emitted, both formats
    assert os.path.exists(os.path.join(out, "weights_day_report.json"))
    md = open(os.path.join(out, "weights_day_report.md")).read()
    assert "Measured RD points" in md
    # stage 1: both rate points measured with the full metric gate
    pts = report["rd_points"]["2"]
    assert set(pts) == {"none", "sparse"}
    for bpp, mets in pts.values():
        assert bpp > 0 and np.isfinite(mets["psnr"])
        assert "lpips" in mets and "fid" in mets  # aux gates ran
        # the full metric plumbing executed: I3D features -> Frechet
        # (non-null fvd in the drill report, VERDICT r04 #7)
        assert "fvd" in mets and np.isfinite(mets["fvd"]), mets
    # sparse mode pays flow bits on top of intra
    assert pts["sparse"][0] > pts["none"][0]
    # stage 2: BD tables computed for the 2-point curve (values may be
    # NaN when the toy curve does not overlap the real anchors — the
    # structure is what the drill pins)
    assert "2" in report["bd_tables"]
    assert "psnr" in report["bd_tables"]["2"]
    assert {"H.264"} <= set(report["bd_tables"]["2"]["psnr"])
    # stage 3: distilled gate ran from the on-disk checkpoint
    assert report["distill"]["per_k"]
