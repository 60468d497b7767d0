"""GOP scheduling, anchor log parsing, Fréchet distance tests."""

import numpy as np
import pytest

from diffcodec_tpu.codec.anchors import (bpp_to_bitrate,
                                         parse_intra_inter_storage,
                                         parse_vvdec_poc_log,
                                         split_intra_inter_bytes,
                                         split_vvc_intra_inter,
                                         write_intra_inter_storage)
from diffcodec_tpu.codec.gop import (batch_gop_conditions, get_inter_frames,
                                     get_intra_frames, gop_schedule)
from diffcodec_tpu.eval.frechet import (activations_to_frechet,
                                        frechet_distance)


def test_inter_intra_selection():
    # uvc_codec_eval.py:19-26 parity: every gop-th frame intra
    assert get_intra_frames(8, 4) == [0, 4]
    assert get_inter_frames(8, 4) == [1, 2, 3, 5, 6, 7]
    assert get_intra_frames(9, 8) == [0, 8]
    assert get_inter_frames(4, 2) == [1, 3]


def test_gop_schedule_anchors():
    sched = gop_schedule(9, 4)
    by_target = {it.target: it for it in sched}
    assert by_target[1].anchor_prev == 0 and by_target[1].anchor_next == 4
    assert by_target[3].anchor_prev == 0 and by_target[3].anchor_next == 4
    assert by_target[5].anchor_prev == 4 and by_target[5].anchor_next == 8
    # truncated final GOP clamps the next anchor to the last frame
    sched = gop_schedule(7, 4)
    by_target = {it.target: it for it in sched}
    assert by_target[5].anchor_next == 6


def test_batch_gop_conditions():
    N, H, W = 9, 8, 8
    frames = np.random.default_rng(0).random((N, H, W, 3)).astype(np.float32)
    sched = gop_schedule(N, 4)
    flows_f = {it.target: np.full((H, W, 2), it.target, np.float32)
               for it in sched}
    flows_b = {it.target: -np.full((H, W, 2), it.target, np.float32)
               for it in sched}
    batch = batch_gop_conditions(frames, flows_f, flows_b, sched)
    assert batch["cond"].shape == (len(sched), H, W, 6)
    assert batch["flow"].shape == (len(sched), H, W, 4)
    # first item: target 1, anchors 0 and 4
    np.testing.assert_allclose(batch["cond"][0, ..., :3], frames[0])
    np.testing.assert_allclose(batch["cond"][0, ..., 3:], frames[4])
    np.testing.assert_allclose(batch["flow"][0, ..., 0], 1.0)
    np.testing.assert_allclose(batch["flow"][0, ..., 2], -1.0)


def test_bpp_to_bitrate():
    # test.sh formula: bpp * W * H * fps
    assert bpp_to_bitrate(0.05, 1920, 1080, 120) == int(
        0.05 * 1920 * 1080 * 120)


def test_intra_inter_split_and_storage(tmp_path):
    frames = [("I", 1000), ("P", 100), ("B", 50), ("I", 900), ("P", 80)]
    split = split_intra_inter_bytes(frames)
    assert split == {"intra_bytes": 1900, "inter_bytes": 230,
                     "total_bytes": 2130}
    p = str(tmp_path / "intra_inter_storage.txt")
    write_intra_inter_storage(p, split)
    assert parse_intra_inter_storage(p) == split


def test_vvdec_poc_parsing():
    log = """
vvdecapp [info]: POC    0 TId: 0 ( CRA, I-SLICE, QP 32 ) 123456 bits
vvdecapp [info]: POC    1 TId: 0 ( B-SLICE, QP 35 ) 2345 bits
POC 2 ( P-SLICE ) 999 bits
garbage line
"""
    entries = parse_vvdec_poc_log(log)
    assert (0, "I", 123456) in entries
    assert (1, "B", 2345) in entries
    assert (2, "P", 999) in entries
    split = split_vvc_intra_inter(entries)
    assert split["intra_bytes"] == 123456 // 8
    assert split["inter_bytes"] == (2345 + 999) // 8


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    d = 8
    mu = rng.standard_normal(d)
    A = rng.standard_normal((d, d))
    sigma = A @ A.T + np.eye(d)
    # identical distributions -> 0
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    # mean shift only -> squared distance
    mu2 = mu + 2.0
    np.testing.assert_allclose(frechet_distance(mu, sigma, mu2, sigma),
                               4.0 * d, rtol=1e-6)


def test_activations_to_frechet_sampling():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((5000, 4))
    b = rng.standard_normal((5000, 4)) + 1.0
    d_same = activations_to_frechet(a, a)
    d_diff = activations_to_frechet(a, b)
    assert d_same < 1e-8
    np.testing.assert_allclose(d_diff, 4.0, rtol=0.1)  # ~ ||1||^2 * d


def test_evaluate_prediction_root(tmp_path):
    """uvc_codec_eval.py walk-layout parity: {root}/{bpp_case}/{video}."""
    import json

    from PIL import Image

    from diffcodec_tpu.eval.codec_eval import (evaluate_prediction_root,
                                               evaluate_video)

    rng = np.random.default_rng(0)
    orig_root = tmp_path / "orig"
    pred_root = tmp_path / "pred" / "case_q1"
    for video in ("vidA",):
        (orig_root / video).mkdir(parents=True)
        (pred_root / video).mkdir(parents=True)
        for i in range(4):
            frame = (rng.random((176, 176, 3)) * 255).astype(np.uint8)
            Image.fromarray(frame).save(orig_root / video /
                                        f"frame_{i:04d}.png")
            noisy = np.clip(frame.astype(int) +
                            rng.integers(-6, 6, frame.shape), 0,
                            255).astype(np.uint8)
            Image.fromarray(noisy).save(pred_root / video /
                                        f"frame_{i:04d}.png")
    out_json = str(tmp_path / "inter_results.json")
    res = evaluate_prediction_root(str(tmp_path / "pred"), str(orig_root),
                                   gop_size=2, out_json=out_json)
    assert "case_q1" in res and "vidA" in res["case_q1"]
    entry = res["case_q1"]["vidA"]
    assert 25 < entry["all"]["psnr"] < 50
    assert "inter" in entry and np.isfinite(entry["inter"]["psnr"])
    with open(out_json) as f:
        assert json.load(f)["case_q1"]["vidA"]["all"]["psnr"] > 0


def test_evaluate_video_gop_phase_survives_missing_frame(tmp_path):
    """A deleted mid-GOP frame must not shift the GOP phase: inter frames
    are selected by original frame number (`uvc_codec_eval.py:19-41` applies
    get_inter_frames to the full listing before skipping missing pairs)."""
    from PIL import Image

    from diffcodec_tpu.eval.codec_eval import evaluate_video
    from diffcodec_tpu.eval.metrics import calculate_metrics_batch

    rng = np.random.default_rng(2)
    orig_dir = tmp_path / "orig"
    pred_dir = tmp_path / "pred"
    orig_dir.mkdir()
    pred_dir.mkdir()
    origs, preds = [], []
    for i in range(6):
        frame = (rng.random((176, 176, 3)) * 255).astype(np.uint8)
        # per-frame distinct noise level so each frame's PSNR is unique
        noisy = np.clip(frame.astype(int) +
                        rng.integers(-(2 + 4 * i), 3 + 4 * i, frame.shape),
                        0, 255).astype(np.uint8)
        origs.append(frame)
        preds.append(noisy)
        Image.fromarray(frame).save(orig_dir / f"frame_{i:04d}.png")
        if i != 1:  # delete inter frame 1 from the predictions
            Image.fromarray(noisy).save(pred_dir / f"frame_{i:04d}.png")

    res = evaluate_video(str(orig_dir), str(pred_dir), gop_size=2)
    assert res["all"]["skipped_frames"] == 1
    # inter frames by original index with gop 2: {1, 3, 5}; 1 is missing
    orig_arr = np.stack(origs)
    pred_arr = np.stack(preds)
    expected = calculate_metrics_batch(orig_arr[[3, 5]], pred_arr[[3, 5]])
    np.testing.assert_allclose(res["inter"]["psnr"], expected["psnr"],
                               rtol=1e-6)
    # the buggy surviving-pair indexing would have picked frames {2, 4}
    wrong = calculate_metrics_batch(orig_arr[[2, 4]], pred_arr[[2, 4]])
    assert abs(res["inter"]["psnr"] - wrong["psnr"]) > 0.1


def test_evaluate_classical_codec(tmp_path):
    """classical_codec_eval.py parity: metrics + bpp from
    intra_inter_storage.txt."""
    from PIL import Image

    from diffcodec_tpu.codec.anchors import write_intra_inter_storage
    from diffcodec_tpu.eval.codec_eval import evaluate_classical_codec

    rng = np.random.default_rng(1)
    orig_root = tmp_path / "orig"
    dec_root = tmp_path / "dec"
    (orig_root / "vidA").mkdir(parents=True)
    (dec_root / "vidA").mkdir(parents=True)
    for i in range(4):
        frame = (rng.random((176, 176, 3)) * 255).astype(np.uint8)
        Image.fromarray(frame).save(orig_root / "vidA" /
                                    f"frame_{i:04d}.png")
        Image.fromarray(frame).save(dec_root / "vidA" /
                                    f"frame_{i:04d}.png")
    write_intra_inter_storage(
        str(dec_root / "vidA" / "intra_inter_storage.txt"),
        {"intra_bytes": 8000, "inter_bytes": 2000, "total_bytes": 10000})
    res = evaluate_classical_codec(str(dec_root), str(orig_root),
                                   gop_size=2, width=176, height=176,
                                   num_frames=4)
    entry = res["vidA"]
    total_px = 4 * 176 * 176
    np.testing.assert_allclose(entry["total_bpp"], 10000 * 8 / total_px)
    np.testing.assert_allclose(entry["inter_bpp"], 2000 * 8 / total_px)
    assert entry["all"]["psnr"] == float("inf")  # identical frames
