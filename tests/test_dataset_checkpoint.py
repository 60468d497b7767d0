"""Data pipeline + checkpointing tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.train.checkpoint import (list_checkpoints,
                                            restore_checkpoint,
                                            save_checkpoint,
                                            warm_start_filter)
from diffcodec_tpu.train.dataset import (UniDataset, adaptive_avg_pool_flow,
                                         color_jitter, load_caption_dict)
from diffcodec_tpu.utils.flo_io import write_flo


def test_caption_dict_key_zfill(tmp_path):
    p = tmp_path / "captions.txt"
    p.write_text("data/42/0007/frame.png: a red car\n"
                 "bad line without colonish\n"
                 "x/00123/0001/f.png: hello\n")
    d = load_caption_dict(str(p))
    assert d["00042_0007"] == "a red car"
    assert d["00123_0001"] == "hello"


def test_adaptive_avg_pool_flow_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    flow = rng.standard_normal((37, 53, 2)).astype(np.float32)
    got = adaptive_avg_pool_flow(flow, 16, 16)
    want = F.adaptive_avg_pool2d(
        torch.from_numpy(flow.transpose(2, 0, 1))[None], (16, 16)
    )[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_color_jitter_shared_params():
    rng = np.random.default_rng(1)
    a = (np.random.default_rng(2).random((16, 16, 3)) * 255).astype(np.uint8)
    out1, out2 = color_jitter([a, a], rng)
    np.testing.assert_array_equal(out1, out2)  # same params, same input
    assert out1.dtype == np.uint8


def _make_dataset(tmp_path, n_seqs=2):
    from PIL import Image
    rng = np.random.default_rng(3)
    frames = []
    for s in range(n_seqs):
        d = tmp_path / "data" / f"{s:05d}" / "0001"
        (d / "Flow").mkdir(parents=True)
        (d / "Flow_b").mkdir()
        for name in ("frame.png", "r1.png", "r2.png"):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / name)
        flow = rng.standard_normal((64, 64, 2)).astype(np.float32)
        write_flo(str(d / "Flow" / "frame.flo"), flow)
        write_flo(str(d / "Flow_b" / "frame.flo"), -flow)
        frames.append(str(d / "frame.png"))
    idx = tmp_path / "index.txt"
    idx.write_text("\n".join(frames))
    cap = tmp_path / "captions.txt"
    cap.write_text("data/0/0001/frame.png: test caption\n")
    return str(cap), str(idx)


def test_unidataset_sample_layout(tmp_path):
    cap, idx = _make_dataset(tmp_path)
    ds = UniDataset(cap, idx, resolution=64, drop_txt_prob=0.0,
                    transform=True)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["cond"].shape == (64, 64, 6)
    assert 0.0 <= s["cond"].min() and s["cond"].max() <= 1.0
    assert s["flow"].shape == (64, 64, 4)
    assert s["text"] == "test caption"
    # fwd and bwd flows were written as negatives of each other
    np.testing.assert_allclose(s["flow"][..., :2], -s["flow"][..., 2:],
                               atol=1e-5)


def test_unidataset_text_dropout(tmp_path):
    cap, idx = _make_dataset(tmp_path)
    ds = UniDataset(cap, idx, resolution=64, drop_txt_prob=1.0,
                    transform=False)
    assert ds[0]["text"] == ""


def test_unidataset_batching(tmp_path):
    cap, idx = _make_dataset(tmp_path, n_seqs=4)
    ds = UniDataset(cap, idx, resolution=64, transform=False)
    batches = list(ds.iter_batches(2))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert len(batches[0]["text"]) == 2


def test_checkpoint_save_restore_rotate(tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    state = {"params": {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))},
             "step": jnp.asarray(5)}
    save_checkpoint(ckpt_dir, 5, state, total_limit=2)
    state2 = jax.tree.map(lambda x: x + 1, state)
    save_checkpoint(ckpt_dir, 10, state2, total_limit=2)
    save_checkpoint(ckpt_dir, 15, state2, total_limit=2)
    steps = [s for s, _ in list_checkpoints(ckpt_dir)]
    assert steps == [10, 15]  # rotation dropped checkpoint-5

    restored, step = restore_checkpoint(ckpt_dir, state)
    assert step == 15
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(state2["params"]["w"]))
    # explicit step
    restored, step = restore_checkpoint(ckpt_dir, state, step=10)
    assert step == 10
    # missing -> (None, 0)
    restored, step = restore_checkpoint(str(tmp_path / "none"), state)
    assert restored is None and step == 0


def test_warm_start_filter():
    params = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)),
              "c": jnp.zeros((4,))}
    loaded = {"a": jnp.ones((2, 2)), "b": jnp.ones((5,))}  # b shape mismatch
    out, copied = warm_start_filter(params, loaded)
    assert copied == 1
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["c"]), 0.0)


def test_unidataset_validate(tmp_path):
    cap, idx = _make_dataset(tmp_path, n_seqs=3)
    ds = UniDataset(cap, idx, resolution=64, transform=False)
    ok, errors = ds.validate()
    assert ok == 3 and errors == []
    # corrupt one target image -> collected, not raised
    bad = ds.video_frames[1]
    with open(bad, "wb") as f:
        f.write(b"not a png")
    ok, errors = ds.validate()
    assert ok == 2
    assert len(errors) == 1 and errors[0][0] == 1
