"""End-to-end video codec: encode (anchors + flow bits) / decode (diffusion).

This is the orchestration layer the reference spreads across notebooks and
eval scripts (SURVEY.md sections 0, 3.2): I-frames are stored compressed
(JPEG anchors, the reference's `decoded_q1` intra stream); inter frames
carry only flow bits (mode 'none' none, 'sparse' CMP-decodable point lists,
'dense' full fields) and are REGENERATED at decode time by the
ControlNet-conditioned denoise pipeline, batched over (GOP inter-frames x
tiles) so the whole sequence decodes in parallel on the mesh.

Bitstream layout (directory-based, mirroring the reference's per-video
dirs + compression_report.txt files so the bpp accounting is identical):
  {out}/intra/frame_%04d.jpg            anchor JPEGs
  {out}/intra/compression_report.txt
  {out}/flow_fwd/flow_%04d.sfl          sparse (or .dfl dense) bitstreams
  {out}/flow_fwd/compression_report.txt
  {out}/flow_bwd/...
  {out}/meta.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import zlib
from typing import Callable, Dict, Optional

import numpy as np
import jax.numpy as jnp

from diffcodec_tpu.codec.bits import (decode_sparse_flow, encode_sparse_flow,
                                      write_compression_report)
from diffcodec_tpu.codec.gop import (batch_gop_conditions,
                                     get_intra_frames, gop_schedule)
from diffcodec_tpu.codec.sparse_flow import flow_sampler
from diffcodec_tpu.config import CodecConfig


def encode_dense_flow(flow: np.ndarray) -> bytes:
    """Dense-mode flow payload: float16 + zlib (the reference stores
    compressed dense RAFT flow; sizes tracked via the report)."""
    H, W = flow.shape[:2]
    header = np.asarray([H, W], "<u4").tobytes()
    return header + zlib.compress(flow.astype("<f2").tobytes(), 6)


def decode_dense_flow(data: bytes) -> np.ndarray:
    H, W = np.frombuffer(data[:8], "<u4")
    raw = zlib.decompress(data[8:])
    return np.frombuffer(raw, "<f2").astype(np.float32).reshape(H, W, 2)


def _jpeg_roundtrip(frame_u8: np.ndarray, quality: int):
    """JPEG-encode one frame; returns (decoded uint8 frame, nbytes)."""
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(frame_u8).save(buf, format="JPEG", quality=quality)
    nbytes = buf.tell()
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB")), nbytes


@dataclasses.dataclass
class EncodedVideo:
    path: str
    meta: Dict

    @classmethod
    def load(cls, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            return cls(path=path, meta=json.load(f))


def encode_video(frames: np.ndarray, out_dir: str,
                 cfg: CodecConfig = CodecConfig(),
                 flows_fwd: Optional[Dict[int, np.ndarray]] = None,
                 flows_bwd: Optional[Dict[int, np.ndarray]] = None,
                 intra_quality: int = 30,
                 sparse_strategy=("watershed", "grid"),
                 sparse_bg_ratio: float = 130.0 / (1080 * 1920)
                 ) -> EncodedVideo:
    """Encode [N,H,W,3] uint8 frames.

    flows_* map inter-frame index -> [H,W,2] flow (fwd: prev-anchor->target,
    bwd: next-anchor->target).  Required for 'sparse'/'dense' modes; the
    flow estimator (RAFT in the reference) is an input, not part of the
    codec.
    """
    N, H, W = frames.shape[:3]
    os.makedirs(out_dir, exist_ok=True)
    intra_dir = os.path.join(out_dir, "intra")
    os.makedirs(intra_dir, exist_ok=True)
    schedule = gop_schedule(N, cfg.gop_size)

    intra_report = {}
    for i in get_intra_frames(N, cfg.gop_size):
        decoded, nbytes = _jpeg_roundtrip(frames[i], intra_quality)
        from PIL import Image
        Image.fromarray(decoded).save(
            os.path.join(intra_dir, f"frame_{i:04d}.png"))
        # store the actual jpg too (the real payload)
        Image.fromarray(frames[i]).save(
            os.path.join(intra_dir, f"frame_{i:04d}.jpg"),
            quality=intra_quality)
        intra_report[f"frame_{i:04d}.jpg"] = nbytes
    write_compression_report(os.path.join(intra_dir,
                                          "compression_report.txt"),
                             intra_report)

    flow_bytes = {"fwd": {}, "bwd": {}}
    if cfg.flow_rate_mode != "none":
        if flows_fwd is None or flows_bwd is None:
            raise ValueError(
                f"flow_rate_mode={cfg.flow_rate_mode!r} requires flows")
        rng = np.random.default_rng(0)
        for direction, flows in (("fwd", flows_fwd), ("bwd", flows_bwd)):
            fdir = os.path.join(out_dir, f"flow_{direction}")
            os.makedirs(fdir, exist_ok=True)
            report = {}
            for item in schedule:
                flow = flows[item.target]
                if cfg.flow_rate_mode == "sparse":
                    sparse, mask = flow_sampler(
                        flow, strategy=sparse_strategy,
                        bg_ratio=sparse_bg_ratio, rng=rng)
                    data = encode_sparse_flow(sparse, mask)
                    ext = "sfl"
                else:
                    data = encode_dense_flow(flow)
                    ext = "dfl"
                name = f"flow_{item.target:04d}.{ext}"
                with open(os.path.join(fdir, name), "wb") as f:
                    f.write(data)
                report[name] = len(data)
                flow_bytes[direction][item.target] = len(data)
            write_compression_report(
                os.path.join(fdir, "compression_report.txt"), report)

    total_pixels = N * H * W
    intra_bits = sum(intra_report.values()) * 8
    flow_bits = sum(sum(d.values()) for d in flow_bytes.values()) * 8
    meta = {
        "num_frames": N, "height": H, "width": W,
        "gop_size": cfg.gop_size, "flow_rate_mode": cfg.flow_rate_mode,
        "intra_quality": intra_quality,
        "bpp": {
            "intra": intra_bits / total_pixels,
            "flow": flow_bits / total_pixels,
            "total": (intra_bits + flow_bits) / total_pixels,
        },
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return EncodedVideo(path=out_dir, meta=meta)


def make_cmp_densifier(cmp_model, variables, batch_size: int = 8):
    """Adapter: CMP network -> `decode_video` densify_fn.

    Builds the 4-channel sparse input (flow + mask, `cmp/models/modules/
    shallownet.py` input convention) and runs the jitted CMP on device.
    """
    import jax
    import jax.numpy as jnp

    apply = jax.jit(lambda img, sp: cmp_model.apply(variables, img, sp))

    def densify_fn(sparse: np.ndarray, mask: np.ndarray,
                   anchor: np.ndarray) -> np.ndarray:
        inp = np.concatenate(
            [sparse, mask[..., :2].astype(np.float32)], axis=-1)
        out = apply(jnp.asarray(anchor[None], jnp.float32),
                    jnp.asarray(inp[None], jnp.float32))
        return np.asarray(out)[0]

    return densify_fn


def decode_video(enc: EncodedVideo,
                 sample_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
                 densify_fn: Optional[Callable] = None,
                 max_batch: int = 7,
                 transfer_dtype=None) -> np.ndarray:
    """Decode to [N,H,W,3] uint8.

    sample_fn(cond [B,H,W,6] in [0,1], flow [B,H,W,4] px) -> [B,H,W,3] in
    [-1,1] — the diffusion decoder (DualFlowPipeline.sample bound to params
    and text embeddings; batching over inter frames happens here).  The
    arguments arrive as read-only jax device arrays (float32 by default;
    the whole sequence is uploaded once and chunks are sliced on device).
    densify_fn(sparse [H,W,2], mask [H,W,2], anchor [H,W,3]) -> [H,W,2]
    dense flow — the CMP network for 'sparse' mode (identity default: use
    the decoded sparse field as-is).
    max_batch: inter frames per sampler call (one GOP-8 of 512px frames
    saturates a v5e chip's HBM; long sequences decode in chunks — the last
    chunk is padded to max_batch so only two program shapes ever compile).
    transfer_dtype: upload dtype for the conditioning (pass the pipeline's
    compute dtype, e.g. jnp.bfloat16, to halve host->device bytes with no
    extra precision loss there; None keeps float32).
    """
    from PIL import Image
    meta = enc.meta
    N, H, W = meta["num_frames"], meta["height"], meta["width"]
    gop = meta["gop_size"]
    mode = meta["flow_rate_mode"]
    out = np.zeros((N, H, W, 3), np.uint8)

    intra_dir = os.path.join(enc.path, "intra")
    for i in get_intra_frames(N, gop):
        out[i] = np.asarray(Image.open(
            os.path.join(intra_dir, f"frame_{i:04d}.jpg")).convert("RGB"))

    schedule = gop_schedule(N, gop)
    if not schedule:
        return out

    flows_fwd, flows_bwd = {}, {}
    for item in schedule:
        for direction, store in (("fwd", flows_fwd), ("bwd", flows_bwd)):
            if mode == "none":
                store[item.target] = np.zeros((H, W, 2), np.float32)
                continue
            fdir = os.path.join(enc.path, f"flow_{direction}")
            ext = "sfl" if mode == "sparse" else "dfl"
            with open(os.path.join(
                    fdir, f"flow_{item.target:04d}.{ext}"), "rb") as f:
                data = f.read()
            if mode == "sparse":
                sparse, mask = decode_sparse_flow(data)
                anchor = item.anchor_prev if direction == "fwd" else \
                    item.anchor_next
                if densify_fn is not None:
                    store[item.target] = densify_fn(
                        sparse, mask, out[anchor].astype(np.float32) / 255.0)
                else:
                    store[item.target] = sparse
            else:
                store[item.target] = decode_dense_flow(data)

    # conditioning stays uint8 end-to-end: raw (1 byte/el) host->device
    # upload, normalized to [0,1] on device — lossless (anchors are uint8
    # at the source) and half the bf16 tunnel bytes; ~11 s of the 20.5 s
    # 1080p exact frame was transfer (VERDICT r03 #7)
    batch = batch_gop_conditions(out, flows_fwd, flows_bwd, schedule)
    n = batch["cond"].shape[0]
    decoded_u8 = np.zeros((n, H, W, 3), np.uint8)
    step = max_batch if max_batch and max_batch > 0 else n
    # one host->device upload for the whole sequence — per-chunk uploads
    # dominate wall clock on remote-tunnel devices.  cond uploads as raw
    # uint8 and is normalized on device in the transfer dtype.
    dtype = transfer_dtype or jnp.float32
    cond_all = jnp.asarray(batch["cond"])  # uint8
    flow_all = jnp.asarray(batch["flow"], dtype)
    import jax

    @jax.jit
    def _to_u8(x):
        # same ops/order as the former host path (nan_to_num -> clip ->
        # truncating uint8 cast), so the result is bit-identical; doing it
        # on device fetches 1 byte/px instead of 4 (the fetch rides a
        # ~25-30 MB/s tunnel here)
        x = jnp.nan_to_num(x.astype(jnp.float32),
                           nan=-1.0, posinf=1.0, neginf=-1.0)
        return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)

    def _drain(pending):
        sl, nb, dev = pending
        if isinstance(dev, np.ndarray):
            # sample_fn already fetched to host (e.g. a tiled 1080p
            # wrapper): convert on host, the former path
            dec = np.nan_to_num(dev.astype(np.float32)[:nb],
                                nan=-1.0, posinf=1.0, neginf=-1.0)
            decoded_u8[sl] = np.clip((dec + 1) * 127.5, 0,
                                     255).astype(np.uint8)
        else:
            decoded_u8[sl] = np.asarray(_to_u8(dev))[:nb]

    # two-deep software pipeline: chunk i+1 is DISPATCHED before chunk i is
    # fetched, so the device computes the next chunk while the host drains
    # the previous one (JAX dispatch is async; np.asarray is the sync
    # point).  Keeps at most two decoded chunks live on device.
    pending = None
    for s0 in range(0, n, step):
        end = min(s0 + step, n)
        sl = slice(s0, end)
        # normalize in f32 then cast: bit-identical to the former
        # host-side uint8/255 -> cast path
        cond_c = (cond_all[sl].astype(jnp.float32) / 255.0).astype(dtype)
        flow_c = flow_all[sl]
        nb = end - s0
        if nb < step and s0 > 0:
            # pad the tail to the steady batch shape (avoids a recompile)
            pad = step - nb
            cond_c = jnp.concatenate([cond_c] + [cond_c[-1:]] * pad)
            flow_c = jnp.concatenate([flow_c] + [flow_c[-1:]] * pad)
        dev = sample_fn(cond_c, flow_c)
        if pending is not None:
            _drain(pending)
        pending = (sl, nb, dev)
    if pending is not None:
        _drain(pending)
    for k, item in enumerate(schedule):
        out[item.target] = decoded_u8[k]
    return out
