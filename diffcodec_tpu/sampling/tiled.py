"""1080p decoding via overlap tiling.

Parity target: the reference's 1080p path (`patch_exp.ipynb` cell 3 +
`patch_utils.py`): crop the conditioning to 512x512 tiles with overlap 64,
run the diffusion pipeline per tile, merge with cosine feathering (pixels)
or Hann blending (latents).

TPU-first: all tiles of all frames form ONE batch through the jitted
sampler (tile grids are static per resolution), so a full 1080p frame —
or a whole GOP of them — decodes in a single pjit-able call.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.tiling import crop_into_tiles, merge_tiles


# Keyed by identity (NoiseSchedule holds device arrays, so the frozen
# dataclass is not hashable); bounded so long sweeps over many pipeline
# configs do not pin compiled programs forever.
_sampler_cache: "dict[int, tuple]" = {}
_SAMPLER_CACHE_MAX = 4


def _jitted_sampler(pipe):
    """One jitted sampler per pipeline instance, so repeated sample_tiled
    calls and all same-shape tile chunks share a single compiled program.
    The cached strong reference keeps the id stable while the entry
    lives.  Pipelines without CFG batching (`takes_uncond = False`, e.g.
    the distilled-student `DistilledPipeline`) are adapted to the common
    (params, rng, text, uncond, cond, flow) call shape — the uncond
    operand is simply dropped."""
    entry = _sampler_cache.pop(id(pipe), None)
    if entry is None:
        fn = pipe.jit_sample()
        if not getattr(pipe, "takes_uncond", True):
            base = fn
            fn = lambda params, rng, t, u, c, f: base(params, rng, t, c, f)
        entry = (pipe, fn)
    _sampler_cache[id(pipe)] = entry          # move to most-recent
    while len(_sampler_cache) > _SAMPLER_CACHE_MAX:
        _sampler_cache.pop(next(iter(_sampler_cache)))
    return entry[1]


def tile_grid(height: int, width: int, tile: Tuple[int, int],
              overlap: int) -> List[Tuple[int, int, int, int]]:
    """Static tile coordinates for a resolution (raster order)."""
    dummy = np.zeros((height, width, 1), np.uint8)
    _, coords, _ = crop_into_tiles(dummy, tile, overlap)
    return coords


def _crop_batch(arr: np.ndarray, coords, tile_h, tile_w) -> np.ndarray:
    """[B, H, W, C] -> [B * n_tiles, tile_h, tile_w, C]; edge tiles are
    padded by reflection to the full tile size (cropped again on merge)."""
    out = []
    for b in range(arr.shape[0]):
        for (y1, y2, x1, x2) in coords:
            t = arr[b, y1:y2, x1:x2]
            ph, pw = tile_h - t.shape[0], tile_w - t.shape[1]
            if ph or pw:
                t = np.pad(t, ((0, ph), (0, pw), (0, 0)), mode="reflect")
            out.append(t)
    return np.stack(out)


def sample_tiled(pipe, params, rng, text_embeds, uncond_embeds,
                 cond: np.ndarray, flow: np.ndarray,
                 tile: Tuple[int, int] = (512, 512), overlap: int = 64,
                 feather: int = 64,
                 tile_batch: Optional[int] = None) -> np.ndarray:
    """Decode [B, H, W, *] conditioning at arbitrary resolution.

    cond [B,H,W,6] in [0,1] float — or uint8 in [0,255], which is uploaded
    raw and normalized to [0,1] ON DEVICE (the conditioning is decoded
    anchor pixels, i.e. uint8 at the source, so the uint8 path is lossless
    and halves host->device bytes vs bf16; ~11 s of a 20.5 s 1080p exact
    frame was transfer through the remote tunnel).  flow [B,H,W,4]
    full-res pixel units (flow vectors are rescaled for the tile crop
    implicitly — crops preserve pixel units).  Returns [B, H, W, 3] in
    [-1, 1].

    tile_batch limits how many tiles go through the sampler per call
    (None = all tiles of all frames at once).
    """
    B, H, W = cond.shape[:3]
    th, tw = tile
    sample_fn = _jitted_sampler(pipe)
    # transfer in the pipeline's compute dtype: halves tunnel bytes for
    # bf16 pipelines with no extra precision loss (the models cast there
    # anyway); f32 pipelines keep full-precision conditioning.  uint8
    # conditioning transfers raw (1 byte/el) and normalizes on device.
    dtype = pipe.unet.dtype
    cond_u8 = cond.dtype == np.uint8

    def upload_cond(c):
        if cond_u8:
            # normalize in f32 then cast: bit-identical to host-side
            # uint8/255 -> cast-to-compute-dtype
            return (jnp.asarray(c).astype(jnp.float32) / 255.0).astype(dtype)
        return jnp.asarray(c, dtype)

    if H <= th and W <= tw and (H, W) == (th, tw):
        out = sample_fn(params, rng, jnp.asarray(text_embeds, dtype),
                        jnp.asarray(uncond_embeds, dtype),
                        upload_cond(cond), jnp.asarray(flow, dtype))
        return np.asarray(out)

    coords = tile_grid(H, W, tile, overlap)
    n_tiles = len(coords)
    cond_t = _crop_batch(cond, coords, th, tw)
    flow_t = _crop_batch(flow, coords, th, tw)

    # broadcast text embeddings per tile
    def rep(e):
        e = np.asarray(e)
        return np.repeat(e, n_tiles, axis=0)

    text_t = rep(text_embeds)
    uncond_t = rep(uncond_embeds)

    # ONE host->device upload of all tiles in the compute dtype (raw
    # uint8 for uint8 conditioning, normalized on device); chunks are
    # then sliced on device, and chunk outputs stay on device until a
    # single final fetch.  Per-chunk f32 uploads through a remote-tunnel
    # device measured ~20 s per 70 MB chunk.
    cond_d = upload_cond(cond_t)
    flow_d = jnp.asarray(flow_t, dtype)
    text_d = jnp.asarray(text_t, dtype)
    uncond_d = jnp.asarray(uncond_t, dtype)

    total = cond_t.shape[0]
    step = tile_batch or total
    outs = []
    for s in range(0, total, step):
        sl = slice(s, s + step)
        outs.append(sample_fn(params, jax.random.fold_in(rng, s),
                              text_d[sl], uncond_d[sl],
                              cond_d[sl], flow_d[sl]))
    cat = jnp.concatenate(outs)
    if cat.dtype == jnp.bfloat16:
        # fetch at 2 bytes/el instead of 4: float16 represents every
        # bfloat16 value with |x| in [2^-14, 1] exactly (11-bit vs 8-bit
        # mantissa); below f16's normal floor the round-off is an
        # ABSOLUTE error <= 2^-25 ~ 3e-8 (verified exhaustively over the
        # bf16 grid) — 4000x below one uint8 pixel quantum, invisible
        # after the feathered merge.  Halves device->host bytes on
        # tunnel-attached devices; f32 compute (CPU tests) keeps the
        # exact f32 fetch.
        cat = cat.astype(jnp.float16)
    tiles_out = np.asarray(cat).astype(np.float32)

    frames = []
    for b in range(B):
        per_frame = []
        for k, (y1, y2, x1, x2) in enumerate(coords):
            t = tiles_out[b * n_tiles + k]
            per_frame.append(t[:y2 - y1, :x2 - x1])  # drop reflect padding
        merged = merge_tiles(per_frame, coords, (H, W), feather=feather,
                             as_uint8=False)
        frames.append(merged)
    return np.clip(np.stack(frames), -1.0, 1.0)
