"""Tiling crop/merge tests (patch_utils parity)."""

import numpy as np

from diffcodec_tpu.ops.tiling import (crop_into_tiles, merge_latent_tiles,
                                      merge_tiles)


def test_crop_coords_cover_image():
    img = np.arange(64 * 96 * 3, dtype=np.float32).reshape(64, 96, 3)
    tiles, coords, (h, w) = crop_into_tiles(img, (32, 32), overlap=8)
    assert (h, w) == (64, 96)
    covered = np.zeros((64, 96), bool)
    for (y1, y2, x1, x2) in coords:
        covered[y1:y2, x1:x2] = True
    assert covered.all()


def test_merge_tiles_roundtrip_plain_and_feathered():
    rng = np.random.default_rng(0)
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    for feather in (0, 8):
        tiles, coords, shape = crop_into_tiles(img, (32, 32), overlap=16)
        out = merge_tiles(tiles, coords, shape, feather=feather)
        # identical tiles merge back to the original (any blend of equal
        # values is the value itself)
        np.testing.assert_array_equal(out, img)


def test_merge_latent_tiles_roundtrip():
    rng = np.random.default_rng(1)
    # 1080p-like pixel grid, /8 latents
    H_px, W_px = 256, 512
    H_lat, W_lat = 32, 64
    full = rng.standard_normal((1, H_lat, W_lat, 4)).astype(np.float32)
    # pixel tiles 128x128 overlap 64 -> latent tiles 16x16
    pixel_coords = []
    latents = []
    for y in range(0, H_px - 64, 64):
        for x in range(0, W_px - 64, 64):
            y2, x2 = min(y + 128, H_px), min(x + 128, W_px)
            # reference unpack order is (x1, x2, y1, y2)
            pixel_coords.append((x, x2, y, y2))
            ly, ly2 = y // 8, y2 // 8
            lx, lx2 = x // 8, x2 // 8
            latents.append(full[:, ly:ly2, lx:lx2])
    merged = merge_latent_tiles(latents, pixel_coords, (H_lat, W_lat),
                                (H_px, W_px))
    np.testing.assert_allclose(merged, full, rtol=1e-4, atol=1e-5)
