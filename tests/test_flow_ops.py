"""Tests for flow resize conventions, occlusion mask, fusion, Sobel, .flo IO."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from diffcodec_tpu.ops.flow import (
    compute_occlusion_mask, resize_and_normalize_flow, resize_bilinear,
    resize_flow_by_factor, resize_flow_pixel_units, soft_fuse)
from diffcodec_tpu.ops.sobel import sobel_edge_loss, sobel_magnitude
from diffcodec_tpu.utils.flo_io import read_flo, write_flo


def test_resize_bilinear_identity():
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3),
                                                    dtype=np.float32))
    np.testing.assert_allclose(np.asarray(resize_bilinear(x, 8, 8)),
                               np.asarray(x))


def test_resize_bilinear_constant_preserved():
    x = jnp.full((1, 16, 16, 2), 3.5)
    for ac in (False, True):
        out = resize_bilinear(x, 7, 5, align_corners=ac)
        np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_resize_bilinear_matches_torch_halfpixel():
    """Spot-check against torch F.interpolate semantics (both conventions)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 9, 11, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for ac, th, tw in [(False, 5, 6), (True, 5, 6), (False, 17, 23),
                       (True, 17, 23)]:
        want = F.interpolate(xt, size=(th, tw), mode="bilinear",
                             align_corners=ac)
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), th, tw,
                                         align_corners=ac))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_flow_pixel_units_scaling():
    # A uniform flow of (4, 2) px at 16x16 downscaled to 8x8 -> (2, 1) px.
    flow = jnp.concatenate([jnp.full((1, 16, 16, 1), 4.0),
                            jnp.full((1, 16, 16, 1), 2.0)], axis=-1)
    out = np.asarray(resize_flow_pixel_units(flow, 8, 8))
    np.testing.assert_allclose(out[..., 0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], 1.0, rtol=1e-5)


def test_resize_and_normalize_flow_convention():
    # reference divides u by (W'-1)/2 WITHOUT pixel-unit rescale first
    flow = jnp.concatenate([jnp.full((1, 64, 64, 1), 31.5),
                            jnp.zeros((1, 64, 64, 1))], axis=-1)
    out = np.asarray(resize_and_normalize_flow(flow, 64, 64))
    np.testing.assert_allclose(out[..., 0], 1.0, rtol=1e-5)
    out8 = np.asarray(resize_and_normalize_flow(flow, 8, 8))
    np.testing.assert_allclose(out8[..., 0], 31.5 / 3.5, rtol=1e-5)


def test_resize_flow_by_factor():
    flow = jnp.full((1, 64, 64, 2), 8.0)
    out = np.asarray(resize_flow_by_factor(flow, 8, 8))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


def test_occlusion_mask_consistent_flow_unoccluded():
    # fwd = +2px right, bwd = -2px: consistent -> no occlusion in interior
    B, H, W = 1, 16, 16
    fwd = jnp.concatenate([jnp.full((B, H, W, 1), 2.0),
                           jnp.zeros((B, H, W, 1))], axis=-1)
    bwd = -fwd
    mask = np.asarray(compute_occlusion_mask(bwd, fwd))
    # interior (cols where the splat fully lands) should be non-occluded
    assert mask[0, :, 4:W - 4].sum() == 0.0
    # columns 0,1 receive no backward-flow mass -> warped_bwd = 0 ->
    # ||fwd|| = 2 > 0.3 -> occluded
    assert mask[0, :, 0:2].min() == 1.0


def test_occlusion_mask_inconsistent_flow_occluded():
    B, H, W = 1, 8, 8
    fwd = jnp.full((B, H, W, 2), 1.0)
    bwd = jnp.full((B, H, W, 2), 3.0)  # wildly inconsistent
    mask = np.asarray(compute_occlusion_mask(bwd, fwd))
    assert mask.mean() > 0.9


def test_soft_fuse_weights_and_holes():
    a = jnp.full((1, 4, 4, 2), 1.0)
    b = jnp.full((1, 4, 4, 2), 3.0)
    ca = jnp.full((1, 4, 4, 1), 1.0)
    cb = jnp.full((1, 4, 4, 1), 3.0)
    fused = np.asarray(soft_fuse(a, b, ca, cb))
    np.testing.assert_allclose(fused, (1 * 1 + 3 * 3) / 4.0, rtol=1e-5)
    # negative confidences clamp to 0
    fused = np.asarray(soft_fuse(a, b, -ca, cb))
    np.testing.assert_allclose(fused, 3.0, rtol=1e-4)
    # double holes -> plain average
    occ = jnp.ones((1, 4, 4, 1))
    fused = np.asarray(soft_fuse(a, b, ca, cb, occ, occ))
    np.testing.assert_allclose(fused, 2.0, rtol=1e-5)


def test_sobel_magnitude_flat_and_edge():
    flat = jnp.full((1, 8, 8, 1), 0.7)
    m = np.asarray(sobel_magnitude(flat))
    assert m[0, 2:-2, 2:-2].max() < 1e-2
    # vertical step edge -> strong response at the edge column
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, :, 4:] = 1.0
    m = np.asarray(sobel_magnitude(jnp.asarray(img)))
    assert m[0, 3, 4, 0] > 1.0
    assert m[0, 3, 1, 0] < 1e-2


def test_sobel_edge_loss_zero_for_identical():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    assert float(sobel_edge_loss(x, x)) < 1e-6
    y = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    assert float(sobel_edge_loss(x, y)) > 0.0


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    flow = rng.standard_normal((17, 23, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    got = read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_flo_bad_magic(tmp_path):
    p = str(tmp_path / "bad.flo")
    with open(p, "wb") as f:
        np.float32(1.0).tofile(f)
    with pytest.raises(ValueError):
        read_flo(p)
