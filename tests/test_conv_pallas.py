"""Fused SiLU+conv3x3 Pallas kernel vs the XLA reference (interpret mode
on CPU; the TPU timing evidence lives in scripts/conv_kernel_experiment.py
and artifacts/profile_vae.json)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.conv_pallas import (fused_silu_conv3x3_pallas,
                                           silu_conv3x3, silu_conv3x3_ref,
                                           _fused, _shape_qualifies)


@pytest.fixture
def shapes():
    rng = np.random.RandomState(0)
    B, H, W, C, O = 2, 16, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    return x, k, b


def test_kernel_matches_ref(shapes):
    x, k, b = shapes
    got = np.asarray(fused_silu_conv3x3_pallas(x, k, b, th=8,
                                               interpret=True))
    want = np.asarray(silu_conv3x3_ref(x, k, b))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_ref_matches_flax_conv(shapes):
    """The fallback path must be numerically identical to silu + nn.Conv
    (what ResnetBlock2D emitted before SiluConv existed)."""
    import flax.linen as nn

    x, k, b = shapes
    conv = nn.Conv(k.shape[-1], (3, 3), padding="SAME")
    want = conv.apply({"params": {"kernel": k, "bias": b}}, nn.silu(x))
    got = silu_conv3x3_ref(x, k, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_custom_vjp_matches_ref_grad(shapes):
    x, k, b = shapes

    def loss_fused(x, k, b):
        return jnp.sum(jnp.sin(_fused(x, k, b)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(silu_conv3x3_ref(x, k, b)))

    # interpret-mode forward on CPU: call the vjp machinery directly
    out, vjp = jax.vjp(loss_ref, x, k, b)
    gx, gk, gb = vjp(jnp.ones_like(out))
    from diffcodec_tpu.ops.conv_pallas import _fused_bwd
    gx2, gk2, gb2 = _fused_bwd((x, k, b), jax.grad(
        lambda y: jnp.sum(jnp.sin(y)))(silu_conv3x3_ref(x, k, b)))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), atol=1e-5)


def test_dispatch_gate():
    z = jnp.zeros
    # the measured win window: big spatial (>=256px), 64-512 in / 64-256
    # out channels, bf16
    assert _shape_qualifies(z((7, 512, 512, 128), jnp.bfloat16), 128)
    assert _shape_qualifies(z((7, 256, 256, 256), jnp.bfloat16), 256)
    assert _shape_qualifies(z((7, 512, 512, 256), jnp.bfloat16), 128)
    assert _shape_qualifies(z((7, 256, 256, 512), jnp.bfloat16), 256)
    assert not _shape_qualifies(z((7, 64, 64, 128), jnp.bfloat16), 128)
    assert not _shape_qualifies(z((7, 128, 128, 512), jnp.bfloat16), 512)
    assert not _shape_qualifies(z((7, 512, 512, 128), jnp.float32), 128)
    assert not _shape_qualifies(z((7, 512, 512, 128), jnp.bfloat16), 3)


def test_flag_off_uses_ref(shapes, monkeypatch):
    x, k, b = shapes
    monkeypatch.delenv("DIFFCODEC_FUSED_SILU_CONV", raising=False)
    got = silu_conv3x3(x, k, b)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(silu_conv3x3_ref(x, k, b)))


def test_siluconv_module_param_tree_and_values():
    """SiluConv's param tree and init values are identical to nn.Conv's,
    so every converter/name-map over 'conv1'/'conv2' is unaffected."""
    import flax.linen as nn

    from diffcodec_tpu.models.layers import SiluConv

    x = jnp.ones((1, 8, 8, 4))
    m = SiluConv(6)
    p = m.init(jax.random.PRNGKey(7), x)["params"]
    conv = nn.Conv(6, (3, 3), padding="SAME")
    pc = conv.init(jax.random.PRNGKey(7), x)["params"]
    assert set(p) == set(pc) == {"kernel", "bias"}
    np.testing.assert_array_equal(np.asarray(p["kernel"]),
                                  np.asarray(pc["kernel"]))
    out = m.apply({"params": p}, x)
    want = conv.apply({"params": p}, nn.silu(x))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


# ---------------- GN-affine fused variant ----------------

@pytest.fixture
def gn_shapes():
    rng = np.random.RandomState(1)
    B, H, W, C, O = 2, 16, 16, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    sc = jnp.asarray(rng.rand(B, C) + 0.5, jnp.float32)
    sh = jnp.asarray(rng.randn(B, C), jnp.float32)  # nonzero: stresses pad ring
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    res = jnp.asarray(rng.randn(B, H, W, O), jnp.float32)
    return x, sc, sh, k, b, res


def test_gn_kernel_matches_ref(gn_shapes):
    from diffcodec_tpu.ops.conv_pallas import (gn_silu_conv3x3_pallas,
                                               gn_silu_conv3x3_ref)
    x, sc, sh, k, b, res = gn_shapes
    got = np.asarray(gn_silu_conv3x3_pallas(x, sc, sh, k, b, th=8,
                                            interpret=True))
    want = np.asarray(gn_silu_conv3x3_ref(x, sc, sh, k, b))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_gn_kernel_residual_and_small_out(gn_shapes):
    from diffcodec_tpu.ops.conv_pallas import (gn_silu_conv3x3_pallas,
                                               gn_silu_conv3x3_ref)
    x, sc, sh, k, b, res = gn_shapes
    got = np.asarray(gn_silu_conv3x3_pallas(x, sc, sh, k, b, residual=res,
                                            th=8, interpret=True))
    want = np.asarray(gn_silu_conv3x3_ref(x, sc, sh, k, b, residual=res))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # out-head case: O=3
    k3, b3 = k[..., :3], b[:3]
    got3 = np.asarray(gn_silu_conv3x3_pallas(x, sc, sh, k3, b3, th=8,
                                             interpret=True))
    want3 = np.asarray(gn_silu_conv3x3_ref(x, sc, sh, k3, b3))
    np.testing.assert_allclose(got3, want3, atol=2e-5, rtol=1e-5)


def test_gn_custom_vjp_matches_ref_grad(gn_shapes):
    from diffcodec_tpu.ops.conv_pallas import (_gn_fused_res_bwd,
                                               gn_silu_conv3x3_ref)
    x, sc, sh, k, b, res = gn_shapes
    out, vjp = jax.vjp(lambda *a: gn_silu_conv3x3_ref(*a), x, sc, sh, k, b,
                       res)
    g = jnp.cos(out)
    want = vjp(g)
    got = _gn_fused_res_bwd((x, sc, sh, k, b, res), g)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), atol=1e-5)


def test_groupnorm32_affine_matches_apply():
    """GroupNorm32(return_affine=True) folds its params into a per-(B,C)
    affine that reproduces the nn.GroupNorm output, with an identical
    param tree (same checkpoint loads both paths)."""
    from diffcodec_tpu.models.layers import GroupNorm32

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    g = GroupNorm32(32, 1e-6)
    p = g.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(
        lambda v: jnp.asarray(rng.randn(*v.shape), jnp.float32) * 0.3 + 1.0,
        p)
    want = g.apply(p, x)
    sc, sh = g.apply(p, x, return_affine=True)
    got = x * sc[:, None, None, :] + sh[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # identical param trees between modes
    pa = g.init(jax.random.PRNGKey(0), x, return_affine=True)
    assert jax.tree.map(lambda v: v.shape, pa) == \
        jax.tree.map(lambda v: v.shape, g.init(jax.random.PRNGKey(0), x))


def test_gn_gate():
    from diffcodec_tpu.ops.conv_pallas import gn_silu_conv_qualifies
    z = jnp.zeros
    # flag off in the test env -> always False, and the shape window is
    # checked via the underlying predicate with the flag forced on
    assert not gn_silu_conv_qualifies(z((7, 512, 512, 128), jnp.bfloat16), 128)
    import os
    os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
    try:
        on_tpu = jax.default_backend() == "tpu"
        got = gn_silu_conv_qualifies(z((7, 512, 512, 128), jnp.bfloat16), 128)
        assert got == on_tpu  # CPU test env -> False; the window itself
        # is covered by the dispatch tables in ops/conv_pallas.py
    finally:
        del os.environ["DIFFCODEC_FUSED_SILU_CONV"]


def test_projected_head_matches_ref(gn_shapes):
    """Project-then-stencil schedule of the O<=8 head conv equals the
    direct conv (f32 tap accumulation; pure XLA so autodiff flows)."""
    from diffcodec_tpu.ops.conv_pallas import (gn_silu_conv3x3_projected,
                                               gn_silu_conv3x3_ref)
    x, sc, sh, k, b, _ = gn_shapes
    k3, b3 = k[..., :3], b[:3]
    got = np.asarray(gn_silu_conv3x3_projected(x, sc, sh, k3, b3))
    want = np.asarray(gn_silu_conv3x3_ref(x, sc, sh, k3, b3))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # gradients agree too (the LPIPS pixel loss backprops through decode)
    g1 = jax.grad(lambda xx: jnp.sum(
        jnp.sin(gn_silu_conv3x3_projected(xx, sc, sh, k3, b3))))(x)
    g2 = jax.grad(lambda xx: jnp.sum(
        jnp.sin(gn_silu_conv3x3_ref(xx, sc, sh, k3, b3))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_upsample_kernel_matches_ref_and_module(shapes):
    """Fused nearest-2x+conv3x3 kernel == XLA reference == the production
    _UpsampleConv phase-conv module."""
    from diffcodec_tpu.models.layers import _UpsampleConv
    from diffcodec_tpu.ops.conv_pallas import (upsample_conv3x3_pallas,
                                               upsample_conv3x3_ref)
    x, k, b = shapes
    got = np.asarray(upsample_conv3x3_pallas(x, k, b, th=8, interpret=True))
    want = np.asarray(upsample_conv3x3_ref(x, k, b))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    m = _UpsampleConv(k.shape[-1])
    out = m.apply({"params": {"kernel": k, "bias": b}}, x)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5, rtol=1e-5)


def test_upsample_custom_vjp_matches_ref_grad(shapes):
    from diffcodec_tpu.ops.conv_pallas import (_up_fused_bwd,
                                               upsample_conv3x3_ref)
    x, k, b = shapes
    out, vjp = jax.vjp(upsample_conv3x3_ref, x, k, b)
    g = jnp.cos(out)
    want = vjp(g)
    got = _up_fused_bwd((x, k, b), g)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), atol=1e-5)


def test_upsample_gate():
    from diffcodec_tpu.ops.conv_pallas import upsample_conv_qualifies
    z = jnp.zeros
    assert not upsample_conv_qualifies(z((7, 64, 64, 512), jnp.bfloat16), 512)
    import os
    os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
    try:
        on_tpu = jax.default_backend() == "tpu"
        for shp, o in (((7, 64, 64, 512), 512), ((7, 128, 128, 512), 512),
                       ((7, 256, 256, 256), 256)):
            assert upsample_conv_qualifies(z(shp, jnp.bfloat16), o) == on_tpu
        # always-out regardless of backend: UNet 1280-ch, fp32, odd W
        assert not upsample_conv_qualifies(z((14, 16, 16, 1280),
                                             jnp.bfloat16), 1280)
        assert not upsample_conv_qualifies(z((7, 64, 64, 512),
                                             jnp.float32), 512)
        assert not upsample_conv_qualifies(z((7, 64, 60, 512),
                                             jnp.bfloat16), 512)
    finally:
        del os.environ["DIFFCODEC_FUSED_SILU_CONV"]


# ---------------- stride-2 downsample kernel (measured NEGATIVE) ----------------
# The kernel is kept with its gate returning False (see
# `downsample_conv_qualifies` for the loss table); these tests pin its
# correctness so the negative result isn't re-derived from scratch.


@pytest.fixture
def down_shapes():
    rng = np.random.RandomState(1)
    B, H, W, C, O = 2, 32, 32, 16, 24
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    return x, k, b


@pytest.mark.parametrize("asym", [True, False])
def test_downsample_kernel_matches_ref(down_shapes, asym):
    from diffcodec_tpu.ops.conv_pallas import (downsample_conv3x3_pallas,
                                               downsample_conv3x3_ref)
    x, k, b = down_shapes
    got = np.asarray(downsample_conv3x3_pallas(
        x, k, b, asymmetric_pad=asym, th=4, interpret=True))
    want = np.asarray(downsample_conv3x3_ref(x, k, b, asym))
    assert got.shape == (x.shape[0], x.shape[1] // 2, x.shape[2] // 2,
                         k.shape[-1])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("asym", [True, False])
def test_downsample_ref_matches_flax_conv(down_shapes, asym):
    """The reference path must be numerically identical to the strided
    nn.Conv that `models.layers.Downsample2D` emits."""
    import flax.linen as nn
    from diffcodec_tpu.ops.conv_pallas import downsample_conv3x3_ref

    x, k, b = down_shapes
    pad = ((0, 1), (0, 1)) if asym else ((1, 1), (1, 1))
    conv = nn.Conv(k.shape[-1], (3, 3), strides=(2, 2), padding=pad)
    want = conv.apply({"params": {"kernel": k, "bias": b}}, x)
    got = downsample_conv3x3_ref(x, k, b, asym)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_downsample_custom_vjp_matches_ref_grad(down_shapes):
    from diffcodec_tpu.ops.conv_pallas import (_down_fused_bwd,
                                               downsample_conv3x3_ref)
    x, k, b = down_shapes
    out, vjp = jax.vjp(lambda a, kk, bb: downsample_conv3x3_ref(
        a, kk, bb, True), x, k, b)
    g = jnp.cos(out)
    want = vjp(g)
    got = _down_fused_bwd(True, (x, k, b), g)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), atol=1e-5)


def test_downsample_gate_is_off():
    """Measured negative: the gate must refuse every shape, including the
    kernel's own best case, even with the fused-conv flag on."""
    import os
    from diffcodec_tpu.ops.conv_pallas import downsample_conv_qualifies
    os.environ["DIFFCODEC_FUSED_SILU_CONV"] = "1"
    try:
        assert not downsample_conv_qualifies(
            jnp.zeros((8, 512, 512, 128), jnp.bfloat16), 128)
    finally:
        del os.environ["DIFFCODEC_FUSED_SILU_CONV"]
