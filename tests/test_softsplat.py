"""Softsplat kernel tests against an independent numpy oracle.

The oracle below is a direct, scalar-loop transcription of the semantics of
the reference CUDA kernel (`/root/reference/controlnet/softsplat.py:284-345`):
per-source-pixel bilinear scatter-add, NaN-flow skip, bounds-checked corners.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.softsplat import softsplat, splat_sum, backward_warp


def numpy_splat_sum(vals, flow):
    """Scalar-loop oracle: vals [B,H,W,C], flow [B,H,W,2] -> [B,H,W,C]."""
    B, H, W, C = vals.shape
    out = np.zeros_like(vals, dtype=np.float64)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + float(flow[b, y, x, 0])
                fy = y + float(flow[b, y, x, 1])
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                for ky in (0, 1):
                    for kx in (0, 1):
                        X, Y = x0 + kx, y0 + ky
                        if not (0 <= X < W and 0 <= Y < H):
                            continue
                        wx = (fx - x0) if kx else (x0 + 1 - fx)
                        wy = (fy - y0) if ky else (y0 + 1 - fy)
                        out[b, Y, X] += vals[b, y, x] * wx * wy
    return out.astype(np.float32)


def numpy_softsplat(vals, flow, metric, mode):
    base = mode.split("-")[0]
    if base == "sum":
        return numpy_splat_sum(vals, flow)
    ones = np.ones(vals.shape[:3] + (1,), np.float32)
    if base == "avg":
        stacked = np.concatenate([vals, ones], axis=-1)
    elif base == "linear":
        stacked = np.concatenate([vals * metric, metric], axis=-1)
    else:
        m = np.exp(metric)
        stacked = np.concatenate([vals * m, m], axis=-1)
    out = numpy_splat_sum(stacked, flow)
    norm = out[..., -1:]
    suffix = mode.split("-")[1] if "-" in mode else ""
    if suffix in ("", "addeps"):
        norm = norm + 1e-7
    elif suffix == "zeroeps":
        norm = np.where(norm == 0.0, 1.0, norm)
    else:
        norm = np.clip(norm, 1e-7, None)
    return out[..., :-1] / norm


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("impl", ["xla", "oracle", "pallas", "auto",
                                  "scatter"])
@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 12, 5)])
def test_splat_sum_matches_numpy(impl, shape):
    B, H, W, C = shape
    vals = _rand(shape, 0)
    flow = _rand((B, H, W, 2), 1, scale=3.0)
    got = np.asarray(splat_sum(jnp.asarray(vals), jnp.asarray(flow), impl=impl))
    want = numpy_splat_sum(vals, flow)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_splat_identity_flow():
    vals = _rand((1, 8, 8, 2), 2)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    got = np.asarray(splat_sum(jnp.asarray(vals), jnp.asarray(flow)))
    np.testing.assert_allclose(got, vals, rtol=1e-6, atol=1e-6)


def test_splat_nan_flow_skipped():
    vals = np.ones((1, 4, 4, 1), np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[0, 1, 1, 0] = np.nan
    flow[0, 2, 2, 1] = np.inf
    got = np.asarray(splat_sum(jnp.asarray(vals), jnp.asarray(flow)))
    want = numpy_splat_sum(vals, flow)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got[0, 1, 1, 0] == 0.0  # nothing landed there


@pytest.mark.parametrize("mode", [
    "sum", "avg", "soft", "soft-addeps", "soft-zeroeps", "soft-clipeps",
    "linear", "linear-zeroeps",
])
def test_softsplat_modes(mode):
    B, H, W, C = 1, 10, 10, 3
    vals = _rand((B, H, W, C), 3)
    flow = _rand((B, H, W, 2), 4, scale=2.0)
    metric = None if mode.split("-")[0] in ("sum", "avg") else _rand(
        (B, H, W, 1), 5)
    got = np.asarray(softsplat(jnp.asarray(vals), jnp.asarray(flow),
                               None if metric is None else jnp.asarray(metric),
                               mode))
    want = numpy_softsplat(vals, flow, metric, mode)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_softsplat_mode_validation():
    v = jnp.zeros((1, 4, 4, 1))
    f = jnp.zeros((1, 4, 4, 2))
    m = jnp.zeros((1, 4, 4, 1))
    with pytest.raises(ValueError):
        softsplat(v, f, m, "sum")  # sum takes no metric
    with pytest.raises(ValueError):
        softsplat(v, f, None, "soft")  # soft requires metric
    with pytest.raises(ValueError):
        softsplat(v, f, m, "bogus")


def test_splat_grads_match_oracle_impl():
    """Autodiff grads of xla impl == grads of indexed-add oracle impl."""
    vals = jnp.asarray(_rand((1, 6, 6, 2), 6))
    flow = jnp.asarray(_rand((1, 6, 6, 2), 7, scale=1.5))

    def loss(impl):
        def f(v, fl):
            return jnp.sum(jnp.sin(splat_sum(v, fl, impl=impl)))
        return f

    gx_v, gx_f = jax.grad(loss("xla"), argnums=(0, 1))(vals, flow)
    go_v, go_f = jax.grad(loss("oracle"), argnums=(0, 1))(vals, flow)
    ga_v, ga_f = jax.grad(loss("auto"), argnums=(0, 1))(vals, flow)
    np.testing.assert_allclose(np.asarray(gx_v), np.asarray(go_v),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(go_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_v), np.asarray(gx_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(gx_f),
                               rtol=1e-5, atol=1e-6)
    # the linear-cost scatter form (TPU-dispatched at big shapes) must
    # carry the same gradients as the one-hot forms
    gs_v, gs_f = jax.grad(loss("scatter"), argnums=(0, 1))(vals, flow)
    np.testing.assert_allclose(np.asarray(gs_v), np.asarray(gx_v),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gx_f),
                               rtol=1e-4, atol=1e-5)


def test_splat_value_grad_is_gather():
    """For fixed flow the splat is linear; VJP wrt vals must equal the
    bilinear gather of the cotangent (reference softsplat_ingrad kernel)."""
    B, H, W, C = 1, 8, 8, 1
    vals = jnp.asarray(_rand((B, H, W, C), 8))
    flow = jnp.asarray(_rand((B, H, W, 2), 9, scale=2.0))
    ct = _rand((B, H, W, C), 10)

    _, vjp = jax.vjp(lambda v: splat_sum(v, flow), vals)
    got = np.asarray(vjp(jnp.asarray(ct))[0])

    # gather formulation: ingrad(y,x) = sum_corners w * outgrad(dest)
    want = np.zeros((B, H, W, C), np.float32)
    for y in range(H):
        for x in range(W):
            fx = x + float(flow[0, y, x, 0])
            fy = y + float(flow[0, y, x, 1])
            x0, y0 = int(np.floor(fx)), int(np.floor(fy))
            for ky in (0, 1):
                for kx in (0, 1):
                    X, Y = x0 + kx, y0 + ky
                    if not (0 <= X < W and 0 <= Y < H):
                        continue
                    wx = (fx - x0) if kx else (x0 + 1 - fx)
                    wy = (fy - y0) if ky else (y0 + 1 - fy)
                    want[0, y, x] += ct[0, Y, X] * wx * wy
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_backward_warp_identity_and_shift():
    vals = _rand((1, 8, 8, 3), 11)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    got = np.asarray(backward_warp(jnp.asarray(vals), jnp.asarray(flow)))
    np.testing.assert_allclose(got, vals, atol=1e-6)
    # shift by +1 in x: out(y, x) = in(y, x+1), last col out of range -> 0
    flow[..., 0] = 1.0
    got = np.asarray(backward_warp(jnp.asarray(vals), jnp.asarray(flow)))
    np.testing.assert_allclose(got[:, :, :-1], vals[:, :, 1:], atol=1e-6)
    np.testing.assert_allclose(got[:, :, -1], 0.0, atol=1e-6)
