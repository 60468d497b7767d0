"""Warped-conditioning feature extractors + FDN.

Parity targets:
  * FDN (SPADE-style denorm):            `controlnet/control_utils.py:19-34`
  * FeatureWarperSoftsplat:              `controlnet/control_utils.py:36-72`
  * Bi_Dir_FeatureExtractor:             `controlnet/extractors.py:209-315`
  * Bi_Dir_ResidueExtractor:             `controlnet/extractors.py:67-207`
  * WarpExtractor:                       `controlnet/extractors.py:26-65`

Behaviour notes preserved from the reference (documented, not "fixed",
because the published checkpoints train with them):
  * `Bi_Dir_FeatureExtractor` feeds `resize_and_normalize_flow` output
    (normalized by (res-1)/2, NOT by the spatial downscale factor) straight
    into the splat, so per-scale warp magnitudes differ from the
    geometrically correct ones (`extractors.py:286-287`).
  * channel naming is swapped: "first" features come from cond channels 3:6
    (`extractors.py:266-267`).  We keep the wiring (warp cond[...,3:6] with
    the forward flow).
Known bug NOT replicated: the debug prints in hot paths
(`extractors.py:174`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from diffcodec_tpu.models.layers import ConvBlock, GroupNorm32, ZeroConv
from diffcodec_tpu.ops.flow import (compute_occlusion_mask,
                                    resize_and_normalize_flow,
                                    resize_flow_by_factor, soft_fuse)
from diffcodec_tpu.ops.packed_conv import (packed_chain_enabled,
                                           packed_chain_qualifies,
                                           reference_chain,
                                           run_packed_chain)
from diffcodec_tpu.ops.softsplat import softsplat


class _Conv3x3Params(nn.Module):
    """nn.Conv-parameter-compatible holder (same names/shapes/inits) so the
    pre-extractor chains can dispatch between the plain conv path and the
    packed-lane chain (`ops/packed_conv.py`) without touching the param
    tree that the torch converters and checkpoints rely on."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


def _silu_conv_chain(x, specs, name, make_params, dtype):
    """conv3x3(+bias)+SiLU chain with packed-lane dispatch.

    `specs` = [(out_ch, stride), ...]; params named f"{name}_{i}" with
    nn.Conv-identical trees.  The reference path reproduces
    nn.Conv(dtype=dtype) numerics exactly (promote to dtype, conv SAME,
    bias add in dtype); the packed path is the same math with dense
    lane packing (f32 accumulation either way)."""
    cin = x.shape[-1]
    kernels, biases, strides = [], [], []
    for i, (ch, s) in enumerate(specs):
        k, b = make_params(f"{name}_{i}", ch, cin)
        kernels.append(k.astype(dtype))
        biases.append(b.astype(dtype))
        strides.append(s)
        cin = ch
    x = x.astype(dtype)
    if packed_chain_enabled() and packed_chain_qualifies(x, kernels,
                                                         strides):
        return run_packed_chain(x, kernels, biases, strides)
    return reference_chain(x, kernels, biases, strides)


class FDN(nn.Module):
    """Feature denormalization: GN(affine=False), scale/shift from cond."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        norm = GroupNorm32(32, use_scale_bias=False, dtype=self.dtype,
                           name="param_free_norm")(x)
        gamma = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                        dtype=self.dtype, name="conv_gamma")(cond)
        beta = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_beta")(cond)
        return norm * (1 + gamma) + beta


class FeatureWarperSoftsplat(nn.Module):
    """Learnable-metric soft splat of a feature map.

    metric = conv3x3-SiLU-conv3x3(feat) (1 channel); splat in an fp32 island;
    occluded destinations zeroed via (1 - mask).
    Returns (warped, metric).
    """
    with_learnable_metric: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, flow, mask=None):
        if self.with_learnable_metric:
            m = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                        name="metric_0")(feat)
            m = nn.silu(m)
            metric = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                             name="metric_2")(m)
        else:
            metric = jnp.ones(feat.shape[:3] + (1,), feat.dtype)
        warped = softsplat(feat.astype(jnp.float32),
                           flow.astype(jnp.float32),
                           metric.astype(jnp.float32), "soft")
        warped = warped.astype(feat.dtype)
        if mask is not None:
            warped = warped * (1.0 - mask.astype(feat.dtype))
        return warped, metric


class BiDirFeatureExtractor(nn.Module):
    """Anchor-pair + bidirectional-flow -> per-scale injection pyramid.

    Input: cond [B, H, W, 6] (two RGB anchors), flow [B, H, W, 4]
    (fwd uv + bwd uv, pixel units at full res).
    Output: list of len(inject_channels) maps at H/8, H/16, ... resolution.
    """
    inject_channels: Tuple[int, ...] = (320, 320, 640, 1280)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond, flow):
        H = cond.shape[1]
        first = cond[..., 3:6]
        last = cond[..., 0:3]
        flow_fwd = flow[..., 0:2]
        flow_bwd = flow[..., 2:4]

        def make_params(pname, ch, cin):
            return _Conv3x3Params(ch, cin, name=pname)()

        def pre_extractor(name):
            def apply(x):
                specs = [(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]
                return _silu_conv_chain(x, specs, name, make_params,
                                        self.dtype)
            return apply

        f_first = pre_extractor("first_pre")(first)   # H/4, 64ch
        f_last = pre_extractor("last_pre")(last)

        outputs = []
        for idx, inject in enumerate(self.inject_channels):
            half = inject // 2
            res = H // (8 * (2 ** idx))
            f_first = nn.Conv(half, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)), dtype=self.dtype,
                              name=f"extractor_first_{idx}")(f_first)
            f_first = nn.silu(f_first)
            f_last = nn.Conv(half, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), dtype=self.dtype,
                             name=f"extractor_last_{idx}")(f_last)
            f_last = nn.silu(f_last)

            flow_f = resize_and_normalize_flow(flow_fwd, res, res)
            flow_b = resize_and_normalize_flow(flow_bwd, res, res)
            # Both directions run as ONE batched splat launch: the warper
            # (metric net) is shared across directions (the reference calls
            # self.wrapper[idx] for both sides, extractors.py:294-295) and
            # softsplat is per-sample independent, so concatenating the
            # directions on the batch axis is exact while halving the
            # number of scatter-kernel launches at each scale (the
            # extractor is launch-bound: ~1% MFU).
            # call-site order matches `extractors.py:291-292`: occ_fwd
            # splats the *forward* flow along the backward flow.
            flow2 = jnp.concatenate([flow_f, flow_b], axis=0)
            occ2 = compute_occlusion_mask(
                flow2, jnp.concatenate([flow_b, flow_f], axis=0))
            occ_f, occ_b = jnp.split(occ2, 2, axis=0)

            warper = FeatureWarperSoftsplat(dtype=self.dtype,
                                            name=f"warper_{idx}")
            warped2, conf2 = warper(
                jnp.concatenate([f_first, f_last], axis=0), flow2,
                mask=occ2)
            warped_first, warped_last = jnp.split(warped2, 2, axis=0)
            conf_f, conf_b = jnp.split(conf2, 2, axis=0)
            fused = soft_fuse(warped_first, warped_last, conf_f, conf_b,
                              occ_f, occ_b)
            outputs.append(ZeroConv(inject, (3, 3), dtype=self.dtype,
                                    name=f"zero_conv_{idx}")(fused))
        return outputs


class BiDirResidueExtractor(nn.Module):
    """Residue-flavoured extractor (`extractors.py:67-207`).

    Differences from BiDirFeatureExtractor: separate prev/next pre-extractors
    with an extra 32ch stage, flow downscale by spatial factor + learnable
    grouped-conv refiners, per-scale occlusion from the *refined* flows.
    The reference's declared-but-unused `flow_feature_encoders`
    (`extractors.py:123-128`) are intentionally omitted.
    """
    inject_channels: Tuple[int, ...] = (320, 320, 640, 1280)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prev_frame, next_frame, flow_fwd, flow_bwd):
        H = prev_frame.shape[1]

        def pre(name, x):
            specs = [(32, 1), (64, 2), (64, 2)]
            return _silu_conv_chain(
                x, specs, name,
                lambda pname, ch, cin: _Conv3x3Params(ch, cin, name=pname)(),
                self.dtype)

        f_prev = pre("prev_pre", prev_frame)  # H/4
        f_next = pre("next_pre", next_frame)

        outputs = []
        for idx, inject in enumerate(self.inject_channels):
            half = inject // 2
            res = H // (8 * (2 ** idx))
            f_prev = nn.Conv(half, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), dtype=self.dtype,
                             name=f"prev_pyramid_{idx}")(f_prev)
            f_prev = nn.silu(f_prev)
            f_next = nn.Conv(half, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), dtype=self.dtype,
                             name=f"next_pyramid_{idx}")(f_next)
            f_next = nn.silu(f_next)

            flow_f = resize_flow_by_factor(flow_fwd, res, res)
            flow_b = resize_flow_by_factor(flow_bwd, res, res)
            # learnable grouped (per-component) 3x3 refiner, shared across
            # directions (extractors.py:186-187 uses self.flow_refiners[i]
            # for both)
            refiner = nn.Conv(2, (3, 3), padding="SAME",
                              feature_group_count=2, dtype=self.dtype,
                              name=f"flow_refiner_{idx}")
            flow_f = refiner(flow_f)
            flow_b = refiner(flow_b)

            # Batched two-direction occlusion + warp (one splat launch per
            # op; exact — see BiDirFeatureExtractor).  Call-site order
            # matches `extractors.py:189-190`: occ_f splats the *forward*
            # flow along the backward flow; the per-scale warper is shared
            # across directions (reference uses self.warpers[i] for both,
            # extractors.py:196-197).
            flow2 = jnp.concatenate([flow_f, flow_b], axis=0)
            occ2 = compute_occlusion_mask(
                flow2, jnp.concatenate([flow_b, flow_f], axis=0))
            occ_f, occ_b = jnp.split(occ2, 2, axis=0)
            warper = FeatureWarperSoftsplat(dtype=self.dtype,
                                            name=f"warper_{idx}")
            warped2, conf2 = warper(
                jnp.concatenate([f_prev, f_next], axis=0), flow2,
                mask=occ2)
            warped_prev, warped_next = jnp.split(warped2, 2, axis=0)
            conf_p, conf_n = jnp.split(conf2, 2, axis=0)
            fused = soft_fuse(warped_prev, warped_next, conf_p, conf_n)
            outputs.append(ZeroConv(inject, (3, 3), dtype=self.dtype,
                                    name=f"zero_conv_{idx}")(fused))
        return outputs


class WarpExtractor(nn.Module):
    """Pyramid features of the pre-warped RGB prediction
    (`extractors.py:26-65`)."""
    inject_channels: Tuple[int, ...] = (320, 320, 640, 1280)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # internal widths equal inject_channels (extractors.py:36-40:
        # enc2..enc5 -> 320/320/640/1280), then zero-conv projection
        h = ConvBlock(64, stride=4, dtype=self.dtype, name="enc1")(x)
        outputs = []
        for idx, inject in enumerate(self.inject_channels):
            h = ConvBlock(inject, stride=2, dtype=self.dtype,
                          name=f"enc_{idx + 2}")(h)
            outputs.append(ZeroConv(inject, (3, 3), dtype=self.dtype,
                                    name=f"zero_conv_{idx}")(h))
        return outputs
