"""InceptionV3 64-feature prefix for FID (torchmetrics feature=64 parity).

The reference computes FID with `torchmetrics FrechetInceptionDistance
(feature=64)` (`test_utils.py:44-47`), whose 64-d features are the
adaptively-pooled output of InceptionV3's first pool block
(Conv2d_1a_3x3 -> Conv2d_2a_3x3 -> Conv2d_2b_3x3 -> MaxPool_3a).  That
prefix is ported here (BasicConv2d = conv(no bias) + BN(eps 1e-3) + relu)
with a torch name map for weight import (pytorch-fid / torchvision naming).

Inputs: uint8 [N, H, W, 3] frames; resized to 299 and normalized to [-1, 1]
exactly like torchmetrics' default path.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffcodec_tpu.ops.flow import resize_bilinear


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = "VALID" if self.padding == 0 else \
            ((self.padding, self.padding), (self.padding, self.padding))
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class InceptionFID64(nn.Module):
    """[N, 299, 299, 3] in [-1, 1] -> [N, 64] pooled features."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(32, (3, 3), 2, dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype,
                        name="Conv2d_2a_3x3")(x, train)
        # torchvision's Conv2d_2b_3x3 is the only padded conv in the prefix
        x = BasicConv2d(64, (3, 3), padding=1, dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 64]


def inception64_name_map() -> List[Tuple[str, Tuple[str, ...], str]]:
    out = []
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        out.append((f"{name}.conv.weight", (name, "conv", "kernel"),
                    "conv_kernel"))
        out.append((f"{name}.bn.weight", (name, "bn", "scale"), "raw"))
        out.append((f"{name}.bn.bias", (name, "bn", "bias"), "raw"))
    return out


def inception64_batch_stats_map() -> List[Tuple[str, Tuple[str, ...], str]]:
    out = []
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        out.append((f"{name}.bn.running_mean", (name, "bn", "mean"), "raw"))
        out.append((f"{name}.bn.running_var", (name, "bn", "var"), "raw"))
    return out


def make_fid64_feature_fn(variables, batch_size: int = 32):
    """FID feature fn over uint8 [N,H,W,3] frames (resize 299, [-1,1])."""
    model = InceptionFID64()
    apply = jax.jit(lambda v: model.apply(variables, v))

    def feature_fn(images: np.ndarray) -> np.ndarray:
        feats = []
        for i in range(0, len(images), batch_size):
            x = jnp.asarray(images[i:i + batch_size], jnp.float32) / 255.0
            x = resize_bilinear(x, 299, 299)
            x = x * 2.0 - 1.0
            feats.append(np.asarray(apply(x)))
        return np.concatenate(feats)

    return feature_fn
