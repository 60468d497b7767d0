"""InceptionI3D (Kinetics-400) in flax — the FVD feature extractor.

Parity target: the reference's vendored `fvd_utils/models/fvd/pytorch_i3d.py`
(322 LoC InceptionI3d) used for FVD features
(`fvd_utils/models/fvd/fvd.py:32-62`: 400-d logits of 224px clips).

NDTHWC layout ([B, T, H, W, C]); TF-style SAME padding (what the torch
vendored version emulates manually); Unit3D = conv(no bias) + BN + relu.
Weights import from the vendored torch module naming via `i3d_name_map` +
`hf_import.convert_state_dict`.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (name, branch channel spec) per inception block; spec =
# (b0_1x1, b1_1x1, b1_3x3, b2_1x1, b2_3x3, b3_1x1)
_INCEPTION_SPECS = [
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("pool", (3, 3, 3)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("pool2", (2, 2, 2)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
]


class Unit3D(nn.Module):
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=self.use_bias,
                    dtype=self.dtype, name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             dtype=self.dtype, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


def _max_pool_same(x, kernel, stride):
    return nn.max_pool(x, kernel, strides=stride, padding="SAME")


class InceptionModule(nn.Module):
    spec: Tuple[int, int, int, int, int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        b0 = Unit3D(s[0], dtype=self.dtype, name="b0")(x, train)
        b1 = Unit3D(s[1], dtype=self.dtype, name="b1a")(x, train)
        b1 = Unit3D(s[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1, train)
        b2 = Unit3D(s[3], dtype=self.dtype, name="b2a")(x, train)
        b2 = Unit3D(s[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2, train)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(s[5], dtype=self.dtype, name="b3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    """videos [B, T, H, W, 3] in [-1, 1] -> logits [B, 400] (FVD features)."""
    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x, train)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x, train)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype,
                   name="Conv3d_2c_3x3")(x, train)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        for name, spec in _INCEPTION_SPECS:
            if name == "pool":
                x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
            elif name == "pool2":
                x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
            else:
                x = InceptionModule(spec, dtype=self.dtype,
                                    name=name)(x, train)
        # global spatial average + temporal mean, then the logits conv
        x = jnp.mean(x, axis=(2, 3), keepdims=True)  # [B, T', 1, 1, C]
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   use_bias=True, dtype=self.dtype, name="logits")(x, False)
        return jnp.mean(x, axis=(1, 2, 3))  # [B, 400]


# torch (vendored pytorch_i3d.py) name map ---------------------------------

_BRANCH_TORCH = {"b0": "b0", "b1a": "b1a", "b1b": "b1b", "b2a": "b2a",
                 "b2b": "b2b", "b3b": "b3b"}


def i3d_name_map() -> List[Tuple[str, Tuple[str, ...], str]]:
    """Entries for hf_import.convert_state_dict against the vendored torch
    module naming (`<block>.conv3d.weight`, `<block>.bn.{weight,bias,
    running_mean,running_var}`)."""
    out: List[Tuple[str, Tuple[str, ...], str]] = []

    def unit(tname: str, fpath: Tuple[str, ...], bn=True, bias=False):
        out.append((f"{tname}.conv3d.weight", fpath + ("conv3d", "kernel"),
                    "conv3d_kernel"))
        if bias:
            out.append((f"{tname}.conv3d.bias", fpath + ("conv3d", "bias"),
                        "raw"))
        if bn:
            out.append((f"{tname}.bn.weight", fpath + ("bn", "scale"),
                        "raw"))
            out.append((f"{tname}.bn.bias", fpath + ("bn", "bias"), "raw"))

    unit("Conv3d_1a_7x7", ("Conv3d_1a_7x7",))
    unit("Conv3d_2b_1x1", ("Conv3d_2b_1x1",))
    unit("Conv3d_2c_3x3", ("Conv3d_2c_3x3",))
    for name, spec in _INCEPTION_SPECS:
        if name.startswith("pool"):
            continue
        for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            unit(f"{name}.{branch}", (name, branch))
    unit("logits", ("logits",), bn=False, bias=True)
    return out


def i3d_batch_stats_map() -> List[Tuple[str, Tuple[str, ...], str]]:
    """BatchNorm running stats (go into the 'batch_stats' collection)."""
    out: List[Tuple[str, Tuple[str, ...], str]] = []

    def unit(tname: str, fpath: Tuple[str, ...]):
        out.append((f"{tname}.bn.running_mean", fpath + ("bn", "mean"),
                    "raw"))
        out.append((f"{tname}.bn.running_var", fpath + ("bn", "var"), "raw"))

    unit("Conv3d_1a_7x7", ("Conv3d_1a_7x7",))
    unit("Conv3d_2b_1x1", ("Conv3d_2b_1x1",))
    unit("Conv3d_2c_3x3", ("Conv3d_2c_3x3",))
    for name, _ in _INCEPTION_SPECS:
        if name.startswith("pool"):
            continue
        for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            unit(f"{name}.{branch}", (name, branch))
    return out
