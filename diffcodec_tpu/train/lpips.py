"""LPIPS (alex) perceptual loss in flax, NHWC.

Parity target: `controlnet/lpips_loss.py:32-107` (NormFixLPIPS, MS-ILLM
style): unit-normalize each feature map with the epsilon INSIDE the sqrt
(stable gradients), squared diffs, learned per-layer 1x1 'lin' weights,
spatial average, sum over layers.  Inputs in [-1, 1] (scaling layer applies
the LPIPS v0.1 shift/scale constants).

Pretrained AlexNet + lin weights are loaded via
`diffcodec_tpu.models.hf_import.convert_lpips_alex` when a torch `lpips`
checkpoint is available; randomly-initialised weights still yield a valid
perceptual-style metric for smoke tests (0 iff identical inputs).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# LPIPS v0.1 scaling layer constants (shift/scale applied to [-1,1] inputs)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])

_ALEX_CHANNELS = (64, 192, 384, 256, 256)


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features, returning the five relu outputs."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        # conv1: 11x11 stride 4 pad 2
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        outs.append(x)
        x = _max_pool(x)
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        outs.append(x)
        x = _max_pool(x)
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv3")(x)
        x = nn.relu(x)
        outs.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv4")(x)
        x = nn.relu(x)
        outs.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv5")(x)
        x = nn.relu(x)
        outs.append(x)
        return outs


def normalize_tensor(x, eps: float = 1e-8):
    """Unit-normalize channels with eps inside the sqrt
    (`lpips_loss.py:27-29`)."""
    norm = jnp.sqrt(jnp.sum(x * x + eps, axis=-1, keepdims=True))
    return x / norm


class LPIPS(nn.Module):
    """NormFixLPIPS(alex).  Call with images in [-1, 1], NHWC."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in0, in1):
        shift = _SHIFT.astype(in0.dtype)
        scale = _SCALE.astype(in0.dtype)
        net = AlexNetFeatures(dtype=self.dtype, name="net")
        f0 = net((in0 - shift) / scale)
        f1 = net((in1 - shift) / scale)
        val = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            d = (normalize_tensor(a) - normalize_tensor(b)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin{k}")(d)
            val = val + jnp.mean(lin, axis=(1, 2, 3))
        return val  # [B]
