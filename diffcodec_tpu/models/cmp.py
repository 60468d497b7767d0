"""CMP (Conditional Motion Propagation): sparse -> dense flow decompressor.

Parity targets (NHWC, flax):
  * wrapper / eval path:      `cmp/models/cmp.py:9-64`,
                              `cmp/models/modules/cmp.py:5-34`
  * dilated ResNet-50 FCN:    `cmp/models/backbone/resnet.py:96-169`
    (output stride 8 via dilation 2/4 in layers 3/4, conv5 1x1 -> 256,
     skip feats [img, conv1(64ch, /2), layer1(256ch, /4)])
  * ShallowNet sparse encoder:`cmp/models/modules/shallownet.py:4-46`
    (conv5x5/2 + maxpool2 + conv3x3 + avgpool2 -> 16ch at /8)
  * MotionDecoderSkipLayer:   `cmp/models/modules/decoder.py:96-215`
  * Fuser (bin expectation):  `cmp/utils/visualize_utils.py:6-19`
    (nbins=99, fmax=50; per-axis softmax over bins, expectation over the
     bin-center mesh)

In DiffCodec, CMP decodes the sparse flow bitstream back to dense flow at
the decoder (`SURVEY.md` section 3.5); config
`resnet50_vip+mpii_liteflow/config.yaml`: img_enc_dim 256, sparse_enc_dim
16, output_dim 198 (= 2 * 99 bins), skip_layer True.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffcodec_tpu.ops.flow import resize_bilinear


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_relu: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x) if self.use_relu else x


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNRelu(self.planes, 1, dtype=self.dtype,
                         name="conv1")(x, train)
        out = ConvBNRelu(self.planes, 3, stride=self.stride,
                         dilation=self.dilation, dtype=self.dtype,
                         name="conv2")(out, train)
        out = ConvBNRelu(self.planes * 4, 1, use_relu=False,
                         dtype=self.dtype, name="conv3")(out, train)
        if self.downsample:
            identity = ConvBNRelu(self.planes * 4, 1, stride=self.stride,
                                  use_relu=False, dtype=self.dtype,
                                  name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNet50FCN(nn.Module):
    """Dilated ResNet-50 image encoder with skip features."""
    output_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(img)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        conv1 = nn.relu(x)                                   # /2, 64ch
        x = nn.max_pool(conv1, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))            # /4

        def layer(x, planes, blocks, stride, dilation, name):
            for b in range(blocks):
                x = Bottleneck(planes, stride=stride if b == 0 else 1,
                               dilation=dilation, downsample=b == 0,
                               dtype=self.dtype, name=f"{name}_{b}")(x, train)
            return x

        layer1 = layer(x, 64, 3, 1, 1, "layer1")              # /4, 256ch
        x = layer(layer1, 128, 4, 2, 1, "layer2")             # /8, 512ch
        x = layer(x, 256, 6, 1, 2, "layer3")                  # /8 dilated
        x = layer(x, 512, 3, 1, 4, "layer4")                  # /8 dilated
        out = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                      name="conv5")(x)
        return out, (img, conv1, layer1)


class ShallowNet(nn.Module):
    """Sparse-flow encoder: 4ch (flow + mask) -> 16ch at /8."""
    output_dim: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(16, 5, stride=2, use_bias=True, dtype=self.dtype,
                       name="conv1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBNRelu(self.output_dim, 3, use_bias=True, dtype=self.dtype,
                       name="conv2")(x, train)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class MotionDecoderSkipLayer(nn.Module):
    """Multi-pool-scale decoder with image skip connections."""
    output_dim: int = 198
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_feat, train: bool = False):
        _, conv1, layer1 = skip_feat  # 64ch at /2, 256ch at /4
        H, W = x.shape[1], x.shape[2]

        def block(x, n_convs, name, pool=1):
            if pool > 1:
                x = nn.max_pool(x, (pool, pool), strides=(pool, pool))
            for i in range(n_convs):
                x = ConvBNRelu(128, 3, use_bias=True, dtype=self.dtype,
                               name=f"{name}_{i}")(x, train)
            return x

        x1 = block(x, 3, "decoder1")
        x2 = resize_bilinear(block(x, 3, "decoder2", 2), H, W,
                             align_corners=True)
        x4 = resize_bilinear(block(x, 3, "decoder4", 4), H, W,
                             align_corners=True)
        x8 = resize_bilinear(block(x, 3, "decoder8", 8), H, W,
                             align_corners=True)
        cat = jnp.concatenate([x1, x2, x4, x8], axis=-1)
        f8 = ConvBNRelu(256, 3, use_bias=True, dtype=self.dtype,
                        name="fusion8")(cat, train)

        h4, w4 = layer1.shape[1], layer1.shape[2]
        f8_up = resize_bilinear(f8, h4, w4, align_corners=True)
        s4 = ConvBNRelu(128, 3, use_bias=True, dtype=self.dtype,
                        name="skipconv4")(layer1, train)
        f4 = ConvBNRelu(128, 3, use_bias=True, dtype=self.dtype,
                        name="fusion4")(jnp.concatenate([f8_up, s4], -1),
                                        train)

        h2, w2 = conv1.shape[1], conv1.shape[2]
        f4_up = resize_bilinear(f4, h2, w2, align_corners=True)
        s2 = ConvBNRelu(32, 3, use_bias=True, dtype=self.dtype,
                        name="skipconv2")(conv1, train)
        f2 = ConvBNRelu(64, 3, use_bias=True, dtype=self.dtype,
                        name="fusion2")(jnp.concatenate([f4_up, s2], -1),
                                        train)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="head")(f2)


def fuse_discrete_flow(flow_prob: jnp.ndarray, nbins: int = 99,
                       fmax: float = 50.0) -> jnp.ndarray:
    """Bin-probability -> continuous flow by softmax expectation
    (`cmp/utils/visualize_utils.py:13-19`).  flow_prob [B,H,W,2*nbins]."""
    step = 2 * fmax / float(nbins)
    mesh = (jnp.arange(nbins, dtype=jnp.float32) * step - fmax + step / 2)
    px = jax.nn.softmax(flow_prob[..., :nbins], axis=-1)
    py = jax.nn.softmax(flow_prob[..., nbins:], axis=-1)
    u = jnp.sum(px * mesh, axis=-1, keepdims=True)
    v = jnp.sum(py * mesh, axis=-1, keepdims=True)
    return jnp.concatenate([u, v], axis=-1)


def cmp_name_map(nbins: int = 99):
    """Torch CMP checkpoint names (`cmp/models/modules/cmp.py:5-34` module
    attributes: image_encoder resnet50 FCN / flow_encoder shallownet /
    flow_decoder MotionDecoderSkipLayer) -> our flax CMP param paths, for
    `hf_import.convert_state_dict`.  BatchNorm running stats are in
    `cmp_batch_stats_map`."""
    out = []

    def conv(t, f, bias=True):
        out.append((f"{t}.weight", f + ("conv", "kernel"), "conv_kernel"))
        if bias:
            out.append((f"{t}.bias", f + ("conv", "bias"), "bias"))

    def bn(t, f):
        out.append((f"{t}.weight", f + ("bn", "scale"), "raw"))
        out.append((f"{t}.bias", f + ("bn", "bias"), "raw"))

    ie, fe, fd = "image_encoder", "flow_encoder", "flow_decoder"
    # resnet50 FCN stem
    out.append((f"{ie}.conv1.weight", ("image_encoder", "conv1", "kernel"),
                "conv_kernel"))
    out.append((f"{ie}.bn1.weight", ("image_encoder", "bn1", "scale"),
                "raw"))
    out.append((f"{ie}.bn1.bias", ("image_encoder", "bn1", "bias"), "raw"))
    for li, blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for b in range(blocks):
            t = f"{ie}.layer{li}.{b}"
            f = ("image_encoder", f"layer{li}_{b}")
            for c in ("conv1", "conv2", "conv3"):
                conv(f"{t}.{c}", f + (c,), bias=False)
                bn(f"{t}.bn{c[-1]}", f + (c,))
            if b == 0:
                conv(f"{t}.downsample.0", f + ("downsample",), bias=False)
                bn(f"{t}.downsample.1", f + ("downsample",))
    out.append((f"{ie}.conv5.weight", ("image_encoder", "conv5", "kernel"),
                "conv_kernel"))
    out.append((f"{ie}.conv5.bias", ("image_encoder", "conv5", "bias"),
                "bias"))
    # shallownet (Sequential indices: conv0/bn1, conv4/bn5)
    conv(f"{fe}.features.0", ("flow_encoder", "conv1"))
    bn(f"{fe}.features.1", ("flow_encoder", "conv1"))
    conv(f"{fe}.features.4", ("flow_encoder", "conv2"))
    bn(f"{fe}.features.5", ("flow_encoder", "conv2"))
    # decoder: decoder1 convs at 0/3/6 (+bn at 1/4/7); pooled branches
    # shift by the leading MaxPool (conv at 1/4/7, bn at 2/5/8)
    for name, base in (("decoder1", 0), ("decoder2", 1), ("decoder4", 1),
                       ("decoder8", 1)):
        for i in range(3):
            conv(f"{fd}.{name}.{base + 3 * i}",
                 ("flow_decoder", f"{name}_{i}"))
            bn(f"{fd}.{name}.{base + 3 * i + 1}",
               ("flow_decoder", f"{name}_{i}"))
    for name in ("fusion8", "skipconv4", "fusion4", "skipconv2", "fusion2"):
        conv(f"{fd}.{name}.0", ("flow_decoder", name))
        bn(f"{fd}.{name}.1", ("flow_decoder", name))
    out.append((f"{fd}.head.weight", ("flow_decoder", "head", "kernel"),
                "conv_kernel"))
    out.append((f"{fd}.head.bias", ("flow_decoder", "head", "bias"),
                "bias"))
    return out


def cmp_batch_stats_map(nbins: int = 99):
    """BatchNorm running_mean/var entries (the 'batch_stats' collection)."""
    out = []

    def bn(t, f):
        out.append((f"{t}.running_mean", f + ("bn", "mean"), "raw"))
        out.append((f"{t}.running_var", f + ("bn", "var"), "raw"))

    ie, fe, fd = "image_encoder", "flow_encoder", "flow_decoder"
    out.append((f"{ie}.bn1.running_mean",
                ("image_encoder", "bn1", "mean"), "raw"))
    out.append((f"{ie}.bn1.running_var",
                ("image_encoder", "bn1", "var"), "raw"))
    for li, blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for b in range(blocks):
            t = f"{ie}.layer{li}.{b}"
            f = ("image_encoder", f"layer{li}_{b}")
            for c in ("conv1", "conv2", "conv3"):
                bn(f"{t}.bn{c[-1]}", f + (c,))
            if b == 0:
                bn(f"{t}.downsample.1", f + ("downsample",))
    bn(f"{fe}.features.1", ("flow_encoder", "conv1"))
    bn(f"{fe}.features.5", ("flow_encoder", "conv2"))
    for name, base in (("decoder1", 0), ("decoder2", 1), ("decoder4", 1),
                       ("decoder8", 1)):
        for i in range(3):
            bn(f"{fd}.{name}.{base + 3 * i + 1}",
               ("flow_decoder", f"{name}_{i}"))
    for name in ("fusion8", "skipconv4", "fusion4", "skipconv2", "fusion2"):
        bn(f"{fd}.{name}.1", ("flow_decoder", name))
    return out


class CMP(nn.Module):
    """image [B,H,W,3] + sparse flow+mask [B,H,W,4] -> dense flow [B,H,W,2].

    H, W must be multiples of 8.  Uses the discrete-bin head + Fuser
    expectation and bilinear (align_corners) upsample back to input size,
    matching the reference eval path (`cmp/models/cmp.py:30-43`).
    """
    img_enc_dim: int = 256
    sparse_enc_dim: int = 16
    nbins: int = 99
    fmax: float = 50.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = ResNet50FCN(self.img_enc_dim, dtype=self.dtype)
        self.flow_encoder = ShallowNet(self.sparse_enc_dim, dtype=self.dtype)
        self.flow_decoder = MotionDecoderSkipLayer(2 * self.nbins,
                                                   dtype=self.dtype)

    def logits(self, image, sparse, train: bool = False):
        """Raw decoder bin logits (pre-Fuser), the DiscreteLoss target
        (`cmp/models/cmp.py:57-60` trains on these)."""
        img_enc, skip = self.image_encoder(image, train)
        flow_enc = self.flow_encoder(sparse, train)
        return self.flow_decoder(
            jnp.concatenate([img_enc, flow_enc], axis=-1), skip, train)

    def __call__(self, image, sparse, train: bool = False):
        dec = self.logits(image, sparse, train)
        flow = fuse_discrete_flow(dec, self.nbins, self.fmax)
        H, W = image.shape[1], image.shape[2]
        if flow.shape[1] != H or flow.shape[2] != W:
            flow = resize_bilinear(flow, H, W, align_corners=True)
        return flow
