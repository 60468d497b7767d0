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


class AlexNetFCN(nn.Module):
    """AlexNet-BN fully-convolutional image encoder.

    Parity: `cmp/models/backbone/alexnet.py:4-76` (AlexNetBN_FCN).  The
    rep_learning CMP configs use `alexnet_fcn_32x` (strides (4,2,2,2),
    /32) with the Plain decoder; `alexnet_fcn_8x` is strides (2,2,2,1).
    No skip features (the torch forward raises NotImplemented for
    ret_feat=True), so this backbone pairs only with MotionDecoderPlain.
    """
    output_dim: int = 256
    strides: tuple = (4, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        s = self.strides
        x = ConvBNRelu(96, 11, stride=s[0], use_bias=True, dtype=self.dtype,
                       name="conv1")(img, train)
        x = nn.max_pool(x, (3, 3), strides=(s[1], s[1]),
                        padding=((1, 1), (1, 1)))
        x = ConvBNRelu(256, 5, use_bias=True, dtype=self.dtype,
                       name="conv2")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(s[2], s[2]),
                        padding=((1, 1), (1, 1)))
        x = ConvBNRelu(384, 3, use_bias=True, dtype=self.dtype,
                       name="conv3")(x, train)
        x = ConvBNRelu(384, 3, use_bias=True, dtype=self.dtype,
                       name="conv4")(x, train)
        x = ConvBNRelu(256, 3, use_bias=True, dtype=self.dtype,
                       name="conv5")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(s[3], s[3]),
                        padding=((1, 1), (1, 1)))
        x = ConvBNRelu(4096, 3, use_bias=True, dtype=self.dtype,
                       name="fc6")(x, train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = ConvBNRelu(4096, 1, use_bias=True, dtype=self.dtype,
                       name="fc7")(x, train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        out = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                      name="conv8")(x)
        return out, None  # no skip features (alexnet.py:62-63)


class ShallowNet(nn.Module):
    """Sparse-flow encoder: 4ch (flow + mask) -> 16ch at /8 (strides
    (2,2,2) = shallownet8x) or /32 (strides (2,2,8) = shallownet32x,
    paired with alexnet_fcn_32x in the rep_learning configs) —
    `cmp/models/modules/shallownet.py:4-46`."""
    output_dim: int = 16
    strides: tuple = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.strides
        x = ConvBNRelu(16, 5, stride=s[0], use_bias=True, dtype=self.dtype,
                       name="conv1")(x, train)
        x = nn.max_pool(x, (s[1], s[1]), strides=(s[1], s[1]))
        x = ConvBNRelu(self.output_dim, 3, use_bias=True, dtype=self.dtype,
                       name="conv2")(x, train)
        return nn.avg_pool(x, (s[2], s[2]), strides=(s[2], s[2]))


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


class MotionDecoderPlain(nn.Module):
    """Multi-pool-scale decoder WITHOUT skip connections.

    Parity: `cmp/models/modules/decoder.py:5-93` — per combo entry c in
    {1,2,4,8}: maxpool(c) -> two 3x3 conv+BN+ReLU -> bilinear resize back,
    concat, 1x1 head.  The rep_learning configs use combo (1,2,4).
    """
    output_dim: int = 198
    combo: tuple = (1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_feat=None, train: bool = False):
        del skip_feat  # no skip connections in the Plain decoder
        H, W = x.shape[1], x.shape[2]
        outs = []
        for c in self.combo:
            assert c in (1, 2, 4, 8), f"invalid combo {self.combo}"
            y = x
            if c > 1:
                y = nn.max_pool(y, (c, c), strides=(c, c))
            for i in range(2):
                y = ConvBNRelu(128, 3, use_bias=True, dtype=self.dtype,
                               name=f"decoder{c}_{i}")(y, train)
            if c > 1:
                y = resize_bilinear(y, H, W, align_corners=True)
            outs.append(y)
        cat = jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="head")(cat)


class MotionDecoderFlowNet(nn.Module):
    """Multi-pool-scale decoder with a FlowNet-style coarse-to-fine
    predict/upsample head over the image skips.

    Parity: `cmp/models/modules/decoder.py:216-356` — four 3-conv pooled
    branches fused to 256ch at /8, then predict_flow8 -> deconv chain
    through layer1 (/4, 256ch), conv1 (/2, 64ch), raw image (/1, 3ch),
    emitting flows at 4 scales (finest first, matching the torch return
    `[flow1, flow2, flow4, flow8]`).
    """
    output_dim: int = 198
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_feat, train: bool = False):
        img, conv1, layer1 = skip_feat  # 3ch /1, 64ch /2, 256ch /4
        H, W = x.shape[1], x.shape[2]
        od = self.output_dim

        def branch(x, name, pool=1):
            if pool > 1:
                x = nn.max_pool(x, (pool, pool), strides=(pool, pool))
            for i in range(3):
                x = ConvBNRelu(128, 3, use_bias=True, dtype=self.dtype,
                               name=f"{name}_{i}")(x, train)
            return x

        x1 = branch(x, "decoder1")
        x2 = resize_bilinear(branch(x, "decoder2", 2), H, W,
                             align_corners=True)
        x4 = resize_bilinear(branch(x, "decoder4", 4), H, W,
                             align_corners=True)
        x8 = resize_bilinear(branch(x, "decoder8", 8), H, W,
                             align_corners=True)
        feat8 = ConvBNRelu(256, 3, use_bias=True, dtype=self.dtype,
                           name="fusion8")(
            jnp.concatenate([x1, x2, x4, x8], -1), train)

        def predict(x, name):  # predict_flow: 3x3 conv, bias
            return nn.Conv(od, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name=name)(x)

        # torch ConvTranspose2d(k=4, s=2, p=1) == flax ConvTranspose with
        # padding ((2,2),(2,2)) and transpose_kernel=True (measured
        # equivalence; kernel converts via the 'convT_kernel' kind)
        def up_flow(x, name):  # ConvTranspose(4,2,1), no bias
            return nn.ConvTranspose(od, (4, 4), strides=(2, 2),
                                    padding=((2, 2), (2, 2)),
                                    transpose_kernel=True, use_bias=False,
                                    dtype=self.dtype, name=name)(x)

        def deconv(x, feats, name):  # ConvTranspose(4,2,1) + LeakyReLU(0.1)
            y = nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)),
                                 transpose_kernel=True,
                                 dtype=self.dtype, name=name)(x)
            return nn.leaky_relu(y, 0.1)

        flow8 = predict(feat8, "predict_flow8")
        concat4 = jnp.concatenate(
            [layer1, deconv(feat8, 128, "deconv8"),
             up_flow(flow8, "upsampled_flow8_to_4")], -1)
        flow4 = predict(concat4, "predict_flow4")
        concat2 = jnp.concatenate(
            [conv1, deconv(concat4, 128, "deconv4"),
             up_flow(flow4, "upsampled_flow4_to_2")], -1)
        flow2 = predict(concat2, "predict_flow2")
        concat1 = jnp.concatenate(
            [img, deconv(concat2, 64, "deconv2"),
             up_flow(flow2, "upsampled_flow2_to_1")], -1)
        flow1 = predict(concat1, "predict_flow1")
        return [flow1, flow2, flow4, flow8]


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


def cmp_name_map(nbins: int = 99, backbone: str = "resnet50",
                 decoder: str = "skip", combo: tuple = (1, 2, 4)):
    """Torch CMP checkpoint names (`cmp/models/modules/cmp.py:5-34` module
    attributes: image_encoder / flow_encoder / flow_decoder) -> our flax
    CMP param paths, for `hf_import.convert_state_dict`.  Covers all the
    reference's backbone/decoder variants (resnet50 + alexnet FCNs;
    SkipLayer / Plain / FlowNet decoders).  BatchNorm running stats are in
    `cmp_batch_stats_map`."""
    out = []

    def conv(t, f, bias=True):
        out.append((f"{t}.weight", f + ("conv", "kernel"), "conv_kernel"))
        if bias:
            out.append((f"{t}.bias", f + ("conv", "bias"), "bias"))

    def bn(t, f):
        out.append((f"{t}.weight", f + ("bn", "scale"), "raw"))
        out.append((f"{t}.bias", f + ("bn", "bias"), "raw"))

    def bare(t, f, bias=True, kind="conv_kernel"):
        out.append((f"{t}.weight", f + ("kernel",), kind))
        if bias:
            out.append((f"{t}.bias", f + ("bias",), "bias"))

    ie, fe, fd = "image_encoder", "flow_encoder", "flow_decoder"
    if backbone == "resnet50":
        # resnet50 FCN stem
        out.append((f"{ie}.conv1.weight",
                    ("image_encoder", "conv1", "kernel"), "conv_kernel"))
        out.append((f"{ie}.bn1.weight", ("image_encoder", "bn1", "scale"),
                    "raw"))
        out.append((f"{ie}.bn1.bias", ("image_encoder", "bn1", "bias"),
                    "raw"))
        for li, blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
            for b in range(blocks):
                t = f"{ie}.layer{li}.{b}"
                f = ("image_encoder", f"layer{li}_{b}")
                for c in ("conv1", "conv2", "conv3"):
                    conv(f"{t}.{c}", f + (c,), bias=False)
                    bn(f"{t}.bn{c[-1]}", f + (c,))
                if b == 0:
                    conv(f"{t}.downsample.0", f + ("downsample",),
                         bias=False)
                    bn(f"{t}.downsample.1", f + ("downsample",))
        out.append((f"{ie}.conv5.weight",
                    ("image_encoder", "conv5", "kernel"), "conv_kernel"))
        out.append((f"{ie}.conv5.bias", ("image_encoder", "conv5", "bias"),
                    "bias"))
    else:  # alexnet FCN (`backbone/alexnet.py:4-76`): Sequential .0/.1
        for name in ("conv1", "conv2", "conv3", "conv4", "conv5",
                     "fc6", "fc7"):
            conv(f"{ie}.{name}.0", ("image_encoder", name))
            bn(f"{ie}.{name}.1", ("image_encoder", name))
        bare(f"{ie}.conv8", ("image_encoder", "conv8"))
    # shallownet (Sequential indices: conv0/bn1, conv4/bn5)
    conv(f"{fe}.features.0", ("flow_encoder", "conv1"))
    bn(f"{fe}.features.1", ("flow_encoder", "conv1"))
    conv(f"{fe}.features.4", ("flow_encoder", "conv2"))
    bn(f"{fe}.features.5", ("flow_encoder", "conv2"))
    if decoder == "plain":
        # 2 convs per branch; pooled branches shift by the leading MaxPool
        for c in combo:
            base = 0 if c == 1 else 1
            for i in range(2):
                conv(f"{fd}.decoder{c}.{base + 3 * i}",
                     ("flow_decoder", f"decoder{c}_{i}"))
                bn(f"{fd}.decoder{c}.{base + 3 * i + 1}",
                   ("flow_decoder", f"decoder{c}_{i}"))
        bare(f"{fd}.head", ("flow_decoder", "head"))
        return out
    # skip / flownet: decoder1 convs at 0/3/6 (+bn at 1/4/7); pooled
    # branches shift by the leading MaxPool (conv at 1/4/7, bn at 2/5/8)
    for name, base in (("decoder1", 0), ("decoder2", 1), ("decoder4", 1),
                       ("decoder8", 1)):
        for i in range(3):
            conv(f"{fd}.{name}.{base + 3 * i}",
                 ("flow_decoder", f"{name}_{i}"))
            bn(f"{fd}.{name}.{base + 3 * i + 1}",
               ("flow_decoder", f"{name}_{i}"))
    if decoder == "flownet":
        conv(f"{fd}.fusion8.0", ("flow_decoder", "fusion8"))
        bn(f"{fd}.fusion8.1", ("flow_decoder", "fusion8"))
        for s in (8, 4, 2, 1):
            bare(f"{fd}.predict_flow{s}",
                 ("flow_decoder", f"predict_flow{s}"))
        for s, d in ((8, 4), (4, 2), (2, 1)):
            bare(f"{fd}.upsampled_flow{s}_to_{d}",
                 ("flow_decoder", f"upsampled_flow{s}_to_{d}"),
                 bias=False, kind="convT_kernel")
        for s in (8, 4, 2):
            bare(f"{fd}.deconv{s}.0", ("flow_decoder", f"deconv{s}"),
                 kind="convT_kernel")
        return out
    for name in ("fusion8", "skipconv4", "fusion4", "skipconv2", "fusion2"):
        conv(f"{fd}.{name}.0", ("flow_decoder", name))
        bn(f"{fd}.{name}.1", ("flow_decoder", name))
    out.append((f"{fd}.head.weight", ("flow_decoder", "head", "kernel"),
                "conv_kernel"))
    out.append((f"{fd}.head.bias", ("flow_decoder", "head", "bias"),
                "bias"))
    return out


def cmp_batch_stats_map(nbins: int = 99, backbone: str = "resnet50",
                        decoder: str = "skip", combo: tuple = (1, 2, 4)):
    """BatchNorm running_mean/var entries (the 'batch_stats' collection),
    covering the same backbone/decoder variants as `cmp_name_map`."""
    out = []

    def bn(t, f):
        out.append((f"{t}.running_mean", f + ("bn", "mean"), "raw"))
        out.append((f"{t}.running_var", f + ("bn", "var"), "raw"))

    ie, fe, fd = "image_encoder", "flow_encoder", "flow_decoder"
    if backbone == "resnet50":
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
    else:
        for name in ("conv1", "conv2", "conv3", "conv4", "conv5",
                     "fc6", "fc7"):
            bn(f"{ie}.{name}.1", ("image_encoder", name))
    bn(f"{fe}.features.1", ("flow_encoder", "conv1"))
    bn(f"{fe}.features.5", ("flow_encoder", "conv2"))
    if decoder == "plain":
        for c in combo:
            base = 0 if c == 1 else 1
            for i in range(2):
                bn(f"{fd}.decoder{c}.{base + 3 * i + 1}",
                   ("flow_decoder", f"decoder{c}_{i}"))
        return out
    for name, base in (("decoder1", 0), ("decoder2", 1), ("decoder4", 1),
                       ("decoder8", 1)):
        for i in range(3):
            bn(f"{fd}.{name}.{base + 3 * i + 1}",
               ("flow_decoder", f"{name}_{i}"))
    if decoder == "flownet":
        bn(f"{fd}.fusion8.1", ("flow_decoder", "fusion8"))
        return out
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
    # DiffCodec ships resnet50 + skip (resnet50_vip+mpii_liteflow config);
    # the rep_learning configs' variants are supported for CMP-component
    # completeness: backbone 'alexnet_fcn_32x'/'alexnet_fcn_8x' (paired
    # with decoder 'plain' + shallownet32x, since alexnet has no skip
    # feats) and decoders 'plain' (combo (1,2,4)) / 'flownet'.
    backbone: str = "resnet50"
    decoder: str = "skip"
    combo: tuple = (1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.backbone == "resnet50":
            self.image_encoder = ResNet50FCN(self.img_enc_dim,
                                             dtype=self.dtype)
            sp_strides = (2, 2, 2)           # shallownet8x
        elif self.backbone in ("alexnet_fcn_32x", "alexnet_fcn_8x"):
            strides = ((4, 2, 2, 2) if self.backbone.endswith("32x")
                       else (2, 2, 2, 1))
            self.image_encoder = AlexNetFCN(self.img_enc_dim,
                                            strides=strides,
                                            dtype=self.dtype)
            # alexnet_fcn_32x pairs with shallownet32x (config.yaml:12-13)
            sp_strides = ((2, 2, 8) if self.backbone.endswith("32x")
                          else (2, 2, 2))
            if self.decoder != "plain":
                raise ValueError("alexnet backbone has no skip features; "
                                 "use decoder='plain' "
                                 "(cmp/models/backbone/alexnet.py:62-63)")
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        self.flow_encoder = ShallowNet(self.sparse_enc_dim,
                                       strides=sp_strides, dtype=self.dtype)
        if self.decoder == "skip":
            self.flow_decoder = MotionDecoderSkipLayer(2 * self.nbins,
                                                       dtype=self.dtype)
        elif self.decoder == "plain":
            self.flow_decoder = MotionDecoderPlain(2 * self.nbins,
                                                   combo=self.combo,
                                                   dtype=self.dtype)
        elif self.decoder == "flownet":
            self.flow_decoder = MotionDecoderFlowNet(2 * self.nbins,
                                                     dtype=self.dtype)
        else:
            raise ValueError(f"unknown decoder {self.decoder!r}")

    def logits(self, image, sparse, train: bool = False):
        """Raw decoder bin logits (pre-Fuser), the DiscreteLoss target
        (`cmp/models/cmp.py:57-60` trains on these).  A list of 4 scales
        (finest first) for the flownet decoder."""
        img_enc, skip = self.image_encoder(image, train)
        flow_enc = self.flow_encoder(sparse, train)
        return self.flow_decoder(
            jnp.concatenate([img_enc, flow_enc], axis=-1), skip, train)

    def __call__(self, image, sparse, train: bool = False):
        dec = self.logits(image, sparse, train)
        if isinstance(dec, (list, tuple)):
            dec = dec[0]  # flownet: finest scale (already image-res)
        flow = fuse_discrete_flow(dec, self.nbins, self.fmax)
        H, W = image.shape[1], image.shape[2]
        if flow.shape[1] != H or flow.shape[2] != W:
            flow = resize_bilinear(flow, H, W, align_corners=True)
        return flow
