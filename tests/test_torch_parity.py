"""Cross-framework numeric parity: flax modules vs real torch forwards.

Round-1's converter tests were self-referential (torch state dicts
synthesized from the flax trees).  These tests run *actual torch models* —
`transformers.CLIPTextModel` and the reference's torch-only modules under
`/root/reference/controlnet/` and `/root/reference/fvd_utils/` — convert
their randomly-initialized state dicts through `models.hf_import`, and
assert the flax forward matches the torch forward numerically.

All tests skip cleanly when torch / transformers / the reference checkout
are absent.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _to_np(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# (i) CLIP text encoder vs transformers.CLIPTextModel
# ---------------------------------------------------------------------------

def test_clip_text_encoder_matches_transformers():
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from diffcodec_tpu.config import CLIPTextConfig
    from diffcodec_tpu.models.clip_text import CLIPTextEncoder
    from diffcodec_tpu.models.hf_import import (clip_text_name_map,
                                                convert_state_dict)

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    tmodel = transformers.CLIPTextModel(hf_cfg).eval()

    ids = torch.randint(0, 512, (2, 77))
    with torch.no_grad():
        # last_hidden_state is what the pipeline consumes
        # (train_controlnet.py:1098)
        expected = _to_np(tmodel(ids).last_hidden_state)

    cfg = CLIPTextConfig(vocab_size=512, hidden_dim=64, layers=3, heads=4,
                         max_length=77)
    model = CLIPTextEncoder(cfg)
    import jax
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 77), jnp.int32))
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, missing, unused = convert_state_dict(sd, clip_text_name_map(cfg),
                                                 template, strict=True)
    # position_ids buffer may or may not appear depending on version
    assert all("position_ids" in u for u in unused), unused
    got = np.asarray(model.apply(params, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Reference torch modules (controlnet/extractors.py, control_utils.py).
# They import `controlnet.softsplat` (CUDA/CuPy) at module load; stub it
# with a scalar-loop torch oracle before import.
# ---------------------------------------------------------------------------

def _torch_softsplat_oracle(tenIn, tenFlow, tenMetric, strMode):
    """Scalar-loop torch implementation of softsplat semantics
    (`softsplat.py:232-273`): bilinear scatter-add of value*exp(metric),
    'soft' mode normalizes by the splatted exp(metric) channel."""
    assert strMode.split("-")[0] in ("sum", "avg", "linear", "soft")
    if strMode == "avg":
        tenIn = torch.cat([tenIn, tenIn.new_ones(tenIn.shape[0], 1,
                                                 *tenIn.shape[2:])], 1)
    elif strMode.split("-")[0] == "linear":
        tenIn = torch.cat([tenIn * tenMetric, tenMetric], 1)
    elif strMode.split("-")[0] == "soft":
        tenIn = torch.cat([tenIn * tenMetric.exp(), tenMetric.exp()], 1)
    B, C, H, W = tenIn.shape
    out = tenIn.new_zeros(B, C, H, W)
    inp = tenIn.numpy()
    flo = tenFlow.numpy()
    acc = np.zeros((B, C, H, W), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + flo[b, 0, y, x]
                fy = y + flo[b, 1, y, x]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                for dy in (0, 1):
                    for dx in (0, 1):
                        xx, yy = x0 + dx, y0 + dy
                        if 0 <= xx < W and 0 <= yy < H:
                            w = ((1 - abs(fx - xx)) * (1 - abs(fy - yy)))
                            acc[b, :, yy, xx] += inp[b, :, y, x] * w
    out = torch.from_numpy(acc)
    if strMode == "sum":
        return out
    tenNormalize = out[:, -1:]
    if strMode in ("avg", "linear", "soft"):
        tenNormalize = tenNormalize.clone()
        tenNormalize[tenNormalize == 0.0] = 1.0
    elif strMode.endswith("-addeps"):
        tenNormalize = tenNormalize + 1e-7
    elif strMode.endswith("-zeroeps"):
        tenNormalize = tenNormalize.clone()
        tenNormalize[tenNormalize == 0.0] = 1.0
    elif strMode.endswith("-clipeps"):
        tenNormalize = tenNormalize.clip(1e-7, None)
    return out[:, :-1] / tenNormalize


@pytest.fixture(scope="module")
def reference_controlnet_modules():
    """Import the reference's torch-only controlnet modules with the CUDA
    softsplat stubbed by the torch oracle."""
    if not os.path.isdir(os.path.join(REFERENCE, "controlnet")):
        pytest.skip("reference checkout not available")
    stub = types.ModuleType("controlnet.softsplat")
    stub.softsplat = _torch_softsplat_oracle
    saved = {k: sys.modules.get(k) for k in
             ("controlnet", "controlnet.softsplat", "controlnet.extractors",
              "controlnet.control_utils")}
    pkg = types.ModuleType("controlnet")
    pkg.__path__ = [os.path.join(REFERENCE, "controlnet")]
    sys.modules["controlnet"] = pkg
    sys.modules["controlnet.softsplat"] = stub
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        cu = importlib.import_module("controlnet.control_utils")
        ex = importlib.import_module("controlnet.extractors")
        yield cu, ex
    finally:
        sys.path.remove(REFERENCE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _copy_torch_to_flax(tmodule, template, name_map):
    from diffcodec_tpu.models.hf_import import convert_state_dict
    sd = {k: _to_np(v) for k, v in tmodule.state_dict().items()}
    params, missing, unused = convert_state_dict(sd, name_map, template,
                                                 strict=True)
    return params, unused


def test_fdn_matches_reference(reference_controlnet_modules):
    """FDN (SPADE-style feature denormalization, `control_utils.py:19-34`)."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.extractors import FDN
    from diffcodec_tpu.models.hf_import import _conv, _gn

    cu, _ = reference_controlnet_modules
    torch.manual_seed(1)
    tfdn = cu.FDN(norm_nc=64, label_nc=32).eval()
    # give the zero-init-free layers real random weights
    for p in tfdn.parameters():
        with torch.no_grad():
            p.uniform_(-0.2, 0.2)

    x = torch.randn(2, 64, 8, 8)
    cond = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        expected = _to_np(tfdn(x, cond)).transpose(0, 2, 3, 1)

    fdn = FDN()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    cj = jnp.asarray(cond.numpy().transpose(0, 2, 3, 1))
    template = fdn.init(jax.random.PRNGKey(0), xj, cj)
    name_map = (_gn("param_free_norm", ("param_free_norm",)) +
                _conv("conv_gamma", ("conv_gamma",)) +
                _conv("conv_beta", ("conv_beta",)))
    # param_free_norm is affine=False in torch -> no weights to map
    name_map = [e for e in name_map if "param_free_norm" not in e[0]]
    params, _ = _copy_torch_to_flax(tfdn, template, name_map)
    got = np.asarray(fdn.apply(params, xj, cj))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


def test_compute_mask_matches_reference(reference_controlnet_modules):
    """Occlusion mask (`control_utils.py:11-17`) vs our ops.flow version."""
    import jax.numpy as jnp

    from diffcodec_tpu.ops.flow import compute_occlusion_mask

    cu, _ = reference_controlnet_modules
    torch.manual_seed(2)
    B, H, W = 1, 8, 8
    flow_f = torch.randn(B, 2, H, W) * 1.5
    flow_b = torch.randn(B, 2, H, W) * 1.5
    with torch.no_grad():
        expected = _to_np(cu.compute_mask(flow_b, flow_f))
    got = np.asarray(compute_occlusion_mask(
        jnp.asarray(flow_b.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(flow_f.numpy().transpose(0, 2, 3, 1))))
    # ours returns NHWC [B,H,W,1]
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected,
                               atol=1e-5)

@pytest.mark.slow
def test_bidir_feature_extractor_matches_reference(
        reference_controlnet_modules):
    """Full Bi_Dir_FeatureExtractor pyramid (`extractors.py:209-315`) vs
    our BiDirFeatureExtractor, weights copied torch->flax, tiny widths."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.extractors import BiDirFeatureExtractor
    from diffcodec_tpu.models.hf_import import (convert_state_dict,
                                                feature_extractor_name_map)

    _, ex = reference_controlnet_modules
    torch.manual_seed(3)
    inject = (8, 8, 16, 16)
    text = ex.Bi_Dir_FeatureExtractor(inject_channels=list(inject)).eval()
    # randomize everything, including the zero convs + metric nets: parity
    # should hold away from the zero-init fixed point
    for p in text.parameters():
        with torch.no_grad():
            p.uniform_(-0.15, 0.15)

    # the reference hardcodes the pyramid at 64/32/16/8 (extractors.py:281),
    # i.e. assumes 512px conditioning
    B, H = 1, 512
    cond = torch.rand(B, 6, H, H)
    flow = torch.randn(B, 4, H, H) * 20.0
    with torch.no_grad():
        expected = [_to_np(t).transpose(0, 2, 3, 1)
                    for t in text(cond, flow)]

    model = BiDirFeatureExtractor(inject_channels=inject)
    cj = jnp.asarray(cond.numpy().transpose(0, 2, 3, 1))
    fj = jnp.asarray(flow.numpy().transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), cj, fj)
    sd = {k: _to_np(v) for k, v in text.state_dict().items()}
    params, missing, unused = convert_state_dict(
        sd, feature_extractor_name_map(inject), template, strict=True)
    assert not unused, unused
    got = model.apply(params, cj, fj)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert np.asarray(g).shape == e.shape
        np.testing.assert_allclose(np.asarray(g), e, atol=5e-5, rtol=1e-3)


def test_bidir_residue_extractor_matches_reference(
        reference_controlnet_modules):
    """Bi_Dir_ResidueExtractor pyramid (`extractors.py:67-207`) vs our
    BiDirResidueExtractor (ResControlNet conditioning path)."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.extractors import BiDirResidueExtractor
    from diffcodec_tpu.models.hf_import import (convert_state_dict,
                                                residue_extractor_name_map)

    _, ex = reference_controlnet_modules
    torch.manual_seed(6)
    inject = (8, 8, 16, 16)
    tmod = ex.Bi_Dir_ResidueExtractor(inject_channels=list(inject)).eval()
    for p in tmod.parameters():
        with torch.no_grad():
            p.uniform_(-0.15, 0.15)

    B, H = 1, 512  # the reference asserts 512x512 inputs
    prev = torch.rand(B, 3, H, H)
    nxt = torch.rand(B, 3, H, H)
    fwd = torch.randn(B, 2, H, H) * 20.0
    bwd = torch.randn(B, 2, H, H) * 20.0
    with torch.no_grad():
        expected = [_to_np(t).transpose(0, 2, 3, 1)
                    for t in tmod(prev, nxt, fwd, bwd)]

    model = BiDirResidueExtractor(inject_channels=inject)
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    args = tuple(map(to_nhwc, (prev, nxt, fwd, bwd)))
    template = model.init(jax.random.PRNGKey(0), *args)
    sd = {k: _to_np(v) for k, v in tmod.state_dict().items()}
    params, missing, unused = convert_state_dict(
        sd, residue_extractor_name_map(inject), template, strict=True)
    # flow_feature_encoders are dead code in the reference forward
    assert all("flow_feature_encoders" in u for u in unused), unused
    got = model.apply(params, *args)
    for g, e in zip(got, expected):
        assert np.asarray(g).shape == e.shape
        np.testing.assert_allclose(np.asarray(g), e, atol=5e-5, rtol=1e-3)

@pytest.mark.slow
def test_warp_extractor_matches_reference(reference_controlnet_modules):
    """WarpExtractor pyramid (`extractors.py:26-65`)."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.extractors import WarpExtractor
    from diffcodec_tpu.models.hf_import import (convert_state_dict,
                                                warp_extractor_name_map)

    _, ex = reference_controlnet_modules
    torch.manual_seed(7)
    # the reference hardcodes the encoder widths at the SD inject sizes
    # (`extractors.py:36-40`), so test at the real widths on a small input
    inject = (320, 320, 640, 1280)
    tmod = ex.WarpExtractor(inject_channels=list(inject)).eval()
    for p in tmod.parameters():
        with torch.no_grad():
            p.uniform_(-0.05, 0.05)

    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        expected = [_to_np(t).transpose(0, 2, 3, 1) for t in tmod(x)]

    model = WarpExtractor(inject_channels=inject)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), xj)
    sd = {k: _to_np(v) for k, v in tmod.state_dict().items()}
    params, missing, unused = convert_state_dict(
        sd, warp_extractor_name_map(inject), template, strict=True)
    assert not unused, unused
    got = model.apply(params, xj)
    for g, e in zip(got, expected):
        assert np.asarray(g).shape == e.shape
        np.testing.assert_allclose(np.asarray(g), e, atol=5e-5, rtol=1e-3)


# ---------------------------------------------------------------------------
# (iv) FID-64 Inception prefix vs an independent torch re-declaration of
# torchvision/pytorch-fid's InceptionV3 head (Conv2d_1a_3x3 s2 valid ->
# Conv2d_2a_3x3 valid -> Conv2d_2b_3x3 pad1 -> MaxPool 3x3 s2 -> avgpool)
# ---------------------------------------------------------------------------

def test_inception_fid64_prefix_matches_torch_redeclaration():
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.eval.inception import (InceptionFID64,
                                              inception64_batch_stats_map,
                                              inception64_name_map)
    from diffcodec_tpu.models.hf_import import convert_state_dict

    class BasicConv2d(torch.nn.Module):
        def __init__(self, cin, cout, stride=1, padding=0):
            super().__init__()
            self.conv = torch.nn.Conv2d(cin, cout, 3, stride=stride,
                                        padding=padding, bias=False)
            self.bn = torch.nn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return torch.nn.functional.relu(self.bn(self.conv(x)))

    class TorchFID64(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, padding=1)

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = torch.nn.functional.max_pool2d(x, 3, stride=2)
            return torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)

    torch.manual_seed(5)
    tmodel = TorchFID64().eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = torch.rand(2, 3, 299, 299) * 2 - 1
    with torch.no_grad():
        expected = _to_np(tmodel(x))

    model = InceptionFID64()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xj)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, _, _ = convert_state_dict(sd, inception64_name_map(),
                                      variables["params"], strict=True)
    stats, _, _ = convert_state_dict(sd, inception64_batch_stats_map(),
                                     variables["batch_stats"], strict=True)
    got = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 xj))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# (iii) I3D (FVD backbone) vs the reference's vendored pytorch_i3d
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_i3d_matches_reference_pytorch_i3d():
    i3d_dir = os.path.join(REFERENCE, "fvd_utils", "models", "fvd")
    if not os.path.isdir(i3d_dir):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, i3d_dir)
    try:
        from pytorch_i3d import InceptionI3d
    finally:
        sys.path.remove(i3d_dir)

    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.hf_import import convert_state_dict
    from diffcodec_tpu.models.i3d import (InceptionI3D,
                                          i3d_batch_stats_map, i3d_name_map)

    torch.manual_seed(4)
    tmodel = InceptionI3d(num_classes=400, in_channels=3).eval()
    # randomize the BN running stats too, so eval-mode normalization is a
    # real operation and not the (0, 1) identity
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    # the torch model's 7x7 avg-pool assumes 224px inputs; 16 frames keeps
    # its [2,7,7] temporal window equivalent to a plain temporal mean
    x = torch.rand(1, 3, 16, 224, 224)
    with torch.no_grad():
        expected_logits = _to_np(tmodel(x)).squeeze()

    model = InceptionI3D(num_classes=400)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NTHWC
    variables = model.init(jax.random.PRNGKey(0), xj[:, :, :64, :64])
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, _, _ = convert_state_dict(sd, i3d_name_map(),
                                      variables["params"], strict=True)
    stats, _, _ = convert_state_dict(sd, i3d_batch_stats_map(),
                                     variables["batch_stats"], strict=True)
    got = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 xj)).squeeze()
    assert got.shape == expected_logits.shape
    np.testing.assert_allclose(got, expected_logits, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# (v) SD-1.5 UNet / VAE / ControlNet trunk vs independent torch
# re-declarations of the HF architectures (tests/torch_sd.py) — closes the
# last self-referentially-tested converters (`unet_name_map`,
# `vae_name_map`, `controlnet_name_map` trunk entries).  Reference loads:
# `train_controlnet.py:805-814`; consumption: `pipeline.py:358-367`.
# ---------------------------------------------------------------------------

def _randomize(module, lo=-0.25, hi=0.25, seed=11):
    torch.manual_seed(seed)
    for p in module.parameters():
        with torch.no_grad():
            p.uniform_(lo, hi)
    # keep normalization scales near 1 so activations neither vanish nor
    # blow up through the deep stack (tests real math either way; this
    # keeps tolerances meaningful)
    for m in module.modules():
        if isinstance(m, (torch.nn.GroupNorm, torch.nn.LayerNorm)) and \
                m.weight is not None:
            with torch.no_grad():
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.1, 0.1)


def test_unet2d_condition_matches_torch_redeclaration():
    """Full UNet forward — including ControlNet residual injection and
    FreeU (validation.py:106 settings) — vs the torch re-declaration."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.config import UNetConfig
    from diffcodec_tpu.models.hf_import import (convert_state_dict,
                                                unet_name_map)
    from diffcodec_tpu.models.unet2d_condition import UNet2DConditionModel
    from torch_sd import UNet2DConditionTorch

    cfg = UNetConfig.tiny()
    tmodel = UNet2DConditionTorch(cfg).eval()
    _randomize(tmodel, seed=21)

    B, hw, L = 2, 16, 7
    torch.manual_seed(22)
    sample = torch.randn(B, 4, hw, hw)
    ctx = torch.randn(B, L, cfg.cross_attention_dim)
    t = torch.tensor(123)
    # nonzero ControlNet residuals at the down-path widths/resolutions
    widths = [(32, 16), (32, 16), (32, 8), (64, 8), (64, 4), (64, 4)]
    down_res = [torch.randn(B, c, r, r) * 0.1 for c, r in widths]
    mid_res = torch.randn(B, 64, 4, 4) * 0.1
    freeu = (0.9, 0.2, 1.2, 1.4)
    with torch.no_grad():
        expected = _to_np(tmodel(sample, t, ctx, list(down_res), mid_res,
                                 freeu=freeu)).transpose(0, 2, 3, 1)

    model = UNet2DConditionModel(cfg)
    to_nhwc = lambda v: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
    sj, ctxj = to_nhwc(sample), jnp.asarray(ctx.numpy())
    template = model.init(jax.random.PRNGKey(0), sj, jnp.int32(0), ctxj)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, missing, unused = convert_state_dict(sd, unet_name_map(cfg),
                                                 template, strict=True)
    assert not unused, unused
    got = np.asarray(model.apply(
        params, sj, jnp.int32(123), ctxj,
        tuple(to_nhwc(r) for r in down_res), to_nhwc(mid_res),
        freeu=freeu))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-3)

    # and without residuals / FreeU (the plain frozen forward)
    with torch.no_grad():
        expected2 = _to_np(tmodel(sample, t, ctx)).transpose(0, 2, 3, 1)
    got2 = np.asarray(model.apply(params, sj, jnp.int32(123), ctxj))
    np.testing.assert_allclose(got2, expected2, atol=1e-4, rtol=1e-3)


def test_autoencoder_kl_matches_torch_redeclaration():
    """VAE encode (moments through quant_conv) and decode vs the torch
    re-declaration — covers the asymmetric encoder downsample padding and
    the 1e-6 eps VAE norms."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.config import VAEConfig
    from diffcodec_tpu.models.hf_import import (convert_state_dict,
                                                vae_name_map)
    from diffcodec_tpu.models.vae import AutoencoderKL
    from torch_sd import AutoencoderKLTorch

    cfg = VAEConfig.tiny()
    tmodel = AutoencoderKLTorch(cfg).eval()
    _randomize(tmodel, seed=31)

    torch.manual_seed(32)
    x = torch.rand(2, 3, 32, 32) * 2 - 1
    z = torch.randn(2, cfg.latent_channels, 16, 16)
    with torch.no_grad():
        moments_t = _to_np(tmodel.encode_moments(x)).transpose(0, 2, 3, 1)
        decoded_t = _to_np(tmodel.decode(z)).transpose(0, 2, 3, 1)

    model = AutoencoderKL(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    zj = jnp.asarray(z.numpy().transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), xj)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, missing, unused = convert_state_dict(sd, vae_name_map(cfg),
                                                 template, strict=True)
    assert not unused, unused
    mean, logvar = model.apply(params, xj, method=model.encode)
    got_moments = np.concatenate([np.asarray(mean), np.asarray(logvar)],
                                 axis=-1)
    np.testing.assert_allclose(got_moments, moments_t, atol=5e-5, rtol=1e-3)
    got_dec = np.asarray(model.apply(params, zj, method=model.decode))
    np.testing.assert_allclose(got_dec, decoded_t, atol=5e-5, rtol=1e-3)


def test_controlnet_trunk_matches_torch_redeclaration():
    """ControlNet trunk — conv_in + FDN-injected down path + mid + zero-conv
    heads, `flownet.py:51-138` wiring incl. the shared deepest FDN — vs the
    torch re-declaration, with randomized (non-zero) heads and
    conditioning_scale != 1."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.config import ControlNetConfig
    from diffcodec_tpu.models.controlnet import ControlNetTrunk
    from diffcodec_tpu.models.hf_import import (controlnet_name_map,
                                                convert_state_dict)
    from torch_sd import DualFlowControlNetTrunkTorch

    cfg = ControlNetConfig.tiny()
    tmodel = DualFlowControlNetTrunkTorch(cfg.unet, cfg.inject_channels)
    tmodel = tmodel.eval()
    _randomize(tmodel, seed=41)  # includes the zero-conv heads

    B, hw, L = 2, 16, 7
    torch.manual_seed(42)
    sample = torch.randn(B, 4, hw, hw)
    ctx = torch.randn(B, L, cfg.unet.cross_attention_dim)
    pyr_shapes = [(cfg.inject_channels[0], hw), (cfg.inject_channels[1],
                                                 hw // 2),
                  (cfg.inject_channels[2], hw // 4)]
    pyramid_t = [torch.randn(B, c, r, r) for c, r in pyr_shapes]
    scale = 1.35
    with torch.no_grad():
        down_t, mid_t = tmodel(sample, torch.tensor(37), ctx, pyramid_t,
                               conditioning_scale=scale)

    # trunk-only slice of the production controlnet_name_map
    name_map = [(t, f[1:], k) for t, f, k in controlnet_name_map(cfg)
                if f[0] == "trunk"]
    model = ControlNetTrunk(cfg)
    to_nhwc = lambda v: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
    sj, ctxj = to_nhwc(sample), jnp.asarray(ctx.numpy())
    pyrj = [to_nhwc(p) for p in pyramid_t]
    template = model.init(jax.random.PRNGKey(0), sj, jnp.int32(0), ctxj,
                          pyrj)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, missing, unused = convert_state_dict(sd, name_map, template,
                                                 strict=True)
    assert not unused, unused
    down_j, mid_j = model.apply(params, sj, jnp.int32(37), ctxj, pyrj,
                                scale)
    assert len(down_j) == len(down_t)
    for g, e in zip(down_j, down_t):
        np.testing.assert_allclose(np.asarray(g),
                                   _to_np(e).transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mid_j),
                               _to_np(mid_t).transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# (vi) CMP (sparse->dense motion decompressor) vs the reference's actual
# torch modules (`cmp/models/backbone/resnet.py`, `modules/shallownet.py`,
# `modules/decoder.py`), composed exactly like `cmp/models/modules/cmp.py:26-34`
# with the Fuser expectation + upsample of `cmp/models/cmp.py:30-43`.
# ---------------------------------------------------------------------------

def _load_ref_module(relpath, name):
    import importlib.util
    path = os.path.join(REFERENCE, relpath)
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

@pytest.mark.slow
def test_cmp_matches_reference_modules():
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.cmp import (CMP, cmp_batch_stats_map,
                                          cmp_name_map)
    from diffcodec_tpu.models.hf_import import convert_state_dict

    resnet = _load_ref_module("cmp/models/backbone/resnet.py", "ref_resnet")
    shallow = _load_ref_module("cmp/models/modules/shallownet.py",
                               "ref_shallownet")
    decoder = _load_ref_module("cmp/models/modules/decoder.py",
                               "ref_decoder")

    torch.manual_seed(8)

    class RefCMP(torch.nn.Module):
        """`cmp/models/modules/cmp.py:5-34` composition at the shipped
        config (resnet50 img_enc_dim 256, shallownet8x 16, SkipLayer
        decoder, output 2*99 bins)."""

        def __init__(self):
            super().__init__()
            self.image_encoder = resnet.resnet50(256)
            self.flow_encoder = shallow.shallownet8x(16)
            self.flow_decoder = decoder.MotionDecoderSkipLayer(
                input_dim=272, output_dim=198)

        def forward(self, image, sparse):
            sparse_enc = self.flow_encoder(sparse)
            img_enc, skip = self.image_encoder(image, ret_feat=True)
            return self.flow_decoder(
                torch.cat((img_enc, sparse_enc), dim=1), skip)

    tmodel = RefCMP().eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.1, 0.1)
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    image = torch.rand(1, 3, 64, 64)
    sparse = torch.cat([torch.randn(1, 2, 64, 64) * 5.0,
                        (torch.rand(1, 2, 64, 64) > 0.97).float()], dim=1)
    with torch.no_grad():
        logits_t = tmodel(image, sparse)
        # Fuser.convert_flow (`cmp/utils/visualize_utils.py:13-19`) on CPU
        nbins, fmax = 99, 50.0
        step = 2 * fmax / nbins
        mesh = (torch.arange(nbins).view(1, -1, 1, 1).float() * step
                - fmax + step / 2)
        fx = torch.softmax(logits_t[:, :nbins], dim=1)
        fy = torch.softmax(logits_t[:, nbins:], dim=1)
        flow_t = torch.cat([(fx * mesh).sum(1, keepdim=True),
                            (fy * mesh).sum(1, keepdim=True)], dim=1)
        flow_t = torch.nn.functional.interpolate(
            flow_t, size=(64, 64), mode="bilinear", align_corners=True)

    model = CMP()
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    img_j, sp_j = to_nhwc(image), to_nhwc(sparse)
    variables = model.init(jax.random.PRNGKey(0), img_j, sp_j)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, _, unused_p = convert_state_dict(
        sd, cmp_name_map(), variables["params"], strict=True)
    stats, _, unused_s = convert_state_dict(
        sd, cmp_batch_stats_map(), variables["batch_stats"], strict=True)
    assert all("num_batches_tracked" in u for u in
               set(unused_p) & set(unused_s))

    got_logits = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, img_j, sp_j,
        method=model.logits))
    np.testing.assert_allclose(got_logits,
                               _to_np(logits_t).transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)
    got_flow = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, img_j, sp_j))
    # the softmax-expectation Fuser scales fp noise by fmax=50 px
    np.testing.assert_allclose(got_flow,
                               _to_np(flow_t).transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_cmp_alexnet_plain_matches_reference_modules():
    """CMP variant parity: alexnet_fcn_32x backbone + shallownet32x +
    MotionDecoderPlain combo (1,2,4) — the rep_learning config composition
    (`cmp/experiments/rep_learning/alexnet_*/config.yaml:12-19`)."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.cmp import (CMP, cmp_batch_stats_map,
                                          cmp_name_map)
    from diffcodec_tpu.models.hf_import import convert_state_dict

    alexnet = _load_ref_module("cmp/models/backbone/alexnet.py",
                               "ref_alexnet")
    shallow = _load_ref_module("cmp/models/modules/shallownet.py",
                               "ref_shallownet2")
    decoder = _load_ref_module("cmp/models/modules/decoder.py",
                               "ref_decoder2")

    torch.manual_seed(11)

    class RefCMP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = alexnet.alexnet_fcn_32x(64)
            self.flow_encoder = shallow.shallownet32x(16)
            self.flow_decoder = decoder.MotionDecoderPlain(
                input_dim=80, output_dim=198, combo=[1, 2, 4])

        def forward(self, image, sparse):
            sparse_enc = self.flow_encoder(sparse)
            img_enc = self.image_encoder(image)
            return self.flow_decoder(
                torch.cat((img_enc, sparse_enc), dim=1))

    tmodel = RefCMP().eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.1, 0.1)
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    image = torch.rand(1, 3, 128, 128)
    sparse = torch.cat([torch.randn(1, 2, 128, 128) * 5.0,
                        (torch.rand(1, 2, 128, 128) > 0.97).float()], dim=1)
    with torch.no_grad():
        logits_t = tmodel(image, sparse)

    model = CMP(img_enc_dim=64, sparse_enc_dim=16,
                backbone="alexnet_fcn_32x", decoder="plain",
                combo=(1, 2, 4))
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    img_j, sp_j = to_nhwc(image), to_nhwc(sparse)
    variables = model.init(jax.random.PRNGKey(0), img_j, sp_j)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, _, _ = convert_state_dict(
        sd, cmp_name_map(backbone="alexnet_fcn_32x", decoder="plain"),
        variables["params"], strict=True)
    stats, _, _ = convert_state_dict(
        sd, cmp_batch_stats_map(backbone="alexnet_fcn_32x",
                                decoder="plain"),
        variables["batch_stats"], strict=True)

    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, img_j, sp_j,
        method=model.logits))
    np.testing.assert_allclose(got,
                               _to_np(logits_t).transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_cmp_flownet_decoder_matches_reference_modules():
    """CMP variant parity: resnet50 + MotionDecoderFlowNet
    (`cmp/models/modules/decoder.py:216-343`) — all four flow scales."""
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.cmp import (CMP, cmp_batch_stats_map,
                                          cmp_name_map)
    from diffcodec_tpu.models.hf_import import convert_state_dict

    resnet = _load_ref_module("cmp/models/backbone/resnet.py",
                              "ref_resnet2")
    shallow = _load_ref_module("cmp/models/modules/shallownet.py",
                               "ref_shallownet3")
    decoder = _load_ref_module("cmp/models/modules/decoder.py",
                               "ref_decoder3")

    torch.manual_seed(12)

    class RefCMP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = resnet.resnet50(256)
            self.flow_encoder = shallow.shallownet8x(16)
            self.flow_decoder = decoder.MotionDecoderFlowNet(
                input_dim=272, output_dim=198)

        def forward(self, image, sparse):
            sparse_enc = self.flow_encoder(sparse)
            img_enc, skip = self.image_encoder(image, ret_feat=True)
            return self.flow_decoder(
                torch.cat((img_enc, sparse_enc), dim=1), skip)

    tmodel = RefCMP().eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.1, 0.1)
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    image = torch.rand(1, 3, 64, 64)
    sparse = torch.cat([torch.randn(1, 2, 64, 64) * 5.0,
                        (torch.rand(1, 2, 64, 64) > 0.97).float()], dim=1)
    with torch.no_grad():
        flows_t = tmodel(image, sparse)  # [flow1, flow2, flow4, flow8]

    model = CMP(decoder="flownet")
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    img_j, sp_j = to_nhwc(image), to_nhwc(sparse)
    variables = model.init(jax.random.PRNGKey(0), img_j, sp_j)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, _, _ = convert_state_dict(
        sd, cmp_name_map(decoder="flownet"), variables["params"],
        strict=True)
    stats, _, _ = convert_state_dict(
        sd, cmp_batch_stats_map(decoder="flownet"),
        variables["batch_stats"], strict=True)

    got = model.apply({"params": params, "batch_stats": stats},
                      img_j, sp_j, method=model.logits)
    assert len(got) == 4
    for g, t in zip(got, flows_t):
        np.testing.assert_allclose(np.asarray(g),
                                   _to_np(t).transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=1e-3)
