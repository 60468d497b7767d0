"""Numeric oracles for LPIPS and MS-SSIM.

The reference computes LPIPS via the `lpips` package (NormFixLPIPS
subclass, `controlnet/lpips_loss.py:32-107`) and MS-SSIM via
`pytorch_msssim` at data_range 255 (`test_utils.py:41-42`).  Neither
package is installable here, so both are re-declared in torch from their
published semantics — the same method used for the SD stack
(tests/torch_sd.py) — and the JAX implementations are tested against the
torch forwards AND against committed golden vectors (so the oracle holds
even where torch is absent).
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _to_np(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# LPIPS (NormFixLPIPS, alex) torch re-declaration
# ---------------------------------------------------------------------------

class _AlexSlices(torch.nn.Module):
    """lpips.pretrained_networks.alexnet: torchvision AlexNet.features
    split into five slices that keep the original sequential indices
    (slice1=[0:2], slice2=[2:5], slice3=[5:8], slice4=[8:10],
    slice5=[10:12])."""

    def __init__(self):
        super().__init__()
        conv = torch.nn.Conv2d
        relu = torch.nn.ReLU
        pool = lambda: torch.nn.MaxPool2d(3, stride=2)
        self.slice1 = torch.nn.Sequential(OrderedDict([
            ("0", conv(3, 64, 11, stride=4, padding=2)), ("1", relu())]))
        self.slice2 = torch.nn.Sequential(OrderedDict([
            ("2", pool()), ("3", conv(64, 192, 5, padding=2)),
            ("4", relu())]))
        self.slice3 = torch.nn.Sequential(OrderedDict([
            ("5", pool()), ("6", conv(192, 384, 3, padding=1)),
            ("7", relu())]))
        self.slice4 = torch.nn.Sequential(OrderedDict([
            ("8", conv(384, 256, 3, padding=1)), ("9", relu())]))
        self.slice5 = torch.nn.Sequential(OrderedDict([
            ("10", conv(256, 256, 3, padding=1)), ("11", relu())]))

    def forward(self, x):
        outs = []
        for s in (self.slice1, self.slice2, self.slice3, self.slice4,
                  self.slice5):
            x = s(x)
            outs.append(x)
        return outs


class _NetLin(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.model = torch.nn.Sequential(
            torch.nn.Dropout(),
            torch.nn.Conv2d(cin, 1, 1, bias=False))

    def forward(self, x):
        return self.model(x)


class NormFixLPIPSTorch(torch.nn.Module):
    """NormFixLPIPS(net='alex') semantics (`lpips_loss.py:55-107`):
    scaling layer, alex slices, eps-INSIDE-sqrt channel normalization
    (`lpips_loss.py:27-29`), squared diffs, 1x1 lin heads, spatial
    average, sum over layers."""

    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-.030, -.088, -.188])[None, :, None,
                                                         None])
        self.register_buffer(
            "scale", torch.tensor([.458, .448, .450])[None, :, None, None])
        self.net = _AlexSlices()
        for k, ch in enumerate((64, 192, 384, 256, 256)):
            setattr(self, f"lin{k}", _NetLin(ch))

    @staticmethod
    def _normalize(x, eps=1e-8):
        return x / torch.sqrt(torch.sum(x ** 2 + eps, dim=1, keepdim=True))

    def forward(self, in0, in1):
        f0 = self.net((in0 - self.shift) / self.scale)
        f1 = self.net((in1 - self.shift) / self.scale)
        val = 0
        for k in range(5):
            d = (self._normalize(f0[k]) - self._normalize(f1[k])) ** 2
            lin = getattr(self, f"lin{k}")(d)
            val = val + lin.mean(dim=(2, 3), keepdim=True)
        return val


def test_lpips_matches_torch_redeclaration():
    import jax
    import jax.numpy as jnp

    from diffcodec_tpu.models.hf_import import (convert_state_dict,
                                                lpips_alex_name_map)
    from diffcodec_tpu.train.lpips import LPIPS

    torch.manual_seed(51)
    tmodel = NormFixLPIPSTorch().eval()
    for p in tmodel.parameters():
        with torch.no_grad():
            p.uniform_(-0.1, 0.1)
    # lin heads must be positive-ish so the sum is a real perceptual score
    for k in range(5):
        with torch.no_grad():
            getattr(tmodel, f"lin{k}").model[1].weight.abs_()

    x0 = torch.rand(2, 3, 64, 64) * 2 - 1
    x1 = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        expected = _to_np(tmodel(x0, x1)).reshape(-1)

    model = LPIPS()
    to_nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    a, b = to_nhwc(x0), to_nhwc(x1)
    template = model.init(jax.random.PRNGKey(0), a, b)
    sd = {k: _to_np(v) for k, v in tmodel.state_dict().items()}
    params, missing, unused = convert_state_dict(
        sd, lpips_alex_name_map(), template, strict=True)
    assert set(unused) == {"shift", "scale"}, unused
    got = np.asarray(model.apply(params, a, b))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# MS-SSIM (pytorch_msssim) torch re-declaration + committed golden vectors
# ---------------------------------------------------------------------------

def _fspecial_gauss_1d(size, sigma):
    coords = torch.arange(size, dtype=torch.float32) - size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum())[None, None, :]


def _gaussian_filter(x, win):
    """Separable valid-mode filter with groups=C (pytorch_msssim
    `gaussian_filter`)."""
    C = x.shape[1]
    out = torch.nn.functional.conv2d(x, win.expand(C, 1, 1, -1), groups=C)
    return torch.nn.functional.conv2d(
        out, win.expand(C, 1, 1, -1).transpose(2, 3), groups=C)


def _torch_ssim(x, y, data_range, win, K=(0.01, 0.03)):
    K1, K2 = K
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    return ssim_map.flatten(2).mean(-1), cs_map.flatten(2).mean(-1)


def torch_ms_ssim(x, y, data_range=255.0,
                  weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
    """pytorch_msssim.ms_ssim re-declaration (win 11, sigma 1.5,
    size_average=True): relu'd per-channel cs at coarse scales + ssim at
    the finest, avg_pool2d(kernel 2, padding=dim%2) downsampling,
    per-channel prod(m^w), then mean."""
    win = _fspecial_gauss_1d(11, 1.5)
    weights_t = torch.tensor(list(weights))
    levels = weights_t.numel()
    mcs = []
    for i in range(levels):
        ssim_pc, cs = _torch_ssim(x, y, data_range, win)
        if i < levels - 1:
            mcs.append(torch.relu(cs))
            padding = [s % 2 for s in x.shape[2:]]
            x = torch.nn.functional.avg_pool2d(x, kernel_size=2,
                                               padding=padding)
            y = torch.nn.functional.avg_pool2d(y, kernel_size=2,
                                               padding=padding)
    ssim_pc = torch.relu(ssim_pc)
    mcs_and_ssim = torch.stack(mcs + [ssim_pc], dim=0)  # [L, B, C]
    val = torch.prod(mcs_and_ssim ** weights_t.view(-1, 1, 1), dim=0)
    return val.mean(dim=-1)  # [B]


def _golden_inputs(h, w, seed):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=(2, h, w, 3)).astype(np.float32)
    noise = rng.normal(0, 12.0, size=base.shape).astype(np.float32)
    pred = np.clip(base + noise, 0, 255)
    return base, pred


# Golden vectors: torch_ms_ssim outputs on the deterministic inputs above
# (computed once with torch 2.x CPU, committed).  192x192 hits the pure
# even-size path; 180x164 exercises the odd-size symmetric-zero-pad
# avg_pool twice (45->23->12 rows).
_GOLDEN = {
    (192, 192, 7): np.array([0.9891836, 0.9896341], np.float32),
    (180, 164, 8): np.array([0.9895482, 0.9893033], np.float32),
}


def test_ms_ssim_matches_torch_redeclaration_and_golden():
    from diffcodec_tpu.eval.metrics import ms_ssim

    for (h, w, seed), golden in _GOLDEN.items():
        orig, pred = _golden_inputs(h, w, seed)
        t_orig = torch.from_numpy(orig.transpose(0, 3, 1, 2))
        t_pred = torch.from_numpy(pred.transpose(0, 3, 1, 2))
        with torch.no_grad():
            expected = _to_np(torch_ms_ssim(t_orig, t_pred, 255.0))
        got = np.asarray(ms_ssim(orig, pred, 255.0))
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(got, golden, atol=2e-5, rtol=1e-5)


def test_ms_ssim_identical_inputs_is_one():
    from diffcodec_tpu.eval.metrics import ms_ssim

    orig, _ = _golden_inputs(176, 176, 9)
    got = np.asarray(ms_ssim(orig, orig, 255.0))
    np.testing.assert_allclose(got, np.ones(2), atol=1e-6)
