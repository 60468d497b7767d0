"""End-to-end drive of the classical-anchor subprocess drivers against
MOCK binaries (ffmpeg/ffprobe/vvdecapp are absent in this zero-egress
image).  The mocks validate the exact argv each driver constructs — the
piece fixture-only parser tests can't reach — and emit plausible outputs
so the full chain (encode -> probe -> split -> storage file -> decode)
executes for real.

Parity targets: `test.sh:33-56` and `vvc_decode.sh:36-66` loop bodies.
"""

import json
import os
import stat
import sys

import pytest

from diffcodec_tpu.codec.anchors import (decode_vvc, parse_intra_inter_storage,
                                         run_classical_anchor)


def _write_mock(path, body):
    with open(path, "w") as f:
        f.write(f"#!{sys.executable}\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)


FFMPEG_BODY = '''
import json, os, sys
args = sys.argv[1:]
log = os.environ["MOCK_LOG"]
with open(log, "a") as f:
    f.write(json.dumps(args) + "\\n")
# the output path is the last non-flag arg (or the f%03d.png pattern)
outs = [a for a in args if not a.startswith("-")]
target = outs[-1]
if "%0" in target:  # decode-to-frames: emit 3 dummy pngs
    os.makedirs(os.path.dirname(target), exist_ok=True)
    for i in (1, 2, 3):
        open(target % i if "%" in target else target, "wb").write(b"P")
else:
    open(target, "wb").write(b"\\x00" * 100)
'''

FFPROBE_BODY = '''
import json, sys
frames = [{"pict_type": "I", "pkt_size": "1000"},
          {"pict_type": "P", "pkt_size": "300"},
          {"pict_type": "B", "pkt_size": "200"},
          {"pict_type": "P", "pkt_size": "250"}]
print(json.dumps({"frames": frames}))
'''

VVDEC_BODY = '''
import os, sys
# argv: -b <in.vvc> -o <out.yuv>
out = sys.argv[sys.argv.index("-o") + 1]
# over-emit: 3 decoded POCs but 4 frames worth of YUV (driver truncates)
open(out, "wb").write(b"\\x00" * (16 * 16 * 3 // 2 * 4))
print("POC    0 ( CRA, I-SLICE, QP 30 ) 8000 bits [DT 0.01]")
print("POC    1 ( TRAIL, B-SLICE, QP 34 ) 2400 bits [DT 0.01]")
print("POC    2 ( TRAIL, P-SLICE, QP 33 ) 1600 bits [DT 0.01]")
'''


@pytest.fixture
def mock_bin(tmp_path, monkeypatch):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "calls.jsonl"
    log.touch()
    _write_mock(str(bin_dir / "ffmpeg"), FFMPEG_BODY)
    _write_mock(str(bin_dir / "ffprobe"), FFPROBE_BODY)
    _write_mock(str(bin_dir / "vvdecapp"), VVDEC_BODY)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    monkeypatch.setenv("MOCK_LOG", str(log))
    return log


def _calls(log):
    return [json.loads(line) for line in open(log) if line.strip()]


def test_classical_anchor_chain(tmp_path, mock_bin):
    out_dir = str(tmp_path / "h264" / "bpp_0.05")
    split = run_classical_anchor(
        "frames/f_%04d.png", out_dir, "libx264", bpp=0.05, width=1920,
        height=1080, fps=120.0, gop=8, num_frames=96)
    # byte split from the mocked ffprobe stream
    assert split == {"intra_bytes": 1000, "inter_bytes": 750,
                     "total_bytes": 1750}
    # storage file round-trips through the eval-side parser
    parsed = parse_intra_inter_storage(
        os.path.join(out_dir, "intra_inter_storage.txt"))
    assert parsed == split
    # decoded frames landed
    assert os.path.exists(os.path.join(out_dir, "decoded", "frame_0001.png"))
    # argv checks: encode call carries the test.sh bitrate formula and the
    # x264-appropriate keyint flags (the reference passes -x265-params to
    # libx264, which x264 ignores — documented fix)
    enc = _calls(mock_bin)[0]
    bitrate = str(int(0.05 * 1920 * 1080 * 120))
    # the output path must be the final operand (a missing out_path made
    # ffmpeg write to a flag value — caught by this chain's first run)
    assert enc[-1] == os.path.join(out_dir, "output.mp4")
    assert os.path.getsize(enc[-1]) > 0
    assert "-c:v" in enc and enc[enc.index("-c:v") + 1] == "libx264"
    assert enc[enc.index("-b:v") + 1] == bitrate
    assert enc[enc.index("-g") + 1] == "8"
    assert enc[enc.index("-keyint_min") + 1] == "8"
    assert enc[enc.index("-sc_threshold") + 1] == "0"
    assert enc[enc.index("-frames:v") + 1] == "96"


def test_classical_anchor_x265_params(tmp_path, mock_bin):
    run_classical_anchor(
        "frames/f_%04d.png", str(tmp_path / "h265"), "libx265", bpp=0.01,
        width=1920, height=1080, fps=120.0, gop=8, decode_frames=False)
    enc = _calls(mock_bin)[0]
    assert enc[enc.index("-c:v") + 1] == "libx265"
    params = enc[enc.index("-x265-params") + 1]
    assert "keyint=8" in params and "min-keyint=8" in params
    assert "scenecut=0" in params


def test_vvc_decode_chain(tmp_path, mock_bin):
    vvc = tmp_path / "gop8_Beauty_bpp0.01.vvc"
    vvc.write_bytes(b"\x00")
    out_dir = str(tmp_path / "decoded" / "Beauty" / "bpp0.01")
    split = decode_vvc(str(vvc), out_dir, width=16, height=16)
    # bits from the POC log, /8 to bytes
    assert split == {"intra_bytes": 1000, "inter_bytes": 500,
                     "total_bytes": 1500}
    parsed = parse_intra_inter_storage(
        os.path.join(out_dir, "intra_inter_storage.txt"))
    assert parsed == split
    # the over-emitted YUV was truncated to 3 decoded frames
    frame_bytes = 16 * 16 * 3 // 2
    assert os.path.getsize(
        os.path.join(out_dir, "output_decoded.yuv")) == 3 * frame_bytes
    # frame extraction ran with the YUV raw-input geometry args
    ff = [c for c in _calls(mock_bin) if "-pix_fmt" in c][-1]
    assert ff[ff.index("-s:v") + 1] == "16x16"
    assert os.path.exists(os.path.join(out_dir, "f001.png"))


def test_missing_binary_is_a_clear_error(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(RuntimeError, match="ffmpeg"):
        run_classical_anchor("f%d.png", str(tmp_path / "o"), "libx264",
                             0.05, 64, 64, 30.0, 8)


def test_vvenc_encode_argv(tmp_path, mock_bin):
    from diffcodec_tpu.codec.anchors import encode_vvenc
    yuv = tmp_path / "in.yuv"
    yuv.write_bytes(b"\x00" * (64 * 64 * 3 // 2 * 5))
    out = str(tmp_path / "out.vvc")
    encode_vvenc(str(yuv), out, bpp=0.01, width=1920, height=1080,
                 fps=120.0, gop=8, num_frames=97)
    enc = _calls(mock_bin)[0]
    # vcc_test.sh:40-50 loop body: raw YUV input geometry + libvvenc
    assert enc[enc.index("-f") + 1] == "rawvideo"
    assert enc[enc.index("-s:v") + 1] == "1920x1080"
    assert enc[enc.index("-c:v") + 1] == "libvvenc"
    assert enc[enc.index("-preset") + 1] == "medium"
    assert enc[enc.index("-g") + 1] == "8"
    assert enc[enc.index("-b:v") + 1] == str(int(0.01 * 1920 * 1080 * 120))
    assert enc[enc.index("-frames:v") + 1] == "97"
    assert enc[-1] == out and os.path.getsize(out) > 0


# ---------------------------------------------------------------------------
# Real-binary twins (VERDICT r04 #6): the same chains against ACTUAL
# ffmpeg/ffprobe/vvenc/vvdec when present.  They skip in this zero-egress
# image and auto-upgrade to real executions on any machine with the
# binaries (e.g. weights day), asserting the report-format invariants the
# eval layer depends on.
# ---------------------------------------------------------------------------

import shutil
import subprocess

_HAVE_FFMPEG = (shutil.which("ffmpeg") is not None
                and shutil.which("ffprobe") is not None)


def _ffmpeg_has_encoder(name):
    try:
        out = subprocess.run(["ffmpeg", "-hide_banner", "-encoders"],
                             capture_output=True, text=True, timeout=30)
        return any(line.split()[1:2] == [name]
                   for line in out.stdout.splitlines() if line.strip())
    except Exception:
        return False


def _write_motion_frames(dir_path, n=5, size=64):
    """n PNG frames of a moving bright square over a gradient — enough
    texture that intra and inter frames both carry real bits."""
    import numpy as np
    from PIL import Image
    os.makedirs(dir_path, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size]
    base = ((xx + yy) * 255 // (2 * size)).astype(np.uint8)
    for i in range(n):
        img = np.stack([base, base[::-1], base.T], -1).copy()
        x0 = 4 + 6 * i
        img[10:30, x0:x0 + 16] = (255, 64, 0)
        Image.fromarray(img).save(
            os.path.join(dir_path, f"f_{i + 1:04d}.png"))


@pytest.mark.skipif(not _HAVE_FFMPEG,
                    reason="ffmpeg/ffprobe not installed (zero-egress "
                           "image); runs for real where they exist")
@pytest.mark.parametrize("codec", ["libx264", "libx265"])
def test_real_anchor_chain_five_frames(tmp_path, codec):
    from diffcodec_tpu.codec.anchors import probe_frame_sizes
    if not _ffmpeg_has_encoder(codec):
        pytest.skip(f"ffmpeg lacks the {codec} encoder")
    frames_dir = tmp_path / "frames"
    _write_motion_frames(str(frames_dir), n=5, size=64)
    out_dir = str(tmp_path / codec / "bpp_0.5")
    split = run_classical_anchor(
        os.path.join(str(frames_dir), "f_%04d.png"), out_dir, codec,
        bpp=0.5, width=64, height=64, fps=30.0, gop=2, num_frames=5)
    # report-format invariants the eval layer depends on
    assert split["intra_bytes"] > 0
    assert split["total_bytes"] == split["intra_bytes"] + split["inter_bytes"]
    parsed = parse_intra_inter_storage(
        os.path.join(out_dir, "intra_inter_storage.txt"))
    assert parsed == split
    # keyint=2 over 5 frames: frame 0 is I and at least frames 2/4 follow
    sizes = probe_frame_sizes(os.path.join(out_dir, "output.mp4"))
    assert len(sizes) == 5
    assert sizes[0][0] == "I"
    assert sum(1 for t, _ in sizes if t == "I") >= 2
    assert all(s > 0 for _, s in sizes)
    decoded = sorted(os.listdir(os.path.join(out_dir, "decoded")))
    assert len(decoded) == 5 and decoded[0] == "frame_0001.png"


@pytest.mark.skipif(not _HAVE_FFMPEG or shutil.which("vvdecapp") is None,
                    reason="ffmpeg+vvdecapp not installed (zero-egress "
                           "image); runs for real where they exist")
def test_real_vvc_chain_five_frames(tmp_path):
    from diffcodec_tpu.codec.anchors import encode_vvenc
    if not _ffmpeg_has_encoder("libvvenc"):
        pytest.skip("ffmpeg lacks the libvvenc encoder")
    import numpy as np
    w = h = 64
    rng = np.random.default_rng(0)
    yuv = tmp_path / "in.yuv"
    with open(yuv, "wb") as f:
        for i in range(5):
            y = (np.linspace(0, 255, w * h) + 20 * i).astype(np.uint8)
            uv = rng.integers(100, 156, w * h // 2, dtype=np.uint8)
            f.write(y.tobytes() + uv.tobytes())
    vvc = str(tmp_path / "out.vvc")
    encode_vvenc(str(yuv), vvc, bpp=0.5, width=w, height=h, fps=30.0,
                 gop=2, num_frames=5)
    assert os.path.getsize(vvc) > 0
    out_dir = str(tmp_path / "dec")
    split = decode_vvc(vvc, out_dir, width=w, height=h)
    assert split["intra_bytes"] > 0
    assert split["total_bytes"] == split["intra_bytes"] + split["inter_bytes"]
    frame_bytes = w * h * 3 // 2
    assert os.path.getsize(
        os.path.join(out_dir, "output_decoded.yuv")) % frame_bytes == 0
