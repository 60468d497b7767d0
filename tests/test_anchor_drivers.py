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
