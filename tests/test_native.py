"""Native C++ IO library tests: bit-identical with the Python paths."""

import numpy as np
import pytest

from diffcodec_tpu.codec.bits import (decode_sparse_flow as py_decode,
                                      encode_sparse_flow as py_encode)
from diffcodec_tpu.codec.sparse_flow import flow_sampler
from diffcodec_tpu.utils import native
from diffcodec_tpu.utils.flo_io import read_flo as py_read_flo
from diffcodec_tpu.utils.flo_io import write_flo as py_write_flo

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


def test_native_flo_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.standard_normal((23, 31, 2)).astype(np.float32)
    p_native = str(tmp_path / "n.flo")
    p_python = str(tmp_path / "p.flo")
    native.write_flo(p_native, flow)
    py_write_flo(p_python, flow)
    with open(p_native, "rb") as a, open(p_python, "rb") as b:
        assert a.read() == b.read()  # byte-identical files
    np.testing.assert_array_equal(native.read_flo(p_python), flow)
    np.testing.assert_array_equal(py_read_flo(p_native), flow)


def test_native_flo_bad_file(tmp_path):
    p = str(tmp_path / "bad.flo")
    with open(p, "wb") as f:
        f.write(b"nope")
    with pytest.raises(ValueError):
        native.read_flo(p)


def test_native_pooled_read_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    flow = rng.standard_normal((37, 53, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    py_write_flo(p, flow)
    got = native.read_flo_pooled(p, 16, 16)
    from diffcodec_tpu.train.dataset import adaptive_avg_pool_flow
    want = adaptive_avg_pool_flow(flow, 16, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_sfl_roundtrip_bit_identical():
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((64, 96, 2)).astype(np.float32) * 8
    sparse, mask = flow_sampler(flow, strategy=("grid",), bg_ratio=1 / 256,
                                rng=rng)
    data_native = native.encode_sparse_flow(sparse, mask)
    data_python = py_encode(sparse, mask)
    assert data_native == data_python  # byte-identical bitstreams
    # cross-decode both ways
    dn, mn = native.decode_sparse_flow(data_python)
    dp, mp = py_decode(data_native)
    np.testing.assert_array_equal(dn, dp)
    np.testing.assert_array_equal(mn, mp)


def test_native_sfl_bad_stream():
    with pytest.raises(ValueError):
        native.decode_sparse_flow(b"XXXX" + b"\x00" * 20)
