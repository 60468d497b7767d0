"""CLIP BPE tokenizer tests (synthetic merges; real vocab file optional)."""

import gzip

import numpy as np
import pytest

from diffcodec_tpu.utils.tokenizer import (ClipTokenizer, HashTokenizer,
                                           bytes_to_unicode,
                                           default_tokenizer,
                                           whitespace_clean)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_whitespace_clean():
    assert whitespace_clean("  a \t b\n\nc ") == "a b c"


def _toy_tokenizer():
    # merges that build up "he", "ll", "hell", "o</w>", "hello</w>"
    merges = [("h", "e"), ("l", "l"), ("he", "ll"),
              ("o", "</w>"), ("hell", "o</w>")]
    return ClipTokenizer(merges, context_length=10)


def test_clip_bpe_merging():
    tok = _toy_tokenizer()
    ids = tok.encode_text("hello")
    # fully merged to the single 'hello</w>' token
    assert len(ids) == 1
    assert ids[0] == tok.encoder["hello</w>"]
    ids2 = tok.encode_text("heo")
    # 'he' merge applies, 'o</w>' merge applies
    assert ids2 == [tok.encoder["he"], tok.encoder["o</w>"]]


def test_clip_batch_framing_and_padding():
    tok = _toy_tokenizer()
    out = tok(["hello", ""])
    assert out.shape == (2, 10)
    assert out[0, 0] == tok.sot
    assert out[0, 1] == tok.encoder["hello</w>"]
    assert out[0, 2] == tok.eot
    assert (out[0, 3:] == tok.eot).all()
    assert out[1, 0] == tok.sot and out[1, 1] == tok.eot


def test_clip_truncation():
    tok = _toy_tokenizer()
    out = tok(["hello " * 50])
    assert out.shape[1] == 10
    assert out[0, 0] == tok.sot
    assert out[0, -1] == tok.eot


def test_clip_lowercase_and_unknown_chars():
    tok = _toy_tokenizer()
    assert tok.encode_text("HELLO") == tok.encode_text("hello")


def test_from_merges_file(tmp_path):
    lines = ["#version", "h e", "l l", "he ll", "o </w>", "hell o</w>"]
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    tok = ClipTokenizer.from_merges_file(str(p), context_length=8)
    assert tok is not None
    assert tok.encode_text("hello") == [tok.encoder["hello</w>"]]
    assert ClipTokenizer.from_merges_file("/nonexistent") is None


def test_hash_tokenizer_interface():
    tok = HashTokenizer(context_length=8)
    out = tok(["a b c", "a b c"])
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(out[0], out[1])  # deterministic
    assert out[0, 0] == tok.sot


def test_default_tokenizer_fallback():
    tok = default_tokenizer(context_length=16)
    out = tok(["some caption"])
    assert out.shape == (1, 16)
