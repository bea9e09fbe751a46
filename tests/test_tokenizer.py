"""Tokenizer tests: CLIP BPE machinery with a synthetic merges file + hash fallback."""

import numpy as np
import pytest

from controllora_tpu.data.tokenizer import (
    CLIPBPETokenizer,
    HashTokenizer,
    bytes_to_unicode,
    default_tokenizer,
)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def make_tiny_bpe(tmp_path):
    """Merges teaching 'he', 'll', 'hell', 'o</w>', 'hello</w>'."""
    merges = ["h e", "l l", "he ll", "o </w>", "hell o</w>"]
    p = tmp_path / "merges.txt"
    p.write_text("#version\n" + "\n".join(merges) + "\n")
    return CLIPBPETokenizer.from_files(None, str(p))


def test_bpe_merging(tmp_path):
    tok = make_tiny_bpe(tmp_path)
    # 'hello' should merge down to the single token 'hello</w>'
    ids = tok.encode_text("hello")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "hello</w>"
    # unseen word splits into byte-level pieces with </w> on the last
    ids2 = tok.encode_text("hi")
    assert len(ids2) >= 1
    assert tok.decoder[ids2[-1]].endswith("</w>")


def test_bpe_call_shape_and_specials(tmp_path):
    tok = make_tiny_bpe(tmp_path)
    out = tok(["hello hello", "hello"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.bos
    # padded with eos
    assert (out[:, -1] == tok.eos).all()


def test_bpe_lowercase_and_whitespace(tmp_path):
    tok = make_tiny_bpe(tmp_path)
    np.testing.assert_array_equal(tok(["HELLO"]), tok(["  hello  "]))


def test_hash_tokenizer_stable():
    t = HashTokenizer()
    a = t(["a red circle"])
    b = t(["a red circle"])
    np.testing.assert_array_equal(a, b)
    c = t(["a blue circle"])
    assert (a != c).any()
    assert a.shape == (1, 77)


def test_default_tokenizer_fallback_warns():
    with pytest.warns(UserWarning, match="HashTokenizer"):
        assert isinstance(default_tokenizer(), HashTokenizer)


def test_default_tokenizer_require_clip_raises(tmp_path, monkeypatch):
    """Pretrained weights + no CLIP vocab must fail loudly (VERDICT round-1 item 4)."""
    monkeypatch.delenv("CLIP_VOCAB_DIR", raising=False)
    with pytest.raises(FileNotFoundError, match="CLIP"):
        default_tokenizer(require_clip=True)
    # an assets dir without merges is equally fatal
    with pytest.raises(FileNotFoundError, match="merges"):
        default_tokenizer(assets_dir=str(tmp_path), require_clip=True)


def test_default_tokenizer_require_clip_ok_with_assets(tmp_path):
    merges = ["h e", "l l", "he ll", "o </w>", "hell o</w>"]
    (tmp_path / "merges.txt").write_text("#version\n" + "\n".join(merges) + "\n")
    tok = default_tokenizer(assets_dir=str(tmp_path), require_clip=True)
    assert isinstance(tok, CLIPBPETokenizer)
