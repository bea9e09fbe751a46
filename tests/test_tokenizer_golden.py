"""BPE golden tests: cross-validate CLIPBPETokenizer against HF CLIPTokenizer.

The reference consumes `transformers.CLIPTokenizer`
(reference train_text_to_image_control_lora.py:400-404, apps/gradio_canny2image.py:33).
The container carries no CLIP vocab asset, so exact-id verification against the real
49408-entry table is impossible here — instead these tests instantiate the REFERENCE'S
ACTUAL TOKENIZER CLASS from local synthetic vocab/merges files and assert id-for-id
agreement with our engine on the same files. That pins everything that could go wrong
in the algorithm — byte→unicode mapping, merge ORDER (lowest-rank-first with cascades),
`</w>` word-final handling, the \\p{L}/\\p{N} pre-tokenizer, lowercasing, specials,
truncation to 75+BOS/EOS, EOS-padding, and SDXL's '!'-padding — independent of which
merge table is loaded. With a real vocab.json+merges.txt in $CLIP_VOCAB_DIR the same
engine yields exact CLIP ids (see test_tokenizer.py::test_real_vocab_if_present).

Known caveat (documented, not tested): transformers' CLIPTokenizer falls back to
BasicTokenizer pre-cleanup when `ftfy` is absent, which space-splits CJK characters
and so moves `</w>` markers inside CJK runs; openai/CLIP and HF-with-ftfy treat a CJK
run as one \\p{L}+ word. We implement the canonical (ftfy-path) behavior; the prompts
below avoid CJK so they agree under either transformers configuration.
"""

import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
from transformers import CLIPTokenizer  # noqa: E402

from controllora_tpu.data.tokenizer import CLIPBPETokenizer, bytes_to_unicode

# A merge table with deliberate rank-order traps:
#  * cascades: ("h","e") must fire before ("he","ll"), which needs ("l","l") first;
#  * competing merges on the same word: "the" can go th+e</w> or t+he</w> — rank decides;
#  * word-final vs word-internal forms: ("e","r</w>") vs ("e","r");
#  * a merge whose parts are themselves merge outputs: ("an","other</w>").
MERGES = [
    ("t", "h"),
    ("h", "e"),
    ("l", "l"),
    ("a", "n"),
    ("i", "n"),
    ("o", "n"),
    ("e", "r</w>"),
    ("e", "r"),
    ("th", "e</w>"),
    ("he", "ll"),
    ("hell", "o</w>"),
    ("in", "g</w>"),
    ("a", "t</w>"),
    ("c", "at</w>"),
    ("d", "o"),
    ("do", "g</w>"),
    ("p", "h"),
    ("ph", "o"),
    ("pho", "t"),
    ("phot", "o</w>"),
    ("o", "f</w>"),
    ("o", "th"),
    ("oth", "er</w>"),
    ("an", "other</w>"),
    ("s", "t"),
    ("st", "o"),
    ("sto", "p</w>"),
    ("1", "2"),
]

PROMPTS = [
    "a photo of a cat",
    "The cat, the dog!  And another thing...",
    "hello hell heller other another",          # cascade + competing-merge traps
    "don't stop believing, it's the er era",    # contractions + er</w> vs er
    "café au lait, naïve piñata, ünïcödé",      # non-ASCII \p{L} runs (multi-byte UTF-8)
    "emoji 🎨 art & 100% CAPS",                 # symbols, digits (split per-digit), case fold
    "  leading   and\ttrailing\nwhitespace  ",  # whitespace_clean
    "",                                          # empty → BOS+EOS+pad
    "word " * 200,                               # truncation to 75 tokens + EOS
    "a" * 300,                                   # one giant word, byte-level fallback
    "<|startoftext|> literal specials <|endoftext|>",
]


def _write_assets(tmp_path):
    """vocab.json + merges.txt in the openai/CLIP scheme, consumable by both engines
    (HF skips merges line 1 as a version header; ours drops '#'-prefixed lines)."""
    vocab_list = list(bytes_to_unicode().values())
    vocab_list += [v + "</w>" for v in vocab_list]
    for m in MERGES:
        vocab_list.append("".join(m))
    vocab_list += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {v: i for i, v in enumerate(vocab_list)}
    vp, mp = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    with open(vp, "w") as f:
        json.dump(vocab, f)
    with open(mp, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(" ".join(m) for m in MERGES) + "\n")
    return vp, mp


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    vp, mp = _write_assets(tmp_path_factory.mktemp("clip_vocab"))
    return CLIPTokenizer(vp, mp), CLIPBPETokenizer.from_files(vp, mp), (vp, mp)


def test_specials_and_sizes(pair):
    hf, ours, _ = pair
    assert ours.bos == hf.bos_token_id
    assert ours.eos == hf.eos_token_id == hf.pad_token_id
    assert len(ours.encoder) == hf.vocab_size


@pytest.mark.parametrize("prompt", PROMPTS, ids=range(len(PROMPTS)))
def test_ids_match_hf(pair, prompt):
    hf, ours, _ = pair
    want = hf(prompt, padding="max_length", truncation=True, max_length=77)["input_ids"]
    got = ours(prompt)[0].tolist()
    assert got == want, f"{prompt!r}: HF {want[:16]} != ours {got[:16]}"


def test_batch_padding_matches_hf(pair):
    hf, ours, _ = pair
    batch = ["a cat", "another dog photo", ""]
    want = hf(batch, padding="max_length", truncation=True, max_length=77)["input_ids"]
    got = ours(batch)
    assert got.shape == (3, 77) and got.dtype == np.int32
    assert got.tolist() == want


def test_sdxl_bang_padding_matches_hf(pair):
    """SDXL tokenizer_2 pads with '!' (id 0) instead of EOS — our pad_id=0 path
    (pipelines/text_to_image.py:181) must equal CLIPTokenizer(pad_token='!')."""
    _, ours, (vp, mp) = pair
    hf_bang = CLIPTokenizer(vp, mp, pad_token="!")
    assert hf_bang.pad_token_id == 0
    for prompt in ("a cat", "", "hello another other"):
        want = hf_bang(prompt, padding="max_length", truncation=True,
                       max_length=77)["input_ids"]
        assert ours(prompt, pad_id=0)[0].tolist() == want


def test_merge_order_is_rank_greedy(pair):
    """Direct algorithm pin: 'hello' must cascade h+e, l+l, he+ll, hell+o</w> into a
    single token, and 'the' must take th+e</w> (rank 8) over never-merged t+he."""
    _, ours, _ = pair
    assert ours.bpe("hello") == "hello</w>"
    assert ours.bpe("the") == "the</w>"
    assert ours.bpe("era") == "er a</w>"      # word-internal 'er' (rank 7), not er</w>
    assert ours.bpe("her") == "he r</w>"      # (h,e) rank 1 beats (e,r</w>) rank 6
    assert ours.bpe("another") == "another</w>"  # merge of merge outputs


def test_vocab_rebuild_from_merges_alone(pair, tmp_path):
    """from_files(vocab_json=None) must rebuild the identical id table the openai
    scheme implies (bytes, </w> forms, merge outputs, specials — in that order)."""
    hf, ours, (_, mp) = pair
    rebuilt = CLIPBPETokenizer.from_files(None, mp)
    assert rebuilt.encoder == ours.encoder
    for prompt in PROMPTS[:4]:
        want = hf(prompt, padding="max_length", truncation=True,
                  max_length=77)["input_ids"]
        assert rebuilt(prompt)[0].tolist() == want
