"""BPE tokenizer algorithm tests (synthetic merge table)."""

import numpy as np
import pytest

from eventclip_tpu.models.clip.tokenizer import (
    EOT,
    SOT,
    SimpleTokenizer,
    bytes_to_unicode,
    tokenize,
)

# a tiny merge table: enough to BPE "a point cloud image of a cat"
MERGES = [
    ("c", "at</w>"),
    ("p", "o"),
    ("po", "int</w>"),
    ("i", "n"),
    ("in", "t</w>"),
    ("o", "f</w>"),
    ("i", "mage</w>"),
    ("m", "a"),
    ("ma", "ge</w>"),
    ("g", "e</w>"),
]


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer(merges=MERGES)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_specials(tok):
    assert tok.encoder[SOT] == tok.vocab_size - 2
    assert tok.encoder[EOT] == tok.vocab_size - 1


def test_greedy_merge_order(tok):
    # "point": p+o (rank 1) -> i+n (rank 3) -> in+t</w> (rank 4) ->
    # po+int</w> (rank 2) -> full merge
    assert tok.bpe("point") == "point</w>"
    assert tok.bpe("of") == "of</w>"
    assert tok.bpe("image") == "image</w>"
    # "cat": no ("a","t</w>") merge exists, so it stays split
    assert tok.bpe("cat") == "c a t</w>"


def test_encode_decode_roundtrip(tok):
    ids = tok.encode("a point of a point")
    assert tok.decode(ids).strip() == "a point of a point"


def test_lowercase_and_whitespace(tok):
    assert tok.encode("A   POINT") == tok.encode("a point")


def test_tokenize_shape_and_padding(tok):
    arr = tokenize(["a point", "of"], tok, context_length=10)
    assert arr.shape == (2, 10)
    assert arr.dtype == np.int32
    sot, eot = tok.encoder[SOT], tok.encoder[EOT]
    assert arr[0, 0] == sot and arr[1, 0] == sot
    # EOT is the max id in each row (argmax pooling depends on this)
    assert arr[0].max() == eot
    row = arr[1]
    assert row[1] == tok.encoder["of</w>"]
    assert row[2] == eot and (row[3:] == 0).all()


def test_tokenize_truncation(tok):
    long = "a point " * 20
    with pytest.raises(RuntimeError):
        tokenize([long], tok, context_length=8)
    arr = tokenize([long], tok, context_length=8, truncate=True)
    assert arr.shape == (1, 8)
    assert arr[0, -1] == tok.encoder[EOT]


def test_nfc_normalization(tok):
    # composed (U+00E9) and decomposed (e + U+0301) spellings must encode
    # identically — ftfy.fix_text in the reference applies NFC; _clean does
    import unicodedata

    composed = "caf\u00e9"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed  # really two spellings
    assert tok.encode(composed) == tok.encode(decomposed)
    # entity-encoded combining mark: must compose AFTER html.unescape
    assert tok.encode(composed) == tok.encode("cafe&#769;")
