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


def test_mojibake_repair(tok):
    # the ftfy.fix_text behaviors the reference tokenizer inherits
    # (models/clip_cls.py:81-83 -> clip.tokenize): UTF-8 mis-decoded as
    # cp1252/latin-1 is repaired before encoding
    from eventclip_tpu.models.clip.tokenizer import _fix_mojibake

    # classic single mis-decode: b"caf\xc3\xa9" read as latin-1
    assert _fix_mojibake("caf\u00c3\u00a9") == "caf\u00e9"
    assert tok.encode("caf\u00c3\u00a9") == tok.encode("caf\u00e9")
    # cp1252 smart quotes: b"\xe2\x80\x9c ok \xe2\x80\x9d" read as cp1252
    # (the trailing 0x9d is a cp1252 hole -> carried as U+009D)
    assert _fix_mojibake("\u00e2\u20ac\u0153ok\u00e2\u20ac\u009d") == "\u201cok\u201d"
    # double-encoded: two repair passes
    assert _fix_mojibake("caf\u00c3\u0192\u00c2\u00a9") == "caf\u00e9"
    # entity-encoded mojibake becomes repairable after html.unescape
    assert tok.encode("caf&#195;&#169;") == tok.encode("caf\u00e9")


def test_mojibake_repair_leaves_clean_text_alone():
    from eventclip_tpu.models.clip.tokenizer import _fix_mojibake

    for clean in [
        "caf\u00e9",  # genuine Latin-1-range text
        "Gr\u00f6\u00dfe",  # 0xF6 0xDF is not a UTF-8 sequence
        "a point cloud image of a cat",
        "\u03bd\u03b1\u03cc\u03c2",  # non-Latin text can't be a single-byte mis-decode
        "\u00e3\u00a9",  # signature bytes but truncated UTF-8: no strict decode
        "d\u00e9j\u00e0 vu \u00e2\u20ac\u201d dash",  # mixed: whole-string decode fails
    ]:
        assert _fix_mojibake(clean) == clean
