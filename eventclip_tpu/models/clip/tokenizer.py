"""CLIP byte-pair-encoding tokenizer.

A from-scratch implementation of the tokenizer contract used by the
reference through `clip.tokenize` (models/clip_cls.py:81-83): lowercased,
whitespace-collapsed text is split by the CLIP lexer regex, each piece is
byte-level BPE-encoded with `</w>` word-end markers, and sequences are
wrapped in <|startoftext|> / <|endoftext|> and zero-padded to a fixed
context length.

The merge table is the standard `bpe_simple_vocab_16e6.txt.gz` asset from
the CLIP release. Pass its path explicitly or drop it at
assets/bpe_simple_vocab_16e6.txt.gz; tests exercise the algorithm with a
synthetic merge table.

Note: the reference additionally runs ftfy.fix_text; for the ASCII class
names and prompt templates used by every dataset this is a no-op. `_clean`
reproduces its effects that can matter for user-supplied names without the
dependency: HTML-entity unescaping, NFC unicode normalization, and
mojibake repair (UTF-8 text mis-decoded as cp1252/latin-1, the dominant
corruption ftfy targets — see `_fix_mojibake`). The repair is deliberately
stricter than ftfy's: it only fires when the whole string round-trips as
valid UTF-8, so mixed-encoding strings are left untouched rather than
partially rewritten.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np
import regex as re

_LEXER = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"

# static candidates: the package asset directory (eventclip_tpu/assets/)
# and, as a fallback, a repo-root assets/ directory
DEFAULT_BPE_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                 "bpe_simple_vocab_16e6.txt.gz"),
    os.path.join(os.path.dirname(__file__), "..", "..", "..", "assets",
                 "bpe_simple_vocab_16e6.txt.gz"),
)


def bpe_asset_paths() -> Tuple[str, ...]:
    """Candidate vocab locations, EVENTCLIP_BPE_PATH override first.

    A function (not a frozen tuple) so the env override is read at call
    time — tests and export builds can point at a vocab after import."""
    return (os.environ.get("EVENTCLIP_BPE_PATH", ""),) + DEFAULT_BPE_PATHS


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 reversible byte <-> printable unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# A UTF-8 multibyte sequence seen through a single-byte decode: a lead
# byte 0xC2-0xF4 followed by a continuation byte 0x80-0xBF. Plain Latin
# text ("Größe": 0xF6 0xDF) never produces this pattern.
_UTF8_SEQ = re.compile(rb"[\xc2-\xf4][\x80-\xbf]")

def _encode_sloppy_cp1252(text: str):
    """The bytes `text` came from if it was a cp1252/latin-1 mis-decode.

    cp1252 where defined; the C1 range cp1252 leaves undefined (incl. its
    five holes) falls back to latin-1 ordinals, matching how a real
    mis-decode carries those bytes through. Returns None when some
    character can't have come from a single byte (true non-Latin text) —
    no repair is possible then.
    """
    out = bytearray()
    for ch in text:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            if ord(ch) < 0x100:
                out.append(ord(ch))
            else:
                return None
    return bytes(out)


def _fix_mojibake(text: str) -> str:
    """Repair UTF-8 text that was mis-decoded as cp1252/latin-1.

    The dominant corruption ftfy.fix_text repairs ("cafÃ©" -> "café",
    "â€œ" -> left curly quote). Conservative by construction: the repair
    applies only when (a) re-encoding the whole string as sloppy-cp1252
    succeeds, (b) the bytes contain a UTF-8 multibyte signature, and
    (c) the whole byte string strictly decodes as UTF-8. Iterates to also
    undo double-encoding; strings that fail any gate pass through
    unchanged.
    """
    for _ in range(3):
        data = _encode_sloppy_cp1252(text)
        if data is None or not _UTF8_SEQ.search(data):
            return text
        try:
            fixed = data.decode("utf-8")
        except UnicodeDecodeError:
            return text
        if fixed == text:
            return text
        text = fixed
    return text


def _clean(text: str) -> str:
    # order matches ftfy.fix_text's effective pipeline: unescape first (an
    # HTML-entity combining mark "cafe&#769;" only becomes composable once
    # the entity expands; entity-encoded mojibake "caf&#195;&#169;" only
    # becomes repairable once expanded), then mojibake repair, then NFC
    text = html.unescape(html.unescape(text))
    text = _fix_mojibake(text)
    text = unicodedata.normalize("NFC", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def parse_merges(text: str) -> List[Tuple[str, str]]:
    """Decoded BPE vocab file contents -> the merge list.

    The released table has a version header line and is truncated to 48894
    usable merges (48895 - 257 special slots already accounted in the
    vocab assembly below). Shared by the file loader and by consumers that
    carry the vocab as bytes (export bundles ship it for offline
    set_classes)."""
    lines = text.split("\n")
    return [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1]]


class SimpleTokenizer:
    def __init__(self, bpe_path: str = None, merges: Sequence[Tuple[str, str]] = None):
        if merges is None:
            merges = self._load_merges(bpe_path)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab = vocab + ["".join(m) for m in merges]
        vocab = vocab + [SOT, EOT]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.cache = {SOT: SOT, EOT: EOT}

    @staticmethod
    def _load_merges(bpe_path):
        if bpe_path is None:
            for cand in bpe_asset_paths():
                if cand and os.path.exists(cand):
                    bpe_path = cand
                    break
        if bpe_path is None or not os.path.exists(bpe_path):
            raise FileNotFoundError(
                "CLIP BPE merge table not found; place "
                "bpe_simple_vocab_16e6.txt.gz under assets/ or set "
                "EVENTCLIP_BPE_PATH"
            )
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            return parse_merges(f.read())

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in re.findall(_LEXER, _clean(text).lower()):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


def tokenize(
    texts: Union[str, Sequence[str]],
    tokenizer: SimpleTokenizer,
    context_length: int = 77,
    truncate: bool = False,
) -> np.ndarray:
    """Texts -> [B, context_length] int32 (SOT ... EOT, zero padded)."""
    if isinstance(texts, str):
        texts = [texts]
    sot, eot = tokenizer.encoder[SOT], tokenizer.encoder[EOT]
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [sot] + tokenizer.encode(text) + [eot]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length {context_length}"
                )
            ids = ids[:context_length]
            ids[-1] = eot
        out[i, : len(ids)] = ids
    return out
