"""CLIP text tokenization.

`BpeTokenizer` implements CLIP's byte-pair encoding (lowercased, basic
cleanup, word-final `</w>` marker, SOT/EOT specials) loading `vocab.json` +
`merges.txt` from disk — the standard artifacts shipped with every CLIP
checkpoint. There is no network access in this environment and no bundled
vocab, so when no files are given `HashTokenizer` provides a deterministic
word-hash fallback: adequate for synthetic benchmarks and parity tests
(which drive the text tower with explicit token ids anyway).
"""
from __future__ import annotations

import gzip
import hashlib
import html
import json
import re
from functools import lru_cache
from pathlib import Path
from typing import List

import numpy as np

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"

_WORD_RE = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
    if False  # \p classes need regex module; use ascii-ish fallback below
    else r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
    re.IGNORECASE,
)


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.lower()


@lru_cache()
def _bytes_to_unicode():
    """GPT-2 byte<->unicode table (standard construction)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BpeTokenizer:
    def __init__(self, vocab_path: str, merges_path: str, context_length: int = 77):
        self.context_length = context_length
        vocab_path, merges_path = Path(vocab_path), Path(merges_path)
        self.encoder = json.loads(vocab_path.read_text())
        opener = gzip.open if merges_path.suffix == ".gz" else open
        with opener(merges_path, "rt") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines if l and not l.startswith("#")]
        self.bpe_ranks = {m: i for i, m in enumerate(merges) if len(m) == 2}
        self.byte_encoder = _bytes_to_unicode()
        self.sot = self.encoder[SOT]
        self.eot = self.encoder[EOT]
        self._cache: dict = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> np.ndarray:
        ids = [self.sot]
        for tok in _WORD_RE.findall(_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok) if t in self.encoder)
        ids = ids[: self.context_length - 1]
        ids.append(self.eot)
        out = np.zeros(self.context_length, dtype=np.int32)
        out[: len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic fallback: each word hashes to a bucket id. SOT=vocab-2
    is at position 0, EOT=vocab-1 terminates (argmax pooling finds it, as
    EOT is the largest id — same convention as CLIP)."""

    def __init__(self, context_length: int = 77, vocab_size: int = 49408):
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.sot = vocab_size - 2
        self.eot = vocab_size - 1

    def encode(self, text: str) -> np.ndarray:
        ids = [self.sot]
        for w in _clean(text).split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
            ids.append(h % (self.vocab_size - 2))
        ids = ids[: self.context_length - 1]
        ids.append(self.eot)
        out = np.zeros(self.context_length, dtype=np.int32)
        out[: len(ids)] = ids
        return out


def default_tokenizer(context_length: int, vocab_size: int):
    """BPE if vocab files are discoverable, else the hash fallback."""
    for base in (
        Path(__file__).parent / "vocab",
        Path.home() / ".cache" / "clip",
    ):
        v, m = base / "vocab.json", base / "merges.txt"
        if v.exists() and m.exists():
            return BpeTokenizer(str(v), str(m), context_length)
    return HashTokenizer(context_length, vocab_size)
