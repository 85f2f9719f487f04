"""Deterministic word-level tokenizer standing in for the BART tokenizer.

The reference encodes every catalog name and every tag with a pretrained
BPE tokenizer (reference: genie/constrained_generation/trie.py:20-36). This
sandbox has no ``transformers``, so the engine is built around a *pluggable*
tokenizer protocol; this module provides a deterministic word-level
implementation with the same structural contract the constrained decoder
relies on (reference: genie/constrained_generation/ie_prefix_constraints.py:94-131):

* ``encode(text)`` returns ``[bos] + piece_ids + [eos]`` (BART-style).
* A tag like ``" <sub>"`` encodes to exactly 3 pieces ``(<, sub, >)``;
  ``<`` / ``>`` ids are shared across all four tags.
* ``decode`` inverts encode up to whitespace normalization and re-joins
  ``< tag >`` sequences to ``<tag>`` so linearization parsing works.

The vocabulary is built deterministically from the catalog names (sorted),
so every executor that builds it from the same broadcast catalog gets the
same ids — a hard requirement for parallelism-invariant output.
"""

from __future__ import annotations

import re
from typing import Iterable, List

_PIECE_RE = re.compile(r"<|>|[^\s<>]+")

PAD, BOS, EOS, UNK = 0, 1, 2, 3
_SPECIALS = ["<pad>", "<s>", "</s>", "<unk>"]
TAG_WORDS = ("sub", "rel", "obj", "et")


def pieces(text: str) -> List[str]:
    """Split text into pieces: '<', '>', or maximal runs of other non-space."""
    return _PIECE_RE.findall(text)


class WordTokenizer:
    """Deterministic closed-vocabulary word tokenizer."""

    def __init__(self, corpus_names: Iterable[str]):
        vocab: dict[str, int] = {}
        # fixed structural pieces first so their ids never depend on corpus
        for w in ["<", ">", *TAG_WORDS]:
            vocab[w] = len(vocab) + len(_SPECIALS)
        words = set()
        for name in corpus_names:
            words.update(p for p in pieces(name) if p not in vocab)
        for w in sorted(words):
            vocab[w] = len(vocab) + len(_SPECIALS)
        self.piece2id = vocab
        self.id2piece = {i: p for p, i in vocab.items()}
        for sid, tok in enumerate(_SPECIALS):
            self.id2piece[sid] = tok
        self.bos_token_id = BOS
        self.eos_token_id = EOS
        self.pad_token_id = PAD
        self.unk_token_id = UNK

    def __len__(self) -> int:
        return len(self.piece2id) + len(_SPECIALS)

    def encode(self, text: str) -> List[int]:
        ids = [self.piece2id.get(p, UNK) for p in pieces(text)]
        return [BOS] + ids + [EOS]

    def encode_pieces(self, text: str) -> List[int]:
        """Encode without BOS/EOS framing (name-body encoding)."""
        return [self.piece2id.get(p, UNK) for p in pieces(text)]

    _TAG_JOIN_RE = re.compile(r"< (sub|rel|obj|et) >")

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            if skip_special_tokens and i < len(_SPECIALS):
                continue
            out.append(self.id2piece.get(i, "<unk>"))
        text = " ".join(out)
        return self._TAG_JOIN_RE.sub(r"<\1>", text)
