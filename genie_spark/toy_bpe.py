"""A tiny deterministic BPE-style tokenizer + stack factory: the
executable reference for the HF-adapter contract.

``transformers`` is absent in this sandbox, so the HF production path
(pipeline.hf_stack_factory) cannot load a real checkpoint here. This
module provides the smallest tokenizer that exhibits every structural
property the adapter contract depends on — multi-piece subword splits,
the leading-space 'Ġ' marker, BART-style special ids (bos=0, pad=1,
eos=2, unk=3), tags splitting as [Ġ<, tag, >] — plus a matching
deterministic scorer and a picklable stack factory, so the FULL
adapter-id-space decode stack can run through the distributed
mapInPandas pipeline (proving the wiring the real HF checkpoint will
use), in any environment. Everything is pure Python, module-level, and
content-deterministic (no RNG), so outputs are partition-invariant.
"""

from __future__ import annotations

import re
import zlib
from typing import List


class ToyBPETokenizer:
    """Greedy 3-char chunking with a leading-space 'Ġ' marker; '<'/'>'
    always their own pieces. Satisfies the duck-typed HF tokenizer
    surface HFTokenizerAdapter wraps (__call__ → {"input_ids": ...},
    decode, bos/eos/pad ids)."""

    _SPLIT = re.compile(r" ?<| ?>| ?[^\s<>]+")

    def __init__(self, corpus):
        self.bos_token_id, self.pad_token_id = 0, 1
        self.eos_token_id, self.unk_token_id = 2, 3
        vocab: dict = {}
        seeds = [" <sub>", " <rel>", " <obj>", " <et>"]
        for name in sorted(set(corpus)):
            seeds.append(" " + name)
            seeds.append(name)
        for s in seeds:
            for p in self._pieces(s):
                if p not in vocab:
                    vocab[p] = len(vocab) + 4
        self.vocab = vocab
        self.id2piece = {i: p for p, i in vocab.items()}

    def _pieces(self, text: str) -> List[str]:
        out = []
        for m in self._SPLIT.finditer(text):
            t = m.group()
            marked = t.startswith(" ")
            w = t.lstrip(" ")
            if w in ("<", ">"):
                out.append(("Ġ" if marked else "") + w)
                continue
            for i in range(0, len(w), 3):
                out.append(("Ġ" if marked and i == 0 else "") + w[i : i + 3])
        return out

    def __call__(self, text: str):
        ids = [self.vocab.get(p, self.unk_token_id) for p in self._pieces(text)]
        return {"input_ids": [self.bos_token_id] + ids + [self.eos_token_id]}

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            if skip_special_tokens and i < 4:
                continue
            out.append(self.id2piece.get(i, "<unk>"))
        return "".join(p.replace("Ġ", " ") for p in out)

    def __len__(self) -> int:
        return len(self.vocab) + 4


class ToyBPEScorer:
    """Deterministic text-aware scorer in the BPE id space: pieces whose
    surface text occurs in the input are preferred (a crude copy bias),
    with stable crc tiebreak noise — enough signal for meaningful (and
    reproducible) extraction without any learned weights."""

    COPY_BONUS = 6.0

    def __init__(self, tokenizer: ToyBPETokenizer):
        self.tok = tokenizer

    def context(self, text: str):
        return (text, zlib.crc32(text.encode("utf-8")))

    def advance(self, ctx, ptr, token):
        return ptr

    def score(self, ctx, tokens, state, allowed, ptr=None):
        text, h = ctx
        step = len(tokens)
        id2piece = self.tok.id2piece
        out = []
        for t in allowed:
            logit = (zlib.crc32(b"%d|%d|%d" % (h, step, t)) % 1024) / 1024.0
            piece = id2piece.get(t, "")
            if piece and piece.replace("Ġ", " ").strip() in text:
                logit += self.COPY_BONUS
            out.append(logit)
        return out


def toy_bpe_stack_factory(payload: dict):
    """Picklable stack factory building the WHOLE decode stack in the toy
    tokenizer's id space through HFTokenizerAdapter — the same shape
    hf_stack_factory produces from a real checkpoint. Ship via
    ``GenieExtractor(stack_factory=toy_bpe_stack_factory)``."""
    from .constraints import TagCodes
    from .hf_adapter import HFTokenizerAdapter
    from .trie import trie_from_names

    names = payload["ent_names"] + payload["rel_names"]
    tok = HFTokenizerAdapter(ToyBPETokenizer(names))
    codes = TagCodes(tok)
    ent = trie_from_names(payload["ent_names"], tok)
    rel = trie_from_names(payload["rel_names"], tok)
    return tok, codes, ent, rel, ToyBPEScorer(tok.hf)
