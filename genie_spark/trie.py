"""Prefix tries over token-id sequences, built from the name catalog.

Same *contract* as the reference trie (reference:
genie/constrained_generation/trie.py:44-63): ``get(prefix)`` returns the
list of allowed next token ids, empty when the prefix is not in the trie.
Two implementations:

* :class:`Trie` — nested-dict, cheap to build, used for small catalogs and
  as the construction intermediate.
* :class:`FlatTrie` — CSR-style flat arrays (one int32 numpy array each for
  child token ids, child node offsets). At the reference's large-schema
  scale (~6M entity names, README.md:33) a nested dict of Python objects
  costs several GB and pickles slowly; the flat form is a fraction of the
  footprint, broadcasts as two numpy buffers, and is shared zero-copy by
  all tasks in a reused Python worker.

Both expose a *cursor* API (``ROOT``/``step``/``allowed``) so the decoder
can keep an O(1) incremental position per beam instead of re-walking the
prefix every step (the reference re-walks: trie.py:56-63 called per step
from ie_prefix_constraints.py:224-233 — O(len²) per sequence; see
SURVEY.md §4.3).

Build determinism: names are sorted before insertion, mirroring
reference trie.py:36, so identical catalogs yield identical tries on every
executor.
"""

from __future__ import annotations

from bisect import bisect_left
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np


class Trie:
    """Nested-dict token trie. Leaf paths end with the EOS id (the builder
    appends it), which is what triggers the decoder's EOS→'<' swap."""

    __slots__ = ("root",)

    def __init__(self, sequences: Iterable[Sequence[int]] = ()):
        self.root: Dict[int, dict] = {}
        for seq in sequences:
            self.add(seq)

    def add(self, seq: Sequence[int]) -> None:
        node = self.root
        for tok in seq:
            node = node.setdefault(tok, {})

    def get(self, prefix: Sequence[int]) -> List[int]:
        node = self.root
        for tok in prefix:
            nxt = node.get(tok)
            if nxt is None:
                return []
            node = nxt
        return list(node.keys())

    # -- cursor API --
    ROOT = None  # sentinel resolved in start()

    def start(self):
        return self.root

    def step(self, node, tok: int):
        return node.get(tok) if node is not None else None

    def allowed(self, node) -> List[int]:
        return list(node.keys()) if node is not None else []


class FlatTrie:
    """CSR-encoded immutable trie.

    Node i owns children tokens ``tokens[offsets[i]:offsets[i+1]]`` (sorted,
    enabling binary search) with child node ids in the parallel ``childs``
    slice. Node 0 is the root.
    """

    __slots__ = ("offsets", "tokens", "childs")

    def __init__(self, offsets: np.ndarray, tokens: np.ndarray, childs: np.ndarray):
        self.offsets = offsets
        self.tokens = tokens
        self.childs = childs

    @classmethod
    def from_trie(cls, trie: Trie) -> "FlatTrie":
        # BFS so child ids are contiguous per node
        nodes: List[Dict[int, dict]] = [trie.root]
        offsets = [0]
        tokens: List[int] = []
        childs: List[int] = []
        i = 0
        while i < len(nodes):
            node = nodes[i]
            for tok in sorted(node.keys()):
                tokens.append(tok)
                childs.append(len(nodes))
                nodes.append(node[tok])
            offsets.append(len(tokens))
            i += 1
        return cls(
            np.asarray(offsets, dtype=np.int64),
            np.asarray(tokens, dtype=np.int32),
            np.asarray(childs, dtype=np.int32),
        )

    @classmethod
    def from_sequences(cls, sequences: Iterable[Sequence[int]]) -> "FlatTrie":
        return cls.from_trie(Trie(sequences))

    def get(self, prefix: Sequence[int]) -> List[int]:
        node = 0
        for tok in prefix:
            node = self._child(node, tok)
            if node < 0:
                return []
        lo, hi = self.offsets[node], self.offsets[node + 1]
        return self.tokens[lo:hi].tolist()

    def _child(self, node: int, tok: int) -> int:
        lo, hi = int(self.offsets[node]), int(self.offsets[node + 1])
        j = bisect_left(self.tokens, tok, lo, hi)
        if j < hi and self.tokens[j] == tok:
            return int(self.childs[j])
        return -1

    # -- cursor API --
    def start(self) -> int:
        return 0

    def step(self, node: Optional[int], tok: int) -> Optional[int]:
        if node is None:
            return None
        nxt = self._child(node, tok)
        return None if nxt < 0 else nxt

    def allowed(self, node: Optional[int]) -> List[int]:
        if node is None:
            return []
        lo, hi = self.offsets[node], self.offsets[node + 1]
        return self.tokens[lo:hi].tolist()

    def nbytes(self) -> int:
        return self.offsets.nbytes + self.tokens.nbytes + self.childs.nbytes

    # -- disk artifact (S10; reference trie.py:65-77 pickles the nested
    # trie + a companion *_original_strings.jsonl; the CSR form saves as
    # one compressed .npz of the three arrays instead) --

    def save(self, path: str, names: Optional[Iterable[str]] = None) -> str:
        """Persist to ``<path>.npz`` (+ ``<path>_original_strings.jsonl``
        when ``names`` are given) so the trie builds once per catalog, not
        once per run. Returns the npz path."""
        import json

        npz = path if path.endswith(".npz") else path + ".npz"
        with open(npz, "wb") as f:
            np.savez_compressed(
                f, offsets=self.offsets, tokens=self.tokens, childs=self.childs
            )
        if names is not None:
            base = npz[: -len(".npz")]
            with open(base + "_original_strings.jsonl", "w", encoding="utf-8") as f:
                for n in names:
                    f.write(json.dumps(n) + "\n")
        return npz

    @classmethod
    def load(cls, path: str) -> "FlatTrie":
        npz = path if path.endswith(".npz") else path + ".npz"
        data = np.load(npz)
        return cls(data["offsets"], data["tokens"], data["childs"])

    @staticmethod
    def load_names(path: str) -> List[str]:
        """Companion original-strings list for a saved trie."""
        import json

        base = (path if path.endswith(".npz") else path + ".npz")[: -len(".npz")]
        with open(base + "_original_strings.jsonl", encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]


def trie_from_names(names: Iterable[str], tokenizer) -> FlatTrie:
    """Build the broadcast trie from catalog surface forms.

    Mirrors the reference recipe (trie.py:25-36): each name is encoded with
    a leading space and the leading BOS stripped — with our word tokenizer
    that is ``encode(name)[1:]`` = name pieces + EOS. Keeping the trailing
    EOS on every path is load-bearing: the decoder swaps EOS→'<' to close a
    name (ie_prefix_constraints.py:229-231).
    """
    seqs = [tokenizer.encode(name)[1:] for name in sorted(set(names))]
    return FlatTrie.from_sequences(seqs)
