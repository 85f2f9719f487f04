"""Tokenizer adapter: build the constrained-decode stack over a REAL
(BPE) tokenizer's id space.

The decode stack (TagCodes grammar ids, name tries, beam search) is built
against the tokenizer protocol WordTokenizer implements. The production
path scores with a HuggingFace encoder-decoder whose BPE tokenizer has a
different id space; this adapter makes any HF-style tokenizer satisfy the
same protocol, with the exact id-derivation contract of the reference:

* Tag ids come from encoding ``" <sub>"`` / ``" <rel>"`` / ``" <obj>"`` /
  ``" <et>"`` and asserting all four encode to the same length with
  shared start-of-tag and end-of-tag ids, the tag's content id sitting
  between them (reference:
  genie/constrained_generation/ie_prefix_constraints.py:94-131 —
  ``full_codes``/``codes`` construction and the three ``np.all``
  asserts).
* Catalog names are encoded with a leading space and the leading BOS
  stripped, keeping the trailing EOS on every trie path (reference:
  genie/constrained_generation/trie.py:25-36 ``get_trie_from_strings``
  with add_leading_space=True, remove_leading_bos=True) — ``encode``
  here returns ``[bos] + pieces(" " + text) + [eos]`` so the shared
  ``trie_from_names`` recipe (``encode(name)[1:]``) reproduces it.

The adapter is duck-typed over the HF tokenizer surface
(``__call__``/``encode`` + ``decode`` + ``bos_token_id``/``eos_token_id``
/``pad_token_id``), so it is unit-testable in this sandbox with a fake
BPE tokenizer and works unchanged with ``transformers`` tokenizers on a
real cluster.
"""

from __future__ import annotations

from typing import Iterable, List

from .tokenizer import TAG_WORDS


class TagIdContractError(AssertionError):
    """The tokenizer does not satisfy the reference's tag-encoding
    contract (ie_prefix_constraints.py:116-126 asserts)."""


class HFTokenizerAdapter:
    """Wrap an HF-style tokenizer into the decode-stack protocol."""

    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer
        self.bos_token_id = int(hf_tokenizer.bos_token_id)
        self.eos_token_id = int(hf_tokenizer.eos_token_id)
        self.pad_token_id = int(hf_tokenizer.pad_token_id)

        # reference tag-id derivation: encode " <tag>", assert the four
        # sequences agree on length / start / end, take index 2 as the
        # tag's content id (full_codes[n][2])
        full = {w: self._ids(f" <{w}>") for w in TAG_WORDS}
        lens = {len(v) for v in full.values()}
        if lens != {5}:
            raise TagIdContractError(
                f"tags must encode to [bos, <, tag, >, eos] (len 5); got "
                f"lengths { {w: len(v) for w, v in full.items()} } — this "
                "tokenizer splits the tag markup and cannot drive the "
                "3-piece tag grammar"
            )
        starts = {v[1] for v in full.values()}
        ends = {v[-2] for v in full.values()}
        if len(starts) != 1 or len(ends) != 1:
            raise TagIdContractError(
                f"start-of-tag/end-of-tag ids differ across tags: "
                f"starts={starts} ends={ends}"
            )
        lt, gt = starts.pop(), ends.pop()
        # minimal piece2id surface — exactly what TagCodes reads
        self.piece2id = {"<": lt, ">": gt}
        for w in TAG_WORDS:
            self.piece2id[w] = full[w][2]

    def _ids(self, text: str) -> List[int]:
        """HF ids WITH special-token framing ([bos, ..., eos])."""
        hf = self.hf
        if callable(hf):
            try:
                return list(hf(text)["input_ids"])
            except TypeError:
                pass
        return list(hf.encode(text))

    def encode(self, text: str) -> List[int]:
        """[bos] + ids(" " + text) + [eos] — the leading-space recipe the
        reference trie builder uses (trie.py:25-36), framed so the shared
        ``trie_from_names``/``encode(name)[1:]`` path strips BOS and keeps
        the trailing EOS on every trie path."""
        return self._ids(" " + text)

    def encode_pieces(self, text: str) -> List[int]:
        """Leading-space ids without BOS/EOS framing."""
        ids = self.encode(text)
        return ids[1:-1]

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        """HF decode, normalized to the linearization surface the parser
        expects (no leading space). strip(" ") — NOT bare strip() — per the
        twin-divergence rule: Spark's trim removes only 0x20, so a BPE
        decode emitting a leading tab/NBSP must round-trip identically on
        both the Column and Python sides."""
        return self.hf.decode(
            list(ids), skip_special_tokens=skip_special_tokens
        ).strip(" ")

    def __len__(self) -> int:
        return len(self.hf)
