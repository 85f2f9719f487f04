"""Constrained-decoding state machine for linearized triple generation.

Re-derivation of the reference's prefix-constraint semantics
(reference: genie/constrained_generation/ie_prefix_constraints.py:144-233),
expressed as an *incremental* per-beam state instead of an O(len²) rescan
per decoding step (the reference re-tokenizes and rescans the whole prefix
each step; see SURVEY.md §4.3 — this is the main single-node perf lever).

Semantics (identical allowed-sets to the reference):

* The output grammar is ``(<sub> ENT <rel> REL <obj> ENT <et>)* EOS``.
* ``status`` = number of completed ``<tag>`` groups mod 4 →
  0 = outside/between triples, 1 = emitting subject, 2 = relation,
  3 = object.
* After ``<`` the only allowed token is the status-appropriate tag word;
  after ``< tag`` the only allowed token is ``>``.
* Between tags, in status 1/3 the allowed set is the entity trie's
  continuations of the name emitted so far; status 2 uses the relation
  trie. A trie path that may END here exposes EOS — which is swapped for
  ``<`` so the model closes the name and opens the next tag
  (ie_prefix_constraints.py:229-231).
* In status 0 the model may start another triple (``<``) or stop (EOS).
* After EOS nothing is allowed (dead/finished beam).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from .tokenizer import EOS, TAG_WORDS

OB, S, R, O = 0, 1, 2, 3


class TagCodes:
    """Token-id bindings for the structural grammar, computed once per
    tokenizer (the reference computes these once per run:
    ie_prefix_constraints.py:94-134)."""

    __slots__ = ("lt", "gt", "tags", "tagset", "eos", "bos")

    def __init__(self, tok):
        """``tok`` is any tokenizer satisfying the decode-stack protocol:
        WordTokenizer or an hf_adapter.HFTokenizerAdapter over a real BPE
        tokenizer — piece2id must expose '<', '>' and the tag words, and
        eos/bos ids come from the tokenizer (NOT module constants, so the
        grammar follows the model's id space)."""
        self.lt = tok.piece2id["<"]
        self.gt = tok.piece2id[">"]
        # order matters: status i forces tags[i] after '<'
        # (status_next_token_name: ob→sub, s→rel, r→obj, o→et)
        self.tags = [tok.piece2id[w] for w in TAG_WORDS]
        self.tagset = frozenset(self.tags)
        self.eos = getattr(tok, "eos_token_id", EOS)
        self.bos = tok.bos_token_id


class DecodeState:
    """Incremental per-beam constraint state. O(1) amortized per token."""

    __slots__ = (
        "codes",
        "ent",
        "rel",
        "status",
        "phase",
        "cursor",
        "finished",
        "triples_done",
        "need_bos",
    )

    def __init__(
        self,
        codes: TagCodes,
        entities_trie,
        relations_trie,
        bos_first: bool = False,
    ):
        """``bos_first`` mirrors the reference's
        ``bos_as_first_token_generated`` (ie_prefix_constraints.py:183-184):
        a model trained with ``[eos bos ... eos]`` targets must emit BOS as
        its first generated token before the triple grammar starts."""
        self.codes = codes
        self.ent = entities_trie
        self.rel = relations_trie
        self.status = OB
        self.phase = 0  # 0 = outside tag, 1 = saw '<', 2 = saw '< tag'
        self.cursor = None  # trie cursor for the name being emitted
        self.finished = False
        self.triples_done = 0
        self.need_bos = bos_first

    def clone(self) -> "DecodeState":
        c = DecodeState.__new__(DecodeState)
        c.codes, c.ent, c.rel = self.codes, self.ent, self.rel
        c.status, c.phase, c.cursor, c.finished, c.triples_done = (
            self.status,
            self.phase,
            self.cursor,
            self.finished,
            self.triples_done,
        )
        c.need_bos = self.need_bos
        return c

    def _trie_for_status(self):
        if self.status == S or self.status == O:
            return self.ent
        if self.status == R:
            return self.rel
        return None

    def push(self, tok: int) -> None:
        c = self.codes
        if self.finished:
            return
        if self.need_bos:
            # only BOS is reachable here
            self.need_bos = False
            return
        if self.phase == 1:
            # only a tag word is reachable here
            self.phase = 2
            return
        if self.phase == 2:
            # only '>' is reachable here; a tag group just completed
            self.phase = 0
            self.status = (self.status + 1) % 4
            if self.status == OB:
                self.triples_done += 1
            t = self._trie_for_status()
            self.cursor = t.start() if t is not None else None
            return
        if tok == c.lt:
            self.phase = 1
            return
        if tok == c.eos:
            self.finished = True
            return
        # name token: advance the trie cursor
        t = self._trie_for_status()
        if t is not None:
            self.cursor = t.step(self.cursor, tok)

    def allowed(self) -> List[int]:
        c = self.codes
        if self.finished:
            return []
        if self.need_bos:
            return [c.bos]
        if self.phase == 1:
            return [c.tags[self.status]]
        if self.phase == 2:
            return [c.gt]
        if self.status == OB:
            return [c.lt, c.eos]
        t = self._trie_for_status()
        out = t.allowed(self.cursor) if t is not None else []
        if c.eos in out:
            # the name may end here: close it and open the next tag
            out = [x for x in out if x != c.eos]
            out.append(c.lt)
        return out


class FreeDecodeState:
    """Trie-less decode state for free (unconstrained) generation — the
    reference's ``free_generation=true`` path (genie_base_pl.py:92-94:
    tries are only loaded when constrained, and ``model.sample`` runs with
    no prefix-constraint fn; genie_base_hf.py:1-36 serves this baseline).

    Every non-special vocab token plus EOS is allowed at every step; the
    grammar is never ENFORCED. The tag-group status is still TRACKED (a
    sliding 3-token window counting completed ``< tag >`` groups, the
    incremental form of :func:`allowed_for_prefix`'s scan) so that
    status-aware scorers see the same positional features a trained model
    internalizes — without it, a heuristic scorer could never terminate
    sensibly in free mode.
    """

    is_free = True

    __slots__ = (
        "codes",
        "vocab",
        "status",
        "finished",
        "triples_done",
        "need_bos",
        "name_len",
        "_p2",
        "_p1",
    )

    def __init__(
        self,
        codes: TagCodes,
        vocab: Sequence[int],
        bos_first: bool = False,
    ):
        """``vocab`` is the shared allowed-id list (see
        ``decode.free_vocab_ids``); it is returned by reference from
        :meth:`allowed`, never mutated."""
        self.codes = codes
        self.vocab = vocab
        self.status = OB
        self.finished = False
        self.triples_done = 0
        self.need_bos = bos_first
        self.name_len = 0  # phase-0 content tokens in the open field
        self._p2: Optional[int] = None  # sliding window: tokens at -2, -1
        self._p1: Optional[int] = None

    def clone(self) -> "FreeDecodeState":
        c = FreeDecodeState.__new__(FreeDecodeState)
        c.codes, c.vocab = self.codes, self.vocab
        c.status, c.finished, c.triples_done = (
            self.status,
            self.finished,
            self.triples_done,
        )
        c.need_bos, c.name_len = self.need_bos, self.name_len
        c._p2, c._p1 = self._p2, self._p1
        return c

    @property
    def phase(self) -> int:
        """Derived grammar phase (same meaning as DecodeState.phase):
        1 = the last token was '<', 2 = the last two were '< tag',
        0 otherwise. Purely observational in free mode."""
        c = self.codes
        if self._p1 == c.lt:
            return 1
        if self._p2 == c.lt and self._p1 in c.tagset:
            return 2
        return 0

    def push(self, tok: int) -> None:
        c = self.codes
        if self.finished:
            return
        if self.need_bos:
            self.need_bos = False
            return
        if tok == c.eos:
            self.finished = True
            return
        if self._p2 == c.lt and self._p1 in c.tagset and tok == c.gt:
            # a '< tag >' group completed (matches the full-scan count:
            # groups can never overlap because each starts with '<')
            self.status = (self.status + 1) % 4
            if self.status == OB:
                self.triples_done += 1
            self.name_len = 0
        elif self.status != OB and tok != c.lt and self.phase == 0:
            self.name_len += 1
        self._p2, self._p1 = self._p1, tok

    def allowed(self) -> List[int]:
        if self.finished:
            return []
        if self.need_bos:
            return [self.codes.bos]
        return self.vocab  # shared list, by contract never mutated


def allowed_for_prefix(
    prefix: Sequence[int],
    codes: TagCodes,
    entities_trie,
    relations_trie,
    bos_first: bool = False,
) -> List[int]:
    """Non-incremental oracle: recompute the allowed set by rescanning the
    whole prefix, mirroring the reference's per-step recomputation
    (ie_prefix_constraints.py:171-233, incl. the forced-BOS branch at
    :183-184). Used in tests to cross-check :class:`DecodeState`; never on
    the hot path."""
    sent = list(prefix)
    if bos_first and not sent:
        return [codes.bos]
    if sent and sent[-1] == codes.eos:
        return []
    # status = completed-tag count mod 4
    status = 0
    last_tag_end: Optional[int] = None
    for i in range(len(sent) - 2):
        if sent[i] == codes.lt and sent[i + 1] in codes.tagset and sent[i + 2] == codes.gt:
            status += 1
            last_tag_end = i + 2
    status %= 4
    if sent and sent[-1] == codes.lt:
        return [codes.tags[status]]
    if len(sent) > 1 and sent[-2] == codes.lt:
        return [codes.gt] if sent[-1] in codes.tagset else []
    if status == OB:
        return [codes.lt, codes.eos]
    trie = entities_trie if status in (S, O) else relations_trie
    name_prefix = sent[last_tag_end + 1 :] if last_tag_end is not None else sent
    out = list(trie.get(name_prefix))
    if codes.eos in out:
        out.remove(codes.eos)
        out.append(codes.lt)
    return out
