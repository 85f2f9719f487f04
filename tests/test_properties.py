"""Property-based tests (hypothesis) for the pure-Python core invariants.

These complement the example-based suites: the linearization grammar, trie
allowed-set contract, constraint state machine, and hash-family bounds
must hold for ALL inputs in their domain, not just the fixtures.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from genie_spark.constraints import DecodeState, TagCodes, allowed_for_prefix
from genie_spark.datapipe.hashes import MINHASH_M31, minhash_params
from genie_spark.tokenizer import WordTokenizer
from genie_spark.trie import FlatTrie, Trie, trie_from_names
from genie_spark.triples import format_linearization, parse_linearization

# field alphabet: words that can never collide with tag markup
_word = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
_field = st.builds(" ".join, st.lists(_word, min_size=1, max_size=3))
_triple = st.tuples(_field, _field, _field)


@settings(max_examples=80, deadline=None)
@given(st.lists(_triple, min_size=0, max_size=6))
def test_linearization_roundtrip_property(triples):
    """parse(format(T)) == first-seen-dedup(T) for every triple list."""
    text = format_linearization(triples)
    seen, want = set(), []
    for t in triples:
        tt = tuple(x.strip() for x in t)
        if tt not in seen:
            seen.add(tt)
            want.append(tt)
    assert parse_linearization(text) == want


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_trie_allowed_matches_naive_filter(data):
    """FlatTrie.get(prefix) must equal the brute-force 'next tokens of all
    names extending prefix' — for arbitrary catalogs and prefixes."""
    names = data.draw(st.lists(_field, min_size=1, max_size=8, unique=True))
    tok = WordTokenizer(names)
    trie = trie_from_names(names, tok)
    # trie paths = name pieces + trailing EOS (encode drops the leading BOS)
    seqs = [tok.encode(n)[1:] for n in sorted(set(names))]
    pick = data.draw(st.sampled_from(seqs))
    cut = data.draw(st.integers(min_value=0, max_value=len(pick)))
    prefix = pick[:cut]
    naive = sorted({s[cut] for s in seqs if len(s) > cut and s[:cut] == prefix})
    assert sorted(trie.get(prefix)) == naive


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=64), st.integers(min_value=0, max_value=2**60 - 1))
def test_minhash_perm_bounds_and_determinism(num_hashes, h):
    """Every permuted value stays in [0, 2^62) (signed-64-safe) and the
    parameter family is deterministic across calls."""
    params = minhash_params(num_hashes)
    assert params == minhash_params(num_hashes)
    hi, lo = h >> 30, h & ((1 << 30) - 1)
    for a, b, c in params:
        v = ((a * hi + c) % MINHASH_M31) * (1 << 31) + ((b * lo + c) % MINHASH_M31)
        assert 0 <= v < 1 << 62


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**60 - 1),
    st.integers(min_value=0, max_value=10_000),
)
def test_affine_mix_bounds_and_twin(h, salt):
    """The bootstrap draw remix must stay inside signed-64 for every
    reachable (hash, salt), match the documented closed form (the
    DuckDB-SQL twin), and depend on the salt (distinct runs → distinct
    draw streams, overwhelmingly)."""
    from genie_spark.datapipe.hashes import (
        _LO_MASK,
        _MIX_A,
        _MIX_B,
        _MIX_C,
        MINHASH_M31,
    )

    def mix(h, r):
        a = (_MIX_A * (2 * r + 1)) % MINHASH_M31 + 1
        b = (_MIX_B * (2 * r + 1)) % MINHASH_M31 + 1
        return ((a * (h >> 30) + _MIX_C) % MINHASH_M31) * (1 << 31) + (
            (b * (h & _LO_MASK) + _MIX_C) % MINHASH_M31
        )

    v = mix(h, salt)
    assert 0 <= v < 1 << 62
    # intermediate products stay inside signed 64 (ANSI-mode safety):
    a = (_MIX_A * (2 * salt + 1)) % MINHASH_M31 + 1
    assert _MIX_A * (2 * salt + 1) < 1 << 63
    assert a * (h >> 30) + _MIX_C < 1 << 63
    assert mix(h, salt) == v  # deterministic
    if h != 0:
        assert mix(h, salt) != mix(h, salt + 1) or mix(h, salt) != mix(
            h, salt + 2
        ), "salt has no effect"


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_constraint_state_always_parses(data):
    """Any random walk through the constrained automaton that reaches EOS
    yields a string the parser accepts with zero dropped parts — the
    masking grammar IS the linearization grammar."""
    names = data.draw(st.lists(_field, min_size=1, max_size=5, unique=True))
    rels = data.draw(st.lists(_field, min_size=1, max_size=3, unique=True))
    tok = WordTokenizer(names + rels)
    codes = TagCodes(tok)
    ent_t = trie_from_names(names, tok)
    rel_t = trie_from_names(rels, tok)
    state = DecodeState(codes, ent_t, rel_t)
    tokens = []
    for _ in range(120):
        allowed = state.allowed()
        if not allowed:
            break
        choice = data.draw(st.sampled_from(sorted(allowed)))
        state.push(choice)
        tokens.append(choice)
        if state.finished:
            break
    if state.finished:
        text = tok.decode(tokens)
        parsed = parse_linearization(text, dedup=False)
        n_parts = len([p for p in re.split(r"<sub>|<rel>|<obj>|<et>", text) if p.strip()])
        assert n_parts % 3 == 0, f"partial triple leaked through masking: {text!r}"
        assert all(s in names and r in rels and o in names for s, r, o in parsed)
