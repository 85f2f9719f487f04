"""Pure-Python core: tokenizer, trie, constraint machine, decoder,
linearization, extraction. No SparkSession needed."""

import random

import pytest

from genie_spark.constraints import (
    OB,
    DecodeState,
    TagCodes,
    allowed_for_prefix,
)
from genie_spark.decode import (
    INVALID_LOG_PROB,
    DeterministicScorer,
    generate_for_text,
    top_valid_prediction,
)
from genie_spark.extract import html_to_text, split_sentences
from genie_spark.tokenizer import BOS, EOS, WordTokenizer
from genie_spark.trie import FlatTrie, Trie, trie_from_names
from genie_spark.triples import format_linearization, parse_linearization
from genie_spark import synth

NAMES = ["Alice Smith", "Alice Stone", "Bob", "Zurich", "J. R. Tolkien"]
RELS = ["birthplace", "capital of", "founded by"]


@pytest.fixture(scope="module")
def tok():
    return WordTokenizer(NAMES + RELS)


def test_tokenizer_tag_contract(tok):
    # tags encode to exactly (<, tag, >) with shared </> ids — the invariant
    # the reference asserts (ie_prefix_constraints.py:123-125)
    codes = [tok.encode(f" <{t}>")[1:-1] for t in ("sub", "rel", "obj", "et")]
    assert all(len(c) == 3 for c in codes)
    assert len({c[0] for c in codes}) == 1
    assert len({c[2] for c in codes}) == 1
    assert len({c[1] for c in codes}) == 4


def test_tokenizer_roundtrip(tok):
    ids = tok.encode("Alice Smith birthplace Zurich")
    assert ids[0] == BOS and ids[-1] == EOS
    assert tok.decode(ids) == "Alice Smith birthplace Zurich"
    # tag re-joining
    lin = " <sub> Bob <rel> birthplace <obj> Zurich <et>"
    assert tok.decode(tok.encode(lin)) == lin.strip()


def test_tokenizer_determinism():
    a = WordTokenizer(NAMES)
    b = WordTokenizer(reversed(NAMES))
    assert a.piece2id == b.piece2id


def test_trie_get_semantics(tok):
    seqs = [tok.encode(n)[1:] for n in sorted(NAMES)]
    t = Trie(seqs)
    alice = tok.piece2id["Alice"]
    smith = tok.piece2id["Smith"]
    assert set(t.get([alice])) == {smith, tok.piece2id["Stone"]}
    assert t.get([tok.piece2id["Bob"]]) == [EOS]  # complete name → EOS
    assert t.get([smith]) == []  # not a valid start
    assert alice in t.get([])


def test_flat_trie_matches_nested(tok):
    seqs = [tok.encode(n)[1:] for n in sorted(NAMES + RELS)]
    nested, flat = Trie(seqs), FlatTrie.from_sequences(seqs)
    rng = random.Random(7)
    vocab = list(tok.id2piece)
    for seq in seqs:
        for k in range(len(seq) + 1):
            assert sorted(nested.get(seq[:k])) == sorted(flat.get(seq[:k]))
    for _ in range(200):
        prefix = [rng.choice(vocab) for _ in range(rng.randrange(4))]
        assert sorted(nested.get(prefix)) == sorted(flat.get(prefix))


def test_flat_trie_cursor(tok):
    flat = trie_from_names(NAMES, tok)
    node = flat.start()
    for piece in ["J.", "R.", "Tolkien"]:
        node = flat.step(node, tok.piece2id[piece])
        assert node is not None
    assert flat.allowed(node) == [EOS]
    assert flat.step(node, 999999) is None


def _random_walk(tok, ent, rel, rng, max_len=60):
    """Follow the incremental state with random allowed choices, checking it
    against the rescan oracle at every step."""
    codes = TagCodes(tok)
    st = DecodeState(codes, ent, rel)
    toks = []
    for _ in range(max_len):
        inc = sorted(st.allowed())
        ora = sorted(allowed_for_prefix(toks, codes, ent, rel))
        assert inc == ora, f"divergence at {toks}: {inc} vs {ora}"
        if not inc:
            break
        t = rng.choice(inc)
        st.push(t)
        toks.append(t)
    return toks, st


def test_constraint_state_matches_rescan_oracle(tok):
    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    rng = random.Random(123)
    for _ in range(50):
        _random_walk(tok, ent, rel, rng)


def test_constraint_outputs_parse(tok):
    # any constraint-respecting walk that terminates yields a valid
    # linearization over catalog names only
    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    rng = random.Random(5)
    done = 0
    for _ in range(80):
        toks, st = _random_walk(tok, ent, rel, rng, max_len=200)
        if not st.finished:
            continue
        done += 1
        for s, r, o in parse_linearization(tok.decode(toks)):
            assert s in NAMES and o in NAMES and r in RELS
    assert done > 10


def test_triples_parse_format_roundtrip():
    triples = [("Alice Smith", "birthplace", "Zurich"), ("Bob", "capital of", "Bob")]
    lin = format_linearization(triples)
    assert lin == (
        " <sub> Alice Smith <rel> birthplace <obj> Zurich <et>"
        " <sub> Bob <rel> capital of <obj> Bob <et>"
    )
    assert parse_linearization(lin) == triples


def test_triples_parse_malformed_and_dupes():
    # trailing partial chunk dropped (len % 3 != 0)
    assert parse_linearization(" <sub> A <rel> r <obj> B <et> <sub> C") == [("A", "r", "B")]
    # duplicates dropped with order preserved
    lin = format_linearization([("A", "r", "B"), ("A", "r", "B"), ("C", "r", "D")])
    assert parse_linearization(lin) == [("A", "r", "B"), ("C", "r", "D")]
    assert parse_linearization("") == []
    assert parse_linearization("no tags at all") == []


def test_decoder_emits_fact_from_text(tok):
    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    scorer = DeterministicScorer(tok)
    beams = generate_for_text(
        "Alice Smith birthplace Zurich.",
        scorer, tok, TagCodes(tok), ent, rel, num_beams=2,
    )
    assert beams and beams[0]["log_prob"] > INVALID_LOG_PROB
    pred = top_valid_prediction(beams)
    triples = parse_linearization(pred)
    assert ("Alice Smith", "birthplace", "Zurich") in triples


def test_decoder_deterministic(tok):
    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    scorer = DeterministicScorer(tok)
    text = "Bob founded by Alice Stone. Alice Stone birthplace Zurich."
    a = generate_for_text(text, scorer, tok, TagCodes(tok), ent, rel)
    b = generate_for_text(text, scorer, tok, TagCodes(tok), ent, rel)
    assert a == b


def test_html_to_text_roundtrip():
    text = "Alice  Smith birthplace Zurich.\nThe weather was mild & <odd>."
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    html = "<html><body>" + "".join(f"<p>{p}</p>" for p in esc.split("\n")) + "</body></html>"
    assert html_to_text(html) == text


def test_split_sentences_semantics():
    text = "One sentence. Two  spaced here.\n\nNext para no dot"
    units = split_sentences(text)
    assert units == ["One sentence. ", "Two spaced here. ", "Next para no dot "]
    # dot inside a name: split happens after any dot+space (web-path rule)
    assert split_sentences("J. R. Tolkien wrote.") == ["J. ", "R. ", "Tolkien wrote. "]


def test_synth_pages_deterministic_and_extractable():
    rows = synth.pages_local(30)
    rows2 = synth.pages_local(30)
    assert rows == rows2
    for r in rows:
        assert html_to_text(r["html"].decode("utf-8")) == r["text"]
        assert r["url"].startswith("https://example.org/page/")
    langs = {r["lang"] for r in rows}
    assert "en" in langs
    # zipf head entity appears as subject substantially more than uniform
    head = synth.unique_entity_names(synth.make_entities())[0]
    all_facts = [f for r in synth.pages_local(300) for f in r["gold"]]
    frac = sum(1 for f in all_facts if f["s"] == head) / len(all_facts)
    assert frac > 0.1


def test_catalog_dup_names_present():
    ents = synth.make_entities()
    names = [e["name"] for e in ents]
    assert len(names) != len(set(names))  # J6 dedup has work to do
    uniq = synth.unique_entity_names(ents)
    assert len(uniq) == len(set(uniq))


def test_incremental_pointer_matches_fold(tok):
    """The per-beam alignment cursor (advance) must equal the full-prefix
    fold (_pointer) on every prefix of a decoded sequence."""
    ents = ["Alice Smith", "Zurich", "Bob"]
    rels = ["birthplace"]
    t = WordTokenizer(ents + rels)
    codes = TagCodes(t)
    ent_t, rel_t = trie_from_names(ents, t), trie_from_names(rels, t)
    sc = DeterministicScorer(t)
    text = "Alice Smith was born in Zurich. Bob knows Alice Smith."
    ctx = sc.context(text)
    seq = t.encode(
        " <sub> Alice Smith <rel> birthplace <obj> Zurich <et>"
    )
    ptr = 0
    for i, tok_id in enumerate(seq):
        assert ptr == sc._pointer(ctx, seq[:i])
        ptr = sc.advance(ctx, ptr, tok_id)
    assert ptr == sc._pointer(ctx, seq)


def test_constraint_state_matches_rescan_oracle_bos(tok):
    """With bos_as_first_token_generated on, the incremental state must
    match the rescan oracle at every step, and BOS must be the only first
    token (ie_prefix_constraints.py:183-184)."""
    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    codes = TagCodes(tok)
    rng = random.Random(321)
    for _ in range(25):
        st = DecodeState(codes, ent, rel, bos_first=True)
        toks = []
        for _ in range(60):
            inc = sorted(st.allowed())
            ora = sorted(allowed_for_prefix(toks, codes, ent, rel, bos_first=True))
            assert inc == ora, f"divergence at {toks}: {inc} vs {ora}"
            if not inc:
                break
            t = rng.choice(inc)
            st.push(t)
            toks.append(t)
        assert toks[0] == tok.bos_token_id


def test_decoder_bos_first_emits_bos_then_grammar(tok):
    from genie_spark.decode import beam_search

    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    scorer = DeterministicScorer(tok)
    text = "Alice Smith birthplace Zurich."
    ctx = scorer.context(text)
    beams = beam_search(ctx, scorer, TagCodes(tok), ent, rel, bos_first=True)
    assert beams
    for b in beams:
        assert b.tokens[0] == tok.bos_token_id
    # BOS is a special token: invisible in the decoded text, so the
    # prediction still parses as a plain linearization
    pred = top_valid_prediction(
        [{"text": tok.decode(b.tokens), "log_prob": b.log_prob} for b in beams]
    )
    assert ("Alice Smith", "birthplace", "Zurich") in parse_linearization(pred)


def test_num_return_sequences_trims_not_narrows(tok):
    """num_return_sequences < num_beams (reference demo: 10 beams, 2
    returned) must keep the FULL search width and trim only the returned
    list — the returned beams are exactly the prefix of the full-width
    result, and default (None) returns all num_beams."""
    from genie_spark.decode import beam_search

    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    scorer = DeterministicScorer(tok)
    text = "Bob founded by Alice Stone. Alice Stone birthplace Zurich."
    ctx = scorer.context(text)
    codes = TagCodes(tok)
    full = beam_search(ctx, scorer, codes, ent, rel, num_beams=6)
    two = beam_search(
        ctx, scorer, codes, ent, rel, num_beams=6, num_return_sequences=2
    )
    assert len(two) == 2
    assert [(b.tokens, b.log_prob) for b in two] == [
        (b.tokens, b.log_prob) for b in full[:2]
    ]
    # trimming is NOT the same as searching narrow: a width-2 search may
    # find different beams than width-6-return-2 (and must match its own
    # full output instead)
    narrow = beam_search(ctx, scorer, codes, ent, rel, num_beams=2)
    assert len(narrow) <= 2
    explicit = beam_search(
        ctx, scorer, codes, ent, rel, num_beams=6, num_return_sequences=6
    )
    assert [(b.tokens, b.log_prob) for b in explicit] == [
        (b.tokens, b.log_prob) for b in full
    ]


def test_decoder_length_penalty_normalizes_scores(tok):
    """length_penalty=1.0 (reference default.yaml:9): every finished
    beam's log_prob is cumulative_score / len(tokens), beams are returned
    normalized-desc, and the default lp=0 output is unchanged."""
    from genie_spark.decode import beam_search

    ent = trie_from_names(NAMES, tok)
    rel = trie_from_names(RELS, tok)
    scorer = DeterministicScorer(tok)
    text = "Bob founded by Alice Stone. Alice Stone birthplace Zurich."
    ctx = scorer.context(text)
    raw = beam_search(ctx, scorer, TagCodes(tok), ent, rel, num_beams=3)
    norm = beam_search(
        ctx, scorer, TagCodes(tok), ent, rel, num_beams=3, length_penalty=1.0
    )
    assert norm
    for b in norm:
        if b.log_prob > INVALID_LOG_PROB:
            assert b.log_prob == pytest.approx(b.score / len(b.tokens))
    lps = [b.log_prob for b in norm]
    assert lps == sorted(lps, reverse=True)
    for b in raw:
        if b.log_prob > INVALID_LOG_PROB:
            assert b.log_prob == b.score  # default path untouched


def test_flat_trie_save_load_roundtrip(tok, tmp_path):
    flat = trie_from_names(NAMES, tok)
    path = str(tmp_path / "ent_trie")
    flat.save(path, names=sorted(NAMES))
    back = FlatTrie.load(path)
    assert FlatTrie.load_names(path) == sorted(NAMES)
    rng = random.Random(5)
    vocab = list(tok.id2piece)
    for name in NAMES:
        seq = tok.encode(name)[1:]
        for k in range(len(seq) + 1):
            assert back.get(seq[:k]) == flat.get(seq[:k])
    for _ in range(100):
        prefix = [rng.choice(vocab) for _ in range(rng.randrange(4))]
        assert back.get(prefix) == flat.get(prefix)
