"""Text analysis for corpus curation: language-ID, quality scoring, token
counting, document fingerprinting.

All row-local Column expressions (regex + higher-order functions) — the
whole module runs inside whole-stage codegen with zero shuffles and zero
Python, so it costs one scan at any corpus size and composes with
predicate pushdown (e.g. `quality_score > 0.5 AND lang_guess = 'en'`
prunes before the expensive extraction stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashes import h60

# tiny seeded stopword inventories for the n-gram/stopword language
# heuristic; deterministic and identical in the DuckDB oracle
STOPWORDS = {
    "en": ["the", "and", "of", "a", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "un", "una", "por"],
}

TOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"  # BPE-ish: word runs or single punct


def lang_scores_col(text: Column):
    """Per-language stopword hit-rate columns. The guess is the argmax
    (ties → lexicographic language order, deterministic)."""
    w = F.split(F.lower(text), "\\s+")
    n = F.greatest(F.size(w), F.lit(1))
    scores = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(x) for x in words])
        hits = F.size(F.filter(w, lambda t: F.array_contains(arr, t)))
        scores[lang] = F.round(hits / n, 6)
    return scores


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, score_en/de/fr/es, lang_guess)."""
    scores = lang_scores_col(F.col(text_col))
    cols = [F.col(id_col)] + [s.alias(f"score_{l}") for l, s in sorted(scores.items())]
    out = docs.select(*cols)
    guess = F.lit("unknown")
    best = F.lit(-1.0)
    for lang in sorted(STOPWORDS):  # later langs win only strictly
        c = F.col(f"score_{lang}")
        guess = F.when(c > best, F.lit(lang)).otherwise(guess)
        best = F.when(c > best, c).otherwise(best)
    return out.withColumn("lang_guess", F.when(best <= 0, "unknown").otherwise(guess))


def _quality_cols(t: Column) -> "dict[str, Column]":
    """The quality feature expressions, keyed by output column name —
    shared by ``quality_features`` and the single-pass ``quality_gate``."""
    n_chars = F.length(t)
    words = F.split(t, "\\s+")
    n_words = F.size(words)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    en = F.array(*[F.lit(x) for x in STOPWORDS["en"]])
    stop_ratio = F.round(
        F.size(F.filter(F.transform(words, lambda x: F.lower(x)), lambda x: F.array_contains(en, x)))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    mean_wlen = F.round(
        (F.length(F.regexp_replace(t, "\\s+", ""))) / F.greatest(n_words, F.lit(1)), 6
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    # composite: long enough, low punct noise, some stopwords, sane word
    # len. Multiplier 3.0 (not 2.5): ×2.5 of a 6dp-rounded ratio lands
    # exactly on .5 at the 7th digit, where Spark/DuckDB round-half modes
    # disagree; ×3.0 keeps every term 6dp-exact.
    score = (
        F.when(n_words >= 20, 0.25).otherwise(n_words / 80.0)
        + F.when(punct_ratio <= 0.1, 0.25).otherwise(F.greatest(F.lit(0.0), 0.25 - punct_ratio))
        + F.least(stop_ratio * F.lit(3.0), F.lit(0.25))
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.25).otherwise(0.0)
    )
    return {
        "n_chars_m": n_chars,
        "n_words": n_words,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "mean_word_len": mean_wlen,
        "quality_score": F.round(score, 6),
    }


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    features + a composite quality score in [0,1]."""
    cols = _quality_cols(F.col(text_col))
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens (word runs + punct)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.trim(t), "\\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)).alias("re_tokens"),
    )


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-style rep filters
    used to drop boilerplate/spam before LLM training): duplicate word
    n-gram fractions for n=2,3 (1 − distinct/total over the doc's own
    n-grams) and top-word dominance (most frequent word's share). All
    row-local higher-order functions — zero shuffle, codegen'd, and
    filter-composable (``dup_3gram_frac < 0.2 AND top_word_frac < 0.3``
    prunes at the scan)."""
    cols = _repetition_cols(F.col(text_col))
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )


def _repetition_cols(t: Column) -> "dict[str, Column]":
    """The repetition feature expressions, keyed by output column name —
    shared by ``repetition_features`` and the single-pass ``quality_gate``."""
    w = F.split(t, " ")
    n_words = F.size(w)

    def dup_frac(n: int) -> Column:
        grams = F.when(
            n_words >= n,
            F.transform(
                F.sequence(F.lit(1), n_words - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", w)))
        total = F.size(grams)
        return F.round(
            (total - F.size(F.array_distinct(grams)))
            / F.greatest(total, F.lit(1)).cast("double"),
            6,
        )

    # most frequent word's share: for each distinct word, count its
    # occurrences with a filter. O(distinct × n) per row but flat
    # primitive comparisons — measured FASTER (4.2s vs 6.7s at sf0.1)
    # than the asymptotically-better sorted-run fold, whose per-step
    # struct-state allocation dominates at web-document lengths.
    distinct_w = F.array_distinct(w)
    top = F.array_max(
        F.transform(distinct_w, lambda d: F.size(F.filter(w, lambda x: x == d)))
    )
    top_frac = F.round(top / F.greatest(n_words, F.lit(1)).cast("double"), 6)
    return {
        "dup_2gram_frac": dup_frac(2),
        "dup_3gram_frac": dup_frac(3),
        "top_word_frac": top_frac,
    }


# RE2-safe patterns (no lookaround/backrefs) so the Java-regex Spark path
# and the RE2 DuckDB oracle match token-for-token
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_PATTERN = "https?://[A-Za-z0-9./_-]+"


def contact_flags(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII / contact-surface flags for curation policy filters: per-doc
    email and URL match counts plus a has_contact boolean. Row-local
    regexp_extract_all — zero shuffle; the boolean composes into scan
    predicates (``NOT has_contact``) for policy-gated training sets.
    Deliberately pattern-conservative (RE2-safe, no \\S/\\w class
    divergence) so the counts are engine-exact; a production deployment
    layers jurisdiction-specific pattern packs on the same shape."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), 0))
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_PATTERN), 0))
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        ((n_emails > 0) | (n_urls > 0)).alias("has_contact"),
    )


def redact_col(t: Column) -> Column:
    """The redacted-text expression (emails → ``<EMAIL>``, URLs →
    ``<URL>``) — row-local, so it composes into streaming selects and
    in-place column rewrites without a join."""
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"), URL_PATTERN, "<URL>"
    )


def redact_contacts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction (the write-side companion of ``contact_flags``):
    replace every email with ``<EMAIL>`` and every URL with ``<URL>``.
    Emails are replaced first; the URL pattern cannot match the inserted
    ``<EMAIL>`` token and the email pattern cannot match inside a URL
    (no ``@``), so the two passes are order-exact. Row-local
    regexp_replace — zero shuffle, one scan at any corpus size."""
    t = F.col(text_col)
    clean = redact_col(t)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), 0))
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_PATTERN), 0))
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_emails.alias("n_redacted_emails"),
        n_urls.alias("n_redacted_urls"),
    )


def gate_reasons_col(
    n_words: Column,
    punct_ratio: Column,
    stopword_ratio: Column,
    top_word_frac: Column,
    dup_3gram_frac: Column,
    min_words: int = 20,
    max_words: int = 90,
    max_punct_ratio: float = 0.1,
    min_stopword_ratio: float = 0.02,
    max_top_word_frac: float = 0.2,
    max_dup_3gram_frac: float = 0.1,
) -> Column:
    """The ordered fail_reasons expression over already-computed feature
    columns (empty string = passed). Pure Column math, so it composes
    into streaming selects and scan-predicate filters."""
    checks = [
        ("too_short", n_words < min_words),
        ("too_long", n_words > max_words),
        ("high_punct", punct_ratio > max_punct_ratio),
        ("low_stopword", stopword_ratio < min_stopword_ratio),
        ("top_word", top_word_frac > max_top_word_frac),
        ("dup_3gram", dup_3gram_frac > max_dup_3gram_frac),
    ]
    return F.concat_ws(
        ";", *[F.when(cond, F.lit(name)) for name, cond in checks]
    )


def gate_passed_col(t: Column, **thresholds) -> Column:
    """Single-expression keep/drop boolean over the raw text column —
    the filter form of :func:`quality_gate` for streams and cascade
    stages that only need the verdict (row-local, join-free). Recomputes
    the feature expressions inline; use :func:`quality_gate` when the
    feature values themselves are needed."""
    cols = {**_quality_cols(t), **_repetition_cols(t)}
    return (
        gate_reasons_col(
            n_words=cols["n_words"],
            punct_ratio=cols["punct_ratio"],
            stopword_ratio=cols["stopword_ratio"],
            top_word_frac=cols["top_word_frac"],
            dup_3gram_frac=cols["dup_3gram_frac"],
            **thresholds,
        )
        == ""
    )


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 90,
    max_punct_ratio: float = 0.1,
    min_stopword_ratio: float = 0.02,
    max_top_word_frac: float = 0.2,
    max_dup_3gram_frac: float = 0.1,
) -> DataFrame:
    """Composite keep/drop gate over the quality + repetition features —
    the single-pass filter a curation pipeline actually runs (Gopher-style
    document filtering). Both feature families are row-local Column
    expressions, so the gate is ONE select over ONE scan (no join);
    ``fail_reasons`` lists the tripped checks in a fixed order so drops
    are auditable, and ``passed`` composes into scan predicates for the
    downstream extraction stage."""
    # materialize every feature once in an inner projection: each is
    # referenced 2-3 times below, and re-expanding the HOF trees per
    # reference measurably slows the scan (6.4s vs ~4s at sf0.1).
    # CollapseProject keeps multi-referenced non-trivial aliases
    # materialized, so the outer expressions are cheap column refs.
    cols = {**_quality_cols(F.col(text_col)), **_repetition_cols(F.col(text_col))}
    feat = docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )
    reasons = gate_reasons_col(
        n_words=F.col("n_words"),
        punct_ratio=F.col("punct_ratio"),
        stopword_ratio=F.col("stopword_ratio"),
        top_word_frac=F.col("top_word_frac"),
        dup_3gram_frac=F.col("dup_3gram_frac"),
        min_words=min_words,
        max_words=max_words,
        max_punct_ratio=max_punct_ratio,
        min_stopword_ratio=min_stopword_ratio,
        max_top_word_frac=max_top_word_frac,
        max_dup_3gram_frac=max_dup_3gram_frac,
    )
    return feat.select(
        F.col(id_col),
        "n_words",
        "quality_score",
        "top_word_frac",
        "dup_3gram_frac",
        reasons.alias("fail_reasons"),
        (reasons == "").alias("passed"),
    )


def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Rolling-hash document fingerprint: min/max h60 over word k-shingles
    (winnowing-lite) + full-text md5. Row-local."""
    from .dedup import shingles_col

    from .dedup import spread_for_compute

    # min and max come out of ONE evaluation of the hash array: the
    # hash transform is bound as a lambda variable (1-element array +
    # explode materializes the struct once per row) — a plain local
    # Column referenced by both array_min and array_max would be inlined
    # twice and double every shingle md5 (interpreted HOFs get no CSE)
    mm = F.explode(
        F.transform(
            F.array(F.transform(shingles_col(F.col(text_col), k), lambda s: h60(s))),
            lambda h: F.struct(
                F.array_min(h).alias("mn"), F.array_max(h).alias("mx")
            ),
        )
    )
    return spread_for_compute(docs).select(
        F.col(id_col),
        mm.alias("_m"),
        F.md5(F.col(text_col)).alias("fp_md5"),
    ).select(
        id_col,
        F.col("_m.mn").alias("fp_min"),
        F.col("_m.mx").alias("fp_max"),
        "fp_md5",
    )


def domain_quality_stats(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain corpus profile (the RefinedWeb/CCNet-style curation
    view: which hosts contribute how much text at what quality). One
    partial-aggregated groupBy on the domain — counts and token totals
    are exact integer sums; the quality MEAN is determinism-safe by
    quantizing each doc's (already 6dp-exact) score to integer ppm
    before summing, so no float accumulation order can flutter the
    result (the split_thresholds integer-ppm discipline). max is
    order-independent for doubles and stays float."""
    feats = quality_features(docs, text_col, id_col).select(
        id_col, "n_words", "quality_score"
    )
    base = docs.select(F.col(id_col), F.col(domain_col).alias("domain"))
    q_fp = F.floor(F.col("quality_score") * 1e6).cast("long")
    return (
        base.join(feats, id_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum(q_fp).cast("long").alias("_sq"),
            F.max("quality_score").alias("max_quality"),
        )
        .select(
            "domain", "n_docs", "total_words",
            F.round((F.col("_sq") / F.col("n_docs")) / 1e6, 6).alias("mean_quality"),
            "max_quality",
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    scale: int = 10**6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` most characteristic terms per document by tf×idf with a
    LINEAR inverse document frequency in integer fixed-point::

        idf_fp(t)   = (N_docs * scale) // df(t)
        score_fp    = tf(doc, t) * idf_fp(t)

    log-idf is the textbook damping but log() is not bit-identical
    across engines; linear idf preserves the per-document ranking the
    top-k consumes whenever tf patterns are comparable, and makes the
    whole operator exact-integer (the split_thresholds discipline).
    Ties rank lexicographically by term — fully deterministic. Returns
    ``(id, term, tf, score_fp, rnk)``.

    Scale shape (100 TB): tf is a partial-agg groupBy on (doc, term);
    df is a partial-agg distinct-doc count per term; the join is a
    standard shuffle join on term (the term dictionary is Zipfian but
    the per-term row count IS df — the join output equals the tf table,
    no blowup); top-k is one window partitioned by doc."""
    from pyspark.sql import Window

    # no spread here: tf is referenced by BOTH df_t and the final join,
    # so the scan+explode subtree executes twice — an added repartition
    # multiplies instead of amortizing (measured 0.6s -> 3.4s)
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(n_docs)
        .select(
            id_col, "term", "tf",
            F.expr(f"tf * ((nd * {scale}L) div df)").alias("score_fp"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_fp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "score_fp", "rnk")
    )


def lm_surprisal_bits(
    docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style reference-LM quality signal (Wenzek et al. 2020 score
    docs by the perplexity of a Wikipedia-trained LM; cf.
    cc_net/perplexity.py): per-document cross-entropy against a unigram
    LM estimated from ``ref``, in EXACT integer bits.

    log2 of a probability is engine-divergent float math, so the
    surprisal of a token is taken at integer grain::

        c'(w)  = count_ref(w) + 1        (add-one smoothing, OOV -> 1)
        T'     = total_ref_tokens + 1
        bits(w) = floor(log2(T' / c'(w))) = length(bin(T' div c'(w))) - 1

    floor(log2(x)) over the integer quotient equals floor(log2) of the
    real ratio for x >= 1, and ``bin()`` of a bigint is identical in
    Spark and DuckDB — the whole score is exact integer arithmetic.
    Returns ``(id, n_tokens, oov_tokens, sum_bits, mean_bits_ppm)``
    where mean_bits_ppm = (sum_bits * 1e6) div n_tokens.

    Scale shape (100 TB): the count table is vocabulary-sized and
    broadcast; the corpus explodes to token rows but the groupBy back to
    ``id`` partial-aggregates map-side (a document lives in one
    partition, so the shuffle carries ~one row per document). The
    reference corpus is scanned once; no corpus-vs-corpus shuffle."""
    toks = lambda df: (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
        ).filter(F.col("tok") != "")
    )
    ref_toks = toks(ref)
    cnt = ref_toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = ref_toks.agg((F.count(F.lit(1)) + 1).cast("long").alias("tprime"))
    scored = (
        toks(docs)
        .join(F.broadcast(cnt), "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.when(F.col("c").isNull(), F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("oov"),
            (F.length(F.bin(F.expr("tprime div (coalesce(c, 0L) + 1L)"))) - 1)
            .cast("long").alias("bits"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("oov").cast("long").alias("oov_tokens"),
        F.sum("bits").cast("long").alias("sum_bits"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("oov_tokens", F.lit(0)).cast("long").alias("oov_tokens"),
            F.coalesce("sum_bits", F.lit(0)).cast("long").alias("sum_bits"),
            F.expr(
                "coalesce(sum_bits, 0L) * 1000000L div greatest(coalesce(n_tokens, 0L), 1L)"
            ).cast("long").alias("mean_bits_ppm"),
        )
    )


def lm_surprisal_sql(
    table: str = "documents",
    ref_where: str = "doc_id % 13 = 0",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`lm_surprisal_bits` — same integer-bits
    formula over the same single-space split."""
    return f"""
WITH lm_toks AS (
  SELECT {id_col}, unnest(string_split(lower(text), ' ')) AS tok FROM {table}
),
lm_tf AS (SELECT {id_col}, tok FROM lm_toks WHERE tok <> ''),
lm_ref AS (SELECT tok FROM lm_tf WHERE {ref_where.replace(id_col, id_col)}),
lm_cnt AS (SELECT tok, count(*)::BIGINT AS c FROM lm_ref GROUP BY tok),
lm_tot AS (SELECT count(*)::BIGINT + 1 AS tprime FROM lm_ref),
lm_scored AS (
  SELECT t.{id_col},
         CASE WHEN c.c IS NULL THEN 1 ELSE 0 END AS oov,
         length(bin(tprime // (coalesce(c.c, 0) + 1))) - 1 AS bits
  FROM lm_tf t LEFT JOIN lm_cnt c USING (tok) CROSS JOIN lm_tot
),
lm_doc AS (
  SELECT {id_col}, count(*)::BIGINT AS n_tokens,
         sum(oov)::BIGINT AS oov_tokens, sum(bits)::BIGINT AS sum_bits
  FROM lm_scored GROUP BY {id_col}
)
SELECT d.{id_col},
       coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(s.oov_tokens, 0)::BIGINT AS oov_tokens,
       coalesce(s.sum_bits, 0)::BIGINT AS sum_bits,
       (coalesce(s.sum_bits, 0) * 1000000 // greatest(coalesce(s.n_tokens, 0), 1))::BIGINT
         AS mean_bits_ppm
FROM {table} d LEFT JOIN lm_doc s USING ({id_col})
"""


def length_deciles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """EXACT decile boundaries of the corpus word-length distribution —
    the cutoffs curation uses to pick min/max-length filters. One row
    per decile q in 1..9: ``(decile, value)`` where value is the word
    count at sorted position ceil(n*q/10) (1-based, ties broken by doc
    id — integer-exact and engine-invariant; approximate quantile
    sketches differ per engine and per partitioning, so they can't be
    the number of record).

    Scale shape (100 TB): no single-partition sort anywhere — ranks come
    from the distributed range-partition rank (metrics._distributed_rank:
    range-repartition + local rank + broadcast offset join), and the
    decile probe is a broadcast join of NINE rows against the ranked
    corpus. The ceil is integer math ((n*q + 9) div 10), same formula in
    the DuckDB twin."""
    from ..metrics import _distributed_rank

    keyed = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("v")
    )
    ranked, total = _distributed_rank(keyed, ["v", id_col], "_rk")
    pos = total.select(
        F.explode(F.expr("sequence(1, 9)")).alias("decile"), F.col("_n")
    ).select(
        F.col("decile").cast("int").alias("decile"),
        F.expr("(_n * decile + 9) div 10 - 1").alias("_pos0"),
    )
    return (
        ranked.join(F.broadcast(pos), F.col("_rk") == F.col("_pos0"))
        .select("decile", F.col("v").cast("bigint").alias("value"))
    )


def bigram_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Corpus-wide ADJACENT word-pair (bigram) counts, top ``top_n`` by
    (count desc, bigram asc — the deterministic tiebreak). This is the
    inner-loop count of tokenizer/BPE training and of n-gram LM
    estimation — positional adjacency, not the doc-level set
    co-occurrence of kg_cooccurrence. Returns ``(bigram, cnt)``.

    Scale shape (100 TB): pair generation is row-local (transform over
    the word array — no self-join); the count is ONE
    partial-aggregatable groupBy on the bigram (Zipf-head bigrams
    combine map-side); top-n is TakeOrderedAndProject, never a global
    sort."""
    w = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat(
                F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    from .dedup import spread_for_compute

    return (
        spread_for_compute(docs).select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(top_n)
    )


def collocation_lift(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: adjacent bigrams ranked by integer PMI-lift
    ``observed/expected = (c_xy / c_x) * (N / c_y)`` in ppm — the
    multiword-expression detector (Church & Hanks 1990's PMI with the
    log dropped; log is engine-divergent float, the ratio is integer
    and rank-equivalent). Computed as ``((c_xy*1e6) // c_x) * N //
    c_y``: since ``c_xy <= c_x`` the first factor is <= 1e6, so the
    product stays inside signed-64 even at 100 TB counts (a single
    ``N*c_xy*1e6`` numerator would overflow at web scale). ``min_count``
    suppresses the hapax noise PMI is notorious for. Returns top
    ``top_n`` by (lift desc, bigram asc): ``(bigram, c_xy, c_x, c_y,
    lift_ppm)``.

    Scale shape: pair generation row-local; bigram and unigram counts
    are each ONE partial-agg groupBy; the two unigram joins key on the
    Zipf-headed word column (broadcastable when the vocabulary is
    bounded); total-token count rides along as a lazy 1-row cross
    join; top-n is TakeOrderedAndProject."""
    w = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    from .dedup import spread_for_compute

    docs = spread_for_compute(docs)
    toks = docs.select(F.explode(w).alias("t"))
    uc = toks.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ntot = toks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pc = (
        docs.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    out = (
        pc.join(uc.select(F.col("t").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uc.select(F.col("t").alias("w2"), F.col("c").alias("c_y")), "w2")
        .crossJoin(ntot)
        .select(
            F.concat("w1", F.lit(" "), "w2").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            F.expr("((c_xy * 1000000L) div c_x) * n div c_y").alias("lift_ppm"),
        )
    )
    return out.orderBy(F.desc("lift_ppm"), F.asc("bigram")).limit(top_n)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """BM25 retrieval (Robertson-Sparck Jones) for a query panel, made
    integer-exact: k1 = 6/5 and b = 3/4 are kept RATIONAL and the
    per-term score is cleared of denominators::

        score_t = ridf * 44 * tf * avgdl // (20*avgdl*tf + 6*avgdl + 18*dl)

    with ``ridf = N*1e6 // df`` standing in for the log IDF (log is
    engine-divergent float; the linear inverse-df weight is the same
    monotone rarity signal — documented deviation). ``avgdl`` is the
    integer mean doc length. Returns the top ``top_k`` docs per query
    by (score desc, doc_id asc): ``(qid, doc_id, score_ppm, rank)``.
    ``ridf`` is saturated at 1e9 (terms rarer than 1-in-1000 docs score
    as equally rare) so the numerator stays inside signed-64 at any
    corpus size under ANSI mode.

    Scale shape: postings (term, doc, tf) are ONE partial-agg groupBy
    over the ONE corpus explosion; doc lengths are a second partial
    agg over the postings (never a second scan); document frequencies
    are computed only for the panel's terms (a full-vocabulary df
    broadcast would be billions of rows at web scale — the semi-join
    restriction keeps the broadcast panel-sized); the query panel is
    broadcast onto the postings so the fact side never shuffles on
    query content; per-query top-k is a qid-keyed window over only
    the matching postings."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("t"),
    )
    postings = toks.groupBy("t", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    stats = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").cast("long").alias("n_toks"))
    ).select("n_docs", F.expr("n_toks div n_docs").alias("avgdl"))
    qt = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(qtext_col)), " "),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("t"),
    )
    df_q = postings.join(
        F.broadcast(qt.select("t").distinct()), "t", "left_semi"
    ).groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        postings.join(F.broadcast(qt), "t")
        .join(dl, "doc_id")
        .join(F.broadcast(df_q), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            F.expr(
                "(least((n_docs * 1000000L) div df, 1000000000L)"
                " * 44L * tf * avgdl)"
                " div (20L * avgdl * tf + 6L * avgdl + 18L * dl)"
            ).alias("s"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("s").cast("long").alias("score_ppm"))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("qid").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    return (
        scored.select(
            "qid", "doc_id", "score_ppm", F.row_number().over(win).alias("rank")
        )
        .filter(F.col("rank") <= top_k)
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Exact 2-gram phrase search through a positional inverted index.
    ``phrases`` is a panel of space-separated two-word phrases; returns
    one row per phrase: ``(phrase, n_docs, n_occurrences)`` — documents
    containing the exact adjacent pair, and total adjacent occurrences.

    Scale shape: positional postings (doc_id, pos, token) come from ONE
    posexplode of the corpus; both sides of the adjacency self-join are
    first restricted to panel terms by a broadcast semi-join (only
    panel-term postings ever shuffle — the corpus-sized posting list is
    pruned before the exchange); adjacency is a pure equi-join on
    (doc_id, next_pos, token) so Spark can hash/sort-merge it without
    range logic; the final per-phrase aggregate is partial-aggregatable."""
    wq = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    post = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(wq).alias("pos", "t")
    )
    pp = phrases.select(
        F.col(phrase_col).alias("phrase"),
        F.split(F.lower(F.col(phrase_col)), " ").alias("pw"),
    ).select(
        "phrase",
        F.col("pw").getItem(0).alias("w1"),
        F.col("pw").getItem(1).alias("w2"),
    ).distinct()
    terms = pp.select(F.col("w1").alias("t")).union(
        pp.select(F.col("w2").alias("t"))
    ).distinct()
    post_p = post.join(F.broadcast(terms), "t", "left_semi")
    left = (
        post_p.join(F.broadcast(pp), post_p["t"] == pp["w1"])
        .select(
            "phrase", "w2", "doc_id", (F.col("pos") + 1).alias("pos2")
        )
    )
    hits = left.join(
        post_p.select(
            F.col("doc_id").alias("doc_id"),
            F.col("pos").alias("pos2"),
            F.col("t").alias("w2"),
        ),
        ["doc_id", "pos2", "w2"],
    )
    return hits.groupBy("phrase").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )


def coverage_topk(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Term-coverage ranking: docs ranked per query by how many DISTINCT
    query terms they contain (ties -> doc_id asc). The blunt recall-
    oriented counterpart to BM25 for rank fusion. Same scale shape:
    distinct (doc, term) pairs from one explosion, panel broadcast onto
    them, per-query window over matches only."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), " "),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("t"),
    )
    qt = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(qtext_col)), " "),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("t"),
    )
    hits = (
        toks.join(F.broadcast(qt), "t")
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    win = Window.partitionBy("qid").orderBy(F.desc("n_hit"), F.asc("doc_id"))
    return hits.select(
        "qid", "doc_id", "n_hit", F.row_number().over(win).alias("rank")
    ).filter(F.col("rank") <= top_k)


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    top_k: int = 5,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    lists, integer-exact: contribution = ``1e6 div (k + rank)``, absent
    from a list = 0. Inputs need (qid, doc_id, rank). Returns the fused
    top ``top_k`` per query: (qid, doc_id, rrf_ppm, rank). Row-local
    arithmetic over two already-tiny top-k tables + one qid-keyed
    window — fusion cost is panel-sized, never corpus-sized."""
    from pyspark.sql import Window

    ka = int(k)
    a = ranked_a.select(
        "qid",
        "doc_id",
        F.expr(f"1000000L div ({ka}L + rank)").alias("c_a"),
    )
    b = ranked_b.select(
        "qid",
        "doc_id",
        F.expr(f"1000000L div ({ka}L + rank)").alias("c_b"),
    )
    fused = (
        a.join(b, ["qid", "doc_id"], "full_outer")
        .select(
            "qid",
            "doc_id",
            (
                F.coalesce(F.col("c_a"), F.lit(0).cast("long"))
                + F.coalesce(F.col("c_b"), F.lit(0).cast("long"))
            ).alias("rrf_ppm"),
        )
    )
    win = Window.partitionBy("qid").orderBy(
        F.desc("rrf_ppm"), F.asc("doc_id")
    )
    return fused.select(
        "qid", "doc_id", "rrf_ppm", F.row_number().over(win).alias("rank")
    ).filter(F.col("rank") <= top_k)


def length_outliers(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
    k_sigma2: int = 4,
) -> DataFrame:
    """Per-group outlier flags on an integer metric: doc is an outlier
    when ``(x - mean)^2 > k_sigma2 * var`` with mean and variance both
    computed in INTEGER floor arithmetic (mean = sum div n, var =
    (sum(x^2) div n) - mean^2) — deterministic across engines, no float
    moments. Returns only the outliers: (group, id, value, mean, var).

    Scale shape: group moments are ONE partial-agg groupBy (3 sums);
    they broadcast back onto the fact scan (group-count-sized dim); the
    flag is a row-local predicate — at 100 TB this is one shuffle of
    group-sized aggregates, never of the fact table. The centered
    deviation (x - mean) is magnitude-bounded by the metric's own
    range, so the squared terms stay inside signed-64 regardless of
    group row counts (the naive n-scaled form n*x - sum overflows at
    ~1e9-row groups)."""
    v = F.col(value_col).cast("long")
    stats = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s1"),
        F.sum(v * v).cast("long").alias("s2"),
    ).select(
        group_col,
        F.expr("s1 div n").alias("mean"),
        F.expr("(s2 div n) - (s1 div n) * (s1 div n)").alias("var"),
    )
    return (
        docs.select(group_col, id_col, v.alias("value"))
        .join(F.broadcast(stats), group_col)
        .filter(
            F.expr(
                f"(value - mean) * (value - mean)"
                f" > {int(k_sigma2)}L * greatest(var, 1L)"
            )
        )
        .select(group_col, id_col, "value", "mean", "var")
    )


# DCG rank discounts as integer ppm constants: disc(r) = round(1e6 /
# log2(r + 1)). Computed ONCE here in Python and embedded as literals in
# BOTH the Spark plan and the DuckDB oracle, so the two engines share the
# exact same integers by construction (no cross-engine log() divergence).
NDCG_DISC_PPM = [round(1_000_000 / __import__("math").log2(r + 1))
                 for r in range(1, 11)]
# ideal-DCG prefix sums: IDCG for a query with j relevant docs (capped
# at the top-10 evaluation depth) is NDCG_IDCG_PPM[min(j, 10)]
NDCG_IDCG_PPM = [0]
for _d in NDCG_DISC_PPM:
    NDCG_IDCG_PPM.append(NDCG_IDCG_PPM[-1] + _d)
del _d


def conjunctive_matches(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Boolean conjunctive (AND) retrieval: (qid, doc_id) pairs where the
    document contains EVERY distinct query term — the classic exact-match
    ground truth used as qrels for ranking evaluation when no human
    judgments exist. Same scale shape as bm25_topk: distinct (doc, term)
    pairs come from ONE corpus explosion, the panel's terms broadcast
    onto them (the corpus never shuffles on query content), and the
    all-terms test is a panel-keyed count-distinct compared against the
    broadcast per-query term count."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), " "),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("t"),
    )
    qt = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(qtext_col)), " "),
                    lambda x: x != F.lit(""),
                )
            )
        ).alias("t"),
    )
    nq = qt.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    return (
        toks.join(F.broadcast(qt), "t")
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
        .join(F.broadcast(nq), "qid")
        .filter(F.col("n_hit") == F.col("n_terms"))
        .select("qid", "doc_id")
    )


def retrieval_quality(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    cut: int = 5,
) -> DataFrame:
    """Ranking-quality evaluation of a retrieval run against binary
    qrels, integer-exact in ppm: per query reciprocal rank of the first
    relevant hit (MRR numerator), precision@``cut``, recall@``k``, and
    nDCG@``k`` with the shared NDCG_DISC_PPM integer discount table
    (identical literals in the DuckDB twin, so no float log enters
    either engine). Inputs: ``ranking`` (qid, doc_id, rank with rank
    1-based) and ``qrels`` (qid, doc_id). Returns one row per query:
    (qid, n_rel, rr_ppm, p_at_cut_ppm, recall_ppm, ndcg_ppm).

    Scale shape: everything here is panel-sized — the ranking is
    panel × k rows and qrels is bounded by the conjunctive-match
    candidates; the single groupBy shuffles only those. The corpus-sized
    work happened upstream in the ranker/qrels generation."""
    if k > len(NDCG_DISC_PPM):
        raise ValueError(f"k <= {len(NDCG_DISC_PPM)} (discount table)")
    disc = ", ".join(f"{d}L" for d in NDCG_DISC_PPM[:k])
    idcg = ", ".join(f"{s}L" for s in NDCG_IDCG_PPM[1 : k + 1])
    nrel = qrels.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    j = ranking.filter(F.col("rank") <= k).join(
        qrels.select("qid", "doc_id", F.lit(1).cast("long").alias("rel")),
        ["qid", "doc_id"],
        "left",
    ).select(
        "qid",
        F.col("rank").cast("long").alias("rank"),
        F.coalesce(F.col("rel"), F.lit(0).cast("long")).alias("rel"),
    )
    per = j.groupBy("qid").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("fr"),
        F.sum(
            F.when(F.col("rank") <= cut, F.col("rel")).otherwise(F.lit(0))
        ).cast("long").alias(f"hits{cut}"),
        F.sum("rel").cast("long").alias("hitsk"),
        F.sum(
            F.col("rel")
            * F.expr(f"element_at(array({disc}), cast(rank as int))")
        ).cast("long").alias("dcg"),
    )
    return per.join(nrel, "qid").select(
        "qid",
        "n_rel",
        F.coalesce(
            F.expr("1000000L div fr"), F.lit(0).cast("long")
        ).alias("rr_ppm"),
        F.expr(f"(hits{cut} * 1000000L) div {int(cut)}L").alias(
            f"p_at_{cut}_ppm"
        ),
        F.expr("(hitsk * 1000000L) div n_rel").alias("recall_ppm"),
        F.expr(
            f"(dcg * 1000000L) div element_at(array({idcg}),"
            f" cast(least(n_rel, {int(k)}L) as int))"
        ).alias("ndcg_ppm"),
    )


def class_term_lift(
    docs: DataFrame,
    class_col: str,
    min_df: int = 5,
    top_k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Discriminative vocabulary per class: for each (class, term), the
    lift of the term's in-class rate over its corpus rate, integer ppm
    — ``lift = (tf_c / n_c) / (tf / n)`` computed as the shared
    two-step floor ``((tf_c * 1e6) div tf) * n div n_c`` so every
    intermediate stays inside signed-64 at any corpus size. Returns the
    ``top_k`` terms per class by (lift desc, term asc) among terms with
    corpus df >= ``min_df``: (cls, t, tf_c, tf, lift_ppm, rank).

    Scale shape: ONE corpus explosion feeds both the (class, term) and
    the term census (partial-agg groupBys); token totals are two tiny
    aggregates broadcast back; the ranking window partitions by class
    over the min-df-cut (class × vocab)-bounded census — never raw
    token rows."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(class_col).alias("cls"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("t"),
    )
    ct = toks.groupBy("cls", "t").agg(
        F.count(F.lit(1)).cast("long").alias("tf_c")
    )
    tt = ct.groupBy("t").agg(F.sum("tf_c").cast("long").alias("tf")).filter(
        F.col("tf") >= int(min_df)
    )
    nc = ct.groupBy("cls").agg(F.sum("tf_c").cast("long").alias("n_c"))
    na = tt.agg(F.sum("tf").cast("long").alias("n_all"))
    win = Window.partitionBy("cls").orderBy(
        F.desc("lift_ppm"), F.asc("t")
    )
    return (
        ct.join(tt, "t")
        .join(F.broadcast(nc), "cls")
        .crossJoin(F.broadcast(na))
        .select(
            "cls",
            "t",
            "tf_c",
            "tf",
            F.expr(
                "((tf_c * 1000000L) div tf) * n_all div n_c"
            ).alias("lift_ppm"),
        )
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= int(top_k))
    )


GATE_CHECKS = [
    "too_short", "too_long", "high_punct",
    "low_stopword", "top_word", "dup_3gram",
]


def gate_ablation(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-filter ablation of the quality gate — the diagnostics a
    curation run reports to justify each check: for every gate
    criterion, how many docs trip it at all (n_failed) and how many
    trip ONLY it (n_failed_only = docs this single check removes — its
    marginal contribution), both in ppm of the corpus.

    Scale shape: the gate features are computed once (row-local, one
    scan); the 6-check fan-out is a constant-size explode; the tally is
    one partial-agg groupBy over 6 groups with the corpus total
    broadcast. Membership tests split fail_reasons on ';' — exact, no
    substring aliasing between check names."""
    qg = quality_gate(docs, text_col=text_col, id_col=id_col).select(
        "fail_reasons"
    )
    tot = qg.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    lits = ", ".join(f"'{c}'" for c in GATE_CHECKS)
    j = qg.select(
        "fail_reasons", F.explode(F.expr(f"array({lits})")).alias("chk")
    )
    per = j.groupBy("chk").agg(
        F.sum(
            F.when(
                F.array_contains(F.split("fail_reasons", ";"), F.col("chk")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_failed"),
        F.sum(
            F.when(F.col("fail_reasons") == F.col("chk"), 1).otherwise(0)
        ).cast("long").alias("n_failed_only"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "chk",
        "n_failed",
        "n_failed_only",
        F.expr("(n_failed * 1000000L) div n_total").alias("failed_ppm"),
        F.expr("(n_failed_only * 1000000L) div n_total").alias(
            "marginal_ppm"
        ),
    )
