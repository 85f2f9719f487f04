"""Page-level curation composition: the pre-extraction cleaning cascade a
production crawl→KG pipeline runs, assembled from the datapipe operators
in the order that minimizes content reads at scale:

1. URL-keyed crawl dedup (cheapest — no content bytes touched)
2. benchmark decontamination (broadcast eval grams, corpus never shuffled)
3. quality gate (row-local, one scan)
4. PII redaction (row-local rewrite)
5. corpus-wide line dedup (the one content shuffle, over survivors only)

Each stage is optional; :func:`curate_pages` applies the enabled ones
lazily (no actions — the whole cascade is one logical plan feeding the
extraction stage). Pages are keyed by ``url`` (the page shape's id).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import decontaminate, line_dedup
from .textstats import gate_passed_col, redact_col
from .urls import dedup_by_url


def dedup_pages_by_url(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: Optional[str] = None,
) -> DataFrame:
    """Row-level companion of :func:`dedup_by_url`: returns the surviving
    PAGES (full rows), not the key table. With ``ts_col`` the newest
    fetch of each normalized URL wins (keep='latest'); without it the
    lexicographically-smallest exact URL wins. Among refetches that share
    the kept exact URL, the newest ``ts_col`` row is kept (assumes one
    row per (url, ts) — the crawl-table grain)."""
    keep = "latest" if ts_col is not None else "first"
    kept = dedup_by_url(
        pages, url_col=url_col, id_col=url_col, keep=keep, ts_col=ts_col
    ).select(F.col("keep_id").alias(url_col))
    out = pages.join(kept, url_col, "left_semi")
    if ts_col is not None:
        newest = out.groupBy(url_col).agg(F.max(ts_col).alias(ts_col))
        out = out.join(newest, [url_col, ts_col], "left_semi")
    return out


def decontaminated_stream(
    pages_stream: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Streaming decontamination: drop every arriving page that shares an
    ``n``-gram with the (static) eval set. The batch form
    (:func:`~genie_spark.datapipe.dedup.decontaminate`) explodes the
    corpus side and anti-joins its own hit list — a stream-stream self
    join, which Structured Streaming forbids. This form is row-preserving
    instead: each page carries its gram array and is LEFT-ANTI joined
    against the broadcast static eval grams on an ``array_contains``
    condition (stream ⋈ static anti joins are supported), so a page is
    dropped iff any eval gram occurs in it. Cost is O(|eval grams|) per
    page worst-case (broadcast nested loop) — fine for eval-set-sized
    right sides; a crawl-scale right side belongs in the batch path."""
    from .dedup import shingles_col

    eg = eval_docs.select(
        F.explode(shingles_col(F.col(text_col), n)).alias("gram")
    ).distinct()
    withg = pages_stream.withColumn(
        "_grams", shingles_col(F.col(text_col), n)
    )
    return withg.join(
        F.broadcast(eg), F.expr("array_contains(_grams, gram)"), "left_anti"
    ).drop("_grams")


def curate_pages(
    pages: DataFrame,
    url_dedup: bool = False,
    ts_col: Optional[str] = None,
    eval_docs: Optional[DataFrame] = None,
    gate: bool = False,
    neardup_cc: bool = False,
    redact: bool = False,
    dedup_lines: bool = False,
    strip_boilerplate: bool = False,
    boilerplate_min_df: int = 3,
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """Apply the enabled curation stages in production order. Returns the
    curated pages with the same schema (text rewritten in place by the
    redaction / line-dedup stages; pages dropped by the filter stages)."""
    if url_dedup:
        pages = dedup_pages_by_url(pages, url_col=url_col, ts_col=ts_col)
    if eval_docs is not None:
        hits = decontaminate(
            pages, eval_docs, text_col=text_col, id_col=url_col
        ).select(url_col)
        pages = pages.join(hits, url_col, "left_anti")
    if gate:
        # row-local filter form — no join, composes into the scan
        pages = pages.filter(gate_passed_col(F.col(text_col)))
    if neardup_cc:
        # transitive near-dup clustering over the survivors: MinHash-LSH
        # candidate pairs -> connected components -> keep one page per
        # duplicate cluster (min url). Pairwise keep-min under-deletes on
        # A~B~C chains; the closure is the production CCNet/RefinedWeb
        # form. Content is shingled only for pages that reached this
        # stage (after the URL fold and the gate).
        from .dedup import minhash_jaccard_pairs
        from .graph import component_dedup

        pairs = minhash_jaccard_pairs(pages, text_col=text_col, id_col=url_col)
        keep = component_dedup(pages.select(url_col), pairs, url_col)
        pages = pages.join(keep, url_col, "left_semi")
    if redact:
        # row-local in-place rewrite — no join
        pages = pages.withColumn(text_col, redact_col(F.col(text_col)))
    if dedup_lines:
        ld = line_dedup(pages, text_col=text_col, id_col=url_col).select(
            url_col, "clean_text"
        )
        pages = (
            pages.join(ld, url_col)
            .withColumn(text_col, F.col("clean_text"))
            .drop("clean_text")
            .filter(F.length(text_col) > 0)
        )
    if strip_boilerplate:
        # corpus-frequency boilerplate removal AFTER line dedup: lines in
        # >= min_df distinct surviving pages drop from all of them
        # (C4/CCNet family; dedup.boilerplate_strip). In-place rewrite
        # keyed on the page url; fully-boilerplate pages drop.
        from .dedup import boilerplate_strip

        bs = boilerplate_strip(
            pages, text_col=text_col, id_col=url_col,
            min_df=boilerplate_min_df,
        ).select(url_col, "clean_text")
        pages = (
            pages.join(bs, url_col)
            .withColumn(text_col, F.col("clean_text"))
            .drop("clean_text")
            .filter(F.length(text_col) > 0)
        )
    return pages
