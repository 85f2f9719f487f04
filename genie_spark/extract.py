"""HTML → text → sentence extraction (the byte-identical-per-url stage).

The per-row invariant (BASELINE.json input_hint) is that extracted text is
byte-identical per url across runs and parallelism levels. Everything here
is a pure function of the row, implemented twice with identical semantics:

* pure Python (unit tests, the reference oracle path);
* native Spark Column expressions (``regexp_replace`` / ``split`` /
  ``posexplode``) so the 100 TB path is JVM-side, codegen'd, and
  pushdown-friendly — no Python worker in the extraction stage.

Sentence-splitting semantics re-derived from the reference's REBEL
preprocessing (reference: genie/datamodule/initial_preprocessing/
convert_rebel_data2kilt.py:81-105,147):

* paragraphs are ``\\n``-separated; empty paragraphs are skipped;
* sentences split on ``(?<=[.])\\s`` (whitespace preceded by a dot);
* each extracted unit keeps a trailing single space (the reference
  accumulates ``sentence + " "``), with ``\\s{2,}`` collapsed to one space.

The reference's boundary-aware "don't split inside an entity name" rule
depends on gold entity-boundary annotations that a web page does not have;
for web input the engine treats each sentence as a unit (annotation-aware
grouping applies only to the KILT evaluation tables, which arrive
pre-split).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P_CLOSE_RE = re.compile(r"</p\s*>")
_TAG_RE = re.compile(r"<[^>]*>")
_SENT_SPLIT_RE = re.compile(r"(?<=[.])\s")
_WS_RE = re.compile(r"\s{2,}")

# Java-regex twins of the above (identical syntax for these patterns)
P_CLOSE_PATTERN = "</p\\s*>"
TAG_PATTERN = "<[^>]*>"
SENT_SPLIT_PATTERN = "(?<=[.])\\s"
WS_PATTERN = "\\s{2,}"


def html_to_text(html: str) -> str:
    """Strip markup: </p> becomes a newline, all other tags vanish, basic
    entities unescape, trailing newlines trimmed."""
    text = _P_CLOSE_RE.sub("\n", html)
    text = _TAG_RE.sub("", text)
    text = text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    return text.rstrip("\n")


def split_sentences(text: str) -> List[str]:
    """Text → ordered sentence units, each whitespace-collapsed with a
    trailing single space (reference accumulation semantics)."""
    out = []
    for para in text.split("\n"):
        if len(para) == 0:
            continue
        for sent in _SENT_SPLIT_RE.split(para):
            if not sent.strip():
                continue
            out.append(_WS_RE.sub(" ", sent + " "))
    return out


def extract_sentences(text: str) -> List[Tuple[int, str]]:
    return list(enumerate(split_sentences(text)))


# ---------------------------------------------------------------------------
# Spark-native versions
# ---------------------------------------------------------------------------


def html_to_text_col(html: Column) -> Column:
    """Column[binary|string] html → Column[string] text; JVM-side only."""
    text = F.regexp_replace(html.cast("string"), P_CLOSE_PATTERN, "\n")
    text = F.regexp_replace(text, TAG_PATTERN, "")
    text = F.replace(text, F.lit("&lt;"), F.lit("<"))
    text = F.replace(text, F.lit("&gt;"), F.lit(">"))
    text = F.replace(text, F.lit("&amp;"), F.lit("&"))
    return F.regexp_replace(text, "\\n+$", "")


def sentences_df(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages(url, ..., text) → one row per sentence:
    (url, sent_idx, input) with the same semantics as
    :func:`split_sentences`. Pure higher-order functions + one generator
    expression — stays inside whole-stage codegen, no Python."""
    paras = F.filter(F.split(F.col(text_col), "\n"), lambda p: F.length(p) > 0)
    sents = F.flatten(
        F.transform(paras, lambda p: F.split(p, SENT_SPLIT_PATTERN))
    )
    cleaned = F.transform(
        F.filter(sents, lambda s: F.trim(s) != F.lit("")),
        lambda s: F.regexp_replace(F.concat(s, F.lit(" ")), WS_PATTERN, " "),
    )
    return pages.withColumn("_sents", cleaned).select(
        "*",
        F.posexplode("_sents").alias("sent_idx", "input"),
    ).drop("_sents")
