"""The Spark generation operator and the end-to-end extraction pipeline.

This is the Spark-native counterpart of the reference's flagship entry
point (reference: genie/evaluate.py:33-66 driving
genie/models/genie_base_pl.py:194-248): scan → filter → sentence split →
batched constrained generation → parse → triples. Everything relational is
declarative DataFrame API (Catalyst plans it); Python appears exactly once,
in the Arrow-batched ``mapInPandas`` generation stage — per the
BASELINE.json input_hint ("vectorized pandas/Arrow UDFs, no per-row
Python" at the API boundary).

Scale design (100 TB / 1000 executors):

* The tokenizer vocabulary and both tries are built ONCE on the driver
  from the (small) catalog dimension tables, then shipped with
  ``sc.broadcast`` — one copy per executor JVM, handed to each reused
  Python worker on first use (reference loads the pickled trie per process:
  genie/models/genie_base_pl.py:92-94). The FlatTrie is three numpy arrays
  (CSR), so the large-schema ~6M-name trie broadcasts as a few hundred MB
  instead of a multi-GB nested dict.
* Generation is embarrassingly parallel per sentence — no cross-row
  state — so output is invariant to partitioning (the two-cluster-size
  determinism invariant) and the stage scales linearly until the scan or
  the downstream canonicalize shuffle dominates.
* ``repartition`` before the generation stage balances compute (decode
  cost is proportional to document length, not row count); callers at
  cluster scale should pass ``partitions ≈ 2-3 × total cores``.
* Per-executor init (trie unpack, scorer construction) happens once per
  Python worker via a module-level cache keyed by broadcast id — the same
  trick as the reference's once-per-run tag-id precompute
  (ie_prefix_constraints.py:94-134), not once per batch.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .constraints import TagCodes
from .decode import DeterministicScorer, generate_for_text, top_valid_prediction
from .extract import sentences_df
from .tokenizer import WordTokenizer
from .trie import trie_from_names
from .triples import parse_triples_col

BEAM_SCHEMA = ArrayType(
    StructType(
        [
            StructField("text", StringType()),
            StructField("log_prob", DoubleType()),
        ]
    )
)

# per-Python-worker cache: broadcast id → (tokenizer, codes, ent_trie,
# rel_trie, scorer). Survives across tasks when spark.python.worker.reuse
# is on (default), so the decode machinery is built once per worker.
_WORKER_CACHE: dict = {}


def default_stack_factory(payload: dict):
    """Build the decode stack in WordTokenizer space (the sandbox/oracle
    path). ``payload["scorer_factory"]``, when present, is a picklable
    ``tokenizer -> scorer`` callable replacing DeterministicScorer — the
    pluggable-scorer seam (reference analog: the model object handed to
    evaluate.py:35-66 is the scorer)."""
    tok = WordTokenizer(payload["ent_names"] + payload["rel_names"])
    codes = TagCodes(tok)
    if "ent_trie" in payload:
        # preloaded artifact: the broadcast carries the CSR arrays directly
        from .trie import FlatTrie

        ent = FlatTrie(*payload["ent_trie"])
        rel = FlatTrie(*payload["rel_trie"])
    else:
        ent = trie_from_names(payload["ent_names"], tok)
        rel = trie_from_names(payload["rel_names"], tok)
    make_scorer = payload.get("scorer_factory")
    scorer = make_scorer(tok) if make_scorer else DeterministicScorer(tok)
    return tok, codes, ent, rel, scorer


def hf_stack_factory(payload: dict):
    """Build the decode stack in the HF checkpoint's OWN id space — the
    production path (reference flagship: model.sample,
    genie_base_pl.py:435-555, with tag ids derived from the model's BART
    tokenizer, ie_prefix_constraints.py:94-131). The tokenizer adapter
    derives TagCodes from the checkpoint's tokenizer and the tries are
    re-encoded through it, so constraint masks, beam tokens, and
    decoder_input_ids all live in one id space. Raises in this sandbox
    (no torch/transformers) — the wiring is exercised by the fake-BPE
    adapter tests."""
    from .decode import HFSeq2SeqScorer
    from .hf_adapter import HFTokenizerAdapter

    scorer = HFSeq2SeqScorer(
        payload["hf_checkpoint"], device=payload.get("hf_device", "cuda")
    )
    tok = HFTokenizerAdapter(scorer.tokenizer)
    codes = TagCodes(tok)
    ent = trie_from_names(payload["ent_names"], tok)
    rel = trie_from_names(payload["rel_names"], tok)
    return tok, codes, ent, rel, scorer


def _worker_setup(payload: dict):
    key = payload["cache_key"]
    hit = _WORKER_CACHE.get(key)
    if hit is not None:
        return hit
    factory = payload.get("stack_factory") or default_stack_factory
    stack = factory(payload)
    _WORKER_CACHE.clear()  # one active schema per worker; avoid leaks
    _WORKER_CACHE[key] = stack
    return _WORKER_CACHE[key]


def save_trie_artifacts(
    ent_names: List[str],
    rel_names: List[str],
    ent_path: str,
    rel_path: str,
) -> None:
    """S10 (reference trie.py:65-77): persist both catalog tries (+ the
    companion original-strings jsonl) as reloadable artifacts. Both tries
    MUST be saved together: token ids come from the tokenizer built over
    the ent+rel name union, so artifacts from different unions cannot be
    mixed — GenieExtractor(trie_artifacts=...) reloads the pair and
    rebuilds that same tokenizer from the companion names."""
    ents = sorted(set(ent_names))
    rels = sorted(set(rel_names))
    tok = WordTokenizer(ents + rels)
    trie_from_names(ents, tok).save(ent_path, names=ents)
    trie_from_names(rels, tok).save(rel_path, names=rels)


class GenieExtractor:
    """Closed-world constrained triple generation as a DataFrame transform.

    Public API analog of the reference's ``model.sample``
    (genie_base_pl.py:435-555), lifted to DataFrames:
    ``transform(df)`` consumes a column of input texts and appends
    ``beams: array<struct<text,log_prob>>`` plus the top-valid
    ``prediction`` string and parsed ``pred_triples``.
    """

    def __init__(
        self,
        spark: SparkSession,
        ent_names: Optional[List[str]] = None,
        rel_names: Optional[List[str]] = None,
        num_beams: int = 2,
        max_length: int = 96,
        length_penalty: float = 0.0,
        bos_first: bool = False,
        num_return_sequences: Optional[int] = None,
        trie_artifacts: Optional[tuple] = None,
        scorer_factory=None,
        hf_checkpoint: Optional[str] = None,
        hf_device: str = "cuda",
        stack_factory=None,
        constrained: bool = True,
    ):
        """``constrained=False`` switches to FREE generation — the
        reference's ``free_generation=true`` run mode (genie_base_pl.py:
        92-94: tries only load when constrained and model.sample runs
        without a constraint fn; genie_base_hf.py:1-36 is that baseline).
        The decode stack (tokenizer/scorer) is identical; only the
        per-step allowed set changes to the full non-special vocabulary,
        so output need not be well-formed and names need not be catalog
        entries.

        Scorer selection (executor-side, shipped via the broadcast):

        * default — DeterministicScorer over WordTokenizer (sandbox/oracle
          path).
        * ``scorer_factory`` — a picklable ``tokenizer -> scorer``
          callable built per worker in WordTokenizer space (mock/custom
          scorers).
        * ``hf_checkpoint`` — the production path: each worker loads the
          HF seq2seq checkpoint and builds the WHOLE stack (TagCodes,
          tries, beams) in that model's tokenizer id space via
          hf_adapter.HFTokenizerAdapter, matching the reference's
          model.sample flagship (genie_base_pl.py:435-555). Mutually
          exclusive with trie_artifacts (artifact token ids are
          WordTokenizer-space) and scorer_factory.
        * ``stack_factory`` — full custom control: a picklable
          ``payload -> (tok, codes, ent_trie, rel_trie, scorer)``
          callable (e.g. toy_bpe.toy_bpe_stack_factory, the executable
          reference for the adapter contract). Mutually exclusive with
          all of the above.
        """
        self.num_beams = num_beams
        self.max_length = max_length
        # search width vs returned beams (reference hf_generation_params:
        # num_beams=10, num_return_sequences=2); None = return all beams
        self.num_return_sequences = num_return_sequences
        # reference decode-parity knobs (default.yaml:9 length_penalty=1.0,
        # ie_prefix_constraints.py:183-184 BOS forcing); defaults keep the
        # deterministic-scorer golden outputs unchanged
        self.length_penalty = length_penalty
        self.bos_first = bos_first
        self.constrained = constrained
        if hf_checkpoint is not None and (
            trie_artifacts is not None or scorer_factory is not None
        ):
            raise ValueError(
                "hf_checkpoint builds its own tokenizer-space stack; it "
                "cannot be combined with trie_artifacts or scorer_factory"
            )
        if stack_factory is not None and (
            hf_checkpoint is not None
            or scorer_factory is not None
            or trie_artifacts is not None
        ):
            raise ValueError(
                "stack_factory supplies the whole decode stack; it cannot "
                "be combined with hf_checkpoint / scorer_factory / "
                "trie_artifacts"
            )
        if trie_artifacts is not None:
            # preloaded S10 artifacts (save_trie_artifacts): names come
            # from the companion jsonl, the CSR arrays broadcast as-is —
            # workers skip the trie build entirely
            from .trie import FlatTrie

            ent_path, rel_path = trie_artifacts
            ent_names = FlatTrie.load_names(ent_path)
            rel_names = FlatTrie.load_names(rel_path)
            et, rt = FlatTrie.load(ent_path), FlatTrie.load(rel_path)
            extra = {
                "ent_trie": (et.offsets, et.tokens, et.childs),
                "rel_trie": (rt.offsets, rt.tokens, rt.childs),
            }
        else:
            extra = {}
        # Sort for build determinism (reference trie.py:36). The broadcast
        # carries raw names, not the trie: names compress well, and the
        # CSR build is cheap and deterministic on each worker.
        payload = {
            "ent_names": sorted(set(ent_names)),
            "rel_names": sorted(set(rel_names)),
            **extra,
        }
        if stack_factory is not None:
            payload["stack_factory"] = stack_factory
        elif hf_checkpoint is not None:
            payload["stack_factory"] = hf_stack_factory
            payload["hf_checkpoint"] = hf_checkpoint
            payload["hf_device"] = hf_device
        elif scorer_factory is not None:
            payload["scorer_factory"] = scorer_factory

        def _qual(fn):
            return f"{fn.__module__}.{getattr(fn, '__qualname__', repr(fn))}"

        # the key must separate stacks that share a catalog but differ in
        # scorer/checkpoint, or worker reuse would serve the wrong scorer
        stack_id = (
            (stack_factory and _qual(stack_factory))
            or hf_checkpoint
            or (scorer_factory and _qual(scorer_factory))
            or "default"
        )
        # Hash the FULL name lists: a catalog refresh that preserves counts
        # and the first-N sorted names must still produce a distinct key, or
        # a reused Python worker would serve stale tries (silent wrong
        # triples). One md5 over the joined byte string is microseconds even
        # at ~6M names, and — unlike Python's salted hash() — stable across
        # driver processes.
        import hashlib

        catalog_digest = hashlib.md5()
        for name in payload["ent_names"]:
            catalog_digest.update(name.encode("utf-8", "surrogatepass"))
            catalog_digest.update(b"\x1f")
        catalog_digest.update(b"\x1e")
        for name in payload["rel_names"]:
            catalog_digest.update(name.encode("utf-8", "surrogatepass"))
            catalog_digest.update(b"\x1f")
        payload["cache_key"] = (
            len(payload["ent_names"]),
            len(payload["rel_names"]),
            catalog_digest.hexdigest(),
            stack_id,
        )
        self._bc = spark.sparkContext.broadcast(payload)

    def transform(self, df: DataFrame, text_col: str = "input") -> DataFrame:
        """df(..., text_col) → df + beams + prediction + pred_triples."""
        bc = self._bc
        num_beams, max_length = self.num_beams, self.max_length
        length_penalty, bos_first = self.length_penalty, self.bos_first
        n_ret = self.num_return_sequences
        constrained = self.constrained
        out_schema = StructType(
            df.schema.fields
            + [
                StructField("beams", BEAM_SCHEMA),
                StructField("prediction", StringType()),
            ]
        )
        in_cols = [f.name for f in df.schema.fields]

        def gen(batches: Iterator) -> Iterator:
            import pandas as pd

            tok, codes, ent, rel, scorer = _worker_setup(bc.value)
            if constrained:
                fv = None
            else:
                from .decode import free_vocab_ids

                # free mode: tries are ignored, allowed set = full vocab
                # (built once per worker, shared across rows)
                ent = rel = None
                fv = free_vocab_ids(tok)
            for pdf in batches:
                beams_col, pred_col = [], []
                for text in pdf[text_col]:
                    beams = generate_for_text(
                        text, scorer, tok, codes, ent, rel,
                        num_beams=num_beams, max_length=max_length,
                        length_penalty=length_penalty, bos_first=bos_first,
                        num_return_sequences=n_ret, free_vocab=fv,
                    )
                    beams_col.append(
                        [(b["text"], float(b["log_prob"])) for b in beams]
                    )
                    pred_col.append(top_valid_prediction(beams))
                out = pdf[in_cols].copy()
                out["beams"] = beams_col
                out["prediction"] = pred_col
                yield out

        result = df.mapInPandas(gen, out_schema)
        return result.withColumn(
            "pred_triples", parse_triples_col(F.coalesce(F.col("prediction"), F.lit("")))
        )

    def score_targets(
        self,
        df: DataFrame,
        text_col: str = "input",
        target_col: str = "prediction",
        epsilon: float = 0.1,
    ) -> DataFrame:
        """A9 — forced target scoring as a DataFrame transform (reference:
        label-smoothed NLL in validation_step, genie_base_pl.py:168-192 /
        utils.py:6-54, lifted out of torch into the scorer protocol).
        Appends nll_sum, smooth_sum, n_tokens, loss (per-token,
        label-smoothed) for each row's target linearization — NULL target
        rows get NULL scores. Row-local like generation: no cross-row
        state, partition-invariant, same broadcast stack and per-worker
        cache as transform()."""
        from pyspark.sql.types import IntegerType

        bc = self._bc
        out_schema = StructType(
            df.schema.fields
            + [
                StructField("nll_sum", DoubleType()),
                StructField("smooth_sum", DoubleType()),
                StructField("n_tokens", IntegerType()),
                StructField("loss", DoubleType()),
            ]
        )
        in_cols = [f.name for f in df.schema.fields]

        def score(batches: Iterator) -> Iterator:
            from .decode import sequence_nll

            tok, codes, ent, rel, scorer = _worker_setup(bc.value)
            eos = tok.eos_token_id
            for pdf in batches:
                nlls, smooths, ns, losses = [], [], [], []
                for text, target in zip(pdf[text_col], pdf[target_col]):
                    if target is None:
                        nlls.append(None); smooths.append(None)
                        ns.append(None); losses.append(None)
                        continue
                    ids = tok.encode_pieces(target) + [eos]
                    nll, smooth, n, loss = sequence_nll(
                        text, ids, scorer, tok, codes, ent, rel, epsilon=epsilon
                    )
                    nlls.append(nll); smooths.append(smooth)
                    ns.append(n); losses.append(loss)
                out = pdf[in_cols].copy()
                out["nll_sum"] = nlls
                out["smooth_sum"] = smooths
                out["n_tokens"] = ns
                out["loss"] = losses
                yield out

        return df.mapInPandas(score, out_schema)


def _declared_partitions(df: DataFrame) -> int:
    """Partition count the physical plan DECLARES, without building the
    RDD chain (``df.rdd`` on a 100-TB plan walks file listings and
    disables AQE) and without running a job. Explicit repartitions /
    exchanges report their count; scans and local relations report 0
    (unknown partitioning)."""
    try:
        return int(
            df._jdf.queryExecution().sparkPlan().outputPartitioning().numPartitions()
        )
    except Exception:  # non-classic backends: treat as unknown
        return 0


def extract_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    ent_names: List[str],
    rel_names: List[str],
    lang: Optional[str] = "en",
    num_beams: int = 2,
    partitions: Optional[int] = None,
    extractor: Optional[GenieExtractor] = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, …) → one row per sentence with
    extracted triples: (url, sent_idx, input, beams, prediction,
    pred_triples).

    Plan shape: scan → lang filter (pushed to the parquet/Iceberg scan by
    Catalyst) → JVM-side sentence split (no Python) → repartition to
    saturate cores → mapInPandas generation → JVM-side parse.

    ``partitions``: None (default) auto-repartitions to 2× the cluster's
    default parallelism unless the plan already carries a partitioning of
    at least that size — the generation stage is compute-bound, so
    inheriting a small file count single-threads the decode (measured: a
    1-partition scan pinned throughput at one worker regardless of
    local[8] vs local[32]). The check reads the physical plan's declared
    output partitioning (a pure plan-analysis probe: no ``df.rdd``, no
    file listing, no Spark job); scans report "unknown" and get the
    balancing repartition — the safe default for a compute-dominant
    stage. Pass an explicit count to override, or 0 to keep the scan
    partitioning.
    """
    if lang is not None:
        pages = pages.filter(F.col("lang") == lang)
    sents = sentences_df(pages, text_col="text").select(
        "url", "warc_ts", "sent_idx", "input"
    )
    if partitions is None:
        want = spark.sparkContext.defaultParallelism * 2
        partitions = 0 if _declared_partitions(sents) >= want else want
    if partitions:
        # balance decode compute, not bytes: hash on (url, sent_idx)
        sents = sents.repartition(partitions, "url", "sent_idx")
    ex = extractor or GenieExtractor(spark, ent_names, rel_names, num_beams=num_beams)
    return ex.transform(sents)
