"""Event-log analytics: cohort retention and funnel conversion.

The two standard product-analytics shapes over an append-only event
log, built to stay one-shuffle at any log size:

* :func:`cohort_retention` — users grouped by first-seen day, activity
  counted per day offset. The cohort assignment is ONE user-keyed
  partial-agg min; the offset table joins it back user-keyed (both
  sides hash-partition on user_id, co-located under AQE) and the final
  census is a partial-aggregatable count-distinct per (cohort, offset).
* :func:`funnel_conversion` — step-1 → step-2 conversion inside a
  window. Per-user step-1 anchor is a partial-agg min; the step-2 scan
  joins the (users-sized, not events-sized) anchor table on user_id
  with the window as a residual range predicate — never an event×event
  self-join.

Day arithmetic is integer (datediff), so the DuckDB twins are
digit-identical; no float timestamps anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, n_users): distinct users of each
    first-seen-day cohort active at each day offset."""
    first = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_day")
    )
    return (
        events.select(user_col, F.to_date(ts_col).alias("d"))
        .join(first, user_col)
        .select(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            user_col,
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(user_col).cast("long").alias("n_users"))
    )


def funnel_conversion(
    events: DataFrame,
    step1: str = "signup",
    step2: str = "purchase",
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row: (n_users, n_step1, n_converted, conversion_ppm) — users
    with a ``step2`` event within ``window_days`` after their FIRST
    ``step1`` event."""
    anchors = (
        events.filter(F.col(type_col) == step1)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    converted = (
        events.filter(F.col(type_col) == step2)
        .select(user_col, F.col(ts_col).alias("t2"))
        .join(anchors, user_col)
        .filter(
            (F.col("t2") >= F.col("t1"))
            & (F.col("t2") <= F.expr(f"t1 + INTERVAL {int(window_days)} DAY"))
        )
        .select(user_col)
        .distinct()
    )
    return (
        events.agg(
            F.count_distinct(user_col).cast("long").alias("n_users")
        )
        .crossJoin(
            anchors.agg(F.count(F.lit(1)).cast("long").alias("n_step1"))
        )
        .crossJoin(
            converted.agg(
                F.count(F.lit(1)).cast("long").alias("n_converted")
            )
        )
        .select(
            "n_users",
            "n_step1",
            "n_converted",
            F.expr(
                "CASE WHEN n_step1 = 0 THEN 0L"
                " ELSE (n_converted * 1000000L) div n_step1 END"
            ).alias("conversion_ppm"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition table over per-user event
    sequences: (from_type, to_type, n, p_ppm) where p_ppm is the
    integer transition probability out of from_type. Ordering ties on
    identical timestamps break on event_id so the sequence — and hence
    every count — is partition-invariant.

    Scale shape: ONE user-keyed window (lead) builds the adjacent
    pairs — the shuffle is by user, the sequence sort is per-user local
    sort inside the window, never a global sort; both aggregates are
    partial-aggregatable counts; the per-from totals join is
    from_type-sized (broadcast)."""
    from pyspark.sql import Window

    seq = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(seq).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000L) div n_from").alias("p_ppm"),
    )


def attribution_last_touch(
    events: DataFrame,
    conversion: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: for every conversion event, credit the
    most recent PRECEDING non-conversion event of the same user; count
    credits per touch type, with share in ppm. Returns
    (touch_type, n_conversions, share_ppm).

    Scale shape: ONE user-keyed ordered window builds the running
    "last touch" via ``last_value(..., ignorenulls)`` over the
    preceding frame — the classic fill-forward; ties on equal
    timestamps break on event_id so credit assignment is
    partition-invariant; final tallies are partial-aggregatable."""
    from pyspark.sql import Window

    seq = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(seq)
    credits = (
        events.select(
            F.col(type_col).alias("et"), touch.alias("touch_type")
        )
        .filter(
            (F.col("et") == conversion) & F.col("touch_type").isNotNull()
        )
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
    )
    total = credits.agg(
        F.sum("n_conversions").cast("long").alias("n_total")
    )
    return credits.crossJoin(F.broadcast(total)).select(
        "touch_type",
        "n_conversions",
        F.expr("(n_conversions * 1000000L) div n_total").alias("share_ppm"),
    )


def type_share_drift(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Distribution-drift monitor: each event type's daily share vs its
    overall share, in ppm — the table a pipeline-health check reads to
    catch a day whose event mix shifted. Returns (event_type, day,
    n, daily_share_ppm, overall_share_ppm, drift_ppm).

    Scale shape: ONE partial-agg groupBy over the log builds the
    (type, day) census; every other operand (day totals, type totals,
    grand total) is an aggregate OF that census — type x day sized, not
    log-sized — so the fact table is scanned exactly once and all
    enrichment joins are broadcast-tiny."""
    base = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.to_date(ts_col).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    day_t = base.groupBy("day").agg(F.sum("n").cast("long").alias("n_day"))
    typ_t = base.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_type")
    )
    tot = base.agg(F.sum("n").cast("long").alias("n_total"))
    return (
        base.join(F.broadcast(day_t), "day")
        .join(F.broadcast(typ_t), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "day",
            "n",
            F.expr("(n * 1000000L) div n_day").alias("daily_share_ppm"),
            F.expr("(n_type * 1000000L) div n_total").alias(
                "overall_share_ppm"
            ),
            F.expr(
                "abs((n * 1000000L) div n_day"
                " - (n_type * 1000000L) div n_total)"
            ).alias("drift_ppm"),
        )
    )

def volume_anomaly(
    events: DataFrame,
    window_days: int = 3,
    k_sigma2: int = 4,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-volume anomaly monitor: flag (type, day) cells whose count
    deviates from the trailing-``window_days`` moving baseline by more
    than ``k_sigma2`` trailing variances — the alert table an ingest
    health-check reads to catch a collapsed or runaway feed. Returns
    (event_type, day, n, trail_mean, trail_var, dev2, is_anomaly) for
    every day with a FULL trailing window (the first ``window_days``
    observed days per type carry no verdict and are dropped).

    All moments are floor-division integers of exact counts (the
    length_outliers discipline) so the DuckDB twin is digit-identical;
    the deviation test uses the centered form ``(n - mean)^2 >
    k * max(var, 1)`` which stays in signed-64 for any real feed.

    Scale shape: ONE partial-agg groupBy over the log builds the
    (type, day) census; the trailing window runs over that census
    partitioned BY TYPE — days-per-type sized partitions, never a
    global sort, never the raw log through a window."""
    from pyspark.sql import Window

    base = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.to_date(ts_col).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    trail = base.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("_s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("_s2"),
        F.count(F.lit(1)).over(w).alias("_c"),
    ).filter(F.col("_c") == window_days)
    return trail.select(
        "event_type",
        "day",
        "n",
        F.expr("_s div _c").alias("trail_mean"),
        F.expr("_s2 div _c - (_s div _c) * (_s div _c)").alias("trail_var"),
        F.expr("(n - _s div _c) * (n - _s div _c)").alias("dev2"),
        F.expr(
            f"(n - _s div _c) * (n - _s div _c)"
            f" > {int(k_sigma2)} * greatest(_s2 div _c - (_s div _c) * (_s div _c), 1L)"
        ).alias("is_anomaly"),
    )


def sequential_patterns(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Length-3 sequential-pattern support (PrefixSpan's 3-item tier,
    existence semantics): for every type triple (a, b, c), how many
    users' event streams contain an a, then a later b, then a later c
    — (a, b, c, n_users, support_ppm). Order is the total (ts, id) key.

    The cubic "all event triples" join never happens: existence of a
    subsequence is equivalent to existence of the GREEDY-EARLIEST chain
    (earliest a; earliest b after it; any c after that), so the plan is
    three user-keyed stages. The AGGREGATE OUTPUTS are bounded by
    users × |type domain|^k, k <= 2; the ev⋈fa / ev⋈fb join inputs
    fan out to |events| × (per-user type combinations) rows before the
    min(struct) partial aggregates — map-side combine bounds the shuffle
    at the aggregate size, but the join-side intermediate itself is
    event-count-proportional (a skewed user pays degree × types there).
    The final support count is one groupBy over the users ×
    types³-bounded distinct set, and the user total broadcasts onto
    it."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("i")).alias(
            "k"
        ),
    )
    fa = ev.groupBy("u", F.col("t").alias("a")).agg(F.min("k").alias("ka"))
    fb = (
        ev.join(fa, "u")
        .filter(F.col("k") > F.col("ka"))
        .groupBy("u", "a", F.col("t").alias("b"))
        .agg(F.min("k").alias("kb"))
    )
    fc = (
        ev.join(fb, "u")
        .filter(F.col("k") > F.col("kb"))
        .select("u", "a", "b", F.col("t").alias("c"))
        .distinct()
    )
    nu = events.agg(
        F.count_distinct(F.col(user_col)).cast("long").alias("n_total")
    )
    return (
        fc.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(F.broadcast(nu))
        .select(
            "a", "b", "c", "n_users",
            F.expr("(n_users * 1000000L) div n_total").alias("support_ppm"),
        )
    )


def user_cadence(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user activity-cadence summary: event count, active span, and
    min/avg/max inter-event gap in integer seconds — the engagement
    profile behind churn models and crawl-politeness audits alike.
    (user, n_events, span_s, min_gap_s, avg_gap_s, max_gap_s); avg is
    the exact integer ``span div (n−1)``; users with one event report
    zero gaps.

    Scale shape: ONE user-partitioned lead() window ordered by the
    total (ts, id) key — sort bounded by per-user event counts — then a
    per-user partial aggregate; no join, no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # TIMESTAMP_NTZ refuses a direct bigint cast under ANSI; epoch
    # seconds via unix_timestamp are fine because ONLY differences are
    # emitted, so the epoch basis cancels (matches DuckDB epoch() diffs)
    t = F.unix_timestamp(F.col(ts_col)).cast("long")
    gaps = events.select(
        F.col(user_col).alias("u"),
        t.alias("t"),
        F.lead(t).over(w).alias("nxt"),
    ).withColumn("gap", F.col("nxt") - F.col("t"))
    return gaps.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("t") - F.min("t")).cast("long").alias("span_s"),
        F.coalesce(F.min("gap"), F.lit(0)).cast("long").alias("min_gap_s"),
        F.expr(
            "(max(t) - min(t)) div greatest(count(1) - 1L, 1L)"
        ).cast("long").alias("avg_gap_s"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap_s"),
    ).withColumnRenamed("u", user_col)
