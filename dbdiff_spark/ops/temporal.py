"""Temporal join operators Spark lacks natively — as-of join and range
join — composed from built-in operators (option (a) of the custom-
operator ladder: composition > pandas UDF > mapPartitions).

* **As-of join**: for every purchase event, the latest click of the same
  user at-or-before the purchase time.  Implemented as a union + running
  ``last(..., ignorenulls)`` over a RANGE window — one shuffle on
  user_id, no pair explosion, O(n log n) per partition.  (The pandas
  alternative, ``merge_asof`` per group via applyInPandas, pays Arrow
  round-trips; the window formulation stays in the JVM.)
* **Range join**: events within ±1 hour of every error event of the same
  user.  Implemented with the bucketize-then-equi-join trick: map each
  probe to its hour bucket, explode each error to its 3 adjacent
  buckets, equi-join on (user, bucket) — Catalyst gets a hash join on a
  uniform key instead of an O(n²) theta join — then filter the exact
  range.  At 100 TB the bucket width is the knob trading shuffle width
  against candidate count.

The DuckDB oracles use the engine-native formulations (ASOF JOIN and a
plain inequality join) — different algorithms, identical semantics,
which is exactly what an oracle should pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table

RANGE_US = 3600 * 1_000_000  # ±1 hour


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).filter(
        # NULL timestamps have no temporal position: Spark's RANGE window
        # would group NULL-ordered rows as peers (a NULL-ts purchase
        # could 'match' a NULL-ts click) while SQL inequality predicates
        # never match NULL — exclude them from temporal joins outright
        F.col("ts_us").isNotNull()
    )


def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the same user's latest click at-or-before
    it.  Clicks are deduplicated to one per (user, instant) — max
    event_id — so exact-tie behavior is deterministic and matches the
    ASOF oracle."""
    ev = _events_us(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    tagged = purchases.select(
        "user_id",
        F.col("ts_us"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts_us",
            F.lit(None).cast("long").alias("purchase_id"),
            "click_id",
        )
    )
    # RANGE frame on ts: a click at the exact purchase instant matches
    # (ASOF's ts <= ts), regardless of interleave order within the tie
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    with_asof = tagged.withColumn(
        "asof",
        F.last(
            # only click rows contribute state: a struct with a NULL
            # click_id is itself non-null and would defeat ignorenulls
            F.when(
                F.col("click_id").isNotNull(), F.struct("ts_us", "click_id")
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        with_asof.filter(F.col("purchase_id").isNotNull())
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("asof.click_id").alias("asof_click_id"),
            F.col("asof.ts_us").alias("asof_click_ts_us"),
        )
    )


ASOF_JOIN_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
clicks AS (
  SELECT user_id, ts_us, max(event_id) AS click_id
  FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts_us FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
       c.click_id AS asof_click_id, c.ts_us AS asof_click_ts_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""


def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count events of the same user within ±1 hour of each error event
    (the error itself excluded) — bucketized range join."""
    ev = _events_us(spark, sf_dir)
    probes = ev.select(
        "user_id",
        F.col("event_id").alias("probe_id"),
        F.col("ts_us").alias("probe_ts"),
        (F.col("ts_us") - F.col("ts_us") % RANGE_US).alias("bucket"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("error_ts"),
    )
    # each error probes its 3 adjacent buckets → equi-join, no theta join
    error_buckets = errors.select(
        "user_id",
        "error_id",
        "error_ts",
        F.explode(
            F.array(
                *[
                    (F.col("error_ts") - F.col("error_ts") % RANGE_US) + F.lit(d)
                    for d in (-RANGE_US, 0, RANGE_US)
                ]
            )
        ).alias("bucket"),
    )
    joined = error_buckets.join(probes, on=["user_id", "bucket"]).filter(
        (F.abs(F.col("probe_ts") - F.col("error_ts")) <= RANGE_US)
        & (F.col("probe_id") != F.col("error_id"))
    )
    counted = joined.groupBy("error_id", "user_id", "error_ts").agg(
        F.count(F.lit(1)).alias("n_context_events")
    )
    # keep errors with empty context too (left join back)
    return (
        errors.join(counted, on=["error_id", "user_id", "error_ts"], how="left")
        .select(
            "error_id",
            "user_id",
            F.col("error_ts").alias("error_ts_us"),
            F.coalesce(F.col("n_context_events"), F.lit(0)).alias("n_context_events"),
        )
    )


RANGE_JOIN_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
errors AS (
  SELECT event_id AS error_id, user_id, ts_us AS error_ts
  FROM ev WHERE event_type = 'error'
)
SELECT e.error_id, e.user_id, e.error_ts AS error_ts_us,
       CAST(count(p.event_id) AS BIGINT) AS n_context_events
FROM errors e
LEFT JOIN ev p
  ON p.user_id = e.user_id
 AND abs(p.ts_us - e.error_ts) <= {RANGE_US}
 AND p.event_id <> e.error_id
GROUP BY e.error_id, e.user_id, e.error_ts
"""


HOUR_US = 3600 * 1_000_000


def events_hourly_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts with ZERO-FILLED gaps — the resample/gap-fill
    primitive time-series pipelines need (a plain groupBy silently drops
    empty buckets).  The dense hour axis is generated from the observed
    min/max bin with ``sequence``+``explode`` — no calendar table — and
    the per-bin counts join back onto it; both sides of that join are
    tiny (one row per hour), so at 100 TB the cost remains the single
    counting pass over the events."""
    ev = _events_us(spark, sf_dir)
    binned = ev.selectExpr(f"ts_us div {HOUR_US} AS hour_bin")
    counts = binned.groupBy("hour_bin").agg(F.count(F.lit(1)).alias("n"))
    bins = counts.agg(
        F.min("hour_bin").alias("lo"), F.max("hour_bin").alias("hi")
    ).selectExpr("explode(sequence(lo, hi)) AS hour_bin")
    return bins.join(counts, "hour_bin", "left").select(
        "hour_bin", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events")
    )


EVENTS_HOURLY_FILL_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS ts_us FROM events WHERE ts IS NOT NULL
),
c AS (
  SELECT ts_us // {HOUR_US} AS hour_bin, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1
),
b AS (SELECT min(hour_bin) AS lo, max(hour_bin) AS hi FROM c),
bins AS (SELECT unnest(generate_series(lo, hi)) AS hour_bin FROM b)
SELECT bins.hour_bin, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
FROM bins LEFT JOIN c USING (hour_bin)
"""


# --- cascading rollup (continuous-aggregate / hypertable pattern) -----------
#
# The 100 TB rollup posture: aggregate raw events ONCE into fine-grained
# (hourly) partials, then derive every coarser resolution (daily,
# monthly, ...) by re-aggregating the partials — never re-reading raw
# data.  That requires every measure to be a mergeable partial: count
# and sum merge by sum; min/max merge by min/max.  avg is NOT stored —
# it's derived (sum/count) at read time.  Doubles are quantized to a
# 1e-4 integer grid per row (parallel double summation is
# order-dependent; see analytics._dsum) so the cascade is bit-exact.
# The oracle aggregates raw→daily directly: identical results prove the
# two-level merge is lossless.

_VQ = "CAST(ROUND(value * 10000) AS BIGINT)"


def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type stats computed FROM hourly partial aggregates
    (sum/count/min/max merge; avg derived) — the mergeable cascade a
    continuous aggregate maintains incrementally."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.selectExpr(
        "event_type",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT) AS hour",
        f"{_VQ} AS vq",
    )
    hourly = base.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").alias("sq"),
        F.min("vq").alias("mn"),
        F.max("vq").alias("mx"),
    )
    return (
        hourly.groupBy(
            "event_type",
            F.expr("CAST(FLOOR(hour / 24) AS BIGINT)").alias("day"),
        )
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("sq") / 10000).alias("total_value"),
            (F.min("mn") / 10000).alias("min_value"),
            (F.max("mx") / 10000).alias("max_value"),
        )
        .select(
            "event_type",
            "day",
            "n_events",
            "total_value",
            (F.col("total_value") / F.col("n_events")).alias("avg_value"),
            "min_value",
            "max_value",
        )
    )


EVENTS_ROLLUP_CASCADE_SQL = f"""
SELECT event_type,
       CAST(FLOOR(FLOOR(epoch_us(ts) / 3600000000) / 24) AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({_VQ}) AS BIGINT) / 10000 AS total_value,
       (CAST(sum({_VQ}) AS BIGINT) / 10000) / count(*) AS avg_value,
       CAST(min({_VQ}) AS BIGINT) / 10000 AS min_value,
       CAST(max({_VQ}) AS BIGINT) / 10000 AS max_value
FROM events
GROUP BY 1, 2
"""


# --- funnel conversion -------------------------------------------------------
#
# Ordered-stage funnel (view → click → purchase): a user converts a
# stage only with an event STRICTLY AFTER their entry into the previous
# stage.  Each stage is one filtered keyed aggregation + one keyed join
# against the (per-user, tiny) previous-stage table — no windows over
# the raw event stream, no per-user event collection, so the plan holds
# when one user has millions of events.  Conversion is integer ppm.

_FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    stage_users = []  # per stage: DataFrame(user_id, t)
    prev = None
    for st in _FUNNEL_STAGES:
        cur = ev.filter(F.col("event_type") == st)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts_us") > F.col("t"))
        cur = cur.groupBy("user_id").agg(F.min("ts_us").alias("t_new")).select(
            "user_id", F.col("t_new").alias("t")
        )
        stage_users.append(cur)
        prev = cur
    counts = None
    for i, (st, df) in enumerate(zip(_FUNNEL_STAGES, stage_users)):
        c = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_ord"), F.lit(st).alias("stage"), "n_users"
        )
        counts = c if counts is None else counts.unionByName(c)
    prev_n = (
        "CAST(CASE WHEN stage_ord = 0 THEN 1000000"
        " ELSE (n_users * 1000000) div lag_n END AS BIGINT)"
    )
    return counts.selectExpr(
        "stage_ord",
        "stage",
        "n_users",
        "lag(n_users) OVER (ORDER BY stage_ord) AS lag_n",
    ).selectExpr("stage_ord", "stage", "n_users", f"{prev_n} AS conv_ppm")


def _funnel_sql() -> str:
    stage_ctes, prev = [], None
    for i, st in enumerate(_FUNNEL_STAGES):
        name = f"s{i}"
        if prev is None:
            stage_ctes.append(
                f"{name} AS (SELECT user_id, min(ts_us) AS t FROM ev"
                f" WHERE event_type = '{st}' GROUP BY user_id)"
            )
        else:
            stage_ctes.append(
                f"{name} AS (SELECT ev.user_id, min(ts_us) AS t FROM ev"
                f" JOIN {prev} p ON ev.user_id = p.user_id"
                f" WHERE event_type = '{st}' AND ts_us > p.t GROUP BY ev.user_id)"
            )
        prev = name
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage_ord, '{st}' AS stage,"
        f" CAST((SELECT count(*) FROM s{i}) AS BIGINT) AS n_users"
        for i, st in enumerate(_FUNNEL_STAGES)
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events WHERE ts IS NOT NULL
),
{", ".join(stage_ctes)},
counts AS (
{unions}
)
SELECT stage_ord, stage, n_users,
       CAST(CASE WHEN stage_ord = 0 THEN 1000000
            ELSE (n_users * 1000000) // lag(n_users) OVER (ORDER BY stage_ord)
       END AS BIGINT) AS conv_ppm
FROM counts
"""


FUNNEL_SQL = _funnel_sql()


# --- retention cohorts -------------------------------------------------------
#
# Users grouped by their FIRST-activity day; per (cohort_day, day
# offset) the distinct returning users.  Two keyed aggregations (first
# day per user; distinct per cohort-offset) and one keyed join — the
# canonical retention matrix, bounded to offsets 0-13 so the output is
# O(days × 14) at any data size.

RETENTION_MAX_OFFSET = 13
_DAY_US = 86_400_000_000


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir).selectExpr(
        "user_id", f"ts_us div {_DAY_US} AS day"
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .selectExpr("user_id", "cohort_day", "day - cohort_day AS offset")
        .filter(F.col("offset") <= RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", "offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events WHERE ts IS NOT NULL
),
first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS offset,
       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
FROM ev JOIN first ON ev.user_id = first.user_id
WHERE day - cohort_day <= {RETENTION_MAX_OFFSET}
GROUP BY cohort_day, day - cohort_day
"""


# --- sequence-gap detection ---------------------------------------------------

GAP_US = 3_600_000_000  # report inactivity gaps > 1 hour


def sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inactivity gaps longer than ``GAP_US`` — the monitoring
    question "where did the feed stop?".  One lag window per user (one
    shuffle on user_id, the natural event partitioning); output is
    bounded by the number of GAPS, not events."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .filter(F.col("ts_us") - F.col("prev_us") > GAP_US)
        .select(
            "user_id",
            F.col("prev_us").alias("gap_start_us"),
            F.col("ts_us").alias("gap_end_us"),
            (F.col("ts_us") - F.col("prev_us")).alias("gap_us"),
        )
    )


SEQUENCE_GAPS_SQL = f"""
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id, prev_us AS gap_start_us, ts_us AS gap_end_us,
       ts_us - prev_us AS gap_us
FROM ordered
WHERE ts_us - prev_us > {GAP_US}
"""


# --- peak concurrency ---------------------------------------------------------

HOLD_US = 300_000_000  # each event holds a resource for 5 minutes


PEAK_BUCKET_US = 86_400_000_000  # 1-day prefix-sum buckets


def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the maximum number of simultaneously-open
    intervals ``[ts, ts + 5min)`` and the first instant that peak is
    reached — the +1/−1 boundary sweep, computed as a DISTRIBUTED
    two-phase prefix sum rather than one ordered window per series.

    A naive per-type running sum funnels each series through a single
    reducer; here the timeline splits into day buckets, the within-
    bucket sweep runs in parallel (window keyed on (type, bucket)),
    bucket deltas roll up to a bucket-count-sized summary whose
    exclusive prefix sum — the only totally-ordered step — runs over
    rows-per-series = number of DAYS, not events (the same bucket-
    offset decomposition as ``corpus_shuffle_index``).  Ends sort
    before starts at the same instant (half-open intervals: a
    departure at t frees the slot before an arrival at t takes it)."""
    ev = _events_us(spark, sf_dir)
    pts = ev.select(
        "event_type", F.col("ts_us").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        ev.select(
            "event_type",
            (F.col("ts_us") + HOLD_US).alias("t"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("bucket", F.expr(f"t div {PEAK_BUCKET_US}"))
    w_local = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("run_local", F.sum("delta").over(w_local))
    totals = pts.groupBy("event_type", "bucket").agg(
        F.sum("delta").alias("bucket_delta")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_delta").over(w_off), F.lit(0))
    ).select("event_type", "bucket", "offset")
    swept = local.join(F.broadcast(offsets), ["event_type", "bucket"]).withColumn(
        "running", F.col("run_local") + F.col("offset")
    )
    # per-type max via map-side-combinable agg + broadcast back — a
    # window max would re-shuffle every boundary row into one partition
    # per series
    peaks = swept.groupBy("event_type").agg(F.max("running").alias("peak"))
    return (
        swept.join(F.broadcast(peaks), "event_type")
        .filter(F.col("running") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.max("peak").cast("bigint").alias("peak_concurrent"),
            F.min("t").alias("peak_at_us"),
        )
    )


PEAK_CONCURRENCY_SQL = f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT event_type, epoch_us(ts) + {HOLD_US} AS t, -1 AS delta
  FROM events WHERE ts IS NOT NULL
),
swept AS (
  SELECT event_type, t, delta,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM pts
),
peaks AS (
  SELECT event_type, t, running,
         max(running) OVER (PARTITION BY event_type) AS peak
  FROM swept
)
SELECT event_type,
       CAST(max(peak) AS BIGINT) AS peak_concurrent,
       min(t) AS peak_at_us
FROM peaks
WHERE running = peak
GROUP BY event_type
"""


# --- CUSUM changepoint detection per series ---------------------------------
#
# Sequential CUSUM (Page 1954) per user over event values — the
# streaming-monitoring classic, computed batch-side WITHOUT the
# recursive form: the reset recursion C_t = max(0, C_{t−1} + x_t − k)
# is exactly C_t = S_t − min(S_0..S_t) for the plain prefix sum
# S_t = Σ(x−k), S_0 = 0 — so two stacked window functions over ONE
# (user)-keyed shuffle replace the unparallelizable recurrence.  All
# arithmetic on the integer cents grid; ordering is (ts, event_id) so
# exact-tie rows are deterministic in both engines.
#
# k (drift allowance) sits above the value mean so only anomalous runs
# of high values accumulate; h is the alarm threshold.  Output is the
# bounded per-user summary (n_events, max CUSUM, alarm count), not the
# per-event trace.

CUSUM_K_CENTS = 6_000  # drift allowance: value 60.00
CUSUM_H_CENTS = 30_000  # alarm threshold: accumulated excess 300.00


def cusum_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr(
            f"CAST(ROUND(value * 100) AS BIGINT) - {CUSUM_K_CENTS}"
        ).alias("xk"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = base.withColumn("s", F.sum("xk").over(wsum))
    # min over S_0..S_t with S_0 = 0 ⇒ least(0, running min of S)
    cusum = s.withColumn(
        "cusum", F.col("s") - F.least(F.lit(0), F.min("s").over(wsum))
    )
    return (
        cusum.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("cusum").alias("max_cusum_cents"),
            F.count_if(F.col("cusum") > CUSUM_H_CENTS).alias("n_alarms"),
        )
        .orderBy("user_id")
    )


CUSUM_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) - {CUSUM_K_CENTS} AS xk
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
s AS (
  SELECT user_id, event_id, ts_us,
         SUM(xk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS s
  FROM base
),
c AS (
  SELECT user_id,
         CAST(s - LEAST(0, MIN(s) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id
                                        ROWS UNBOUNDED PRECEDING))
              AS BIGINT) AS cusum
  FROM s
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(cusum) AS BIGINT) AS max_cusum_cents,
       CAST(count(*) FILTER (WHERE cusum > {CUSUM_H_CENTS}) AS BIGINT) AS n_alarms
FROM c GROUP BY user_id ORDER BY user_id
"""


# --- OHLC bars ---------------------------------------------------------------
#
# The time-series resample primitive: per (event_type, hour) the open /
# high / low / close of the value series.  Open and close are argmin /
# argmax over event time — min(struct(ts, event_id, value)) — so they
# are ONE map-side-combinable aggregation each (no window, no sort),
# with (ts, event_id) making exact-tie picks deterministic.  Values on
# the cents grid end-to-end; the whole op is a single shuffle on the
# bar key.

BAR_US = 3_600_000_000  # 1-hour bars


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    base = ev.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    ).withColumn("bar_start_us", F.expr(f"(ts_us div {BAR_US}) * {BAR_US}"))
    return (
        base.groupBy("event_type", "bar_start_us")
        .agg(
            F.min(F.struct("ts_us", "event_id", "cents")).alias("__o"),
            F.max(F.struct("ts_us", "event_id", "cents")).alias("__c"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "bar_start_us",
            F.col("__o.cents").alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("__c.cents").alias("close_cents"),
            "n_events",
        )
        .orderBy("event_type", "bar_start_us")
    )


OHLC_SQL = f"""
WITH base AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         (epoch_us(ts) // {BAR_US}) * {BAR_US} AS bar_start_us
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bar_start_us
                            ORDER BY ts_us, event_id) AS rn_open,
         row_number() OVER (PARTITION BY event_type, bar_start_us
                            ORDER BY ts_us DESC, event_id DESC) AS rn_close
  FROM base
)
SELECT event_type, bar_start_us,
       CAST(min(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(min(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY event_type, bar_start_us
ORDER BY event_type, bar_start_us
"""


# --- behavioral transition matrix -------------------------------------------


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event Markov statistics: counts and integer-ppm
    probabilities for every observed (prev_type → next_type) pair.
    One lag window per user (one shuffle on user_id, the natural event
    partitioning), then a map-side-combinable pair count; the per-prev
    row-total side is bounded by the event-type vocabulary, so its
    enrichment join broadcasts at any scale."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "prev_type").selectExpr(
        "prev_type",
        "next_type",
        "n_transitions",
        "(1000000 * n_transitions) div n_from AS p_ppm",
    )


EVENT_TRANSITIONS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events WHERE ts IS NOT NULL
),
pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n_transitions
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
  FROM pairs GROUP BY 1
)
SELECT prev_type, next_type, n_transitions,
       (1000000 * n_transitions) // n_from AS p_ppm
FROM pairs JOIN totals USING (prev_type)
"""


QUERIES = {
    "asof_join_purchase_click": (asof_join_purchase_click, ASOF_JOIN_SQL),
    "event_transitions": (event_transitions, EVENT_TRANSITIONS_SQL),
    "cusum_anomalies": (cusum_anomalies, CUSUM_SQL),
    "ohlc_bars": (ohlc_bars, OHLC_SQL),
    "sequence_gaps": (sequence_gaps, SEQUENCE_GAPS_SQL),
    "peak_concurrency": (peak_concurrency, PEAK_CONCURRENCY_SQL),
    "range_join_error_context": (range_join_error_context, RANGE_JOIN_SQL),
    "events_hourly_fill": (events_hourly_fill, EVENTS_HOURLY_FILL_SQL),
    "events_rollup_cascade": (events_rollup_cascade, EVENTS_ROLLUP_CASCADE_SQL),
    "funnel_conversion": (funnel_conversion, FUNNEL_SQL),
    "retention_cohorts": (retention_cohorts, RETENTION_SQL),
}
