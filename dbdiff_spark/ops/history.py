"""Snapshot history operators — fold a SEQUENCE of snapshots into a
slowly-changing-dimension type-2 (SCD2) table.

The reference diffs exactly two snapshots and throws the result away
each REPL round (`cmd/dbdiff/main.go:83` swaps before=after).  The
natural warehouse-scale extension is to keep the whole lineage: given
snapshots s0..sN of a keyed table, emit one row per (key, version)
with a validity interval — the standard dimension-history layout that
downstream point-in-time joins consume.

Scale shape (everything is keyed on the table's primary key):

* tag + union the snapshots — a scan, no shuffle;
* densify the (key × snapshot) timeline so DISAPPEARANCES are visible
  (a deleted key must CLOSE its last version): distinct keys × S
  ordinals, with the S-row ordinal side broadcast — output is keys×S
  rows, linear in S;
* one window (lag over snap ordinal per key) finds change points via
  per-column null-safe comparison — no row hashing, so there is no
  collision risk and no cross-engine hash to agree on;
* a second window (lead over the change points) closes each interval.

All shuffles hash on the key; at 100 TB the cost is S·|keys| window
rows — the same order as reading the snapshots.  For large S the dense
timeline should be built per-key with a pivot instead (noted inline);
for the S≤4 audit-history case the cross join is the simpler plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbdiff_spark import testkit
from dbdiff_spark.io import load_table
from dbdiff_spark.testkit import SPECS, MUTATIONS, Mutation, _after_sql, _prep_sql


def scd2_history(
    spark: SparkSession,
    snaps: list[DataFrame],
    keys: list[str],
    attrs: list[str],
) -> DataFrame:
    """Fold ordered snapshots into SCD2 rows.

    Output: ``keys + attrs + (valid_from, valid_to, is_current)`` where
    ``valid_from``/``valid_to`` are snapshot ordinals (``valid_to`` NULL
    for open intervals).  A key deleted at snapshot *s* has its last
    version closed with ``valid_to = s``; re-appearing keys open a new
    version.  Unchanged rows collapse into one interval.
    """
    s_count = len(snaps)
    tagged = None
    for i, df in enumerate(snaps):
        t = df.select(*keys, *attrs).withColumn("snap_ord", F.lit(i)).withColumn(
            "_present", F.lit(True)
        )
        tagged = t if tagged is None else tagged.unionByName(t)

    # Dense (key, snap_ord) grid so absence is a visible state.  The
    # ordinal side is S literal rows — broadcast, so this is a map-side
    # expand of the distinct-key set, not a shuffle.  (For large S,
    # replace with a per-key pivot to arrays of length S.)
    keyset = tagged.select(*keys).distinct()
    ords = spark.range(s_count).select(F.col("id").cast("int").alias("snap_ord"))
    dense = keyset.crossJoin(F.broadcast(ords))
    state = dense.join(tagged, [*keys, "snap_ord"], "left").withColumn(
        "present", F.coalesce(F.col("_present"), F.lit(False))
    )

    w = Window.partitionBy(*keys).orderBy("snap_ord")
    prev_present = F.lag("present").over(w)
    # Per-column null-safe change detection — exact, no hashing.
    attr_changed = None
    for a in attrs:
        c = ~F.col(a).eqNullSafe(F.lag(a).over(w))
        attr_changed = c if attr_changed is None else (attr_changed | c)
    is_event = F.when(prev_present.isNull(), F.col("present")).otherwise(
        (F.col("present") != prev_present)
        | (F.col("present") & prev_present & attr_changed)
    )
    events = state.withColumn("is_event", is_event).filter(F.col("is_event"))

    we = Window.partitionBy(*keys).orderBy("snap_ord")
    closed = events.withColumn("valid_to", F.lead("snap_ord").over(we))
    return (
        closed.filter(F.col("present"))
        .select(
            *keys,
            *attrs,
            F.col("snap_ord").alias("valid_from"),
            F.col("valid_to"),
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


# --- the oracle-checked query: 3-snapshot customer history ------------------

# Second mutation round, applied to the ALREADY-mutated snapshot s1:
# rows touched twice get two closed/open versions, rows deleted after an
# update get a closed final version, and a fresh insert opens at s2.
CUSTOMER_MUT2 = Mutation(
    delete_where="c_custkey % 10 = 4",
    updates=(
        ("c_custkey % 10 = 3", "c_acctbal", "c_acctbal + 25.0"),
        ("c_custkey % 10 = 1", "c_mktsegment", "'MUT2'"),
    ),
    insert_where="c_custkey % 10 = 6",
    insert_overrides={"c_custkey": "c_custkey + 2000000"},
)


def scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of customer over snapshots (base, mut1(base),
    mut2(mut1(base))) — the reference's REPL rounds persisted as one
    dimension-history table instead of being discarded."""
    spec = SPECS["customer"]
    s0 = testkit.prep(load_table(spark, sf_dir, "customer"), spec)
    s1 = testkit.apply_mutation(s0, spec, MUTATIONS["customer"])
    s2 = testkit.apply_mutation(s1, spec, CUSTOMER_MUT2)
    attrs = [c for c in spec.cols if c not in spec.key]
    return scd2_history(spark, [s0, s1, s2], list(spec.key), attrs)


def _scd2_oracle_sql() -> str:
    spec = SPECS["customer"]
    keys, attrs = list(spec.key), [c for c in spec.cols if c not in spec.key]
    key_cols = ", ".join(f'"{k}"' for k in keys)
    attr_cols = ", ".join(f'"{a}"' for a in attrs)
    part = key_cols
    attr_changed = " OR ".join(
        f'"{a}" IS DISTINCT FROM lag("{a}") OVER (PARTITION BY {part} ORDER BY snap_ord)'
        for a in attrs
    )
    return f"""
WITH s0 AS ({_prep_sql(spec)}),
s1 AS ({_after_sql(spec, MUTATIONS["customer"], src="s0")}),
s2 AS ({_after_sql(spec, CUSTOMER_MUT2, src="s1")}),
tagged AS (
  SELECT {key_cols}, {attr_cols}, 0 AS snap_ord, TRUE AS _present FROM s0
  UNION ALL
  SELECT {key_cols}, {attr_cols}, 1, TRUE FROM s1
  UNION ALL
  SELECT {key_cols}, {attr_cols}, 2, TRUE FROM s2
),
keyset AS (SELECT DISTINCT {key_cols} FROM tagged),
dense AS (
  SELECT keyset.*, o.snap_ord
  FROM keyset CROSS JOIN (SELECT unnest([0, 1, 2]) AS snap_ord) o
),
state AS (
  SELECT d.*, {", ".join(f't."{a}"' for a in attrs)},
         coalesce(t._present, FALSE) AS present
  FROM dense d
  LEFT JOIN tagged t USING ({key_cols}, snap_ord)
),
marked AS (
  SELECT *,
    CASE WHEN lag(present) OVER (PARTITION BY {part} ORDER BY snap_ord) IS NULL
         THEN present
         ELSE present <> lag(present) OVER (PARTITION BY {part} ORDER BY snap_ord)
              OR (present
                  AND lag(present) OVER (PARTITION BY {part} ORDER BY snap_ord)
                  AND ({attr_changed}))
    END AS is_event
  FROM state
),
events AS (SELECT * FROM marked WHERE is_event),
closed AS (
  SELECT *, lead(snap_ord) OVER (PARTITION BY {part} ORDER BY snap_ord) AS valid_to
  FROM events
)
SELECT {key_cols}, {attr_cols},
       snap_ord AS valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM closed WHERE present
"""


SCD2_CUSTOMER_SQL = _scd2_oracle_sql()

QUERIES = {
    "scd2_customer": (scd2_customer, SCD2_CUSTOMER_SQL),
}
