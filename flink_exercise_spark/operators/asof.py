"""As-of (temporal) join — a custom operator Spark has no primitive for.

Semantics: for each left row, attach the latest right row whose
timestamp is <= the left timestamp, per key (DuckDB's ``ASOF JOIN``,
kdb's ``aj``, Pandas ``merge_asof``). The canonical pipeline use here:
purchase attribution — each purchase event joined to the user's most
recent prior view event.

Spark-first implementation (SURVEY.md custom-operator rule (a):
composition of existing DataFrame ops, no UDF): union both sides into
one ordered stream per key and carry the right side's timestamp forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding window
— one shuffle on the key, one partition-local sort; no range explosion,
no cross join.

Scale: identical shape to session windows (shuffle by key + per-key
sort-merge). Skewed keys are bounded by per-key event counts; a
pathological hot key salts on a coarse time bucket first. The naive
alternative — inequality join + per-pair max — is a quadratic range
join; never ship it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from flink_exercise_spark.registry import register
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Generic as-of join: left rows + latest right row with
    right_ts <= left_ts per ``on`` key.

    ``carry`` lists right-side columns to attach (each forwarded with
    its own last-ignorenulls window). Right rows sort before left rows
    at equal timestamps, so an exactly-simultaneous right row matches
    (DuckDB ASOF ``>=`` semantics).
    """
    lcols = [c for c in left.columns if c != on]
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c != left_ts],
        F.lit(None).cast("timestamp").alias("_rts"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
            for c in carry
        ],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c != left_ts],
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    merged = l.unionByName(r)
    w = (
        W.partitionBy(on)
        .orderBy("_t", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = merged.select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias("_asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in carry
        ],
    )
    keep = (
        [F.col(on), F.col("_t").alias(left_ts)]
        + [F.col(c) for c in lcols if c != left_ts]
        + [F.col("_asof_ts").alias("asof_ts")]
        + [F.col(f"asof_{c}") for c in carry]
    )
    return filled.filter(F.col("_is_left") == 1).select(*keep)


@register(
    "asof_purchase_attribution",
    # DuckDB's native ASOF JOIN is the oracle for our windowed
    # composition; >= semantics on the timestamp, per-user key.
    oracle="""
    SELECT p.user_id, p.event_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts,
           CAST(floor(epoch(v.ts)) AS BIGINT) AS prior_view_ts,
           v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join: each purchase attributed to the user's most recent "
        "prior view (windowed union composition vs native ASOF oracle)",
    tags=("asof", "join", "events"),
)
def q_asof_attribution(spark, sf_dir):
    ev = load_table(prep(spark), sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, views, on="user_id", carry=("event_id",))
    return joined.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("purchase_ts"),
        F.unix_timestamp("asof_ts").alias("prior_view_ts"),
        F.col("asof_event_id").alias("view_event_id"),
    )
