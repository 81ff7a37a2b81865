"""Scalar expression helpers (JVM-side Column expressions — no UDFs).

Everything here compiles into whole-stage-codegen'd Catalyst expressions;
the helpers only encapsulate naming/parity conventions shared between
operators and the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def win_start(ts: str | Column, duration: str) -> Column:
    """Epoch-seconds start of the tumbling event-time window holding ts.

    Spark's ``window()`` aligns tumbling windows to the Unix epoch, so
    ``unix_timestamp(window(ts, d).start)`` equals the DuckDB expression
    ``CAST(floor(epoch(ts)/D)*D AS BIGINT)``. Emitting BIGINT epoch
    seconds (not a timestamp struct) keeps the driver's value-hash
    comparison timezone-proof.

    Reference analog: ``timeWindowAll(Time.days(31))``
    (StreamingJob.scala:91,95,98).
    """
    return F.unix_timestamp(F.window(ts, duration)["start"]).alias("window_start")


def floor_avg(value: str | Column, *, null_as_zero: bool = True) -> Column:
    """Floor-division average, NULLs counted as zero.

    Exact semantics of the reference's manual window function
    (StreamingJob.scala:97-107): ``sum / size`` with Long integer
    division over ``replyBytes.getOrElse(0)`` — i.e. the denominator
    includes NULL rows. Note ``avg(coalesce(v, 0)) != avg(v)`` whenever
    NULLs exist; this helper preserves the reference behavior.
    """
    v = F.col(value) if isinstance(value, str) else value
    if null_as_zero:
        v = F.coalesce(v, F.lit(0.0))
    return F.floor(F.sum(v) / F.count(F.lit(1)))
