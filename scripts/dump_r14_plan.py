"""Dump `.explain("formatted")` for named registry queries into
plans/r14/<query>_<suffix>.txt — the before/after evidence for
OPTIMIZATION_r14.md (run under the bench conf so plan shapes match what
bench.py measures).

Usage: python scripts/dump_r14_plan.py <suffix> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_exercise_spark import registry
from flink_exercise_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(
        app_name="dump-r14-plans",
        master="local[8]",
        conf={
            "spark.sql.shuffle.partitions": "2",
            "spark.sql.adaptive.enabled": "false",
            "spark.default.parallelism": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.specs()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange nodes)")
    spark.stop()


if __name__ == "__main__":
    main()
