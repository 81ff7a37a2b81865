"""cluster_conf (session.py): the 1000-executor/100 TB deployment
profile — pin the sizing arithmetic and the invariants the operator
families rely on, and prove the profile is actually consumable by a
SparkSession builder (keys/values well-formed)."""

from __future__ import annotations

from flink_exercise_spark.session import cluster_conf


def test_default_profile_sizing():
    c = cluster_conf()
    # 100 TB / 128 MB target task size
    assert int(c["spark.sql.shuffle.partitions"]) == 100 * 1024 * 1024 // 128
    assert c["spark.executor.instances"] == "1000"
    assert c["spark.sql.files.maxPartitionBytes"] == "128m"


def test_light_cluster_floors_at_two_waves():
    # a small cluster with small input still fills every core twice
    c = cluster_conf(executors=10, executor_cores=4, input_tb=0.001)
    assert int(c["spark.sql.shuffle.partitions"]) == 2 * 10 * 4


def test_profile_invariants_operators_rely_on():
    c = cluster_conf()
    # streaming jobs: RocksDB + changelog checkpointing (SCALE.md)
    assert "RocksDBStateStoreProvider" in c[
        "spark.sql.streaming.stateStore.providerClass"
    ]
    # dims stay broadcastable; AQE skew-join on; UTC window math;
    # Arrow path for the Pandas-UDF operators with bounded batches
    assert c["spark.sql.autoBroadcastJoinThreshold"] == "64m"
    assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert c["spark.sql.session.timeZone"] == "UTC"
    assert int(c["spark.sql.execution.arrow.maxRecordsPerBatch"]) <= 10000
    # every entry is a flat string pair a spark-submit --conf accepts
    for k, v in c.items():
        assert isinstance(k, str) and isinstance(v, str) and "=" not in k
