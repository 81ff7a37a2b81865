"""Snapshot/manifest versioning for the persisted index stores — the
table-format KERNEL (what Delta/Iceberg/Hudi are underneath), with no
new dependencies (VERDICT r9 ask #4).

``layout.merge_upsert`` documents its transactional seam honestly:
plain parquet with dynamic partition overwrite has no atomic
multi-file commit, so a reader scanning mid-merge can see a
half-rewritten prefix directory, and a crash mid-overwrite loses the
partition. The r9 index stores (operators/incremental.py) made that
seam load-bearing. This module closes it with the minimal classic
construction:

- **Append-only data files.** Every commit writes NEW files under the
  store's single ``data/`` root (one Hive-style ``bucket=`` directory
  per partition, globally-unique file names); nothing a previous
  snapshot references is ever modified or deleted by a commit.
- **Manifests.** ``_manifests/v%08d.json`` lists, per partition, the
  exact data files that make up that snapshot (plus the Spark schema
  for the empty-store edge). A partition untouched by a commit carries
  its file list forward by REFERENCE — the partition-scoped merge cost
  of the plain-parquet path is preserved.
- **Atomic pointer swap.** ``_CURRENT`` names the live manifest and is
  replaced via write-temp + ``os.replace`` (atomic on POSIX). A reader
  resolves ``_CURRENT`` once and then reads an IMMUTABLE file set: it
  sees the old snapshot or the new one, never a mix. A crash before
  the swap leaves only unreferenced files (vacuumable), never a
  corrupt store.

Readers pin snapshots for the lifetime of a DataFrame (the file list
is fixed at construction), so long analyses are repeatable while
merges land. ``vacuum`` deletes data files unreferenced by the last
``keep_versions`` snapshots — the GC half of the format, separated
from commit exactly so that readers of recent snapshots stay safe.

Paths are local-filesystem (os.rename atomicity); on an object store
the same construction uses the store's atomic-rename or
put-if-absent primitive — the layout and manifest logic are
unchanged. This is the single-writer form: two concurrent WRITERS
would race the version counter; serializing writers (the daily-batch
contract) is assumed, as in layout.merge_upsert.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"
_MANIFESTS = "_manifests"
_DATA = "data"
# Spark's Hive partition-directory escaping (ExternalCatalogUtils.
# escapePathName): these characters and all control chars become
# %XX (uppercase hex) in the directory name. Re-implemented here so
# versioned_read can match RAW string values against encoded
# directories instead of rejecting them (code-review r12: the first
# cut rejected values like 'a b' that Hive stores verbatim, and
# rejected the pre-encoded form too, making pruned reads impossible).
_HIVE_ESCAPED = set('"#%\'*/:=?\\\x7f{[]^')


def _hive_encode(value: str) -> str:
    return "".join(
        f"%{ord(c):02X}" if c in _HIVE_ESCAPED or ord(c) < 0x20 else c
        for c in value
    )


def current_version(path: str) -> int | None:
    """The live snapshot's version, or None for a not-yet-created
    store."""
    cur = os.path.join(path, _CURRENT)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return int(f.read().strip().lstrip("v"))


def read_manifest(path: str, version: int | None = None) -> dict:
    """The manifest dict for ``version`` (default: the live one):
    ``{"version": N, "partition_col": c, "schema": <spark json>,
    "files": {partition_value: [relative paths]}}``."""
    v = current_version(path) if version is None else version
    if v is None:
        raise ValueError(
            f"no versioned store at {path!r} — bootstrap one with "
            "versioned_write"
        )
    with open(os.path.join(path, _MANIFESTS, f"v{v:08d}.json")) as f:
        return json.load(f)


def _publish(path: str, manifest: dict) -> int:
    """Write the manifest, then atomically swap _CURRENT onto it."""
    v = manifest["version"]
    mdir = os.path.join(path, _MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, f"v{v:08d}.json")
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    cur_tmp = os.path.join(path, f".{_CURRENT}.tmp-{uuid.uuid4().hex}")
    with open(cur_tmp, "w") as f:
        f.write(f"v{v:08d}")
    os.replace(cur_tmp, os.path.join(path, _CURRENT))  # THE commit point
    return v


def _stage_in(
    df: DataFrame, path: str, partition_col: str, version: int
) -> dict[str, list[str]]:
    """Write ``df`` to a staging directory, then move its part files
    into the store's single ``data/`` root under globally-unique
    names (version prefix + Spark's own job-unique part names).
    Returns {partition_value: [relative file paths]} for the staged
    rows. Files are INVISIBLE to readers until a manifest referencing
    them is published.

    Rows are clustered by ``partition_col`` before the write so each
    partition directory gets ONE file per commit, not one per writer
    task: an unclustered commit of a T-task relation across P
    partition values writes up to T x P tiny files, and a
    partition-pruned reader then pays a file-open per task-fragment —
    measured 10,000-task probe scans against the ANN codes store
    before this clustering (r11 bench_ann_store). One shuffle at
    commit time buys every future pruned read."""
    stage = os.path.join(path, f"_stage-{uuid.uuid4().hex}")
    df.repartition(F.col(partition_col)).write.partitionBy(
        partition_col
    ).parquet(stage)
    out: dict[str, list[str]] = {}
    try:
        for entry in sorted(os.listdir(stage)):
            if not entry.startswith(f"{partition_col}="):
                continue
            pval = entry.split("=", 1)[1]
            dst_dir = os.path.join(path, _DATA, entry)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in sorted(os.listdir(os.path.join(stage, entry))):
                if not fname.endswith(".parquet"):
                    continue
                dst_name = f"v{version:08d}-{fname}"
                os.replace(
                    os.path.join(stage, entry, fname),
                    os.path.join(dst_dir, dst_name),
                )
                out.setdefault(pval, []).append(
                    os.path.join(_DATA, entry, dst_name)
                )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return out


def versioned_write(
    df: DataFrame, path: str, partition_col: str = "bucket"
) -> int:
    """Bootstrap a versioned store (snapshot v1). Refuses to
    re-bootstrap an existing store — later states are produced by
    ``versioned_merge_upsert`` so history stays readable."""
    if current_version(path) is not None:
        raise ValueError(
            f"versioned store already exists at {path!r}: use "
            "versioned_merge_upsert to produce new snapshots"
        )
    os.makedirs(path, exist_ok=True)
    files = _stage_in(df, path, partition_col, version=1)
    return _publish(
        path,
        {
            "version": 1,
            "partition_col": partition_col,
            "schema": df.schema.json(),
            "files": files,
        },
    )


def versioned_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    partition_values: list | None = None,
) -> DataFrame:
    """The snapshot as a DataFrame. The file list is resolved ONCE,
    here — the returned DataFrame keeps reading this exact snapshot
    even if merges commit afterwards (snapshot isolation; committed
    files are never mutated and vacuum spares recent versions).
    Partition pruning on ``partition_col`` still applies: the single
    ``basePath`` lets Spark derive the partition column from the
    directory names.

    ``partition_values`` prunes at the MANIFEST level: only the named
    partitions' files are handed to the reader at all — the
    table-format point. Handing every path to Spark and filtering
    after still pays driver-side file-index planning over the WHOLE
    store (measured ~40 s of a 47 s ANN query against 2 x 16.7k
    per-cell files, r11 bench_ann_store); the manifest already holds
    the files-per-partition map, so a reader that knows its
    partitions skips that cost entirely. RAW int and str values are
    matched against the directory-encoded partition strings through
    the same Hive escaping Spark applied at write time (so 'a b' or
    'x=y' prune correctly); value types whose str() is NOT guaranteed
    to match the JVM's encoding (floats — '1e-07' vs '1.0E-7' —
    booleans — 'True' vs 'true' — the empty string, None) are
    REJECTED loud instead of silently pruning to an empty relation
    (r11 ADVICE)."""
    from pyspark.sql.types import StructType

    m = read_manifest(path, version)
    file_map = m["files"]
    if partition_values is not None:
        for v in partition_values:
            if (
                not isinstance(v, (int, str))
                or isinstance(v, bool)  # JVM encodes 'true', not 'True'
                or v == ""  # Spark writes __HIVE_DEFAULT_PARTITION__
            ):
                raise ValueError(
                    f"versioned_read: partition value {v!r} has no "
                    "byte-exact Hive directory encoding from Python "
                    "(pass ints or non-empty strings) — rejecting "
                    "instead of letting a mismatch silently prune to "
                    "an empty read"
                )
        wanted = {_hive_encode(str(v)) for v in partition_values}
        file_map = {p: fl for p, fl in file_map.items() if p in wanted}
    files = [
        os.path.join(path, f) for fl in file_map.values() for f in fl
    ]
    if not files:
        # the stored schema already CONTAINS the partition column (it
        # is df.schema at write time, before partitionBy moves it into
        # directory names) — only add it, as a last-resort string, if
        # a caller stored a schema without it (code-review r10: the
        # unconditional add produced a duplicate, ambiguous column)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if m["partition_col"] not in schema.fieldNames():
            schema = schema.add(m["partition_col"], "string")
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("basePath", os.path.join(path, _DATA))
        .parquet(*files)
    )


def versioned_merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str = "bucket",
) -> dict[str, int]:
    """``layout.merge_upsert`` semantics (updates win on key, other
    base rows survive, new keys insert; partition-scoped: only the
    partitions present in the updates are read and re-materialized)
    against the versioned store: instead of dynamically OVERWRITING
    the touched directories, the merged partitions land as NEW files
    and a new manifest carries every untouched partition forward by
    reference. Readers mid-merge keep their pinned snapshot; the
    commit point is one atomic pointer swap."""
    from flink_exercise_spark.operators.layout import (
        _assert_key_unique,
        _touched_partition_filter,
    )

    prev = read_manifest(path)
    if prev["partition_col"] != partition_col:
        raise ValueError(
            f"store is partitioned by {prev['partition_col']!r}, "
            f"not {partition_col!r}"
        )
    n_updates = _assert_key_unique(updates, key)
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    base = versioned_read(spark, path).filter(
        _touched_partition_filter(touched, partition_col)
    )
    survivors = base.join(
        F.broadcast(updates.select(key).distinct()), key, "left_anti"
    )
    merged = survivors.unionByName(updates).localCheckpoint()
    version = prev["version"] + 1
    new_files = _stage_in(merged, path, partition_col, version)
    # Carry-forward diff keys on the STAGED directory names themselves
    # (new_files' keys): every touched partition has >= 1 update row
    # by construction (touched is derived FROM the updates), so it
    # necessarily appears in new_files — and Spark's Hive escaping of
    # special characters (space -> %20 etc.) can never desynchronize
    # a str(value) re-encoding from the directory encoding
    # (code-review r10: the previous str()-based diff silently
    # carried stale files forward for any escaped partition value).
    files = {
        pval: fl
        for pval, fl in prev["files"].items()
        if pval not in new_files
    }
    files.update(new_files)
    _publish(
        path,
        {
            "version": version,
            "partition_col": partition_col,
            "schema": prev["schema"],
            "files": files,
        },
    )
    return {
        "rows_in_rewritten_partitions": merged.count(),
        "rows_upserted": n_updates,
        "partitions_rewritten": len(touched),
        "version": version,
    }


def vacuum(path: str, keep_versions: int = 2) -> dict[str, int]:
    """Delete data files unreferenced by the newest ``keep_versions``
    snapshots, and the manifests older than those. Separated from
    commit so readers of recent snapshots are never pulled out from
    under — the standard retention contract."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    live = current_version(path)
    if live is None:
        return {"files_deleted": 0, "manifests_deleted": 0}
    mdir = os.path.join(path, _MANIFESTS)
    versions = sorted(
        int(f[1:9]) for f in os.listdir(mdir) if f.endswith(".json")
    )
    keep = [v for v in versions if v > live - keep_versions]
    referenced: set[str] = set()
    for v in keep:
        referenced |= {
            os.path.normpath(f)
            for fl in read_manifest(path, v)["files"].values()
            for f in fl
        }
    n_files = 0
    droot = os.path.join(path, _DATA)
    for dirpath, _, fnames in os.walk(droot):
        for fname in fnames:
            rel = os.path.normpath(
                os.path.relpath(os.path.join(dirpath, fname), path)
            )
            if rel not in referenced:
                os.remove(os.path.join(dirpath, fname))
                n_files += 1
    n_manifests = 0
    for v in versions:
        if v not in keep:
            os.remove(os.path.join(mdir, f"v{v:08d}.json"))
            n_manifests += 1
    return {"files_deleted": n_files, "manifests_deleted": n_manifests}
