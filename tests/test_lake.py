"""Mini-lake table format: atomic commits, snapshots, pruning, evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_tfdata_spark.lake.table import CommitConflict, LakeTable, Manifest

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path, name="t", buckets=4):
    return LakeTable.create(spark, str(tmp_path / name), SCHEMA, num_buckets=buckets)


def test_create_and_empty_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.read().count() == 0
    assert t.read().schema == SCHEMA
    assert t.current_version() == 1


def test_append_and_snapshot_isolation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], SCHEMA)
    t.append(df)
    v2 = t.current_version()
    t.append(spark.createDataFrame([("c", 3, "z")], SCHEMA))
    assert t.read().count() == 3
    # old snapshot still readable (time travel)
    assert t.read(version=v2).count() == 2


def test_commit_cas_conflict(spark, tmp_path):
    t = _mk(spark, tmp_path)
    m = t.snapshot()
    dup = Manifest(
        version=m.version, parent=m.parent, schema=m.schema, bucket_by=m.bucket_by,
        num_buckets=m.num_buckets, files=[], summary={}, timestamp=0.0,
    )
    with pytest.raises(CommitConflict):
        t._publish(dup)


def test_bucket_pruned_read(spark, tmp_path):
    t = _mk(spark, tmp_path, buckets=8)
    rows = [(f"c{i}", i, f"t{i}") for i in range(50)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    m = t.snapshot()
    buckets = sorted({f["bucket"] for f in m.files})
    assert len(buckets) > 1  # data actually spread over buckets
    one = t.read_buckets([buckets[0]])
    assert 0 < one.count() < 50


def test_schema_evolution_additive(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([("a", 1, "x")], SCHEMA))
    t.update_schema([T.StructField("tool_args", T.StringType(), True)])
    # old files read NULL for the new column
    df = t.read()
    assert "tool_args" in df.columns
    assert df.filter(F.col("tool_args").isNull()).count() == 1
    # new writes carry it
    t.append(
        spark.createDataFrame(
            [("b", 2, "y", "{}")],
            T.StructType(SCHEMA.fields + [T.StructField("tool_args", T.StringType(), True)]),
        )
    )
    assert t.read().filter(F.col("tool_args").isNotNull()).count() == 1
    # idempotent re-add is a no-op
    v = t.current_version()
    t.update_schema([T.StructField("tool_args", T.StringType(), True)])
    assert t.current_version() == v


def test_merge_lww_conditional(spark, tmp_path):
    """Late (older-order) source rows must not overwrite newer target rows."""
    phys = T.StructType(SCHEMA.fields + [T.StructField("v", T.LongType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "m"), phys, num_buckets=4)
    t.append(spark.createDataFrame([("a", 1, "new", 10), ("b", 2, "old", 1)], phys))
    src = spark.createDataFrame([("a", 1, "stale", 5), ("b", 2, "fresh", 7), ("c", 3, "ins", 2)], phys)
    t.merge_lww(src, key_cols=["conv_id", "turn_idx"], order_cols=["v"])
    got = {(r.conv_id, r.turn_idx): (r.text, r.v) for r in t.read().collect()}
    assert got == {("a", 1): ("new", 10), ("b", 2): ("fresh", 7), ("c", 3): ("ins", 2)}


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path, buckets=8)
    rows = [(f"c{i}", i, f"t{i}") for i in range(100)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    before = {f["path"]: f["bucket"] for f in t.snapshot().files}
    phys_src = spark.createDataFrame([("c1", 1, "updated")], SCHEMA)
    t.merge_lww(phys_src, key_cols=["conv_id", "turn_idx"], order_cols=["text"])
    after = t.snapshot()
    touched = set(after.summary["affected_buckets"])
    assert len(touched) == 1
    # files in untouched buckets are byte-identical (same path reused)
    untouched_before = {p for p, b in before.items() if b not in touched}
    after_paths = {f["path"] for f in after.files}
    assert untouched_before <= after_paths


def test_empty_merge_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.current_version()
    t.merge_lww(spark.createDataFrame([], SCHEMA), ["conv_id", "turn_idx"], ["text"])
    assert t.current_version() == v


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    t = _mk(spark, tmp_path, buckets=4)
    for i in range(4):  # several commits -> multiple files per bucket
        rows = [(f"c{j}", j, f"v{i}") for j in range(i * 10, i * 10 + 10)]
        t.append(spark.createDataFrame(rows, SCHEMA))
    before_files = len(t.snapshot().files)
    before = sorted((r.conv_id, r.turn_idx, r.text) for r in t.read().collect())
    v = t.current_version()
    t.compact()
    assert t.current_version() == v + 1
    after = sorted((r.conv_id, r.turn_idx, r.text) for r in t.read().collect())
    assert after == before
    assert len(t.snapshot().files) < before_files
    # time travel still sees the pre-compaction snapshot
    assert t.read(version=v).count() == len(before)


def test_compaction_purges_tombstones(spark, tmp_path):
    phys = T.StructType(SCHEMA.fields + [T.StructField("_deleted", T.BooleanType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "tp"), phys, num_buckets=2)
    t.append(spark.createDataFrame(
        [("a", 1, "x", False), ("b", 2, None, True), ("c", 3, "z", False)], phys))
    t.compact(purge_tombstones=True)
    rows = t.read().collect()
    assert {r.conv_id for r in rows} == {"a", "c"}


def test_vacuum_removes_old_versions_keeps_ledger(spark, tmp_path):
    t = _mk(spark, tmp_path, buckets=2)
    for i in range(5):
        t.append(spark.createDataFrame([(f"c{i}", i, "x")], SCHEMA),
                 summary={"job_id": "j", "epoch": i})
    n_rows = t.read().count()
    stats = t.vacuum(keep_versions=2)
    assert stats["removed_manifests"] > 0
    # current state unchanged
    assert t.read().count() == n_rows
    # ledger survives vacuum (exactly-once across maintenance)
    assert t.committed_epochs("j") == {0, 1, 2, 3, 4}
    # orphaned files (unpublished commit) get cleaned
    import os
    m = t._next_manifest({})
    t._write_data(spark.createDataFrame([("zz", 99, "orphan")], SCHEMA), m)  # never published
    before = t.read().count()
    stats2 = t.vacuum(keep_versions=2)
    assert stats2["removed_files"] > 0
    assert t.read().count() == before


def test_concurrent_writers_one_wins(spark, tmp_path):
    """Optimistic concurrency: two writers committing against the same
    parent version -> exactly one succeeds, the other gets CommitConflict
    and can retry against the new snapshot (no data corruption either way)."""
    t = _mk(spark, tmp_path, buckets=2)
    t.append(spark.createDataFrame([("a", 1, "x")], SCHEMA))
    # both writers prepare manifests from the same snapshot
    m1 = t._next_manifest({"writer": 1})
    m2 = t._next_manifest({"writer": 2})
    m1.files = m1.files + t._write_data(spark.createDataFrame([("b", 2, "y")], SCHEMA), m1)
    m2.files = m2.files + t._write_data(spark.createDataFrame([("c", 3, "z")], SCHEMA), m2)
    t._publish(m1)
    with pytest.raises(CommitConflict):
        t._publish(m2)
    # loser retries through the public API against the fresh snapshot
    t.append(spark.createDataFrame([("c", 3, "z")], SCHEMA))
    rows = {r.conv_id for r in t.read().collect()}
    assert rows == {"a", "b", "c"}
