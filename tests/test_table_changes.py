"""Change data feed (table_changes): classification vs a brute-force
snapshot diff, per-epoch consistency (applying the feed to the previous
materialization reproduces the next state), and epoch-0 base behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_tfdata_spark.model import TRANSCRIPTS_SCHEMA
from go_tfdata_spark.operators.merge import (
    create_transcripts_table,
    read_table,
    replay,
    table_changes,
)
from go_tfdata_spark.sources.changes import synthetic_changes


@pytest.fixture()
def replayed(spark, tmp_path):
    changes = synthetic_changes(
        spark, n_events=900, n_epochs=3, delete_frac=0.2, late_frac=0.2, seed=13
    )
    table = create_transcripts_table(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA, num_buckets=4
    )
    replay(table, changes, job_id="cdf")
    return table, changes


def _state(table, epoch):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in read_table(table, as_of_epoch=epoch, job_id="cdf").collect()
    }


def test_feed_matches_snapshot_diff_every_epoch(replayed):
    table, _ = replayed
    prev: dict = {}
    for epoch in range(3):
        cur = _state(table, epoch)
        feed = {
            (r["conv_id"], r["turn_idx"]): (r["_change_type"], r["text"])
            for r in table_changes(table, "cdf", epoch).collect()
        }
        want = {}
        for k, txt in cur.items():
            if k not in prev:
                want[k] = ("insert", txt)
            elif prev[k] != txt:
                want[k] = ("update_postimage", txt)
        for k in prev:
            if k not in cur:
                want[k] = ("delete", feed.get(k, (None, None))[1])
        # text equality can false-negative an update (same text re-upserted
        # with a newer lsn is a real update_postimage): check the brute diff
        # is a SUBSET and every extra feed row is such an update
        for k, (ct, txt) in want.items():
            assert feed[k][0] == ct, (k, ct, feed.get(k))
            if ct != "delete":
                assert feed[k][1] == txt
        for k, (ct, _) in feed.items():
            assert ct == "update_postimage" or k in want
        prev = cur


def test_feed_applies_to_previous_materialization(replayed):
    """Consuming the feed must reproduce the next snapshot exactly — the
    downstream-materialization consistency contract."""
    table, _ = replayed
    for epoch in range(1, 3):
        mat = _state(table, epoch - 1)
        for r in table_changes(table, "cdf", epoch).collect():
            k = (r["conv_id"], r["turn_idx"])
            if r["_change_type"] == "delete":
                mat.pop(k, None)
            else:
                mat[k] = r["text"]
        assert mat == _state(table, epoch)


def test_bucket_pruning_scans_fewer_files_same_answer(spark, tmp_path):
    """A sparse epoch (one conv touched) must diff only that conv's bucket:
    identical feed, strictly fewer files scanned."""
    from go_tfdata_spark.operators.merge import apply_changes

    changes = synthetic_changes(
        spark, n_events=600, n_epochs=1, delete_frac=0.1, late_frac=0.0, seed=17
    )
    table = create_transcripts_table(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA, num_buckets=8
    )
    replay(table, changes, job_id="cdf")
    one_conv = changes.limit(1).collect()[0]["conv_id"]
    sparse = (
        changes.filter(F.col("conv_id") == one_conv)
        .limit(3)
        .withColumn("epoch", F.lit(1))
        .withColumn("lsn", F.col("lsn") + 10_000_000)
        .withColumn("op", F.lit("U"))
        # later ts than anything in epoch 0, so the updates WIN the fold
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    )
    apply_changes(table, sparse, job_id="cdf", epoch=1)
    pruned = table_changes(table, "cdf", 1)
    full = table_changes(table, "cdf", 1, prune_buckets=False)
    key = lambda r: (r["conv_id"], r["turn_idx"], r["_change_type"])  # noqa: E731
    assert sorted(map(key, pruned.collect())) == sorted(map(key, full.collect()))
    assert pruned.count() > 0
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def _tiny_table(spark, tmp_path, rows_by_epoch):
    """Build a table from hand-written change rows: list of per-epoch lists
    of (conv_id, turn_idx, text, ts_offset_sec, lsn, src_part, op)."""
    from go_tfdata_spark.operators.merge import apply_changes

    table = create_transcripts_table(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA, num_buckets=2
    )
    for epoch, rows in enumerate(rows_by_epoch):
        df = spark.createDataFrame(
            [(c, t, "user", txt, None, off, lsn, sp, op, epoch)
             for (c, t, txt, off, lsn, sp, op) in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, off long, lsn long, src_part int, op string, epoch int",
        ).withColumn(
            "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("off"))
        ).drop("off")
        apply_changes(table, df, job_id="cdf", epoch=epoch)
    return table


def test_update_detected_when_lsn_value_reused_across_src_parts(spark, tmp_path):
    """Per-source LSN sequences can reuse the same lsn value: a new winner
    with identical lsn but later (ts, src_part) is a real update, not a
    no-change (winner identity = full order tuple, not lsn alone)."""
    table = _tiny_table(spark, tmp_path, [
        [("c1", 0, "old", 0, 7, 0, "U")],
        [("c1", 0, "new", 60, 7, 1, "U")],  # same lsn=7, later ts -> wins
    ])
    feed = table_changes(table, "cdf", 1).collect()
    assert [(r["_change_type"], r["text"]) for r in feed] == [("update_postimage", "new")]


def test_update_detected_with_null_lsn(spark, tmp_path):
    """NULL lsn on either side must not NULL out the compare and drop the
    change row (null-safe full-tuple compare)."""
    table = _tiny_table(spark, tmp_path, [
        [("c1", 0, "old", 0, None, 0, "U")],
        [("c1", 0, "new", 60, None, 0, "U")],
    ])
    feed = table_changes(table, "cdf", 1).collect()
    assert [(r["_change_type"], r["text"]) for r in feed] == [("update_postimage", "new")]


def test_vacuumed_parent_raises_keyerror(spark, tmp_path):
    """Feed for an epoch whose PARENT snapshot was vacuumed raises the
    documented KeyError travel-window signal, not FileNotFoundError."""
    table = _tiny_table(spark, tmp_path, [
        [("c1", 0, "a", 0, 1, 0, "U")],
        [("c1", 0, "b", 60, 2, 0, "U")],
        [("c1", 0, "c", 120, 3, 0, "U")],
    ])
    table.vacuum(keep_versions=1, orphan_grace_sec=0.0)
    with pytest.raises(KeyError):
        table_changes(table, "cdf", 2)


def test_epoch0_is_all_inserts(replayed):
    table, _ = replayed
    types = (
        table_changes(table, "cdf", 0)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    assert {r["_change_type"] for r in types} == {"insert"}
    assert table_changes(table, "cdf", 0).count() == len(_state(table, 0))
