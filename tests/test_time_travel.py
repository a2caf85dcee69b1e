"""Snapshot-as-of-epoch reads: ledger-resolved version lookup, travel
window bounds under vacuum, and state equivalence vs per-epoch oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_tfdata_spark.lake.table import LakeTable
from go_tfdata_spark.model import TRANSCRIPTS_SCHEMA
from go_tfdata_spark.operators.merge import (
    create_transcripts_table,
    read_table,
    replay,
)
from go_tfdata_spark.sources.changes import synthetic_changes


@pytest.fixture()
def replayed(spark, tmp_path):
    changes = synthetic_changes(
        spark, n_events=800, n_epochs=4, delete_frac=0.15, late_frac=0.2, seed=11
    )
    table = create_transcripts_table(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA, num_buckets=4
    )
    replay(table, changes, job_id="tt")
    return table, changes


def _oracle_state(changes, upto_epoch):
    from pyspark.sql import Window

    ch = changes.filter(F.col("epoch") <= upto_epoch)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("ts"), F.desc("lsn"), F.desc("src_part")
    )
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("conv_id", "turn_idx", "text")
    )


def test_as_of_each_epoch_matches_truncated_fold(replayed):
    table, changes = replayed
    for epoch in range(4):
        got = read_table(table, as_of_epoch=epoch, job_id="tt").select(
            "conv_id", "turn_idx", "text"
        )
        want = _oracle_state(changes, epoch)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    # latest read == as-of the last epoch
    assert (
        read_table(table).count()
        == read_table(table, as_of_epoch=3, job_id="tt").count()
    )


def test_version_resolution_is_monotone_and_bounded(replayed):
    table, _ = replayed
    vs = [table.version_for_epoch("tt", e) for e in range(4)]
    assert vs == sorted(vs) and len(set(vs)) == 4  # one commit per epoch
    with pytest.raises(KeyError):
        table.version_for_epoch("tt", 99)
    with pytest.raises(KeyError):
        table.version_for_epoch("other-job", 0)


def test_param_validation(replayed):
    table, _ = replayed
    with pytest.raises(ValueError, match="job_id"):
        read_table(table, as_of_epoch=1)
    with pytest.raises(ValueError, match="not both"):
        read_table(table, version=2, as_of_epoch=1, job_id="tt")


def test_vacuum_bounds_the_travel_window(spark, tmp_path, replayed):
    table, _ = replayed
    before = len(table.retained_versions())
    table.vacuum(keep_versions=2, orphan_grace_sec=0.0)
    kept = table.retained_versions()
    assert len(kept) == 2 and len(kept) < before
    # early snapshots aged out; the newest epochs still travel
    with pytest.raises(KeyError):
        table.version_for_epoch("tt", 0)
    assert read_table(table, as_of_epoch=3, job_id="tt").count() > 0
