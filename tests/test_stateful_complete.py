"""Stateful completeness emission (S4/S7 analog) across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_tfdata_spark.model import CHANGES_SCHEMA
from go_tfdata_spark.sources.changes import read_change_stream, synthetic_changes
from go_tfdata_spark.streaming.complete import assemble_conversations_stream


def test_assembly_emits_on_completeness_across_batches(spark, tmp_path):
    # 6 conversations x exactly 4 turns, turns scattered across epoch files
    # so completeness happens across micro-batches (maxFilesPerTrigger=1)
    changes = synthetic_changes(
        spark, n_events=2000, n_convs=6, turns_per_conv=4, n_epochs=4,
        delete_frac=0.0, late_frac=0.0,
    )
    changes.write.partitionBy("epoch").parquet(str(tmp_path / "log"))
    stream = read_change_stream(spark, str(tmp_path / "log"), max_files_per_trigger=1)
    out = assemble_conversations_stream(stream, expected_turns=4)
    q = (
        out.writeStream.format("memory")
        .queryName("assembled")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM assembled").collect()
    # every conversation that reached 4 distinct turns emitted EXACTLY once
    convs = [r["conv_id"] for r in got]
    assert len(convs) == len(set(convs))
    full = {
        r[0]
        for r in changes.groupBy("conv_id")
        .agg(F.count_distinct("turn_idx").alias("n"))
        .filter("n >= 4")
        .collect()
    }
    assert set(convs) == full
    assert all(r["complete"] and r["n_turns"] == 4 for r in got)
    assert all(len(r["turns"]) == 4 for r in got)
