"""The north rule's deployment surface: the SAME job via `spark-submit
--py-files <engine.zip>` — the package reaches the job through the zip,
not a driver-local install, exactly as a multi-executor cluster run.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from go_tfdata_spark.operators.merge import read_table
from go_tfdata_spark.sources.changes import synthetic_changes, write_change_log
from tests.oracle import assert_final_state_equal, sequential_apply

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    cand = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay(spark, tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_replay.py"),
         "--make-zip", zip_path],
        capture_output=True, text=True, check=True,
    )
    assert os.path.getsize(zip_path) > 10_000

    changes = synthetic_changes(spark, n_events=1500, n_epochs=2,
                                delete_frac=0.1, late_frac=0.2, seed=31)
    log_path = str(tmp_path / "log")
    write_change_log(changes, log_path)
    table_path = str(tmp_path / "t")

    # Child env WITHOUT the repo on PYTHONPATH: the import must come from
    # the --py-files zip, proving the cluster-shipping path works.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    cmd = [
        _spark_submit(), "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_replay.py"),
        "--table", table_path, "--log", log_path,
        "--job-id", "sub", "--create", "--num-buckets", "4",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(tmp_path), timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert out["events"] == 1500
    assert out["epochs"] == [0, 1] and out["skipped"] == []

    # Final state equals the sequential per-event oracle.
    from go_tfdata_spark.lake.table import LakeTable
    from go_tfdata_spark.operators import merge as M

    table = LakeTable.load(spark, table_path)
    oracle = sequential_apply(changes.toPandas(), ["role", "text", "tool", "ts"])
    assert_final_state_equal(read_table(table), oracle)

    # Re-submitting the identical job is exactly-once: every epoch skips.
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert out2["skipped"] == [0, 1]
    assert out2["version"] == out["version"]


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_stream_kill_resume(spark, tmp_path):
    """Checkpoint + ledger exactly-once OFF the driver process: a streaming
    ingest launched via spark-submit --py-files is hard-killed between a
    batch's lake commit and its Spark checkpoint commit (the at-least-once
    window), then resumed on the same checkpoint. The resumed run must skip
    the already-committed batch via the ledger; final state equals the
    sequential oracle and every event is lineage-counted exactly once."""
    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_replay.py"),
         "--make-zip", zip_path],
        capture_output=True, text=True, check=True,
    )
    n_events = 1500
    changes = synthetic_changes(spark, n_events=n_events, n_epochs=3,
                                delete_frac=0.1, late_frac=0.2, seed=33,
                                num_partitions=1)
    log_path = str(tmp_path / "slog")
    write_change_log(changes, log_path)
    table_path, ckpt = str(tmp_path / "st"), str(tmp_path / "ckpt")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    base = [
        _spark_submit(), "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_replay.py"),
        "--table", table_path, "--log", log_path, "--checkpoint", ckpt,
        "--job-id", "ks", "--create", "--num-buckets", "4", "--stream",
    ]
    # Run 1: crash-injected after 2 applied batches (os._exit(137) in the
    # foreachBatch hook — before Spark's checkpoint commit for that batch).
    r1 = subprocess.run(base + ["--die-after-batches", "2"],
                        capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=300)
    assert r1.returncode != 0  # it died mid-stream, as injected

    # Run 2: resume on the same checkpoint, drain to completion.
    r2 = subprocess.run(base, capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    # The batch whose checkpoint commit the crash swallowed was re-executed
    # by Spark and SKIPPED by the ledger — never double-applied.
    assert out["skipped_epochs"], out
    assert not set(out["applied_epochs"]) & set(out["skipped_epochs"])
    # ledger is gapless and covers every batch
    assert out["committed"] == list(range(len(out["committed"])))
    assert set(out["committed"]) == set(out["applied_epochs"]) | set(out["skipped_epochs"]) | {0, 1}
    # every source event lineage-counted exactly once across both runs
    assert out["offsets_total"] == n_events

    from go_tfdata_spark.lake.table import LakeTable

    table = LakeTable.load(spark, table_path)
    oracle = sequential_apply(changes.toPandas(), ["role", "text", "tool", "ts"])
    assert_final_state_equal(read_table(table), oracle)


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_feed_consume_kill_resume(spark, tmp_path):
    """Exactly-once CONSUMPTION of the go_tfdata_cdf stream, off the driver
    process: a spark-submit consumer is hard-killed inside the at-least-once
    window (sink written, Spark checkpoint commit swallowed), more epochs
    are committed to the table, then the consumer resumes on the same
    checkpoint. Spark must redeliver the swallowed batch under the SAME
    batchId (the idempotent sink overwrites in place) and then advance to
    the new epochs — each epoch's rows land in the sink exactly once and
    match the batch range feed."""
    import pyspark.sql.functions as F

    from go_tfdata_spark.lake.table import LakeTable
    from go_tfdata_spark.model import TRANSCRIPTS_SCHEMA
    from go_tfdata_spark.operators.merge import (
        apply_changes,
        create_transcripts_table,
        replay,
        table_changes_range,
    )

    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_replay.py"),
         "--make-zip", zip_path],
        capture_output=True, text=True, check=True,
    )
    table_path = str(tmp_path / "t")
    table = create_transcripts_table(spark, table_path, TRANSCRIPTS_SCHEMA,
                                     num_buckets=4)
    changes = synthetic_changes(spark, n_events=900, n_epochs=3,
                                delete_frac=0.1, late_frac=0.2, seed=41)
    replay(table, changes, job_id="j")

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "fckpt")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    base = [
        _spark_submit(), "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_replay.py"),
        "--consume-feed", "--table", table_path, "--sink", sink,
        "--checkpoint", ckpt, "--job-id", "j",
    ]
    # Run 1: dies inside batch 0's foreachBatch, after the sink write —
    # Spark's checkpoint commit for that batch never happens.
    r1 = subprocess.run(base + ["--die-in-batch", "0"],
                        capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=300)
    assert r1.returncode != 0

    # A new epoch lands on the table while the consumer is down.
    extra = synthetic_changes(spark, n_events=300, n_epochs=1,
                              delete_frac=0.1, late_frac=0.2, seed=42)
    apply_changes(table, extra.withColumn("epoch", F.lit(3)), "j", epoch=3)

    # Run 2: resume from Spark's offset log on the same checkpoint. Spark
    # REdelivers the swallowed batch under the SAME batchId; the recovered
    # batch completes this availableNow trigger (wrapper semantics), so
    # epoch 3 arrives on the NEXT trigger — run 3.
    r2 = subprocess.run(base, capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    b0 = [a for a in out2["attempts"] if a["batch_id"] == 0]
    assert len(b0) == 2 and b0[0]["epochs"] == b0[1]["epochs"], out2["attempts"]

    r3 = subprocess.run(base, capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=300)
    assert r3.returncode == 0, r3.stderr[-3000:]
    out = json.loads([l for l in r3.stdout.splitlines() if l.startswith("{")][-1])
    delivered_epochs = sorted(
        {e for a in out["attempts"] for e in a["epochs"]}
    )
    assert delivered_epochs == [0, 1, 2, 3]

    # Sink rows == batch range feed rows, each epoch exactly once.
    table = LakeTable.load(spark, table_path)
    want = table_changes_range(table, "j", 0, 3)
    got = spark.read.parquet(*[os.path.join(sink, d) for d in out["batch_dirs"]])
    key = lambda r: (r["conv_id"], r["turn_idx"], r["_commit_epoch"],  # noqa: E731
                     r["_change_type"], r["text"], r["ts"])
    got_keys = [key(r) for r in got.collect()]
    assert len(got_keys) == len(set(got_keys))  # no row delivered twice
    assert set(got_keys) == {key(r) for r in want.collect()}
