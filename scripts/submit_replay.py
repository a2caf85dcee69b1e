"""spark-submit entry point: replay a change log into a transcripts table.

The north rule's deployment surface — the SAME job, shipped as
`spark-submit --py-files go_tfdata_spark.zip scripts/submit_replay.py`,
run at two cluster sizes (N and 4N executors). In the sandbox the two
"cluster sizes" are `--master local[N]` / `local[4N]` (see
BENCH/BASELINE.md); on a real cluster the identical command line runs
unchanged with a YARN/K8s master. The engine package arrives via
--py-files (sc.addPyFile distribution), NOT via a driver-local install —
exactly how a multi-executor cluster receives it.

Build the zip:   python scripts/submit_replay.py --make-zip /tmp/e.zip
Run:             spark-submit --master local[8] --py-files /tmp/e.zip \
                     scripts/submit_replay.py --table /x/t --log /x/log \
                     --job-id j --create

Prints one JSON line: {"events": N, "sec": ..., "events_per_sec": ...,
"epochs": [...], "version": V}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile


def make_zip(out_path: str) -> str:
    """Package go_tfdata_spark into a --py-files-able zip."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(pkg_root, "go_tfdata_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(src):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, pkg_root))
    return out_path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--make-zip", help="write the --py-files zip and exit")
    p.add_argument("--table", help="lake table path")
    p.add_argument("--log", help="parquet change-log path")
    p.add_argument("--job-id", default="submit")
    p.add_argument("--create", action="store_true",
                   help="create the table if absent (idempotent across resubmits)")
    p.add_argument("--num-buckets", type=int, default=16)
    p.add_argument("--merge-strategy", default="auto")
    p.add_argument("--stream", action="store_true",
                   help="Structured Streaming ingest (readStream + foreachBatch) "
                        "instead of batch replay; requires --checkpoint")
    p.add_argument("--checkpoint", help="streaming checkpoint dir (--stream)")
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument("--die-after-batches", type=int, default=0,
                   help="crash-inject: os._exit after N applied batches, "
                        "BETWEEN the lake commit and Spark's checkpoint "
                        "commit (tests the exactly-once resume window)")
    args = p.parse_args()

    if args.make_zip:
        print(make_zip(args.make_zip))
        return
    if not (args.table and args.log):
        p.error("--table and --log are required (or --make-zip)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    # Imports AFTER the session exists: the package resolves from the
    # --py-files zip that spark-submit registered on the context.
    from go_tfdata_spark.lake.table import LakeTable
    from go_tfdata_spark.model import TRANSCRIPTS_SCHEMA
    from go_tfdata_spark.operators.merge import create_transcripts_table, replay
    from go_tfdata_spark.sources.changes import read_change_log

    try:
        table = LakeTable.load(spark, args.table)
    except FileNotFoundError:
        if not args.create:
            raise
        table = create_transcripts_table(
            spark, args.table, TRANSCRIPTS_SCHEMA, num_buckets=args.num_buckets
        )
    if args.stream:
        if not args.checkpoint:
            p.error("--stream requires --checkpoint")
        from pyspark.sql import functions as F

        from go_tfdata_spark.operators.merge import lineage_metrics
        from go_tfdata_spark.sources.changes import read_change_stream
        from go_tfdata_spark.streaming.apply import start_ingest

        applied: list[int] = []
        skipped: list[int] = []

        def on_batch(r) -> None:
            (skipped if r.skipped else applied).append(r.epoch)
            if args.die_after_batches and len(applied) >= args.die_after_batches:
                os._exit(137)  # hard crash: checkpoint commit never happens

        q = start_ingest(
            table,
            read_change_stream(spark, args.log,
                               max_files_per_trigger=args.max_files_per_trigger),
            job_id=args.job_id, checkpoint_dir=args.checkpoint,
            merge_strategy=args.merge_strategy, on_batch=on_batch,
        )
        q.awaitTermination()  # availableNow: drains then stops
        lm = lineage_metrics(table, args.job_id)
        total = lm.agg(F.sum("offsets_applied")).first()[0]
        out = {
            "mode": "stream",
            "applied_epochs": applied,
            "skipped_epochs": skipped,
            "offsets_total": int(total or 0),
            "committed": sorted(table.committed_epochs(args.job_id)),
            "version": table.current_version(),
        }
        print(json.dumps(out))
        sys.stdout.flush()
        return

    log = read_change_log(spark, args.log)
    n_events = log.count()
    t0 = time.time()
    results = replay(table, log, job_id=args.job_id,
                     merge_strategy=args.merge_strategy)
    dt = time.time() - t0
    out = {
        "events": n_events,
        "sec": round(dt, 3),
        "events_per_sec": round(n_events / dt) if dt > 0 else None,
        "epochs": [r.epoch for r in results],
        "skipped": [r.epoch for r in results if r.skipped],
        "version": table.current_version(),
    }
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
