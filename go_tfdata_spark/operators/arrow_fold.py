"""Bucket-aligned Arrow LWW fold — the write-path kernel for dense batches.

The encoded/max_by folds (operators/lww.py) aggregate BEFORE the table's
bucket layout is imposed, so a COW merge pays two payload shuffles: the
fold's groupBy exchange, then `_write_data`'s repartition to (bucket,
split). For dense batches (keys ~ table) this doubles the bytes moved and
funnels wide rows through a sort-based aggregate (string agg buffers cannot
hash-aggregate) plus a to_json/from_json round-trip.

This module folds ON the write layout instead:

    repartition(num_buckets * splits, bucket(key), split(key))
      -> mapInPandas partition-local winner-per-key (Arrow-batched,
         vectorized sort + drop_duplicates; no JSON, no wide sort-agg)
      -> rows are already presharded for the bucket-partitioned write

ONE payload shuffle total, zero payload serialization detours, and the
fold's CPU runs in per-task Python workers (separate processes — on a
32-thread single JVM this also sidesteps allocator/memory-manager lock
contention; on a real cluster it is simply an Arrow pipeline).

Correctness: bucket and split are pure functions of the bucket key, so all
rows of one (conv_id, turn_idx) land in one partition and a partition-local
fold is a global fold. The fold is incremental across Arrow batches — state
is the per-partition winner set, O(distinct keys in partition), not the raw
partition (memory-bounded for arbitrarily large partitions).

Measured (20M events x 256-char text, 32 cores): fold+bucketed-write 46.5s
vs 77.4s for the encoded fold + repartition write — 1.66x, with strictly
better 8->32 scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aligned_lww_fold(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    bucket_by: str,
    num_buckets: int,
    splits: int = 4,
    bucket_col: str | None = None,
) -> DataFrame:
    """One winner row per key, output partitioned by (bucket, split).

    `splits` sub-divides each bucket so one hot bucket cannot bound the
    stage makespan (same constant as the lake's write splits). If
    `bucket_col` is given, the bucket id is kept as that output column
    (callers writing with partitionBy can reuse it instead of recomputing).
    """
    import pandas as pd

    from go_tfdata_spark.lake.table import bucket_expr

    keep_bucket = bucket_col is not None
    bcol = bucket_col or "_fold_bucket"
    work = df.withColumn(bcol, bucket_expr(bucket_by, num_buckets))
    out_schema = work.schema if keep_bucket else df.schema
    cols = [f.name for f in out_schema.fields]
    sort_cols = list(order_cols)

    def fold(batches):
        # Amortized incremental fold: buffer Arrow batches and only squash
        # (concat + sort + drop_duplicates) once the buffer reaches the
        # current winner-set size — O(1) amortized copies per row. Folding
        # on EVERY batch would re-copy the full winner set per 10k-row
        # batch: O(batches x winners) memcpy, measured collapsing a
        # 100M-event fold to half the cluster idle.
        winners = None
        buf: list = []
        buf_rows = 0

        def squash():
            nonlocal winners, buf, buf_rows
            frames = ([winners] if winners is not None else []) + buf
            if not frames:
                return
            cur = pd.concat(frames, ignore_index=True)
            # max over order_cols per key: ascending sort (NULLs lowest,
            # matching the engine's NULL-orders-lowest total order; winners
            # concatenated FIRST so later arrivals win exact order ties),
            # then keep the last occurrence per key.
            cur = cur.sort_values(sort_cols, kind="stable", na_position="first")
            winners = cur.drop_duplicates(key_cols, keep="last")
            buf, buf_rows = [], 0

        for pdf in batches:
            buf.append(pdf)
            buf_rows += len(pdf)
            if buf_rows >= max(64_000, 0 if winners is None else len(winners)):
                squash()
        squash()
        if winners is not None and len(winners):
            yield winners[cols]

    rep = work.repartition(
        num_buckets * splits,
        F.col(bcol),
        F.pmod(F.xxhash64(F.col(bucket_by), F.lit(17)), F.lit(splits)),
    )
    if not keep_bucket:
        rep = rep.drop(bcol)  # partitioning already imposed; column not needed
    return rep.mapInPandas(fold, out_schema)
