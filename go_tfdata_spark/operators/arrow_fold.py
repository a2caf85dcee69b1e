"""Bucket-aligned Arrow LWW fold — the write-path kernel for dense batches.

The encoded/max_by folds (operators/lww.py) aggregate BEFORE the table's
bucket layout is imposed, so a COW merge pays two payload shuffles: the
fold's groupBy exchange, then `_write_data`'s repartition to (bucket,
split). For dense batches (keys ~ table) this doubles the bytes moved and
funnels wide rows through a sort-based aggregate (string agg buffers cannot
hash-aggregate) plus a to_json/from_json round-trip.

This module folds ON the write layout instead:

    repartition(num_buckets * splits, bucket(key), split(key))
      -> mapInArrow partition-local winner-per-key (stable Arrow sort +
         group_by max-position; no JSON, no wide sort-agg)
      -> rows are already presharded for the bucket-partitioned write

ONE payload shuffle total, zero payload serialization detours, and the
fold's CPU runs in per-task Python workers (separate processes — on a
32-thread single JVM this also sidesteps allocator/memory-manager lock
contention; on a real cluster it is simply an Arrow pipeline).

The fold is pyarrow end-to-end (mapInArrow), never pandas: the Arrow->
pandas conversion silently widens nullable int64 to float64, corrupting
payload values above 2^53 whenever a tombstone nulls a bigint column in
the same partition. Staying in Arrow keeps every column's physical type
bit-exact through the fold.

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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Incremental-fold squash floor (rows buffered before a concat+sort+dedup
# pass). 512k keeps typical write-layout partitions to ONE final sort
# (measured: repeated interim squashes cost ~2x the fold CPU at 32
# threads) while bounding memory at O(max(floor, winners)) rows for
# pathological partitions. Env knob for A/B runs (round 3 used 64k).
_SQUASH_FLOOR = int(os.environ.get("SPARK_GRAFT_SQUASH_FLOOR", "512000"))


def _winner_table(tbl, key_cols: list[str], sort_cols: list[str]):
    """Keep the last-per-key row of a stable ascending sort (NULLs lowest).

    Pure pyarrow, and payload-oblivious until the very end: the sort and
    the per-key argmax run on a SLIM (key, order) projection — the wide
    payload columns are gathered exactly once, for the winner rows only
    (vs sorting/taking the full table: measured 1.45x faster at 600k rows
    of 256-char text). Later concat positions win exact order ties via the
    stable sort + max-rank, matching the engine's arrival-order tiebreak
    for equal (ts, lsn, src_part).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    slim = tbl.select(key_cols + sort_cols)
    idx = pc.sort_indices(
        slim,
        sort_keys=[(c, "ascending") for c in sort_cols],
        null_placement="at_start",
    )
    keys_sorted = slim.select(key_cols).take(idx)
    rank_name = "__rank__"
    while rank_name in keys_sorted.column_names:
        rank_name = "_" + rank_name
    keyed = keys_sorted.append_column(
        rank_name, pa.array(np.arange(len(tbl)), pa.int64())
    )
    win_rank = keyed.group_by(key_cols, use_threads=False).aggregate(
        [(rank_name, "max")]
    )[f"{rank_name}_max"]
    return tbl.take(pc.take(idx, win_rank))


def _conform_arrow(tbl, pa_schema):
    """Conform a parquet-read Arrow table to the fold's Arrow schema:
    reorder, drop extras, null-fill columns the file predates (additive
    schema evolution), and cast physical types — Spark writes timestamps
    as INT96/naive-ns while the fold schema carries timestamp[us, tz=UTC];
    the cast is a unit/annotation change on the same UTC-epoch int64s,
    verified lossless either direction."""
    import pyarrow as pa

    cols = []
    names = set(tbl.column_names)
    for field in pa_schema:
        if field.name in names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.chunked_array([pa.nulls(len(tbl), field.type)]))
    return pa.Table.from_arrays(cols, schema=pa_schema)


_PARTITION_MAP_CACHE: dict[int, dict[int, int]] = {}


def fold_partition_map(spark, n_partitions: int) -> dict[int, int]:
    """Partition index each pid in [0, n_partitions) lands in under
    ``repartition(n_partitions, col(pid))`` — HashPartitioning is
    pmod(murmur3(pid), n), evaluated HERE with the engine's own `hash()`
    expression on the same long type, so the driver-side mapping can never
    drift from Spark's partitioner. Murmur3 is deterministic, so the map
    is cached per table layout (one tiny job per process, not per epoch)."""
    cached = _PARTITION_MAP_CACHE.get(n_partitions)
    if cached is not None:
        return cached
    df = spark.range(n_partitions).select(F.col("id").alias("pid"))
    rows = df.select(
        "pid", F.pmod(F.hash(F.col("pid")), F.lit(n_partitions)).alias("p")
    ).collect()
    out = {int(r["pid"]): int(r["p"]) for r in rows}
    _PARTITION_MAP_CACHE[n_partitions] = out
    return out


def aligned_lww_fold(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    bucket_by: str,
    num_buckets: int,
    splits: int = 4,
    bucket_col: str | None = None,
    batch_flag_col: str | None = None,
    lineage_acc=None,
    all_batch: bool = False,
    src_part_col: str = "_src_part",
    deleted_col: str = "_deleted",
    target_files: dict[int, list[str]] | None = None,
    stream_batch: bool = False,
) -> DataFrame:
    """One winner row per key, output partitioned by (bucket, split).

    `splits` sub-divides each bucket so one hot bucket cannot bound the
    stage makespan (same constant as the lake's write splits). If
    `bucket_col` is given, the bucket id is kept as that output column
    (callers writing with partitionBy can reuse it instead of recomputing).

    Lineage piggyback: with `batch_flag_col` (a boolean column of `df`
    marking change-batch rows vs carried target rows) and `lineage_acc`
    (a per-partition-replace dict accumulator), each fold task ALSO folds
    the slim (key, order, src_part, deleted) projection of the batch rows
    and reports winner-op counts per (src_part, deleted) — the per-source
    lineage metrics ride the merge's own shuffle instead of costing a
    separate scan+shuffle job per replay (measured ~30% of replay wall).
    The slim fold must stay separate from the main fold: a batch row that
    loses its key to a carried target row is still the BATCH winner for
    that key (the lineage contract counts what the batch itself resolves
    to), so batch rows compete among themselves. Counts are keyed by
    partition id and REPLACED, not summed, on merge, so task retries/
    speculation cannot double-count. The flag column is dropped from the
    output.

    `all_batch=True` (the MOR path: EVERY input row is a change-batch row)
    derives the counts from the already-computed winner table instead of
    maintaining a second slim fold whose input equals the main fold's —
    no flag column, no duplicated sort/group work per task.

    `target_files` ({partition index: [parquet paths]}) is the
    TARGET-LOCAL merge: carried target rows are not unioned/shuffled at
    all — each fold task reads the files whose (bucket, split) hashes to
    its own partition straight from storage (pyarrow, inside the Python
    worker that folds them). Table files hold exactly one (bucket, split)
    each (`_write_data` layout invariant), so a file's keys colocate with
    the shuffled batch rows of the same partition by construction; the
    mapping comes from `fold_partition_map`. With it, `stream_batch=True`
    marks every SHUFFLED row as a change-batch row for the lineage fold
    (no flag column needed — target rows arrive only via local reads).
    """
    import pyarrow as pa

    from go_tfdata_spark.lake.table import bucket_expr, split_expr

    keep_bucket = bucket_col is not None
    bcol = bucket_col or "_fold_bucket"
    work = df.withColumn(bcol, bucket_expr(bucket_by, num_buckets))
    out_fields = [
        f for f in (work.schema if keep_bucket else df.schema).fields
        if f.name != batch_flag_col
    ]
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType

    out_schema = StructType(out_fields)
    pa_schema = pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType)) for f in out_fields]
    )
    cols = [f.name for f in out_fields]
    sort_cols = list(order_cols)
    slim_cols = list(dict.fromkeys([*key_cols, *sort_cols, src_part_col, deleted_col]))

    def fold(batches):
        from pyspark import TaskContext

        # Amortized incremental fold: buffer Arrow batches and only squash
        # (concat + sort + dedup) once the buffer reaches the current
        # winner-set size — O(1) amortized copies per row. Folding on EVERY
        # batch would re-copy the full winner set per 10k-row batch:
        # O(batches x winners) memcpy, measured collapsing a 100M-event
        # fold to half the cluster idle. The 512k-row floor keeps typical
        # write-layout partitions (a few hundred MB) to ONE final sort —
        # repeated interim squashes measured ~2x the fold CPU at 32
        # threads — while still bounding memory for pathological
        # partitions at O(max(floor, winners)) rows.
        winners = None  # pa.Table
        buf: list = []
        buf_rows = 0
        bwin = None  # slim winners among batch rows (lineage fold)
        bbuf: list = []
        bbuf_rows = 0

        # target-local merge: load this partition's carried target files
        # before streaming the shuffled batch rows (order is irrelevant to
        # the fold — ties on the full order tuple mean identical events)
        if target_files:
            import pyarrow.parquet as pq

            pid0 = TaskContext.get().partitionId()
            for path in target_files.get(pid0, []):
                t = _conform_arrow(pq.read_table(path), pa_schema)
                if len(t):
                    buf.append(t)
                    buf_rows += len(t)

        def squash():
            nonlocal winners, buf, buf_rows, bwin, bbuf, bbuf_rows
            tables = ([winners] if winners is not None else []) + buf
            if tables:
                # promote: shuffled batches arrive with not-null fields,
                # locally-read target tables with nullable ones — same
                # physical types, metadata-only unification
                cur = pa.concat_tables(tables, promote_options="default")
                winners = _winner_table(cur, key_cols, sort_cols)
                buf, buf_rows = [], 0
            btables = ([bwin] if bwin is not None else []) + bbuf
            if btables:
                bcur = pa.concat_tables(btables)
                bwin = _winner_table(bcur, key_cols, sort_cols)
                bbuf, bbuf_rows = [], 0

        for rb in batches:
            t_full = pa.Table.from_batches([rb])
            if batch_flag_col is not None:
                flagged = t_full.filter(t_full[batch_flag_col]).select(slim_cols)
                if len(flagged):
                    bbuf.append(flagged)
                    bbuf_rows += len(flagged)
            elif stream_batch and lineage_acc is not None and len(t_full):
                # local-target mode: every shuffled row IS a batch row
                bbuf.append(t_full.select(slim_cols))
                bbuf_rows += len(t_full)
            t = t_full.select(cols)
            buf.append(t)
            buf_rows += len(t)
            if buf_rows >= max(_SQUASH_FLOOR, 0 if winners is None else len(winners)):
                squash()
        squash()
        count_src = None
        if lineage_acc is not None:
            # all_batch: the winner table IS the batch winner set — count it
            # directly instead of having folded a duplicate slim projection.
            count_src = winners if all_batch else bwin
        if count_src is not None and len(count_src):
            grp = count_src.select([src_part_col, deleted_col]).group_by(
                [src_part_col, deleted_col], use_threads=False
            ).aggregate([([], "count_all")])
            counts = {}
            for sp, dl, n in zip(
                grp[src_part_col].to_pylist(),
                grp[deleted_col].to_pylist(),
                grp["count_all"].to_pylist(),
            ):
                counts[(int(sp), bool(dl))] = int(n)
            pid = TaskContext.get().partitionId()
            lineage_acc.add({pid: counts})
        if winners is not None and len(winners):
            yield from winners.select(cols).to_batches(max_chunksize=65_536)

    # Partition on ONE long pid = bucket*splits + split (not the (bucket,
    # split) column pair): a single-column HashPartitioning is the form
    # `fold_partition_map` can reproduce driver-side, which is what lets
    # merge_aligned route each target file to the fold task that owns its
    # keys. Still a pure function of the bucket key, so co-location and
    # skew-splitting are unchanged.
    pid_col = "_fold_pid"
    while pid_col in work.columns:
        pid_col = "_" + pid_col
    rep = work.withColumn(
        pid_col,
        (F.col(bcol).cast("long") * F.lit(splits)
         + split_expr(bucket_by, splits).cast("long")),
    ).repartition(num_buckets * splits, F.col(pid_col)).drop(pid_col)
    if not keep_bucket:
        rep = rep.drop(bcol)  # partitioning already imposed; column not needed
    return rep.mapInArrow(fold, out_schema)


class PartitionReplaceAccum:
    """AccumulatorParam for {partition_id: value} maps where merge REPLACES
    per key — deterministic per-partition results make task retries and
    speculative duplicates idempotent instead of double-counted."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        a.update(b)
        return a


def lineage_accumulator(spark):
    from pyspark.accumulators import AccumulatorParam

    class _P(AccumulatorParam):
        zero = PartitionReplaceAccum.zero
        addInPlace = PartitionReplaceAccum.addInPlace

    return spark.sparkContext.accumulator({}, _P())


def fold_lineage_counts(acc_value: dict) -> dict:
    """Sum the per-partition {(src_part, deleted): n} maps into one."""
    total: dict = {}
    for counts in acc_value.values():
        for k, n in counts.items():
            total[k] = total.get(k, 0) + n
    return total
