"""Last-writer-wins fold per key — the engine's central kernel.

Semantic ancestor: the reference's ``Rename`` transform where the *later*
source wins (tfdata/transform/transformation.go:58-66, iteration order =
declared order), generalized to CDC: per key ``(conv_id, turn_idx)``, the
change event with the greatest ``(ts, lsn, src_part)`` wins
(SURVEY.md §2.6, total-order tiebreak per §7 hard-part 3).

Two physical strategies:

- ``lww_latest`` (default): ``max_by(struct(payload), struct(order))`` hash
  aggregation. Partial aggregation (map-side combine) runs before the
  shuffle, so a key with 10^6 duplicate events ships ~1 row per map task —
  this is the strategy that survives 10^10 events with Zipf-skewed keys.
- ``lww_latest_window``: ``row_number() over (partition by key order by
  order desc) = 1``. Requires a full sort of every key group after the
  shuffle; kept for comparison/benchmarks and for callers that need ranks.

For pathological single-key skew beyond what map-side combine absorbs,
``salt_buckets`` splits each key into N sub-groups first (two-phase fold —
max-by is associative), complementing AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _winner_struct(df: DataFrame, key_cols: list[str]) -> "F.Column":
    payload = [c for c in df.columns if c not in key_cols]
    return F.struct(*[F.col(c) for c in payload]).alias("_w")


def lww_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    salt_buckets: int | None = None,
) -> DataFrame:
    """One row per key: the row with the greatest (order_cols) tuple.

    Column order of the output matches the input. All non-key columns of
    the winning row are preserved.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    payload = [c for c in df.columns if c not in key_cols]
    ord_expr = F.struct(*[F.col(c) for c in order_cols])
    win = F.max_by(F.struct(*[F.col(c) for c in payload]), ord_expr)

    if salt_buckets and salt_buckets > 1:
        # Two-phase fold: (key, salt) partial winners, then key winners.
        # The salt is derived from the order column so duplicates of one hot
        # key spread across `salt_buckets` reducers.
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
        )
        partial = salted.groupBy(*key_cols, "_salt").agg(win.alias("_w"))
        ord2 = F.struct(*[F.col(f"_w.{c}") for c in order_cols])
        final = partial.groupBy(*key_cols).agg(F.max_by(F.col("_w"), ord2).alias("_w"))
    else:
        final = df.groupBy(*key_cols).agg(win.alias("_w"))

    out_cols = [
        F.col(c) if c in key_cols else F.col(f"_w.{c}").alias(c) for c in df.columns
    ]
    return final.select(*out_cols)


def lww_latest_window(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Window-based LWW (row_number desc == 1). Same result, sort-based plan."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
