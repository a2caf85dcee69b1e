"""Change-stream sources.

The reference's sources are TAR/TGZ archives emitting an unordered stream of
keyed member fragments (tfdata/archive/tar.go:50-62, greedyreader.go:56-87);
ours are binlog/WAL-style change logs. Three entry points:

- `synthetic_changes` — a deterministic, fully distributed generator built
  from `spark.range` + hash expressions (every value is a pure JVM-side
  function of the row id and seed: no Python in the data path, no driver
  materialization — this is what lets the bench replay 10^8+ events).
  Analog of the reference's synthetic counter readers
  (test/common.go:16-50).
- `read_change_log` / `write_change_log` — batch parquet change logs.
- `read_change_stream` — Structured Streaming file source over a change-log
  directory (micro-batch = epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_tfdata_spark.model import CHANGES_SCHEMA


def _u(seed_col, salt: int) -> "F.Column":
    """Deterministic uniform [0, 1) from a row id — JVM-side xxhash64."""
    return (
        F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(1_000_000_007)).cast("double")
        / 1_000_000_007.0
    )


def synthetic_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int | None = None,
    turns_per_conv: int = 8,
    n_src_parts: int = 8,
    n_epochs: int = 4,
    delete_frac: float = 0.05,
    late_frac: float = 0.10,
    skew: float = 0.0,
    seed: int = 42,
    num_partitions: int | None = None,
    text_chars: int = 0,
) -> DataFrame:
    """Deterministic synthetic CDC stream over the transcripts key space.

    - `skew=0` -> uniform conv_id; `skew>0` -> power-law (Zipf-ish) hot keys
      (u**(1+skew) concentrates mass at low conv indexes), for salting tests.
    - `late_frac` of events carry a ts from an earlier window than their lsn
      / epoch position -> out-of-order arrivals across epochs (the analog of
      the reference's unordered emission, greedyreader.go:31-38).
    - lsn == row id (globally increasing); epoch = fixed-size lsn ranges.
    """
    if n_convs is None:
        n_convs = max(1, n_events // (turns_per_conv * 4))
    df = spark.range(0, n_events, numPartitions=num_partitions)
    i = F.col("id")

    u_conv = _u(i, seed * 7 + 1)
    conv_idx = F.least(
        F.floor(F.pow(u_conv, F.lit(1.0 + skew)) * n_convs).cast("long"),
        F.lit(n_convs - 1),
    )
    u_op = _u(i, seed * 7 + 2)
    late = _u(i, seed * 7 + 3) < F.lit(late_frac)
    # Late events get a ts displaced one epoch's worth of seconds backwards.
    epoch_span = max(1, n_events // max(n_epochs, 1))
    ts_sec = F.when(late, F.greatest(i - F.lit(int(1.5 * epoch_span)), F.lit(0))).otherwise(i)

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(F.xxhash64(i, F.lit(seed * 7 + 4)), F.lit(4)) + 1).cast("int"),
    )
    conv_id = F.concat(F.lit("c"), F.lpad(conv_idx.cast("string"), 8, "0"))
    turn_idx = F.pmod(F.xxhash64(i, F.lit(seed * 7 + 5)), F.lit(turns_per_conv)).cast("int")
    text = F.concat_ws("-", F.lit("text"), conv_id, turn_idx.cast("string"), i.cast("string"))
    if text_chars:
        # Realistic transcript turns: pad to ~text_chars with deterministic
        # filler (keeps the unique LWW-identifying prefix).
        text = F.rpad(text, text_chars, " lorem ipsum dolor sit amet consectetur adipiscing elit sed do")

    return df.select(
        F.when(u_op < F.lit(delete_frac), F.lit("D"))
        .when(u_op < F.lit(delete_frac) + 0.3, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        i.alias("lsn"),
        F.timestamp_seconds(F.lit(1735689600) + ts_sec).alias("ts"),  # 2025-01-01 UTC
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(
            role == "tool",
            F.concat(F.lit("tool"), F.pmod(F.xxhash64(i, F.lit(seed * 7 + 6)), F.lit(5)).cast("string")),
        ).alias("tool"),
        F.floor(i / F.lit(epoch_span)).cast("int").alias("epoch"),
        F.pmod(F.xxhash64(i, F.lit(seed * 7 + 7)), F.lit(n_src_parts)).cast("int").alias("src_part"),
    )


def with_v2_columns(changes: DataFrame) -> DataFrame:
    """Additive schema-evolution variant (FIXTURES.md §3): adds tool_args
    (JSON string) and meta (map<string,string>)."""
    return changes.withColumns(
        {
            "tool_args": F.when(
                F.col("tool").isNotNull(),
                F.to_json(F.struct(F.col("turn_idx").alias("arg"), F.col("lsn").alias("seq"))),
            ),
            "meta": F.create_map(F.lit("src"), F.col("src_part").cast("string")),
        }
    )


def write_change_log(changes: DataFrame, path: str, by_epoch: bool = True) -> None:
    """Persist a change log; `by_epoch=True` writes epoch=N/ dirs so the
    streaming file source picks up one epoch per micro-batch-ish chunk."""
    w = changes.write.mode("overwrite")
    if by_epoch:
        w = w.partitionBy("epoch")
    w.parquet(path)


def read_change_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CHANGES_SCHEMA).parquet(path)


def read_change_stream(
    spark: SparkSession, path: str, schema=CHANGES_SCHEMA, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Structured Streaming file source over a change-log directory."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.option("basePath", path).parquet(path)
