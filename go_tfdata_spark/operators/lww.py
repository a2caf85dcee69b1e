"""Last-writer-wins fold per key — the engine's central kernel.

Semantic ancestor: the reference's ``Rename`` transform where the *later*
source wins (tfdata/transform/transformation.go:58-66, iteration order =
declared order), generalized to CDC: per key ``(conv_id, turn_idx)``, the
change event with the greatest ``(ts, lsn, src_part)`` wins
(SURVEY.md §2.6, total-order tiebreak per §7 hard-part 3).

Physical strategies (fastest first):

- **encoded** (default when types allow): pack (order, payload) into ONE
  binary-comparable string — zero-padded sortable order prefix + JSON
  payload — and aggregate with ``max(string)``. Struct-valued aggregation
  buffers force Spark into SortAggregate, but a string buffer hash-
  aggregates: measured 3-4.5x faster than max_by on 10M wide rows, with
  map-side partial aggregation intact.
- **max_by**: ``max_by(struct(payload), struct(order))`` — SortAggregate
  (partial+final, still combines map-side); used when order columns are
  not sortably encodable or payload is not JSON-round-trippable (binary).
- ``lww_latest_window``: ``row_number() over (partition by key order by
  order desc) = 1``; full per-key sort, kept for comparison/benchmarks.

For pathological single-key skew beyond what map-side combine absorbs,
``salt_buckets`` splits each key into N sub-groups first (two-phase fold —
max is associative), complementing AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Offset making every supported numeric order value positive before
# zero-padding (string compare == numeric compare only without '-' signs).
_NUM_OFFSET = 10**18
_PAD = 20

# to_json's default timestampFormat truncates to milliseconds, which would
# corrupt sub-ms ts values round-tripped through the encoded fold (and ts is
# itself an LWW order column downstream). Microsecond format with explicit
# offset keeps the encode/decode pair lossless and session-TZ independent.
_JSON_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}

_JSON_SAFE = (
    T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.BooleanType, T.TimestampType, T.DateType,
    T.DecimalType,
)


def _encodable_order(dt: T.DataType) -> bool:
    return isinstance(
        dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.TimestampType, T.DateType)
    )


def _json_safe(dt: T.DataType) -> bool:
    if isinstance(dt, _JSON_SAFE):
        return True
    if isinstance(dt, T.ArrayType):
        return _json_safe(dt.elementType)
    if isinstance(dt, T.MapType):
        return isinstance(dt.keyType, T.StringType) and _json_safe(dt.valueType)
    if isinstance(dt, T.StructType):
        return all(_json_safe(f.dataType) for f in dt.fields)
    return False


def _order_key(df: DataFrame, order_cols: list[str]):
    parts = []
    types = {f.name: f.dataType for f in df.schema.fields}
    for c in order_cols:
        dt = types[c]
        if isinstance(dt, T.TimestampType):
            num = F.unix_micros(F.col(c))
        elif isinstance(dt, T.DateType):
            num = F.datediff(F.col(c), F.lit("1970-01-01")).cast("long")
        else:
            num = F.col(c).cast("long")
        # NULL orders lowest (matches struct-comparison NULLS FIRST-ish
        # behavior closely enough for a total order; engine order cols are
        # non-null by schema).
        parts.append(F.lpad(F.coalesce(num + _NUM_OFFSET, F.lit(0)).cast("string"), _PAD, "0"))
    return F.concat(*parts)


def lww_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    salt_buckets: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """One row per key: the row with the greatest (order_cols) tuple.

    Column order of the output matches the input. All non-key columns of
    the winning row are preserved. Ties beyond order_cols break on the
    winner's serialized payload bytes — deterministic; the engine's order
    columns are already a total order per key.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    types = {f.name: f.dataType for f in df.schema.fields}
    payload = [c for c in df.columns if c not in key_cols]

    # Strategy economics (measured at 40M rows): the encoded string fold
    # wins 3-4x for WIDE payloads (long text: one cheap binary compare vs
    # struct comparators over wide rows), but loses ~3x for NARROW payloads
    # (to_json + string building dominates). auto picks encoded only when
    # the payload carries variable-width columns.
    wide = any(
        isinstance(types[c], (T.StringType, T.BinaryType, T.ArrayType, T.MapType, T.StructType))
        for c in payload
    )
    use_encoded = strategy == "encoded" or (
        strategy == "auto"
        and wide
        and all(_encodable_order(types[c]) for c in order_cols)
        and all(_json_safe(types[c]) for c in payload)
    )
    if wide and not use_encoded and not (salt_buckets and salt_buckets > 1):
        # Wide payloads force max_by into SortAggregate; the two-phase
        # partial+final plan then sorts the wide rows TWICE, and a
        # dimension-sized parquet scan (a handful of splits under
        # maxPartitionBytes/openCost packing) serializes the first sort on
        # a few cores. A keyed repartition replaces the groupBy's own
        # exchange (same clustering, exchange count unchanged) and turns
        # the fold into ONE fully-parallel sort-aggregate: measured
        # 1.7s -> 0.86s on a 1M-row/4-split events scan at 32 cores.
        # Narrow all-numeric payloads keep the two-phase plan — their
        # fixed-width partial aggregation combines map-side cheaply and
        # measured faster without the repartition. Salted callers declared
        # a hot key: partial aggregation must stay ahead of any keyed
        # exchange.
        from go_tfdata_spark.operators.dedup import _ensure_parallelism

        try:
            df = _ensure_parallelism(df, *key_cols)
        except Exception:
            pass  # streaming/exotic plans: parallelism probe is best-effort
    if use_encoded:
        return _lww_encoded(df, key_cols, order_cols, payload, salt_buckets)
    return _lww_max_by(df, key_cols, order_cols, payload, salt_buckets)


def _lww_encoded(df, key_cols, order_cols, payload, salt_buckets):
    enc = F.concat(
        _order_key(df, order_cols), F.to_json(F.struct(*payload), _JSON_TS_OPTS)
    ).alias("_enc")
    prefix_len = _PAD * len(order_cols)
    payload_schema = T.StructType([df.schema[c] for c in payload])

    work = df.select(*key_cols, enc)
    if salt_buckets and salt_buckets > 1:
        salted = work.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("_enc")), F.lit(salt_buckets))
        )
        partial = salted.groupBy(*key_cols, "_salt").agg(F.max("_enc").alias("_enc"))
        final = partial.groupBy(*key_cols).agg(F.max("_enc").alias("_enc"))
    else:
        final = work.groupBy(*key_cols).agg(F.max("_enc").alias("_enc"))

    decoded = final.withColumn(
        "_r",
        F.from_json(
            F.substring(F.col("_enc"), prefix_len + 1, 1 << 30),
            payload_schema,
            _JSON_TS_OPTS,
        ),
    )
    out_cols = [F.col(c) if c in key_cols else F.col(f"_r.{c}").alias(c) for c in df.columns]
    return decoded.select(*out_cols)


def _lww_max_by(df, key_cols, order_cols, payload, salt_buckets):
    ord_expr = F.struct(*[F.col(c) for c in order_cols])
    win = F.max_by(F.struct(*[F.col(c) for c in payload]), ord_expr)

    if salt_buckets and salt_buckets > 1:
        # Two-phase fold: (key, salt) partial winners, then key winners.
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
