"""Data model: schemas + feature-type mapping.

Mirrors the reference's data model (SURVEY.md §1):
- `Sample` (dynamic map row, tfdata/core/sample.go:10) -> an untyped change
  payload, either a MapType column or a JSON string parsed via `from_json`;
- `TFExample` (typed row over 6 feature kinds,
  tfdata/core/example.go:30-38, tfdata/internal/cmn/featuretype.go:19-26)
  -> a typed StructType target table;
- `TypesMap` per-field typing with bytes fallback
  (tfdata/core/example.go:40-46, tfdata/transform/transformer.go:120-204)
  -> explicit target schema + cast, unknown additive columns carried and
  promoted via a lake schema-update transaction.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# tf.Example feature-kind mapping (reference: cmn/featuretype.go:19-26).
# Scalars are 1-element lists in the reference (example.go:89-91); here the
# scalar/list distinction is a first-class Spark type instead.
# ---------------------------------------------------------------------------
INT64 = T.LongType()
INT64LIST = T.ArrayType(T.LongType())
FLOAT32 = T.FloatType()
FLOAT32LIST = T.ArrayType(T.FloatType())
BYTES = T.BinaryType()
BYTESLIST = T.ArrayType(T.BinaryType())

FEATURE_TYPES = {
    "int64": INT64,
    "int64_list": INT64LIST,
    "float32": FLOAT32,
    "float32_list": FLOAT32LIST,
    "bytes": BYTES,
    "bytes_list": BYTESLIST,
}

# Distinguished record-key field (reference: core/sample.go:5-7 `__key__`).
# In the CDC engine the key is the composite (conv_id, turn_idx).
KEY_COLUMNS = ("conv_id", "turn_idx")

# ---------------------------------------------------------------------------
# Target table: multi-turn conversation / agent transcripts
# (BASELINE.json input_hint).
# ---------------------------------------------------------------------------
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# CDC change-event stream (FIXTURES.md §2). The analog of the reference's
# unordered TAR member stream (archive/greedyreader.go:56-87): keyed
# fragments folded into final records.
# ---------------------------------------------------------------------------
CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # I / U / D
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("src_part", T.IntegerType(), False),
    ]
)

# Additive schema-evolution variant (FIXTURES.md §3): the engine must carry
# unknown new fields rather than fail — the reference's bytes-fallback stance
# (transform/transformer.go:135-142) made transactional.
CHANGES_V2_EXTRA = T.StructType(
    [
        T.StructField("tool_args", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

CHANGES_V2_SCHEMA = T.StructType(CHANGES_SCHEMA.fields + CHANGES_V2_EXTRA.fields)

# Exactly-once bookkeeping (FIXTURES.md §4).
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

# Per-partition lineage metrics (FIXTURES.md §5).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("src_part", T.IntegerType(), False),
        T.StructField("offsets_applied", T.LongType(), False),
        T.StructField("rows_upserted", T.LongType(), False),
        T.StructField("rows_deleted", T.LongType(), False),
        T.StructField("watermark", T.TimestampType(), True),
    ]
)

# Total LWW ordering: primary ts, then lsn, then source partition as the
# deterministic tiebreak (SURVEY.md §7 hard part 3). `op` never participates.
LWW_ORDER_COLUMNS = ("ts", "lsn", "src_part")

PAYLOAD_COLUMNS = ("role", "text", "tool")


def payload_columns(schema: T.StructType) -> list[str]:
    """Non-key, non-metadata columns of a change schema — the columns that
    flow into the target table (plus `ts`, which the target keeps as the
    event time of the last applied change)."""
    meta = {"op", "lsn", "epoch", "src_part", *KEY_COLUMNS}
    return [f.name for f in schema.fields if f.name not in meta]
