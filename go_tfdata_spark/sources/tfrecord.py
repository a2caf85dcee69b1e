"""TFRecord file format: distributed write + read (reference parity).

The reference's native sink/source is the TFRecord framing —
8-byte LE length, masked CRC32-C of the length, payload, masked CRC32-C of
the payload (tfdata/core/tfrecord.go:60-88 write, :195-236 read), with the
mask ((crc>>15 | crc<<17) + 0xa282ead8) from internal/checksum/crc.go:28-31.
The engine's primary sink is the lake table; this module exists so users of
the reference's TFRecord round-trip (doc.go:12-29) can keep that path:

- `write_tfrecords(df, dir)` — each partition writes one .tfrecord file (the
  distributed analog of WriteMessagesAsync's unordered parallel sink,
  tfrecord.go:124-180). The row->JSON payload serialization runs JVM-side
  (`F.to_json`, whole-stage codegen); Python only frames ready-made byte
  payloads at Arrow-batch level inside `mapInPandas` — no per-row Python,
  no df.rdd. (The engine's payload is transcripts, not tf.Example protos —
  the framing and checksums are format-exact; for protobuf Example payloads
  see sources/tfexample.py.)
- `read_tfrecords(spark, dir)` — parallel `binaryFile` read + frame/CRC
  verification in an Arrow-batched unframe, then JVM-side `from_json`
  (dual of TFRecordReader.ReadNext, tfrecord.go:207-236).

Format knowledge is public (TensorFlow documentation of TFRecord framing).
"""

from __future__ import annotations

import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Lossless, session-TZ-independent timestamp round-trip (same rationale as
# operators/lww.py:_JSON_TS_OPTS — the default format truncates to ms).
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}

_MASK_DELTA = 0xA282EAD8
_CASTAGNOLI_POLY = 0x82F63B78


def _crc32c_table():
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (_CASTAGNOLI_POLY if crc & 1 else 0)
        table.append(crc)
    return table


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    """The TFRecord masked checksum (crc.go:28-31): not plain crc32c, so
    Spark's built-in F.crc32 (zlib polynomial) cannot stand in."""
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def frame_record(payload: bytes) -> bytes:
    """tfrecord.go:64-88: len(8LE) + maskedcrc(len) + payload + maskedcrc(payload)."""
    length = struct.pack("<Q", len(payload))
    return (
        length
        + struct.pack("<I", masked_crc(length))
        + payload
        + struct.pack("<I", masked_crc(payload))
    )


def unframe_records(blob: bytes, verify: bool = True):
    """Iterate (payload) frames; raises on CRC mismatch like tfrecord.go:216-233."""
    off = 0
    n = len(blob)
    while off < n:
        if off + 12 > n:
            raise ValueError("truncated frame header")
        length_bytes = blob[off : off + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (len_crc,) = struct.unpack("<I", blob[off + 8 : off + 12])
        if verify and masked_crc(length_bytes) != len_crc:
            raise ValueError(f"length CRC mismatch at offset {off}")
        start = off + 12
        payload = blob[start : start + length]
        if len(payload) != length:
            raise ValueError("truncated payload")
        (data_crc,) = struct.unpack("<I", blob[start + length : start + length + 4])
        if verify and masked_crc(payload) != data_crc:
            raise ValueError(f"payload CRC mismatch at offset {off}")
        yield payload
        off = start + length + 4


def write_tfrecords(df: DataFrame, out_dir: str) -> int:
    """Distributed TFRecord sink: one file per partition, unordered across
    partitions (the reference's async sink is explicitly unordered,
    tfrecord.go:170-175 — equality checks must be order-insensitive).
    Returns number of files written.

    Plan shape: row -> JSON happens in Catalyst (`to_json(struct(*))`,
    codegen'd, binary base64 / timestamps microsecond-exact); the Arrow
    batches that reach Python already hold finished payload strings, and the
    Python stage only frames bytes + writes the shard — batch-level work
    proportional to output bytes, not row-decode cost."""
    os.makedirs(out_dir, exist_ok=True)
    payloads = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns]), _JSON_OPTS).alias("json")
    )

    def write_partition(batches):
        import pandas as pd

        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.tfrecord")
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                f.write(
                    b"".join(frame_record(s.encode("utf-8")) for s in pdf["json"])
                )
                n += len(pdf)
        if n == 0:
            os.unlink(path)
        yield pd.DataFrame({"n": [n]})

    counts = payloads.mapInPandas(write_partition, "n long").collect()
    return sum(1 for r in counts if r.n > 0)


def read_tfrecords(spark: SparkSession, in_dir: str, schema: T.StructType | None = None) -> DataFrame:
    """Parallel TFRecord source: spark.read.format('binaryFile') per file ->
    Arrow-batched unframe + CRC verify -> JVM `from_json` row decode (dual
    of ReadAllExamples, tfrecord.go:238-259, but distributed instead of
    drain-to-slice)."""
    files = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.tfrecord"))

    def unframe(batches):
        import pandas as pd

        for pdf in batches:
            out: list[str] = []
            for content in pdf["content"]:
                out.extend(p.decode("utf-8") for p in unframe_records(bytes(content)))
            yield pd.DataFrame({"json": out})

    jdf = files.select("content").mapInPandas(unframe, "json string")
    if schema is None:
        return jdf
    return jdf.select(F.from_json("json", schema, _JSON_OPTS).alias("r")).select("r.*")
