"""TFRecord file format: distributed write + read (reference parity).

The reference's native sink/source is the TFRecord framing —
8-byte LE length, masked CRC32-C of the length, payload, masked CRC32-C of
the payload (tfdata/core/tfrecord.go:60-88 write, :195-236 read), with the
mask ((crc>>15 | crc<<17) + 0xa282ead8) from internal/checksum/crc.go:28-31.
The engine's primary sink is the lake table; this module exists so users of
the reference's TFRecord round-trip (doc.go:12-29) can keep that path:

- `write_tfrecords(df, dir)` — each partition writes one .tfrecord file via
  mapPartitions (the distributed analog of WriteMessagesAsync's unordered
  parallel sink, tfrecord.go:124-180); records are JSON-serialized rows
  (the engine's payload is transcripts, not tf.Example protos — the framing
  and checksums are format-exact, the payload codec is pluggable).
- `read_tfrecords(spark, dir)` — parallel read + frame/CRC verification
  (dual of TFRecordReader.ReadNext, tfrecord.go:207-236).

Format knowledge is public (TensorFlow documentation of TFRecord framing).
"""

from __future__ import annotations

import json
import os
import struct
import uuid

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

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
    Returns number of files written."""
    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns

    def _write_partition(idx: int, rows) -> "list[int]":
        path = os.path.join(out_dir, f"part-{idx:05d}-{uuid.uuid4().hex[:8]}.tfrecord")
        n = 0
        with open(path, "wb") as f:
            for row in rows:
                payload = json.dumps(
                    {c: _jsonable(row[c]) for c in cols}, sort_keys=True
                ).encode("utf-8")
                f.write(frame_record(payload))
                n += 1
        if n == 0:
            os.unlink(path)
        return [n]

    counts = df.rdd.mapPartitionsWithIndex(_write_partition).collect()
    return sum(1 for c in counts if c > 0)


def _jsonable(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def read_tfrecords(spark: SparkSession, in_dir: str, schema: T.StructType | None = None) -> DataFrame:
    """Parallel TFRecord source: spark.read.format('binaryFile') per file ->
    unframe + CRC verify -> JSON rows (dual of ReadAllExamples,
    tfrecord.go:238-259, but distributed instead of drain-to-slice)."""
    files = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.tfrecord"))

    def _parse(rows):
        for r in rows:
            for payload in unframe_records(bytes(r.content)):
                yield Row(json=payload.decode("utf-8"))

    jdf = files.select("content").rdd.mapPartitions(_parse).toDF("json string")
    if schema is None:
        return jdf
    from pyspark.sql import functions as F

    return jdf.select(F.from_json("json", schema).alias("r")).select("r.*")
