"""TFRecord codec parity: framing, masked CRC, distributed round-trip
(the analog of test/tfrecord_test.go:132-238 order-insensitive equality)."""

from __future__ import annotations

import pytest

from go_tfdata_spark.sources.tfrecord import (
    crc32c,
    frame_record,
    masked_crc,
    read_tfrecords,
    unframe_records,
    write_tfrecords,
)


def test_crc32c_known_vectors():
    # public RFC 3720 test vectors for CRC32-C
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_crc32c_vectorized_paths_match_bytewise():
    """The numpy batch kernel (size-classed columns) and the chunk+GF(2)
    combine path must agree bit-exactly with the reference table loop across
    size-class and chunk boundaries."""
    import random

    from go_tfdata_spark.sources.tfrecord import _CHUNK, _crc32c_py, crc32c_many

    rng = random.Random(7)
    sizes = [0, 1, 3, 4, 5, 8, 9, 100, 1023, 1024, 1025,
             4 * _CHUNK - 1, 4 * _CHUNK, 4 * _CHUNK + 1, 10 * _CHUNK + 13]
    payloads = [rng.randbytes(n) for n in sizes]
    assert crc32c_many(payloads) == [_crc32c_py(p) for p in payloads]
    assert [crc32c(p) for p in payloads] == [_crc32c_py(p) for p in payloads]


def test_masked_crc_mask_math():
    # mask = ((crc>>15)|(crc<<17)) + 0xa282ead8  (crc.go:28-31)
    c = crc32c(b"123456789")
    expect = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc(b"123456789") == expect


def test_frame_roundtrip_and_corruption():
    payloads = [b"alpha", b"", b"x" * 1000]
    blob = b"".join(frame_record(p) for p in payloads)
    assert list(unframe_records(blob)) == payloads
    corrupted = blob[:15] + bytes([blob[15] ^ 0xFF]) + blob[16:]
    with pytest.raises(ValueError):
        list(unframe_records(corrupted))


def test_distributed_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(100)], "id long, text string"
    ).repartition(4)
    nfiles = write_tfrecords(df, str(tmp_path / "tfr"))
    assert nfiles >= 1
    back = read_tfrecords(spark, str(tmp_path / "tfr"), schema="id long, text string")
    got = sorted((r["id"], r["text"]) for r in back.collect())
    assert got == [(i, f"text-{i}") for i in range(100)]


def test_tfrecord_io_is_arrow_batched_not_per_row(spark, tmp_path):
    """No df.rdd / per-row Python anywhere in the TFRecord path: JSON codec
    is JVM to_json/from_json, Python only frames bytes at Arrow-batch level."""
    from pyspark.sql import types as T

    from go_tfdata_spark.sources.tfrecord import read_tfrecords, write_tfrecords

    df = spark.range(10).selectExpr("cast(id as string) conv_id", "id v")
    write_tfrecords(df, str(tmp_path / "o"))
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()), T.StructField("v", T.LongType())])
    back = read_tfrecords(spark, str(tmp_path / "o"), schema)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python UDF marker
    assert back.count() == 10
