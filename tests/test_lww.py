"""LWW fold value-fidelity tests.

Regression for the encoded-strategy timestamp bug: to_json's default
timestampFormat truncates to milliseconds, so sub-millisecond ts values —
which are themselves the LWW order column — were corrupted on round-trip.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_tfdata_spark.operators.lww import lww_latest

UTC = datetime.timezone.utc

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("lsn", T.LongType(), False),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_encoded_lww_preserves_sub_millisecond_ts(spark):
    t0 = datetime.datetime(2024, 1, 2, 3, 4, 5, 179575, tzinfo=UTC)
    t1 = datetime.datetime(2024, 1, 2, 3, 4, 5, 179999, tzinfo=UTC)  # same ms, later us
    df = _mk(
        spark,
        [
            ("c1", 0, "older", t0, 10),
            ("c1", 0, "newer", t1, 9),  # later ts must win despite lower lsn
        ],
    )
    out = lww_latest(df, ["conv_id", "turn_idx"], ["ts", "lsn"], strategy="encoded")
    row = out.collect()[0]
    assert row.text == "newer"
    # the stored ts must be byte-exact, not truncated to .179000
    assert row.ts.microsecond == 179999

    got = out.select(F.unix_micros("ts").alias("u")).collect()[0].u
    want = int(t1.timestamp() * 1_000_000)
    assert got == want


def test_encoded_matches_max_by_on_same_millisecond_ties(spark):
    base = datetime.datetime(2024, 6, 1, 12, 0, 0, tzinfo=UTC)
    rows = []
    for i in range(50):
        for us in (100, 500, 999):
            rows.append(
                (f"c{i % 7}", i % 3, f"t{i}-{us}", base.replace(microsecond=us), i)
            )
    df = _mk(spark, rows)
    enc = lww_latest(df, ["conv_id", "turn_idx"], ["ts", "lsn"], strategy="encoded")
    ref = lww_latest(df, ["conv_id", "turn_idx"], ["ts", "lsn"], strategy="max_by")
    assert sorted(map(tuple, enc.collect())) == sorted(map(tuple, ref.collect()))
