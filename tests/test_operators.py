"""Unit tests for the dataflow operator surface (SURVEY.md §2.2/§2.3/§2.5).

Mirrors the reference's transform/filter/selection unit tests
(test/transform_test.go:15-78, test/filter_test.go:17-47, tar_test.go:17-39)
over Spark DataFrames."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from go_tfdata_spark.operators.assembly import assemble_records, complete_records
from go_tfdata_spark.operators.filters import non_empty
from go_tfdata_spark.operators.select import (
    by_key,
    by_prefix,
    by_substring,
    by_suffix,
    select_union,
    where_key_value,
)
from go_tfdata_spark.operators.transform import (
    cast_to_schema,
    chain,
    identity,
    rename_last_wins,
    vectorized,
)
from go_tfdata_spark.plans.pipeline import Pipeline


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", "x", None), (2, "b", None, "t2"), (3, "", None, None)],
        "id int, name string, jpg string, jpeg string",
    )


def test_selections(spark):
    df = _df(spark)
    assert select_union(df, by_key("name")).columns == ["name"]
    assert select_union(df, by_prefix("jp")).columns == ["jpg", "jpeg"]
    assert select_union(df, by_suffix("eg")).columns == ["jpeg"]
    assert select_union(df, by_substring("am")).columns == ["name"]
    # union of selections + implicit key (P1 keeps __key__: transformation.go:109)
    assert select_union(df, by_key("jpg"), by_key("name"), keep=("id",)).columns == [
        "id", "jpg", "name",
    ]


def test_where_key_value(spark):
    assert where_key_value(_df(spark), "name", "b").count() == 1


def test_rename_last_wins(spark):
    """transformation.go:58-66 — later src wins; srcs kept; test mirrors the
    jpeg/jpg -> image rename of test/pipeline_test.go:163-166."""
    df = _df(spark)
    out = rename_last_wins(df, "image", "jpg", "jpeg")
    rows = {r["id"]: r["image"] for r in out.collect()}
    assert rows == {1: "x", 2: "t2", 3: None}  # jpeg (later) wins when present
    assert set(df.columns) <= set(out.columns)
    out2 = rename_last_wins(df, "image", "jpg", "jpeg", keep_srcs=False)
    assert "jpg" not in out2.columns and "jpeg" not in out2.columns


def test_chain_order_and_identity(spark):
    df = _df(spark)
    s1 = lambda d: d.withColumn("v", F.lit(1))
    s2 = lambda d: d.withColumn("v", F.col("v") + 1)  # depends on s1 running first
    out = chain(identity, s1, s2)(df)
    assert out.select(F.min("v"), F.max("v")).first() == (2, 2)


def test_vectorized_map_in_pandas(spark):
    """T4 — user fn over Arrow batches; preserves schema when none given."""

    def double_name(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["name"] = pdf["name"] + pdf["name"]
        return pdf

    out = vectorized(double_name)(_df(spark))
    assert out.schema == _df(spark).schema
    assert {r["name"] for r in out.collect()} == {"aa", "bb", ""}


def test_cast_to_schema_open_world(spark):
    """T5/T6 — declared fields cast; unknown fields carried (bytes-fallback
    stance, transformer.go:135-142); missing declared fields -> NULL."""
    from pyspark.sql import types as T

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(1, "2.5", "extra")], "id int, score string, other string")
    out = cast_to_schema(df, target, carry_unknown=True)
    r = out.first()
    assert r["id"] == 1 and abs(r["score"] - 2.5) < 1e-9 and r["other"] == "extra"
    out2 = cast_to_schema(df.drop("score"), target, carry_unknown=False)
    assert out2.columns == ["id", "score"] and out2.first()["score"] is None


def test_filter_non_empty(spark):
    """F1/F2 — filter.go:59-68: empty = all payload NULL/''."""
    df = _df(spark)
    kept = non_empty(df, payload_cols=["name", "jpg", "jpeg"])
    assert {r["id"] for r in kept.collect()} == {1, 2}


def test_assemble_and_complete_records(spark):
    """S6/S7 — manager.go:57-63 member upsert + :33-43 SameMembers."""
    rows = [
        ("k1", "cls", "A", 1), ("k1", "img", "B", 2),
        ("k2", "cls", "C", 3),
        ("k1", "cls", "A2", 4),  # duplicate member: later (order 4) wins
    ]
    df = spark.createDataFrame(rows, "key string, field string, value string, seq long")
    rec = assemble_records(df, ["key"], "field", "value", order_col="seq")
    m = {r["key"]: r["members"] for r in rec.collect()}
    assert m["k1"] == {"cls": "A2", "img": "B"}
    assert m["k2"] == {"cls": "C"}
    done = complete_records(rec, ["cls", "img"])
    assert [r["key"] for r in done.collect()] == ["k1"]


def test_pipeline_fluent(spark, tmp_path):
    """§3.1 — build is lazy, run executes source->stages->sink in order."""
    df = _df(spark)
    ran = []

    p = (
        Pipeline(spark)
        .from_df(df)
        .transform(
            lambda d: d.filter(F.col("id") < 3),
            lambda d: rename_last_wins(d, "image", "jpg", "jpeg"),
        )
        .to_sink(lambda d: ran.append(d.count()))
    )
    assert ran == []  # lazy until run (README.md:135-136)
    p.run()
    assert ran == [2]
    out = p.plan()
    assert "image" in out.columns


def test_pipeline_to_lake_merge(spark, tmp_path):
    """Full fluent path: source -> transform stages -> lake merge sink."""
    from pyspark.sql import types as T

    from go_tfdata_spark.lake.table import LakeTable

    phys = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    table = LakeTable.create(spark, str(tmp_path / "pl"), phys, num_buckets=2)
    src = spark.createDataFrame(
        [("c1", 0, " Hello ", 1), ("c1", 0, "world", 2), ("c2", 1, "x", 1)], phys
    )
    (
        Pipeline(spark)
        .from_df(src)
        .transform(lambda d: d.withColumn("text", F.trim(F.col("text"))))
        .to_lake_merge(table, ["conv_id", "turn_idx"], ["v"])
        .run()
    )
    got = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert got == {("c1", 0): "world", ("c2", 1): "x"}


def test_skew_stats_and_salt_recommendation(spark):
    from go_tfdata_spark.operators.skew import recommend_salt_buckets, skew_stats

    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, v long")
    s = skew_stats(df, ["k"])
    assert s["rows"] == 1000 and s["distinct_keys"] == 101
    assert s["max_freq"] == 900 and s["skew_ratio"] > 80
    assert recommend_salt_buckets(s, shuffle_partitions=8) > 1
    uniform = skew_stats(spark.createDataFrame([(f"k{i}", i) for i in range(100)], "k string, v long"), ["k"])
    assert recommend_salt_buckets(uniform, shuffle_partitions=8) == 1


def test_cast_decodes_reference_byte_payloads(spark):
    """TypesMap byte decodes (transformer.go:148-183): zigzag-varint int64,
    LE float32 bits, LE int64/float32 arrays from raw binary columns."""
    import struct

    from pyspark.sql import types as T

    from go_tfdata_spark.operators.transform import cast_to_schema

    def zigzag_varint(v: int) -> bytes:
        u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    rows = [
        (
            zigzag_varint(-12345),
            struct.pack("<f", 2.5),
            struct.pack("<3q", 7, -8, 9),
            struct.pack("<2f", 1.5, -0.25),
        )
    ]
    df = spark.createDataFrame(rows, "i binary, f binary, il binary, fl binary")
    target = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("f", T.FloatType()),
            T.StructField("il", T.ArrayType(T.LongType())),
            T.StructField("fl", T.ArrayType(T.FloatType())),
        ]
    )
    r = cast_to_schema(df, target).collect()[0]
    assert r.i == -12345
    assert r.f == 2.5
    assert r.il == [7, -8, 9]
    assert r.fl == [1.5, -0.25]


def test_deterministic_sampling_and_splits(spark):
    from go_tfdata_spark.operators.sampling import (
        deterministic_sample,
        split_assign,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(600)], "id long, lang string"
    )
    s1 = {r["id"] for r in deterministic_sample(df, "id", 0.3, seed=5).collect()}
    s2 = {r["id"] for r in deterministic_sample(df, "id", 0.3, seed=5).collect()}
    assert s1 == s2 and 0.15 < len(s1) / 600 < 0.45  # stable + near fraction
    # monotone: a smaller fraction is a SUBSET of a larger one (same seed)
    s_small = {r["id"] for r in deterministic_sample(df, "id", 0.1, seed=5).collect()}
    assert s_small <= s1
    # stratified: each stratum sampled independently near the fraction
    st = stratified_sample(df, ["lang"], "id", 0.25, seed=5)
    by_lang = {r["lang"]: r["n"] for r in st.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.1 < by_lang.get("en", 0) / 400 < 0.45
    # split_assign: every group lands in exactly one split; weights validated
    ev = spark.createDataFrame(
        [(i % 50, i) for i in range(1000)], "user long, x long"
    )
    out = split_assign(ev, "user", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_user = out.groupBy("user").agg(F.count_distinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_user)
    assert out.select("split").distinct().count() >= 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        split_assign(ev, "user", {"a": 0.5, "b": 0.2})
