"""Training-data operators: dedup family, similarity search, text functions,
multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from go_tfdata_spark.functions.multimodal import decode_and_featurize, frame_sample, synthetic_media
from go_tfdata_spark.functions.text import normalize_text, token_count
from go_tfdata_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    minhash_near_dups,
    shingle_jaccard_pairs,
    simhash,
)
from go_tfdata_spark.operators.similarity import IVFIndex, brute_force_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base.replace("dog", "cat")),             # near dup
        (3, "completely different words entirely unrelated content here now"),
        (4, "  THE  quick   brown fox jumps over the lazy dog again and again today "),  # ws/case dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_normalized(spark, docs):
    out = dedup_exact(docs, "text", "doc_id")
    groups = {r["fp"]: r["doc_id"] for r in out.collect()}
    # 0,1,4 collapse to one group (normalization folds case+whitespace), min id kept
    assert len(groups) == 3
    assert 0 in groups.values() and 2 in groups.values() and 3 in groups.values()


def test_shingle_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             shingle_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.4).collect()}
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 4)] == 1.0 and pairs[(1, 4)] == 1.0
    assert 0.4 <= pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_shingle_jaccard_packed_and_fallback_id_ranges(spark, docs):
    """The pair-count kernel sorts a packed (da << 31) | db key when both
    ids fit in [0, 2^31); ids outside that range take the lexsort
    fallback. Both branches must produce identical pair sets: shift the
    same corpus's ids past 2^31 (and negative) and compare."""
    small = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             shingle_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.4).collect()}
    for off in (1 << 31, -7):
        shifted = docs.withColumn("doc_id", F.col("doc_id") + F.lit(off))
        got = {(r["id_a"] - off, r["id_b"] - off): r["jaccard"] for r in
               shingle_jaccard_pairs(shifted, "doc_id", "text", n=3, threshold=0.4).collect()}
        assert got == small, f"offset {off}: {got} != {small}"


def test_minhash_near_dups_finds_near_and_not_far(spark, docs):
    out = {(r["id_a"], r["id_b"]) for r in
           minhash_near_dups(docs, "doc_id", "text", num_hashes=16, bands=8, threshold=0.5).collect()}
    assert (0, 1) in out and (0, 4) in out
    assert (0, 3) not in out and (1, 3) not in out and (2, 3) not in out


def test_simhash_hamming(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert sh[0] == sh[1] == sh[4]          # identical after normalization
    assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])  # near dup closer than unrelated


def test_embedding_near_dups_and_lsh_buckets(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),     # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    brute = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(df, "vec_id", "v", threshold=0.95, exact=True).collect()}
    assert brute == {(0, 1)}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups(df, "vec_id", "v", threshold=0.95, hyperplanes=4, dim=4).collect()}
    assert lsh <= brute  # bucketing may lose recall, never adds false pairs
    assert (0, 3) not in lsh
    # OR-amplification: more tables never loses pairs vs one table, never
    # adds false positives vs brute force
    multi = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(df, "vec_id", "v", threshold=0.95,
                                 hyperplanes=4, tables=3, dim=4).collect()}
    assert lsh <= multi <= brute
    # dim is required on the LSH path (no silent driver probe)
    with pytest.raises(ValueError, match="dim"):
        embedding_near_dups(df, "vec_id", "v", threshold=0.95, hyperplanes=4)


def test_simhash_near_dups_banded_equals_brute(spark, docs):
    """Band rotation is candidate-COMPLETE (pigeonhole): the banded plan's
    pairs must equal a brute-force all-pairs hamming filter."""
    from go_tfdata_spark.operators.dedup import simhash_near_dups

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    for k in (0, 2, 5):
        want = {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for a in sh for b in sh
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= k
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dups(docs, "doc_id", "text", max_hamming=k).collect()
        }
        assert got == want, k
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dups(docs, "doc_id", "text", max_hamming=32)


def test_simhash_bits64_end_to_end(spark, docs):
    """bits=64 (the documented big-corpus default) end to end: the 64-bit
    rolling hash must equal the Python uint64-wrap reference, fingerprints
    must use the full upper 32 bits, and banded pairing must equal brute
    force at 64 bits — exercising the long-wrap path the 32-bit contract
    queries never touch."""
    from go_tfdata_spark.functions.text import rolling_hash
    from go_tfdata_spark.operators.dedup import simhash_near_dups

    # 1) 64-bit rolling hash == Python reference (wrap mod 2^64, signed view)
    words = ["fox", "dog", "a", "", "supercalifragilisticexpialidocious" * 4]
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    got_h = {
        r["w"]: r["h"]
        for r in wdf.select("w", rolling_hash(F.col("w"), mod=2**64).alias("h")).collect()
    }

    def ref(word: str) -> int:
        acc = 0
        for ch in word:
            acc = (acc * 31 + ord(ch)) % 2**64
        return acc - 2**64 if acc >= 2**63 else acc

    assert got_h == {w: ref(w) for w in words}

    # 2) fingerprints differ from the 32-bit ones and exercise high bits
    sh64 = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text", bits=64).collect()}
    assert any(v < 0 or v >= 2**32 for v in sh64.values()), "upper 32 bits never set"
    assert sh64[0] == sh64[1] == sh64[4]  # dups still collide at 64 bits

    # 3) banded candidate generation is still complete at bits=64
    for k in (0, 3):
        want = {
            (a, b, bin((sh64[a] ^ sh64[b]) & (2**64 - 1)).count("1"))
            for a in sh64 for b in sh64
            if a < b and bin((sh64[a] ^ sh64[b]) & (2**64 - 1)).count("1") <= k
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dups(docs, "doc_id", "text", bits=64, max_hamming=k).collect()
        }
        assert got == want, k


def test_cluster_dups_transitive_closure(spark):
    from go_tfdata_spark.operators.dedup import cluster_dups

    # chain 1-2-3-4 (transitive), pair {9,10}, singleton edges absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 10)], "id_a long, id_b long"
    )
    got = {(r["doc_id"], r["cluster_id"], r["is_canonical"])
           for r in cluster_dups(pairs).collect()}
    assert got == {(1, 1, True), (2, 1, False), (3, 1, False), (4, 1, False),
                   (9, 9, True), (10, 9, False)}
    # empty pair set -> empty clusters, no convergence error
    assert cluster_dups(pairs.limit(0)).count() == 0


def test_cluster_dups_long_chain_pointer_jumping(spark):
    """An adversarial 64-node path must converge well inside max_iters
    (pointer jumping gives O(log diameter) rounds)."""
    from go_tfdata_spark.operators.dedup import cluster_dups

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    out = cluster_dups(pairs, max_iters=10)
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_dedup_by_clusters_end_to_end(spark, docs):
    """The VERDICT-requested chain: minhash_near_dups -> clusters ->
    dedup'd corpus keeps one canonical per near-dup group + all unpaired."""
    from go_tfdata_spark.operators.dedup import dedup_by_clusters

    pairs = minhash_near_dups(docs, "doc_id", "text", num_hashes=16, bands=8,
                              threshold=0.5)
    kept = sorted(r["doc_id"] for r in
                  dedup_by_clusters(docs, pairs, "doc_id").collect())
    # 0,1,4 are dups (one kept: 0); 2 and 3 unpaired at this threshold
    assert 0 in kept and 3 in kept
    assert 1 not in kept and 4 not in kept


def test_shingle_jaccard_default_cap_is_finite(spark, docs):
    """Scale-safety: the DEFAULT invocation applies a finite stop-shingle
    cap (an unbounded d^2 join must be an explicit opt-in)."""
    import inspect

    sig = inspect.signature(shingle_jaccard_pairs)
    assert sig.parameters["max_doc_freq"].default is not None
    # a tiny explicit cap prunes the universal shingle, dropping pairs
    capped = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.01,
                                   max_doc_freq=1).count()
    uncapped = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.01,
                                     max_doc_freq=None).count()
    assert capped < uncapped


def test_embedding_near_dups_default_never_plans_cartesian(spark):
    """The quadratic baseline is opt-in (exact=True); a defaults call must
    plan a bucket equi-join, not a CartesianProduct / BroadcastNestedLoop."""
    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, -1.0]) for i in range(8)],
        "vec_id long, v array<double>",
    )
    plan = embedding_near_dups(df, "vec_id", "v", dim=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError, match="exact=True"):
        embedding_near_dups(df, "vec_id", "v", hyperplanes=0, dim=4)


def test_ivf_sparse_hashed_ids_still_make_ncells_centroids(spark):
    """Centroid sampling must not assume dense 0..n ids (regression: pmod
    stride sampling degenerated to 1 centroid on sparse id spaces)."""
    import numpy as np

    rng = np.random.RandomState(3)
    ids = list({int(x) for x in rng.randint(0, 2**62, size=120, dtype=np.int64)})[:100]
    vecs = rng.randn(100, 8).astype(float)
    df = spark.createDataFrame(
        [(ids[i], [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, v array<double>",
    )
    idx = IVFIndex(df, "v", "vec_id", ncells=8)
    assert len(idx.centroids) == 8
    q = [float(x) for x in vecs[11]]
    exact = [r["vec_id"] for r in brute_force_topk(df, "v", q, k=5, id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in idx.topk(q, k=5, nprobe=8).collect()]
    assert approx == exact  # all cells probed == exact


def test_ivf_topk_matches_brute_force(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    vecs = rng.randn(200, 16).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)], "vec_id long, v array<double>"
    )
    q = [float(x) for x in vecs[7]]
    exact = [r["vec_id"] for r in brute_force_topk(df, "v", q, k=5, id_col="vec_id").collect()]
    assert exact[0] == 7  # self is nearest
    idx = IVFIndex(df, "v", "vec_id", ncells=8)
    approx = [r["vec_id"] for r in idx.topk(q, k=5, nprobe=8).collect()]
    # probing ALL cells == exact search
    assert approx == exact


def test_ivf_vectorized_assignment_many_cells(spark):
    """Cell assignment is ONE mapInArrow stage whose plan size is O(1) in
    ncells (regression: the Catalyst formulation nested ncells
    greatest(struct(...)) calls per row — codegen/expression-tree blowup in
    the hundreds of cells a large corpus wants). ncells=256 over sparse
    hashed ids; assignment verified against an independent numpy argmax."""
    import numpy as np

    rng = np.random.RandomState(5)
    ids = sorted({int(x) for x in rng.randint(0, 2**62, size=420, dtype=np.int64)})[:400]
    vecs = rng.randn(400, 8)
    df = spark.createDataFrame(
        [(ids[i], [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, v array<double>",
    )
    idx = IVFIndex(df, "v", "vec_id", ncells=256)
    assert len(idx.centroids) == 256
    plan = idx.assigned._jdf.queryExecution().executedPlan().toString()
    assert "greatest" not in plan  # no O(ncells) expression tree
    assert plan.count("MapInArrow") == 1
    # independent assignment oracle: max cosine, ties -> largest cell id
    cents_desc = sorted(idx.centroids, key=lambda cv: cv[0], reverse=True)
    cids = np.array([c for c, _ in cents_desc])
    cmat_desc = np.array([v for _, v in cents_desc])
    cn = cmat_desc / np.linalg.norm(cmat_desc, axis=1, keepdims=True)
    by_id = {ids[i]: vecs[i] for i in range(400)}
    got = {r["vec_id"]: r["_cell"] for r in idx.assigned.select("vec_id", "_cell").collect()}
    for vid, v in by_id.items():
        vn = v / np.linalg.norm(v)
        assert got[vid] == int(cids[int(np.argmax(vn @ cn.T))])
    # probing every cell == exact search
    q = [float(x) for x in vecs[3]]
    exact = [r["vec_id"] for r in brute_force_topk(df, "v", q, k=5, id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in idx.topk(q, k=5, nprobe=256).collect()]
    assert approx == exact


def test_ivf_materialized_index_no_reassignment(spark, tmp_path):
    """An index queried k times must not pay k assignment passes: with a
    build `path` the assignment is WRITTEN partitioned by `_cell`, and every
    `topk` plan is a pruned parquet scan — no MapInArrow stage, and only
    nprobe/ncells of the partition dirs survive pruning."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, v array<double>",
    )
    q = [float(x) for x in vecs[42]]
    lazy = IVFIndex(df, "v", "vec_id", ncells=8)
    mat = IVFIndex(df, "v", "vec_id", ncells=8, path=str(tmp_path / "ivf"))
    # identical results, lazy vs materialized, partial and full probe
    for nprobe in (2, 8):
        a = [r["vec_id"] for r in lazy.topk(q, k=5, nprobe=nprobe).collect()]
        b = [r["vec_id"] for r in mat.topk(q, k=5, nprobe=nprobe).collect()]
        assert a == b
    plan = mat.topk(q, k=5, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan  # no re-assignment on query
    # partition pruning: a cell predicate reaches the scan as a partition
    # filter (not a post-scan Filter), so only the probed cells' dirs are
    # read — the nprobe/ncells scan reduction the index exists for
    import re

    two_cells = [c for c, _ in mat.centroids[:2]]
    pruned = mat.assigned.filter(F.col("_cell").isin(two_cells))
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", pplan)
    assert m and "_cell" in m.group(1) and "IN" in m.group(1)
    lazy.close()


def test_text_functions_edgecases(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "one"), (4, "a  b\tc")],
                               "id long, text string")
    out = df.select(
        "id",
        token_count(F.col("text")).alias("n"),
        normalize_text(F.col("text")).alias("norm"),
    ).collect()
    got = {r["id"]: (r["n"], r["norm"]) for r in out}
    assert got[1] == (0, "") and got[2] == (0, "")
    assert got[3] == (1, "one")
    assert got[4] == (3, "a b c")


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=50)
    feats = decode_and_featurize(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(not math.isnan(x) for r in rows for x in r["feature"])
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in decode_and_featurize(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)
    # frame sampling keeps every nth frame of videos only
    fs = frame_sample(media, every_nth=10)
    assert fs.filter(F.col("kind") != "video").count() == 0
    assert fs.filter(F.pmod(F.col("frame_idx"), F.lit(10)) != 0).count() == 0


def test_pandas_udf_parity_with_jvm_exprs(spark):
    """The Arrow-vectorized stages produce byte-identical results to the JVM
    column expressions (north rule: vectorized pandas UDFs, no per-row
    Python; reference analog: SampleF, transformation.go:128-142)."""
    from go_tfdata_spark.functions.text_pandas import normalize_text_pd, token_count_pd

    df = spark.createDataFrame(
        [(1, "  Hello   WORLD "), (2, ""), (3, "a\tb\nc"), (4, "ONE")],
        "id long, text string",
    )
    out = df.select(
        "id",
        (normalize_text_pd("text") == normalize_text(F.col("text"))).alias("norm_eq"),
        (token_count_pd("text") == token_count(F.col("text")).cast("long")).alias("cnt_eq"),
    ).collect()
    assert all(r["norm_eq"] and r["cnt_eq"] for r in out)


def test_repair_turn_order(spark):
    from go_tfdata_spark.functions.text_pandas import repair_turn_order

    rows = [
        ("c1", 5, 30, "late"), ("c1", 1, 10, "first"), ("c1", 1, 20, "second"),
        ("c2", 9, 1, "only"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts long, lsn long, text string")
    out = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in repair_turn_order(df).collect()}
    assert out == {("c1", 0): "first", ("c1", 1): "second", ("c1", 2): "late",
                   ("c2", 0): "only"}
