"""Deduplication operators for training-data pipelines.

Exact, shingle-Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — each designed for the 100 TB shape:

- exact dedup is a hash aggregation on a fingerprint (map-side combine);
- Jaccard avoids the O(n^2) cross join by exploding shingles and joining
  on shingle (only docs sharing at least one shingle ever meet);
- MinHash+LSH buckets by band signature so candidate generation is a
  groupBy, not a join of everything with everything;
- SimHash reduces each doc to one `bits`-bit key; near-dup candidates
  share at least one rotation band of the key (pigeonhole over
  max_hamming+1 bands), verified with bit_count on the XOR;
- candidate PAIRS resolve to transitive CLUSTERS (connected components by
  pointer-jumped min-label propagation) with one canonical doc kept per
  cluster;
- embedding near-dup offers brute-force (baseline, quadratic) and a
  random-hyperplane-bucketed variant (the scale path).

All hashes are engine-agnostic (md5 / polynomial rolling hash) so DuckDB
oracles can restate them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_tfdata_spark.functions.text import fingerprint, rolling_hash

_MERSENNE = 2**31 - 1

# Narrow intermediates persisted by the multi-consumer pipelines below
# (exploded shingles, minhash signatures). Their consumers are lazy, so the
# operator cannot unpersist before returning; instead the registry keeps the
# `_MAX_LIVE_CACHES` most recent invocations' caches and evicts older ones,
# so a long-lived session's cached footprint stays bounded WITHOUT yanking
# the cache out from under a still-unconsumed DataFrame returned by the
# immediately-preceding call (or a concurrent thread's in-flight query —
# the registry is lock-guarded). `release_caches()` drops everything.
import threading as _threading

_LIVE_CACHES: list = []
_CACHE_LOCK = _threading.Lock()
_MAX_LIVE_CACHES = 4


def _take_cache(df: DataFrame) -> DataFrame:
    df = df.persist()
    evicted = []
    with _CACHE_LOCK:
        _LIVE_CACHES.append(df)
        while len(_LIVE_CACHES) > _MAX_LIVE_CACHES:
            evicted.append(_LIVE_CACHES.pop(0))
    for old in evicted:  # unpersist outside the lock (it can run a JVM call)
        old.unpersist()
    return df


def release_caches() -> None:
    """Drop ALL cached dedup intermediates (for long-lived apps that know
    no returned DataFrame is still pending consumption)."""
    with _CACHE_LOCK:
        evicted, _LIVE_CACHES[:] = list(_LIVE_CACHES), []
    for old in evicted:
        old.unpersist()


_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_bytes(value: str) -> int:
    """Spark byte-size string ('134217728', '128m', '64MB') -> bytes."""
    s = str(value).strip().lower()
    num = s.rstrip("kmgtpb")
    suffix = s[len(num):]
    if suffix not in _SIZE_SUFFIX:
        raise ValueError(f"unknown byte-size suffix {suffix!r} in {value!r}")
    return int(num) * _SIZE_SUFFIX[suffix]


def _ensure_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a narrow input across the cluster before an expensive
    per-row expression (shingle explode, hash family, bucket projection).

    A small dimension-sized parquet often arrives as ONE split (maxPartition-
    Bytes), which would serialize the whole explode on one core — measured
    7s of a 14s query at sf0.1. At real scale inputs already carry thousands
    of splits and this is a no-op (we only repartition when the scan has
    materially fewer partitions than the cluster has slots). Partition-count
    introspection prefers the scan's file listing (plan-only); the RDD
    conversion fallback only runs for non-scan inputs."""
    want = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) * 2 >= want:
            return df  # enough splits already; no RDD conversion, no shuffle
        # Few files: only tiny ones imply few splits. Local paths can be
        # stat'ed cheaply; non-local few-file scans fall through to the
        # RDD-partition check below.
        import os
        from urllib.parse import urlparse

        paths = [urlparse(f) for f in files]
        if all(p.scheme in ("file", "") for p in paths):
            try:
                total = sum(os.path.getsize(p.path) for p in paths)
                max_split = _parse_bytes(
                    df.sparkSession.conf.get(
                        "spark.sql.files.maxPartitionBytes", "134217728"
                    )
                )
                est_splits = max(len(files), total // max_split)
                if est_splits * 2 >= want:
                    return df
                return df.repartition(want, *[F.col(c) for c in cols])
            except (OSError, ValueError):
                pass
    if df.rdd.getNumPartitions() * 2 < want:
        return df.repartition(want, *[F.col(c) for c in cols])
    return df


def _exploded_shingles_jvm(df: DataFrame, id_col: str, text_col: str, n: int):
    """Exploded word-n-gram rows (id, sh) WITHOUT per-row dedup, built by
    codegen'd projection instead of a higher-order `transform`.

    The HOF lambda is evaluated interpreted per element (~23us/shingle
    measured at sf1.0 — 2.3s vs 0.38s for this shape over 2.6M shingles);
    exploding the position sequence and projecting
    concat_ws(token[i..i+n-1]) stays inside whole-stage codegen. The
    multiset of (id, shingle) rows is identical to
    explode(word_shingles(text, n)) — verified by groupBy-count equality —
    including the <n-token fallback (one shingle = the normalized text).
    Use where downstream aggregation is insensitive to per-row duplicate
    shingles (e.g. minhash's per-document min)."""
    from go_tfdata_spark.functions.text import normalize_text

    t = F.split(normalize_text(F.col(text_col)), " ")
    gen = df.select(
        F.col(id_col), t.alias("_t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1)))
        ).alias("_i"),
    )
    sh = F.when(
        F.size("_t") >= n,
        F.concat_ws(
            " ", *[F.element_at("_t", F.col("_i") + F.lit(k)) for k in range(n)]
        ),
    ).otherwise(F.concat_ws(" ", "_t"))
    return gen.select(F.col(id_col), sh.alias("sh"))


# Exactly Java's \s class ([ \t\n\x0B\f\r]) spelled out for RE2 — RE2's \s
# omits \x0B, so the Arrow shingler must not use \s if it is to normalize
# byte-for-byte like functions.text.normalize_text (Java regex) does.
_JAVA_WS_RE = "[ \t\n\x0b\x0c\r]+"


def _exploded_distinct_shingles_arrow(df: DataFrame, id_col: str, text_col: str, n: int):
    """Exploded PER-ROW-DISTINCT word-n-gram rows (doc, sh), computed with
    vectorized Arrow kernels + numpy inside the workers.

    Semantics are exactly explode(array_distinct(word_shingles(text, n))):
    lower/trim/whitespace-collapse normalization (the collapse regex is the
    Java \\s class spelled out — see _JAVA_WS_RE), n-gram join with ' ',
    whole-normalized-text fallback for <n-token rows, and duplicate
    shingles dropped WITHIN each input row (never across rows, so
    degenerate duplicate-id inputs fold exactly as the oracle's per-row
    unnest(list_distinct(...)) does). The JVM expression shape pays the
    interpreted-HOF toll per shingle; this runs ~6x faster on the same
    input and emits the identical row multiset (order differs; every
    consumer aggregates)."""
    id_field = df.schema[id_col]

    def shingler(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            ids = rb.column(0)
            if len(ids) == 0:
                continue
            norm = pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_trim(rb.column(1), " ")),
                pattern=_JAVA_WS_RE, replacement=" ",
            )
            toks = pc.split_pattern(norm, " ")
            m = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            vals = pc.list_flatten(toks)
            offsets = np.concatenate(([0], np.cumsum(m)))
            k = np.maximum(m - (n - 1), 0)
            total_k = int(k.sum())
            # global token index of each n-gram's first token
            base = np.repeat(offsets[:-1], k)
            within = np.arange(total_k) - np.repeat(np.cumsum(k) - k, k)
            starts = base + within
            parts = [vals.take(pa.array(starts + j, pa.int64())) for j in range(n)]
            ngrams = pc.binary_join_element_wise(*parts, " ")
            ngram_rows = np.repeat(np.arange(len(ids)), k)
            fb_rows = np.flatnonzero(m < n)
            sh_all = pa.concat_arrays([
                ngrams.combine_chunks() if isinstance(ngrams, pa.ChunkedArray) else ngrams,
                norm.take(pa.array(fb_rows, pa.int64())).combine_chunks()
                if isinstance(norm, pa.ChunkedArray)
                else norm.take(pa.array(fb_rows, pa.int64())),
            ])
            rows_all = np.concatenate([ngram_rows, fb_rows])
            # per-row distinct by value: dictionary codes + (row, code) sort
            d = pc.dictionary_encode(sh_all)
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((codes, rows_all))
            r_s, c_s = rows_all[order], codes[order]
            keep = np.empty(len(r_s), dtype=bool)
            if len(keep):
                keep[0] = True
                np.not_equal(r_s[1:], r_s[:-1], out=keep[1:])
                keep[1:] |= c_s[1:] != c_s[:-1]
            sel = order[keep]
            out_ids = ids.take(pa.array(rows_all[sel], pa.int64()))
            out_sh = sh_all.take(pa.array(sel, pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [out_ids.combine_chunks() if isinstance(out_ids, pa.ChunkedArray) else out_ids,
                 out_sh.combine_chunks() if isinstance(out_sh, pa.ChunkedArray) else out_sh],
                names=["doc", "sh"],
            )

    from pyspark.sql.types import StructField, StructType

    out_schema = StructType([
        StructField("doc", id_field.dataType, id_field.nullable),
        StructField("sh", T.StringType(), False),
    ])
    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(shingler, out_schema)


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint: keep the row with the
    smallest id per fingerprint group. Output: input columns + `fp`."""
    fp = fingerprint(F.col(text_col)).alias("fp")
    winners = (
        df.select(fp, F.col(id_col), *[c for c in df.columns if c != id_col])
        .groupBy("fp")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_r"))
    )
    return winners.select("fp", "_r.*")


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all document pairs sharing
    >=1 shingle, filtered to jaccard >= threshold, id_a < id_b.

    Plan shape: explode distinct shingles -> self-join on shingle (docs
    that share nothing never meet) -> count intersections -> jaccard from
    |A|,|B|,|A∩B|. Shuffles are keyed by shingle then by pair.

    `max_doc_freq` is the stop-shingle cap — the scale knob: a shingle
    appearing in d documents contributes d^2 join rows, so one stop-shingle
    (a boilerplate phrase in 1%% of a 10^9-doc corpus) alone would be 10^14
    pairs. Capping document frequency bounds the per-shingle group size;
    Jaccard is then computed on the capped shingle universe (both the
    intersection AND the set sizes, so the statistic stays internally
    consistent — standard stop-shingle pruning). The default (10_000) is
    finite ON PURPOSE — mirroring the required-`dim`/`sig_len` convention,
    a default invocation can never plan an unbounded d^2 shingle join; pass
    `max_doc_freq=None` to explicitly opt into the uncapped exact
    statistic on corpora known to be small."""
    sh = _exploded_distinct_shingles_arrow(
        _ensure_parallelism(df, id_col), id_col, text_col, n
    )
    # Group the exploded rows per shingle ONCE (collect_list) and generate
    # co-occurrence pairs from the sorted doc array in place. The previous
    # shape (doc-freq groupBy + filter join + self-join on the shingle
    # string) shuffled the exploded string rows three times and — under a
    # size misestimate of the cached explode — could broadcast the entire
    # corpus-side join input; this shape shuffles the exploded rows exactly
    # once, the shingle string never crosses another exchange, and the pair
    # multiset is provably identical (each shingle group of d docs emits
    # the same d*(d-1)/2 value-ordered pairs the self-join produced, and
    # the doc-freq cap is the group size). The grouped (docs-array) rows
    # feed both the pair generator and the per-doc sizes, so they are the
    # narrow intermediate worth caching — ~one row per distinct shingle.
    grp = sh.groupBy("sh").agg(F.collect_list("doc").alias("docs"))
    if max_doc_freq is not None:
        grp = grp.filter(F.size("docs") <= max_doc_freq)
    grp = grp.select(F.array_sort("docs").alias("docs"))
    id_type = df.schema[id_col].dataType
    arrow_ids = isinstance(
        id_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    )
    if not arrow_ids:
        # the generic path consumes grp twice (sizes + pair expansion):
        # cache the narrow array rows so the explode+groupBy runs once
        grp = _take_cache(grp)
        sizes = grp.select(F.explode("docs").alias("doc")).groupBy("doc").agg(
            F.count("*").alias("sz")
        )
    ex = grp.select(
        F.posexplode("docs").alias("_i", "da"),
        F.slice(F.col("docs"), F.col("_i") + F.lit(2), F.size("docs")).alias("_tail"),
    )
    if arrow_ids:
        # Arrow fast path for integral ids: shuffle the (da, tail-array)
        # rows hashed by da — every co-occurrence of da lands in one
        # partition as a PACKED int64 list (~55x fewer rows and roughly
        # half the bytes of expanded pair rows) — and expand + run-length
        # count the pairs with numpy inside the worker. A JVM hash
        # aggregate over the expanded pairs is the wrong tool for this
        # distribution (near-all-distinct keys: partial aggregation
        # combines nothing, and the 67M-entry final hash tables spill in a
        # default-size heap — measured 13.6s vs 2-3s for this shape at
        # sf1.0/32 cores). Exact-prune before crossing back to the JVM:
        # szb >= inter always, so jaccard <= inter/sz(da); a pair with
        # inter < threshold*sz(da) can never reach the threshold and is
        # dropped in-worker (the surviving pairs — the only rows the JVM
        # ever joins — are the near-threshold ones). sz(da) is exact and
        # partition-local: every group containing da contributes exactly
        # one posexplode row, all hashed to da's partition.
        thr = float(threshold)

        def _count_pairs(batches):
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            da_p, len_p, val_p = [], [], []
            for rb in batches:
                da_p.append(rb.column(0).to_numpy(zero_copy_only=False))
                tails = rb.column(1)
                len_p.append(
                    pc.list_value_length(tails).to_numpy(zero_copy_only=False)
                )
                val_p.append(pc.list_flatten(tails).to_numpy(zero_copy_only=False))
            if not da_p:
                return
            da = np.concatenate(da_p).astype(np.int64, copy=False)
            lens = np.concatenate(len_p).astype(np.int64, copy=False)
            vals = np.concatenate(val_p).astype(np.int64, copy=False)
            # per-doc capped-universe sizes, exact and partition-complete
            # (every group containing a doc contributes one posexplode row,
            # all hashed here) — emitted as id_b=NULL sentinel rows so the
            # downstream sz_b join needs no separate sizes subtree. Always
            # emitted, even when this partition produces no pairs: another
            # partition's pairs may reference these docs as id_b.
            ua, ucnt = np.unique(da, return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ua, pa.int64()),
                 pa.array([None] * len(ua), pa.int64()),
                 pa.array(np.zeros(len(ua), np.int64), pa.int64()),
                 pa.array(ucnt.astype(np.int64), pa.int64())],
                names=["id_a", "id_b", "inter", "sz_a"],
            )
            da_exp = np.repeat(da, lens)
            keep = vals > da_exp  # value-compare: exact a.doc < b.doc parity
            da_exp, db = da_exp[keep], vals[keep]
            if not len(da_exp):
                return
            # Sort ONE packed key instead of lexsort+gather: with both ids
            # nonnegative and < 2^31 (every driver corpus; checked per
            # partition), (da << 31) | db is a bijection whose int64 order
            # equals the (da, db) lex order, and counting needs no
            # permutation array at all — np.sort + single-array run-length
            # is ~2x the lexsort path (0.75s vs 1.6s per 3.2M-pair task).
            lo = min(da_exp.min(), db.min())
            hi = max(da_exp.max(), db.max())
            if lo >= 0 and hi < (1 << 31):
                packed = (da_exp << np.int64(31)) | db
                packed.sort()
                new = np.empty(len(packed), dtype=bool)
                new[0] = True
                np.not_equal(packed[1:], packed[:-1], out=new[1:])
                starts = np.flatnonzero(new)
                inter = np.diff(np.append(starts, len(packed)))
                keys = packed[starts]
                pa_ = keys >> np.int64(31)
                pb_ = keys & np.int64((1 << 31) - 1)
            else:
                order = np.lexsort((db, da_exp))
                da_exp, db = da_exp[order], db[order]
                new = np.empty(len(da_exp), dtype=bool)
                new[0] = True
                np.not_equal(da_exp[1:], da_exp[:-1], out=new[1:])
                new[1:] |= db[1:] != db[:-1]
                starts = np.flatnonzero(new)
                inter = np.diff(np.append(starts, len(da_exp)))
                pa_, pb_ = da_exp[starts], db[starts]
            # exact prune (conservative float margin: the final jaccard
            # filter downstream is the decider; this must only never drop
            # a pair that could pass it)
            sza = ucnt[np.searchsorted(ua, pa_)]
            ok = inter >= thr * sza - 1e-9
            yield pa.RecordBatch.from_arrays(
                [pa.array(pa_[ok], pa.int64()), pa.array(pb_[ok], pa.int64()),
                 pa.array(inter[ok], pa.int64()), pa.array(sza[ok], pa.int64())],
                names=["id_a", "id_b", "inter", "sz_a"],
            )

        # ONE kernel pass emits both the pruned pair counts (sz_a riding
        # along — it is the exact per-doc capped shingle count, already in
        # hand for the prune) and the per-doc sizes (id_b NULL sentinel
        # rows). The output is narrow (4 longs) and has two consumers, so
        # it is the intermediate worth caching; grp then has a single
        # consumer and needs none.
        cnt = _take_cache(
            ex.select("da", "_tail").repartition("da")
            .mapInArrow(_count_pairs, "id_a long, id_b long, inter long, sz_a long")
        )
        # Materialize the cache EAGERLY before handing it to two consumers.
        # AQE submits the sizes build stage and the pair probe stage
        # concurrently, and two scans of a not-yet-materialized cache
        # STAMPEDE: each recomputes the entire kernel chain (scan, shingler,
        # collect_list aggregate, repartition, pair kernel) side by side at
        # half throughput — measured 2x wall on a 100M-pair corpus, and
        # bimodal (the race is timing-dependent). One cheap count pins the
        # cache; both consumers then read memory. The extra pass touches
        # only the cached 4-long rows.
        cnt.count()
        sizes_b = cnt.filter(F.col("id_b").isNull()).select(
            F.col("id_a").cast(id_type).alias("id_b"),
            F.col("sz_a").alias("sz_b"),
        )
        pairs = cnt.filter(F.col("id_b").isNotNull()).select(
            F.col("id_a").cast(id_type).alias("id_a"),
            F.col("id_b").cast(id_type).alias("id_b"),
            "inter", "sz_a",
        )
        out = (
            pairs.join(sizes_b, "id_b")
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        return out
    # generic ids: expand in the JVM and hash-aggregate per pair
    pairs = (
        ex.select("da", F.explode("_tail").alias("db"))
        # duplicate ids inside one group sort adjacently; value-compare
        # (not position-compare) keeps exact parity with a.doc < b.doc
        .filter(F.col("da") < F.col("db"))
        .groupBy(F.col("da").alias("id_a"), F.col("db").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"doc": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p."""
    params = []
    a, b = 1, 0
    for i in range(num_hashes):
        # simple LCG-derived constants; odd a, stable across runs
        a = (a * 1103515245 + 12345 + seed + i) % _MERSENNE
        b = (b * 69069 + 1 + seed * 31 + i) % _MERSENNE
        params.append((a | 1, b))
    return params


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    n: int = 3,
    seed: int = 7,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles s of
    (a_i * rolling_hash(s) + b_i) mod p. Output: (id, sig array<long>).

    Computed in ONE vectorized Arrow/numpy kernel, zero shuffles: the
    normalized text equals ' '.join(tokens) (split-then-join with a single
    separator char is the identity), so every word n-gram shingle IS a
    contiguous substring of the normalized document — its polynomial
    rolling hash follows in O(1) from the document's prefix-hash array
    (hash(s[a..b]) = (H[b] - H[a-1]*31^(b-a+1)) mod p; p prime, all
    int64-safe). No 2.6M-row shingle explode, no per-char interpreted
    fold, no groupBy: each document is one input row, so the kernel emits
    its final signature directly (per-doc min over the shingle hashes via
    segmented reduction). The per-document min is insensitive to duplicate
    shingle values, so skipping array_distinct is exact. Values are
    bit-identical to the expression formulation (the oracle restates them
    through DuckDB list_reduce and compares exactly).
    """
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    params = _minhash_params(num_hashes, seed)
    a_vec = [a for a, _ in params]
    b_vec = [b for _, b in params]
    id_field = df.schema[id_col]
    nn = int(n)

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        A = np.array(a_vec, dtype=np.int64)[:, None]
        B = np.array(b_vec, dtype=np.int64)[:, None]
        P = np.int64(_MERSENNE)

        def run(ids, norm0):
            """One bounded chunk of documents -> one output RecordBatch."""
            nrows = len(ids)
            null_mask = pc.is_null(norm0).to_numpy(zero_copy_only=False)
            norm = pc.fill_null(norm0, "")
            if isinstance(norm, pa.ChunkedArray):
                norm = norm.combine_chunks()
            doc_cp = pc.utf8_length(norm).to_numpy(zero_copy_only=False).astype(np.int64)
            max_len = int(doc_cp.max()) if nrows else 0
            # code-point matrix (docs x max_len), zero-padded. ASCII fast
            # path reads the UTF-8 buffer directly (bytes == code points);
            # otherwise a numpy U-array view gives exact UTF-32 points.
            if max_len == 0:
                cp = np.zeros((nrows, 0), dtype=np.int64)
            elif pc.all(pc.string_is_ascii(norm), min_count=0).as_py():
                buf = np.frombuffer(norm.buffers()[2], dtype=np.uint8)
                offs = np.frombuffer(norm.buffers()[1], dtype=np.int32).astype(np.int64)
                offs = offs[norm.offset: norm.offset + nrows + 1]
                starts_b = offs[:-1]
                gather = starts_b[:, None] + np.arange(max_len)[None, :]
                np.minimum(gather, np.maximum(offs[1:, None] - 1, starts_b[:, None]),
                           out=gather)
                cp = buf[gather].astype(np.int64) if len(buf) else np.zeros(
                    (nrows, max_len), dtype=np.int64
                )
                cp[np.arange(max_len)[None, :] >= doc_cp[:, None]] = 0
            else:
                u = np.array(norm.to_pylist(), dtype=f"U{max(max_len, 1)}")
                cp = u.view(np.uint32).reshape(nrows, -1).astype(np.int64)
            # prefix hashes per doc: H[:, j] = hash of first j code points
            H = np.zeros((nrows, max_len + 1), dtype=np.int64)
            acc = np.zeros(nrows, dtype=np.int64)
            for j in range(max_len):
                acc = np.where(j < doc_cp, (acc * 31 + cp[:, j]) % P, acc)
                H[:, j + 1] = acc
            pow31 = np.empty(max_len + 1, dtype=np.int64)
            pow31[0] = 1
            for j in range(1, max_len + 1):
                pow31[j] = (pow31[j - 1] * 31) % P
            # token boundaries: tokens = split(norm, ' '); token k spans
            # [tok_start[k], tok_start[k] + tok_len[k]) in code points
            toks = pc.split_pattern(norm, " ")
            m = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            tlen = pc.utf8_length(pc.list_flatten(toks)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            tok_doc_start = np.concatenate(([0], np.cumsum(m)))
            # start position of each token inside its doc
            pos_global = np.concatenate(([0], np.cumsum(tlen + 1)))[:-1]
            pos_in_doc = pos_global - np.repeat(pos_global[tok_doc_start[:-1]], m)
            # shingles: docs with m >= n emit m-n+1 substrings
            # [tok k start .. tok k+n-1 end); docs with m < n emit the
            # whole normalized text as their single shingle
            k = np.maximum(m - (nn - 1), 0)
            kb = np.repeat(tok_doc_start[:-1], k)
            within = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
            first_tok = kb + within
            last_tok = first_tok + (nn - 1)
            sub_a = pos_in_doc[first_tok]
            sub_b = pos_in_doc[last_tok] + tlen[last_tok]  # exclusive end
            row_of = np.repeat(np.arange(nrows), k)
            fb_rows = np.flatnonzero(m < nn)
            sub_a = np.concatenate([sub_a, np.zeros(len(fb_rows), dtype=np.int64)])
            sub_b = np.concatenate([sub_b, doc_cp[fb_rows]])
            row_of = np.concatenate([row_of, fb_rows])
            # substring rolling hash from prefixes
            hb = H[row_of, sub_b]
            ha = H[row_of, sub_a]
            x = (hb - (ha * pow31[sub_b - sub_a]) % P) % P
            # hash family + per-doc min (the fallback block appends after
            # the doc-contiguous n-gram block, so order by row first)
            order = np.argsort(row_of, kind="stable")
            row_of, x = row_of[order], x[order]
            hx = (A * x[None, :] + B) % P  # (num_hashes, n_shingles)
            seg = np.flatnonzero(
                np.concatenate(([True], row_of[1:] != row_of[:-1]))
            )
            sig = np.minimum.reduceat(hx, seg, axis=1)  # (num_hashes, n_docs)
            out_rows = row_of[seg]
            out_ids = ids.take(pa.array(out_rows, pa.int64()))
            if isinstance(out_ids, pa.ChunkedArray):
                out_ids = out_ids.combine_chunks()
            # null text folds exactly like the expression path: the doc
            # keeps its row, every signature slot NULL (min over nulls)
            vmask = np.repeat(null_mask[out_rows], num_hashes)
            values = pa.array(sig.T.ravel(), pa.int64(),
                              mask=vmask if vmask.any() else None)
            offsets = pa.array(
                np.arange(len(out_rows) + 1, dtype=np.int32) * num_hashes
            )
            sig_list = pa.ListArray.from_arrays(offsets, values)
            return pa.RecordBatch.from_arrays(
                [out_ids, sig_list], names=[id_col, "sig"]
            )

        for rb in batches:
            nrows = len(rb)
            if nrows == 0:
                continue
            norm_all = pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_trim(rb.column(1), " ")),
                pattern=_JAVA_WS_RE, replacement=" ",
            )
            if isinstance(norm_all, pa.ChunkedArray):
                norm_all = norm_all.combine_chunks()
            ml = pc.max(pc.utf8_length(norm_all), min_count=0).as_py() or 1
            # bound the (rows x max_len) prefix matrices to ~32 MB
            step = max(256, int(32e6 / (8 * (ml + 1))))
            for i in range(0, nrows, step):
                j = min(nrows, i + step)
                yield run(rb.column(0).slice(i, j - i), norm_all.slice(i, j - i))

    out_schema = StructType([
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("sig", ArrayType(LongType()), False),
    ])
    work = _ensure_parallelism(df, id_col).select(F.col(id_col), F.col(text_col))
    return work.mapInArrow(kernel, out_schema)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 4,
    sig_col: str = "sig",
    *,
    sig_len: int,
) -> DataFrame:
    """Band the signatures and emit candidate pairs that collide in >=1 band.

    groupBy (band_idx, band_hash) keeps candidate generation linear in the
    corpus; only same-bucket docs are paired. `sig_len` (the signature
    length, i.e. num_hashes) is REQUIRED so this stays a pure plan
    transformation — Spark's array type does not carry a length, and a
    driver probe here would put a job inside any caller's loop.
    """
    rows_per_band = sig_len // bands
    banded = sig_df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band)).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bh")
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bh"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidate
    pairs -> estimated jaccard (signature agreement) >= threshold.

    The signatures DataFrame feeds three consumers (both sides of the
    banded self-join plus the agreement join); it is persisted so the
    shingle explode + 16-hash fold — the expensive part — runs once, not
    three times. The cached rows are NARROW (id + num_hashes longs), the
    shape where caching wins (wide deserialized text rows would cost ~10x
    the recompute)."""
    sigs = _take_cache(minhash_signatures(df, id_col, text_col, num_hashes, n, seed))
    # Eagerly pin the cache: AQE submits the band stages and both
    # agreement-join sides concurrently, and scans of a not-yet-
    # materialized cache stampede — event logs showed FOUR concurrent
    # copies of the signature kernel. persist() alone is not a barrier.
    sigs.count()
    cands = lsh_candidate_pairs(sigs, id_col, bands, sig_len=num_hashes)
    a = sigs.withColumnsRenamed({id_col: "id_a", "sig": "sig_a"})
    b = sigs.withColumnsRenamed({id_col: "id_b", "sig": "sig_b"})
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash: per token, a `bits`-bit token hash votes +1/-1 per bit
    position; the sign of each bit's vote sum forms the fingerprint.
    Output: (id, simhash long). One explode + one groupBy with `bits`
    conditional sums — all codegen'd.

    Token hash: bits<=32 uses the polynomial rolling hash (DuckDB-oracle
    expressible); bits=64 uses JVM-native xxhash64 — a rolling hash only
    accumulates ~5 bits of entropy per character, so short tokens would
    leave the upper fingerprint bits constant-zero and the high bands of
    `simhash_near_dups` degenerate (one bucket holding the whole corpus).
    xxhash64 avalanches all 64 bits regardless of token length."""
    df = _ensure_parallelism(df, id_col)
    if bits <= 32:
        return _simhash_arrow(df, id_col, text_col, bits)
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")).alias("w"),
    )
    tok = tok.withColumn(
        "h",
        F.xxhash64(F.col("w")) if bits == 64 else rolling_hash(F.col("w"), mod=2**bits),
    )
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    acc = F.lit(0).cast("long")
    for i in range(bits):
        # bit 63 is the sign bit: 2**63 overflows a long literal, so add
        # long-min (same two's-complement bit pattern; cannot overflow since
        # bits 0..62 sum to < 2**63)
        weight = -(2**63) if i == 63 else 2**i
        acc = acc + F.when(F.col(f"b{i}") > 0, F.lit(weight).cast("long")).otherwise(0)
    return votes.select(id_col, acc.alias("simhash"))


def _simhash_arrow(df: DataFrame, id_col: str, text_col: str, bits: int) -> DataFrame:
    """bits<=32 SimHash in one vectorized kernel, zero shuffles: token
    rolling hashes (mod 2^bits) come from the document's prefix-hash array
    (every token is a substring of the normalized text — Horner prefix
    differences are exact for any power-of-two modulus via masking), bit
    votes are a segmented popcount, and each document emits its final
    fingerprint directly (one input row per doc, so no groupBy). Matches
    the expression formulation bit-for-bit, including the no-row output
    for NULL text (explode of a null array emits nothing) and the
    all-votes-negative zero fingerprint for empty text."""
    import pyarrow as pa

    from pyspark.sql.types import LongType, StructField, StructType

    id_field = df.schema[id_col]
    nbits = int(bits)

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        MASK = np.int64((1 << nbits) - 1)

        def run(ids, norm):
            nrows = len(ids)
            keep = ~pc.is_null(norm).to_numpy(zero_copy_only=False)
            doc_cp = pc.utf8_length(pc.fill_null(norm, "")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            norm_f = pc.fill_null(norm, "")
            if isinstance(norm_f, pa.ChunkedArray):
                norm_f = norm_f.combine_chunks()
            max_len = int(doc_cp.max()) if nrows else 0
            if max_len == 0:
                cp = np.zeros((nrows, 0), dtype=np.int64)
            elif pc.all(pc.string_is_ascii(norm_f), min_count=0).as_py():
                buf = np.frombuffer(norm_f.buffers()[2], dtype=np.uint8)
                offs = np.frombuffer(norm_f.buffers()[1], dtype=np.int32).astype(np.int64)
                offs = offs[norm_f.offset: norm_f.offset + nrows + 1]
                starts_b = offs[:-1]
                gather = starts_b[:, None] + np.arange(max_len)[None, :]
                np.minimum(gather, np.maximum(offs[1:, None] - 1, starts_b[:, None]),
                           out=gather)
                cp = buf[gather].astype(np.int64) if len(buf) else np.zeros(
                    (nrows, max_len), dtype=np.int64
                )
                cp[np.arange(max_len)[None, :] >= doc_cp[:, None]] = 0
            else:
                u = np.array(norm_f.to_pylist(), dtype=f"U{max(max_len, 1)}")
                cp = u.view(np.uint32).reshape(nrows, -1).astype(np.int64)
            # prefix hashes mod 2^bits (mask keeps Horner exact)
            H = np.zeros((nrows, max_len + 1), dtype=np.int64)
            acc = np.zeros(nrows, dtype=np.int64)
            for j in range(max_len):
                acc = np.where(j < doc_cp, (acc * 31 + cp[:, j]) & MASK, acc)
                H[:, j + 1] = acc
            pow31 = np.empty(max_len + 1, dtype=np.int64)
            pow31[0] = 1
            for j in range(1, max_len + 1):
                pow31[j] = (pow31[j - 1] * 31) & MASK
            toks = pc.split_pattern(norm_f, " ")
            m = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            tlen = pc.utf8_length(pc.list_flatten(toks)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            tok_doc_start = np.concatenate(([0], np.cumsum(m)))
            pos_global = np.concatenate(([0], np.cumsum(tlen + 1)))[:-1]
            pos_in_doc = pos_global - np.repeat(pos_global[tok_doc_start[:-1]], m)
            row_of = np.repeat(np.arange(nrows), m)
            sub_a = pos_in_doc
            sub_b = pos_in_doc + tlen
            # int64 wraparound is arithmetic mod 2^64; masking afterwards
            # yields exact mod 2^bits for any power-of-two modulus
            h = (H[row_of, sub_b] - H[row_of, sub_a] * pow31[tlen]) & MASK
            # bit votes: ones_i per doc via segmented sums of unpacked bits
            hb = np.empty((len(h), nbits), dtype=np.int8)
            for i in range(nbits):
                hb[:, i] = (h >> np.int64(i)) & np.int64(1)
            ones = np.add.reduceat(hb, tok_doc_start[:-1], axis=0, dtype=np.int64)
            ones[m == 0] = 0  # defensive; split always yields >=1 token
            votes_pos = (2 * ones) > m[:, None]  # sum(+1/-1) > 0
            weights = (1 << np.arange(nbits, dtype=np.int64))
            sh = (votes_pos * weights[None, :]).sum(axis=1).astype(np.int64)
            out_ids = ids.filter(pa.array(keep))
            sh = sh[keep]
            if isinstance(out_ids, pa.ChunkedArray):
                out_ids = out_ids.combine_chunks()
            return pa.RecordBatch.from_arrays(
                [out_ids, pa.array(sh, pa.int64())], names=[id_col, "simhash"]
            )

        for rb in batches:
            nrows = rb.num_rows
            if nrows == 0:
                continue
            norm_all = pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_trim(rb.column(1), " ")),
                pattern=_JAVA_WS_RE, replacement=" ",
            )
            if isinstance(norm_all, pa.ChunkedArray):
                norm_all = norm_all.combine_chunks()
            ml = pc.max(pc.utf8_length(norm_all), min_count=0).as_py() or 1
            step = max(256, int(32e6 / (8 * (ml + 1))))
            for i in range(0, nrows, step):
                j = min(nrows, i + step)
                out = run(rb.column(0).slice(i, j - i), norm_all.slice(i, j - i))
                if out.num_rows:
                    yield out

    out_schema = StructType([
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("simhash", LongType(), False),
    ])
    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(kernel, out_schema)


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: documents whose fingerprints differ in at
    most `max_hamming` bit positions, id_a < id_b. Output:
    (id_a, id_b, hamming).

    Candidate generation is band rotation (pigeonhole): split the
    `bits`-bit key into `max_hamming + 1` contiguous bands — two keys
    within hamming distance k MUST agree exactly on at least one band, so
    candidates are pairs equal on some (band_idx, band_value). That keeps
    candidate generation a groupBy (linear in the corpus, like the MinHash
    banding above), never an all-pairs join; exact hamming is then
    verified with bit_count(a XOR b) on the candidates only.

    Scale note: a band carries bits/(k+1) bits of key (8 bits at the
    32/3 default), so band-bucket sizes are corpus/256 in the worst case —
    use bits=64 (xxhash64 token hashing; all bands uniformly populated)
    for billion-doc corpora to keep buckets bounded."""
    if not 0 <= max_hamming < bits:
        raise ValueError(f"max_hamming must be in [0, {bits}), got {max_hamming}")
    fps = _take_cache(simhash(df, id_col, text_col, bits))
    # Eagerly pin (see minhash_near_dups): concurrent AQE stages over an
    # unmaterialized cache each recompute the fingerprint kernel.
    fps.count()
    nbands = max_hamming + 1
    w = bits // nbands
    # contiguous bands; the last band absorbs the remainder bits
    widths = [w] * (nbands - 1) + [bits - w * (nbands - 1)]
    offs = [w * i for i in range(nbands)]
    banded = fps.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), offs[i])
                        # a full-width band's all-ones mask is -1 as a long
                        .bitwiseAND(F.lit(-1 if widths[i] == 64 else (1 << widths[i]) - 1))
                        .alias("bv"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bv")
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bv"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    a = fps.withColumnsRenamed({id_col: "id_a", "simhash": "sh_a"})
    b = fps.withColumnsRenamed({id_col: "id_b", "simhash": "sh_b"})
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def cluster_dups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """Resolve candidate PAIRS into transitive near-dup CLUSTERS:
    connected components over the pair graph, cluster_id = smallest doc id
    in the component. Output: (doc_id, cluster_id, is_canonical) — one row
    per doc that appears in >=1 pair; is_canonical marks the kept
    representative (the smallest id). The same "group then collapse" shape
    as the reference's keyed assembly fold (archive/manager.go:57-63),
    applied to the dup graph instead of archive members.

    Algorithm: distributed min-label propagation with POINTER JUMPING —
    each round every node takes the min label over {self} ∪ neighbor
    labels ∪ its label's OWN label (path halving), so convergence is
    O(log diameter) rounds, not O(diameter); near-dup components are
    shallow but adversarial chains (A~B~C~...) stay cheap anyway. Each
    round is two shuffles keyed by node id; lineage is truncated per round
    (localCheckpoint) so the plan does not grow with iterations. The
    fixpoint test rides the SAME job: an `observe()` metric (changed-row
    count) is collected while the eager localCheckpoint materializes the
    round — one job per round, no separate count pass."""
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("nmin"))
        .select("node", F.least("node", "nmin").alias("lbl"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iters):
            nbr = (
                edges.join(labels.withColumnsRenamed({"node": "u", "lbl": "ulbl"}), "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("ulbl").alias("nlbl"))
            )
            # pointer jump: my label's current label (labels is a function,
            # one row per node, so this join cannot fan out)
            jump = labels.select(F.col("node").alias("lbl"), F.col("lbl").alias("jlbl"))
            obs = Observation()
            new = (
                labels.join(nbr, "node", "left")
                .join(jump, "lbl", "left")
                .select(
                    "node",
                    F.least(
                        "lbl",
                        F.coalesce("nlbl", "lbl"),
                        F.coalesce("jlbl", "lbl"),
                    ).alias("_new"),
                    "lbl",
                )
                .observe(
                    obs,
                    F.sum((F.col("_new") != F.col("lbl")).cast("long")).alias(
                        "changed"
                    ),
                )
                .select("node", F.col("_new").alias("lbl"))
                .localCheckpoint()
            )
            labels = new
            if int(obs.get["changed"] or 0) == 0:
                break
        else:
            raise RuntimeError(
                f"cluster_dups did not converge in {max_iters} rounds — "
                "pathological component diameter; raise max_iters"
            )
    finally:
        edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("node") == F.col("lbl")).alias("is_canonical"),
    )


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Corpus-level dedup: resolve `pairs` to clusters and keep ONE
    representative per cluster (the smallest id) plus every doc that
    appears in no pair. Same columns as `df`."""
    clusters = cluster_dups(pairs, id_a, id_b)
    drop = clusters.filter(~F.col("is_canonical")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def hyperplane_matrix(hyperplanes: int, dim: int, seed: int = 7):
    """Deterministic random-hyperplane matrix (hyperplanes x dim). Exposed
    so oracles can restate the exact same bucket function."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(hyperplanes, dim).astype(float)


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    hyperplanes: int = 8,
    seed: int = 7,
    dim: int | None = None,
    exact: bool = False,
    tables: int = 1,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= threshold, id_a < id_b).

    DEFAULT is the scale path: random-hyperplane bucket join — vectors must
    agree on all `hyperplanes` sign bits (of at least one of `tables`
    independent plane sets: OR-amplification raises recall without
    shrinking buckets) before any cosine is computed. The quadratic
    brute-force self-join is the exactness baseline ONLY and must be
    requested explicitly with `exact=True` — calling this operator with
    defaults never plans a cross join. `dim` (the embedding dimension) is
    REQUIRED on the LSH path: the hyperplane matrix is built driver-side
    and the array type does not carry a length, so inferring it would put
    a driver probe job inside any caller's loop."""
    from go_tfdata_spark.functions.vectors import cosine_similarity

    df = _ensure_parallelism(df, id_col)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        joined = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        return (
            joined.withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )
    if hyperplanes <= 0:
        raise ValueError(
            "hyperplanes must be positive for the LSH path; "
            "pass exact=True to opt into the quadratic baseline"
        )
    if dim is None:
        raise ValueError(
            "dim (embedding dimension) is required for the LSH path — "
            "no driver probe is ever run; pass exact=True for the "
            "quadratic baseline if you cannot know the dimension"
        )

    def bucket(vc, planes):
        out = F.lit(0)
        for j in range(hyperplanes):
            dot = F.aggregate(
                F.zip_with(
                    vc,
                    F.array(*[F.lit(float(x)) for x in planes[j]]),
                    lambda u, w: u * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            out = out + (dot > 0).cast("int") * (2**j)
        return out

    if tables == 1:
        # single table: carry the vectors through the bucket join — one join
        planes = hyperplane_matrix(hyperplanes, dim, seed)
        at = a.withColumn("bkt", bucket(F.col("va"), planes))
        bt = b.withColumn("bkt", bucket(F.col("vb"), planes))
        joined = at.join(bt, "bkt").filter(F.col("id_a") < F.col("id_b"))
        return (
            joined.withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )
    # OR-amplified: slim (id, bucket) joins per table, dedup the candidate
    # pair set, THEN fetch vectors once for the surviving pairs.
    cand = None
    for t in range(tables):
        planes = hyperplane_matrix(hyperplanes, dim, seed + 101 * t)
        at = a.select("id_a", bucket(F.col("va"), planes).alias("bkt"))
        bt = b.select("id_b", bucket(F.col("vb"), planes).alias("bkt"))
        p = at.join(bt, "bkt").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        cand = p if cand is None else cand.unionByName(p)
    return (
        cand.distinct().join(a, "id_a").join(b, "id_b")
        .withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
