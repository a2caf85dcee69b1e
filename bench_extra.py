"""Round-8 measurement harness (NOT the driver bench — bench.py is frozen).

Modes:
  python bench_extra.py headline [sf_dir] [rep_count] [query ...]
      Times each headline query the same way bench.py does (df.count()
      after a sf0.001 plan warmup), per-query best-of-N, and writes
      .explain("formatted") for each to plans/r08/<name>_<tag>.txt
      (tag from $PLAN_TAG, default "cur").
  python bench_extra.py cdc <cores> <events> [reps]
      One CDC replay leg via bench.py's own child mode, with
      SPARK_GRAFT_TIMING=1 phase breakdown on stderr.

Methodology matches bench.py (count() sink, shared warmup at sf0.001) so
numbers are comparable with BENCH_r07.json; plan capture uses the same
DataFrame the timed run counts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "lww_latest", "cdc_fold_tombstone", "record_assembly",
    "agg_pricing_summary", "revenue_by_nation", "token_count",
    "quality_score", "lang_id", "dedup_exact", "shingle_jaccard",
    "minhash_near_dups", "simhash", "ann_topk",
]


def _capture_plan(df, name: str, tag: str) -> None:
    os.makedirs("plans/r08", exist_ok=True)
    try:
        plan = df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    with open(f"plans/r08/{name}_{tag}.txt", "w") as f:
        f.write(plan)


def headline(sf_dir: str, reps: int, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    from go_tfdata_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = os.environ.get("PLAN_TAG", "cur")
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        if os.path.isdir(warm_sf):
            try:
                qs[name](spark, warm_sf).count()
            except Exception:
                pass
    qs["lww_latest"](spark, sf_dir).count()
    out = {}
    skip_cap = os.environ.get("SKIP_PLANCAP") == "1"
    for name in names:
        fn = qs[name]
        if not skip_cap:
            # NOTE: building the query here is NOT free for operators with
            # eager cache pinning (shingle_jaccard materializes its pair
            # cache at build time) — the timed rep below would reuse that
            # cache via CacheManager plan matching and read warm. Set
            # SKIP_PLANCAP=1 for cold timings; bench.py itself builds
            # inside its timed window, so the frozen methodology is cold.
            _capture_plan(fn(spark, sf_dir), name, tag)
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print("HEADLINE_RESULT " + json.dumps(
        {k: v["best"] for k, v in out.items()}))


def cdc(cores: int, events: int, reps: int) -> None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_TIMING", "1")
    shared = env.setdefault("SPARK_GRAFT_SHARED_LOG_DIR", "/dev/shm/r8logs")
    os.makedirs(shared, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    # generate shared logs once at full parallelism
    subprocess.run(
        [sys.executable, os.path.join(here, "bench.py"), "--gen-child", "32", str(events)],
        capture_output=True, text=True, env=env, cwd=here,
    )
    for i in range(reps):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py"), "--cdc-child",
             str(cores), str(events)],
            capture_output=True, text=True, env=env, cwd=here,
        )
        wall = time.time() - t0
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        timing = [l for l in r.stderr.splitlines() if l.startswith("TIMING")]
        print(f"--- rep {i} wall={wall:.1f}s rc={r.returncode}")
        for t in timing:
            print(t)
        print(lines[-1] if lines else r.stderr[-2000:], flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        names = sys.argv[4:] or HEADLINE
        headline(sf_dir, reps, names)
    elif mode == "cdc":
        cdc(int(sys.argv[2]), int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else 1)
    else:
        raise SystemExit(f"unknown mode {mode}")
