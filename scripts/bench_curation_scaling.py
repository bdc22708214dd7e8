"""Scaling probe for the curation operators (round-3 additions):
runs the quality pass, LSH pair generation, and component clustering
at two pinned parallelism levels (local[8] vs local[32], fresh JVM
each, same 8g heap) over a 10x-replicated documents corpus and reports
throughput at both plus the efficiency ratio.

Same methodology as scripts/bench_scaling.py (taskset pinning so the
small "cluster" cannot borrow idle cores); corpus = sf0.1 documents
replicated 10x with per-copy id remap and a per-copy text suffix (so
replicas are near- but not exact dups — the LSH pair structure stays
realistic rather than degenerate).

Usage: python scripts/bench_curation_scaling.py
Env: CURATION_CORES="8,32"  CURATION_REPEATS=2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = [int(c) for c in os.environ.get("CURATION_CORES", "8,32").split(",")]
REPEATS = int(os.environ.get("CURATION_REPEATS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("CURATION_REPLICAS", "10"))
JOBS = set(os.environ.get("CURATION_JOBS", "quality,lsh_pairs,cluster").split(","))


def corpus(spark) -> str:
    from pyspark.sql import functions as F

    path = os.path.join(REPO, ".bench_cache",
                        f"curation_docs_v2_x{REPLICAS}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
        # Near-dup structure is GROUPED, not global: every token gets
        # a per-(replica // 8) suffix, so replicas form 8-member
        # near-dup cliques (differing only in the trailing " repN"
        # shingle) and share NO shingles across groups. Flat "all
        # replicas near-identical" made LSH candidate generation
        # quadratic in REPLICAS (x160 → ~63M pairs — a degenerate
        # corpus, not a probe), and a fixed id stride of 16 collided
        # doc_ids above 16 replicas (800k rows → ~80k distinct ids),
        # chaining unrelated docs into 20-round CC components.
        grp = (F.col("rep") / 8).cast("int").cast("string")
        big = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
                F.concat(
                    F.regexp_replace(F.col("text"), r"(\S+)",
                                     F.concat(F.lit("$1g"), grp)),
                    F.lit(" rep"), F.col("rep").cast("string"),
                ).alias("text"),
                "lang", "source",
            )
            .repartition(64)
        )
        big.write.mode("overwrite").parquet(path)
    return path


def worker(cores: int) -> None:
    from paperslicer_spark.operators import dedup as DD
    from paperslicer_spark.operators.curation import gopher_quality
    from paperslicer_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark(app_name=f"curation-scaling-{cores}",
                      master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus(spark))
    n_docs = docs.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JIT + shuffle paths on a sample (excluded from timing)
    force(gopher_quality(docs.sample(0.05, seed=7), "doc_id", "text"))
    force(DD.minhash_lsh_pairs(docs.sample(0.02, seed=7), "doc_id", "text"))

    def best_of(fn):
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    out = {"cores": cores, "n_docs": n_docs}
    if "pdedup" in JOBS:
        # round-4 op: corpus-wide paragraph dedup over 8-token-window
        # paragraphs synthesized from the text (the x40 shape)
        from pyspark.sql import functions as F

        from paperslicer_spark.functions.text_stats import bind
        from paperslicer_spark.operators.curation import paragraph_dedup

        paras = bind(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.size(t) - 1, F.lit(8)),
                lambda st: F.array_join(F.slice(t, st + 1, 8), " ")))
        withp = docs.select(
            "doc_id", F.array_join(paras, "\n\n").alias("text"))
        sec = best_of(lambda: force(
            paragraph_dedup(withp, "doc_id", "text")))
        out["pdedup_sec"] = round(sec, 3)
        out["pdedup_docs_per_sec"] = round(n_docs / sec, 1)
    if "decon" in JOBS:
        # round-4 op: decontamination vs a 1/16 held-out slice
        from pyspark.sql import functions as F

        from paperslicer_spark.operators.dedup import decontaminate

        bench = docs.where(F.col("doc_id") % 16 == 0)
        train = docs.where(F.col("doc_id") % 16 != 0)
        sec = best_of(lambda: force(
            decontaminate(train, bench, "doc_id", "text", n=4,
                          max_doc_freq=200)))
        out["decon_sec"] = round(sec, 3)
        out["decon_docs_per_sec"] = round(n_docs / sec, 1)
    if "quality" in JOBS:
        sec = best_of(lambda: force(gopher_quality(docs, "doc_id", "text")))
        out["quality_sec"] = round(sec, 3)
        out["quality_docs_per_sec"] = round(n_docs / sec, 1)
    if "c4" in JOBS or "repstats" in JOBS:
        # round-5 zero-shuffle HOF ops over synthesized multi-line text
        from pyspark.sql import functions as F

        from paperslicer_spark.functions.text_stats import bind
        from paperslicer_spark.operators.curation import (c4_line_filter,
                                                          repetition_stats)

        fives = bind(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.size(t) - 1, F.lit(5)),
                lambda s: F.array_join(F.slice(t, s + 1, 5), " ")))
        withl = docs.select(
            "doc_id", F.array_join(fives, "\n").alias("text"))
        if "c4" in JOBS:
            sec = best_of(lambda: force(
                c4_line_filter(withl, "doc_id", "text", min_words=3)))
            out["c4_sec"] = round(sec, 3)
            out["c4_docs_per_sec"] = round(n_docs / sec, 1)
        if "repstats" in JOBS:
            sec = best_of(lambda: force(
                repetition_stats(withl, "doc_id", "text")))
            out["repstats_sec"] = round(sec, 3)
            out["repstats_docs_per_sec"] = round(n_docs / sec, 1)
    if "lsh_pairs" in JOBS:
        sec = best_of(lambda: force(
            DD.minhash_lsh_pairs(docs, "doc_id", "text")))
        out["lsh_pairs_sec"] = round(sec, 3)
        out["lsh_docs_per_sec"] = round(n_docs / sec, 1)
    if "cluster" in JOBS:
        # clustering timed over materialized pairs (isolates the loop)
        pairs = DD.minhash_lsh_pairs(docs, "doc_id", "text") \
            .localCheckpoint(eager=True)
        out["n_pairs"] = pairs.count()
        sec = best_of(lambda: force(DD.connected_components(pairs)))
        out["cluster_sec"] = round(sec, 3)
    print(json.dumps(out))
    spark.stop()


def orchestrate() -> None:
    results = {}
    for cores in CORES:
        pin = ["taskset", "-c", f"0-{cores - 1}"] if os.path.exists(
            "/usr/bin/taskset") else []
        out = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__),
                   "--worker", str(cores)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = CORES[0], CORES[-1]
    ratio = hi / lo
    summary = {"cores": CORES, "ratio": ratio}
    for job in [j for j in ("quality", "lsh_pairs", "cluster", "c4", "repstats",
                            "pdedup", "decon") if j in JOBS]:
        t_lo = results[lo][f"{job}_sec"]
        t_hi = results[hi][f"{job}_sec"]
        summary[f"{job}_efficiency"] = round((t_lo / t_hi) / ratio, 3)
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "curation_scaling.json"),
              "w") as f:
        json.dump({"results": results, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        orchestrate()
