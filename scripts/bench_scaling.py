"""Scaling-efficiency measurement (north_rule evidence).

No real cluster exists in this sandbox, so the rule's two cluster
sizes (N vs 4N executors) are evidenced by running the IDENTICAL jobs
at two local parallelism levels — ``local[8]`` vs ``local[32]`` — on
the same cached input, each in a fresh JVM (subprocess), reporting
throughput at both and ``efficiency = (tp_32 / tp_8) / 4``.

Four jobs are measured:
- ``spans``   — per-turn span extraction (map-only hot path; turns/sec)
- ``records`` — the flagship fused record pipeline on a conversation-
                aligned layout (the 100 TB deployment: Iceberg table
                bucketed by conv_id — see plans/checkpoint.py): pure
                map, in-UDF assemble+parse, zero shuffle. Alignment is
                runtime-ASSERTED: record count == document count (a
                straddled conversation would emit extra records).
- ``records_shuffle`` — same fused pipeline on an unaligned source
                (hash repartition of raw turns first); the honest
                number when the layout guarantee is absent
- ``records_salted_agg`` — the legacy two-phase salted-agg pipeline
                (collect_list payload shuffle → parse); kept measured
                because its agg stage is the documented non-scaling
                term the fused path removes

Both legs run the IDENTICAL JVM config (8 GB pre-touched heap — the
measured sweet spot; a scaled 32 GB heap costs whole-minute page-
zeroing startup and 2.5× runtime on this kernel) so the comparison
isolates parallelism, exactly as a real cluster holds per-executor
memory constant while adding executors.

Usage:
  python scripts/bench_scaling.py              # orchestrate both runs
  python scripts/bench_scaling.py --worker 8   # one measurement (JSON)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "60000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))
# the N and 4N "cluster sizes" (cores); intermediate points may be
# added via SCALING_CORES=8,16,32 — the rule's efficiency is computed
# between the FIRST and LAST, the rest evidence a monotonic curve
N_SMALL = int(os.environ.get("SCALING_SMALL", "8"))
N_BIG = int(os.environ.get("SCALING_BIG", str(N_SMALL * 4)))
CORES = [int(c) for c in os.environ.get(
    "SCALING_CORES", f"{N_SMALL},{N_BIG}").split(",")]


def corpus(spark) -> str:
    from paperslicer_spark.sources.transcripts import transcripts_df

    path = os.path.join(REPO, ".bench_cache", f"scaling_n{N_DOCS}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        transcripts_df(spark, N_DOCS, seed=42, skew_every=500, skew_mult=25,
                       partitions=128).write.mode("overwrite").parquet(path)
    return path


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.assemble import assemble_documents
    from paperslicer_spark.operators.extract import (
        parse_documents, parse_turns_fused, sections_long)
    from paperslicer_spark.operators.spans import extract_turn_spans
    from paperslicer_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    path = corpus(spark)
    turns = spark.read.parquet(path)
    n_turns = turns.count()
    n_docs = N_DOCS

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up (JIT, Python workers, shuffle paths) — excluded; the
    # first heavy job in a session additionally pays heap pre-touch
    force(extract_turn_spans(turns.limit(5000)))
    force(sections_long(parse_turns_fused(turns.sample(0.05, seed=7))))
    force(sections_long(parse_documents(
        assemble_documents(turns.sample(0.05, seed=7), skew_threshold=64))))

    def best_of(fn):
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    # alignment check: the aligned path must emit exactly one record
    # per conversation (doubles as a warm run for that plan)
    n_rec = parse_turns_fused(turns, conv_aligned=True).count()
    assert n_rec == n_docs, f"layout not conv-aligned: {n_rec} != {n_docs}"

    spans_sec = best_of(lambda: force(extract_turn_spans(turns)))
    records_sec = best_of(lambda: force(sections_long(
        parse_turns_fused(turns, conv_aligned=True))))
    shuffle_sec = best_of(lambda: force(sections_long(
        parse_turns_fused(turns))))
    agg_sec = best_of(lambda: force(sections_long(
        parse_documents(assemble_documents(turns, skew_threshold=64)))))
    print(json.dumps({
        "cores": cores, "n_turns": n_turns, "n_docs": n_docs,
        "spans_sec": round(spans_sec, 3),
        "records_sec": round(records_sec, 3),
        "shuffle_sec": round(shuffle_sec, 3),
        "agg_sec": round(agg_sec, 3),
        "spans_turns_per_sec": round(n_turns / spans_sec, 1),
        "records_docs_per_sec": round(n_docs / records_sec, 1),
        "shuffle_docs_per_sec": round(n_docs / shuffle_sec, 1),
        "agg_docs_per_sec": round(n_docs / agg_sec, 1),
    }))
    spark.stop()


def orchestrate() -> None:
    results = {}
    for cores in CORES:
        # Pin the process to exactly `cores` CPUs: in local mode the
        # JVM executor threads and the pyspark.daemon workers would
        # otherwise borrow the machine's idle cores, silently giving
        # the small "cluster" more than N cores and corrupting the
        # efficiency ratio. A real N-executor cluster has no spare
        # cores to borrow.
        pin = ["taskset", "-c", f"0-{cores - 1}"] if os.path.exists(
            "/usr/bin/taskset") else []
        out = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__),
                   "--worker", str(cores)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = CORES[0], CORES[-1]
    ratio = hi / lo

    def eff(metric):
        return round((results[hi][metric] / results[lo][metric]) / ratio, 3)

    summary = {
        "n_turns": results[lo]["n_turns"],
        "cores": CORES,
        # throughput at every measured point (monotonicity evidence)
        "curve": {m: {c: results[c][m] for c in CORES}
                  for m in ("spans_turns_per_sec", "records_docs_per_sec",
                            "shuffle_docs_per_sec", "agg_docs_per_sec")},
        "spans": {
            "small_turns_per_sec": results[lo]["spans_turns_per_sec"],
            "big_turns_per_sec": results[hi]["spans_turns_per_sec"],
            "scaling_efficiency": eff("spans_turns_per_sec"),
        },
        "records": {
            "small_docs_per_sec": results[lo]["records_docs_per_sec"],
            "big_docs_per_sec": results[hi]["records_docs_per_sec"],
            "scaling_efficiency": eff("records_docs_per_sec"),
        },
        "records_shuffle": {
            "small_docs_per_sec": results[lo]["shuffle_docs_per_sec"],
            "big_docs_per_sec": results[hi]["shuffle_docs_per_sec"],
            "scaling_efficiency": eff("shuffle_docs_per_sec"),
        },
        "records_salted_agg": {
            "small_docs_per_sec": results[lo]["agg_docs_per_sec"],
            "big_docs_per_sec": results[hi]["agg_docs_per_sec"],
            "scaling_efficiency": eff("agg_docs_per_sec"),
        },
        # per-job pass flags — a blended flag would hide one failing job
        "pass_ge_0.8": {
            "spans": eff("spans_turns_per_sec") >= 0.8,
            "records": eff("records_docs_per_sec") >= 0.8,
            "records_shuffle": eff("shuffle_docs_per_sec") >= 0.8,
            "records_salted_agg": eff("agg_docs_per_sec") >= 0.8,
        },
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        orchestrate()
