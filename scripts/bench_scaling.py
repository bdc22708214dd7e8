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
# subset of jobs to measure (comma list), e.g. SCALING_JOBS=shuffle for
# the cheap repeated runs that establish records_shuffle's run-to-run
# spread; default measures everything
JOBS = set(os.environ.get(
    "SCALING_JOBS", "spans,records,shuffle,agg").split(","))


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
    if "agg" in JOBS:
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

    out = {"cores": cores, "n_turns": n_turns, "n_docs": n_docs}
    if "spans" in JOBS:
        sec = best_of(lambda: force(extract_turn_spans(turns)))
        out["spans_sec"] = round(sec, 3)
        out["spans_turns_per_sec"] = round(n_turns / sec, 1)
    if "records" in JOBS:
        sec = best_of(lambda: force(sections_long(
            parse_turns_fused(turns, conv_aligned=True))))
        out["records_sec"] = round(sec, 3)
        out["records_docs_per_sec"] = round(n_docs / sec, 1)
    if "shuffle" in JOBS:
        sec = best_of(lambda: force(sections_long(parse_turns_fused(turns))))
        out["shuffle_sec"] = round(sec, 3)
        out["shuffle_docs_per_sec"] = round(n_docs / sec, 1)
    if "agg" in JOBS:
        sec = best_of(lambda: force(sections_long(
            parse_documents(assemble_documents(turns, skew_threshold=64)))))
        out["agg_sec"] = round(sec, 3)
        out["agg_docs_per_sec"] = round(n_docs / sec, 1)
    print(json.dumps(out))
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

    job_metric = {"spans": "spans_turns_per_sec",
                  "records": "records_docs_per_sec",
                  "shuffle": "shuffle_docs_per_sec",
                  "agg": "agg_docs_per_sec"}
    job_name = {"spans": "spans", "records": "records",
                "shuffle": "records_shuffle", "agg": "records_salted_agg"}
    measured = [j for j in ("spans", "records", "shuffle", "agg")
                if j in JOBS]
    summary = {
        "n_turns": results[lo]["n_turns"],
        "cores": CORES,
        # throughput at every measured point (monotonicity evidence)
        "curve": {job_metric[j]: {c: results[c][job_metric[j]]
                                  for c in CORES} for j in measured},
        "pass_ge_0.8": {},
    }
    for j in measured:
        m = job_metric[j]
        unit = "turns_per_sec" if j == "spans" else "docs_per_sec"
        summary[job_name[j]] = {
            f"small_{unit}": results[lo][m],
            f"big_{unit}": results[hi][m],
            "scaling_efficiency": eff(m),
        }
        summary["pass_ge_0.8"][job_name[j]] = eff(m) >= 0.8
    print(json.dumps(summary))
    if len(measured) == 4:
        # only a FULL measurement overwrites the artifact of record;
        # subset runs (spread probes) just print
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
            json.dump({"runs": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        orchestrate()
