"""Scaling-efficiency measurement (north_rule evidence).

No real cluster exists in this sandbox, so the rule's two cluster
sizes (N vs 4N executors) are evidenced by running the IDENTICAL job
at two local parallelism levels — ``local[8]`` vs ``local[32]`` — on
the same cached input, each in a fresh JVM (subprocess), reporting
turns/sec at both and ``efficiency = (tp_32 / tp_8) / 4``.

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

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "6000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))


def corpus(spark) -> str:
    from paperslicer_spark.sources.transcripts import transcripts_df

    path = os.path.join(REPO, ".bench_cache", f"scaling_n{N_DOCS}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        transcripts_df(spark, N_DOCS, seed=42, skew_every=500, skew_mult=25,
                       partitions=64).write.mode("overwrite").parquet(path)
    return path


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.spans import extract_turn_spans
    from paperslicer_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    path = corpus(spark)
    turns = spark.read.parquet(path)
    n_turns = turns.count()
    # warm-up (JIT + Python workers), excluded from measurement
    extract_turn_spans(turns.limit(2000)).agg(F.count("*")).collect()
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        extract_turn_spans(turns).agg(
            F.count("*"), F.sum(F.length("clean_text"))).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"cores": cores, "n_turns": n_turns,
                      "sec": round(best, 3),
                      "turns_per_sec": round(n_turns / best, 1)}))
    spark.stop()


def orchestrate() -> None:
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)
    tp8 = results[8]["turns_per_sec"]
    tp32 = results[32]["turns_per_sec"]
    eff = (tp32 / tp8) / 4
    summary = {
        "n_turns": results[8]["n_turns"],
        "local8_turns_per_sec": tp8,
        "local32_turns_per_sec": tp32,
        "speedup_4x_cores": round(tp32 / tp8, 3),
        "scaling_efficiency": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        orchestrate()
