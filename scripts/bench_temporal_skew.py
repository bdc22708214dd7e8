"""Hot-key skew probe for the temporal joins (round-4 verdict stretch
item #9): asof_join and range_join both shuffle on the raw key, so one
pathological key (one instrument, one user) serializes its per-key
window / bucket work into a single task. Measure a uniform corpus vs
one where a single key owns 20% of the rows, same total size.

Usage: python scripts/bench_temporal_skew.py
Env: SKEW_ROWS=5000000  SKEW_REPEATS=2
Writes BENCH/temporal_skew.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SKEW_ROWS", "2000000"))
REPEATS = int(os.environ.get("SKEW_REPEATS", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.temporal import asof_join, range_join
    from paperslicer_spark.session import get_spark

    spark = get_spark(app_name="temporal-skew", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(hot_frac: float):
        # left = "clicks", right = "quotes"; ts in seconds over a day
        base = spark.range(N)
        key = F.when(
            F.pmod(F.col("id"), F.lit(1000)) <
            F.lit(int(hot_frac * 1000)),
            F.lit(0),
        ).otherwise(F.pmod(
            F.col("id") * 2654435761, F.lit(10_000)))
        ts = (F.pmod(F.col("id") * 48271, F.lit(86_400))).cast("double")
        df = base.select(
            F.col("id").alias("event_id"), key.alias("user"),
            ts.alias("ts"),
        ).localCheckpoint(eager=True)
        left = df.where(F.col("event_id") % 2 == 0)
        right = df.where(F.col("event_id") % 2 == 1) \
            .withColumnRenamed("event_id", "tag")
        return left, right

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def best_of(fn):
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    out = {"n_rows": N}
    for label, frac in (("uniform", 0.0), ("hot20", 0.2)):
        left, right = corpus(frac)
        force(asof_join(left.sample(0.01, seed=7), right.sample(0.01, seed=7),
                        on="user", ts_col="ts"))  # warm-up
        out[f"asof_{label}_sec"] = best_of(
            lambda: force(asof_join(left, right, on="user", ts_col="ts")))
        out[f"range_{label}_sec"] = best_of(
            lambda: force(range_join(left, right, on="user", ts_col="ts",
                                     lower=0.0, upper=5.0)))
    out["asof_skew_penalty"] = round(
        out["asof_hot20_sec"] / out["asof_uniform_sec"], 2)
    out["range_skew_penalty"] = round(
        out["range_hot20_sec"] / out["range_uniform_sec"], 2)
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "temporal_skew.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
