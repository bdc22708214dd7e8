"""Regenerate the committed extraction-record fixtures under fixtures/.

See paperslicer_spark/fixtures.py for what they are and why. Run after
any change to the extraction pipeline or the synthetic corpus; the
parity test (tests/test_fixture_freeze.py) fails until fixtures match
the live pipeline again.

Usage: python scripts/freeze_fixtures.py [--ivf]

``--ivf`` additionally retrains and refreezes the IVF centroid model
(fixtures/ivf_centroids.parquet) — a model artifact, not a derived
fixture, so it is NOT refrozen by default (KMeans float reductions are
layout-sensitive; pointless churn on extraction-only changes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paperslicer_spark.fixtures import (FIXTURE_DIR, build_all,
                                        build_ivf_centroids, write_all)
from paperslicer_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="freeze-fixtures", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    frames = build_all(spark)
    write_all(frames)
    for name, pdf in frames.items():
        print(f"{name:14s} {len(pdf):5d} rows -> "
              f"{os.path.join(FIXTURE_DIR, name + '.parquet')}")
    if "--ivf" in sys.argv[1:]:
        cents = build_ivf_centroids(spark)
        path = os.path.join(FIXTURE_DIR, "ivf_centroids.parquet")
        cents.to_parquet(path, index=False)
        print(f"ivf_centroids  {len(cents):5d} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
