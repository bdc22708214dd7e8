"""Regenerate the committed extraction-record fixtures under fixtures/.

See paperslicer_spark/fixtures.py for what they are and why. Run after
any change to the extraction pipeline or the synthetic corpus; the
parity test (tests/test_fixture_freeze.py) fails until fixtures match
the live pipeline again.

Usage: python scripts/freeze_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paperslicer_spark.fixtures import FIXTURE_DIR, build_all, write_all
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
    spark.stop()


if __name__ == "__main__":
    main()
