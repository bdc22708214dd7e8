"""Parity gate: the committed fixtures/ parquet must equal the live
pipeline's flattened output — the DuckDB oracles for x06/x07/x10/x17
are only valid while this holds. Regenerate with
``python scripts/freeze_fixtures.py`` after pipeline changes."""

import pandas as pd
import pytest

from paperslicer_spark.fixtures import TABLES, build_all, read_all


def test_frozen_fixtures_match_live_pipeline(spark):
    live = build_all(spark)
    frozen = read_all()
    for name in TABLES:
        a = live[name].reset_index(drop=True)
        b = frozen[name].reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
        except AssertionError as e:  # pragma: no cover - diagnostic
            pytest.fail(f"fixture {name} is stale — rerun "
                        f"scripts/freeze_fixtures.py\n{e}")


def test_truth_fixture_hits_every_branch():
    t = read_all()["truth"]
    assert len(t) == 24
    assert (~t["abs_present"]).any()          # absent-abstract branch
    assert t["exp_title"].str.startswith("Unrelated").any()
    assert t["exp_doi"].str.endswith(".v2").any()
    assert (t["exp_sections"].map(len) > 0).any()
