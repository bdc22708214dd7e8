"""Media post-processing (F7/W4/W5/§2.10-2.11) and J3 resolver join."""

from pyspark.sql import functions as F


def _media_df(spark):
    rows = [
        # conv, kind, pos, label, caption, path, source, coords
        ("c1", "figure", 0, "Figure 1", "cap1", None, "tei", "1,10.0,10.0,50.0,40.0"),
        ("c1", "figure", 1, "Figure 2", "cap2", None, "page-image", "1,0.0,0.0,800.0,80.0"),  # banner
        ("c1", "figure", 2, "Figure 3", "cap3", None, "page-image", "2,0.0,0.0,100.0,100.0"),
        ("c1", "figure", 3, "Figure 4", "cap4", None, "grobid+crop", "2,5.0,5.0,40.0,40.0"),  # beats page-image on p2
        ("c1", "table", 0, "Table 1", "t", None, "tei", None),
        ("c2", "figure", 0, "Figure 1", "x", None, "tei", None),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, kind string, pos int, label string, "
              "caption string, path string, source string, coords string")


def test_coords_struct(spark):
    from paperslicer_spark.operators.media import with_typed_coords

    out = {(r["conv_id"], r["label"]): r["coords_t"]
           for r in with_typed_coords(_media_df(spark)).collect()}
    assert out[("c1", "Figure 1")]["page"] == 1
    assert out[("c1", "Figure 1")]["w"] == 50.0
    assert out[("c1", "Table 1")] is None


def test_filter_media_banner_and_preference(spark):
    from paperslicer_spark.operators.media import filter_media

    kept = {r["label"] for r in filter_media(_media_df(spark)).collect()}
    assert "Figure 2" not in kept          # banner aspect dropped
    assert "Figure 4" in kept              # crop wins page 2
    assert "Figure 3" not in kept          # page-image loses to crop
    assert {"Figure 1", "Table 1"} <= kept # coords-less rows untouched


def test_cap_per_document(spark):
    from paperslicer_spark.operators.media import cap_per_document

    rows = [("c", "figure", i, f"F{i}", None, None, "tei", None)
            for i in range(10)]
    df = spark.createDataFrame(
        rows, "conv_id string, kind string, pos int, label string, "
              "caption string, path string, source string, coords string")
    out = cap_per_document(df, max_items=3).collect()
    assert sorted(r["pos"] for r in out) == [0, 1, 2]


def _records_df(spark):
    rows = [
        # needs backfill, crossref-by-doi hit (JATS stripped)
        ("r1", "10.1/a", None, None, {"introduction": "i"}),
        # abstract long enough → untouched
        ("r2", "10.1/b", "T2", "J2", {"abstract": "x" * 40}),
        # no doi; crossref-by-title hit backfills doi/journal too
        ("r3", None, "Known Title", None, {}),
        # only pubmed knows it
        ("r4", "10.1/d", "T4", None, {"abstract": "short"}),
        # nobody knows it
        ("r5", None, "Mystery", None, {}),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, doi string, title string, journal string, "
              "sections map<string,string>")


def test_ensure_abstract_join(spark):
    from paperslicer_spark.operators.resolver import ensure_abstract

    crossref = spark.createDataFrame(
        [("10.1/a", "<jats:p>Alpha&amp;Beta abstract body long enough.</jats:p>",
          "10.1/a", "Title A", "Journal A"),
         ("known title", "Title-matched abstract that is long enough!",
          "10.9/t", "Known Title", "Journal T")],
        "key string, abstract string, doi string, title string, journal string")
    pubmed = spark.createDataFrame(
        [("10.1/d", "Pubmed abstract body that is long enough too.")],
        "key string, abstract string")

    out = {r["conv_id"]: r for r in
           ensure_abstract(_records_df(spark), crossref, pubmed).collect()}
    assert out["r1"]["sections"]["abstract"] == \
        "Alpha&Beta abstract body long enough."
    assert out["r1"]["title"] == "Title A" and out["r1"]["journal"] == "Journal A"
    assert out["r2"]["sections"]["abstract"] == "x" * 40  # untouched
    assert out["r3"]["sections"]["abstract"].startswith("Title-matched")
    assert out["r3"]["doi"] == "10.9/t" and out["r3"]["journal"] == "Journal T"
    assert out["r4"]["sections"]["abstract"].startswith("Pubmed")
    assert out["r4"]["journal"] is None   # pubmed backfills abstract only
    assert "abstract" not in out["r5"]["sections"]


def test_ensure_abstract_gating(spark):
    """Reference resolver.py:22-26 — the Crossref title search runs
    ONLY when the DOI lookup returned no item; PubMed searches by DOI
    whenever one exists (never by title for doi-ed records)."""
    from paperslicer_spark.operators.resolver import ensure_abstract

    rows = [
        # doi-keyed Crossref item EXISTS but its abstract is too short:
        # must NOT fall through to the title item — goes to PubMed
        ("g1", "10.2/x", "Titled Gx", None, {}),
        # doi present but unknown everywhere; title known to PubMed only
        # under the title key — reference still searches PubMed BY DOI,
        # so no backfill happens
        ("g2", "10.2/unknown", "Pm Title", None, {}),
    ]
    records = spark.createDataFrame(
        rows, "conv_id string, doi string, title string, journal string, "
              "sections map<string,string>")
    crossref = spark.createDataFrame(
        [("10.2/x", "too short", "10.2/x", "Title X", "Journal X"),
         ("titled gx", "Title-keyed abstract long enough to accept!",
          "10.9/wrong", "Titled Gx", "Wrong Journal")],
        "key string, abstract string, doi string, title string, journal string")
    pubmed = spark.createDataFrame(
        [("10.2/x", "Pubmed doi-keyed abstract, long enough to accept."),
         ("pm title", "Pubmed title-keyed abstract, long enough too!")],
        "key string, abstract string")

    out = {r["conv_id"]: r for r in
           ensure_abstract(records, crossref, pubmed).collect()}
    assert out["g1"]["sections"]["abstract"].startswith("Pubmed doi-keyed")
    assert out["g1"]["journal"] is None   # crossref title item not used
    assert "abstract" not in out["g2"]["sections"]
