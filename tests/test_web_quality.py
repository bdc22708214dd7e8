"""canonicalize_urls / url_dup_groups / ranked_auc unit tests.

Both references below are independent re-derivations: URLs go through
``urllib.parse`` (stdlib, a different parser than the regex the
operator uses) and AUC through brute-force pair counting (O(n^2), a
different identity than the rank-sum the operator uses).
"""

import random
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.metrics import ranked_auc
from paperslicer_spark.operators.web import (
    TRACKING_PARAMS, canonicalize_urls, url_dup_groups)


def _ref_canon(url):
    try:
        s = urlsplit(url)
    except ValueError:
        return None
    if not s.scheme or not s.netloc:
        return None
    scheme = s.scheme.lower()
    host = s.hostname or ""
    if host.startswith("www."):
        host = host[4:]
    port = ""
    if s.port is not None and not (
            (scheme == "http" and s.port == 80)
            or (scheme == "https" and s.port == 443)):
        port = f":{s.port}"
    path = s.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    kept = sorted(p for p in s.query.split("&")
                  if p and p.split("=", 1)[0] not in TRACKING_PARAMS)
    q = "&".join(kept)
    return (host, path, q,
            f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else ""))


URLS = [
    "HTTP://WWW.Example.COM:80/Path/3/?utm_source=feed&id=7&b=2&a=1#x",
    "http://example.com/Path/3?a=1&b=2&id=7",
    "https://Sub.Example.org:443/",
    "https://sub.example.org",
    "https://sub.example.org:8443/a/b/?fbclid=XYZ",
    "http://h.io/p?gclid=1&utm_medium=m&utm_campaign=c&ref=rss",
    "http://h.io/p",
    "ftp://files.example.net:21/pub/",
    "not a url",
    "http://ports.example.net:8080/x?z=9&y=8",
]


def test_canonicalize_matches_urllib_reference(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(URLS)],
                               "i int, url string")
    got = {r["i"]: (r["host"], r["path_canon"], r["query_canon"],
                    r["url_canon"])
           for r in canonicalize_urls(df, "url").collect()}
    for i, u in enumerate(URLS):
        ref = _ref_canon(u)
        if ref is None:
            assert got[i] == (None, None, None, None), u
        else:
            assert got[i] == ref, u


def test_tracking_strip_and_param_sort_dedup(spark):
    # rows 0 and 1 canonicalize identically; 5 and 6 likewise
    df = spark.createDataFrame([(i, u) for i, u in enumerate(URLS)],
                               "i int, url string")
    groups = {r["i"]: r["n_dups"]
              for r in url_dup_groups(df, "i", "url").collect()}
    assert groups[0] == groups[1] == 2
    assert groups[5] == groups[6] == 2
    assert groups[2] == groups[3] == 2
    assert groups[9] == 1


def _ref_auc(rows):
    """Brute-force pair counting, per group."""
    out = {}
    groups = {}
    for g, s, lab in rows:
        groups.setdefault(g, []).append((s, lab))
    for g, vals in groups.items():
        pos = [s for s, l in vals if l == 1]
        neg = [s for s, l in vals if l == 0]
        if not pos or not neg:
            out[g] = (len(pos), len(neg), None)
            continue
        num2 = sum(2 if p > n else (1 if p == n else 0)
                   for p in pos for n in neg)
        out[g] = (len(pos), len(neg), num2)
    return out


def test_ranked_auc_vs_pair_counting(spark):
    rng = random.Random(79)
    rows = [(f"g{rng.randrange(4)}", float(rng.randrange(20)),
             rng.randrange(2)) for _ in range(400)]
    # one single-class group exercises the NULL-auc branch
    rows += [("only_pos", 1.0, 1), ("only_pos", 2.0, 1)]
    df = spark.createDataFrame(rows, "src string, score double, lab int")
    got = {r["src"]: (r["n_pos"], r["n_neg"], r["auc_num2"], r["auc"])
           for r in ranked_auc(df, "src", "score", "lab").collect()}
    ref = _ref_auc(rows)
    assert set(got) == set(ref)
    for g, (np_, nn, num2) in ref.items():
        assert got[g][:2] == (np_, nn)
        if num2 is None:
            assert got[g][3] is None
        else:
            assert got[g][2] == num2
            assert got[g][3] == pytest.approx(
                num2 / (2 * np_ * nn), abs=1e-9)


def test_ranked_auc_null_handling_and_extremes(spark):
    rows = [("a", 1.0, 0), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 4.0, 1),
            ("a", None, 1), ("a", 9.0, None)]
    df = spark.createDataFrame(rows, "src string, score double, lab int")
    [r] = ranked_auc(df, "src", "score", "lab").collect()
    # NULL rows dropped -> perfect separation on the 4 survivors
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)


def test_path_prefix_rollup(spark):
    from paperslicer_spark.operators.web import path_prefix_rollup

    urls = [
        "http://A.Example.com/Sec1/Item2/Page3?utm_source=x",
        "https://WWW.a.example.com:443/Sec1/Item2/Other9",
        "http://a.example.com/Sec1/OTHER/x",
        "http://b.example.com/",
        "http://b.example.com",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {(r["host"], r["prefix"]): r["n_pages"]
           for r in path_prefix_rollup(df, "url", depth=2).collect()}
    assert got == {
        ("a.example.com", "/Sec1/Item2"): 2,
        ("a.example.com", "/Sec1/OTHER"): 1,
        ("b.example.com", "/"): 2,
    }


def test_rank_fusion_vs_python(spark):
    from paperslicer_spark.operators.metrics import rank_fusion

    rng = random.Random(37)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 9)) for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    got = [(r["id"], r["rrf"]) for r in
           rank_fusion(df, "id", ["a", "b"], k=60).collect()]

    def ranks(key):
        order = sorted(rows, key=lambda r: (-key(r), r[0]))
        return {r[0]: i + 1 for i, r in enumerate(order)}
    ra, rb = ranks(lambda r: r[1]), ranks(lambda r: r[2])
    ref = {i: round(1.0 / (60 + ra[i]) + 1.0 / (60 + rb[i]), 9)
           for i, _, _ in rows}
    assert dict(got) == ref
    # output ordered by fused score desc (id tiebreak)
    keys = [(-v, i) for i, v in got]
    assert keys == sorted(keys)


def test_rank_fusion_null_scores_and_ties(spark):
    # Round-6: rank_fusion decomposes the global row_number into
    # (count strictly greater) + per-score-partition row_number.
    # NULL scores must still rank LAST (DESC NULLS LAST) with id
    # tiebreaks, and heavy ties must match the global ordering.
    from paperslicer_spark.operators.metrics import rank_fusion

    rng = random.Random(91)
    rows = [(i,
             None if i % 7 == 0 else rng.randint(0, 3),   # heavy ties + nulls
             rng.randint(0, 50))
            for i in range(80)]
    df = spark.createDataFrame(rows, "id long, a int, b int")
    got = {r["id"]: r["rrf"] for r in
           rank_fusion(df, "id", ["a", "b"], k=60).collect()}

    def ranks(key):
        # DESC NULLS LAST, id asc — the row_number total order
        order = sorted(rows, key=lambda r: (key(r) is None,
                                            -(key(r) or 0), r[0]))
        return {r[0]: i + 1 for i, r in enumerate(order)}
    ra, rb = ranks(lambda r: r[1]), ranks(lambda r: r[2])
    ref = {i: round(1.0 / (60 + ra[i]) + 1.0 / (60 + rb[i]), 9)
           for i, _, _ in rows}
    assert got == ref
