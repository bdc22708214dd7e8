"""Dedup / similarity / metrics / checkpoint / streaming operators."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and looked at the dog"),
        (2, "the cat sat on the mat and looked at the dog"),        # exact dup of 1
        (3, "the cat sat on the mat and stared at the dog"),        # near dup
        (4, "completely different words entirely unrelated content here"),
        (5, "short text"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from paperslicer_spark.operators.dedup import exact_dedup, exact_dup_groups

    groups = exact_dup_groups(docs, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2 and groups[0]["first_id"] == 1
    kept = {r["doc_id"] for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert kept == {1, 3, 4, 5, 6}


def test_first_wins_dedup(spark):
    from paperslicer_spark.operators.dedup import first_wins_dedup

    rows = [
        ("10.1/a", "T1", 1), ("10.1/A", "T2", 2),   # same DOI (case) → first wins
        (None, "Same Title", 3), (None, "same title", 4),  # fallback key
        (None, "Other", 5),
    ]
    df = spark.createDataFrame(rows, "doi string, title string, arrival int")
    kept = {r["arrival"] for r in
            first_wins_dedup(df, "doi", "title", ["arrival"]).collect()}
    assert kept == {1, 3, 5}


def test_first_wins_dedup_keyless_rows_kept(spark):
    # reference project.py:150-160 — records whose `key = doi or title`
    # is empty are ALWAYS written; keyless rows must never collapse
    from paperslicer_spark.operators.dedup import first_wins_dedup

    rows = [
        (None, None, 1), (None, "", 2), ("", None, 3),   # keyless → all kept
        ("10.1/x", None, 4), ("10.1/x", None, 5),        # doi dup → first wins
    ]
    df = spark.createDataFrame(rows, "doi string, title string, arrival int")
    kept = sorted(r["arrival"] for r in
                  first_wins_dedup(df, "doi", "title", ["arrival"]).collect())
    assert kept == [1, 2, 3, 4]


def test_ngram_jaccard_stop_shingle_cap(spark):
    from paperslicer_spark.functions.text_stats import shingles
    from paperslicer_spark.operators.dedup import ngram_jaccard_pairs

    # 20 unrelated docs all sharing one stop shingle, plus one real
    # duplicate pair — the stop shingle alone fans the self-join out
    # quadratically unless capped
    rows = [(i, f"the quick brown alpha{i} beta{i} gamma{i} delta{i}")
            for i in range(20)]
    rows += [(100, "the quick brown shared real content here today"),
             (101, "the quick brown shared real content here today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3,
                                        threshold=0.5,
                                        max_doc_freq=5).collect()}
    assert set(got) == {(100, 101)} and got[(100, 101)] == 1.0

    # the cap bounds the join size: candidate pair rows = Σ C(df, 2)
    sh = df.select(F.col("doc_id").alias("doc"),
                   F.explode(shingles(F.col("text"), 3)).alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("c"))
    pair_rows = F.sum(F.col("c") * (F.col("c") - 1) / 2)
    uncapped = freq.agg(pair_rows).first()[0]
    capped = freq.where("c <= 5").agg(pair_rows).first()[0]
    assert uncapped >= 22 * 21 / 2    # stop-shingle blowup present
    assert capped <= 10               # bounded after the cap


def test_ngram_jaccard_and_minhash(docs):
    from paperslicer_spark.operators.dedup import (
        ngram_jaccard_pairs, minhash_lsh_pairs, minhash_signatures)

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0

    sigs = {r["doc"]: [r[f"mh{j}"] for j in range(12)]
            for r in minhash_signatures(docs, "doc_id", "text",
                                        num_hashes=12).collect()}
    assert sigs[1] == sigs[2]  # identical docs → identical signatures

    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert (1, 2) in cand
    assert (1, 4) not in cand and (2, 4) not in cand


def test_cosine_dup_pairs(spark):
    from paperslicer_spark.operators.similarity import cosine_dup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.99, 0.1, 0.0, 0.0]),  # near-dup
        (2, [0.0, 1.0, 0.0, 0.0]),                               # unrelated
        (3, [-1.0, 0.0, 0.0, 0.0]),                              # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_dup_pairs(emb, threshold=0.9).collect()}
    assert exact == {(0, 1)}
    # LSH blocking: 0/1 share the sign bucket; 3 differs in bit 0, so
    # the (0,3) anti-pair is never even a candidate
    blocked = {(r["id_a"], r["id_b"])
               for r in cosine_dup_pairs(emb, threshold=0.9,
                                         bits=4).collect()}
    assert blocked == {(0, 1)}


def test_simhash(docs):
    from paperslicer_spark.operators.dedup import simhash

    sh = {r["doc"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    ham_near = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((sh[1] ^ sh[4]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far


def test_similarity_topk(spark):
    from paperslicer_spark.operators.similarity import brute_force_topk, lsh_topk

    rows = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    rows.append((99, [1.0, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = brute_force_topk(emb, emb.where("vec_id = 0"), k=1).collect()
    assert top[0]["neighbor_id"] == 99  # most-aligned vector wins
    approx = lsh_topk(emb, emb.where("vec_id = 0"), k=3, bits=4).collect()
    assert {r["neighbor_id"] for r in approx} <= {1, 2, 3, 4, 5, 99}
    assert approx[0]["neighbor_id"] == 99  # same bucket (leading sign bits)


def test_corpus_quality_and_scores(spark, corpus_path):
    from paperslicer_spark.operators.assemble import assemble_documents
    from paperslicer_spark.operators.extract import parse_documents
    from paperslicer_spark.operators.metrics import (
        corpus_quality, validation_scores, head_frequencies)

    turns = spark.read.parquet(corpus_path)
    records = parse_documents(assemble_documents(turns)).cache()
    q = corpus_quality(records).collect()[0]
    assert q["total_docs"] == 40
    assert q["title_rate"] == 1.0
    assert q["abstract_rate"] > 0.5
    assert q["gate_title"] and q["gate_dup_doi"]
    scores = validation_scores(records).collect()
    assert all(0 <= r["score"] <= 100 for r in scores)
    assert any(r["score"] >= 70 for r in scores)
    heads = head_frequencies(records).collect()
    assert heads and heads[0]["count"] >= heads[-1]["count"]
    records.unpersist()


def test_checkpoint_resume(spark, corpus_path, tmp_path):
    from paperslicer_spark.operators.spans import extract_turn_spans
    from paperslicer_spark.plans.checkpoint import run_with_resume

    out = str(tmp_path / "spans_out")
    turns = spark.read.parquet(corpus_path)
    s1 = run_with_resume(spark, turns, out, extract_turn_spans, n_buckets=4)
    assert len(s1["ran"]) == 4 and not s1["skipped"]
    total = spark.read.parquet(out + "/data").count()
    assert total == extract_turn_spans(turns).count()
    # resume: everything already done → no work
    s2 = run_with_resume(spark, turns, out, extract_turn_spans, n_buckets=4)
    assert len(s2["skipped"]) == 4 and not s2["ran"]
    assert spark.read.parquet(out + "/data").count() == total


def test_partition_lineage(spark, corpus_path):
    from paperslicer_spark.operators.metrics import partition_lineage
    from paperslicer_spark.operators.spans import extract_turn_spans

    turns = spark.read.parquet(corpus_path)
    lin = partition_lineage(extract_turn_spans(turns))
    rows = lin.collect()
    assert sum(r["n_units"] for r in rows) == extract_turn_spans(turns).count()


def test_streaming_spans(spark, corpus_path, tmp_path):
    from paperslicer_spark.streaming.stream_extract import (
        stream_turns, streaming_spans, streaming_turn_rates)

    stream = stream_turns(spark, corpus_path)
    assert stream.isStreaming
    q1 = (streaming_spans(stream).writeStream.format("memory")
          .queryName("spans_mem").outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck1")).start())
    q1.processAllAvailable()
    q1.stop()
    n_stream = spark.sql("select count(*) c from spans_mem").collect()[0]["c"]
    from paperslicer_spark.operators.spans import extract_turn_spans
    n_batch = extract_turn_spans(spark.read.parquet(corpus_path)).count()
    assert n_stream == n_batch

    q2 = (streaming_turn_rates(stream).writeStream.format("memory")
          .queryName("rates_mem").outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q2.processAllAvailable()
    q2.stop()
    # watermark append-mode may hold the tail window; completeness of the
    # stateless path is asserted above — here just check schema + some rows
    rates = spark.sql("select * from rates_mem")
    assert set(rates.columns) == {"window_start", "window_end", "role",
                                  "n_turns", "n_chars"}


def test_streaming_rates_drops_late_data(spark, tmp_path):
    """Append mode + 10-min watermark: a row arriving after its window
    was finalized is DROPPED — the emitted window count must not grow."""
    import datetime

    import pandas as pd

    from paperslicer_spark.streaming.stream_extract import (
        stream_turns, streaming_turn_rates)

    src = tmp_path / "turns"
    src.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"])
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / name)

    t = lambda m, s=0: datetime.datetime(2025, 1, 1, 0, m, s)  # noqa: E731
    write_batch("b1.parquet", [
        ("c", 0, "a", "x", "g", t(0, 10)),
        ("c", 1, "a", "x", "g", t(0, 20)),
        ("c", 2, "a", "x", "g", t(30)),      # advances watermark to 20:00
    ])
    q = (streaming_turn_rates(stream_turns(spark, str(src)))
         .writeStream.format("memory").queryName("late_mem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckl")).start())
    q.processAllAvailable()
    # late row for the ALREADY-FINALIZED 00:00 window + a fresh row
    write_batch("b2.parquet", [
        ("c", 3, "a", "late", "g", t(0, 30)),   # < watermark → dropped
        ("c", 4, "a", "x", "g", t(41)),          # watermark → 31:00 > 30:05
    ])
    q.processAllAvailable()
    # the watermark computed from b2's max event time takes effect in
    # the NEXT batch — a third batch triggers the [30:00) emission
    write_batch("b3.parquet", [("c", 5, "a", "x", "g", t(59))])
    q.processAllAvailable()
    q.stop()
    rows = {str(r["window_start"]): r["n_turns"]
            for r in spark.sql("select * from late_mem").collect()}
    assert rows["2025-01-01 00:00:00"] == 2   # late row NOT counted
    assert rows.get("2025-01-01 00:30:00") == 1


def test_ivf_topk(spark):
    from paperslicer_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 4")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in brute_force_topk(emb, queries, k=3).collect()}
    approx, model = ivf_topk(emb, queries, k=3, n_lists=8, n_probe=4)
    rows = approx.collect()
    assert model.clusterCenters() is not None
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert set(r["query_id"] for r in rows) == {0, 1, 2, 3}
    # recall@1 with half the lists probed should usually hit; require
    # at least 3 of 4 queries to agree at rank 1 (deterministic seed)
    hits = sum(1 for qid in range(4)
               if got.get((qid, 1)) == exact.get((qid, 1)))
    assert hits >= 3, (got, exact)


def test_ivf_probe_metric_unnormalized(spark):
    """Probe ranking must use the metric KMeans assigned by (Euclidean):
    on vectors with wildly varying norms, -dot(q, center) probes the
    LARGEST-norm centroids, not the nearest — recall@1 collapses. With
    the Euclidean probe, n_probe=1 must find each query's own list and
    n_probe=4 must reach brute-force recall on this separable corpus."""
    import numpy as np

    from paperslicer_spark.operators.similarity import (
        brute_force_topk, ivf_topk)

    rng = np.random.default_rng(7)
    rows = []
    # 8 well-separated cluster anchors with very different norms
    # (0.5×, 1×, ... 40×) — the regime where dot-product probing
    # systematically picks the big-norm lists
    anchors = rng.normal(size=(8, 16))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    scales = [0.5, 1.0, 2.0, 5.0, 10.0, 20.0, 30.0, 40.0]
    vid = 0
    for a, s in zip(anchors, scales):
        for _ in range(12):
            v = a * s + rng.normal(scale=0.01 * s, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    queries = emb.where("vec_id % 12 = 0")  # one per cluster
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in brute_force_topk(emb, queries, k=3).collect()}
    for n_probe, min_hits in ((1, 20), (4, 24)):
        approx, _ = ivf_topk(emb, queries, k=3, n_lists=8,
                             n_probe=n_probe, seed=11)
        got = {(r["query_id"], r["rank"]): r["neighbor_id"]
               for r in approx.collect()}
        hits = sum(1 for key, nb in exact.items() if got.get(key) == nb)
        # every query's nearest centroid is (a fragment of) its own
        # cluster, so rank-1 must be exact even at n_probe=1; total
        # recall at n_probe=1 tolerates KMeans splitting a true
        # cluster across two lists, and n_probe=4 must be exhaustive.
        # (A -dot(q,center) probe ranking drags small-norm queries to
        # whichever big-norm list correlates positively — rank-1
        # misses its own cluster entirely.)
        rank1 = sum(1 for qid in range(0, 96, 12)
                    if got.get((qid, 1)) == exact.get((qid, 1)))
        assert rank1 == 8, (n_probe, got, exact)
        assert hits >= min_hits, (n_probe, hits, got, exact)


def test_ivf_topk_frozen_matches_live(spark):
    """ivf_topk_frozen replays the live path exactly when fed the same
    trained centroids — the x15 fixture contract."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from paperslicer_spark.operators.similarity import (
        ivf_topk, ivf_topk_frozen)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 4")
    live, model = ivf_topk(emb, queries, k=3, n_lists=8, n_probe=3, seed=42)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c])
         for i, c in enumerate(model.clusterCenters())],
        "list_id int, center array<double>")
    frozen = ivf_topk_frozen(emb, queries, cents, k=3, n_probe=3)
    a = sorted(map(tuple, live.collect()))
    b = sorted(map(tuple, frozen.collect()))
    # probe/assignment rule is shared (Euclidean); the frozen path
    # additionally recomputes assignment from centroids instead of
    # trusting model.transform — identical on non-degenerate data
    assert a == b


def test_per_document_metrics_and_csv(spark, corpus_path, tmp_path):
    import glob

    from paperslicer_spark.operators.assemble import assemble_documents
    from paperslicer_spark.operators.extract import parse_documents
    from paperslicer_spark.operators.metrics import per_document_metrics
    from paperslicer_spark.operators.sinks import write_per_document_csv

    records = parse_documents(assemble_documents(
        spark.read.parquet(corpus_path)))
    pdm = per_document_metrics(records)
    rows = {r["file"]: r for r in pdm.collect()}
    assert len(rows) == 40
    r0 = rows["conv00000000"]
    assert r0["abstract_present"] in (True, False)
    assert r0["sections_count"] >= 1 and "." in r0["noise_ratio"]

    out = str(tmp_path / "csvout")
    write_per_document_csv(pdm, out, partitions=2)
    import csv as _csv
    got = []
    for f in sorted(glob.glob(out + "/part-*.csv")):
        with open(f, newline="") as fh:
            got.extend(_csv.DictReader(fh))
    assert len(got) == 40
    assert {"file", "title", "noise_ratio", "figures_count"} <= set(got[0])


def test_simhash_lsh_pairs_recall(spark):
    """Pigeonhole guarantee: pairs within Hamming<=3 always share a
    clean 16-bit chunk and must surface; distant docs must not."""
    from paperslicer_spark.operators.dedup import simhash, simhash_lsh_pairs
    from pyspark.sql import functions as F

    base = " ".join(f"token{i}" for i in range(40))
    rows = [
        (1, base),
        (2, base + " extra"),          # tiny perturbation → small hamming
        (3, base),                     # identical → hamming 0
        (4, " ".join(f"other{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc"]: r["simhash"]
            for r in simhash(df, "doc_id", "text").collect()}
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_lsh_pairs(df, "doc_id", "text",
                                      max_hamming=3).collect()}
    assert got.get((1, 3)) == 0
    h12 = bin((sigs[1] ^ sigs[2]) & (2**64 - 1)).count("1")
    if h12 <= 3:                       # guaranteed-recall regime
        assert (1, 2) in got and got[(1, 2)] == h12
    assert all(4 not in p for p in got)


def test_simhash_jvm_equals_pandas(spark):
    """The codegen formulation must be byte-identical to the numpy
    majority vote (and therefore to the x08 oracle) — including blank
    and NULL docs (signature 0) and bit-63 sign handling."""
    from paperslicer_spark.operators.dedup import simhash, simhash_jvm

    rows = [(i, " ".join(f"tok{j % (3 + i)}" for j in range(30)))
            for i in range(30)]
    rows += [(100, ""), (101, "   "), (102, None), (103, "single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc"]: r["simhash"]
         for r in simhash(df, "doc_id", "text").collect()}
    b = {r["doc"]: r["simhash"]
         for r in simhash_jvm(df, "doc_id", "text").collect()}
    assert a == b and len(a) == 34
    assert a[100] == a[102] == 0
    # both sign regimes occur in the sample (bias representation)
    assert any(v < 0 for v in a.values()) and any(v > 0 for v in a.values())


def test_quantize_embeddings_fidelity(spark):
    from paperslicer_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),        # all-zero convention
        (3, [0.001, 0.002, -0.003, 0.127]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["qvec"] == [127, -64, 32, 0] and out[1]["scale"] == 1.0
    assert out[1]["cos_fidelity"] >= 0.999
    assert out[2]["qvec"] == [0, 0, 0, 0]
    assert out[2]["scale"] == 0.0 and out[2]["cos_fidelity"] == 0.0
    assert max(abs(v) for v in out[3]["qvec"]) == 127
    assert out[3]["cos_fidelity"] >= 0.999


def test_simhash_bands_mixed_sign_low_chunk(spark):
    """Regression: a mixed-sign signature pair whose ONLY clean chunk
    is band 0 must still collide. sig_b = sig_a with bit 63 plus one
    bit in band 1 and one in band 2 flipped (hamming 3): bands 1-3
    are dirty, so recall depends entirely on band 0's key — which
    under signed % (instead of pmod) differed between the negative
    and positive representation."""
    from paperslicer_spark.operators.dedup import _simhash_bands
    from pyspark.sql import functions as F

    sig_a = 65535                                   # positive, low=0xFFFF
    sig_b64 = (sig_a ^ (1 << 63) ^ (1 << 20) ^ (1 << 40)) % (1 << 64)
    sig_b = sig_b64 - (1 << 64)                     # negative long
    df = spark.createDataFrame([(1, sig_a), (2, sig_b)],
                               "doc long, simhash long")
    rows = _simhash_bands(df).collect()
    keys = {(r["doc"], r["band"]): r["bkey"] for r in rows}
    assert all(0 <= v < 65536 for v in keys.values())
    assert keys[(1, 0)] == keys[(2, 0)] == 65535    # the clean chunk
    assert keys[(1, 3)] != keys[(2, 3)]             # sign bit dirty


def test_simhash_lsh_pairs_exact_recall_vs_brute_force(spark):
    """End-to-end guarantee on a random corpus: the banded operator
    returns EXACTLY the hamming<=3 pairs a brute-force scan of the
    signatures finds (pigeonhole recall is total in this regime)."""
    import random

    from paperslicer_spark.operators.dedup import simhash, simhash_lsh_pairs

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        base = [rng.choice(vocab) for _ in range(25)]
        rows.append((2 * i, " ".join(base)))
        # a near-clone with one token swapped → often hamming<=3
        j = rng.randrange(25)
        base[j] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(base)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc"]: r["simhash"]
            for r in simhash(df, "doc_id", "text").collect()}
    mask = (1 << 64) - 1
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if sigs[a] == 0 or sigs[b] == 0:
                continue
            h = bin((sigs[a] ^ sigs[b]) & mask).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_lsh_pairs(df, "doc_id", "text",
                                      max_hamming=3).collect()}
    assert got == want and len(want) > 10


def test_asof_join_semantics(spark):
    """Grouped as-of join: at-or-before match, exact-ts tie, strict
    mode, no-match nulls, per-key isolation."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u1", 10.0), (2, "u1", 20.0), (3, "u1", 5.0),
         (4, "u2", 15.0), (5, "u3", 50.0)],
        "event_id long, user string, t double",
    ).select("event_id", "user", F.col("t").alias("ts"))
    right = spark.createDataFrame(
        [("u1", 8.0, "a"), ("u1", 20.0, "b"), ("u1", 12.0, "c"),
         ("u2", 99.0, "z")],
        "user string, t double, tag string",
    ).select("user", F.col("t").alias("ts"), "tag")

    out = {r["event_id"]: r for r in
           asof_join(left, right, on="user", ts_col="ts").collect()}
    assert out[1]["tag_right"] == "a"          # 8 <= 10 < 12
    assert out[2]["tag_right"] == "b"          # exact ts matches
    assert out[3]["tag_right"] is None         # nothing at or before 5
    assert out[4]["tag_right"] is None         # u2's only view is later
    assert out[5]["tag_right"] is None         # u3 has no right rows
    assert out[2]["ts_right"] == 20.0 and out[1]["ts_right"] == 8.0

    strict = {r["event_id"]: r["tag_right"] for r in
              asof_join(left, right, on="user", ts_col="ts",
                        strict=True).collect()}
    assert strict[2] == "c"                    # 20.0 excluded, 12.0 wins
    assert strict[1] == "a"

    # all left rows survive exactly once (left-outer cardinality)
    assert sorted(out) == [1, 2, 3, 4, 5]


def test_range_join_buckets_and_bounds(spark):
    """Bucketized interval join equals the naive theta join, including
    boundary inclusivity and cross-bucket matches."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 95.0), (3, "u", 50.0), (4, "v", 100.0)],
        "event_id long, user string, ts double")
    right = spark.createDataFrame(
        [("u", 100.0, "exact"), ("u", 110.0, "in"), ("u", 160.0, "edge"),
         ("u", 161.0, "out"), ("v", 99.0, "before")],
        "user string, ts double, tag string")
    got = {(r["event_id"], r["tag_right"])
           for r in range_join(left, right, on="user", ts_col="ts",
                               lower=0.0, upper=60.0).collect()}
    # event 1 (ts 100): exact(Δ0), in(Δ10), edge(Δ60 inclusive); not out(Δ61)
    # event 2 (ts 95): exact(Δ5), in(Δ15), edge(Δ65? no — 160-95=65>60)
    # event 3 (ts 50): in(Δ60? 110-50=60 inclusive), exact(Δ50)
    # event 4 (v, 100): 'before' is at 99 < 100 → Δ negative, excluded
    assert got == {(1, "exact"), (1, "in"), (1, "edge"),
                   (2, "exact"), (2, "in"),
                   (3, "exact"), (3, "in")}

    # differential vs the naive join on a bigger random-ish set
    import itertools
    rows_l = [(i, f"u{i % 7}", float((i * 37) % 500)) for i in range(120)]
    rows_r = [(f"u{j % 7}", float((j * 53) % 500), f"t{j}")
              for j in range(150)]
    L = spark.createDataFrame(rows_l, "event_id long, user string, ts double")
    R = spark.createDataFrame(rows_r, "user string, ts double, tag string")
    fast = {(r["event_id"], r["tag_right"])
            for r in range_join(L, R, on="user", ts_col="ts",
                                lower=5.0, upper=42.0).collect()}
    naive = {(i, t) for (i, u, lt), (ru, rt, t)
             in itertools.product(rows_l, rows_r)
             if u == ru and 5.0 <= rt - lt <= 42.0}
    assert fast == naive and len(naive) > 50


def test_asof_join_differential_vs_pandas_merge_asof(spark):
    """asof_join ≡ pandas.merge_asof(by=key, direction='backward') on
    seeded random inputs with unique right (key, ts) — the reference
    semantics for at-or-before matching."""
    import random

    import pandas as pd

    from paperslicer_spark.operators.temporal import asof_join

    rng = random.Random(1234)
    keys = [f"k{i}" for i in range(6)]
    lrows = [(i, rng.choice(keys), float(rng.randrange(0, 1000)))
             for i in range(200)]
    # unique (key, ts) on the right so merge_asof's tie choice is moot
    seen = set()
    rrows = []
    for j in range(300):
        k, t = rng.choice(keys), float(rng.randrange(0, 1000))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rrows.append((k, t, f"tag{j}"))
    L = spark.createDataFrame(lrows, "event_id long, k string, ts double")
    R = spark.createDataFrame(rrows, "k string, ts double, tag string")
    got = {r["event_id"]: (r["ts_right"], r["tag_right"]) for r in
           asof_join(L, R, on="k", ts_col="ts").collect()}

    lp = pd.DataFrame(lrows, columns=["event_id", "k", "ts"]) \
        .sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "tag"]) \
        .sort_values("ts", kind="stable")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        suffixes=("", "_r"))
    for _, row in ref.iterrows():
        want_tag = None if pd.isna(row["tag"]) else row["tag"]
        assert got[row["event_id"]][1] == want_tag, row["event_id"]
    assert len(got) == len(lrows)


def test_streaming_session_window_stats(spark, tmp_path):
    """session_window sessions close by watermark and match the batch
    gaps-and-islands sessionization on the same data."""
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from paperslicer_spark.streaming.stream_extract import (
        stream_turns, streaming_session_stats)

    src = tmp_path / "turns"
    src.mkdir()
    base = "2024-01-01 10:{m:02d}:00"
    rows = []
    # conv A: two sessions (gap > 5 min between minute 10 and 30)
    for m, txt in ((0, "a1"), (2, "a2"), (10, "a3"), (30, "a4"), (31, "a5")):
        rows.append(("A", m, "user", txt, "t", base.format(m=m)))
    # conv B: one session
    for m, txt in ((5, "b1"), (8, "b2")):
        rows.append(("B", m, "user", txt, "t", base.format(m=m)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts_s string") \
        .select("conv_id", "turn_idx", "role", "text", "tool",
                F.col("ts_s").cast("timestamp").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    # a late watermark-advancing batch so every session closes
    spark.createDataFrame(
        [("Z", 0, "user", "zz", "t", "2024-01-01 12:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts_s string") \
        .select("conv_id", "turn_idx", "role", "text", "tool",
                F.col("ts_s").cast("timestamp").alias("ts")) \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))

    stream = stream_turns(spark, str(src) + "/*")
    q = (streaming_session_stats(stream).writeStream.format("memory")
         .queryName("sess").outputMode("append").start())
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            got = {(r["conv_id"], str(r["session_start"])[11:16],
                    r["n_turns"], r["n_chars"])
                   for r in spark.sql("select * from sess").collect()}
            if len(got) >= 4:
                break
            time.sleep(1)
    finally:
        q.stop()
    # sessions: A {10:00,10:02}, A {10:10} (8-min gap), A {10:30,10:31};
    # B {10:05,10:08}; each closed by the 12:00 watermark-advancer
    want = {("A", "10:00", 2, 4), ("A", "10:10", 1, 2),
            ("A", "10:30", 2, 4), ("B", "10:05", 2, 4)}
    assert want <= got

    # batch parity: gaps-and-islands over the same rows yields the
    # same (conv, first-ts, count, chars) sessions
    w = Window.partitionBy("conv_id").orderBy("ts")
    gap_flag = (F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w)) > 300)
    batch = (df.withColumn("_new", F.coalesce(gap_flag.cast("int"), F.lit(1)))
             .withColumn("_sid", F.sum("_new").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy("conv_id", "_sid")
             .agg(F.min("ts").alias("t0"), F.count("*").alias("n"),
                  F.sum(F.length("text")).alias("c")))
    ref = {(r["conv_id"], str(r["t0"])[11:16], r["n"], r["c"])
           for r in batch.collect()}
    assert ref == want


def test_exact_percentiles_ignores_nulls(spark):
    """NULL values must not shift ranks (round-4 ADVICE): percentiles
    match F.percentile / DuckDB quantile_cont, which ignore NULLs."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.metrics import exact_percentiles

    rows = ([("a", float(v)) for v in range(1, 11)]
            + [("a", None)] * 5
            + [("b", 7.0), ("b", None), ("b", 9.0)]
            + [("c", None)])                     # all-NULL group
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["p50"], r["p90"], r["n"]) for r in
           exact_percentiles(
               df, "g", F.col("v"), {"p50": 0.5, "p90": 0.9},
               extra_aggs=[F.count("*").alias("n")]).collect()}
    ref = {r["g"]: (round(r["p50"], 6), round(r["p90"], 6)) for r in
           df.groupBy("g").agg(
               F.percentile("v", 0.5).alias("p50"),
               F.percentile("v", 0.9).alias("p90"))
           .where(F.col("p50").isNotNull()).collect()}
    assert got == {"a": (ref["a"][0], ref["a"][1], 10),
                   "b": (ref["b"][0], ref["b"][1], 2)}
    assert got["a"][0] == 5.5 and got["a"][1] == 9.1
    # the all-NULL group is absent (documented divergence)
    assert "c" not in got


def test_range_join_subsecond_boundary_exact(spark):
    """Deltas landing exactly on a bound with sub-second timestamps
    are classified exactly (integer-µs arithmetic, round-4 ADVICE)."""
    from paperslicer_spark.operators.temporal import range_join

    # upper = 0.3 s; 0.1 and 0.3 are classic non-representable doubles
    left = spark.createDataFrame(
        [(1, "u", 1_000_000.1)], "event_id long, user string, ts double")
    right = spark.createDataFrame(
        [("u", 1_000_000.4, "edge"),     # Δ = 0.3 exactly → in
         ("u", 1_000_000.400001, "out"), # 1 µs past → out
         ("u", 1_000_000.2, "lo"),       # Δ = 0.1 exactly → in
         ("u", 1_000_000.199999, "below")],
        "user string, ts double, tag string")
    got = {r["tag_right"] for r in
           range_join(left, right, on="user", ts_col="ts",
                      lower=0.1, upper=0.3).collect()}
    assert got == {"edge", "lo"}


def test_semdedup_groups_and_reps(spark):
    from paperslicer_spark.operators.similarity import semdedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "list_id int, center array<double>")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.02]),      # cos ~0.9995: dup pair
         (3, [0.9, -0.1]),                        # cos(1,3) ~0.9939: below
         (4, [0.0, 1.0]), (5, [0.1, 0.95]),       # cos ~0.9945: below
         (6, [-0.2, 0.9])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           semdedup(vecs, cents, threshold=0.995).collect()}
    assert len(out) == 6
    assert out[1]["list_id"] == 0 and out[4]["list_id"] == 1
    # only {1,2} group; everything else is its own representative
    assert out[1]["rep_id"] == 1 and out[1]["is_rep"]
    assert out[2]["rep_id"] == 1 and not out[2]["is_rep"]
    for v in (3, 4, 5, 6):
        assert out[v]["rep_id"] == v and out[v]["is_rep"]
    # looser threshold merges the near group transitively
    out2 = {r["vec_id"]: r["rep_id"] for r in
            semdedup(vecs, cents, threshold=0.98).collect()}
    assert out2[1] == out2[2] == out2[3] == 1
    assert out2[4] == out2[5] == 4 and out2[6] == 6


def test_delta_dedup_flags(spark):
    from paperslicer_spark.operators.dedup import delta_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),  # exact
         (11, "one two three four five six seven eight nine ten"
              " extra"),                                          # near
         (12, "totally different unrelated fresh content words"
              " here now")],                                      # fresh
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           delta_dedup(new, corpus, "doc_id", "text").collect()}
    assert out[10]["exact_dup"] and not out[10]["keep"]
    # exact re-crawl also collides on every band (identical sig)
    assert out[10]["near_dup"]
    assert not out[11]["exact_dup"] and out[11]["near_dup"]
    assert not out[11]["keep"]
    assert out[12]["keep"] and not out[12]["exact_dup"] \
        and not out[12]["near_dup"]


def test_asof_join_bucketed_equals_plain(spark):
    """The skew-safe two-phase asof is row-identical to asof_join on
    seeded random data, across bucket widths, both tie modes."""
    import random

    from paperslicer_spark.operators.temporal import (asof_join,
                                                      asof_join_bucketed)

    rng = random.Random(11)
    rows_l = [(i, f"u{rng.randrange(5)}", float(rng.randrange(0, 5000)))
              for i in range(400)]
    rows_r = [(f"u{rng.randrange(5)}", float(rng.randrange(0, 5000)),
               f"t{j}") for j in range(300)]
    L = spark.createDataFrame(rows_l, "event_id long, user string, ts double")
    R = spark.createDataFrame(rows_r, "user string, ts double, tag string")

    def rowset(df):
        return sorted((r["event_id"], r["ts_right"], r["tag_right"])
                      for r in df.collect())

    for strict in (False, True):
        want = rowset(asof_join(L, R, on="user", ts_col="ts",
                                strict=strict))
        for bw in (1.0, 97.0, 1000.0, 10_000.0):
            got = rowset(asof_join_bucketed(
                L, R, on="user", ts_col="ts", bucket_seconds=bw,
                strict=strict))
            assert got == want, (strict, bw)


def test_cms_sketch_bounds_and_merge(spark):
    """CMS estimates upper-bound exact counts, recover them exactly at
    low load factor, and two shard sketches MERGE into the corpus
    sketch (the fixed-size-state property that justifies the op)."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [(i, f"w{i % 20}") for i in range(2000)]       # w0..w19 x100
    df = spark.createDataFrame(rows, "i long, token string")
    sk = cms_sketch(df, F.col("token"), depth=4, width=64)
    items = df.select("token").distinct()
    est = {r["token"]: r["est"] for r in
           cms_estimate(sk, items, "token", depth=4, width=64).collect()}
    assert all(v >= 100 for v in est.values())            # upper bound
    assert sum(v == 100 for v in est.values()) >= 15      # mostly exact
    # mergeability: shard sketches re-summed == whole-corpus sketch
    a = cms_sketch(df.where("i % 2 = 0"), F.col("token"), 4, 64)
    b = cms_sketch(df.where("i % 2 = 1"), F.col("token"), 4, 64)
    merged = a.unionByName(b).groupBy("j", "bucket") \
        .agg(F.sum("c").alias("c"))
    whole = {(r["j"], r["bucket"]): r["c"] for r in sk.collect()}
    assert {(r["j"], r["bucket"]): r["c"]
            for r in merged.collect()} == whole


def test_hll_sketch_estimate_and_merge(spark):
    """HLL register relation is fixed-size, the estimate lands within
    the expected ~1.04/sqrt(m) band, and shard sketches merge
    LOSSLESSLY (register-wise max == whole-corpus sketch) — the
    property that makes it per-shard distinct-count state."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.sketch import (hll_estimate,
                                                    hll_merge,
                                                    hll_sketch)

    df = spark.range(10000).select(
        F.concat(F.lit("item_"), F.col("id")).alias("x"))
    sk = hll_sketch(df, F.col("x"), p=9)
    assert sk.count() <= 512                              # fixed size
    est = hll_estimate(sk, p=9).collect()[0]
    assert abs(est["est"] - 10000) / 10000 < 0.10         # ~2 sigma
    # duplicates never move the estimate (max is idempotent)
    dup = hll_sketch(df.unionByName(df), F.col("x"), p=9)
    assert {(r["bucket"], r["r"]) for r in dup.collect()} == \
        {(r["bucket"], r["r"]) for r in sk.collect()}
    # lossless merge of two shard sketches
    a = hll_sketch(df.where("id < 5000"), F.col("x"), p=9)
    b = hll_sketch(df.where("id >= 5000"), F.col("x"), p=9)
    merged = hll_merge(a, b)
    assert {(r["bucket"], r["r"]) for r in merged.collect()} == \
        {(r["bucket"], r["r"]) for r in sk.collect()}
    # small-range linear counting kicks in and is near-exact
    small = hll_sketch(df.where("id < 40"), F.col("x"), p=9)
    s_est = hll_estimate(small, p=9).collect()[0]
    assert abs(s_est["est"] - 40) < 3


def test_bloom_filter_gate(spark):
    """Bloom membership: ZERO false negatives (structural guarantee),
    false-positive rate near (1-e^{-kn/m})^k, and shard bit relations
    merge by plain union+distinct."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.sketch import (bloom_bits,
                                                    bloom_contains)

    df = spark.range(2000).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("x"))
    bits = bloom_bits(df, F.col("x"), m_bits=16384, k=4)
    assert bits.count() <= 16384
    probes = df.where("id % 10 = 0").unionByName(
        spark.range(400).select(
            F.concat(F.lit("nope_"), F.col("id")).alias("x")))
    got = {r["x"]: r["might_contain"] for r in
           bloom_contains(bits, probes, "x",
                          m_bits=16384, k=4).collect()}
    assert all(got[f"doc_{i}"] for i in range(0, 2000, 10))  # no FN
    fp = sum(got[f"nope_{i}"] for i in range(400))
    assert fp / 400 < 0.05   # theory ~0.04 at fill 1-e^{-8000/16384}
    # shard merge: union+distinct of half-corpus bit relations
    a = bloom_bits(df.where("id < 1000"), F.col("x"), 16384, 4)
    b = bloom_bits(df.where("id >= 1000"), F.col("x"), 16384, 4)
    merged = a.unionByName(b).distinct()
    assert {r["bit"] for r in merged.collect()} == \
        {r["bit"] for r in bits.collect()}


def test_substring_dedup_vs_python_reference(spark):
    """Full differential vs an independent pure-Python transcription
    of the spec (first global (doc,pos) occurrence survives; spans
    merge; docs rebuild) — covers embedded copies, self-duplication
    within one doc, under-length docs, and untouched docs."""
    from collections import defaultdict

    from paperslicer_spark.operators.dedup import substring_dedup

    sent = ("The quick brown fox jumps over the lazy dog near "
            "the river bank today.")
    docs = [
        (1, sent),
        (2, f"Intro text. {sent} Outro."),
        (3, "Unrelated content entirely different from everything "
            "else in this corpus okay."),
        (4, f"AAA {sent} BBB {sent}"),                # self-dup too
        (5, "short"),
    ]
    L = 30
    occ = defaultdict(list)
    for d, t in docs:
        for p in range(0, max(0, len(t) - L + 1)):
            occ[t[p:p + L]].append((d, p))
    spans = defaultdict(list)
    for lst in occ.values():
        if len(lst) > 1:
            first = min(lst)
            spans_for = [x for x in lst if x != first]
            for d, p in spans_for:
                spans[d].append((p, p + L))
    expected = {}
    for d, t in docs:
        merged = []
        for s, e in sorted(spans.get(d, [])):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        kept, cur = [], 0
        for s, e in merged:
            kept.append(t[cur:s])
            cur = e
        kept.append(t[cur:])
        expected[d] = ("".join(kept), len(merged),
                       sum(e - s for s, e in merged))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc"]: (r["text_clean"], r["n_spans"],
                      r["chars_removed"])
           for r in substring_dedup(df, "doc_id", "text", 30)
           .collect()}
    assert out == expected
    # the first occurrence's own doc keeps exactly one copy
    assert sent in out[1][0]
    assert sent not in out[2][0] and sent not in out[4][0]


def test_hist_sketch_quantiles_and_merge(spark):
    """Log-binned histogram: quantile lower bounds bracket the true
    quantile within one octave, and shard histograms SUM-merge into
    the corpus histogram exactly."""
    from pyspark.sql import functions as F

    from paperslicer_spark.operators.sketch import (hist_quantile,
                                                    hist_sketch)

    # values 1..1000 for one key: true p50=500 (bin 9, lo 256),
    # p90=900 (bin 10, lo 512), p99=990 (bin 10)
    df = spark.range(1, 1001).select(F.lit("k").alias("src"),
                                     F.col("id").alias("v"))
    h = hist_sketch(df, "src", F.col("v"))
    out = hist_quantile(h).collect()[0]
    assert out["n"] == 1000
    assert out["p50_lo"] == 256 and 256 <= 500 < 512
    assert out["p90_lo"] == 512 and out["p99_lo"] == 512
    # lower bound property: lo <= true quantile < 2*lo
    for lo, true_q in [(out["p50_lo"], 500), (out["p90_lo"], 900),
                       (out["p99_lo"], 990)]:
        assert lo <= true_q < 2 * lo
    # sum-merge of shard histograms == corpus histogram
    a = hist_sketch(df.where("v <= 500"), "src", F.col("v"))
    b = hist_sketch(df.where("v > 500"), "src", F.col("v"))
    merged = a.unionByName(b).groupBy("key", "bin") \
        .agg(F.sum("c").alias("c"))
    assert {(r["key"], r["bin"], r["c"]) for r in merged.collect()} \
        == {(r["key"], r["bin"], r["c"]) for r in h.collect()}


def test_canonical_keep_best_per_cluster(spark):
    """Keep list: the longest doc of each near-dup cluster survives,
    singletons keep themselves, every corpus doc appears once."""
    from paperslicer_spark.operators.dedup import canonical_keep

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again today"),
        (3, "the quick brown fox jumps over the lazy dog again today "
            "with extra trailing words making this copy the longest"),
        (4, "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in
           canonical_keep(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 4}
    # 1/2/3 cluster together; 3 is longest → the keeper
    assert out[1]["cluster"] == out[2]["cluster"] == out[3]["cluster"]
    assert out[3]["keep"] and not out[1]["keep"] and not out[2]["keep"]
    # singleton keeps itself, cluster = own id
    assert out[4]["keep"] and out[4]["cluster"] == 4
    # tie on quality breaks by min id
    tie = spark.createDataFrame(rows[:2], "doc_id long, text string")
    t = {r["doc"]: r["keep"] for r in
         canonical_keep(tie, "doc_id", "text").collect()}
    assert t == {1: True, 2: False}


def test_weighted_sample_differential(spark):
    """Efraimidis-Spirakis priority sample vs an independent pure-
    Python transcription: same u, same key, same top-k, same ranks."""
    import hashlib
    import math

    from paperslicer_spark.operators.curation import weighted_sample

    rows = [(i, (i % 7) + (0 if i % 11 else -i)) for i in range(1, 401)]
    # weights: mostly 1..7, every 11th negative/zero → excluded
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def key_of(i, w):
        h = int(hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float((1 << 60) + 1)
        return round(math.log(u) / w, 6)

    expect = sorted(
        ((key_of(i, w), i, w) for i, w in rows if w > 0),
        key=lambda t: (-t[0], t[1]))[:25]
    out = weighted_sample(df, "doc_id", F.col("w"), k=25).collect()
    got = [(r["key"], r["doc_id"], r["weight"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert [pytest.approx(k) for k, *_ in expect] == [k for k, *_ in got]
    assert [(i, w) for _, i, w in expect] == [(i, w) for _, i, w in got]
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] \
        == list(range(1, 26))


def test_kmeans_lloyd_vs_numpy(spark):
    """Two Lloyd iterations vs an independent numpy transcription of
    the spec (seeded-hash init, 6dp-rounded distances and means,
    list_id tiebreak) — assignments and distances must agree."""
    import hashlib

    import numpy as np

    from paperslicer_spark.operators.similarity import kmeans_lloyd

    rng = np.random.RandomState(7)
    vecs = rng.randn(120, 8).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    V = vecs.astype(np.float64)
    order = sorted(range(120), key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))
    k, iters = 4, 2
    cents = {j + 1: np.round(V[order[j]], 6) for j in range(k)}

    def assign(cs):
        out = {}
        for i in range(120):
            best = min((round(float(np.sqrt(((V[i] - c) ** 2).sum())), 6),
                        lid) for lid, c in cs.items())
            out[i] = best[::-1]  # (list_id, dist)
        return out

    for _ in range(iters):
        a = assign(cents)
        nxt = {}
        for lid in set(l for l, _ in a.values()):
            members = [V[i] for i in range(120) if a[i][0] == lid]
            nxt[lid] = np.round(np.mean(members, axis=0), 6)
        cents = nxt
    expect = assign(cents)

    got = {r["vec_id"]: (r["list_id"], r["dist"]) for r in
           kmeans_lloyd(df, k=k, iters=iters).collect()}
    assert set(got) == set(range(120))
    for i in range(120):
        assert got[i][0] == expect[i][0], i
        assert got[i][1] == pytest.approx(expect[i][1], abs=1e-9), i


def test_bm25_topk_differential(spark):
    """BM25 vs an independent pure-Python transcription (Lucene idf,
    k1=1.2 b=0.75): same scores (6dp), same ranking, ties by doc."""
    import math
    from collections import Counter

    from paperslicer_spark.operators.search import bm25_topk

    docs = [
        (1, "spark shuffle join window agg shuffle"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "spark spark spark window"),
        (4, "join order and shuffle cost in query plans"),
        (5, "completely unrelated text about rivers"),
        (6, ""),
    ]
    qs = [(10, "spark shuffle"), (11, "quick dog"), (12, "zzz missing")]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    queries = spark.createDataFrame(qs, "query_id long, query_text string")

    live = [(d, t.lower().split()) for d, t in docs if t.strip()]
    N = len(live)
    avgdl = sum(len(t) for _, t in live) / N
    dfreq = Counter()
    for _, t in live:
        for w in set(t):
            dfreq[w] += 1
    expect = {}
    for qid, qt in qs:
        scores = []
        for d, t in live:
            tf = Counter(t)
            s = 0.0
            for w in set(qt.lower().split()):
                if tf[w] == 0 or dfreq[w] == 0:
                    continue
                idf = math.log(1 + (N - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
                s += idf * tf[w] * 2.2 / (
                    tf[w] + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
            if s > 0:
                scores.append((round(s, 6), d))
        scores.sort(key=lambda x: (-x[0], x[1]))
        expect[qid] = [(d, s) for s, d in scores[:3]]

    out = bm25_topk(corpus, queries, k=3).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc"], r["score"]))
    assert set(got) == {10, 11}          # no hit → no rows
    for qid in got:
        assert [d for d, _ in got[qid]] == [d for d, _ in expect[qid]]
        for (_, s_got), (_, s_exp) in zip(got[qid], expect[qid]):
            assert s_got == pytest.approx(s_exp, abs=2e-6)


def test_vocab_coverage(spark):
    from collections import Counter

    from paperslicer_spark.operators.curation import vocab_coverage

    docs = [(1, "a b a c a b"), (2, "a d d"), (3, "  ")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sorted(vocab_coverage(df, "text", vocab_size=3).collect(),
                 key=lambda r: r["rank"])
    cnt = Counter("a b a c a b a d d".split())
    total = sum(cnt.values())
    # rank by (count desc, token): a=4, b=2, d=2, c=1 → top3 a,b,d
    assert [(r["token"], r["count"]) for r in out] == \
        [("a", 4), ("b", 2), ("d", 2)]
    assert out[0]["coverage"] == pytest.approx(4 / total)
    assert out[2]["cum_coverage"] == pytest.approx(8 / total)


def test_bigram_logprob_differential(spark):
    import math
    from collections import Counter

    from paperslicer_spark.operators.curation import bigram_logprob

    docs = [(1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "mat the cat the"),
            (4, "single"),
            (5, " ")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    toks = {d: t.lower().split() for d, t in docs if t.strip()}
    uni = Counter(w for t in toks.values() for w in t)
    bg = Counter(" ".join(p) for t in toks.values()
                 for p in zip(t, t[1:]))
    D = len(uni)
    expect = {}
    for d, t in toks.items():
        pairs = [" ".join(p) for p in zip(t, t[1:])]
        if not pairs:
            continue
        lps = [math.log10((bg[g] + 1) / (uni[g.split()[0]] + D + 1))
               for g in pairs]
        expect[d] = (len(pairs), round(sum(lps) / len(lps), 6))

    got = {r["doc"]: (r["n_bigrams"], r["mean_logp"]) for r in
           bigram_logprob(df, "doc_id", "text").collect()}
    assert set(got) == set(expect)       # doc 4 (1 token) absent
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert got[d][1] == pytest.approx(expect[d][1], abs=2e-6)


def test_ngram_novelty_vs_python_reference(spark):
    """seen_frac equals a brute-force python first-occurrence scan."""
    from paperslicer_spark.operators.dedup import ngram_novelty

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma zeta eta"),          # shares 1 trigram w/ 1
        (3, "alpha beta gamma delta epsilon"),     # exact dup of 1
        (4, "totally fresh words only here"),
        (5, "xy"),                                 # < 3 tokens → absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in
           ngram_novelty(df, "doc_id", "text", n=3).collect()}

    def grams(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    firsts = {}
    for d, t in rows:
        for g in sorted(grams(t)):
            firsts.setdefault(g, d)
    for d, t in rows:
        gs = grams(t)
        if not gs:
            assert d not in out
            continue
        seen = sum(1 for g in gs if firsts[g] < d)
        assert out[d]["n_grams"] == len(gs)
        assert abs(out[d]["seen_frac"] - round(seen / len(gs), 6)) < 1e-9
    # the exact dup's grams are all pre-seen; the first doc's none
    assert out[1]["seen_frac"] == 0.0
    assert out[3]["seen_frac"] == 1.0


def test_leakage_safe_split_cluster_atomic(spark):
    """Near-dup cluster members always land on the same side; the
    assignment is deterministic and covers every doc."""
    from paperslicer_spark.operators.dedup import leakage_safe_split

    rows = [(i, "the quick brown fox jumps over the lazy dog "
             f"unique{i // 3} filler words here") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df, "doc_id", "text", eval_pct=30).collect()
    assert len(out) == 30 and {r["doc"] for r in out} == set(range(30))
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    # cluster-atomic: one side per cluster
    assert all(len(s) == 1 for s in by_cluster.values())
    assert {r["split"] for r in out} <= {"train", "eval"}
    # deterministic across runs
    again = {r["doc"]: r["split"] for r in
             leakage_safe_split(df, "doc_id", "text", eval_pct=30).collect()}
    assert again == {r["doc"]: r["split"] for r in out}


def test_source_overlap_matrix(spark):
    """Near-dup doc pairs roll up per unordered source pair; same-
    source redundancy is reported too."""
    from paperslicer_spark.operators.dedup import source_overlap

    dup = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (1, dup, "web"),
        (2, dup, "books"),
        (3, dup, "web"),
        (4, "completely different words entirely unrelated here", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): (r["n_pairs"], r["n_clusters"])
           for r in source_overlap(df, "doc_id", "text",
                                   "source").collect()}
    # 1/2/3 cluster: pairs (1,2) web-books, (1,3) web-web, (2,3) books-web
    assert out == {("books", "web"): (2, 1), ("web", "web"): (1, 1)}


def test_bpe_pair_counts_vs_python(spark):
    """Top pair weights equal a python char-bigram count over the
    word-frequency vocabulary."""
    from collections import Counter

    from paperslicer_spark.operators.curation import bpe_pair_counts

    rows = [(1, "low low lower"), (2, "low lowest nest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["rank"], r["pair"], r["weight"]) for r in
           bpe_pair_counts(df, "text", top_k=5).collect()]

    wc = Counter(w for _, t in rows for w in t.lower().split())
    pc = Counter()
    for w, c in wc.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pc[w[i:i + 2]] += c
    expect = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(i + 1, p, c) for i, (p, c) in enumerate(expect)]
    # sanity: "lo"/"ow" dominate ("low" appears 3x + prefixes)
    assert got[0][1] in ("lo", "ow")


def test_fuzzy_pairs_blocked_linkage(spark):
    """Edit-distance pairs within blocks; cross-block pairs missed by
    contract; the block-size cap drops oversized blocks."""
    from paperslicer_spark.operators.dedup import fuzzy_pairs

    rows = [
        (1, "International Business Machines"),
        (2, "International Business Machine"),    # dist 1, same block
        (3, "International Busines Machines"),    # dist 1 vs 1
        (4, "Intl Business Machines"),            # different block
        (5, "zeta utterly different name"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           fuzzy_pairs(df, "id", "name", block_len=12,
                       max_dist=3).collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}
    # cap: block of 3 dropped entirely when above max_block_size
    capped = fuzzy_pairs(df, "id", "name", block_len=12, max_dist=3,
                         max_block_size=2).collect()
    assert capped == []


def test_source_kl_vs_python(spark):
    """KL per source matches a direct python computation; a source
    identical to the blend scores near zero."""
    import math
    from collections import Counter

    from paperslicer_spark.operators.curation import source_kl

    rows = [
        (1, "a", "alpha beta gamma alpha beta"),
        (2, "a", "alpha gamma gamma delta"),
        (3, "b", "alpha beta gamma alpha beta alpha gamma gamma delta"),
        (4, "c", "zeta zeta zeta zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: (r["n_tokens"], r["kl"]) for r in
           source_kl(df, "source", "text").collect()}

    per_src, corpus = {}, Counter()
    for _, s, t in rows:
        ws = t.lower().split()
        per_src.setdefault(s, Counter()).update(ws)
        corpus.update(ws)
    n = sum(corpus.values())
    for s, cnt in per_src.items():
        nt = sum(cnt.values())
        kl = sum((c / nt) * math.log((c / nt) / (corpus[w] / n))
                 for w, c in cnt.items())
        assert got[s][0] == nt
        assert abs(got[s][1] - round(kl, 6)) < 2e-6
    # source c's tokens are unique to it → largest divergence
    assert got["c"][1] > got["a"][1] and got["c"][1] > got["b"][1]
