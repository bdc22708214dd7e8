"""BPE trainer/encoder tests.

The reference oracle here is an INDEPENDENT in-test implementation
(Counter-based recount, regex-free two-pointer merges written
differently from the operator's), so the differential catches drift
in either side — the same pattern as the kmeans/asof differentials.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from paperslicer_spark.operators.tokenizer import (
    bpe_encode, bpe_encode_batch, bpe_train)

pytestmark = pytest.mark.usefixtures("spark")


def ref_bpe(texts, n_merges, min_count=1, min_pair_weight=2):
    """Independent reference BPE trainer (list-slicing merge form)."""
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    words = {tuple(w): c for w, c in wc.items() if c >= min_count}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), wt = best
        if wt < min_pair_weight:
            break
        merges.append((a, b, wt))
        new_words = Counter()
        for syms, c in words.items():
            out = []
            rest = list(syms)
            while rest:
                if len(rest) >= 2 and (rest[0], rest[1]) == (a, b):
                    out.append(a + b)
                    rest = rest[2:]
                else:
                    out.append(rest[0])
                    rest = rest[1:]
            new_words[tuple(out)] += c
        words = dict(new_words)
    return merges, words


def ref_encode(word, merges):
    syms = list(word)
    for a, b in merges:
        out = []
        rest = syms
        while rest:
            if len(rest) >= 2 and (rest[0], rest[1]) == (a, b):
                out.append(a + b)
                rest = rest[2:]
            else:
                out.append(rest[0])
                rest = rest[1:]
        syms = out
    return syms


CORPUS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat on the cat is flat",
    "banana bandana cabana",
    "aaaa aaa aa aaaa",          # overlap-adjacency edge
    "low lower lowest slower",
    "the the the rat sat flat",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


def test_train_matches_independent_reference(spark):
    got = bpe_train(_df(spark, CORPUS), "text", n_merges=12).collect()
    exp, _ = ref_bpe(CORPUS, 12)
    assert [(r["left"], r["right"], r["weight"]) for r in got] == exp
    assert [r["step"] for r in got] == list(range(1, len(exp) + 1))
    assert all(r["merged"] == r["left"] + r["right"] for r in got)


def test_train_overlap_edge(spark):
    # 'aaaa' x2 + 'aaa' + 'aa': pair (a,a) weight = 3+3+2+1+1... the
    # independent reference defines truth; the key property checked
    # here is the non-overlapping rewrite: 'aaaa' -> (aa)(aa), never
    # (aa)a(a-dangling) or a triple merge in one step.
    texts = ["aaaa aaa aa aaaa"]
    got = bpe_train(_df(spark, texts), "text", n_merges=3).collect()
    exp, _ = ref_bpe(texts, 3)
    assert [(r["left"], r["right"], r["weight"]) for r in got] == exp
    assert got[0]["left"] == "a" and got[0]["right"] == "a"
    # after merge 1 alone, the vocab word 'aaaa' must be ('aa','aa')
    _, words1 = ref_bpe(texts, 1)
    assert ("aa", "aa") in words1


def test_train_min_count_and_cap(spark):
    texts = ["zzz " * 5 + "qqq", "zzz yyy zzz yyy"]
    # min_count=2 drops the hapax 'qqq' from the trainer vocab
    got = bpe_train(_df(spark, texts), "text", n_merges=2,
                    min_count=2).collect()
    assert all("q" not in r["merged"] for r in got)
    # a 1-word cap keeps only the heaviest word ('zzz' x7)
    capped = bpe_train(_df(spark, texts), "text", n_merges=1,
                       max_vocab_words=1).collect()
    assert capped[0]["left"] == "z" and capped[0]["right"] == "z"
    assert capped[0]["weight"] == 14  # 2 adjacencies x 7 occurrences


def test_train_stops_below_min_pair_weight(spark):
    # every word unique, all pair weights 1 -> no merges at default
    texts = ["abc def", "ghi jkl"]
    assert bpe_train(_df(spark, texts), "text", n_merges=5).count() == 0
    # min_pair_weight=1 merges hapax pairs deterministically
    got = bpe_train(_df(spark, texts), "text", n_merges=2,
                    min_pair_weight=1).collect()
    exp, _ = ref_bpe(texts, 2, min_pair_weight=1)
    assert [(r["left"], r["right"], r["weight"]) for r in got] == exp


def test_encode_matches_reference_per_word(spark):
    df = _df(spark, CORPUS)
    merges_df = bpe_train(df, "text", n_merges=12)
    merges = [(r["left"], r["right"]) for r in merges_df.collect()]
    enc = bpe_encode(df, "text", merges).orderBy("doc_id").collect()
    for row, text in zip(enc, CORPUS):
        exp = [t for w in text.lower().split() if w
               for t in ref_encode(w, merges)]
        assert row["bpe_tokens"] == exp, text
        assert row["bpe_tokens_n"] == len(exp)


def test_encode_empty_merges_is_chars(spark):
    enc = bpe_encode(_df(spark, ["ab c"]), "text", []).collect()[0]
    assert enc["bpe_tokens"] == ["a", "b", "c"]
    assert enc["bpe_tokens_n"] == 3


def test_encode_batch_parity_with_hof(spark):
    # the Arrow-batched production encoder must be row-identical to
    # the JVM HOF form (same parity contract as fused vs staged parse)
    df = _df(spark, CORPUS)
    merges = [(r["left"], r["right"])
              for r in bpe_train(df, "text", n_merges=12).collect()]
    a = bpe_encode(df, "text", merges).orderBy("doc_id").collect()
    b = bpe_encode_batch(df, "text", merges).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_encode_trained_tokens_reconstruct_text(spark):
    df = _df(spark, CORPUS)
    merges = [(r["left"], r["right"])
              for r in bpe_train(df, "text", n_merges=12).collect()]
    enc = bpe_encode(df, "text", merges)
    joined = enc.select(
        "doc_id",
        F.concat_ws("", "bpe_tokens").alias("rejoined"),
        F.concat_ws("", F.split(F.lower(F.trim("text")),
                                r"\s+")).alias("orig"))
    assert joined.where(F.col("rejoined") != F.col("orig")).count() == 0
