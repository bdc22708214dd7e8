"""Deterministic synthetic transcript corpus (FIXTURES.md §1-§2, §7).

Generates TEI-like documents exercising every parser path of the
reference (heading variety, repeated canonical heads, figures with
coords/facs, fallback tables, references, review-profile docs,
Unicode-whitespace noise), splits each document's markup into
balanced per-turn fragments, and emits transcript rows
``(conv_id, turn_idx, role, text, tool, ts)``.

Everything is seeded (seed=42 convention); no wall-clock, no network.
The generator is shared between:

- :func:`write_local_corpus` — small pyarrow parquet for pytest;
- :func:`transcripts_df` — Spark-distributed generation via
  ``mapInPandas`` over ``spark.range`` (scales to bench corpora
  without driver-side materialization).

Turn-fragment contract (how a document is split): each turn's
``text`` is a *balanced* XML fragment — the ``<teiHeader>`` element,
an optional ``<facsimile>`` element, one-or-more ``<body>`` children,
or the ``<back>`` element. Reassembly (operators/assemble.py) wraps
them in the fixed TEI envelope in turn order. This makes per-turn
span extraction well-defined while full-document parity is preserved.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Dict, Iterator, List

from paperslicer_spark.functions.sections import exact_map, non_content_keys

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

WORDS = (
    "implant bone healing enamel dentin tissue clinical periodontal lesion "
    "cohort sample surface treatment resin composite retention torque graft "
    "membrane crestal apical buccal lingual survival failure outcome followup "
    "radiographic histologic marginal adaptation microleakage cement zirconia "
    "titanium abutment crown restoration caries sealant fluoride remineralize"
).split()

NOVEL_HEADS = [
    "Novel Protocol",
    "Epidemiology of benign oesophageal strictures",
    "Colour stability under thermocycling",
    "Shade matching workflow",
    "Operator training curriculum",
    "Digital workflow integration",
]

RULE_ONLY_HEADS = [
    "Bayesian meta-analysis of outcomes",   # -> methods via 'synthesis'? no: 'meta-analysis' not a key; 'analysis' not either — lands via fallback
    "Statistical considerations",            # methods keyword 'statistic'
    "Aims of the present work",              # intro keyword 'aim'
    "General discussion of findings",        # discussion keyword
    "Concluding remarks and conclusion",     # conclusions keyword
    "Key results overview",                  # results keyword
]

REVIEW_HEADS = ["Search Strategy", "Risk of Bias", "Data Extraction Methods"]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["grobid", "scraper", None]


def _sent(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n)).capitalize() + "."


def _para(rng: random.Random, noisy: bool = False) -> str:
    s = " ".join(_sent(rng, rng.randint(6, 18)) for _ in range(rng.randint(1, 4)))
    if noisy:
        # Unicode whitespace that Python str.split() collapses but Java \s+ does not
        mid = len(s) // 2
        s = s[:mid] + "   " + s[mid:]
    return s


def _div(head: str, rng: random.Random, n_paras: int = None, noisy: bool = False) -> str:
    from xml.sax.saxutils import escape

    n_paras = n_paras if n_paras is not None else rng.randint(1, 3)
    paras = "".join(f"<p>{_para(rng, noisy=noisy and i == 0)}</p>" for i in range(n_paras))
    return f"<div><head>{escape(head)}</head>{paras}</div>"


def build_document(doc_idx: int, seed: int = 42, size_mult: int = 1) -> List[str]:
    """Build one document as a list of balanced turn fragments."""
    rng = random.Random((seed << 20) ^ doc_idx)
    is_review = doc_idx % 7 == 3

    title = ("A systematic review of " if is_review else "A study of ") + " ".join(
        rng.choice(WORDS) for _ in range(4)
    )
    authors = "".join(
        f"<author><persName><forename>{chr(65 + rng.randrange(26))}</forename>"
        f"<surname>Sur{rng.randrange(999)}</surname></persName>"
        + (
            f"<affiliation><orgName>Dept {rng.randrange(50)}</orgName>"
            f"<address><settlement>City{rng.randrange(30)}</settlement>"
            f"<country>Country{rng.randrange(10)}</country></address></affiliation>"
            if rng.random() < 0.7 else ""
        )
        + "</author>"
        for _ in range(rng.randint(1, 4))
    )
    kw = ""
    if rng.random() < 0.6:
        terms = [rng.choice(WORDS) for _ in range(rng.randint(2, 5))]
        if rng.random() < 0.5:
            terms.append(terms[0].upper())  # case-duplicate → dedup path
        kw = ("<textClass><keywords>"
              + "".join(f"<term>{t}</term>" for t in terms)
              + "</keywords></textClass>")
    abstract = (
        f"<abstract>{_para(rng)}</abstract>" if rng.random() < 0.85 else ""
    )
    header = (
        "<teiHeader><fileDesc>"
        f"<titleStmt><title>{title}</title></titleStmt>"
        "<sourceDesc><biblStruct>"
        f"<analytic>{authors}</analytic>"
        f"<monogr><title>Journal of Synthetic Dentistry {doc_idx % 17}</title></monogr>"
        f"<idno type=\"DOI\">10.9999/synth.{doc_idx}</idno>"
        "</biblStruct></sourceDesc></fileDesc>"
        f"<profileDesc>{abstract}{kw}</profileDesc>"
        "</teiHeader>"
    )

    fragments: List[str] = [header]
    if rng.random() < 0.3:
        fragments.append(
            f"<facsimile><surface n=\"2\"><zone xml:id=\"zf{doc_idx}\" "
            "ulx=\"10\" uly=\"20\" lrx=\"60\" lry=\"80\"/></surface></facsimile>"
        )

    body_children: List[str] = []
    exact_heads = sorted(exact_map().keys())
    nc_heads = sorted(non_content_keys())

    body_children.append(f"<pb n=\"1\"/>")
    body_children.append(_div("Introduction", rng, noisy=True))
    # numbered + piped heading forms
    body_children.append(_div(f"{rng.randint(2, 4)}.1. Statistical Analysis", rng))
    body_children.append(_div("| " + rng.choice(exact_heads).title(), rng))
    # repeated canonical head → "\n\n" append semantics
    rep = rng.choice(["Results", "Discussion", "Methods"])
    body_children.append(_div(rep, rng))
    body_children.append(_div(rep, rng))
    # short discussion for review docs (augmentation trigger needs <300 chars)
    if is_review:
        body_children.append("<div><head>Discussion</head><p>Brief note.</p></div>")
        for h in REVIEW_HEADS:
            body_children.append(_div(h, rng, n_paras=1))
    # novel / rule-only / non-content / empty / figure-head divs
    body_children.append(_div(rng.choice(NOVEL_HEADS), rng))
    body_children.append(_div(rng.choice(RULE_ONLY_HEADS), rng))
    body_children.append(_div(rng.choice(nc_heads).replace("_", " ").title(), rng))
    body_children.append("<div><head>Empty Div</head></div>")
    body_children.append(_div("Fig. 1", rng, n_paras=1))
    if rng.random() < 0.4:
        body_children.append(_div("Abstract", rng, n_paras=1))  # body abstract wins
    # nested divs: the reference's `.//p` makes outer divs absorb inner
    # divs' paragraphs AND processes the inner div separately — an
    # order-sensitive double-count that must be preserved exactly
    if rng.random() < 0.5:
        inner = _div("Statistical Analysis", rng, n_paras=1)
        body_children.append(
            f"<div><head>Results</head><p>{_para(rng)}</p>{inner}</div>")
    # <ab> blocks count as section content like <p>
    if rng.random() < 0.4:
        body_children.append(
            f"<div><head>Discussion</head><ab>{_para(rng)}</ab>"
            f"<p>{_para(rng)}</p></div>")
    # headless div: skipped by the reference entirely
    if rng.random() < 0.3:
        body_children.append(f"<div><p>{_para(rng)}</p></div>")

    # figures/tables
    body_children.append(
        f"<figure><head>Figure 1. Overview</head>"
        f"<graphic coords=\"1,{rng.randint(5, 99)},{rng.randint(5, 99)},50,40\"/>"
        f"<figDesc>{_sent(rng, 8)}</figDesc></figure>"
    )
    body_children.append(
        "<figure><graphic coords=\"10 10 50 40\"/>"
        f"<figDesc>Figure 2. {_sent(rng, 6)}</figDesc></figure>"
    )
    if rng.random() < 0.3:
        body_children.append(
            f"<figure facs=\"#zf{doc_idx}\"><head>Fig. 7</head>"
            f"<figDesc>{_sent(rng, 5)}</figDesc></figure>"
        )
    body_children.append(
        f"<figure type=\"table\"><head>Table 1. Baseline data</head>"
        f"<figDesc>{_sent(rng, 6)}</figDesc></figure>"
    )
    body_children.append(
        f"<table><head><label>Table 4</label> Distribution of {rng.choice(WORDS)}</head></table>"
    )
    # fallback tables (text pattern + ref anchor)
    body_children.append(f"<div><p>Table 2. {_sent(rng, 5)}</p></div>")
    body_children.append(
        f"<div><p>As shown in Table <ref type=\"table\">3</ref>, {_sent(rng, 6)}</p></div>"
    )

    # pad with extra filler divs (size_mult drives long-conversation skew)
    for k in range(rng.randint(2, 5) * size_mult):
        head = rng.choice(exact_heads if rng.random() < 0.5 else NOVEL_HEADS)
        body_children.append(_div(head.title(), rng))
        if k % 5 == 4:
            body_children.append(f"<pb n=\"{2 + k // 5}\"/>")

    # chunk body children into turn fragments (1-3 children per turn)
    i = 0
    while i < len(body_children):
        take = rng.randint(1, 3)
        fragments.append("".join(body_children[i:i + take]))
        i += take

    refs = "".join(
        "<biblStruct" + (f" xml:id=\"b{j}\"" if j % 3 != 2 else "") + ">"
        + (
            "<analytic>"
            f"<title type=\"main\">{_sent(rng, 5)[:-1]}</title>"
            f"<author><persName><forename>{chr(65 + j % 26)}</forename>"
            f"<surname>Ref{j}</surname></persName></author></analytic>"
            if j % 4 != 3 else ""  # monogr-only entries (book refs)
        )
        + f"<monogr><title>Proc {j}</title>"
        + (f"<idno type=\"DOI\">10.5555/r{doc_idx}.{j}</idno>" if j % 2 == 0 else "")
        + "<imprint>"
        + (f"<date type=\"published\" when=\"{1990 + j % 35}\">{1990 + j % 35}</date>"
           if j % 5 != 4 else f"<date when=\"{1990 + j % 35}\">{1990 + j % 35}</date>")
        + "</imprint></monogr></biblStruct>"
        for j in range(rng.randint(2, 6))
    )
    fragments.append(f"<back><listBibl>{refs}</listBibl></back>")
    return fragments


ENVELOPE_OPEN = "<TEI xmlns=\"http://www.tei-c.org/ns/1.0\">"


def assemble_payload(fragments: List[str]) -> str:
    """Reference reassembly rule (mirrored by the Spark expression in
    operators/assemble.py — keep the two in sync)."""
    header = "".join(f for f in fragments if f.startswith("<teiHeader"))
    facs = "".join(f for f in fragments if f.startswith("<facsimile"))
    back = "".join(f for f in fragments if f.startswith("<back"))
    body = "".join(
        f for f in fragments
        if not f.startswith(("<teiHeader", "<facsimile", "<back"))
    )
    return (
        ENVELOPE_OPEN + header + facs + "<text><body>" + body + "</body>"
        + back + "</text></TEI>"
    )


def doc_turn_rows(doc_idx: int, seed: int = 42, skew_every: int = 0,
                  skew_mult: int = 20) -> List[Dict]:
    """Transcript rows for one document (one conversation)."""
    size_mult = skew_mult if (skew_every and doc_idx % skew_every == 0) else 1
    frags = build_document(doc_idx, seed=seed, size_mult=size_mult)
    rng = random.Random((seed << 21) ^ doc_idx)
    conv_id = f"conv{doc_idx:08d}"
    rows = []
    for turn_idx, frag in enumerate(frags):
        rows.append({
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": ROLES[turn_idx % 3] if turn_idx else "tool",
            "text": frag,
            "tool": rng.choice(TOOLS),
            "ts": EPOCH + dt.timedelta(minutes=doc_idx, seconds=turn_idx),
        })
    return rows


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_df(spark, n_docs: int, seed: int = 42, skew_every: int = 0,
                   skew_mult: int = 20, partitions: int = None):
    """Distributed corpus generation: one task generates a doc-id range.

    Scales linearly with executors; nothing is materialized on the
    driver. Used by bench.py for the throughput corpus.
    """
    import pandas as pd

    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        for pdf in batches:
            data: dict = {c: [] for c in cols}
            for doc_idx in pdf["id"].tolist():
                for r in doc_turn_rows(int(doc_idx), seed=seed,
                                       skew_every=skew_every,
                                       skew_mult=skew_mult):
                    for c in cols:
                        data[c].append(r[c])
            yield pd.DataFrame(data)

    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def write_local_corpus(path: str, n_docs: int, seed: int = 42,
                       skew_every: int = 0, skew_mult: int = 20) -> None:
    """Small local parquet corpus for pytest (no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows: List[Dict] = []
    for i in range(n_docs):
        rows.extend(doc_turn_rows(i, seed=seed, skew_every=skew_every,
                                  skew_mult=skew_mult))
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]))
    pq.write_table(table, path)
