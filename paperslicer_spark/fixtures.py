"""Frozen extraction-record fixtures: splitting extraction from analytics.

The TEI parse is not SQL-expressible, so analytics queries over
extracted records (x06/x07/x10/x17) could only get rows-only checks.
This module freezes the contract corpus' extracted records — flattened
to scalar long tables — to committed parquet under ``fixtures/``, plus
a deterministic synthetic ground-truth table:

- the live pipeline output is parity-gated against the frozen tables
  by ``tests/test_fixture_freeze.py`` (fixtures can never go stale);
- ``oracle_sql()`` recomputes each aggregation from the frozen tables
  in DuckDB, upgrading those queries from rows-only to value-hash
  oracles. Regenerate with ``python scripts/freeze_fixtures.py``.

The truth table mirrors the reference's extraction maps
(``manus_work/file_extraction_in_json/*_extraction_map.json`` shape:
metadata / abstract slices / expected sections / structural counts)
but is synthesized from the engine's own synthetic corpus with seeded
perturbations, so every scoring branch (mismatching titles, drifted
word counts, absent abstracts, over/under-counted figures) is hit.
"""

from __future__ import annotations

import os
import random

import pandas as pd

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")

TABLES = ["rec_meta", "rec_sections", "rec_media", "rec_refs", "truth",
          "rec_spans", "turns", "asset_features", "asset_stats",
          "frame_stats", "audio_stats", "image_dhash"]


def flatten_records(rows) -> dict[str, pd.DataFrame]:
    """Collected record Rows → the four flattened scalar frames, in
    deterministic (conv_id, position) order."""
    meta, secs, media, refs = [], [], [], []
    for r in sorted(rows, key=lambda x: x["conv_id"]):
        cid = r["conv_id"]
        meta.append({
            "conv_id": cid, "status": r["status"], "title": r["title"],
            "journal": r["journal"], "doi": r["doi"],
            "n_authors": len(r["authors"] or []),
            "n_keywords": len(r["keywords"] or []),
        })
        pos = 0
        for k, v in (r["sections"] or {}).items():
            secs.append({"conv_id": cid, "pos": pos, "section_label": k,
                         "clean_text": v, "is_canonical": True})
            pos += 1
        for os_ in (r["other_sections"] or []):
            secs.append({"conv_id": cid, "pos": pos,
                         "section_label": os_["head"],
                         "clean_text": os_["text"], "is_canonical": False})
            pos += 1
        for kind, arr in (("figure", r["figures"]), ("table", r["tables"])):
            for i, m in enumerate(arr or []):
                media.append({"conv_id": cid, "kind": kind, "pos": i,
                              "label": m["label"], "caption": m["caption"],
                              "source": m["source"], "coords": m["coords"]})
        for ref in (r["references"] or []):
            refs.append({
                "conv_id": cid, "ref_index": ref["index"],
                "text": ref["text"], "ref_id": ref["id"],
                "title": ref["title"], "doi": ref["doi"],
                "year": ref["year"],
                "authors": "|".join(ref["authors"] or []),
            })
    return {
        "rec_meta": pd.DataFrame(meta),
        "rec_sections": pd.DataFrame(secs),
        "rec_media": pd.DataFrame(media),
        "rec_refs": pd.DataFrame(refs),
    }


def synth_truth(rows, seed: int = 42) -> pd.DataFrame:
    """Deterministic ground-truth maps derived from the records with
    seeded perturbations so every scoring branch is exercised."""
    out = []
    for i, r in enumerate(sorted(rows, key=lambda x: x["conv_id"])):
        rng = random.Random((seed << 20) ^ i)
        secs = dict(r["sections"] or {})
        abstract = secs.get("abstract") or ""
        branch = i % 6
        exp_title = r["title"]
        if branch == 1 and exp_title:
            exp_title = f"Unrelated Expected Title {i}"     # containment miss
        elif branch == 2 and exp_title and len(exp_title) > 12:
            exp_title = exp_title[2:12].lower()             # substring hit
        exp_doi = r["doi"]
        if branch == 3 and exp_doi:
            exp_doi = exp_doi + ".v2"                       # exact-match miss
        abs_present = bool(abstract) if branch != 4 else False
        first50, last50, wc = None, None, 0
        if abs_present:
            first50 = abstract[:50]
            last50 = abstract[-50:] if len(abstract) > 50 else abstract
            if branch == 5 and len(first50) > 10:           # noisy slice
                cut = rng.randrange(5, len(first50) - 1)
                first50 = first50[:cut] + "#" + first50[cut + 1:]
            wc = len(abstract.split()) + rng.choice([0, 0, 1, -2, 7])
        canon5 = ["introduction", "materials_and_methods", "results",
                  "discussion", "conclusions"]
        present5 = [k for k in canon5 if secs.get(k)]
        exp_sections = sorted(set(
            present5 + ([rng.choice(canon5)] if branch in (0, 3) else [])))
        n_f = len(r["figures"] or [])
        n_t = len(r["tables"] or [])
        out.append({
            "conv_id": r["conv_id"], "exp_title": exp_title,
            "exp_doi": exp_doi, "exp_journal": r["journal"],
            "abs_present": abs_present, "abs_first50": first50,
            "abs_last50": last50, "abs_word_count": int(wc),
            "exp_sections": exp_sections,
            "exp_figures": max(0, n_f + rng.choice([0, 0, 1, -1])),
            "exp_tables": max(0, n_t + rng.choice([0, 0, 1])),
        })
    return pd.DataFrame(out)


def build_all(spark) -> dict[str, pd.DataFrame]:
    import __spark_entry__ as entrymod
    from paperslicer_spark.operators.spans import extract_turn_spans

    rows = entrymod._synth_records(spark).collect()
    frames = flatten_records(rows)
    frames["truth"] = synth_truth(rows)
    # per-turn spans (x05 reproduction oracle), deterministic order
    span_cols = ["conv_id", "turn_idx", "unit_idx", "kind",
                 "section_label", "char_start", "char_end", "clean_text"]
    spans = sorted(
        (tuple(r[c] for c in span_cols)
         for r in extract_turn_spans(entrymod._synth_turns(spark)).collect()))
    frames["rec_spans"] = pd.DataFrame(spans, columns=span_cols)
    # raw synthetic turns (x14 gets an INDEPENDENT SQL rollup over them)
    turn_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    turns = sorted(
        (tuple(r[c] for c in turn_cols)
         for r in entrymod._synth_turns(spark).collect()))
    tdf = pd.DataFrame(turns, columns=turn_cols)
    tdf["ts"] = tdf["ts"].astype("datetime64[us]")
    frames["turns"] = tdf
    # multimodal contract-query outputs (deterministic fake-codec
    # corpus): x11/x19 reproduction oracles
    qs = entrymod.queries()
    for name, key in (("x11_multimodal_features", "asset_features"),
                      ("x19_pixel_filters", "asset_stats"),
                      ("x30_frame_sample", "frame_stats"),
                      ("x31_audio_features", "audio_stats")):
        pdf = qs[name](spark, "").toPandas()
        frames[key] = pdf.sort_values(list(pdf.columns)).reset_index(
            drop=True)
    # dHash SIGNATURES at the x96 cap (480 originals + every-5th
    # perturbed copy at id+100000) — the oracle recomputes the banded
    # pair join in SQL from these, so only the perceptual hash itself
    # is replayed, not the dedup.  Per-asset hashes depend ONLY on
    # asset_id (prefix-stability invariant), so this one fixture
    # serves every sf via the oracle's `asset_id < n` filter; the
    # 12/480 divisor/cap rule lives in x96's _scaled_clips call and
    # the oracle's scalar subquery — change them together.
    from paperslicer_spark.operators.multimodal import (image_dhash,
                                                        perturb_assets,
                                                        synth_assets)
    assets = synth_assets(spark, 480, seed=42)
    corpus = assets.unionByName(perturb_assets(assets, every=5))
    pdf = image_dhash(corpus).toPandas()
    frames["image_dhash"] = pdf.sort_values(
        list(pdf.columns)).reset_index(drop=True)
    return frames


def build_ivf_centroids(spark, sf_dir: str = "/root/testdata/sf0.01",
                        n_lists: int = 16, seed: int = 42) -> pd.DataFrame:
    """Train the IVF coarse quantizer once and freeze its centroids —
    the model artifact for ``similarity.ivf_topk_frozen``.

    Unlike the extraction fixtures this is NOT parity-gated byte-exact:
    KMeans float reductions vary with partitioning, and ANY centroid
    set defines a valid (deterministically replayable) IVF index — the
    frozen table is a model, not a derived output. Regenerated only
    with ``freeze_fixtures.py --ivf``. x15's correctness signal is the
    DuckDB oracle replaying assignment+probe+top-k from this table.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    feat = emb.select(array_to_vector("embedding").alias("features"))
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(feat)
    return pd.DataFrame({
        "list_id": range(n_lists),
        "center": [[float(x) for x in c] for c in model.clusterCenters()],
    })


def write_all(frames: dict[str, pd.DataFrame],
              out_dir: str = FIXTURE_DIR) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        frames[name].reset_index(drop=True).to_parquet(
            os.path.join(out_dir, f"{name}.parquet"), index=False)


def read_all(in_dir: str = FIXTURE_DIR) -> dict[str, pd.DataFrame]:
    return {name: pd.read_parquet(os.path.join(in_dir, f"{name}.parquet"))
            for name in TABLES}
