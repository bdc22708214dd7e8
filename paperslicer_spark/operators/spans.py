"""Per-turn cleaning + span extraction — the throughput hot path.

The north metric is turns/sec with per-turn text+span equality
(BASELINE.json). This stage is a pure map (no shuffle): each turn's
balanced XML fragment is parsed in-executor (stdlib ElementTree inside
one Arrow-batched ``mapInPandas``), producing

- the turn's cleaned text (reference P1 semantics: Python
  ``str.split()`` whitespace collapse — ``parser.py:12-13``), and
- one row per content unit (paragraph, heading, caption) with
  ``char_start/char_end`` offsets into the cleaned turn text.

Invariant (checked by tests): ``clean_text ==
turn_clean_text[char_start:char_end]`` for every emitted unit, and the
unit text equals what the full-document reference parse produces for
the same node (units never straddle turns by the fragment contract).

Scale notes: embarrassingly parallel, scales with input partitions;
Arrow batch size is capped via ``spark.sql.execution.arrow.
maxRecordsPerBatch`` (multi-KB payload strings — see session.py).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from pyspark.sql import DataFrame

from paperslicer_spark.extraction.tei import T, normalize_space, _txt
from paperslicer_spark.functions.sections import canonical_section_name

SPAN_SCHEMA = (
    "conv_id string, turn_idx int, unit_idx int, kind string, "
    "section_label string, char_start int, char_end int, clean_text string"
)

CLEAN_SCHEMA = (
    "conv_id string, turn_idx int, clean_text string, n_units int, "
    "parse_ok boolean"
)

_WRAP_OPEN = '<w xmlns="http://www.tei-c.org/ns/1.0">'


def turn_units(fragment: str) -> tuple[str, List[dict], bool]:
    """Parse one balanced turn fragment → (clean_text, units, ok)."""
    from xml.etree import ElementTree as ET

    try:
        root = ET.fromstring(_WRAP_OPEN + fragment + "</w>")
    except ET.ParseError:
        # non-XML payload turn: clean = whitespace-collapsed raw text
        return normalize_space(fragment), [], False

    clean = normalize_space(" ".join(root.itertext()))
    parent = {id(c): p for p in root.iter() for c in p}

    def nearest_div_label(el) -> Optional[str]:
        p = parent.get(id(el))
        while p is not None:
            if p.tag == T("div"):
                head = p.find(T("head"))
                if head is not None:
                    key = canonical_section_name(_txt(head))
                    return key or None
                return None
            p = parent.get(id(p))
        return None

    units: List[dict] = []
    cursor = 0
    for el in root.iter():
        tag = el.tag
        kind = None
        label = None
        if tag in (T("p"), T("ab")):
            kind = "para"
            label = nearest_div_label(el)
        elif tag == T("head"):
            par = parent.get(id(el))
            ptag = par.tag if par is not None else ""
            if ptag == T("figure"):
                kind = "figure_head"
            elif ptag == T("table"):
                kind = "table_caption"
            else:
                kind = "div_head"
                label = canonical_section_name(_txt(el)) or None
        elif tag == T("figDesc"):
            par = parent.get(id(el))
            is_tab = par is not None and (par.get("type") or "").lower() == "table"
            kind = "table_desc" if is_tab else "figure_caption"
        if kind is None:
            continue
        text = _txt(el)
        if not text:
            continue
        start = clean.find(text, cursor)
        if start < 0:
            # nested-unit token overlap cannot occur for these tags;
            # defensive: skip rather than emit a broken span
            continue
        end = start + len(text)
        cursor = end
        units.append({
            "kind": kind,
            "section_label": label,
            "char_start": start,
            "char_end": end,
            "clean_text": text,
        })
    return clean, units, True


def extract_turn_spans(turns: DataFrame) -> DataFrame:
    """Transcripts → per-unit span rows (map-only, no shuffle).

    Output batches are built column-wise (dict-of-lists): constructing
    a pandas DataFrame from per-row dicts measured ~10× slower than the
    parse itself at bench scale — the Arrow boundary must stay cheap.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            conv_ids: list = []
            turn_idxs: list = []
            unit_idxs: list = []
            kinds: list = []
            labels: list = []
            starts: list = []
            ends: list = []
            texts: list = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if text is None:
                    continue
                _, units, _ = turn_units(text)
                ti = int(turn_idx)
                for i, u in enumerate(units):
                    conv_ids.append(conv_id)
                    turn_idxs.append(ti)
                    unit_idxs.append(i)
                    kinds.append(u["kind"])
                    labels.append(u["section_label"])
                    starts.append(u["char_start"])
                    ends.append(u["char_end"])
                    texts.append(u["clean_text"])
            yield pd.DataFrame({
                "conv_id": conv_ids, "turn_idx": turn_idxs,
                "unit_idx": unit_idxs, "kind": kinds,
                "section_label": labels, "char_start": starts,
                "char_end": ends, "clean_text": texts,
            })

    return turns.mapInPandas(run, schema=SPAN_SCHEMA)


def clean_turns(turns: DataFrame) -> DataFrame:
    """Per-turn cleaned text (P1) + unit count + parse flag."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            cleans, n_units, oks = [], [], []
            for text in pdf["text"]:
                clean, units, ok = turn_units(text or "")
                cleans.append(clean)
                n_units.append(len(units))
                oks.append(ok)
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].values,
                "turn_idx": pdf["turn_idx"].astype("int32").values,
                "clean_text": cleans, "n_units": n_units, "parse_ok": oks,
            })

    return turns.mapInPandas(run, schema=CLEAN_SCHEMA)
