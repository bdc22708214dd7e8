"""Review-paper augmentation profile (reference ``journals/review.py``).

Pure functions over the record dict; applied inside the parse UDF when
triggered (job parameter or the R1 heuristic), so no extra Spark stage
is needed. Dict insertion order of ``other_sections`` carries the
document order the reference relies on (SURVEY.md §2.12 R3).
"""

from __future__ import annotations

from typing import Any, Dict

from paperslicer_spark.functions.sections import canonical_section_name

_REVIEW_HEAD_CUES = (
    "search strategy",
    "study selection",
    "data extraction",
    "risk of bias",
    "quality assessment",
)


def should_apply(record: Dict[str, Any]) -> bool:
    meta = record.get("meta") or {}
    t = (meta.get("title") or "").lower()
    j = (meta.get("journal") or "").lower()
    if ("review" in t or "systematic" in t or "meta-analysis" in t
            or "periodontology 2000" in j):
        return True
    other = record.get("other_sections") or {}
    if other:
        heads = " ".join(h.lower() for h in other.keys())
        if any(k in heads for k in _REVIEW_HEAD_CUES):
            return True
    return False


def apply_review(record: Dict[str, Any]) -> Dict[str, Any]:
    sections = record.setdefault("sections", {})
    other = record.get("other_sections") or {}

    for head, text in list(other.items()):
        if canonical_section_name(head) == "materials_and_methods":
            if "materials_and_methods" in sections:
                sections["materials_and_methods"] += "\n\n" + text
            else:
                sections["materials_and_methods"] = text

    disc = sections.get("discussion") or ""
    if len(disc) < 300 and other:
        agg = []
        for head, text in other.items():
            if canonical_section_name(head) == "materials_and_methods":
                continue
            agg.append(f"{head}\n{text}")
        if agg:
            payload = "\n\n".join(agg)
            sections["discussion"] = disc + "\n\n" + payload if disc else payload
    return record
