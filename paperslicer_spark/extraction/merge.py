"""Table-entry merge/dedup (reference ``pipeline.py:21-73``).

Pure function over the record dict: groups table entries by
caption-lowercase (else label-lowercase, else path, else position),
first-wins field coalesce for ``label/caption/coords/pdf_bbox/path``,
``source`` becomes the ``"+"``-join of the sorted unique source tags,
and first-seen order is preserved.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple


def merge_table_entries(record: Dict[str, Any]) -> None:
    tables = record.get("tables")
    if not tables:
        return
    merged: Dict[Tuple[str, str], Dict[str, Any]] = {}
    ordered: List[Dict[str, Any]] = []
    sources: Dict[int, set] = {}

    for tbl in tables:
        if not isinstance(tbl, dict):
            continue
        label = (tbl.get("label") or "").strip()
        caption = (tbl.get("caption") or "").strip()
        if caption:
            key = ("caption", caption.lower())
        elif label:
            key = ("label", label.lower())
        elif tbl.get("path"):
            key = ("path", str(tbl.get("path")))
        else:
            key = ("index", str(len(ordered)))
        existing = merged.get(key)
        if existing is None:
            data = dict(tbl)
            src = data.get("source")
            srcs = {src} if src else set()
            if srcs:
                data["source"] = "+".join(sorted(srcs))
            sources[id(data)] = srcs
            ordered.append(data)
            merged[key] = data
            existing = data
        else:
            src = tbl.get("source")
            if src:
                sources[id(existing)].add(src)
        for field in ("label", "caption", "coords", "pdf_bbox"):
            if not existing.get(field) and tbl.get(field):
                existing[field] = tbl[field]
        if not existing.get("path") and tbl.get("path"):
            existing["path"] = tbl["path"]

    for data in ordered:
        srcs = sorted(s for s in sources.get(id(data), set()) if s)
        if srcs:
            data["source"] = "+".join(srcs)
        elif "source" in data and not data["source"]:
            data.pop("source")

    record["tables"] = ordered
