"""HTML main-content extraction (north-rule surface: "HTML boilerplate
strip"): drop non-content blocks (script/style/head/nav/footer/aside),
comments and tags, decode the common entities, collapse whitespace.

Pure JVM ``regexp_replace`` chain — every pattern is RE2-compatible
(no backreferences: one pattern per block tag; DuckDB's regex engine
is RE2, Java's supports the same subset) so the x34 oracle runs the
IDENTICAL chain. This is the regex tier of boilerplate removal — the
DOM-heuristic tier for real pages lives in extraction/tei.py's
DOM-lite parser; this column version is the one you can afford on
10^12 rows before deciding what deserves a full parse.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# block-level non-content containers, dropped with their contents
_BLOCK_TAGS = ["script", "style", "head", "nav", "footer", "aside"]

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def strip_html(col: Column) -> Column:
    """Main text of an HTML payload (boilerplate blocks removed)."""
    x = col
    for tag in _BLOCK_TAGS:
        x = F.regexp_replace(x, f"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def html_title(col: Column) -> Column:
    """<title> contents (whitespace-collapsed; '' when absent)."""
    t = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))
