"""Single-document extraction comparator (debug utility).

The engine analog of the reference's ``scripts/compare_extraction.py``
(360-LoC side-by-side comparator): parse ONE document with this
engine's extractor and with the reference extractor (running through
the tests/lxml_shim executable oracle), then print a field-by-field
diff — meta, section keys + lengths, figures/tables/references — with
the first text divergence per section. Exit code 1 on any mismatch, so
it doubles as a spot-check gate.

Usage::

    python scripts/compare_doc.py --doc-idx 3          # synthetic corpus doc
    python scripts/compare_doc.py --tei /path/file.xml # arbitrary TEI file
    python scripts/compare_doc.py --doc-idx 0 --skew   # the skewed variant
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _first_diff(a: str, b: str) -> str:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            lo = max(0, i - 30)
            return (f"first diff at char {i}: "
                    f"ours …{a[lo:i + 30]!r} vs ref …{b[lo:i + 30]!r}")
    return f"length {len(a)} vs {len(b)} (common prefix identical)"


def compare(payload: str, source: str) -> int:
    import lxml_shim
    lxml_shim.install()
    ref_mod_dir = "/root/reference"
    if ref_mod_dir not in sys.path:
        sys.path.insert(0, ref_mod_dir)
    from paperslicer.grobid import parser as ref_parser  # noqa: E402

    from paperslicer_spark.extraction.tei import parse_tei

    ref = ref_parser.tei_to_record(payload.encode("utf-8"),
                                   pdf_path=source).to_dict()
    mine = parse_tei(payload, source_path=source)

    bad = 0

    def check(label, a, b, detail=""):
        nonlocal bad
        ok = a == b
        mark = "=" if ok else "!"
        if not ok:
            bad += 1
        print(f" {mark} {label:28s} ours={a!r:.60} ref={b!r:.60} {detail}")

    print(f"== {source}")
    for k in ("title", "journal", "doi"):
        check(f"meta.{k}", mine["meta"].get(k), ref["meta"].get(k))
    check("meta.keywords", mine["meta"].get("keywords"),
          ref["meta"].get("keywords"))
    check("meta.n_authors", len(mine["meta"]["authors"]),
          len(ref["meta"]["authors"]))

    keys_m, keys_r = set(mine["sections"]), set(ref["sections"])
    check("section keys", sorted(keys_m), sorted(keys_r))
    for k in sorted(keys_m & keys_r):
        a, b = mine["sections"][k], ref["sections"][k]
        if a != b:
            bad += 1
            print(f" ! sections[{k}]: {_first_diff(a, b)}")
        else:
            print(f" = sections[{k}] ({len(a)} chars)")
    check("other_sections keys", sorted(mine["other_sections"]),
          sorted(ref["other_sections"]))
    for kind in ("figures", "tables"):
        check(f"n_{kind}", len(mine[kind]), len(ref[kind]))
        for i, (m, r) in enumerate(zip(mine[kind], ref[kind])):
            for f in ("label", "caption", "source", "coords"):
                if m.get(f) != r.get(f):
                    bad += 1
                    print(f" ! {kind}[{i}].{f}: ours={m.get(f)!r} "
                          f"ref={r.get(f)!r}")
    check("n_references", len(mine["references"]), len(ref["references"]))
    print("MATCH" if bad == 0 else f"{bad} MISMATCHES")
    return 1 if bad else 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-idx", type=int, help="synthetic corpus doc index")
    ap.add_argument("--tei", help="path to a TEI XML file")
    ap.add_argument("--skew", action="store_true",
                    help="use the skewed (size_mult=30) synthetic variant")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    if args.tei:
        with open(args.tei, encoding="utf-8") as f:
            payload = f.read()
        source = args.tei
    elif args.doc_idx is not None:
        from paperslicer_spark.sources.transcripts import (
            assemble_payload, build_document)
        payload = assemble_payload(build_document(
            args.doc_idx, seed=args.seed,
            size_mult=30 if args.skew else 1))
        source = f"conv{args.doc_idx:08d}"
    else:
        ap.error("one of --doc-idx / --tei is required")
        return
    sys.exit(compare(payload, source))


if __name__ == "__main__":
    main()
