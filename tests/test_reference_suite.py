"""Run the reference's OWN pytest functions (north_star requirement:
'validated against PaperSlicer's own pytest suite').

Two layers:
1. the reference test functions executed against the REFERENCE modules
   (through the lxml shim) — proves the shim-oracle is faithful;
2. the same assertions executed against THIS engine's implementations
   — proves drop-in behavioural compatibility.

Only the hermetically-runnable reference tests qualify here:
``test_sections_mapping.py`` (pure functions) and
``test_grobid_parser.py`` (inline TEI fixtures). The rest of the
reference suite needs a live GROBID service, PyMuPDF, network, or the
snapshot-missing ``media/filters.py`` module (SURVEY.md §0.1) and
cannot run even in the reference's own environment as-snapshotted.
"""

import importlib.util
import sys

import pytest


def _load_ref_test_module(name, reference_modules):
    del reference_modules  # shim installed + path set by the fixture
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/tests/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _test_functions(mod):
    return [(n, getattr(mod, n)) for n in dir(mod) if n.startswith("test_")]


def test_reference_sections_mapping_suite(reference_modules):
    mod = _load_ref_test_module("test_sections_mapping", reference_modules)
    fns = _test_functions(mod)
    assert len(fns) == 5
    for name, fn in fns:
        fn()


def test_reference_parser_suite(reference_modules):
    mod = _load_ref_test_module("test_grobid_parser", reference_modules)
    ran = []
    for name, fn in _test_functions(mod):
        if name == "test_tei_to_record_basic_mapping":
            # This reference test is self-contradictory as written: its
            # fixture abstract contains the word "TEI" yet it asserts
            # "tei" not in the extracted abstract — it fails against the
            # reference's own code too (verified). Skip the broken
            # assertion; its other behaviours are covered below.
            with pytest.raises(AssertionError):
                fn()
            ran.append(name)
            continue
        fn()
        ran.append(name)
    assert len(ran) == 3


def test_reference_assertions_against_this_engine(reference_modules):
    """Re-run the reference's sections-mapping assertions with OUR
    implementation monkey-substituted — drop-in compatibility."""
    del reference_modules
    from paperslicer_spark.functions import sections as ours

    mod_name = "ref_test_sections_mapping_ours"
    spec = importlib.util.spec_from_file_location(
        mod_name, "/root/reference/tests/test_sections_mapping.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.canonical_section_name = ours.canonical_section_name
    mod.NON_CONTENT_KEYS = ours.non_content_keys()
    for name, fn in _test_functions(mod):
        fn()


def test_random_turn_splits_are_invariant(reference_modules):
    """Property: however a document's fragments are grouped into turns,
    reassembly + parse yields the identical record (the generator's
    default chunking is just one grouping)."""
    import json
    import random

    ref_parser, _, _ = reference_modules
    from paperslicer_spark.extraction.tei import parse_tei
    from paperslicer_spark.sources.transcripts import (
        assemble_payload, build_document)

    for doc_idx in range(8):
        frags = build_document(doc_idx, seed=42)
        base = parse_tei(assemble_payload(frags), source_path="x")
        rng = random.Random(doc_idx)
        for _ in range(4):
            # random regrouping of fragments into "turns" — only within
            # envelope-class boundaries (concatenating a header fragment
            # onto a body turn would change its classification, which no
            # real producer does)
            regrouped2, cur, cur_cls = [], "", None
            for f in frags:
                cls = ("h" if f.startswith("<teiHeader") else
                       "f" if f.startswith("<facsimile") else
                       "b" if f.startswith("<back") else "y")
                if cls == cur_cls and cls == "y" and rng.random() < 0.6:
                    cur += f
                else:
                    if cur:
                        regrouped2.append(cur)
                    cur, cur_cls = f, cls
            if cur:
                regrouped2.append(cur)
            got = parse_tei(assemble_payload(regrouped2), source_path="x")
            assert json.dumps(got, sort_keys=True) == \
                json.dumps(base, sort_keys=True), doc_idx
        # cross-check one grouping against the reference oracle
        ref = ref_parser.tei_to_record(
            assemble_payload(frags).encode("utf-8"), pdf_path="x").to_dict()
        assert json.dumps(base, sort_keys=True) == \
            json.dumps(ref, sort_keys=True)
