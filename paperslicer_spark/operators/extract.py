"""Document extraction: fused Arrow-batched parse UDF + exploded views.

This is the Spark-side replacement for the reference's per-PDF loop
(``project.py:174-192`` → ``pipeline.process``): ONE ``mapInPandas``
stage runs the whole record assembly (DOM-lite parse + table merge +
review profile) per document, so there is exactly one
JVM↔Python/Arrow boundary on the hot path (SURVEY.md §4.6).

Error model mirrors the reference's per-document try/except
(``project.py:57-62``): failures become ``status='error'`` rows, never
task failures — at 10^12-turn scale one malformed payload must not
kill a stage.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, functions as F

from paperslicer_spark.extraction.merge import merge_table_entries
from paperslicer_spark.extraction.review import apply_review, should_apply
from paperslicer_spark.extraction.tei import parse_tei

RECORD_SCHEMA = (
    "conv_id string, status string, error string, "
    "title string, journal string, doi string, "
    "authors array<struct<name:string,affiliation:string>>, "
    "keywords array<string>, "
    "sections map<string,string>, "
    "other_sections array<struct<head:string,text:string>>, "
    "figures array<struct<label:string,caption:string,path:string,source:string,coords:string>>, "
    "tables array<struct<label:string,caption:string,path:string,source:string,coords:string>>, "
    "references array<struct<index:int,text:string,id:string,title:string,doi:string,year:string,authors:array<string>>>"
)

_EMPTY = {
    "title": None, "journal": None, "doi": None, "authors": [],
    "keywords": [], "sections": {}, "other_sections": [],
    "figures": [], "tables": [], "references": [],
}


def _flatten(conv_id: str, rec: dict) -> dict:
    meta = rec.get("meta") or {}
    return {
        "conv_id": conv_id,
        "status": "ok",
        "error": None,
        "title": meta.get("title"),
        "journal": meta.get("journal"),
        "doi": meta.get("doi"),
        "authors": [
            {"name": a.get("name"), "affiliation": a.get("affiliation")}
            for a in (meta.get("authors") or [])
        ],
        "keywords": list(meta.get("keywords") or []),
        "sections": dict(rec.get("sections") or {}),
        "other_sections": [
            {"head": h, "text": t}
            for h, t in (rec.get("other_sections") or {}).items()
        ],
        "figures": [
            {"label": f.get("label"), "caption": f.get("caption"),
             "path": f.get("path"), "source": f.get("source"),
             "coords": f.get("coords")}
            for f in (rec.get("figures") or [])
        ],
        "tables": [
            {"label": t.get("label"), "caption": t.get("caption"),
             "path": t.get("path"), "source": t.get("source"),
             "coords": t.get("coords")}
            for t in (rec.get("tables") or [])
        ],
        "references": [
            {"index": r.get("index"), "text": r.get("text"),
             "id": r.get("id"), "title": r.get("title"),
             "doi": r.get("doi"), "year": r.get("year"),
             "authors": list(r.get("authors") or [])}
            for r in (rec.get("references") or [])
        ],
    }


_COLS = ["conv_id", "status", "error", "title", "journal", "doi",
         "authors", "keywords", "sections", "other_sections",
         "figures", "tables", "references"]

# "no conversation open yet" sentinel for the fused group-detection
# loops. It must be distinct from None: the agg path's groupBy keeps a
# NULL conv_id as a real group, so a genuine null key has to open and
# close a group here too — `state["conv"] is None` would silently drop
# every null-keyed turn (None != None is False, the group never opens).
_UNSET = object()


def _build_row(conv_id: str, payload: str, merge_tables: bool,
               review_mode: Optional[bool]) -> dict:
    """Parse one assembled payload → flat record row (error-row model)."""
    try:
        rec = parse_tei(payload, source_path=conv_id)
        if merge_tables:
            merge_table_entries(rec)
        if review_mode is True or (review_mode is None and should_apply(rec)):
            apply_review(rec)
        return _flatten(conv_id, rec)
    except Exception as e:  # noqa: BLE001 — error-row model
        row = dict(_EMPTY)
        row.update(conv_id=conv_id, status="error",
                   error=f"{type(e).__name__}: {e}")
        return row


def parse_documents(docs: DataFrame, merge_tables: bool = True,
                    review_mode: Optional[bool] = None) -> DataFrame:
    """``(conv_id, payload)`` → typed record rows.

    ``review_mode``: True forces the review profile, False disables it,
    None applies the reference heuristic (``journals/review.py:10-20``).
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            cols: dict = {c: [] for c in _COLS}
            for conv_id, payload in zip(pdf["conv_id"].tolist(),
                                        pdf["payload"].tolist()):
                row = _build_row(conv_id, payload, merge_tables, review_mode)
                for c in _COLS:
                    cols[c].append(row[c])
            yield pd.DataFrame(cols)

    return docs.mapInPandas(run, schema=RECORD_SCHEMA)


def _fused_partitions(t: DataFrame, partitions: Optional[int]) -> int:
    """Data-proportional repartition width: at least the source's own
    split count (∝ input bytes / maxPartitionBytes), floored by 2×
    cores — a cores-only default would under-partition a 100 TB input
    into enormous reducer tasks."""
    if partitions:
        return partitions
    try:
        src_parts = t.rdd.getNumPartitions()
    except Exception:  # non-scan sources where planning the RDD is costly
        src_parts = 0
    return max(t.sparkSession.sparkContext.defaultParallelism * 2, src_parts)


def check_conv_alignment(turns: DataFrame) -> int:
    """Number of conversations straddling >1 input partition — 0 means
    the layout satisfies ``conv_aligned=True``'s contract. Diagnostic
    (one groupBy shuffle over (conv_id, partition_id) pairs, no
    payload bytes): run once when onboarding a new table layout, not
    per job — the per-job guard is the free count assertion
    (records == conversations) noted in ``parse_turns_fused``."""
    return (
        turns.select("conv_id", F.spark_partition_id().alias("pid"))
        .groupBy("conv_id")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .where(F.col("n_parts") > 1)
        .count()
    )


def parse_turns_fused(turns: DataFrame, merge_tables: bool = True,
                      review_mode: Optional[bool] = None,
                      conv_aligned: bool = False,
                      partitions: Optional[int] = None,
                      batch_rows: int = 512,
                      max_turns_per_conv: Optional[int] = None) -> DataFrame:
    """Transcript turns → typed records with NO payload shuffle — the
    scale path, row-identical to ``parse_documents(assemble_documents(
    turns))`` (parity-enforced in tests/test_spark_extract.py).

    The agg path shuffles every assembled payload byte through a
    ``collect_list`` + ``array_sort`` of multi-KB strings and then
    ships it across the Arrow boundary; measured, that JVM agg stage is
    the records pipeline's non-scaling term (BENCH/scaling.json round 2
    decomposition: ~10 s floor regardless of cores). Here the only
    shuffle is a plain hash ``repartition`` of RAW turn rows on
    ``conv_id`` — no aggregation state, no big-array sort — rows are
    sorted within partitions, and per-conversation assembly happens
    INSIDE the same ``mapInPandas`` that parses: turn bytes cross the
    JVM↔Python boundary exactly once, compact records come back.

    ``conv_aligned=True`` additionally skips the repartition for
    sources whose layout guarantees a conversation never straddles
    partitions (the 100 TB deployment: Iceberg table bucketed by
    ``conv_id``, sorted by ``turn_idx`` — plans/checkpoint.py DDL);
    the stage is then a pure map, like the spans hot path.

    FILE-SPLIT CAVEAT: bucketing guarantees one bucket FILE per
    conversation, but Spark splits large parquet files across tasks at
    ``spark.sql.files.maxPartitionBytes`` boundaries — a bucket file
    over that size can split one conversation into two input
    partitions and silently emit two partial records. The layout
    contract is therefore: bucket files under ``maxPartitionBytes``,
    OR ``read.split.target-size`` >= the max file size / file
    splitting disabled (checkpoint.py DDL notes the same). Cheap
    runtime guard when doc count is known: assert output record count
    == conversation count (bench_scaling.py does exactly this); or
    run ``check_conv_alignment`` below on a new layout once.

    Long-conversation skew: a 1000× conversation is one Python group
    inside one task (bounded by its own payload size), never a hot
    reducer materializing a 10^5-element array — the skew-split salted
    agg remains available in assemble_documents for sources where even
    single payloads must be pre-reduced. ``max_turns_per_conv`` is the
    worker-memory guardrail for adversarial inputs: a conversation
    exceeding it becomes a ``status='error'`` row (its fragments are
    dropped as they stream in, so a 1 GB outlier never buffers), never
    a task OOM.
    """
    t = turns.select("conv_id", "turn_idx", "text")
    if not conv_aligned:
        t = t.repartition(_fused_partitions(t, partitions), "conv_id")
    # text tiebreak mirrors array_sort(struct(pos,text)) in the agg path
    t = t.sortWithinPartitions("conv_id", "turn_idx", "text")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from paperslicer_spark.sources.transcripts import assemble_payload

        cols: dict = {c: [] for c in _COLS}
        state = {"n": 0, "conv": _UNSET, "frags": [], "over": False}

        def close_conv():
            if state["over"]:
                row = dict(_EMPTY)
                row.update(conv_id=state["conv"], status="error",
                           error=f"oversized: > {max_turns_per_conv} turns")
            else:
                row = _build_row(state["conv"],
                                 assemble_payload(state["frags"]),
                                 merge_tables, review_mode)
            for c in _COLS:
                cols[c].append(row[c])
            state["n"] += 1

        for pdf in batches:
            for conv_id, text in zip(pdf["conv_id"].tolist(),
                                     pdf["text"].tolist()):
                if conv_id != state["conv"]:
                    if state["conv"] is not _UNSET:
                        close_conv()
                    state["conv"], state["frags"] = conv_id, []
                    state["over"] = False
                if state["over"]:
                    continue  # oversized: drop fragments, never buffer
                if text:  # null/empty fragments skipped (agg-path parity)
                    state["frags"].append(text)
                    if (max_turns_per_conv
                            and len(state["frags"]) > max_turns_per_conv):
                        state["over"], state["frags"] = True, []
            if state["n"] >= batch_rows:
                yield pd.DataFrame(cols)
                for c in _COLS:
                    cols[c] = []
                state["n"] = 0
        if state["conv"] is not _UNSET:
            close_conv()
        if state["n"]:
            yield pd.DataFrame(cols)

    return t.mapInPandas(run, schema=RECORD_SCHEMA)


SECTIONS_SCHEMA = (
    "conv_id string, section_label string, clean_text string, "
    "is_canonical boolean"
)


def _sections_pa_schema():
    import pyarrow as pa
    return pa.schema([
        ("conv_id", pa.string()), ("section_label", pa.string()),
        ("clean_text", pa.string()), ("is_canonical", pa.bool_()),
    ])


# Marker label for error-document rows from the sections-only paths
# (emit_errors=True): at corpus scale "the sections output is silently
# smaller than the corpus" is an operational trap — the marker row
# keeps per-document accounting possible on the minimal-bytes path.
ERROR_SECTION_LABEL = "__error__"


def extract_sections_direct(docs: DataFrame, merge_tables: bool = True,
                            review_mode: Optional[bool] = None,
                            emit_errors: bool = False) -> DataFrame:
    """``(conv_id, payload)`` → long-form sections rows directly.

    Row-equivalent to ``sections_long(parse_documents(docs))`` but the
    explode happens inside the UDF, so only flat string rows cross the
    Arrow boundary — no nested record structs. Use when downstream
    needs only sections (the common 100 TB case); the full record
    stage remains the source of figures/tables/references/meta.

    ``emit_errors=True`` emits one ``section_label='__error__'`` row
    per failed document (clean_text = the error message,
    is_canonical = false) so corpus-size accounting survives this
    path; the default False keeps exact row parity with
    ``sections_long(parse_documents(...))``, which drops error docs.
    """

    def run(batches) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        pa_schema = _sections_pa_schema()
        for batch in batches:
            conv_ids, labels, texts, canon = [], [], [], []
            for conv_id, payload in zip(batch.column(0).to_pandas().tolist(),
                                        batch.column(1).to_pandas().tolist()):
                try:
                    rec = parse_tei(payload, source_path=conv_id)
                    if merge_tables:
                        merge_table_entries(rec)
                    if review_mode is True or (review_mode is None
                                               and should_apply(rec)):
                        apply_review(rec)
                except Exception as e:  # noqa: BLE001 — error-row model
                    if emit_errors:
                        conv_ids.append(conv_id)
                        labels.append(ERROR_SECTION_LABEL)
                        texts.append(f"{type(e).__name__}: {e}")
                        canon.append(False)
                    continue
                for k, v in rec["sections"].items():
                    conv_ids.append(conv_id)
                    labels.append(k)
                    texts.append(v)
                    canon.append(True)
                for k, v in rec["other_sections"].items():
                    conv_ids.append(conv_id)
                    labels.append(k)
                    texts.append(v)
                    canon.append(False)
            yield pa.RecordBatch.from_arrays([
                pa.array(conv_ids, pa.string()),
                pa.array(labels, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(canon, pa.bool_()),
            ], schema=pa_schema)

    return docs.select("conv_id", "payload").mapInArrow(
        run, schema=SECTIONS_SCHEMA)


def extract_sections_fused(turns: DataFrame, merge_tables: bool = True,
                           review_mode: Optional[bool] = None,
                           conv_aligned: bool = False,
                           partitions: Optional[int] = None,
                           max_turns_per_conv: Optional[int] = None,
                           emit_errors: bool = False) -> DataFrame:
    """Sections-only fused variant: assembly + parse + explode all
    inside ONE ``mapInPandas`` over (optionally repartitioned) raw
    turns — the minimal-bytes path when downstream needs only sections
    (the common 100 TB case): only flat section strings ever cross the
    Arrow boundary, no nested meta/media/reference structs.
    Row-identical to ``sections_long(parse_turns_fused(...))``
    (error conversations yield no section rows either way, unless
    ``emit_errors=True`` adds a ``'__error__'`` marker row per failed
    document for corpus-size accounting).

    ``max_turns_per_conv`` is the same worker-memory guardrail as
    ``parse_turns_fused``: a conversation exceeding it stops buffering
    immediately (fragments are dropped as they stream in, so a 1 GB
    adversarial conversation never accumulates in ``frags``) and
    yields no section rows — or the error marker with
    ``emit_errors=True`` — never a task OOM.

    ``conv_aligned=True`` has the same layout contract as
    ``parse_turns_fused`` — see its docstring for the file-split
    caveat (bucket files must not be split across tasks)."""
    t = turns.select("conv_id", "turn_idx", "text")
    if not conv_aligned:
        t = t.repartition(_fused_partitions(t, partitions), "conv_id")
    t = t.sortWithinPartitions("conv_id", "turn_idx", "text")

    def run(batches) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        from paperslicer_spark.sources.transcripts import assemble_payload

        out = {"conv_id": [], "section_label": [], "clean_text": [],
               "is_canonical": []}
        state = {"conv": _UNSET, "frags": [], "over": False}

        def emit(label, text, canon):
            out["conv_id"].append(state["conv"])
            out["section_label"].append(label)
            out["clean_text"].append(text)
            out["is_canonical"].append(canon)

        def close_conv():
            if state["over"]:
                if emit_errors:
                    emit(ERROR_SECTION_LABEL,
                         f"oversized: > {max_turns_per_conv} turns", False)
                return
            row = _build_row(state["conv"], assemble_payload(state["frags"]),
                             merge_tables, review_mode)
            if row["status"] == "error":
                if emit_errors:
                    emit(ERROR_SECTION_LABEL, row["error"], False)
                return
            for k, v in row["sections"].items():
                emit(k, v, True)
            for os_ in row["other_sections"]:
                emit(os_["head"], os_["text"], False)

        pa_schema = _sections_pa_schema()

        def flush():
            rb = pa.RecordBatch.from_arrays([
                pa.array(out["conv_id"], pa.string()),
                pa.array(out["section_label"], pa.string()),
                pa.array(out["clean_text"], pa.string()),
                pa.array(out["is_canonical"], pa.bool_()),
            ], schema=pa_schema)
            for k in out:
                out[k] = []
            return rb

        for batch in batches:
            for conv_id, text in zip(batch.column(0).to_pandas().tolist(),
                                     batch.column(2).to_pandas().tolist()):
                if conv_id != state["conv"]:
                    if state["conv"] is not _UNSET:
                        close_conv()
                    state["conv"], state["frags"] = conv_id, []
                    state["over"] = False
                if state["over"]:
                    continue  # oversized: drop fragments, never buffer
                if text:
                    state["frags"].append(text)
                    if (max_turns_per_conv
                            and len(state["frags"]) > max_turns_per_conv):
                        state["over"], state["frags"] = True, []
            if len(out["conv_id"]) >= 4096:
                yield flush()
        if state["conv"] is not _UNSET:
            close_conv()
        if out["conv_id"]:
            yield flush()

    return t.mapInArrow(run, schema=SECTIONS_SCHEMA)


def sections_long(records: DataFrame) -> DataFrame:
    """Exploded long-form sections table — the north_star's
    ``(conv_id, section_label, is_canonical, clean_text)`` view.

    Single-pass: canonical map entries and other_sections structs are
    concatenated into one array before ONE explode, so the upstream
    parse UDF runs exactly once (a union of two selects would
    re-execute the whole parse stage per branch).
    """
    entry = lambda label, text, canon: F.struct(  # noqa: E731
        label.alias("section_label"), text.alias("clean_text"),
        canon.alias("is_canonical"))
    arr = F.concat(
        F.transform(
            F.map_entries("sections"),
            lambda e: entry(e.getField("key"), e.getField("value"), F.lit(True)),
        ),
        F.transform(
            F.col("other_sections"),
            lambda o: entry(o.getField("head"), o.getField("text"), F.lit(False)),
        ),
    )
    return records.select("conv_id", F.explode(arr).alias("s")).select(
        "conv_id", "s.section_label", "s.clean_text", "s.is_canonical")


def media_long(records: DataFrame) -> DataFrame:
    """Figures+tables exploded with kind + per-document position —
    single explode, same one-parse-pass rationale as sections_long."""
    def tagged(col: str, kind: str):
        return F.transform(
            F.col(col),
            lambda m, i: F.struct(
                F.lit(kind).alias("kind"), i.alias("pos"),
                m.getField("label").alias("label"),
                m.getField("caption").alias("caption"),
                m.getField("path").alias("path"),
                m.getField("source").alias("source"),
                m.getField("coords").alias("coords"),
            ),
        )
    arr = F.concat(tagged("figures", "figure"), tagged("tables", "table"))
    return records.select("conv_id", F.explode(arr).alias("m")).select(
        "conv_id", "m.kind", "m.pos", "m.label", "m.caption", "m.path",
        "m.source", "m.coords")


def references_long(records: DataFrame) -> DataFrame:
    return records.select(
        "conv_id", F.explode("references").alias("r")
    ).select(
        "conv_id",
        F.col("r.index").alias("ref_index"),
        F.col("r.text").alias("text"),
        F.col("r.id").alias("ref_id"),
        F.col("r.title").alias("title"),
        F.col("r.doi").alias("doi"),
        F.col("r.year").alias("year"),
        F.col("r.authors").alias("authors"),
    )
