"""Content-defined chunking: cross-check the Spark pipeline against an
independent Python reference (the oracle can't catch a bug both SQL
engines share), and pin the re-synchronization property that is the
whole point of CDC — a prefix edit shifts every fixed-size chunk but
only O(1) content-defined chunks."""

import hashlib

import pyspark.sql.types as T

from flink_connector_http_spark.operators.dedup import (
    CDC_DIVISOR,
    CDC_WINDOW,
    dedup_cdc_chunks,
)

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def _text(seed: str, n: int) -> str:
    """Deterministic pseudo-random ASCII text (hash chain)."""
    out = []
    h = seed
    while len(out) < n:
        h = hashlib.md5(h.encode()).hexdigest()
        out.extend(h)
    return "".join(out[:n])


def cdc_chunks_ref(text: str, w: int = CDC_WINDOW, d: int = CDC_DIVISOR):
    """Independent reference: boundary after 1-based position i whenever
    md5(text[i-w:i]) (first 8 hex digits as int) ≡ 0 mod d."""
    cuts = sorted({
        i
        for i in range(w, len(text) + 1)
        if int(hashlib.md5(text[i - w:i].encode()).hexdigest()[:8], 16) % d
        == 0
    } | ({len(text)} if text else set()))
    chunks, prev = [], 0
    for i in cuts:
        chunks.append(text[prev:i])
        prev = i
    return chunks


def _ref_stats(docs):
    """Per-source accounting the operator reports, from the reference."""
    by_src = {}
    for _doc_id, text, _lang, source, _n in docs:
        acc = by_src.setdefault(source, {})
        for c in cdc_chunks_ref(text):
            h = hashlib.md5(c.encode()).hexdigest()
            n, ln = acc.get(h, (0, len(c)))
            acc[h] = (n + 1, ln)
    out = {}
    for source, acc in by_src.items():
        n_chunks = sum(n for n, _ in acc.values())
        total = sum(n * ln for n, ln in acc.values())
        saved = sum((n - 1) * ln for n, ln in acc.values())
        out[source] = (n_chunks, len(acc), total, saved)
    return out


def test_matches_python_reference(spark, tmp_path):
    docs = [
        (1, _text("a", 400), "en", "web", 400),
        (2, _text("b", 250), "en", "web", 250),
        (3, _text("a", 400), "en", "web", 400),   # exact dup of doc 1
        (4, _text("c", 10), "en", "books", 10),   # shorter than the window
        (5, "", "en", "books", 0),                # empty doc: no chunks
        (6, _text("d", 300), "en", "books", 300),
    ]
    spark.createDataFrame(docs, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.source: (r.n_chunks, r.n_distinct_chunks, r.total_chars,
                   r.dup_chars_saved)
        for r in dedup_cdc_chunks(spark, str(tmp_path)).collect()
    }
    assert got == _ref_stats(docs)


def test_prefix_edit_resynchronizes(spark, tmp_path):
    """Insert one char at the front of a doc: fixed-size chunks all
    shift (zero dedup between the two versions), CDC boundaries
    re-synchronize after ~one chunk, so nearly all chars dedup away."""
    base = _text("sync", 600)
    docs = [
        (1, base, "en", "cdc", 600),
        (2, "X" + base, "en", "cdc", 601),
    ]
    spark.createDataFrame(docs, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    row = dedup_cdc_chunks(spark, str(tmp_path)).collect()[0]
    # the reference agrees (determinism), and the shared suffix dedups:
    # everything past the first re-synchronized boundary is saved
    assert (row.n_chunks, row.n_distinct_chunks, row.total_chars,
            row.dup_chars_saved) == _ref_stats(docs)["cdc"]
    assert row.dup_chars_saved >= 400  # most of the 600 shared chars
    # sanity: the two docs really do share re-synchronized chunks
    c1, c2 = cdc_chunks_ref(base), cdc_chunks_ref("X" + base)
    assert set(c1) & set(c2)


def test_short_doc_spurious_window_regression(spark, tmp_path):
    """Regression (round-10 advice): Spark's sequence(16, n) yields a
    DESCENDING array [16..n] when n < CDC_WINDOW, enumerating bogus
    window positions whose substr() windows (non-positive start =
    whole/suffix text) can hash ≡ 0 mod CDC_DIVISOR and emit a
    spurious chunk cut the reference never produces. '3688789958'
    (10 chars) is such a trigger: md5 of the whole text ≡ 0 mod 32,
    so the unguarded plan splits this doc while the reference keeps
    it as one chunk."""
    trigger = "3688789958"
    assert len(trigger) < CDC_WINDOW
    assert (
        int(hashlib.md5(trigger.encode()).hexdigest()[:8], 16)
        % CDC_DIVISOR == 0
    )
    docs = [
        (1, trigger, "en", "short", len(trigger)),
        (2, _text("pad", 200), "en", "short", 200),
    ]
    spark.createDataFrame(docs, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.source: (r.n_chunks, r.n_distinct_chunks, r.total_chars,
                   r.dup_chars_saved)
        for r in dedup_cdc_chunks(spark, str(tmp_path)).collect()
    }
    assert got == _ref_stats(docs)
    # the short doc contributes exactly ONE chunk (the whole text)
    ref_chunks = cdc_chunks_ref(trigger)
    assert ref_chunks == [trigger]
