"""Incremental BM25 index maintenance (round 11): postings append
byte-stability and the mergeable-stats law — the index-state contract
the registered query's oracle proves for stats (Spark adds existing+batch,
the oracle recomputes the full corpus) but cannot see on disk."""

import pathlib

import pyspark.sql.functions as F

from flink_connector_http_spark.operators.dedup import INCR_SPLIT
from flink_connector_http_spark.operators.pipeline import _bm25_postings
from flink_connector_http_spark.plans.registry import load

SF_DIR = "/root/testdata/sf0.001"

COLS = ["doc_id", "term", "tf"]


def _canon(df):
    return sorted(map(tuple, df.select(*COLS).collect()))


def test_batch_postings_independent_of_corpus(spark):
    """tf is a pure per-document function: a batch's postings computed
    alone equal the full rebuild restricted to batch docs."""
    docs = load(spark, SF_DIR, "documents")["documents"]
    batch = docs.filter(F.col("doc_id") >= INCR_SPLIT)
    alone = _bm25_postings(batch)
    rebuilt = _bm25_postings(docs).filter(F.col("doc_id") >= INCR_SPLIT)
    assert _canon(alone) == _canon(rebuilt)


def test_untouched_posting_files_are_byte_stable(spark, tmp_path):
    """Appending a batch's postings leaves every pre-existing posting
    file byte-for-byte unchanged, and the merged directory reads back
    equal to a from-scratch rebuild."""
    docs = load(spark, SF_DIR, "documents")["documents"]
    existing = docs.filter(F.col("doc_id") < INCR_SPLIT)
    batch = docs.filter(F.col("doc_id") >= INCR_SPLIT)
    post_dir = str(tmp_path / "bm25_postings")

    _bm25_postings(existing).select(*COLS).coalesce(2).write.parquet(post_dir)
    before = {
        p.name: p.read_bytes()
        for p in pathlib.Path(post_dir).glob("*.parquet")
    }
    assert before, "existing postings wrote no files"

    _bm25_postings(batch).select(*COLS).coalesce(1).write.mode(
        "append"
    ).parquet(post_dir)
    after = {
        p.name: p.read_bytes()
        for p in pathlib.Path(post_dir).glob("*.parquet")
    }
    for name, content in before.items():
        assert after[name] == content, f"posting file {name} changed"
    assert len(after) > len(before), "append created no new files"

    merged = spark.read.parquet(post_dir)
    assert sorted(map(tuple, merged.collect())) == _canon(
        _bm25_postings(docs)
    )


def test_stats_addition_equals_rebuild(spark):
    """The mergeable-stats law, locally: existing-side + batch-side
    aggregates equal the full-corpus aggregate for N, total length, and
    every per-term df (exact integers — no float accumulation)."""
    from flink_connector_http_spark.operators.pipeline import (
        _bm25_side_stats_exprs,
    )

    docs = load(spark, SF_DIR, "documents")["documents"]
    exprs = _bm25_side_stats_exprs()

    def stats(df):
        row = df.agg(*[F.expr(x).alias(a) for x, a in exprs]).collect()[0]
        return {a: row[a] for _, a in exprs}

    e = stats(docs.filter(F.col("doc_id") < INCR_SPLIT))
    b = stats(docs.filter(F.col("doc_id") >= INCR_SPLIT))
    full = stats(docs)
    for key in full:
        assert e[key] + b[key] == full[key], key


def test_registered_drift_summary_shape(spark):
    from flink_connector_http_spark.operators.pipeline import BM25_TERMS
    from flink_connector_http_spark.plans import REGISTRY

    rows = REGISTRY["search_incremental_bm25"].fn(spark, SF_DIR).collect()
    assert [r.term for r in rows] == sorted(BM25_TERMS)
    for r in rows:
        assert r.df_existing + r.df_batch == r.df_total
        assert abs(r.idf_drift - round(r.idf_after - r.idf_before, 6)) < 1e-9


def test_streaming_ingest_matches_batch_and_runs_multi_batch(spark, tmp_path):
    """The round-11 streaming BM25 ingest: drift table from the
    stream-maintained artifacts equals the batch operator exactly, and
    the stats artifact accumulated >= 2 per-micro-batch rows (the input
    genuinely arrived over multiple micro-batches). The operator is given
    an explicit artifact dir so the assertions inspect THIS run's
    artifacts, not whatever temp dirs other runs leaked."""
    from flink_connector_http_spark.operators.pipeline import (
        stream_incremental_bm25_ingest,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "bm25_ingest")
    out = stream_incremental_bm25_ingest(spark, SF_DIR, artifact_base_dir=base)
    batch_op = REGISTRY["search_incremental_bm25"].fn(spark, SF_DIR)
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(out) == canon(batch_op)

    # >= 2 stats rows in THIS run's batches artifact -> multi-batch ingest
    n_stats = spark.read.parquet(f"{base}/stats/batches").count()
    assert n_stats >= 2, n_stats
