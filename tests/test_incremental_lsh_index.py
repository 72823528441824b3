"""Incremental ANN (LSH band) index maintenance: merge-equals-rebuild
and untouched-row byte-stability — the two properties that make the
index a PERSISTENT daily-maintained artifact rather than a rebuild.
The registered query sim_incremental_lsh_index carries the oracle for
the probe results; these tests pin the index-state contract the oracle
cannot see."""

import pathlib

import pyspark.sql.functions as F

from flink_connector_http_spark.operators.similarity import (
    EMB_INCR_SPLIT,
    _lsh_band_rows,
)
from flink_connector_http_spark.plans.registry import load

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        (r.vec_id, r.band_id, r.band_val)
        for r in df.select("vec_id", "band_id", "band_val").collect()
    )


def test_merge_equals_full_rebuild(spark):
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    full = _lsh_band_rows(emb)
    existing = _lsh_band_rows(emb.filter(F.col("vec_id") < EMB_INCR_SPLIT))
    batch = _lsh_band_rows(emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT))
    merged = existing.unionByName(batch)
    assert _canon(merged) == _canon(full)


def test_untouched_index_files_are_byte_stable(spark, tmp_path):
    """The persistent on-disk contract: appending a batch to the band
    index leaves every pre-existing index FILE byte-for-byte unchanged
    (no rewrite, no reshuffle of old state) and the merged directory
    reads back equal to a from-scratch rebuild."""
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    index_dir = str(tmp_path / "band_index")
    flat = ["vec_id", "band_id", "band_val", "norm"]

    existing = _lsh_band_rows(
        emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    ).select(*flat)
    existing.coalesce(2).write.parquet(index_dir)

    before = {
        p.name: p.read_bytes()
        for p in pathlib.Path(index_dir).glob("*.parquet")
    }
    assert before, "existing index wrote no files"

    batch = _lsh_band_rows(
        emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT)
    ).select(*flat)
    batch.coalesce(1).write.mode("append").parquet(index_dir)

    after = {
        p.name: p.read_bytes()
        for p in pathlib.Path(index_dir).glob("*.parquet")
    }
    for name, content in before.items():
        assert after[name] == content, f"existing index file {name} changed"
    assert len(after) > len(before), "append created no new files"

    merged = spark.read.parquet(index_dir)
    rebuild = _lsh_band_rows(emb).select(*flat)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuild.collect())
    )


def test_probe_work_bounded_by_batch(spark):
    """The probe plan broadcasts the batch side: candidate generation is
    a broadcast-hash join against the index, not a corpus shuffle."""
    from flink_connector_http_spark.plans import REGISTRY

    df = REGISTRY["sim_incremental_lsh_index"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_streaming_ingest_maintains_index_and_runs_multi_batch(spark, tmp_path):
    """The round-11 streaming ingest op: after the stream drains, the
    persistent index directory holds existing + batch band rows (the
    maintenance writes landed), the probe output matches the batch
    operator byte-for-byte, and the input genuinely arrived over
    MULTIPLE micro-batches (maxFilesPerTrigger=1 over a multi-file
    input — not one availableNow gulp). The operator is given an explicit
    artifact dir so assertions inspect THIS run's artifacts (round-12:
    same de-flaking as the BM25 twin)."""
    import glob

    from flink_connector_http_spark.operators.similarity import (
        stream_incremental_lsh_ingest,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "lsh_ingest")
    out = stream_incremental_lsh_ingest(spark, SF_DIR, artifact_base_dir=base)
    batch_op = REGISTRY["sim_incremental_lsh_index"].fn(spark, SF_DIR)
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(out) == canon(batch_op)

    # >= 2 part files in THIS run's probe output -> the foreachBatch ran
    # for >= 2 micro-batches (each append writes its own part files)
    commits = glob.glob(f"{base}/out/*.parquet")
    assert len(commits) >= 2, "expected multiple micro-batch appends"

    # maintenance writes: the index dir = existing + batch bands
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    from flink_connector_http_spark.operators.similarity import (
        _lsh_band_rows,
    )

    full = _lsh_band_rows(emb).select("vec_id", "band_id", "band_val")
    got = spark.read.parquet(f"{base}/index").select(
        "vec_id", "band_id", "band_val"
    )
    assert canon(got) == canon(full)
