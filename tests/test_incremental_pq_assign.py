"""Incremental PQ code assignment (round 11): frozen-codebook contract,
merge-equals-rebuild, and untouched-code-row byte-stability — the
index-state properties the registered query's oracle cannot see
(mirrors tests/test_incremental_lsh_index.py for the LSH family)."""

import pathlib

import pyspark.sql.functions as F

from flink_connector_http_spark.operators.similarity import (
    EMB_INCR_SPLIT,
    PQ_K,
    _codes_from_scored,
    _pq_scored_frames,
)
from flink_connector_http_spark.plans.registry import load

SF_DIR = "/root/testdata/sf0.001"

CODE_COLS = ["vec_id", "m", "code", "sq_err"]


def _canon(df):
    return sorted(map(tuple, df.select(*CODE_COLS).collect()))


def test_codebook_is_frozen_wrt_batch(spark):
    """The codebook samples vec_id < PQ_K, which is strictly inside the
    existing corpus (PQ_K < EMB_INCR_SPLIT) — so batch codes computed
    against the existing corpus equal batch codes from a full rebuild:
    batch arrival cannot move the quantizer."""
    assert PQ_K < EMB_INCR_SPLIT
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT)
    incremental = _codes_from_scored(_pq_scored_frames(existing, batch))
    rebuild = _codes_from_scored(_pq_scored_frames(emb, emb)).filter(
        F.col("vec_id") >= EMB_INCR_SPLIT
    )
    assert _canon(incremental) == _canon(rebuild)


def test_merge_equals_full_rebuild(spark):
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT)
    merged = _codes_from_scored(
        _pq_scored_frames(existing, existing)
    ).unionByName(_codes_from_scored(_pq_scored_frames(existing, batch)))
    full = _codes_from_scored(_pq_scored_frames(emb, emb))
    assert _canon(merged) == _canon(full)


def test_untouched_code_files_are_byte_stable(spark, tmp_path):
    """The persistent on-disk contract: appending a batch's codes to the
    code table leaves every pre-existing file byte-for-byte unchanged
    (no rewrite of old codes), and the merged directory reads back equal
    to a from-scratch rebuild."""
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT)
    code_dir = str(tmp_path / "pq_codes")

    _codes_from_scored(_pq_scored_frames(existing, existing)).select(
        *CODE_COLS
    ).coalesce(2).write.parquet(code_dir)
    before = {
        p.name: p.read_bytes()
        for p in pathlib.Path(code_dir).glob("*.parquet")
    }
    assert before, "existing code table wrote no files"

    _codes_from_scored(_pq_scored_frames(existing, batch)).select(
        *CODE_COLS
    ).coalesce(1).write.mode("append").parquet(code_dir)
    after = {
        p.name: p.read_bytes()
        for p in pathlib.Path(code_dir).glob("*.parquet")
    }
    for name, content in before.items():
        assert after[name] == content, f"existing code file {name} changed"
    assert len(after) > len(before), "append created no new files"

    merged = spark.read.parquet(code_dir)
    rebuild = _codes_from_scored(_pq_scored_frames(emb, emb)).select(
        *CODE_COLS
    )
    assert sorted(map(tuple, merged.collect())) == _canon(rebuild)


def test_registered_drift_summary_shape(spark):
    """One row per subspace; drift is exactly mse_batch - mse_existing
    (rounded), and both sides carry the full corpus split counts."""
    from flink_connector_http_spark.plans import REGISTRY

    df = REGISTRY["sim_incremental_pq_assign"].fn(spark, SF_DIR)
    rows = df.collect()
    from flink_connector_http_spark.operators.similarity import PQ_M

    assert [r.m for r in rows] == list(range(PQ_M))
    n_vec = load(spark, SF_DIR, "embeddings")["embeddings"].count()
    for r in rows:
        assert r.n_existing + r.n_batch == n_vec
        assert abs(r.mse_drift - round(r.mse_batch - r.mse_existing, 6)) < 1e-9


def test_streaming_pq_ingest_matches_batch_and_appends_byte_stable(
    spark, tmp_path
):
    """Round-12 streaming PQ ingest (completes the LSH/BM25/PQ matrix):
    the drift table computed from stream-maintained artifacts equals the
    batch operator exactly; the stats artifact accumulated multiple
    per-micro-batch row groups (genuinely multi-batch); the code store
    (existing + streamed batch appends) equals the from-scratch rebuild
    over the whole corpus; and a further append leaves every existing
    part file byte-identical (the maintenance-write contract)."""
    import glob
    import hashlib
    import pathlib

    from flink_connector_http_spark.operators.similarity import (
        PQ_M,
        _codes_from_scored,
        _pq_scored_frames,
        stream_incremental_pq_ingest,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "pq_ingest")
    out = stream_incremental_pq_ingest(spark, SF_DIR, artifact_base_dir=base)
    batch_op = REGISTRY["sim_incremental_pq_assign"].fn(spark, SF_DIR)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, batch_op.collect()))

    # multi-batch ingest: >= 2 micro-batches x PQ_M mergeable stats rows
    n_stats = spark.read.parquet(f"{base}/stats/batches").count()
    assert n_stats >= 2 * PQ_M, n_stats

    # mergeable-stats law at the code level: existing store + streamed
    # appends == full-corpus rebuild (same frozen codebook — its source
    # rows vec_id < PQ_K all sit in the existing split)
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    merged = (
        spark.read.parquet(f"{base}/codes/existing")
        .unionByName(spark.read.parquet(f"{base}/codes/batch"))
        .select(*CODE_COLS)
    )
    rebuild = _codes_from_scored(_pq_scored_frames(emb, emb)).select(
        *CODE_COLS
    )
    assert sorted(map(tuple, merged.collect())) == _canon(rebuild)

    # byte-stability: append one more "day" to the code store and verify
    # no existing part file was rewritten
    def sha_map():
        return {
            p.name: hashlib.sha256(p.read_bytes()).hexdigest()
            for p in pathlib.Path(f"{base}/codes/batch").glob("*.parquet")
        }

    before = sha_map()
    assert len(glob.glob(f"{base}/codes/batch/*.parquet")) >= 2
    extra = emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT).limit(5)
    _codes_from_scored(_pq_scored_frames(
        emb.filter(F.col("vec_id") < EMB_INCR_SPLIT), extra
    )).write.mode("append").parquet(f"{base}/codes/batch")
    after = sha_map()
    assert set(before) < set(after)  # strictly more files
    for name, digest in before.items():
        assert after[name] == digest, f"existing part file {name} rewritten"


def test_streaming_ivf_ingest_matches_batch_and_appends_byte_stable(
    spark, tmp_path
):
    """Round-12 streaming IVF ingest (the fifth index family): the
    cell-occupancy drift from stream-maintained artifacts equals the
    batch operator exactly; the counts artifact accumulated multiple
    per-micro-batch row groups; and a further inverted-list append
    leaves existing part files byte-identical."""
    import glob
    import hashlib
    import pathlib

    from flink_connector_http_spark.operators.similarity import (
        stream_incremental_ivf_ingest,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "ivf_ingest")
    out = stream_incremental_ivf_ingest(spark, SF_DIR, artifact_base_dir=base)
    batch_op = REGISTRY["sim_incremental_ivf_assign"].fn(spark, SF_DIR)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, batch_op.collect()))

    # multi-batch ingest: >= 2 micro-batches wrote count rows
    import pyspark.sql.functions as SF

    stats = spark.read.parquet(f"{base}/stats/batches")
    n_files = len(glob.glob(f"{base}/stats/batches/*.parquet"))
    assert n_files >= 2, n_files
    # additive merge covers the whole arriving batch
    emb = load(spark, SF_DIR, "embeddings")["embeddings"]
    n_batch_vecs = emb.filter(SF.col("vec_id") >= EMB_INCR_SPLIT).count()
    assert stats.agg(SF.sum("n")).collect()[0][0] == n_batch_vecs

    # byte-stability of the inverted-list artifact under a further append
    def sha_map():
        return {
            p.name: hashlib.sha256(p.read_bytes()).hexdigest()
            for p in pathlib.Path(f"{base}/assign").glob("*.parquet")
        }

    before = sha_map()
    spark.read.parquet(f"{base}/assign").limit(3).write.mode(
        "append"
    ).parquet(f"{base}/assign")
    after = sha_map()
    assert set(before) < set(after)
    for name, digest in before.items():
        assert after[name] == digest, f"assign part file {name} rewritten"
