"""Round-15 streaming ExactSubstr ingest: the exact-span entry in the
streaming index-maintenance matrix (LSH/BM25/PQ/IVF/minhash + ExactSubstr).
"""

import glob
import hashlib
import pathlib

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_matches_batch_multi_batch_and_byte_stable(spark, tmp_path):
    """The streamed decomposition (per-micro-batch anchor append + probe
    vs the index-as-of-append, close-time final df filter + span merge)
    equals the batch-incremental operator exactly; the input genuinely
    arrived over multiple micro-batches; and appends left the pre-stream
    anchor-index part files byte-identical (the maintenance-write
    contract)."""
    from flink_connector_http_spark.operators.dedup import (
        stream_incremental_exsub_ingest,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "exsub_ingest")
    out = stream_incremental_exsub_ingest(
        spark, SF_DIR, artifact_base_dir=base
    )
    batch_op = REGISTRY["dedup_exact_substring_incremental"].fn(spark, SF_DIR)
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(out) == canon(batch_op)

    # multi-batch: the input dir was split into 4 files, each its own
    # micro-batch append -> more index part files than input files
    idx_files = glob.glob(f"{base}/index/*.parquet")
    assert len(idx_files) > len(glob.glob(f"{base}/in/*.parquet")), idx_files

    # daily work scales with the batch: the probe side of every
    # micro-batch join is that micro-batch's anchors only, so the match
    # artifact holds batch-side pairs, never an old-old pair
    matches = spark.read.parquet(f"{base}/matches")
    from flink_connector_http_spark.operators.dedup import INCR_SPLIT

    assert matches.filter(f"b_id < {INCR_SPLIT}").count() == 0

    # byte-stability under a further append
    def sha_map():
        return {
            p.name: hashlib.sha256(p.read_bytes()).hexdigest()
            for p in pathlib.Path(f"{base}/index").glob("*.parquet")
        }

    before = sha_map()
    from pyspark.sql import functions as F

    from flink_connector_http_spark.operators.dedup import (
        _exsub_firstpos_docs,
    )
    from flink_connector_http_spark.plans.registry import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    _exsub_firstpos_docs(
        docs.filter(F.col("doc_id") >= INCR_SPLIT).limit(5)
    ).write.mode("append").parquet(f"{base}/index")
    after = sha_map()
    assert set(before) < set(after)
    for name, digest in before.items():
        assert after[name] == digest, f"index part file {name} rewritten"
