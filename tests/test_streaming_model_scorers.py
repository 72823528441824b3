"""Round-15 streaming model scorers: NB quality scoring and kNN labeling
under Structured Streaming — frozen-model broadcast, multi-batch arrival,
union-equals-batch."""

import glob

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_stream_nb_score_matches_batch_multi_batch(spark, tmp_path):
    from flink_connector_http_spark.operators.pipeline import (
        stream_nb_quality_score,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "nb_score")
    out = stream_nb_quality_score(spark, SF_DIR, artifact_base_dir=base)
    batch = REGISTRY["text_nb_quality_classifier"].fn(spark, SF_DIR)
    assert _canon(out) == _canon(batch)
    # the input genuinely arrived over multiple micro-batches: one
    # append per input file -> more pred part files than input files
    assert len(glob.glob(f"{base}/preds/*.parquet")) > len(
        glob.glob(f"{base}/in/*.parquet")
    )


def test_stream_knn_classify_matches_batch_multi_batch(spark, tmp_path):
    from flink_connector_http_spark.operators.similarity import (
        stream_knn_classify,
    )
    from flink_connector_http_spark.plans import REGISTRY

    base = str(tmp_path / "knn_classify")
    out = stream_knn_classify(spark, SF_DIR, artifact_base_dir=base)
    batch = REGISTRY["sim_knn_classifier"].fn(spark, SF_DIR)
    assert _canon(out) == _canon(batch)
    assert len(glob.glob(f"{base}/preds/*.parquet")) > len(
        glob.glob(f"{base}/in/*.parquet")
    )
