"""Multi-batch semantics of the streaming log-binned quantile sketch:
per-key bin counts accumulate by addition (the sketch's merge law), each
batch emits the touched keys' CURRENT quantile bins, and after any batch
split the latest emission equals the batch sketch over everything seen.
"""

import math

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import (
    logbin_quantile_stream,
)

SCHEMA = T.StructType([
    T.StructField("src", T.StringType()),
    T.StructField("bin", T.IntegerType()),
])


def _batch_quantiles(bins):
    items = sorted(
        (b, bins.count(b)) for b in set(bins)
    )
    tot = len(bins)
    out = []
    for q in (0.50, 0.90, 0.99):
        need = math.ceil(q * tot)
        cum = 0
        pick = items[-1][0]
        for b, c in items:
            cum += c
            if cum >= need:
                pick = b
                break
        out.append(pick)
    return tot, out, len(items)


def test_quantile_sketch_accumulates_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    drop([("a", 10), ("a", 10), ("a", 20), ("b", 5)])
    query = (
        logbin_quantile_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["src"], "bin",
        )
        .writeStream.format("memory")
        .queryName("qsk")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        rows = {r.src: r for r in spark.table("qsk").collect()}
        assert rows["a"].n_docs == 3 and rows["a"].p50_bin == 10
        assert rows["a"].p99_bin == 20 and rows["a"].sketch_bins == 2
        assert rows["b"].n_docs == 1 and rows["b"].p50_bin == 5

        # batch 2: a's distribution shifts upward; b untouched (silent)
        drop([("a", 30)] * 5 + [("a", 20)])
        query.processAllAvailable()
        emitted = [r for r in spark.table("qsk").collect() if r.src == "a"]
        latest = max(emitted, key=lambda r: r.n_docs)
        all_bins = [10, 10, 20] + [30] * 5 + [20]
        tot, (p50, p90, p99), nbins = _batch_quantiles(all_bins)
        assert (latest.n_docs, latest.p50_bin, latest.p90_bin,
                latest.p99_bin, latest.sketch_bins) == (
            tot, p50, p90, p99, nbins)
        # b received no rows in batch 2 → exactly one b emission total
        assert sum(1 for r in spark.table("qsk").collect()
                   if r.src == "b") == 1
    finally:
        query.stop()
