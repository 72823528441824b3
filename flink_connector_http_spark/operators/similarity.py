"""Similarity search over the ``embeddings`` table (``array<float>``):

- brute-force cosine top-k (the exact, oracle-checked baseline), and
- random-hyperplane LSH-bucketed ANN (the 100 TB path: candidates come
  from shared signature bands instead of a full cross join).

The LSH hyperplanes are derived deterministically from md5 so every
executor — and every engine — materializes the same planes without any
broadcast of random state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import load, register
from ..streaming import await_drained
from .dedup import _DOT_AB, _NORM, COS_DUCK, COSINE_THRESHOLD

N_QUERIES = 20  # vec_id < 20 are the query set
TOP_K = 5

N_PLANES = 16
PLANE_BANDS = 4  # 4 bits per band


@register(
    "sim_knn_bruteforce",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
             round({COS_DUCK}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT q_id, neighbor_id, cosine, rk FROM (
      SELECT q_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
    """,
    doc="Exact cosine top-k: broadcast the query set against the corpus, "
        "rank per query. One narrow scan + per-query window.",
    bench=True,
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    # per-side norms once per vector, not per pair (same expression order →
    # bit-identical rounded values, see dedup_embedding_cosine)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "cosine", "rk")
    )


def _signature_expr(emb_col: str) -> str:
    """16-bit random-hyperplane signature. Plane p, dim d weight =
    md5-int32("p:d") scaled to [-1, 1) — deterministic, engine-portable.
    Sign of Σ_d emb[d]·w(p,d) sets bit p."""
    terms = []
    for p in range(N_PLANES):
        w = (
            f"transform(sequence(1, size({emb_col})), d -> "
            f"(CAST(CAST(conv(substr(md5(concat('{p}:', d)), 1, 8), 16, 10) AS BIGINT) AS DOUBLE) "
            f"/ 2147483648.0) - 1.0)"
        )
        dot = (
            f"aggregate(zip_with({emb_col}, {w}, (x, y) -> CAST(x AS DOUBLE) * y), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN shiftleft(1L, {p}) ELSE 0L END")
    return "(" + " + ".join(terms) + ")"


def _signature_duck(emb_col: str) -> str:
    """DuckDB translation of :func:`_signature_expr` — the same md5-derived
    hyperplanes, so both engines compute identical signatures (verified
    bit-for-bit over sf0.01: 500/500 equal). ``(x, i)`` lambda gives the
    1-based element index, mirroring Spark's ``sequence(1, size(...))``."""
    terms = []
    for p in range(N_PLANES):
        w = (
            f"((('0x' || substr(md5(concat('{p}:', i)), 1, 8))::BIGINT "
            f"/ 2147483648.0) - 1.0)"
        )
        dot = (
            f"list_sum(list_transform({emb_col}, (x, i) -> "
            f"CAST(x AS DOUBLE) * {w}))"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


_BITS = N_PLANES // PLANE_BANDS
_ANN_ORACLE = f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
      FROM bands q JOIN bands c
        ON q.band_id = c.band_id AND q.band_val = c.band_val
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.q_id, cand.neighbor_id, round({COS_DUCK}, 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.q_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT q_id, neighbor_id, cosine, rk FROM (
      SELECT q_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
"""


@register(
    "sim_ann_lsh_topk",
    oracle=_ANN_ORACLE,
    doc="ANN: random-hyperplane LSH signatures, 4×4-bit band buckets, "
        "exact cosine re-rank within candidates. The md5-derived planes are "
        "engine-portable, so the DuckDB oracle reproduces the same candidate "
        "sets and the check is a full hash gate despite recall < 1 vs exact.",
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    sig = emb.select(
        "vec_id", "embedding", F.expr(_signature_expr("embedding")).alias("sig")
    )
    bits = N_PLANES // PLANE_BANDS
    bands = sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(f"(sig >> {b * bits}) & {(1 << bits) - 1}").alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "embedding", "bk.band_id", "bk.band_val")
    q = bands.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
        "band_id",
        "band_val",
    )
    c = bands.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
        "band_id",
        "band_val",
    )
    candidates = (
        F.broadcast(q)
        .join(c, ["band_id", "band_val"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "a_emb", "a_norm", "neighbor_id", "b_emb", "b_norm")
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    scored = candidates.select(
        "q_id",
        "neighbor_id",
        F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# embedding near-dup via cosine LSH — the scale path for
# dedup_embedding_cosine (same verify predicate, candidates from band
# buckets instead of the O(n²) cross join)
# ---------------------------------------------------------------------------

_LSH_DEDUP_ORACLE = f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
      WHERE x.vec_id < y.vec_id
    )
    SELECT cand.a_id, cand.b_id, round({COS_DUCK}, 6) AS cosine
    FROM cand
    JOIN embeddings a ON a.vec_id = cand.a_id
    JOIN embeddings b ON b.vec_id = cand.b_id
    WHERE round({COS_DUCK}, 6) >= {COSINE_THRESHOLD}
"""


@register(
    "dedup_embedding_lsh",
    oracle=_LSH_DEDUP_ORACLE,
    doc="Embedding near-dup pairs at scale: random-hyperplane signatures, "
        f"{PLANE_BANDS}×{_BITS}-bit band self-join for candidates, exact "
        f"cosine ≥ {COSINE_THRESHOLD} verify. Replaces the O(n²) cross join "
        "of dedup_embedding_cosine with one shuffle on (band_id, band_val); "
        "candidate volume is bounded by bucket sizes. Recall < 1 vs exact "
        "but fully deterministic (md5-derived planes), so the DuckDB oracle "
        "reproduces identical candidates and the hash gate is exact.",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    sig = emb.select(
        "vec_id",
        "embedding",
        F.expr(_NORM.format(col="embedding")).alias("norm"),
        F.expr(_signature_expr("embedding")).alias("sig"),
    )
    bands = sig.select(
        "vec_id",
        "embedding",
        "norm",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(f"(sig >> {b * _BITS}) & {(1 << _BITS) - 1}").alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "embedding", "norm", "bk.band_id", "bk.band_val")
    a = bands.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
        "band_id",
        "band_val",
    )
    b = bands.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
        "band_id",
        "band_val",
    )
    candidates = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "a_emb", "a_norm", "b_id", "b_emb", "b_norm")
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        candidates.select(
            "a_id",
            "b_id",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# incremental ANN index maintenance — the retrieval twin of
# dedup_incremental_minhash: a daily vector batch merges into the
# persistent band index, and its probe work is bounded by batch size
# ---------------------------------------------------------------------------

EMB_INCR_SPLIT = 400  # vec_id < SPLIT is the indexed corpus, rest the batch

_INCR_LSH_ORACLE = f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
      FROM bands q JOIN bands c
        ON q.band_id = c.band_id AND q.band_val = c.band_val
      WHERE q.vec_id >= {EMB_INCR_SPLIT} AND c.vec_id < {EMB_INCR_SPLIT}
    ),
    scored AS (
      SELECT cand.q_id, cand.neighbor_id, round({COS_DUCK}, 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.q_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT q_id, neighbor_id, cosine, rk FROM (
      SELECT q_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
"""


def _lsh_band_rows(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, norm, band_id, band_val) — the persistent ANN
    index rows for a set of vectors. A pure per-row function of the
    embedding (md5-derived hyperplanes), which is exactly what makes the
    index INCREMENTALLY maintainable: a new batch's rows are computed
    from the batch alone and appended; existing rows never change
    (byte-stability pinned by tests/test_incremental_lsh_index.py)."""
    sig = emb.select(
        "vec_id",
        "embedding",
        F.expr(_NORM.format(col="embedding")).alias("norm"),
        F.expr(_signature_expr("embedding")).alias("sig"),
    )
    return sig.select(
        "vec_id",
        "embedding",
        "norm",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(
                        f"(sig >> {b * _BITS}) & {(1 << _BITS) - 1}"
                    ).alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "embedding", "norm", "bk.band_id", "bk.band_val")


@register(
    "sim_incremental_lsh_index",
    bench=True,  # r10 verdict #5: the incremental-index family needs a
    # 10x point and a second decade on the 100x curve
    oracle=_INCR_LSH_ORACLE,
    doc="Incremental ANN index maintenance (retrieval twin of "
        "dedup_incremental_minhash): the corpus keeps a persistent LSH "
        "band index; a daily vector batch computes band rows from the "
        "BATCH ALONE (the signature is a pure per-row function of the "
        "embedding, so merge-equals-rebuild and untouched index rows are "
        "byte-stable — pinned by tests), appends them, and probes only "
        "batch-vs-existing band collisions for top-k existing neighbors. "
        "Daily work = O(batch × bucket occupancy), never corpus re-pair; "
        "the batch side broadcasts, so the probe is one shuffle-free "
        "broadcast-hash join against the index.",
)
def sim_incremental_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    # the incremental contract by construction: existing index rows are
    # computed WITHOUT the batch, batch rows WITHOUT the corpus
    existing = _lsh_band_rows(emb.filter(F.col("vec_id") < EMB_INCR_SPLIT))
    batch = _lsh_band_rows(emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT))
    # round 16: broadcast the batch side only while it is actually small
    # (guide §3.1 — the hint, not the result, depends on size). On the
    # key-strided scale replicas every replicated vec_id exceeds the
    # split, so at 100x the "daily batch" is 99.8% of the corpus and the
    # unconditional batch-side broadcast built a multi-hundred-MB hash
    # relation in the driver heap — the exact allocation profile of the
    # 100x-leg JVM death. Above the threshold the hint is dropped and
    # the planner broadcasts the smaller side itself (here: the
    # existing index); the output is identical either way.
    p = os.path.join(sf_dir, "embeddings.parquet")
    sz = 0
    if os.path.isdir(p):
        for root, _dirs, files in os.walk(p):
            sz += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    elif os.path.exists(p):
        sz = os.path.getsize(p)
    thr = int(os.environ.get(
        "SPARK_GRAFT_LSH_BCAST_MAX_BYTES", str(8 << 20)))
    return _incr_lsh_probe(batch, existing, broadcast_batch=sz <= thr)


def _incr_lsh_probe(batch_bands: DataFrame,
                    existing_bands: DataFrame,
                    broadcast_batch: bool = True) -> DataFrame:
    """Probe batch band rows against the existing index: band-collision
    candidates via one broadcast-hash join (batch side broadcast — probe
    work bounded by batch size, never corpus size), exact cosine, top-k
    existing neighbors per batch vector. Per-q independent, so
    micro-batch-wise evaluation (the streaming ingest op) unions to the
    identical result. ``broadcast_batch=False`` drops the batch-side
    broadcast hint for callers whose "batch" is not actually small (the
    100x bench replica) and lets the planner pick the build side."""
    q = batch_bands.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
        "band_id",
        "band_val",
    )
    c = existing_bands.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
        "band_id",
        "band_val",
    )
    # score BEFORE deduplicating (round 15): a candidate pair that
    # collides in several bands scores to the same cosine, so computing
    # it pre-dedup is redundant only in map work — while deduplicating
    # first shipped both 64-float embedding arrays through the
    # (q_id, neighbor_id) exchange. Narrow (id, id, cosine) rows shuffle
    # instead (guide §2.3: shuffle keys and results, not payloads) —
    # the same duplicate-evals-for-narrower-shuffle trade emb_knn_graph
    # documents.
    scored = (
        (F.broadcast(q) if broadcast_batch else q)
        .join(c, ["band_id", "band_val"])
        .select(
            "q_id",
            "neighbor_id",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias(
                "cosine"
            ),
        )
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# per-label embedding centroids (the reduce step of IVF / k-means-style
# partitioned ANN: one centroid per coarse partition)
# ---------------------------------------------------------------------------

@register(
    "emb_label_centroids",
    oracle="""
    SELECT label,
           CAST(i - 1 AS INT) AS dim,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY label, dim
    """,
    doc="Element-wise centroid per label over array<float> embeddings "
        "(long format: one row per label x dimension). posexplode keeps "
        "the aggregation a plain partial-aggregated groupBy — no array "
        "UDAF, no collect; 6dp rounding for cross-engine float stability.",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"))
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantizer (per-label centroids) + n_probe cells
# ---------------------------------------------------------------------------

N_PROBE = 2

_DIMS_DUCK = (
    "SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x "
    "FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)"
)

_IVF_ORACLE = f"""
    WITH cent AS (
      SELECT label, i - 1 AS dim,
             round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY label, dim
    ),
    cent_norm AS (
      SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label
    ),
    vec_dim AS ({_DIMS_DUCK}),
    vec_norm AS (
      SELECT vec_id, sqrt(sum(x * x)) AS vn FROM vec_dim GROUP BY vec_id
    ),
    scores AS (
      SELECT v.vec_id, c.label,
             round(sum(v.x * c.c) / (vn.vn * cn.cn), 6) AS cellcos
      FROM vec_dim v JOIN cent c USING (dim)
      JOIN vec_norm vn ON vn.vec_id = v.vec_id
      JOIN cent_norm cn ON cn.label = c.label
      GROUP BY v.vec_id, c.label, vn.vn, cn.cn
    ),
    assign AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cellcos DESC, label) AS crk
      FROM scores
    ),
    cells AS (SELECT vec_id, label FROM assign WHERE crk = 1),
    qcells AS (
      SELECT vec_id, label FROM assign
      WHERE vec_id < {N_QUERIES} AND crk <= {N_PROBE}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
      FROM qcells q JOIN cells c USING (label)
      WHERE c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.q_id, cand.neighbor_id, round({COS_DUCK}, 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.q_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT q_id, neighbor_id, cosine, rk FROM (
      SELECT q_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
"""

_DOT_VC = (
    "aggregate(zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) * y), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


@register(
    "sim_ann_ivf_topk",
    oracle=_IVF_ORACLE,
    doc="IVF-style ANN: per-label centroids act as the coarse quantizer "
        "(one-pass build standing in for k-means iterations), every vector "
        "is geometrically assigned to its nearest cell, queries probe the "
        f"{N_PROBE} nearest cells, exact cosine re-rank inside. At scale "
        "the inverted lists shard by cell id — the probe-side join touches "
        "n_probe/n_cells of the corpus instead of all of it. Deterministic "
        "(6dp-rounded scores, label tie-break) → full hash-checked oracle.",
)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
        .groupBy("label")
        .agg(F.expr(
            "transform(sort_array(collect_list(struct(dim, c))), s -> s.c)"
        ).alias("centroid"))
        .select("label", "centroid",
                F.expr(_NORM.format(col="centroid")).alias("c_norm"))
    )
    vecs = emb.select(
        "vec_id", "embedding",
        F.expr(_NORM.format(col="embedding")).alias("v_norm"),
    )
    scores = (
        vecs.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "embedding", "v_norm", "label",
            F.expr(f"round({_DOT_VC} / (v_norm * c_norm), 6)").alias("cellcos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cellcos"), F.asc("label"))
    ranked = scores.withColumn("crk", F.row_number().over(w))
    cells = ranked.filter(F.col("crk") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b_emb"),
        F.col("v_norm").alias("b_norm"),
        "label",
    )
    qcells = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crk") <= N_PROBE)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("a_emb"),
        F.col("v_norm").alias("a_norm"),
        "label",
    )
    candidates = (
        F.broadcast(qcells)
        .join(cells, "label")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "a_emb", "a_norm", "neighbor_id", "b_emb", "b_norm")
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    scored = candidates.select(
        "q_id",
        "neighbor_id",
        F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# pipeline composition: quality-gated corpus → per-label embedding stats
# ---------------------------------------------------------------------------

from .text import duck_token_exprs, spark_token_exprs  # noqa: E402

_QD = duck_token_exprs()
_QS = spark_token_exprs()


@register(
    "emb_quality_gated_stats",
    # norms are rounded to 6dp then summed as DECIMAL so the aggregate is
    # independent of float summation order (engine- and partition-stable)
    oracle=f"""
    SELECT e.label,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(round(
                 sqrt(list_dot_product(e.embedding::DOUBLE[],
                                       e.embedding::DOUBLE[])), 6)
               AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    WHERE {_QD['n_tokens']} BETWEEN 20 AND 2000
      AND CAST({_QD['n_uniq_tokens']} AS DOUBLE) / {_QD['n_tokens']} >= 0.15
      AND CAST({_QD['sum_token_len']} AS DOUBLE) / {_QD['n_tokens']}
          BETWEEN 2.0 AND 12.0
    GROUP BY e.label
    """,
    doc="Stage composition: the text quality gate (same predicate as "
        "text_quality_filter) restricts which embeddings enter per-label "
        "statistics — the filter→embed→aggregate chain every curation "
        "pipeline runs. The gate is evaluated on the documents side "
        "BEFORE the join, so at scale the join probe is the surviving "
        "subset only.",
)
def emb_quality_gated_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "embeddings", "documents")
    gated = t["documents"].filter(
        F.expr(
            f"{_QS['n_tokens']} BETWEEN 20 AND 2000"
            f" AND CAST({_QS['n_uniq_tokens']} AS DOUBLE) / {_QS['n_tokens']} >= 0.15"
            f" AND CAST({_QS['sum_token_len']} AS DOUBLE) / {_QS['n_tokens']}"
            f" BETWEEN 2.0 AND 12.0"
        )
    ).select("doc_id")
    return (
        t["embeddings"]
        .join(gated, F.col("vec_id") == F.col("doc_id"))
        .select(
            "label",
            F.expr(
                f"CAST(round({_NORM.format(col='embedding')}, 6) "
                f"AS DECIMAL(18,6))"
            ).alias("norm_d"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(SUM(norm_d) AS DOUBLE) / COUNT(*)").alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization (the ANN memory-compression step)
# ---------------------------------------------------------------------------

@register(
    "emb_quantize_int8",
    # Determinism: per-element double ops only (no cross-element float
    # accumulation — amax and max_abs_err use MAX, which is
    # order-independent, unlike a sum fold whose rounding would depend on
    # execution order). round-half-up via floor(x+0.5) because Spark's
    # round() (HALF_UP) and DuckDB's round() disagree on .5 ties.
    oracle="""
    SELECT vec_id, label,
           round(scale, 6) AS scale,
           array_to_string(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT)),
             ',') AS qvec,
           CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
                ELSE round(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)
                           - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale))), 6)
           END AS max_abs_err
    FROM (
      SELECT vec_id, label, embedding,
             CASE WHEN amax = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(127 AS DOUBLE) / amax END AS scale
      FROM (
        SELECT vec_id, label, embedding,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS amax
        FROM embeddings
      ) t1
    ) t2
    """,
    doc="Symmetric per-vector int8 quantization (scale = 127/max|v|): the "
        "4× memory-compression step an ANN index runs before storing "
        "vectors at 100 TB. Pure per-row array expressions — zero shuffle, "
        "whole-stage codegen — plus a max-abs reconstruction-error column "
        "so a pipeline can gate on quantization loss.",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return (
        emb.withColumn(
            "amax",
            F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"),
        )
        .withColumn(
            "scale_raw",
            F.expr(
                "CASE WHEN amax = 0 THEN CAST(0 AS DOUBLE) "
                "ELSE CAST(127 AS DOUBLE) / amax END"
            ),
        )
        .select(
            "vec_id", "label",
            F.expr("round(scale_raw, 6)").alias("scale"),
            # comma-joined STRING scalar, not ARRAY<INT>: the driver's
            # oracle gate cannot hash list cells (pandas sort over raw cols)
            F.expr(
                "array_join(transform(embedding, "
                "x -> CAST(CAST(floor(CAST(x AS DOUBLE) * scale_raw + 0.5) "
                "AS INT) AS STRING)), ',')"
            ).alias("qvec"),
            F.expr(
                "CASE WHEN scale_raw = 0 THEN CAST(0 AS DOUBLE) "
                "ELSE round(array_max(transform(embedding, "
                "x -> abs(CAST(x AS DOUBLE) "
                "- floor(CAST(x AS DOUBLE) * scale_raw + 0.5) / scale_raw))), 6) "
                "END"
            ).alias("max_abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# quantized kNN (integer dot products over the int8 vectors)
# ---------------------------------------------------------------------------

QKNN_QUERIES = 10
QKNN_TOP_K = 5

#: int8 quantization of a float embedding — shared text between the
#: quantizer above and the quantized-kNN below (scale inlined per side)
_Q_SPARK = (
    "transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN array_max(transform({col}, y -> abs(CAST(y AS DOUBLE)))) = 0 "
    "THEN CAST(0 AS DOUBLE) ELSE CAST(127 AS DOUBLE) / "
    "array_max(transform({col}, y -> abs(CAST(y AS DOUBLE)))) END) + 0.5) AS BIGINT))"
)
_Q_DUCK = (
    "list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN list_max(list_transform({col}, y -> abs(CAST(y AS DOUBLE)))) = 0 "
    "THEN CAST(0 AS DOUBLE) ELSE CAST(127 AS DOUBLE) / "
    "list_max(list_transform({col}, y -> abs(CAST(y AS DOUBLE)))) END) + 0.5) AS BIGINT))"
)


@register(
    "sim_knn_quantized",
    # Integer dot products are EXACT (each term ≤ 127² and 64 terms keep
    # the sum far below 2^63), so unlike the float cosine queries no
    # rounding discipline is needed — the score itself is hash-stable.
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, {_Q_DUCK.format(col="embedding")} AS qv
      FROM embeddings WHERE vec_id < {QKNN_QUERIES}
    ),
    c AS (
      SELECT vec_id AS neighbor_id, {_Q_DUCK.format(col="embedding")} AS cv
      FROM embeddings
    ),
    scored AS (
      SELECT q_id, neighbor_id,
             CAST(list_sum(list_transform(range(1, 65),
               i -> qv[i] * cv[i])) AS BIGINT) AS dot_q
      FROM q JOIN c ON neighbor_id <> q_id
    )
    SELECT q_id, neighbor_id, dot_q, rk FROM (
      SELECT q_id, neighbor_id, dot_q,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY dot_q DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {QKNN_TOP_K}
    """,
    doc="Top-k neighbor search over int8-quantized vectors: the memory-"
        "bandwidth-bound scoring loop of a production ANN system (4× less "
        "data per vector than float32, integer SIMD-friendly arithmetic, "
        "exact integer scores). Broadcast query set, zero shuffle on the "
        "corpus scan, per-query top-k window.",
)
def sim_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") < QKNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.expr(_Q_SPARK.format(col="embedding")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.expr(_Q_SPARK.format(col="embedding")).alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id", "neighbor_id",
            F.expr(
                "CAST(aggregate(zip_with(qv, cv, (x, y) -> x * y), "
                "CAST(0 AS BIGINT), (a, v) -> a + v) AS BIGINT)"
            ).alias("dot_q"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QKNN_TOP_K)
        .select("q_id", "neighbor_id", "dot_q", "rk")
    )


# ---------------------------------------------------------------------------
# approximate kNN graph (per-node top-k neighbor edges from LSH candidates)
# ---------------------------------------------------------------------------

GRAPH_K = 3

#: sorted-neighborhood window inside one LSH bucket: a member generates
#: candidate pairs only with the W bucket members preceding it in a
#: deterministic (md5) ordering — one sliding ROWS frame, so each
#: unordered pair is emitted exactly once (at the later member) and total
#: pair volume is Θ(n·W). A 16-plane/4-band signature has a FIXED
#: 64-bucket key space, so uncapped within-bucket pairing is Θ(n²) by
#: construction (measured: 86× time for 10× data in the r3→r4 scale
#: curve). r4 bounded it with rank-chunk zoning (same Θ(n·W) volume) but
#: that shape needs a rank window PLUS a three-key self-join; the sliding
#: frame is ONE window pass (collect_list over W PRECEDING..1 PRECEDING)
#: with no self-join at all. W=32 × 4 bands gives every node up to ~128
#: distinct candidates for a top-3 graph — halving W from 64 halved the
#: dominant exact-cosine cost with no downstream-oracle change.
GRAPH_CAND_WINDOW = 32

_KNN_GRAPH_ORACLE = f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    preds AS (
      SELECT vec_id,
             list(vec_id) OVER (
                 PARTITION BY band_id, band_val
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                 ROWS BETWEEN {GRAPH_CAND_WINDOW} PRECEDING AND 1 PRECEDING
             ) AS ps
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT least(vec_id, p) AS a_id, greatest(vec_id, p) AS b_id
      FROM (SELECT vec_id, unnest(ps) AS p FROM preds) t
    ),
    scored AS (
      SELECT cand.a_id, cand.b_id, round({COS_DUCK}, 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.a_id
      JOIN embeddings b ON b.vec_id = cand.b_id
    ),
    edges AS (
      SELECT a_id AS src_id, b_id AS dst_id, cosine FROM scored
      UNION ALL
      SELECT b_id, a_id, cosine FROM scored
    )
    SELECT src_id, dst_id, cosine, rk FROM (
      SELECT src_id, dst_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY src_id
                                ORDER BY cosine DESC, dst_id) AS rk
      FROM edges
    ) t WHERE rk <= {GRAPH_K}
"""


@register(
    "emb_knn_graph",
    oracle=_KNN_GRAPH_ORACLE,
    doc=f"Approximate kNN graph: every node's top-{GRAPH_K} neighbors among "
        "its LSH band candidates — the neighbor-graph build behind "
        "graph-based semantic dedup clustering and kNN-classifier data "
        "curation. Undirected candidate pairs (a<b) are scored ONCE, then "
        "mirrored into both edge directions before the per-source top-k "
        "window, halving the exact-cosine work. No cross join at any "
        "point: candidates come from the one shuffle on (band_id, "
        "band_val), and the window shuffles on src_id — both key-balanced "
        "at 100 TB. Deterministic md5 planes -> exact DuckDB oracle.",
    bench=True,
)
def emb_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    # candidate generation is SKINNY (ids + band keys only): the 64-float
    # embedding arrays would otherwise ride through the band explode, the
    # rank-window shuffle, the zones union, AND both sides of the
    # candidate self-join — r4 shipped exactly that and paid +30% at
    # sf0.1. Arrays now appear only in the two scoring joins at the end.
    sig = emb.select(
        "vec_id",
        F.expr(_signature_expr("embedding")).alias("sig"),
    )
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(f"(sig >> {b * _BITS}) & {(1 << _BITS) - 1}").alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "bk.band_id", "bk.band_val")
    # sorted-neighborhood sliding window inside each (band_id, band_val)
    # bucket: the fixed 64-bucket key space of a 16-plane/4-band signature
    # makes exhaustive within-bucket pairing Θ(n²); pairing each member
    # with its ≤W rank-predecessors bounds candidates at Θ(n·W) in ONE
    # window pass — no rank self-join, no subtree recomputation (see
    # GRAPH_CAND_WINDOW). Each unordered pair is emitted exactly once per
    # band; the dropDuplicates below only merges cross-band repeats.
    wb = (
        Window.partitionBy("band_id", "band_val")
        .orderBy(F.expr("md5(CAST(vec_id AS STRING))"), F.asc("vec_id"))
        .rowsBetween(-GRAPH_CAND_WINDOW, -1)
    )
    preds = bands.select(
        "vec_id", F.collect_list("vec_id").over(wb).alias("ps")
    )
    # cross-band duplicate pairs survive here on purpose: deduping now
    # would cost a dedicated (a_id, b_id) exchange; instead duplicates are
    # collapsed after mirroring, inside the ONE src_id exchange both final
    # windows share (the ~10-30% duplicate cosine evals are cheaper than a
    # whole shuffle stage)
    cand = preds.select("vec_id", F.explode("ps").alias("p")).select(
        F.least("vec_id", "p").alias("a_id"),
        F.greatest("vec_id", "p").alias("b_id"),
    )
    # score once per undirected pair: two id-keyed joins against the
    # vectors (AQE broadcasts the small side at test SFs; at corpus scale
    # these are plain key-balanced shuffle joins on vec_id)
    vecs = emb.select(
        "vec_id",
        "embedding",
        F.expr(_NORM.format(col="embedding")).alias("norm"),
    )
    scored = (
        cand.join(
            vecs.select(
                F.col("vec_id").alias("a_id"),
                F.col("embedding").alias("a_emb"),
                F.col("norm").alias("a_norm"),
            ),
            "a_id",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("b_id"),
                F.col("embedding").alias("b_emb"),
                F.col("norm").alias("b_norm"),
            ),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
        )
    )
    # mirror via explode for the same single-evaluation reason as `zones`
    edges = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a_id").alias("src_id"),
                    F.col("b_id").alias("dst_id"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("b_id").alias("src_id"),
                    F.col("a_id").alias("dst_id"),
                    F.col("cosine"),
                ),
            )
        ).alias("e")
    ).select("e.src_id", "e.dst_id", "e.cosine")
    # ONE exchange serves both windows below: hash(src_id) satisfies the
    # dedup window's (src_id, dst_id) clustering by the subset rule, so
    # the planner inserts no second shuffle
    edges = edges.repartition("src_id")
    w_dup = Window.partitionBy("src_id", "dst_id").orderBy("dst_id")
    edges = (
        edges.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("dst_id"))
    return (
        edges.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GRAPH_K)
        .select("src_id", "dst_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# per-dimension corpus statistics (exact, via the int8 quantization path)
# ---------------------------------------------------------------------------

#: shared with emb_quantize_int8: symmetric per-vector int8 quantization.
#: Corpus-level float sums are order-dependent (never hash-stable), so the
#: dimension stats run over the EXACT integer codes instead — the same
#: numbers an ANN index would profile before choosing per-dim cutoffs.
_QVEC_SPARK = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN array_max(transform(embedding, v -> abs(CAST(v AS DOUBLE)))) = 0 "
    "THEN CAST(0 AS DOUBLE) ELSE CAST(127 AS DOUBLE) / "
    "array_max(transform(embedding, v -> abs(CAST(v AS DOUBLE)))) END) "
    "+ 0.5) AS INT))"
)
_QVEC_DUCK = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) = 0 "
    "THEN CAST(0 AS DOUBLE) ELSE CAST(127 AS DOUBLE) / "
    "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) END) "
    "+ 0.5) AS INT))"
)


@register(
    "emb_dim_stats",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QVEC_DUCK} AS qvec FROM embeddings
    ),
    pos AS (
      SELECT vec_id, qvec,
             unnest(range(1, len(qvec) + 1)) AS dim
      FROM q
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(qvec[dim]) AS BIGINT) AS sum_q,
           MIN(qvec[dim]) AS min_q,
           MAX(qvec[dim]) AS max_q,
           CAST(COUNT(*) FILTER (qvec[dim] = 0) AS BIGINT) AS n_zero
    FROM pos GROUP BY dim
    """,
    doc="Per-dimension embedding profile (the pass an ANN index or "
        "whitening step runs first): exact integer sums/extremes/sparsity "
        "per dimension over int8-quantized codes — float accumulation "
        "across rows is partition-order-dependent and can never "
        "hash-match an oracle, so the profile quantizes first (per-row, "
        "deterministic) and aggregates integers (associative-exact). One "
        "shuffle on the 64 dim keys with map-side partials carrying "
        "almost all the reduction.",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    exploded = emb.select(
        F.posexplode(F.expr(_QVEC_SPARK)).alias("pos", "q")
    ).select((F.col("pos") + 1).cast("int").alias("dim"), "q")
    return exploded.groupBy("dim").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(q) AS BIGINT)").alias("sum_q"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
        F.expr("CAST(COUNT(*) FILTER (WHERE q = 0) AS BIGINT)").alias("n_zero"),
    )


# ---------------------------------------------------------------------------
# semantic duplicate clusters (connected components over cosine-LSH pairs)
# ---------------------------------------------------------------------------

_SEMANTIC_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      {_LSH_DEDUP_ORACLE}
    ),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    walk(vec_id, reach) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, w.reach FROM edges e JOIN walk w ON w.vec_id = e.dst
    )
    SELECT vec_id, CAST(MIN(reach) AS BIGINT) AS cluster_id
    FROM walk GROUP BY vec_id
"""


@register(
    "emb_semantic_clusters",
    oracle=_SEMANTIC_CLUSTERS_ORACLE,
    doc="Semantic duplicate clustering: cosine-LSH near-dup pairs -> "
        "connected components -> canonical cluster id per vector — the "
        "embedding-space twin of the MinHash dedup_clusters chain, used "
        "when paraphrased/translated duplicates share no shingles. Reuses "
        "the min-label-propagation loop (distributed joins, driver only "
        "coordinates the fixpoint check).",
)
def emb_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components

    pairs = dedup_embedding_lsh(spark, sf_dir).select("a_id", "b_id")
    return connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation (the index-quality monitor)
# ---------------------------------------------------------------------------

_EXACT_TOPK_CTE = f"""
    exact_scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
             round({COS_DUCK}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    exact_topk AS (
      SELECT q_id, neighbor_id FROM (
        SELECT q_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM exact_scored
      ) t WHERE rk <= {TOP_K}
    )
"""


@register(
    "sim_ann_recall_eval",
    oracle=f"""
    WITH {_EXACT_TOPK_CTE},
    ann_topk AS (
      SELECT q_id, neighbor_id FROM ({_ANN_ORACLE}) ann
    )
    SELECT e.q_id,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN ann_topk a
      ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    """,
    doc=f"ANN index-quality monitor: recall@{TOP_K} of the LSH-bucketed "
        "top-k against the exact brute-force top-k, per query — the "
        "evaluation loop a production vector index runs continuously so "
        "recall regressions surface before users do. Both sides are "
        "deterministic engine computations, so even the EVALUATION is "
        "under the hash-checked oracle gate. The comparison join is on "
        "(q_id, neighbor_id) — tiny, broadcast.",
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_knn_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    ann = sim_ann_lsh_topk(spark, sf_dir).select(
        F.col("q_id").alias("a_q"), F.col("neighbor_id").alias("a_n"),
        F.lit(1).alias("hit"),
    )
    return (
        exact.join(
            F.broadcast(ann),
            (F.col("q_id") == F.col("a_q"))
            & (F.col("neighbor_id") == F.col("a_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.expr(f"CAST({TOP_K} AS BIGINT)").alias("k"),
            F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_hit"),
            F.expr(f"CAST(COUNT(hit) AS DOUBLE) / {TOP_K}").alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# IVF recall monitor (same evaluation loop, second index family)
# ---------------------------------------------------------------------------

@register(
    "sim_ivf_recall_eval",
    oracle=f"""
    WITH {_EXACT_TOPK_CTE},
    ivf_topk AS (
      SELECT q_id, neighbor_id FROM ({_IVF_ORACLE}) ivf
    )
    SELECT e.q_id,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN ivf_topk a
      ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    """,
    doc=f"Recall@{TOP_K} of the IVF-style index against exact brute "
        "force, per query — the same continuous monitor as "
        "sim_ann_recall_eval over the second index family, so the two "
        "families' recall/cost trade-off is measurable side by side "
        "(LSH: uniform buckets, no training; IVF: data-adapted cells, "
        "n_probe recall knob).",
)
def sim_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_knn_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    ivf = sim_ann_ivf_topk(spark, sf_dir).select(
        F.col("q_id").alias("a_q"), F.col("neighbor_id").alias("a_n"),
        F.lit(1).alias("hit"),
    )
    return (
        exact.join(
            F.broadcast(ivf),
            (F.col("q_id") == F.col("a_q"))
            & (F.col("neighbor_id") == F.col("a_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.expr(f"CAST({TOP_K} AS BIGINT)").alias("k"),
            F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_hit"),
            F.expr(f"CAST(COUNT(hit) AS DOUBLE) / {TOP_K}").alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# product quantization: codebook assignment + ADC (asymmetric distance) top-k
# ---------------------------------------------------------------------------

PQ_M = 8        # subspaces (64-dim embedding -> 8 sub-vectors of 8 dims)
PQ_DSUB = 8     # dims per subspace
PQ_K = 16       # codewords per subspace (seeded from vec_id < PQ_K)

#: L2^2 between a sub-vector column `sub` and a codeword column `cent`,
#: fixed left-to-right fold -> bit-identical across engines
_L2SQ_SPARK = (
    "aggregate(zip_with(sub, cent, (x, y) -> "
    "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
    "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_L2SQ_DUCK = (
    "list_sum(list_transform(s.sub, (x, i) -> "
    "(CAST(x AS DOUBLE) - CAST(cb.cent[i] AS DOUBLE)) * "
    "(CAST(x AS DOUBLE) - CAST(cb.cent[i] AS DOUBLE))))"
)

#: shared oracle CTEs: sampled codebook (sub-vectors of the first PQ_K
#: vectors), per-vector sub-vectors, and the rounded per-(vec, m, k)
#: distances the argmin/ADC stages both read
_PQ_CTES = f"""
    ms AS (SELECT unnest(range({PQ_M})) AS m),
    cb AS (
      SELECT m, CAST(vec_id AS INT) AS k,
             embedding[m * {PQ_DSUB} + 1 : m * {PQ_DSUB} + {PQ_DSUB}] AS cent
      FROM embeddings CROSS JOIN ms WHERE vec_id < {PQ_K}
    ),
    subs AS (
      SELECT vec_id, m,
             embedding[m * {PQ_DSUB} + 1 : m * {PQ_DSUB} + {PQ_DSUB}] AS sub
      FROM embeddings CROSS JOIN ms
    ),
    scored AS (
      SELECT s.vec_id, s.m, cb.k, round({_L2SQ_DUCK}, 6) AS d
      FROM subs s JOIN cb ON cb.m = s.m
    ),
    codes AS (
      SELECT vec_id, m, k AS code, d AS sq_err FROM (
        SELECT vec_id, m, k, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, k) AS rk
        FROM scored
      ) t WHERE rk = 1
    )
"""


def _pq_scored_frames(codebook_src: DataFrame, vectors: DataFrame):
    """(vec_id, m, k, d) rounded sub-vector-to-codeword distances of
    ``vectors`` against the codebook sampled from ``codebook_src``
    (sub-vectors of its ``vec_id < PQ_K`` rows — a pure function of
    those rows, so a codebook built from the existing corpus is FROZEN
    w.r.t. any later batch). The codebook side is broadcast
    (PQ_M x PQ_K = tiny)."""
    ms = F.explode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("m")
    cb = (
        codebook_src.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").cast("int").alias("k"), "embedding", ms)
        .select(
            "m", "k",
            F.expr(f"slice(embedding, m * {PQ_DSUB} + 1, {PQ_DSUB})").alias("cent"),
        )
    )
    subs = vectors.select("vec_id", "embedding", ms).select(
        "vec_id", "m",
        F.expr(f"slice(embedding, m * {PQ_DSUB} + 1, {PQ_DSUB})").alias("sub"),
    )
    return subs.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "k", F.expr(f"round({_L2SQ_SPARK}, 6)").alias("d")
    )


def _pq_scored(spark: SparkSession, sf_dir: str):
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return _pq_scored_frames(emb, emb)


def _codes_from_scored(scored: DataFrame):
    """argmin codeword per (vec_id, subspace): partial-agg min struct."""
    return (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("d"), F.col("k"))).alias("best"))
        .select(
            "vec_id", "m",
            F.col("best.k").alias("code"),
            F.col("best.d").alias("sq_err"),
        )
    )


def _pq_codes(spark: SparkSession, sf_dir: str):
    return _codes_from_scored(_pq_scored(spark, sf_dir))


@register(
    "emb_pq_codes",
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT vec_id, CAST(m AS INT) AS m, code, sq_err FROM codes
    """,
    doc=f"Product-quantization code assignment: each 64-dim embedding is "
        f"split into {PQ_M} sub-vectors quantized to the nearest of "
        f"{PQ_K} codewords (sampled codebook: the sub-vectors of the "
        f"first {PQ_K} vectors — the deterministic k-means seeding step). "
        "Output is (vec_id, subspace, code, squared reconstruction "
        "error): 64 floats compress to 8 codes (32x), which is what makes "
        "billion-vector ANN memory-resident. The codebook is broadcast "
        "(tiny); assignment is a per-row broadcast join + partial-agg "
        "argmin — no shuffle wider than (vec_id, m).",
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_codes(spark, sf_dir).select(
        "vec_id", F.col("m").cast("int").alias("m"), "code", "sq_err"
    )


@register(
    "sim_ann_pq_topk",
    oracle=f"""
    WITH {_PQ_CTES},
    qd AS (
      SELECT vec_id AS q_id, m, k, d FROM scored WHERE vec_id < {N_QUERIES}
    ),
    approx AS (
      SELECT qd.q_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(qd.d AS DECIMAL(18,6))) AS DOUBLE) AS approx_dist
      FROM codes c
      JOIN qd ON qd.m = c.m AND qd.k = c.code
      WHERE c.vec_id <> qd.q_id
      GROUP BY qd.q_id, c.vec_id
    )
    SELECT q_id, neighbor_id, approx_dist, rk FROM (
      SELECT q_id, neighbor_id, approx_dist,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY approx_dist, neighbor_id) AS rk
      FROM approx
    ) t WHERE rk <= {TOP_K}
    """,
    doc="ADC (asymmetric-distance) top-k over PQ codes: per query, the "
        f"{PQ_M}x{PQ_K} distance table to every codeword is precomputed "
        "and broadcast; each database vector's approximate distance is "
        "then a table lookup per subspace summed over its codes — the "
        "scan never touches raw floats. DECIMAL-exact sums keep the "
        "ranking engine-deterministic. Scale: the scan reads 8 bytes per "
        "vector instead of 256, the distance-table join is a broadcast, "
        "and the only shuffle is the (q_id, neighbor_id) partial-agg sum "
        "— the standard IVFADC second stage (completes the index family: "
        "LSH buckets, IVF cells, int8, PQ/ADC).",
)
def sim_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _pq_scored(spark, sf_dir)
    codes = _pq_codes(spark, sf_dir)
    qd = scored.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("m").alias("qm"),
        F.col("k").alias("qk"),
        "d",
    )
    approx = (
        codes.join(
            F.broadcast(qd),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qk")),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("approx_dist")
        )
    )
    w = Window.partitionBy("q_id").orderBy("approx_dist", "neighbor_id")
    return (
        approx.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "approx_dist", "rk")
    )


_PQ_TOPK_ORACLE = f"""
    WITH {_PQ_CTES},
    qd AS (
      SELECT vec_id AS q_id, m, k, d FROM scored WHERE vec_id < {N_QUERIES}
    ),
    approx AS (
      SELECT qd.q_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(qd.d AS DECIMAL(18,6))) AS DOUBLE) AS approx_dist
      FROM codes c
      JOIN qd ON qd.m = c.m AND qd.k = c.code
      WHERE c.vec_id <> qd.q_id
      GROUP BY qd.q_id, c.vec_id
    )
    SELECT q_id, neighbor_id FROM (
      SELECT q_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY approx_dist, neighbor_id) AS rk
      FROM approx
    ) t WHERE rk <= {TOP_K}
"""


@register(
    "sim_pq_recall_eval",
    oracle=f"""
    WITH {_EXACT_TOPK_CTE},
    pq_topk AS ({_PQ_TOPK_ORACLE})
    SELECT e.q_id,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN pq_topk a
      ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    """,
    doc=f"Recall@{TOP_K} of the PQ/ADC index against exact brute force, "
        "per query — the third index family under the same continuous "
        "monitor, so LSH (no training), IVF (cells + n_probe), and PQ "
        "(memory-compressed codes) are comparable on one recall/cost "
        "axis. Note the exact ranking is cosine while ADC ranks by "
        "quantized L2 — the recall number also absorbs that metric gap, "
        "exactly as it would in production.",
)
def sim_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_knn_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    pq = sim_ann_pq_topk(spark, sf_dir).select(
        F.col("q_id").alias("a_q"), F.col("neighbor_id").alias("a_n"),
        F.lit(1).alias("hit"),
    )
    return (
        exact.join(
            F.broadcast(pq),
            (F.col("q_id") == F.col("a_q"))
            & (F.col("neighbor_id") == F.col("a_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.expr(f"CAST({TOP_K} AS BIGINT)").alias("k"),
            F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_hit"),
            F.expr(f"CAST(COUNT(hit) AS DOUBLE) / {TOP_K}").alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# k-means (Lloyd) iterations: deterministic seeds, fixed rounds
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2

#: L2^2 of a float vector against a double centroid list, fixed-order fold
_KM_DIST_SPARK = (
    "aggregate(zip_with(embedding, cent, (x, y) -> "
    "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_KM_DIST_DUCK = (
    "list_sum(list_transform(e.embedding, (x, i) -> "
    "(CAST(x AS DOUBLE) - c.cent[i]) * (CAST(x AS DOUBLE) - c.cent[i])))"
)


def _km_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster, sq_dist): nearest centroid per vector — a
    broadcast nested-loop join against the K-row centroid table, then a
    partial-agg argmin on (vec_id)."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "k", F.expr(f"round({_KM_DIST_SPARK}, 6)").alias("d")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct(F.col("d"), F.col("k"))).alias("best"))
        .select(
            "vec_id",
            F.col("best.k").alias("cluster"),
            F.col("best.d").alias("sq_dist"),
        )
    )


def _km_update(emb: DataFrame, assign: DataFrame) -> DataFrame:
    """New centroid table (k, cent): per-dimension mean of each cluster's
    members — one shuffle on (cluster, dim) with map-side partials, then
    the K-row array rebuild."""
    per_dim = emb.join(assign.select("vec_id", "cluster"), "vec_id").select(
        "cluster", F.posexplode("embedding").alias("pos", "x")
    )
    avg = per_dim.groupBy("cluster", "pos").agg(
        F.expr("round(avg(CAST(x AS DOUBLE)), 6)").alias("v")
    )
    return avg.groupBy(F.col("cluster").alias("k")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, v))), s -> s.v)"
        ).alias("cent")
    )


@register(
    "emb_kmeans_lloyd",
    oracle=f"""
    WITH dims AS (SELECT unnest(range({64})) AS pos),
    it0 AS (
      SELECT CAST(vec_id AS INT) AS k,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM embeddings WHERE vec_id < {KMEANS_K}
    ),
    s1 AS (
      SELECT e.vec_id, c.k, round({_KM_DIST_DUCK}, 6) AS d
      FROM embeddings e CROSS JOIN it0 c
    ),
    a1 AS (
      SELECT vec_id, k AS cluster FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, k) AS rk
        FROM s1
      ) t WHERE rk = 1
    ),
    c1dim AS (
      SELECT a1.cluster AS k, dims.pos,
             round(avg(CAST(e.embedding[dims.pos + 1] AS DOUBLE)), 6) AS v
      FROM a1 JOIN embeddings e USING (vec_id) CROSS JOIN dims
      GROUP BY k, dims.pos
    ),
    c1 AS (
      SELECT k, list(v ORDER BY pos) AS cent FROM c1dim GROUP BY k
    ),
    s2 AS (
      SELECT e.vec_id, c.k, round({_KM_DIST_DUCK}, 6) AS d
      FROM embeddings e CROSS JOIN c1 c
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster, sq_dist FROM (
      SELECT vec_id, k AS cluster, d AS sq_dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, k) AS rk
      FROM s2
    ) t WHERE rk = 1
    """,
    doc=f"K-means (Lloyd) clustering, {KMEANS_ITERS} fixed iterations "
        f"from deterministic seeds (the first {KMEANS_K} vectors): "
        "assign = broadcast of the K-row centroid table + per-vector "
        "argmin; update = one (cluster, dim) shuffle with map-side "
        "partial averages. The iterative-ML shape on DataFrames — each "
        "round is two narrow passes over the corpus and state is K×64 "
        "doubles, so 1000 executors scan in parallel and nothing but the "
        "tiny centroid table ever crosses rounds. Deterministic "
        "tie-break (distance, then cluster id) and rounded centroid "
        "means keep both engines bit-aligned.",
)
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    centroids = (
        emb.filter(F.col("vec_id") < KMEANS_K)
        .select(
            F.col("vec_id").cast("int").alias("k"),
            F.expr(
                "transform(embedding, x -> CAST(x AS DOUBLE))"
            ).alias("cent"),
        )
    )
    assign = None
    for _ in range(KMEANS_ITERS):
        assign = _km_assign(emb, centroids)
        centroids = _km_update(emb, assign)
    # final output reflects the assignment under the LAST-assigned
    # centroids (iteration KMEANS_ITERS's assign step)
    return assign.select(
        "vec_id", F.col("cluster").cast("int").alias("cluster"), "sq_dist"
    )


# ---------------------------------------------------------------------------
# PageRank over the kNN graph (scaled-integer exact propagation)
# ---------------------------------------------------------------------------

PR_ITERS = 2
PR_SCALE = 10**12      # rank mass carried as integer micro-units
PR_DAMP_NUM = 85       # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100


@register(
    "graph_pagerank_knn",
    # all propagation is integer arithmetic (scaled mass, integer DIV), so
    # both engines produce identical ranks with no float-summation order
    # sensitivity; the only float op is the final display division
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    edges AS (SELECT src_id, dst_id FROM knn),
    nodes AS (SELECT vec_id FROM embeddings),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src_id, COUNT(*) AS deg FROM edges GROUP BY src_id),
    p0 AS (
      SELECT vec_id, {PR_SCALE} // (SELECT n FROM n) AS p FROM nodes
    ),
    s1 AS (
      SELECT e.dst_id, SUM(p0.p // o.deg) AS m
      FROM edges e JOIN p0 ON p0.vec_id = e.src_id
      JOIN outdeg o ON o.src_id = e.src_id
      GROUP BY e.dst_id
    ),
    p1 AS (
      SELECT nodes.vec_id,
             ({PR_SCALE} * ({PR_DAMP_DEN} - {PR_DAMP_NUM}) // {PR_DAMP_DEN})
               // (SELECT n FROM n)
             + ({PR_DAMP_NUM} * COALESCE(s1.m, 0)) // {PR_DAMP_DEN} AS p
      FROM nodes LEFT JOIN s1 ON s1.dst_id = nodes.vec_id
    ),
    s2 AS (
      SELECT e.dst_id, SUM(p1.p // o.deg) AS m
      FROM edges e JOIN p1 ON p1.vec_id = e.src_id
      JOIN outdeg o ON o.src_id = e.src_id
      GROUP BY e.dst_id
    ),
    p2 AS (
      SELECT nodes.vec_id,
             ({PR_SCALE} * ({PR_DAMP_DEN} - {PR_DAMP_NUM}) // {PR_DAMP_DEN})
               // (SELECT n FROM n)
             + ({PR_DAMP_NUM} * COALESCE(s2.m, 0)) // {PR_DAMP_DEN} AS p
      FROM nodes LEFT JOIN s2 ON s2.dst_id = nodes.vec_id
    )
    SELECT vec_id, CAST(p AS BIGINT) AS rank_scaled,
           CAST(p AS DOUBLE) / {PR_SCALE} AS pagerank
    FROM p2
    """,
    doc=f"PageRank ({PR_ITERS} fixed iterations, damping 0.85) over the "
        "approximate kNN graph — the centrality pass graph-curation "
        "pipelines run to find prototypical vs isolated documents in a "
        "semantic neighborhood graph. Rank mass is carried as scaled "
        "INTEGERS (micro-units, integer division) so propagation is "
        "exactly reproducible — no float-summation order sensitivity "
        "across engines or partitionings. Each iteration is one "
        "(dst) shuffle of edge contributions with map-side partial sums "
        "plus a broadcast of the per-node degree; iteration state is one "
        "bigint per node.",
)
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    edges = emb_knn_graph(spark, sf_dir).select("src_id", "dst_id").persist()
    nodes = emb.select("vec_id")
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    outdeg = edges.groupBy("src_id").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(outdeg, "src_id").persist()

    base = (
        f"({PR_SCALE}L * ({PR_DAMP_DEN} - {PR_DAMP_NUM}) DIV {PR_DAMP_DEN}) DIV n"
    )
    p = nodes.crossJoin(n_row).select(
        "vec_id", F.expr(f"{PR_SCALE}L DIV n").alias("p")
    )
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(p, ed["src_id"] == p["vec_id"])
            .select("dst_id", F.expr("p DIV deg").alias("c"))
        )
        sums = contrib.groupBy("dst_id").agg(F.sum("c").alias("m"))
        p = (
            nodes.join(sums, nodes["vec_id"] == sums["dst_id"], "left")
            .crossJoin(n_row)
            .select(
                "vec_id",
                F.expr(
                    f"{base} + ({PR_DAMP_NUM} * COALESCE(m, 0L)) DIV {PR_DAMP_DEN}"
                ).alias("p"),
            )
        )
    return p.select(
        "vec_id",
        F.expr("CAST(p AS BIGINT)").alias("rank_scaled"),
        F.expr(f"CAST(p AS DOUBLE) / {PR_SCALE}").alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# Triangle counting / clustering coefficient over the kNN graph
# ---------------------------------------------------------------------------

@register(
    "graph_triangle_count",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) ends GROUP BY node
    ),
    tcnt AS (
      SELECT node, COUNT(*) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y AS node FROM tri
        UNION ALL SELECT z AS node FROM tri
      ) corners GROUP BY node
    )
    SELECT e.vec_id,
           CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
           CAST(COALESCE(tcnt.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN COALESCE(deg.degree, 0) >= 2
                THEN CAST(2 * COALESCE(tcnt.triangles, 0) AS DOUBLE)
                     / (deg.degree * (deg.degree - 1))
                ELSE CAST(0 AS DOUBLE) END AS clustering
    FROM embeddings e
    LEFT JOIN deg ON deg.node = e.vec_id
    LEFT JOIN tcnt ON tcnt.node = e.vec_id
    """,
    doc="Per-node triangle count + local clustering coefficient over the "
        "approximate kNN graph — the graph-curation signal that separates "
        "tightly-knit semantic clusters (high clustering) from hub/bridge "
        "nodes (high degree, low clustering). Counting uses the canonical "
        "ordered-triple join: undirected edges stored once as (a<b), then "
        "(x,y)J(y,z)J(x,z) so every triangle materializes exactly once "
        "with no post-dedup. Scale: the kNN construction bounds every "
        "node's degree by 2*GRAPH_K, so the candidate wedge join is at "
        "most |V|*(2k)^2 rows — no power-law hotspot can form, which is "
        "the known failure mode of triangle counting on natural graphs "
        "(there, degree-ordering e1.a<e1.b already directs wedges at the "
        "lower-degree endpoint, the standard mitigation). Every join is a "
        "hash join on int keys; per-corner counts are one map-side-"
        "combinable shuffle.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    knn = emb_knn_graph(spark, sf_dir)
    und = (
        knn.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .persist()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tcnt = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        emb.select("vec_id")
        .join(deg, F.col("vec_id") == deg["node"], "left")
        .drop("node")
        .join(tcnt, F.col("vec_id") == tcnt["node"], "left")
        .drop("node")
        .select(
            "vec_id",
            F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
            F.expr(
                "CASE WHEN COALESCE(degree, 0) >= 2 "
                "THEN CAST(2 * COALESCE(triangles, 0) AS DOUBLE) "
                "     / (degree * (degree - 1)) "
                "ELSE CAST(0 AS DOUBLE) END"
            ).alias("clustering"),
        )
    )


# ---------------------------------------------------------------------------
# contrastive pair mining (embedding-model training data prep)
# ---------------------------------------------------------------------------

CONTRAST_POOL = 32   # shared negative pool (the in-batch-negatives analogue)
CONTRAST_NEGS = 3    # negatives per anchor


@register(
    "sample_contrastive_pairs",
    oracle=f"""
    WITH ordered AS (
      SELECT vec_id, label,
             LEAD(vec_id) OVER w AS nxt,
             FIRST_VALUE(vec_id) OVER w AS fst,
             COUNT(*) OVER (PARTITION BY label) AS n
      FROM embeddings
      WINDOW w AS (PARTITION BY label
                   ORDER BY md5(concat('pp:', vec_id)), vec_id)
    ),
    pos AS (
      SELECT vec_id AS anchor_id, label AS anchor_label,
             COALESCE(nxt, fst) AS partner_id, label AS partner_label,
             'pos' AS pair_type, 1 AS rk
      FROM ordered WHERE n >= 2
    ),
    pool AS (
      SELECT vec_id AS neg_id, label AS neg_label FROM embeddings
      ORDER BY md5(concat('np:', vec_id)), vec_id LIMIT {CONTRAST_POOL}
    ),
    negcand AS (
      SELECT e.vec_id AS anchor_id, e.label AS anchor_label,
             p.neg_id AS partner_id, p.neg_label AS partner_label,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY md5(concat('an:', e.vec_id, ':', p.neg_id)), p.neg_id
             ) AS rk
      FROM embeddings e JOIN pool p ON p.neg_label <> e.label
    )
    SELECT anchor_id, anchor_label, partner_id, partner_label,
           pair_type, CAST(rk AS INT) AS rk
    FROM pos
    UNION ALL
    SELECT anchor_id, anchor_label, partner_id, partner_label,
           'neg' AS pair_type, CAST(rk AS INT) AS rk
    FROM negcand WHERE rk <= {CONTRAST_NEGS}
    """,
    doc=f"Contrastive training-pair mining over labeled embeddings: one "
        "positive per anchor (ring pairing — each label group is ordered "
        "by a salted hash and every vector pairs with its successor, "
        "wrapping at the end) plus "
        f"{CONTRAST_NEGS} negatives drawn from a shared "
        f"{CONTRAST_POOL}-vector pool (the distributed rendering of "
        "in-batch negatives). Scale discipline: positives are LINEAR in "
        "group size (one window pass), never the quadratic same-label "
        "self-join; negatives join against a broadcast bottom-k pool, so "
        "cost is n * pool, not n^2. Everything is hash-deterministic — "
        "re-runs and repartitionings mine identical pairs, and the "
        "per-anchor negative choice is an independent salted hash so "
        "pool order does not bias which negatives an anchor sees.",
)
def sample_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    w = Window.partitionBy("label").orderBy(
        F.expr("md5(concat('pp:', vec_id))"), F.asc("vec_id")
    )
    wl = Window.partitionBy("label")
    ordered = emb.select(
        "vec_id", "label",
        F.lead("vec_id").over(w).alias("nxt"),
        F.first("vec_id").over(w).alias("fst"),
        F.count(F.lit(1)).over(wl).alias("n"),
    )
    pos = ordered.filter(F.col("n") >= 2).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.coalesce("nxt", "fst").alias("partner_id"),
        F.col("label").alias("partner_label"),
        F.lit("pos").alias("pair_type"),
        F.lit(1).cast("int").alias("rk"),
    )
    pool = (
        emb.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.expr("md5(concat('np:', vec_id))").alias("h"),
        )
        .orderBy("h", "neg_id")
        .limit(CONTRAST_POOL)
        .drop("h")
    )
    wn = Window.partitionBy("anchor_id").orderBy(
        F.expr("md5(concat('an:', anchor_id, ':', partner_id))"),
        F.asc("partner_id"),
    )
    negcand = (
        emb.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
        )
        .join(F.broadcast(pool), F.col("neg_label") != F.col("anchor_label"))
        .select(
            "anchor_id", "anchor_label",
            F.col("neg_id").alias("partner_id"),
            F.col("neg_label").alias("partner_label"),
        )
        .withColumn("rk", F.row_number().over(wn))
        .filter(F.col("rk") <= CONTRAST_NEGS)
        .select(
            "anchor_id", "anchor_label", "partner_id", "partner_label",
            F.lit("neg").alias("pair_type"),
            F.col("rk").cast("int").alias("rk"),
        )
    )
    return pos.unionByName(negcand)


# ---------------------------------------------------------------------------
# modularity of the semantic-cluster partition over the kNN graph
# ---------------------------------------------------------------------------

@register(
    "graph_modularity_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_LSH_DEDUP_ORACLE}
    ),
    cedges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    walk(vec_id, reach) AS (
      SELECT DISTINCT src, src FROM cedges
      UNION
      SELECT e.src, w.reach FROM cedges e JOIN walk w ON w.vec_id = e.dst
    ),
    clus AS (
      SELECT vec_id, MIN(reach) AS cluster_id FROM walk GROUP BY vec_id
    ),
    knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    assign AS (
      SELECT e.vec_id, COALESCE(c.cluster_id, e.vec_id) AS cl
      FROM embeddings e LEFT JOIN clus c ON c.vec_id = e.vec_id
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) ends GROUP BY node
    ),
    mm AS (SELECT COUNT(*) AS m FROM und),
    ww AS (
      SELECT COUNT(*) AS w
      FROM und
      JOIN assign ca ON ca.vec_id = und.a
      JOIN assign cb ON cb.vec_id = und.b
      WHERE ca.cl = cb.cl
    ),
    dc AS (
      SELECT ass.cl, SUM(deg.d) AS dsum
      FROM deg JOIN assign ass ON ass.vec_id = deg.node
      GROUP BY ass.cl
    ),
    ss AS (SELECT SUM(dsum * dsum) AS s FROM dc)
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_nodes,
           CAST((SELECT m FROM mm) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT cl) FROM assign) AS BIGINT)
             AS n_clusters,
           CAST((SELECT w FROM ww) AS BIGINT) AS intra_edges,
           round(CAST((SELECT w FROM ww) AS DOUBLE) / (SELECT m FROM mm)
                 - CAST((SELECT s FROM ss) AS DOUBLE)
                   / (4.0 * (SELECT m FROM mm) * (SELECT m FROM mm)),
                 6) AS modularity
    """,
    doc="Newman modularity of the semantic-duplicate partition evaluated "
        "on the kNN graph — the partition-quality monitor that closes "
        "the graph-curation loop (clusters from cosine-LSH CC, structure "
        "from the kNN neighborhood graph; vectors in no near-dup pair "
        "count as singleton communities). Q = W/m - sum(D_c^2)/(4m^2) "
        "computed from three INTEGER aggregates (intra-edge count, edge "
        "count, per-community degree sums) with two IEEE divisions at "
        "the end — order-independent, hash-gate exact. All joins are "
        "int-keyed hash joins; the community degree table is "
        "broadcast-sized.",
)
def graph_modularity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    und = (
        emb_knn_graph(spark, sf_dir)
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .persist()
    )
    clus = emb_semantic_clusters(spark, sf_dir)
    assign = (
        emb.select("vec_id")
        .join(clus.withColumnRenamed("vec_id", "cvid"),
              F.col("vec_id") == F.col("cvid"), "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cl"),
        )
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    mm = und.agg(F.count(F.lit(1)).alias("m"))
    ww = (
        und.join(assign.select(F.col("vec_id").alias("a"),
                               F.col("cl").alias("cla")), "a")
        .join(assign.select(F.col("vec_id").alias("b"),
                            F.col("cl").alias("clb")), "b")
        .filter(F.col("cla") == F.col("clb"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    dc = (
        deg.join(assign.select(F.col("vec_id").alias("node"), "cl"), "node")
        .groupBy("cl")
        .agg(F.sum("d").alias("dsum"))
    )
    ss = dc.agg(F.sum(F.col("dsum") * F.col("dsum")).alias("s"))
    n_nodes = emb.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_clusters = assign.agg(F.countDistinct("cl").alias("n_clusters"))
    return (
        n_nodes.crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(n_clusters))
        .crossJoin(F.broadcast(ww))
        .crossJoin(F.broadcast(ss))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("m").cast("bigint").alias("n_edges"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            F.col("w").cast("bigint").alias("intra_edges"),
            F.expr(
                "round(CAST(w AS DOUBLE) / m "
                "- CAST(s AS DOUBLE) / (4.0 * m * m), 6)"
            ).alias("modularity"),
        )
    )


# ---------------------------------------------------------------------------
# embedding-truncation (Matryoshka) retrieval evaluation
# ---------------------------------------------------------------------------

MRL_PREFIX_DIMS = 16  # evaluate the first quarter of the 64-dim vectors

_COS_TRUNC_DUCK = (
    f"list_dot_product(a.embedding[1:{MRL_PREFIX_DIMS}]::DOUBLE[], "
    f"b.embedding[1:{MRL_PREFIX_DIMS}]::DOUBLE[]) / "
    f"(sqrt(list_dot_product(a.embedding[1:{MRL_PREFIX_DIMS}]::DOUBLE[], "
    f"a.embedding[1:{MRL_PREFIX_DIMS}]::DOUBLE[])) * "
    f"sqrt(list_dot_product(b.embedding[1:{MRL_PREFIX_DIMS}]::DOUBLE[], "
    f"b.embedding[1:{MRL_PREFIX_DIMS}]::DOUBLE[])))"
)


@register(
    "emb_truncation_recall_eval",
    oracle=f"""
    WITH {_EXACT_TOPK_CTE},
    trunc_scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
             round({_COS_TRUNC_DUCK}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    trunc_topk AS (
      SELECT q_id, neighbor_id FROM (
        SELECT q_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM trunc_scored
      ) t WHERE rk <= {TOP_K}
    )
    SELECT e.q_id,
           CAST({MRL_PREFIX_DIMS} AS INT) AS prefix_dims,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(tr.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(tr.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN trunc_topk tr
      ON tr.q_id = e.q_id AND tr.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    """,
    doc=f"Embedding-truncation retrieval eval (the Matryoshka question): "
        f"recall@{TOP_K} of exact search over only the first "
        f"{MRL_PREFIX_DIMS} of 64 dimensions against full-dimension "
        "exact top-k. This is the measurement that justifies (or "
        "refuses) the 4x index-size/bandwidth cut of storing truncated "
        "vectors — the third entry on the shared recall/cost axis next "
        "to the LSH/IVF/PQ monitors, trading dimensions instead of "
        "candidates or code precision. Same brute-force-vs-brute-force "
        "shape as sim_ann_recall_eval: both sides exact, only the "
        "metric changes; norms are hoisted per vector before the pair "
        "join in the Spark plan.",
)
def emb_truncation_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]

    def topk(emb_col_expr: str) -> DataFrame:
        a = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"),
            F.expr(emb_col_expr).alias("a_emb"),
        ).select(
            "q_id", "a_emb",
            F.expr(_NORM.format(col="a_emb")).alias("a_norm"),
        )
        b = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.expr(emb_col_expr).alias("b_emb"),
        ).select(
            "neighbor_id", "b_emb",
            F.expr(_NORM.format(col="b_emb")).alias("b_norm"),
        )
        scored = (
            a.join(b, F.col("neighbor_id") != F.col("q_id"))
            .select(
                "q_id", "neighbor_id",
                F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)")
                .alias("cosine"),
            )
        )
        w = Window.partitionBy("q_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("q_id", "neighbor_id")
        )

    exact = topk("embedding")
    trunc = topk(f"slice(embedding, 1, {MRL_PREFIX_DIMS})")
    return (
        exact.join(
            trunc.withColumnRenamed("neighbor_id", "hit_id"),
            (exact["q_id"] == trunc["q_id"])
            & (F.col("neighbor_id") == F.col("hit_id")),
            "left",
        )
        .drop(trunc["q_id"])
        .groupBy("q_id")
        .agg(
            F.lit(MRL_PREFIX_DIMS).cast("int").alias("prefix_dims"),
            F.lit(TOP_K).cast("bigint").alias("k"),
            F.count("hit_id").cast("bigint").alias("n_hit"),
            (F.count("hit_id").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# OOD scoring: distance to nearest label centroid
# ---------------------------------------------------------------------------

@register(
    "emb_ood_nearest_centroid",
    oracle=f"""
    WITH cent AS (
      SELECT label, i - 1 AS dim,
             round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY label, dim
    ),
    vec_dim AS ({_DIMS_DUCK}),
    d2 AS (
      SELECT v.vec_id, c.label AS cand_label,
             round(SUM((v.x - c.c) * (v.x - c.c)), 6) AS dist2
      FROM vec_dim v JOIN cent c ON c.dim = v.dim
      GROUP BY v.vec_id, c.label
    ),
    best AS (
      SELECT vec_id, cand_label, dist2,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist2, cand_label) AS rk
      FROM d2
    )
    SELECT e.vec_id, e.label, b.cand_label AS nearest_label,
           b.dist2 AS nearest_dist2,
           CAST(CASE WHEN b.cand_label <> e.label THEN 1 ELSE 0 END AS INT)
             AS is_mismatch
    FROM embeddings e JOIN best b ON b.vec_id = e.vec_id AND b.rk = 1
    """,
    doc="Out-of-distribution / mislabel scoring: every vector's squared "
        "distance to its NEAREST label centroid, with a mismatch flag "
        "when that centroid is not the vector's own label — the two "
        "standard curation signals (large nearest_dist2 = OOD candidate; "
        "is_mismatch = label-noise candidate) from one pass. The "
        "centroid table is |labels|*dims rows — broadcast-sized at any "
        "corpus scale — so the scoring join is a broadcast hash join on "
        "dim and the per-(vector,label) reduce carries |labels| partial "
        "sums per vector; no pairwise vector join anywhere.",
)
def emb_ood_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy(F.col("label").alias("cand_label"), "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
    )
    vec_dim = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    d2 = (
        vec_dim.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cand_label")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))), 6
            ).alias("dist2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cand_label")
    best = d2.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        emb.select("vec_id", "label")
        .join(best, "vec_id")
        .select(
            "vec_id", "label",
            F.col("cand_label").alias("nearest_label"),
            F.col("dist2").alias("nearest_dist2"),
            F.expr(
                "CAST(CASE WHEN cand_label <> label THEN 1 ELSE 0 END AS INT)"
            ).alias("is_mismatch"),
        )
    )


# ---------------------------------------------------------------------------
# centroid drift monitor (epoch-over-epoch embedding shift per label)
# ---------------------------------------------------------------------------

@register(
    "emb_centroid_drift",
    oracle=f"""
    WITH vec_dim AS ({_DIMS_DUCK}),
    labeled AS (
      SELECT v.vec_id, e.label, v.dim, v.x, CAST(v.vec_id % 2 AS INT) AS epoch
      FROM vec_dim v JOIN embeddings e ON e.vec_id = v.vec_id
    ),
    cent AS (
      SELECT label, epoch, dim, round(avg(x), 6) AS c, COUNT(*) AS n
      FROM labeled GROUP BY label, epoch, dim
    ),
    paired AS (
      SELECT a.label, a.dim, a.c AS c0, b.c AS c1,
             a.n AS n0, b.n AS n1
      FROM cent a JOIN cent b
        ON b.label = a.label AND b.dim = a.dim
      WHERE a.epoch = 0 AND b.epoch = 1
    )
    SELECT label,
           CAST(MAX(n0) AS BIGINT) AS n_epoch0,
           CAST(MAX(n1) AS BIGINT) AS n_epoch1,
           round(SUM((c1 - c0) * (c1 - c0)), 6) AS drift_sq,
           round(MAX(abs(c1 - c0)), 6) AS max_dim_shift
    FROM paired GROUP BY label
    """,
    doc="Embedding drift monitor: per-label centroid shift between two "
        "cohorts (here vec_id parity stands in for ingestion epochs; in "
        "production the epoch column is the embedding-model version or "
        "crawl date). Reports squared L2 centroid displacement and the "
        "worst single-dimension shift — the cheap early-warning signal "
        "that an embedding model changed under an index, invalidating "
        "stored vectors. Centroids round to 6dp BEFORE differencing, so "
        "cross-engine float noise cannot masquerade as drift. Everything "
        "reduces to |labels|x|epochs|x|dims| rows — broadcast-sized at "
        "any corpus scale; the corpus is scanned exactly once.",
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    labeled = emb.select(
        "vec_id", "label",
        F.expr("CAST(vec_id % 2 AS INT)").alias("epoch"),
        F.posexplode("embedding").alias("dim", "xf"),
    ).select("label", "epoch", "dim", F.col("xf").cast("double").alias("x"))
    cent = labeled.groupBy("label", "epoch", "dim").agg(
        F.round(F.avg("x"), 6).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    a = cent.filter(F.col("epoch") == 0).select(
        "label", "dim", F.col("c").alias("c0"), F.col("n").alias("n0")
    )
    b = cent.filter(F.col("epoch") == 1).select(
        "label", "dim", F.col("c").alias("c1"), F.col("n").alias("n1")
    )
    return (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("n0").cast("bigint").alias("n_epoch0"),
            F.max("n1").cast("bigint").alias("n_epoch1"),
            F.round(
                F.sum((F.col("c1") - F.col("c0")) * (F.col("c1") - F.col("c0"))),
                6,
            ).alias("drift_sq"),
            F.round(F.max(F.abs(F.col("c1") - F.col("c0"))), 6)
            .alias("max_dim_shift"),
        )
    )


# ---------------------------------------------------------------------------
# degree assortativity of the kNN graph
# ---------------------------------------------------------------------------

@register(
    "graph_assortativity_knn",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) ends GROUP BY node
    ),
    pairs AS (
      SELECT da.d AS x, db.d AS y
      FROM und JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b
      UNION ALL
      SELECT db.d AS x, da.d AS y
      FROM und JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS assortativity
    FROM s
    """,
    doc="Degree assortativity of the kNN graph: the Pearson correlation "
        "of endpoint degrees over all directed edge incidences (each "
        "undirected edge contributes both orientations, the standard "
        "Newman convention). All five sufficient statistics are INTEGER "
        "sums — degrees are counts — so the only float ops are the final "
        "two sqrts and one division, order-independent and hash-gate "
        "exact. Interpretation for curation: positive r means dense-"
        "cluster cores link to cores (dedup clusters, boilerplate "
        "families); strongly negative r flags hub-and-spoke topology "
        "where a few generic documents neighbor everything — candidates "
        "for the posting-cap treatment. One reduce over the edge list "
        "after a broadcast-joined degree lookup.",
)
def graph_assortativity_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (
        emb_knn_graph(spark, sf_dir)
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("xa"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("xb"))
    # degree table is per-node (graph-sized): hint-free joins, AQE decides
    joined = und.join(da, "a").join(db, "b")
    pairs = joined.select(
        F.col("xa").alias("x"), F.col("xb").alias("y")
    ).unionAll(joined.select(F.col("xb").alias("x"), F.col("xa").alias("y")))
    return pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).select(
        F.expr("CAST(n / 2 AS BIGINT)").alias("n_edges"),
        F.expr(
            "round((n * sxy - sx * sy) "
            "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) "
            "* sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)"
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# cluster purity: semantic clusters vs labels
# ---------------------------------------------------------------------------

@register(
    "emb_cluster_purity",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_LSH_DEDUP_ORACLE}
    ),
    cedges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    walk(vec_id, reach) AS (
      SELECT DISTINCT src, src FROM cedges
      UNION
      SELECT e.src, w.reach FROM cedges e JOIN walk w ON w.vec_id = e.dst
    ),
    clus AS (
      SELECT vec_id, MIN(reach) AS cluster_id FROM walk GROUP BY vec_id
    ),
    memb AS (
      SELECT c.cluster_id, e.label, COUNT(*) AS n
      FROM clus c JOIN embeddings e ON e.vec_id = c.vec_id
      GROUP BY c.cluster_id, e.label
    ),
    top AS (
      SELECT cluster_id, majority_label, n_majority, n_members FROM (
        SELECT cluster_id, label AS majority_label, n AS n_majority,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY n DESC, label) AS rk,
               SUM(n) OVER (PARTITION BY cluster_id) AS n_members
        FROM memb
      ) t WHERE rk = 1
    )
    SELECT cluster_id, majority_label,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_majority AS BIGINT) AS n_majority,
           round(CAST(n_majority AS DOUBLE) / n_members, 6) AS purity
    FROM top WHERE n_members >= 2
    """,
    doc="Cluster-purity evaluation: each multi-member semantic-duplicate "
        "cluster scored by the share of its majority label — the "
        "external-validity check for the unsupervised near-dup chain "
        "(a low-purity cluster means cosine-LSH merged documents the "
        "labels say are different: threshold too loose or embeddings "
        "too coarse). Per-cluster label histograms are the only shuffle "
        "beyond the clustering itself; the purity ratios are exact "
        "integer fractions. Same eval discipline as the recall/confusion "
        "monitors — every unsupervised index ships with its quality "
        "probe.",
)
def emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    clus = emb_semantic_clusters(spark, sf_dir)
    memb = (
        clus.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    wm = Window.partitionBy("cluster_id")
    top = (
        memb.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.sum("n").over(wm))
        .filter((F.col("rk") == 1) & (F.col("n_members") >= 2))
    )
    return top.select(
        "cluster_id",
        F.col("label").alias("majority_label"),
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("n").cast("bigint").alias("n_majority"),
        F.expr("round(CAST(n AS DOUBLE) / n_members, 6)").alias("purity"),
    )


# ---------------------------------------------------------------------------
# power-iteration dominant direction (integer-exact linear algebra)
# ---------------------------------------------------------------------------

PI_QUANT = 1000      # milli-unit quantization of embedding values
PI_RESCALE = 1024    # inter-iteration DIV keeps products inside BIGINT


@register(
    "emb_power_iteration_pc1",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {PI_QUANT} + 0.5)
                  AS BIGINT) AS qv
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cov AS (
      SELECT a.dim AS di, b.dim AS dj, SUM(a.qv * b.qv) AS c
      FROM q a JOIN q b ON b.vec_id = a.vec_id
      GROUP BY di, dj
    ),
    v1 AS (
      SELECT di AS dim, SUM(c) AS v FROM cov GROUP BY di
    ),
    v1s AS (
      SELECT dim, v // {PI_RESCALE} AS v FROM v1
    ),
    v2 AS (
      SELECT cov.di AS dim, SUM(cov.c * v1s.v) AS v
      FROM cov JOIN v1s ON v1s.dim = cov.dj
      GROUP BY cov.di
    ),
    mx AS (SELECT MAX(abs(v)) AS m FROM v2)
    SELECT CAST(v2.dim AS INT) AS dim,
           CAST(v2.v AS BIGINT) AS v2_scaled,
           round(CAST(v2.v AS DOUBLE) / (SELECT m FROM mx), 6) AS loading
    FROM v2
    """,
    doc="Dominant direction of the embedding second-moment (Gram) matrix "
        "by two power iterations in EXACT integer arithmetic: values "
        "milli-quantized to ints, the 64x64 moment matrix accumulated as "
        "BIGINT products (map-side-combinable — the classic distributed "
        "covariance outer-product reduce), iterations unrolled with one "
        "integer-DIV rescale sized so every partial sum stays inside "
        "64-bit range. No float accumulates across rows anywhere, so the "
        "direction is bit-reproducible under any partitioning — the "
        "same scaled-integer discipline as the PageRank operator applied "
        "to linear algebra. The loading vector diagnoses anisotropy "
        "(embedding collapse onto one axis — the known failure mode that "
        "breaks cosine retrieval); full PCA belongs to MLlib, this is "
        "the one-axis monitor a pipeline can afford per batch.",
)
def emb_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id", "dim",
        F.expr(
            f"CAST(floor(CAST(xf AS DOUBLE) * {PI_QUANT} + 0.5) AS BIGINT)"
        ).alias("qv"),
    )
    a = q.alias("a")
    b = q.alias("b")
    cov = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id"))
        .groupBy(F.col("a.dim").alias("di"), F.col("b.dim").alias("dj"))
        .agg(F.sum(F.col("a.qv") * F.col("b.qv")).alias("c"))
        .persist()
    )
    v1s = (
        cov.groupBy(F.col("di").alias("dim"))
        .agg(F.sum("c").alias("v"))
        .select("dim", F.expr(f"v DIV {PI_RESCALE}").alias("v"))
    )
    v2 = (
        cov.join(F.broadcast(v1s.withColumnRenamed("dim", "dj")), "dj")
        .groupBy(F.col("di").alias("dim"))
        .agg(F.sum(F.col("c") * F.col("v")).alias("v"))
    )
    mx = v2.agg(F.max(F.abs("v")).alias("m"))
    return v2.crossJoin(F.broadcast(mx)).select(
        F.col("dim").cast("int").alias("dim"),
        F.col("v").cast("bigint").alias("v2_scaled"),
        F.expr("round(CAST(v AS DOUBLE) / m, 6)").alias("loading"),
    )


# ---------------------------------------------------------------------------
# hubness: in-degree concentration of the kNN graph
# ---------------------------------------------------------------------------

@register(
    "graph_hubness_knn",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    indeg AS (
      SELECT e.vec_id, COALESCE(k.n, 0) AS in_deg
      FROM embeddings e
      LEFT JOIN (
        SELECT dst_id, COUNT(*) AS n FROM knn GROUP BY dst_id
      ) k ON k.dst_id = e.vec_id
    )
    SELECT CAST(in_deg AS BIGINT) AS in_deg,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM indeg GROUP BY in_deg
    """,
    doc="Hubness profile of the kNN graph: the distribution of "
        "IN-degrees — how many vectors appear in k others' neighbor "
        "lists. In well-behaved embedding spaces the histogram "
        "concentrates near k; a heavy right tail (hubs appearing in "
        "hundreds of lists) plus a mass at zero (anti-hubs nobody "
        "retrieves) is the classic high-dimensional hubness pathology "
        "that silently degrades kNN search and graph-based dedup — the "
        "diagnostic that says 'normalize, center, or reduce dimensions' "
        "before trusting cosine retrieval. One count aggregate over the "
        "graph edges plus the zero-degree left join; output is a "
        "histogram, broadcast-sized regardless of corpus scale.",
)
def graph_hubness_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    knn = emb_knn_graph(spark, sf_dir)
    k = knn.groupBy("dst_id").agg(F.count(F.lit(1)).alias("n"))
    indeg = (
        emb.select("vec_id")
        .join(k, emb["vec_id"] == k["dst_id"], "left")
        .select(F.coalesce("n", F.lit(0)).alias("in_deg"))
    )
    return indeg.groupBy("in_deg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    ).select(F.col("in_deg").cast("bigint").alias("in_deg"), "n_vectors")


# ---------------------------------------------------------------------------
# embedding norm profile (normalization-health diagnostic)
# ---------------------------------------------------------------------------

@register(
    "emb_norm_profile",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label,
             round(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
      FROM embeddings
    ),
    ranked AS (
      SELECT label, nrm,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY nrm, vec_id) AS r,
             COUNT(*) OVER (PARTITION BY label) AS cnt
      FROM n
    )
    SELECT label,
           CAST(MAX(cnt) AS BIGINT) AS n_vectors,
           MIN(nrm) AS min_norm,
           MAX(CASE WHEN r = (50 * cnt + 99) // 100 THEN nrm END) AS p50_norm,
           MAX(nrm) AS max_norm
    FROM ranked GROUP BY label
    """,
    doc="Embedding L2-norm profile per label (min / type-1 median / "
        "max): the normalization-health check run before cosine "
        "retrieval — a wide norm spread means dot-product and cosine "
        "rankings diverge and un-normalized vectors will bias ANN "
        "toward long vectors (one driver of the hubness pathology "
        "graph_hubness_knn surfaces). Norms round to 6dp per row "
        "(within-row float fold only), then rank math is the shared "
        "type-1 order-statistic pattern; one per-label window pass.",
)
def emb_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    n = emb.select(
        "vec_id", "label",
        F.expr(f"round({_NORM.format(col='embedding')}, 6)").alias("nrm"),
    )
    wr = Window.partitionBy("label").orderBy("nrm", "vec_id")
    wc = Window.partitionBy("label")
    ranked = n.select(
        "label", "nrm",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return ranked.groupBy("label").agg(
        F.max("cnt").cast("bigint").alias("n_vectors"),
        F.min("nrm").alias("min_norm"),
        F.expr(
            "MAX(CASE WHEN r = (50 * cnt + 99) DIV 100 THEN nrm END)"
        ).alias("p50_norm"),
        F.max("nrm").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (bounded peeling) over the kNN graph
# ---------------------------------------------------------------------------

KCORE_K = 3        # minimum within-subgraph degree to stay in the core
KCORE_ROUNDS = 3   # fixed peeling rounds (see doc for the fixpoint note)


def _kcore_round_sql(i: int) -> str:
    """One unrolled peeling round for the DuckDB oracle: survivors of
    round ``i`` are nodes whose degree in the previous edge set meets
    KCORE_K; the edge set contracts to survivor-survivor edges."""
    prev_e = "und" if i == 0 else f"e{i}"
    # AS MATERIALIZED: each round references the previous edge set three
    # times; DuckDB would otherwise inline the CTE chain and re-evaluate
    # the expensive kNN candidate join ~3^rounds times
    return f"""
    d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM {prev_e} UNION ALL SELECT b AS node FROM {prev_e}
      ) ends GROUP BY node
    ),
    s{i + 1} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {KCORE_K}),
    e{i + 1} AS MATERIALIZED (
      SELECT pe.a, pe.b FROM {prev_e} pe
      JOIN s{i + 1} x ON x.node = pe.a
      JOIN s{i + 1} y ON y.node = pe.b
    )"""


def edge_degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of an undirected ``(a, b)`` edge DataFrame (each
    edge stored once, a < b) → ``(node, deg)``."""
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def kcore_peel(edges: DataFrame, k: int, rounds: int):
    """``rounds`` peeling rounds of k-core over an undirected ``(a, b)``
    edge DataFrame: survivors of each round are nodes whose degree in the
    current edge set meets ``k``; edges contract to survivor-survivor
    pairs. Returns ``(final_edges, survivors)``. Each round references
    the edge set THREE ways (two degree legs + the semi-join source), so
    carrying lineage across rounds would re-execute the whole upstream
    graph construction per round — localCheckpoint truncates the plan at
    every round boundary, the connected_components discipline
    (operators/dedup.py)."""
    edges = edges.localCheckpoint()
    survivors = None
    for _ in range(rounds):
        survivors = (
            edge_degrees(edges)
            .filter(F.col("deg") >= k)
            .select("node")
            .localCheckpoint()
        )
        edges = (
            edges.join(
                survivors.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(survivors.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    return edges, survivors


@register(
    "graph_kcore_knn",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    {",".join(_kcore_round_sql(i) for i in range(KCORE_ROUNDS))},
    dfin AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM e{KCORE_ROUNDS}
        UNION ALL SELECT b AS node FROM e{KCORE_ROUNDS}
      ) ends GROUP BY node
    )
    SELECT emb.vec_id,
           CAST(COALESCE(d0.deg, 0) AS BIGINT) AS degree0,
           CAST(COALESCE(dfin.deg, 0) AS BIGINT) AS core_degree,
           s{KCORE_ROUNDS}.node IS NOT NULL AS in_core
    FROM embeddings emb
    LEFT JOIN d0 ON d0.node = emb.vec_id
    LEFT JOIN dfin ON dfin.node = emb.vec_id
    LEFT JOIN s{KCORE_ROUNDS} ON s{KCORE_ROUNDS}.node = emb.vec_id
    """,
    doc=f"k-core decomposition (k={KCORE_K}, {KCORE_ROUNDS} fixed peeling "
        "rounds) over the approximate kNN graph — the graph-curation gate "
        "that keeps documents embedded in dense semantic neighborhoods "
        "and sheds peripheral/noise nodes (low-degree after their "
        "neighbors peel away). Each round is one map-side-combinable "
        "degree count plus two int-key semi-joins contracting the edge "
        "set; state between rounds is the surviving edge list only. "
        "Rounds are FIXED (both engines unroll the same "
        f"{KCORE_ROUNDS}) rather than run to fixpoint — on kNN graphs "
        f"degree is bounded by 2*GRAPH_K={2 * GRAPH_K} so peeling "
        "stabilizes in a handful of rounds; a production fixpoint loop "
        "adds the connected_components-style signature check "
        "(operators/dedup.py) with the same per-round plan-truncation "
        "discipline.",
)
def graph_kcore_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    und = (
        emb_knn_graph(spark, sf_dir)
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .dropDuplicates(["a", "b"])
        .persist()
    )
    deg0 = edge_degrees(und).persist()
    edges, survivors = kcore_peel(und, KCORE_K, KCORE_ROUNDS)
    dfin = edge_degrees(edges)
    return (
        emb.select("vec_id")
        .join(deg0.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .withColumnRenamed("deg", "degree0_raw")
        .join(
            dfin.withColumnRenamed("node", "vec_id").withColumnRenamed(
                "deg", "core_deg_raw"
            ),
            "vec_id",
            "left",
        )
        .join(
            survivors.select(F.col("node").alias("vec_id"), F.lit(True).alias("surv")),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce(F.col("degree0_raw"), F.lit(0)).cast("bigint").alias("degree0"),
            F.coalesce(F.col("core_deg_raw"), F.lit(0)).cast("bigint").alias("core_degree"),
            F.coalesce(F.col("surv"), F.lit(False)).alias("in_core"),
        )
    )


# ---------------------------------------------------------------------------
# k-truss (edge-support peeling) over the kNN graph
# ---------------------------------------------------------------------------

KTRUSS_K = 3        # every surviving edge sits in >= k-2 triangles
KTRUSS_ROUNDS = 2   # fixed peeling rounds (same bounded-round contract as k-core)


def _truss_round_sql(i: int) -> str:
    """One unrolled support-peeling round: count per-edge triangle support
    in the current edge set, keep edges meeting KTRUSS_K - 2. Triangles
    use the ordered-wedge join (x<y<z), so each contributes exactly its
    three canonical edges."""
    prev_e = "und" if i == 0 else f"e{i}"
    return f"""
    tri{i} AS MATERIALIZED (
      SELECT w1.a AS x, w1.b AS y, w2.b AS z
      FROM {prev_e} w1
      JOIN {prev_e} w2 ON w2.a = w1.b
      JOIN {prev_e} w3 ON w3.a = w1.a AND w3.b = w2.b
    ),
    sup{i} AS MATERIALIZED (
      SELECT a, b, COUNT(*) AS cnt FROM (
        SELECT x AS a, y AS b FROM tri{i}
        UNION ALL SELECT y, z FROM tri{i}
        UNION ALL SELECT x, z FROM tri{i}
      ) corners GROUP BY a, b
    ),
    e{i + 1} AS MATERIALIZED (
      SELECT pe.a, pe.b FROM {prev_e} pe
      JOIN sup{i} s ON s.a = pe.a AND s.b = pe.b
      WHERE s.cnt >= {KTRUSS_K - 2}
    )"""


def edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support of an undirected ``(a, b)`` edge
    DataFrame (a < b): the ordered-wedge join materializes every triangle
    x<y<z exactly once, each contributing its three canonical edges →
    ``(a, b, cnt)``; zero-support edges are absent."""
    w1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    w3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = w1.join(w2, "y").join(w3, ["x", "z"])
    corners = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    return corners.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt"))


def ktruss_peel(
    edges: DataFrame, k: int, rounds: int, *, support0: DataFrame = None
) -> DataFrame:
    """``rounds`` support-peeling rounds of k-truss over an undirected
    ``(a, b)`` edge DataFrame: each round keeps edges participating in at
    least ``k - 2`` triangles among surviving edges. ``support0`` lets
    the caller reuse a precomputed first-round support. Round boundaries
    localCheckpoint (see :func:`kcore_peel`)."""
    for r in range(rounds):
        sup = (
            support0
            if (r == 0 and support0 is not None)
            else edge_support(edges)
        )
        edges = (
            edges.join(
                sup.filter(F.col("cnt") >= k - 2), ["a", "b"], "left_semi"
            ).localCheckpoint()
        )
    return edges


@register(
    "graph_ktruss_knn",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    {",".join(_truss_round_sql(i) for i in range(KTRUSS_ROUNDS))}
    SELECT und.a AS a_id, und.b AS b_id,
           CAST(COALESCE(sup0.cnt, 0) AS BIGINT) AS support0,
           e{KTRUSS_ROUNDS}.a IS NOT NULL AS in_truss
    FROM und
    LEFT JOIN sup0 ON sup0.a = und.a AND sup0.b = und.b
    LEFT JOIN e{KTRUSS_ROUNDS}
      ON e{KTRUSS_ROUNDS}.a = und.a AND e{KTRUSS_ROUNDS}.b = und.b
    """,
    doc=f"k-truss (k={KTRUSS_K}, {KTRUSS_ROUNDS} fixed peeling rounds) "
        "over the approximate kNN graph: an edge survives only while it "
        "participates in enough triangles among surviving edges — the "
        "EDGE-level cohesion filter (k-core's node-level complement) that "
        "strips bridge edges between semantic clusters while keeping "
        "triangle-dense cluster interiors; what remains is the "
        "high-precision edge set for cluster-then-dedup curation. Each "
        "round is one ordered-wedge self-join (degree bounded by "
        f"2*GRAPH_K={2 * GRAPH_K}, so wedges are O(|V|*4k^2) with no "
        "power-law hotspot) plus a map-side-combinable per-edge count; "
        "round boundaries localCheckpoint like connected_components, and "
        "the oracle unrolls the same rounds with MATERIALIZED CTEs.",
)
def graph_ktruss_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (
        emb_knn_graph(spark, sf_dir)
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    sup0 = edge_support(und).persist()
    edges = ktruss_peel(und, KTRUSS_K, KTRUSS_ROUNDS, support0=sup0)
    return (
        und.join(sup0, ["a", "b"], "left")
        .join(edges.withColumn("surv", F.lit(True)), ["a", "b"], "left")
        .select(
            F.col("a").alias("a_id"),
            F.col("b").alias("b_id"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("support0"),
            F.coalesce(F.col("surv"), F.lit(False)).alias("in_truss"),
        )
    )


# ---------------------------------------------------------------------------
# diagonal-Mahalanobis outliers over int8 embedding codes
# ---------------------------------------------------------------------------

MAHAL_TOP_K = 20


@register(
    "emb_outlier_mahalanobis",
    # per-dim mean/var come from EXACT integer moments of the int8 codes
    # (n*ss - s*s stays in bigint at test scale; a 100 TB run lifts the
    # moment sums to DECIMAL(38,0) — same expressions); the per-row
    # distance folds dims in index order on both engines, then ranking is
    # a distributed top-k, never a global window
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QVEC_DUCK} AS qvec FROM embeddings
    ),
    pos AS (
      SELECT vec_id, qvec, unnest(range(1, len(qvec) + 1)) AS dim FROM q
    ),
    stats AS (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qvec[dim]) AS BIGINT) AS s,
             CAST(SUM(CAST(qvec[dim] AS BIGINT) * qvec[dim]) AS BIGINT) AS ss
      FROM pos GROUP BY dim
    ),
    vecs AS (
      SELECT list(CAST(s AS DOUBLE) / n ORDER BY dim) AS means,
             list(CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * n)
                  ORDER BY dim) AS vars
      FROM stats
    ),
    dist AS (
      SELECT q.vec_id,
             round(list_sum(list_transform(range(1, len(qvec) + 1),
               d -> CASE WHEN vecs.vars[d] > 0
                         THEN (qvec[d] - vecs.means[d]) * (qvec[d] - vecs.means[d])
                              / vecs.vars[d]
                         ELSE 0.0 END)), 6) AS mahalanobis
      FROM q CROSS JOIN vecs
    )
    SELECT vec_id, mahalanobis,
           CAST(ROW_NUMBER() OVER (ORDER BY mahalanobis DESC, vec_id) AS INT)
             AS rk
    FROM dist
    ORDER BY mahalanobis DESC, vec_id LIMIT {MAHAL_TOP_K}
    """,
    doc=f"Top-{MAHAL_TOP_K} embedding outliers by diagonal Mahalanobis "
        "distance: per-dimension mean/variance from exact integer moments "
        "of the int8 codes (the emb_dim_stats trick — no float-summation "
        "order sensitivity), broadcast as one 64-slot array row, then "
        "each vector folds (q_d - mean_d)^2 / var_d in fixed index order "
        "— the distributional-outlier gate that catches corrupt or "
        "out-of-family vectors where plain L2-to-centroid misses "
        "variance-scaled deviations. Scale shape: one moment aggregate "
        "(64 groups, map-side partials), one broadcast of a 1-row stats "
        "array, and a distributed TakeOrdered top-k — no global window, "
        "no shuffle of the full distance set.",
)
def emb_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.select("vec_id", F.expr(_QVEC_SPARK).alias("qvec"))
    pos = q.select(
        "vec_id", F.posexplode("qvec").alias("pos", "qv")
    ).select((F.col("pos") + 1).alias("dim"), "qv")
    stats = pos.groupBy("dim").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(qv) AS BIGINT)").alias("s"),
        F.expr("CAST(SUM(CAST(qv AS BIGINT) * qv) AS BIGINT)").alias("ss"),
    )
    # one row holding the per-dim arrays; map_from_entries keeps the
    # collect order irrelevant, the sequence lookup imposes index order
    vecs = stats.agg(
        F.expr(
            "map_from_entries(collect_list(struct(dim, "
            "CAST(s AS DOUBLE) / n))) AS means_map"
        ),
        F.expr(
            "map_from_entries(collect_list(struct(dim, "
            "CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * n)))) "
            "AS vars_map"
        ),
    )
    dist = q.crossJoin(F.broadcast(vecs)).select(
        "vec_id",
        F.expr(
            "round(aggregate(sequence(1, size(qvec)), CAST(0.0 AS DOUBLE), "
            "(acc, d) -> acc + CASE WHEN vars_map[d] > 0 THEN "
            "(element_at(qvec, d) - means_map[d]) * "
            "(element_at(qvec, d) - means_map[d]) / vars_map[d] "
            "ELSE 0.0 END), 6)"
        ).alias("mahalanobis"),
    )
    top = dist.orderBy(F.desc("mahalanobis"), F.asc("vec_id")).limit(MAHAL_TOP_K)
    w = Window.orderBy(F.desc("mahalanobis"), F.asc("vec_id"))
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# IVF inverted-list balance audit (index-health monitor)
# ---------------------------------------------------------------------------

@register(
    "sim_ivf_cell_balance",
    # same coarse-quantizer assignment CTEs as sim_ann_ivf_topk; the audit
    # is per-cell list length + share + uniform deviation in exact scaled
    # integers (cells*1000*n - 1000*total), zero-length cells included
    oracle=f"""
    WITH cent AS MATERIALIZED (
      SELECT label, i - 1 AS dim,
             round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY label, dim
    ),
    cent_norm AS (
      SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label
    ),
    vec_dim AS ({_DIMS_DUCK}),
    vec_norm AS (
      SELECT vec_id, sqrt(sum(x * x)) AS vn FROM vec_dim GROUP BY vec_id
    ),
    scores AS (
      SELECT v.vec_id, c.label,
             round(sum(v.x * c.c) / (vn.vn * cn.cn), 6) AS cellcos
      FROM vec_dim v JOIN cent c USING (dim)
      JOIN vec_norm vn ON vn.vec_id = v.vec_id
      JOIN cent_norm cn ON cn.label = c.label
      GROUP BY v.vec_id, c.label, vn.vn, cn.cn
    ),
    assign AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cellcos DESC, label) AS crk
      FROM scores
    ),
    cells AS (SELECT vec_id, label FROM assign WHERE crk = 1),
    per AS (
      SELECT cn.label,
             CAST(COUNT(cells.vec_id) AS BIGINT) AS n_vectors
      FROM cent_norm cn LEFT JOIN cells ON cells.label = cn.label
      GROUP BY cn.label
    ),
    tot AS (
      SELECT SUM(n_vectors) AS t, COUNT(*) AS n_cells FROM per
    )
    SELECT per.label, per.n_vectors,
           round(CAST(per.n_vectors AS DOUBLE) / tot.t, 6) AS cell_share,
           CAST(tot.n_cells * 1000 * per.n_vectors - 1000 * tot.t AS BIGINT)
             AS dev_permille_scaled
    FROM per CROSS JOIN tot
    """,
    doc="IVF inverted-list balance audit: the length, corpus share, and "
        "exact scaled uniform-deviation of every coarse cell's posting "
        "list (empty cells included) — the index-health monitor that "
        "catches the IVF failure mode where a few hot cells absorb the "
        "corpus and probing them degenerates toward a full scan (query "
        "cost is the sum of probed list lengths, so balance IS the "
        "latency model). Same assignment expressions as sim_ann_ivf_topk "
        "(no drift); one broadcast of the tiny centroid set, one "
        "assignment window keyed by vec_id, one |cells|-row aggregate.",
)
def sim_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
        .groupBy("label")
        .agg(F.expr(
            "transform(sort_array(collect_list(struct(dim, c))), s -> s.c)"
        ).alias("centroid"))
        .select("label", "centroid",
                F.expr(_NORM.format(col="centroid")).alias("c_norm"))
    )
    vecs = emb.select(
        "vec_id", "embedding",
        F.expr(_NORM.format(col="embedding")).alias("v_norm"),
    )
    scores = vecs.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label",
        F.expr(f"round({_DOT_VC} / (v_norm * c_norm), 6)").alias("cellcos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cellcos"), F.asc("label"))
    cells = (
        scores.withColumn("crk", F.row_number().over(w))
        .filter(F.col("crk") == 1)
        .select("vec_id", "label")
    )
    per = (
        cent.select("label")
        .join(cells, "label", "left")
        .groupBy("label")
        .agg(F.expr("CAST(COUNT(vec_id) AS BIGINT)").alias("n_vectors"))
    )
    tot = per.agg(
        F.sum("n_vectors").alias("t"), F.count(F.lit(1)).alias("n_cells")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "label",
        "n_vectors",
        F.expr("round(CAST(n_vectors AS DOUBLE) / t, 6)").alias("cell_share"),
        F.expr(
            "CAST(n_cells * 1000 * n_vectors - 1000 * t AS BIGINT)"
        ).alias("dev_permille_scaled"),
    )


# ---------------------------------------------------------------------------
# multi-probe LSH: probe perturbed buckets instead of adding hash tables
# ---------------------------------------------------------------------------

MP_PERTURB = (0, 1, 2)  # probe the home bucket + bit-0 and bit-1 flips

_MP_ORACLE = f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    qprobe AS (
      SELECT vec_id, band_id, xor(band_val, pr) AS band_val
      FROM bands CROSS JOIN (
        SELECT unnest([{", ".join(str(p) for p in MP_PERTURB)}]) AS pr
      ) ps
      WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
      FROM qprobe q JOIN bands c
        ON q.band_id = c.band_id AND q.band_val = c.band_val
      WHERE c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.q_id, cand.neighbor_id, round({COS_DUCK}, 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.q_id
      JOIN embeddings b ON b.vec_id = cand.neighbor_id
    )
    SELECT q_id, neighbor_id, cosine, rk FROM (
      SELECT q_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
"""


@register(
    "sim_ann_lsh_multiprobe",
    oracle=_MP_ORACLE,
    doc=f"Multi-probe LSH (Lv et al., VLDB'07): each query probes its home "
        f"band bucket PLUS {len(MP_PERTURB) - 1} single-bit perturbations "
        "of the band value — the buckets a near neighbor most likely fell "
        "into when one hyperplane voted the other way. Recovers the "
        "recall extra hash tables would buy WITHOUT growing the indexed "
        "side: the corpus stays at one bucket per band (same storage and "
        "same shuffle as sim_ann_lsh_topk), only the tiny query side "
        "fans out x3. Measured at sf0.01: mean recall@5 doubles vs the "
        "single-probe index (0.36 -> 0.72, no per-query regressions — "
        "see sim_mp_recall_eval vs sim_ann_recall_eval). Same "
        "md5-deterministic planes, so the oracle replays candidate "
        "generation exactly.",
    bench=True,
)
def sim_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    sig = emb.select(
        "vec_id", "embedding", F.expr(_signature_expr("embedding")).alias("sig")
    )
    bands = sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(
                        f"(sig >> {b * _BITS}) & {(1 << _BITS) - 1}"
                    ).alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "embedding", "bk.band_id", "bk.band_val")
    qprobe = (
        bands.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("a_emb"),
            F.expr(_NORM.format(col="embedding")).alias("a_norm"),
            "band_id",
            F.explode(
                F.array(*[F.expr(f"band_val ^ {p}") for p in MP_PERTURB])
            ).alias("band_val"),
        )
    )
    c = bands.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
        "band_id",
        "band_val",
    )
    candidates = (
        F.broadcast(qprobe)
        .join(c, ["band_id", "band_val"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "a_emb", "a_norm", "neighbor_id", "b_emb", "b_norm")
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    scored = candidates.select(
        "q_id",
        "neighbor_id",
        F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "neighbor_id", "cosine", "rk")
    )


@register(
    "sim_mp_recall_eval",
    oracle=f"""
    WITH {_EXACT_TOPK_CTE},
    mp_topk AS (
      SELECT q_id, neighbor_id FROM ({_MP_ORACLE}) mp
    )
    SELECT e.q_id,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN mp_topk a
      ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    """,
    doc=f"Recall@{TOP_K} of multi-probe LSH against exact brute force — "
        "completes the per-family evaluation set (LSH, IVF, PQ, "
        "truncation, multi-probe) so the probe-count/recall trade can be "
        "read directly from the gate output next to sim_ann_recall_eval's "
        "single-probe number.",
)
def sim_mp_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_knn_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    mp = sim_ann_lsh_multiprobe(spark, sf_dir).select(
        F.col("q_id").alias("a_q"), F.col("neighbor_id").alias("a_n"),
        F.lit(1).alias("hit"),
    )
    return (
        exact.join(
            F.broadcast(mp),
            (F.col("q_id") == F.col("a_q"))
            & (F.col("neighbor_id") == F.col("a_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.expr(f"CAST({TOP_K} AS BIGINT)").alias("k"),
            F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_hit"),
            F.expr(f"CAST(COUNT(hit) AS DOUBLE) / {TOP_K}").alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# binary signature search: Hamming top-k over the 16-bit sketches
# ---------------------------------------------------------------------------

HAM_MAX = 6  # candidate radius: prune before the per-query rank


@register(
    "sim_hamming_topk",
    # pure integer pipeline end to end: signatures, xor, popcount, rank —
    # nothing floats, so the gate is exact by construction
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    qs AS (SELECT vec_id AS q_id, sig AS q_sig FROM sig
           WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT qs.q_id, s.vec_id AS neighbor_id,
             bit_count(xor(qs.q_sig, s.sig)) AS hamming
      FROM qs JOIN sig s ON s.vec_id <> qs.q_id
      WHERE bit_count(xor(qs.q_sig, s.sig)) <= {HAM_MAX}
    )
    SELECT q_id, neighbor_id, CAST(hamming AS INT) AS hamming, rk FROM (
      SELECT q_id, neighbor_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY hamming, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
    """,
    doc=f"Binary-signature search: top-{TOP_K} neighbors by Hamming "
        "distance over the 16-bit hyperplane sketches alone — the "
        "binary-quantization retrieval mode where the index is 2 BYTES "
        "per vector and similarity is xor+popcount (no float math "
        "anywhere, so the gate is exact by construction; the standard "
        "first stage before an exact re-rank of survivors). Scale shape: "
        "the query sketches broadcast, the corpus is one narrow integer "
        f"scan, and the radius prune (hamming <= {HAM_MAX}) bounds what "
        "reaches the per-query rank — the shuffle carries survivors, not "
        "the corpus.",
)
def sim_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    sig = emb.select(
        "vec_id", F.expr(_signature_expr("embedding")).alias("sig")
    )
    qs = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("sig").alias("q_sig")
    )
    scored = (
        sig.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr("bit_count(q_sig ^ sig)").alias("hamming"),
        )
        .filter(F.col("hamming") <= HAM_MAX)
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "q_id", "neighbor_id",
            F.col("hamming").cast("int").alias("hamming"), "rk",
        )
    )


# ---------------------------------------------------------------------------
# kNN-graph symmetry audit (mutual-neighbor share per rank)
# ---------------------------------------------------------------------------

@register(
    "graph_knn_symmetry",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    edges AS (SELECT src_id, dst_id, rk FROM knn)
    SELECT CAST(e.rk AS INT) AS rk,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(r.src_id) AS BIGINT) AS n_mutual,
           round(CAST(COUNT(r.src_id) AS DOUBLE) / COUNT(*), 6)
             AS mutual_share
    FROM edges e
    LEFT JOIN edges r
      ON r.src_id = e.dst_id AND r.dst_id = e.src_id
    GROUP BY e.rk
    """,
    doc="kNN-graph symmetry audit: per neighbor rank, the share of edges "
        "whose reverse edge also exists — mutual-kNN edges are the "
        "high-precision subset (hubness and boundary noise show up as "
        "one-directional edges, and mutual-kNN graphs are the standard "
        "cleanup before graph clustering; a LOW mutual share at rank 1 "
        "is the red flag that the embedding space has asymmetric "
        "neighborhoods). One self-join of the k*|V|-row edge list on the "
        "reversed int-key pair, then a 3-row aggregate — the edge list "
        "is k-bounded per node, so the join has no hotspot.",
)
def graph_knn_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = emb_knn_graph(spark, sf_dir).select("src_id", "dst_id", "rk").persist()
    rev = edges.select(
        F.col("src_id").alias("r_dst"), F.col("dst_id").alias("r_src"),
        F.lit(1).alias("has_rev"),
    ).drop_duplicates(["r_dst", "r_src"])
    return (
        edges.join(
            rev,
            (F.col("src_id") == F.col("r_src"))
            & (F.col("dst_id") == F.col("r_dst")),
            "left",
        )
        .groupBy(F.col("rk").cast("int").alias("rk"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_edges"),
            F.expr("CAST(COUNT(has_rev) AS BIGINT)").alias("n_mutual"),
            F.expr(
                "round(CAST(COUNT(has_rev) AS DOUBLE) / COUNT(*), 6)"
            ).alias("mutual_share"),
        )
    )


# ---------------------------------------------------------------------------
# LSH bucket-occupancy audit (the quadratic-pair-volume early warning)
# ---------------------------------------------------------------------------

#: sliding-window pair count for a bucket of c members at window W: the
#: member at rank i pairs with min(i, W) predecessors, so
#: Σ min(i, W) = C(c, 2) for c ≤ W+1, else W(W+1)/2 + (c-1-W)·W.
#: Pure integer arithmetic → identical both engines.
def _window_pairs_expr(c: str, w: int) -> str:
    return (
        f"(CASE WHEN {c} <= {w + 1} THEN ({c} * ({c} - 1)) / 2"
        f" ELSE {w * (w + 1) // 2} + ({c} - 1 - {w}) * {w} END)"
    )


@register(
    "emb_lsh_bucket_audit",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_signature_duck('embedding')} AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    occ AS (
      SELECT band_id, band_val, CAST(COUNT(*) AS BIGINT) AS c
      FROM bands GROUP BY band_id, band_val
    )
    SELECT band_id,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(c) AS BIGINT) AS n_items,
           CAST(MAX(c) AS BIGINT) AS max_occupancy,
           CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS uncapped_pairs,
           CAST(SUM({_window_pairs_expr('c', GRAPH_CAND_WINDOW)}) AS BIGINT)
             AS windowed_pairs
    FROM occ GROUP BY band_id
    """,
    doc=f"LSH bucket-occupancy audit: per band, the bucket count, max "
        "occupancy, the UNCAPPED candidate-pair volume Σ C(c,2), and the "
        f"pair volume under the {GRAPH_CAND_WINDOW}-rank sorted-"
        "neighborhood sliding window the kNN graph actually uses. This is "
        "the pre-flight check that catches quadratic blowup BEFORE the "
        "pair generation runs: a fixed-key-space signature makes "
        "uncapped_pairs grow as n² while windowed_pairs stays Θ(n·W) — "
        "the r4 scale curve measured exactly that (86× time for 10× data "
        "uncapped, healthy capped). Cost: one shuffle on (band_id, band_val) for the "
        "occupancy count, then a per-band rollup — run it before every "
        "large ANN/dedup campaign and resize the signature when "
        "max_occupancy drifts above a few× the window.",
)
def emb_lsh_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    sig = emb.select(
        "vec_id", F.expr(_signature_expr("embedding")).alias("sig")
    )
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(
                        f"(sig >> {b * _BITS}) & {(1 << _BITS) - 1}"
                    ).alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "bk.band_id", "bk.band_val")
    occ = bands.groupBy("band_id", "band_val").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    )
    return occ.groupBy("band_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_buckets"),
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_items"),
        F.expr("CAST(MAX(c) AS BIGINT)").alias("max_occupancy"),
        F.expr("CAST(SUM(c * (c - 1) / 2) AS BIGINT)").alias("uncapped_pairs"),
        F.expr(
            f"CAST(SUM({_window_pairs_expr('c', GRAPH_CAND_WINDOW)}) AS BIGINT)"
        ).alias("windowed_pairs"),
    )


# ---------------------------------------------------------------------------
# int4 scalar-quantization recall (the 8x-compression end of the axis)
# ---------------------------------------------------------------------------

#: per-vector symmetric int4 quantization: components scaled to [-7, 7]
#: by the vector's max-abs (the int8 path's formula at 1/16 the levels)
_Q4_SPARK = (
    "transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN array_max(transform({col}, y -> abs(CAST(y AS DOUBLE)))) = 0 "
    "THEN CAST(0 AS DOUBLE) ELSE CAST(7 AS DOUBLE) / "
    "array_max(transform({col}, y -> abs(CAST(y AS DOUBLE)))) END) + 0.5) AS BIGINT))"
)
_Q4_DUCK = (
    "list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * "
    "(CASE WHEN list_max(list_transform({col}, y -> abs(CAST(y AS DOUBLE)))) = 0 "
    "THEN CAST(0 AS DOUBLE) ELSE CAST(7 AS DOUBLE) / "
    "list_max(list_transform({col}, y -> abs(CAST(y AS DOUBLE)))) END) + 0.5) AS BIGINT))"
)

_INT4_TOPK_ORACLE = f"""
      SELECT q_id, neighbor_id FROM (
        SELECT q.q_id, c.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) DESC,
                 c.neighbor_id) AS rk
        FROM (
          SELECT vec_id AS q_id, {_Q4_DUCK.format(col="embedding")} AS qv
          FROM embeddings WHERE vec_id < {N_QUERIES}
        ) q JOIN (
          SELECT vec_id AS neighbor_id,
                 {_Q4_DUCK.format(col="embedding")} AS cv
          FROM embeddings
        ) c ON c.neighbor_id <> q.q_id
      ) t WHERE rk <= {TOP_K}
"""


@register(
    "sim_int4_recall_eval",
    oracle=f"""
    WITH {_EXACT_TOPK_CTE},
    int4_topk AS ({_INT4_TOPK_ORACLE})
    SELECT e.q_id,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN int4_topk a
      ON a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.q_id
    """,
    doc=f"Recall@{TOP_K} of int4 scalar quantization (components in "
        "[-7, 7], 8x smaller than float32, exact integer dot ranking) "
        "against exact float cosine — the aggressive-compression end of "
        "the measured recall/cost axis next to int8 (sim_knn_quantized), "
        "PQ, IVF, LSH, multi-probe, and truncation. The dot products are "
        "exact integers, so the eval is hash-stable with no float-order "
        "discipline. Broadcast query set, zero shuffle on the corpus "
        "scan, per-query top-k window — same plan shape as the int8 path.",
)
def sim_int4_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("a_q"),
        F.expr(_Q4_SPARK.format(col="embedding")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("a_n"),
        F.expr(_Q4_SPARK.format(col="embedding")).alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("a_n") != F.col("a_q"))
        .select(
            "a_q", "a_n",
            F.expr(
                "CAST(aggregate(zip_with(qv, cv, (x, y) -> x * y), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
            ).alias("dot_q"),
        )
    )
    wq = Window.partitionBy("a_q").orderBy(F.desc("dot_q"), F.asc("a_n"))
    int4 = (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= TOP_K)
        .select("a_q", "a_n", F.lit(1).alias("hit"))
    )
    exact = sim_knn_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    return (
        exact.join(
            F.broadcast(int4),
            (F.col("q_id") == F.col("a_q"))
            & (F.col("neighbor_id") == F.col("a_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.expr(f"CAST({TOP_K} AS BIGINT)").alias("k"),
            F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_hit"),
            F.expr(f"CAST(COUNT(hit) AS DOUBLE) / {TOP_K}").alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# label propagation over the kNN graph (semi-supervised label spread)
# ---------------------------------------------------------------------------

LP_ROUNDS = 2

#: seed rule: nodes with vec_id % 3 == 0 hide their label (the
#: "unlabeled pool"); the rest seed the propagation — a deterministic
#: stand-in for the usual few-labeled/many-unlabeled curation setup
_LP_UNLABELED = "vec_id % 3 = 0"


@register(
    "graph_label_propagation",
    # votes are integer counts and the per-node winner is picked by a
    # deterministic (count DESC, label ASC) window — no floats anywhere
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    edges AS (SELECT src_id, dst_id FROM knn),
    seeds AS (
      SELECT vec_id,
             CASE WHEN {_LP_UNLABELED} THEN NULL ELSE label END AS lab
      FROM embeddings
    ),
    v1 AS (
      SELECT e.src_id AS vec_id, s.lab, COUNT(*) AS c
      FROM edges e JOIN seeds s ON s.vec_id = e.dst_id
      WHERE s.lab IS NOT NULL
      GROUP BY e.src_id, s.lab
    ),
    p1 AS (
      SELECT vec_id, lab FROM (
        SELECT vec_id, lab,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY c DESC, lab) AS rn
        FROM v1
      ) t WHERE rn = 1
    ),
    l1 AS (
      SELECT s.vec_id,
             COALESCE(s.lab, p1.lab) AS lab,
             CASE WHEN s.lab IS NOT NULL THEN 0
                  WHEN p1.lab IS NOT NULL THEN 1 END AS rnd
      FROM seeds s LEFT JOIN p1 ON p1.vec_id = s.vec_id
    ),
    v2 AS (
      SELECT e.src_id AS vec_id, l.lab, COUNT(*) AS c
      FROM edges e JOIN l1 l ON l.vec_id = e.dst_id
      WHERE l.lab IS NOT NULL
      GROUP BY e.src_id, l.lab
    ),
    p2 AS (
      SELECT vec_id, lab FROM (
        SELECT vec_id, lab,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY c DESC, lab) AS rn
        FROM v2
      ) t WHERE rn = 1
    )
    SELECT l1.vec_id,
           CAST(COALESCE(l1.lab, p2.lab) AS INT) AS label,
           CAST(CASE WHEN l1.rnd IS NOT NULL THEN l1.rnd
                     WHEN p2.lab IS NOT NULL THEN 2 END AS INT)
             AS round_assigned
    FROM l1 LEFT JOIN p2 ON p2.vec_id = l1.vec_id
    """,
    doc=f"Semi-supervised label propagation over the approximate kNN "
        f"graph ({LP_ROUNDS} fixed rounds): a third of the nodes hide "
        "their label, then each unlabeled node takes the majority label "
        "of its already-labeled neighbors (ties break to the smallest "
        "label), round by round — the cheap label-spreading pass that "
        "extends a small seed of human/classifier labels across a "
        "semantic neighborhood graph before training a data-curation "
        "filter. round_assigned records provenance (0 = seed, 1..N = "
        "propagation round, NULL = unreached). Each round is ONE "
        "map-side-combined vote shuffle on the destination node plus a "
        "deterministic window pick — integer counts only, no float "
        "order sensitivity; state per round is one label per node.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    edges = emb_knn_graph(spark, sf_dir).select("src_id", "dst_id").persist()
    seeds = emb.select(
        "vec_id",
        F.expr(
            f"CASE WHEN {_LP_UNLABELED} THEN NULL ELSE label END"
        ).alias("lab"),
    )
    cur = seeds.withColumn(
        "rnd", F.expr("CASE WHEN lab IS NOT NULL THEN 0 END")
    )
    for r in range(1, LP_ROUNDS + 1):
        votes = (
            edges.join(
                cur.select(F.col("vec_id").alias("dst_id"), "lab"),
                "dst_id",
            )
            .filter(F.col("lab").isNotNull())
            .groupBy(F.col("src_id").alias("vec_id"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("lab"))
        picked = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("lab").alias("new_lab"))
        )
        cur = (
            cur.join(picked, "vec_id", "left")
            .select(
                "vec_id",
                F.expr("COALESCE(lab, new_lab)").alias("lab"),
                F.expr(
                    f"CASE WHEN rnd IS NOT NULL THEN rnd "
                    f"WHEN new_lab IS NOT NULL THEN {r} END"
                ).alias("rnd"),
            )
        )
    return cur.select(
        "vec_id",
        F.col("lab").cast("int").alias("label"),
        F.col("rnd").cast("int").alias("round_assigned"),
    )


# ---------------------------------------------------------------------------
# beam search over the kNN graph (the HNSW-layer-0 query-time walk)
# ---------------------------------------------------------------------------

BEAM_QUERIES = 10   # smallest vec_ids serve as the query set
BEAM_WIDTH = 4      # frontier kept per query per round
BEAM_TOPK = 3       # final neighbors returned


@register(
    "graph_beam_search",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    gedges AS (SELECT src_id, dst_id FROM knn),
    deg AS (SELECT src_id, COUNT(*) AS c FROM gedges GROUP BY src_id),
    entry AS (
      SELECT src_id AS nid FROM deg ORDER BY c DESC, src_id LIMIT 1
    ),
    q AS (
      SELECT vec_id AS q_id FROM embeddings ORDER BY vec_id
      LIMIT {BEAM_QUERIES}
    ),
    c1 AS (
      SELECT nid FROM entry
      UNION
      SELECT e.dst_id FROM gedges e JOIN entry ON entry.nid = e.src_id
    ),
    s1 AS (
      SELECT q.q_id, c1.nid, round({COS_DUCK}, 6) AS cosine
      FROM q CROSS JOIN c1
      JOIN embeddings a ON a.vec_id = q.q_id
      JOIN embeddings b ON b.vec_id = c1.nid
    ),
    f1 AS (
      SELECT q_id, nid, cosine FROM (
        SELECT q_id, nid, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, nid) AS rk
        FROM s1
      ) t WHERE rk <= {BEAM_WIDTH}
    ),
    c2 AS (
      SELECT q_id, nid FROM f1
      UNION
      SELECT f1.q_id, e.dst_id FROM f1 JOIN gedges e ON e.src_id = f1.nid
    ),
    s2 AS (
      SELECT c2.q_id, c2.nid, round({COS_DUCK}, 6) AS cosine
      FROM c2
      JOIN embeddings a ON a.vec_id = c2.q_id
      JOIN embeddings b ON b.vec_id = c2.nid
    )
    SELECT q_id, nid AS neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
      SELECT q_id, nid, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, nid) AS rk
      FROM s2
    ) t WHERE rk <= {BEAM_TOPK}
    """,
    doc=f"Graph beam search (the HNSW-layer-0 query-time walk, "
        f"deterministic): from a max-degree entry node, {BEAM_QUERIES} "
        f"queries expand the kNN graph for 2 rounds keeping a "
        f"{BEAM_WIDTH}-wide frontier by exact cosine, then return each "
        f"query's top-{BEAM_TOPK} of the final candidate set — the "
        "query-time counterpart of the build-time emb_knn_graph, and "
        "the access pattern an ANN serving layer runs per request. "
        "Every hop is an equi-join against the edge list (frontier × "
        "degree candidates, never all-pairs), scoring joins are "
        "id-keyed; rounds are unrolled so the whole walk is ONE "
        "Catalyst plan with no driver iteration.",
)
def graph_beam_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    edges = emb_knn_graph(spark, sf_dir).select("src_id", "dst_id").persist()
    deg = edges.groupBy("src_id").agg(F.count(F.lit(1)).alias("c"))
    entry = (
        deg.orderBy(F.desc("c"), F.asc("src_id")).limit(1)
        .select(F.col("src_id").alias("nid"))
    )
    q = emb.orderBy("vec_id").limit(BEAM_QUERIES).select(
        F.col("vec_id").alias("q_id")
    )
    vecs = emb.select(
        "vec_id", "embedding",
        F.expr(_NORM.format(col="embedding")).alias("norm"),
    )

    def score(cand: DataFrame) -> DataFrame:
        """(q_id, nid) → + exact cosine via two id-keyed joins."""
        return (
            cand.join(
                vecs.select(
                    F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("a_emb"),
                    F.col("norm").alias("a_norm"),
                ),
                "q_id",
            )
            .join(
                vecs.select(
                    F.col("vec_id").alias("nid"),
                    F.col("embedding").alias("b_emb"),
                    F.col("norm").alias("b_norm"),
                ),
                "nid",
            )
            .select(
                "q_id", "nid",
                F.expr(
                    f"round({_DOT_AB} / (a_norm * b_norm), 6)"
                ).alias("cosine"),
            )
        )

    c1 = entry.unionByName(
        edges.join(F.broadcast(entry), edges["src_id"] == entry["nid"])
        .select(F.col("dst_id").alias("nid"))
    ).distinct()
    s1 = score(q.crossJoin(F.broadcast(c1)))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nid"))
    f1 = (
        s1.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BEAM_WIDTH)
        .select("q_id", "nid")
    )
    c2 = f1.unionByName(
        f1.join(edges, f1["nid"] == edges["src_id"])
        .select("q_id", F.col("dst_id").alias("nid"))
    ).distinct()
    s2 = score(c2)
    return (
        s2.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BEAM_TOPK)
        .select(
            "q_id",
            F.col("nid").alias("neighbor_id"),
            "cosine",
            F.col("rk").cast("int").alias("rk"),
        )
    )


@register(
    "graph_beam_recall_eval",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    gedges AS (SELECT src_id, dst_id FROM knn),
    deg AS (SELECT src_id, COUNT(*) AS c FROM gedges GROUP BY src_id),
    entry AS (
      SELECT src_id AS nid FROM deg ORDER BY c DESC, src_id LIMIT 1
    ),
    q AS (
      SELECT vec_id AS q_id FROM embeddings ORDER BY vec_id
      LIMIT {BEAM_QUERIES}
    ),
    c1 AS (
      SELECT nid FROM entry
      UNION
      SELECT e.dst_id FROM gedges e JOIN entry ON entry.nid = e.src_id
    ),
    s1 AS (
      SELECT q.q_id, c1.nid, round({COS_DUCK}, 6) AS cosine
      FROM q CROSS JOIN c1
      JOIN embeddings a ON a.vec_id = q.q_id
      JOIN embeddings b ON b.vec_id = c1.nid
    ),
    f1 AS (
      SELECT q_id, nid FROM (
        SELECT q_id, nid,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, nid) AS rk
        FROM s1
      ) t WHERE rk <= {BEAM_WIDTH}
    ),
    c2 AS (
      SELECT q_id, nid FROM f1
      UNION
      SELECT f1.q_id, e.dst_id FROM f1 JOIN gedges e ON e.src_id = f1.nid
    ),
    s2 AS (
      SELECT c2.q_id, c2.nid, round({COS_DUCK}, 6) AS cosine
      FROM c2
      JOIN embeddings a ON a.vec_id = c2.q_id
      JOIN embeddings b ON b.vec_id = c2.nid
    ),
    beam AS (
      SELECT q_id, nid FROM (
        SELECT q_id, nid,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, nid) AS rk
        FROM s2
      ) t WHERE rk <= {BEAM_TOPK}
    ),
    exact AS (
      SELECT q_id, nid FROM (
        SELECT q.q_id, b.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                                  ORDER BY round({COS_DUCK}, 6) DESC,
                                           b.vec_id) AS rk
        FROM q
        JOIN embeddings a ON a.vec_id = q.q_id
        CROSS JOIN embeddings b
      ) t WHERE rk <= {BEAM_TOPK}
    )
    SELECT e.q_id,
           CAST(COUNT(b.nid) AS BIGINT) AS n_hit,
           round(CAST(COUNT(b.nid) AS DOUBLE) / {BEAM_TOPK}, 6)
             AS recall_at_{BEAM_TOPK}
    FROM exact e LEFT JOIN beam b
      ON b.q_id = e.q_id AND b.nid = e.nid
    GROUP BY e.q_id
    """,
    doc=f"Beam-search recall@{BEAM_TOPK}: the walk's top-{BEAM_TOPK} per "
        "query against the exact cosine baseline over the whole corpus "
        "(self included, as the walk may return it) — the serving-layer "
        "accuracy number that decides beam width and round count before "
        "deployment, same measurement discipline as the "
        "LSH/IVF/PQ/int8/int4 recall evals. The exact side is the "
        f"brute-force {BEAM_QUERIES}-query broadcast scan; everything "
        "else reuses the beam plan.",
)
def graph_beam_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    beam = graph_beam_search(spark, sf_dir).select(
        "q_id", F.col("neighbor_id").alias("nid")
    )
    q = emb.orderBy("vec_id").limit(BEAM_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nid"))
    exact = (
        F.broadcast(q).crossJoin(corpus)
        .select(
            "q_id", "nid",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias(
                "cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BEAM_TOPK)
        .select("q_id", "nid")
    )
    return (
        exact.join(beam.withColumn("hit", F.lit(1)), ["q_id", "nid"], "left")
        .groupBy("q_id")
        .agg(
            F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_hit"),
            F.expr(
                f"round(CAST(COUNT(hit) AS DOUBLE) / {BEAM_TOPK}, 6)"
            ).alias(f"recall_at_{BEAM_TOPK}"),
        )
    )


# ---------------------------------------------------------------------------
# corpus-geometry profile: cosine histogram over deterministic stride pairs
# ---------------------------------------------------------------------------

COS_PROFILE_STRIDE = 37  # deterministic pseudo-random pairing, no sampling RNG
COS_PROFILE_BINS = 20    # [-1, 1) in 0.1 steps


@register(
    "emb_cosine_stride_profile",
    # mean per bin via EXACT integer accumulation: the 6dp-rounded cosine
    # (identical doubles in both engines — same fold order) is scaled to
    # an exact BIGINT micro-unit before summing, so no raw-double SUM
    # whose accumulation order could differ between engines
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round({COS_DUCK}, 6) AS cosine
      FROM embeddings a
      JOIN embeddings b ON b.vec_id = a.vec_id + {COS_PROFILE_STRIDE}
    ),
    binned AS (
      SELECT least({COS_PROFILE_BINS - 1}, greatest(0,
               CAST(floor((cosine + 1.0) * 10) AS INT))) AS bin,
             CAST(round(cosine * 1000000, 0) AS BIGINT) AS cos_micro
      FROM pairs
    )
    SELECT bin,
           round(-1.0 + bin * CAST(0.1 AS DOUBLE), 1) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(cos_micro) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS mean_cosine
    FROM binned GROUP BY bin
    """,
    doc=f"Corpus-geometry health profile: the distribution of pairwise "
        f"cosines over deterministic stride-{COS_PROFILE_STRIDE} pairs "
        f"(vec i vs vec i+{COS_PROFILE_STRIDE} — a fixed pseudo-random "
        "pairing with NO RNG and NO quadratic pair blowup: exactly one "
        "pair per vector, a self-equi-join on a shifted key). A healthy "
        "embedding space concentrates near 0; mass near 1 flags "
        "duplicated/collapsed vectors (hubness, mode collapse) and "
        "shifts of the histogram over snapshots flag embedding-model "
        "drift. Per-bin means accumulate in exact integer micro-units — "
        "no cross-row float summation anywhere.",
)
def emb_cosine_stride_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    a = emb.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
    )
    b = emb.select(
        (F.col("vec_id") - COS_PROFILE_STRIDE).alias("a_id"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
    )
    pairs = a.join(b, "a_id").select(
        F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine")
    )
    binned = pairs.select(
        F.expr(
            f"least({COS_PROFILE_BINS - 1}, greatest(0, "
            f"CAST(floor((cosine + 1.0) * 10) AS INT)))"
        ).alias("bin"),
        F.expr("CAST(round(cosine * 1000000, 0) AS BIGINT)").alias(
            "cos_micro"),
    )
    return binned.groupBy("bin").agg(
        F.expr("round(-1.0 + bin * CAST(0.1 AS DOUBLE), 1)").alias("bin_lo"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_pairs"),
        F.expr(
            "round(CAST(SUM(cos_micro) AS DOUBLE)"
            " / (COUNT(*) * 1000000.0), 6)"
        ).alias("mean_cosine"),
    ).select("bin", "bin_lo", "n_pairs", "mean_cosine")


# ---------------------------------------------------------------------------
# hard-negative / hard-positive triplet mining
# ---------------------------------------------------------------------------

HN_ANCHORS = 32  # fixed anchor set: vec_id < 32


@register(
    "sample_hard_negatives",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS cand_id, b.label AS cand_label,
             round({COS_DUCK}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {HN_ANCHORS}
    ),
    pos AS (
      SELECT anchor_id, anchor_label,
             cand_id AS pos_id, cosine AS pos_cos,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine, cand_id) AS rk
      FROM pairs WHERE cand_label = anchor_label
    ),
    neg AS (
      SELECT anchor_id, cand_id AS neg_id, cosine AS neg_cos,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, cand_id) AS rk
      FROM pairs WHERE cand_label <> anchor_label
    )
    SELECT p.anchor_id, p.anchor_label, p.pos_id, p.pos_cos,
           n.neg_id, n.neg_cos,
           round(n.neg_cos - p.pos_cos, 6) AS margin
    FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
    WHERE p.rk = 1 AND n.rk = 1
    """,
    doc=f"Triplet mining for metric-learning / contrastive training: for "
        f"each of {HN_ANCHORS} fixed anchors, the HARDEST positive "
        "(same-label vector with the LOWEST cosine — the pair the model "
        "most struggles to pull together) and the HARDEST negative "
        "(different-label vector with the HIGHEST cosine — the impostor "
        "it most struggles to push apart), plus the triplet margin "
        "neg_cos - pos_cos (positive margin = a violating triplet worth "
        "training on). Complements sample_contrastive_pairs, which mines "
        "hash-random pairs; this is the cosine-hardness variant. Float "
        "discipline: per-side norms computed once per vector, fixed "
        "fold order, 6dp round before ranking (see "
        "dedup_embedding_cosine). Scale shape: the anchor set is a "
        "broadcast k-row table scanned against the corpus (k*n, never "
        "n^2), and per-anchor argmin/argmax are rank-1 windows over "
        "k partitions; at production scale the candidate scan drops in "
        "for an LSH/IVF candidate set (sim_ann_* operators) unchanged.",
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    anchors = emb.filter(F.col("vec_id") < HN_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
    )
    cand = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
    )
    pairs = (
        F.broadcast(anchors)
        .join(cand, F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id", "anchor_label", "cand_id", "cand_label",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias(
                "cosine"),
        )
    )
    wp = Window.partitionBy("anchor_id").orderBy(
        F.asc("cosine"), F.asc("cand_id"))
    pos = (
        pairs.filter(F.col("cand_label") == F.col("anchor_label"))
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select(
            "anchor_id", "anchor_label",
            F.col("cand_id").alias("pos_id"),
            F.col("cosine").alias("pos_cos"),
        )
    )
    wn = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("cand_id"))
    neg = (
        pairs.filter(F.col("cand_label") != F.col("anchor_label"))
        .withColumn("rk", F.row_number().over(wn))
        .filter(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "anchor_label", "pos_id", "pos_cos",
        "neg_id", "neg_cos",
        F.expr("round(neg_cos - pos_cos, 6)").alias("margin"),
    )


# ---------------------------------------------------------------------------
# link prediction on the kNN graph (common-neighbor / Jaccard scoring)
# ---------------------------------------------------------------------------

LINKPRED_TOP_K = 20


@register(
    "graph_link_prediction",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a,
             GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    adj AS (
      SELECT a AS u, b AS v FROM und
      UNION ALL SELECT b AS u, a AS v FROM und
    ),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM adj GROUP BY u),
    cand AS (
      SELECT e1.u AS u, e2.v AS v,
             CAST(COUNT(DISTINCT e1.v) AS BIGINT) AS n_common
      FROM adj e1 JOIN adj e2 ON e2.u = e1.v
      WHERE e1.u < e2.v
      GROUP BY e1.u, e2.v
    ),
    nonedge AS (
      SELECT c.u, c.v, c.n_common
      FROM cand c LEFT JOIN und ON und.a = c.u AND und.b = c.v
      WHERE und.a IS NULL
    ),
    scored AS (
      SELECT ne.u, ne.v, ne.n_common,
             du.degree AS deg_u, dv.degree AS deg_v,
             round(CAST(ne.n_common AS DOUBLE)
                   / (du.degree + dv.degree - ne.n_common), 6) AS jaccard
      FROM nonedge ne
      JOIN deg du ON du.node = ne.u
      JOIN deg dv ON dv.node = ne.v
    )
    SELECT u, v, n_common, deg_u, deg_v, jaccard,
           ROW_NUMBER() OVER (ORDER BY jaccard DESC, n_common DESC, u, v)
             AS rk
    FROM (
      SELECT * FROM scored
      ORDER BY jaccard DESC, n_common DESC, u, v LIMIT {LINKPRED_TOP_K}
    ) t
    """,
    doc=f"Link prediction over the approximate kNN graph: the "
        f"{LINKPRED_TOP_K} strongest NON-edges, scored by common-"
        "neighbor count and neighborhood Jaccard — the classic "
        "missing-link signal used to densify a near-duplicate graph "
        "(two documents sharing most of their neighbors are near-dups "
        "the banded LSH pass missed) or to propose semantic-cluster "
        "merges. Candidates are distance-2 pairs from one bounded "
        "self-join of the symmetrized adjacency (degree <= k, so the "
        "join emits <= n*k^2 rows — never all pairs); existing edges "
        "are anti-joined out; Jaccard is ONE double division of exact "
        "BIGINTs; selection is a distributed TakeOrdered top-k.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = emb_knn_graph(spark, sf_dir).select("src_id", "dst_id")
    und = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .persist()
    )
    adj = und.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("degree")
    )
    e1 = adj.select(F.col("u"), F.col("v").alias("w"))
    e2 = adj.select(F.col("u").alias("w2"), F.col("v"))
    cand = (
        e1.join(e2, (e1["w"] == e2["w2"]) & (e1["u"] < e2["v"]))
        .groupBy("u", "v")
        .agg(F.expr("CAST(COUNT(DISTINCT w) AS BIGINT)").alias("n_common"))
    )
    nonedge = cand.join(
        und,
        (cand["u"] == und["a"]) & (cand["v"] == und["b"]),
        "left_anti",
    )
    scored = (
        nonedge.join(deg.withColumnRenamed("degree", "deg_u"),
                     nonedge["u"] == F.col("node"))
        .drop("node")
        .join(deg.withColumnRenamed("degree", "deg_v"),
              F.col("v") == F.col("node"))
        .drop("node")
        .select(
            "u", "v", "n_common", "deg_u", "deg_v",
            F.expr(
                "round(CAST(n_common AS DOUBLE)"
                " / (deg_u + deg_v - n_common), 6)"
            ).alias("jaccard"),
        )
    )
    order = [F.desc("jaccard"), F.desc("n_common"), F.asc("u"), F.asc("v")]
    top = scored.orderBy(*order).limit(LINKPRED_TOP_K)
    w = Window.orderBy(*order)
    return top.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# label homophily of the kNN graph (embedding-quality diagnostic)
# ---------------------------------------------------------------------------


@register(
    "graph_embedding_homophily",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a,
             GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    lab AS (
      SELECT u.a, u.b, ea.label AS la, eb.label AS lb
      FROM und u
      JOIN embeddings ea ON ea.vec_id = u.a
      JOIN embeddings eb ON eb.vec_id = u.b
    ),
    per_label AS (
      SELECT label,
             CAST(SUM(n_edges) AS BIGINT) AS n_edges,
             CAST(SUM(n_same) AS BIGINT) AS n_same
      FROM (
        SELECT la AS label, COUNT(*) AS n_edges,
               SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS n_same
        FROM lab GROUP BY la
        UNION ALL
        SELECT lb AS label, COUNT(*) AS n_edges,
               SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS n_same
        FROM lab WHERE la <> lb GROUP BY lb
      ) ends GROUP BY label
    )
    SELECT label, n_edges, n_same,
           round(CAST(n_same AS DOUBLE) / n_edges, 6) AS homophily
    FROM per_label
    """,
    doc="Label homophily of the approximate kNN graph, per label: of the "
        "undirected edges incident to each label, the fraction whose "
        "endpoints SHARE that label. The one-number embedding-quality "
        "eval behind graph-based curation — high homophily means "
        "neighbors agree with supervision (kNN classification and "
        "label-propagation cleaning will work), low homophily flags an "
        "embedding/label mismatch before a pipeline trusts either. "
        "Same-label edges count once toward their shared label; mixed "
        "edges count toward both endpoint labels. All-integer counts "
        "with one final division; edges come from the registered kNN "
        "graph (banded LSH, no cross join) joined to the label table.",
)
def graph_embedding_homophily(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    edges = emb_knn_graph(spark, sf_dir).select("src_id", "dst_id")
    und = (
        edges.filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    labels = emb.select("vec_id", "label")
    lab = (
        und.join(labels.withColumnRenamed("vec_id", "a")
                 .withColumnRenamed("label", "la"), "a")
        .join(labels.withColumnRenamed("vec_id", "b")
              .withColumnRenamed("label", "lb"), "b")
        .select("a", "b", "la", "lb")
    )
    ends_a = lab.groupBy(F.col("la").alias("label")).agg(
        F.expr("COUNT(*)").alias("n_edges"),
        F.expr("SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)").alias("n_same"),
    )
    ends_b = lab.filter(F.col("la") != F.col("lb")).groupBy(
        F.col("lb").alias("label")
    ).agg(
        F.expr("COUNT(*)").alias("n_edges"),
        F.expr("SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)").alias("n_same"),
    )
    per_label = (
        ends_a.unionAll(ends_b)
        .groupBy("label")
        .agg(
            F.expr("CAST(SUM(n_edges) AS BIGINT)").alias("n_edges"),
            F.expr("CAST(SUM(n_same) AS BIGINT)").alias("n_same"),
        )
    )
    return per_label.select(
        "label", "n_edges", "n_same",
        F.expr("round(CAST(n_same AS DOUBLE) / n_edges, 6)").alias(
            "homophily"),
    )


# ---------------------------------------------------------------------------
# embedding anisotropy profile (mean-vector concentration per label)
# ---------------------------------------------------------------------------

@register(
    "emb_anisotropy_stats",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_QVEC_DUCK} AS qvec FROM embeddings
    ),
    pos AS (
      SELECT label, qvec,
             unnest(range(1, len(qvec) + 1)) AS dim
      FROM q
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qvec[dim]) AS BIGINT) AS sd,
             CAST(SUM(CAST(qvec[dim] AS BIGINT) * qvec[dim]) AS BIGINT)
               AS ssq_d
      FROM pos GROUP BY label, dim
    ),
    per_label AS (
      SELECT label,
             CAST(MAX(n) AS BIGINT) AS n_vectors,
             CAST(SUM(sd * sd) AS BIGINT) AS sum_vec_dot,
             CAST(SUM(ssq_d) AS BIGINT) AS sum_norm_sq
      FROM per_dim GROUP BY label
    )
    SELECT label, n_vectors, sum_norm_sq, sum_vec_dot,
           round(CAST(sum_norm_sq AS DOUBLE) / n_vectors, 6)
             AS mean_norm_sq,
           CASE WHEN n_vectors > 1 THEN
             round(CAST(sum_vec_dot - sum_norm_sq AS DOUBLE)
                   / (CAST(n_vectors AS DOUBLE) * (n_vectors - 1)), 6)
           END AS avg_pair_dot,
           CASE WHEN n_vectors > 1 AND sum_norm_sq > 0 THEN
             round(CAST(n_vectors AS DOUBLE)
                   * (sum_vec_dot - sum_norm_sq)
                   / (CAST(n_vectors - 1 AS DOUBLE) * sum_norm_sq), 6)
           END AS anisotropy
    FROM per_label
    """,
    doc="Per-label embedding anisotropy (Ethayarajh-style mean pairwise "
        "similarity): how concentrated a label's vectors are around a "
        "common direction — near-1 anisotropy means the space has "
        "collapsed (every pair looks similar, cosine retrieval loses "
        "contrast), near-0 means isotropic spread. The identity "
        "avg_{{i != j}} <x_i, x_j> = (||sum x||^2 - sum ||x_i||^2) / "
        "(n(n-1)) turns the quadratic all-pairs sum into two linear "
        "passes; over int8 codes (the emb_dim_stats discipline) both "
        "sides accumulate as exact BIGINTs in any partition order — "
        "int8*int8 fits dim*127^2*n, overflow only past ~5e8 vectors "
        "per label. Two shuffles on (label, dim) then label keys; no "
        "pairwise join anywhere.",
)
def emb_anisotropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    exploded = emb.select(
        "label", F.posexplode(F.expr(_QVEC_SPARK)).alias("dim", "qv")
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(qv) AS BIGINT)").alias("sd"),
        F.expr("CAST(SUM(CAST(qv AS BIGINT) * qv) AS BIGINT)").alias("ssq_d"),
    )
    per_label = per_dim.groupBy("label").agg(
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_vectors"),
        F.expr("CAST(SUM(sd * sd) AS BIGINT)").alias("sum_vec_dot"),
        F.expr("CAST(SUM(ssq_d) AS BIGINT)").alias("sum_norm_sq"),
    )
    return per_label.select(
        "label", "n_vectors", "sum_norm_sq", "sum_vec_dot",
        F.expr(
            "round(CAST(sum_norm_sq AS DOUBLE) / n_vectors, 6)"
        ).alias("mean_norm_sq"),
        F.expr(
            "CASE WHEN n_vectors > 1 THEN"
            " round(CAST(sum_vec_dot - sum_norm_sq AS DOUBLE)"
            " / (CAST(n_vectors AS DOUBLE) * (n_vectors - 1)), 6) END"
        ).alias("avg_pair_dot"),
        F.expr(
            "CASE WHEN n_vectors > 1 AND sum_norm_sq > 0 THEN"
            " round(CAST(n_vectors AS DOUBLE)"
            " * (sum_vec_dot - sum_norm_sq)"
            " / (CAST(n_vectors - 1 AS DOUBLE) * sum_norm_sq), 6) END"
        ).alias("anisotropy"),
    )


# ---------------------------------------------------------------------------
# per-cluster conductance (cut quality of the semantic partition)
# ---------------------------------------------------------------------------

@register(
    "graph_cluster_conductance",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_LSH_DEDUP_ORACLE}
    ),
    cedges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    walk(vec_id, reach) AS (
      SELECT DISTINCT src, src FROM cedges
      UNION
      SELECT e.src, w.reach FROM cedges e JOIN walk w ON w.vec_id = e.dst
    ),
    clus AS (
      SELECT vec_id, MIN(reach) AS cluster_id FROM walk GROUP BY vec_id
    ),
    knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    und AS (
      SELECT DISTINCT LEAST(src_id, dst_id) AS a, GREATEST(src_id, dst_id) AS b
      FROM knn WHERE src_id <> dst_id
    ),
    assign AS (
      SELECT e.vec_id, COALESCE(c.cluster_id, e.vec_id) AS cl
      FROM embeddings e LEFT JOIN clus c ON c.vec_id = e.vec_id
    ),
    members AS (
      SELECT cl, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM assign GROUP BY cl HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) ends GROUP BY node
    ),
    vol AS (
      SELECT ass.cl, CAST(SUM(deg.d) AS BIGINT) AS volume
      FROM deg JOIN assign ass ON ass.vec_id = deg.node
      GROUP BY ass.cl
    ),
    lab AS (
      SELECT ca.cl AS cla, cb.cl AS clb
      FROM und
      JOIN assign ca ON ca.vec_id = und.a
      JOIN assign cb ON cb.vec_id = und.b
    ),
    internal AS (
      SELECT cla AS cl, CAST(COUNT(*) AS BIGINT) AS internal_edges
      FROM lab WHERE cla = clb GROUP BY cla
    ),
    cut AS (
      SELECT cl, CAST(COUNT(*) AS BIGINT) AS cut_edges FROM (
        SELECT cla AS cl FROM lab WHERE cla <> clb
        UNION ALL
        SELECT clb AS cl FROM lab WHERE cla <> clb
      ) t GROUP BY cl
    ),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und)
    SELECT CAST(me.cl AS BIGINT) AS cluster_id, me.n_members,
           COALESCE(v.volume, 0) AS volume,
           COALESCE(i.internal_edges, 0) AS internal_edges,
           COALESCE(c.cut_edges, 0) AS cut_edges,
           CASE WHEN LEAST(COALESCE(v.volume, 0),
                           2 * mm.m - COALESCE(v.volume, 0)) > 0
                THEN round(CAST(COALESCE(c.cut_edges, 0) AS DOUBLE)
                           / LEAST(COALESCE(v.volume, 0),
                                   2 * mm.m - COALESCE(v.volume, 0)), 6)
           END AS conductance
    FROM members me CROSS JOIN mm
    LEFT JOIN vol v ON v.cl = me.cl
    LEFT JOIN internal i ON i.cl = me.cl
    LEFT JOIN cut c ON c.cl = me.cl
    """,
    doc="Per-cluster conductance of the semantic-duplicate partition on "
        "the kNN graph: cut_edges / min(volume, 2m - volume) for every "
        "non-singleton cluster, with the exact integer cut/volume/"
        "internal counts alongside — the per-community complement to "
        "graph_modularity_clusters' single global score (a partition can "
        "have good modularity while individual clusters leak badly; "
        "conductance names the leakers). Near-zero = a well-separated "
        "duplicate family; near-1 = a cluster the LSH threshold glued "
        "together that the neighborhood structure contradicts. All "
        "counts are exact integers from int-keyed hash joins; the single "
        "division per cluster is the only float op. Cluster cardinality "
        "is bounded by the near-dup pair support, so the output is a "
        "short audit table, not entity-grain.",
)
def graph_cluster_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    und = (
        emb_knn_graph(spark, sf_dir)
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .persist()
    )
    clus = emb_semantic_clusters(spark, sf_dir)
    assign = (
        emb.select("vec_id")
        .join(clus.withColumnRenamed("vec_id", "cvid"),
              F.col("vec_id") == F.col("cvid"), "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cl"),
        )
        .persist()
    )
    members = (
        assign.groupBy("cl")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    vol = (
        deg.join(assign.select(F.col("vec_id").alias("node"), "cl"), "node")
        .groupBy("cl")
        .agg(F.expr("CAST(SUM(d) AS BIGINT)").alias("volume"))
    )
    lab = (
        und.join(assign.select(F.col("vec_id").alias("a"),
                               F.col("cl").alias("cla")), "a")
        .join(assign.select(F.col("vec_id").alias("b"),
                            F.col("cl").alias("clb")), "b")
        .select("cla", "clb")
        .persist()
    )
    internal = (
        lab.filter(F.col("cla") == F.col("clb"))
        .groupBy(F.col("cla").alias("cl"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("internal_edges"))
    )
    cut = (
        lab.filter(F.col("cla") != F.col("clb"))
        .select(F.col("cla").alias("cl"))
        .unionAll(
            lab.filter(F.col("cla") != F.col("clb"))
            .select(F.col("clb").alias("cl"))
        )
        .groupBy("cl")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("cut_edges"))
    )
    mm = und.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"))
    return (
        members.crossJoin(F.broadcast(mm))
        .join(F.broadcast(vol), "cl", "left")
        .join(F.broadcast(internal), "cl", "left")
        .join(F.broadcast(cut), "cl", "left")
        .select(
            F.col("cl").cast("bigint").alias("cluster_id"),
            "n_members",
            F.expr("COALESCE(volume, 0)").alias("volume"),
            F.expr("COALESCE(internal_edges, 0)").alias("internal_edges"),
            F.expr("COALESCE(cut_edges, 0)").alias("cut_edges"),
            F.expr(
                "CASE WHEN LEAST(COALESCE(volume, 0),"
                " 2 * m - COALESCE(volume, 0)) > 0"
                " THEN round(CAST(COALESCE(cut_edges, 0) AS DOUBLE)"
                " / LEAST(COALESCE(volume, 0),"
                " 2 * m - COALESCE(volume, 0)), 6) END"
            ).alias("conductance"),
        )
    )


# ---------------------------------------------------------------------------
# label-centroid distance matrix (class-confusion structure)
# ---------------------------------------------------------------------------

@register(
    "emb_centroid_distance_matrix",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_QVEC_DUCK} AS qvec FROM embeddings
    ),
    pos AS (
      SELECT label, qvec,
             unnest(range(1, len(qvec) + 1)) AS dim
      FROM q
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qvec[dim]) AS BIGINT) AS sd
      FROM pos GROUP BY label, dim
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(MAX(a.n) AS BIGINT) AS n_a,
             CAST(MAX(b.n) AS BIGINT) AS n_b,
             CAST(SUM(a.sd * b.sd) AS BIGINT) AS dot_ab,
             CAST(SUM(a.sd * a.sd) AS BIGINT) AS dot_aa,
             CAST(SUM(b.sd * b.sd) AS BIGINT) AS dot_bb,
             CAST(SUM((a.sd * b.n - b.sd * a.n)
                      * (a.sd * b.n - b.sd * a.n)) AS BIGINT)
               AS dist2_num
      FROM per_dim a JOIN per_dim b
        ON a.dim = b.dim AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, n_a, n_b, dot_ab,
           round(CAST(dot_ab AS DOUBLE)
                 / (sqrt(CAST(dot_aa AS DOUBLE))
                    * sqrt(CAST(dot_bb AS DOUBLE))), 6) AS cos_centroid,
           round(sqrt(CAST(dist2_num AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * n_b), 6) AS dist_centroid
    FROM pairs
    """,
    doc="Pairwise label-centroid geometry (the class-confusion map an "
        "embedding eval starts from): for every unordered label pair, "
        "the cosine between centroids and the euclidean centroid "
        "distance, from per-(label, dim) INTEGER sums of the int8 codes "
        "— no per-vector pairing anywhere, the label-pair grid is "
        "bounded (|labels|^2/2 rows). Two identities keep it exact: the "
        "count cancels in centroid cosine (cos(S_a/n_a, S_b/n_b) = "
        "cos(S_a, S_b)), and squared distance rides the common "
        "denominator (n_a n_b)^2 so the numerator is an exact BIGINT "
        "(holds to ~1e8 vectors/label before sd*n products near 2^63). "
        "One (label, dim) shuffle, then a 640-row broadcast self-join "
        "on dim.",
)
def emb_centroid_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    exploded = emb.select(
        "label", F.posexplode(F.expr(_QVEC_SPARK)).alias("dim", "qv")
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(qv) AS BIGINT)").alias("sd"),
    )
    a = per_dim.select(
        F.col("label").alias("la"), "dim",
        F.col("n").alias("na"), F.col("sd").alias("sda"),
    )
    b = per_dim.select(
        F.col("label").alias("lb"), F.col("dim").alias("dimb"),
        F.col("n").alias("nb"), F.col("sd").alias("sdb"),
    )
    pairs = (
        a.join(F.broadcast(b),
               (F.col("dim") == F.col("dimb")) & (F.col("la") < F.col("lb")))
        .groupBy(F.col("la").alias("label_a"), F.col("lb").alias("label_b"))
        .agg(
            F.expr("CAST(MAX(na) AS BIGINT)").alias("n_a"),
            F.expr("CAST(MAX(nb) AS BIGINT)").alias("n_b"),
            F.expr("CAST(SUM(sda * sdb) AS BIGINT)").alias("dot_ab"),
            F.expr("CAST(SUM(sda * sda) AS BIGINT)").alias("dot_aa"),
            F.expr("CAST(SUM(sdb * sdb) AS BIGINT)").alias("dot_bb"),
            F.expr(
                "CAST(SUM((sda * nb - sdb * na) * (sda * nb - sdb * na))"
                " AS BIGINT)"
            ).alias("dist2_num"),
        )
    )
    return pairs.select(
        "label_a", "label_b", "n_a", "n_b", "dot_ab",
        F.expr(
            "round(CAST(dot_ab AS DOUBLE)"
            " / (sqrt(CAST(dot_aa AS DOUBLE))"
            " * sqrt(CAST(dot_bb AS DOUBLE))), 6)"
        ).alias("cos_centroid"),
        F.expr(
            "round(sqrt(CAST(dist2_num AS DOUBLE))"
            " / (CAST(n_a AS DOUBLE) * n_b), 6)"
        ).alias("dist_centroid"),
    )


# ---------------------------------------------------------------------------
# two-NN intrinsic-dimension estimate (Facco et al. MLE over the kNN graph)
# ---------------------------------------------------------------------------

@register(
    "emb_intrinsic_dimension",
    oracle=f"""
    WITH knn AS (
      {_KNN_GRAPH_ORACLE}
    ),
    two_nn AS (
      SELECT src_id,
             MAX(CASE WHEN rk = 1 THEN cosine END) AS c1,
             MAX(CASE WHEN rk = 2 THEN cosine END) AS c2
      FROM knn WHERE rk <= 2 GROUP BY src_id
    ),
    terms AS (
      SELECT src_id,
             CASE WHEN c2 IS NOT NULL AND c1 < 1 THEN
               CAST(round(ln((1 - c2) / (1 - c1)), 9) AS DECIMAL(20,9))
             END AS t
      FROM two_nn
    ),
    agg AS (
      SELECT CAST(COUNT(t) AS BIGINT) AS n_used,
             CAST(COUNT(*) - COUNT(t) AS BIGINT) AS n_excluded,
             CAST(SUM(t) AS DOUBLE) AS sum_log_ratio
      FROM terms
    )
    SELECT n_used, n_excluded,
           round(sum_log_ratio, 6) AS sum_log_ratio,
           CASE WHEN sum_log_ratio > 0 THEN
             round(n_used / sum_log_ratio, 4)
           END AS id_mle
    FROM agg
    """,
    doc="Two-NN intrinsic-dimension estimate (Facco et al. 2017 MLE: "
        "ID = n / Σ ln(d2/d1) over each point's two nearest neighbors) "
        "on cosine distance from the approximate kNN graph — the "
        "manifold-dimension diagnostic behind embedding-capacity and "
        "truncation decisions (an ID far below the ambient 64 dims says "
        "aggressive PQ/truncation is safe; emb_truncation_recall_eval "
        "then verifies it empirically). Distances derive from the "
        "graph's 6dp-rounded cosines (hash-stable inputs), each node's "
        "log-ratio is one double expression rounded at 9dp then "
        "DECIMAL-summed (the JSD discipline), and nodes with a "
        "duplicate nearest neighbor (d1 = 0) or a single neighbor are "
        "excluded and counted. No new shuffles beyond the kNN graph's "
        "own plan plus one src_id aggregation.",
)
def emb_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    knn = emb_knn_graph(spark, sf_dir)
    two_nn = knn.filter(F.col("rk") <= 2).groupBy("src_id").agg(
        F.expr("MAX(CASE WHEN rk = 1 THEN cosine END)").alias("c1"),
        F.expr("MAX(CASE WHEN rk = 2 THEN cosine END)").alias("c2"),
    )
    terms = two_nn.select(
        F.expr(
            "CASE WHEN c2 IS NOT NULL AND c1 < 1 THEN"
            " CAST(round(ln((1 - c2) / (1 - c1)), 9) AS DECIMAL(20,9))"
            " END"
        ).alias("t")
    )
    agg = terms.agg(
        F.expr("CAST(COUNT(t) AS BIGINT)").alias("n_used"),
        F.expr("CAST(COUNT(*) - COUNT(t) AS BIGINT)").alias("n_excluded"),
        F.expr("CAST(SUM(t) AS DOUBLE)").alias("sum_log_ratio"),
    )
    return agg.select(
        "n_used", "n_excluded",
        F.expr("round(sum_log_ratio, 6)").alias("sum_log_ratio"),
        F.expr(
            "CASE WHEN sum_log_ratio > 0 THEN"
            " round(n_used / sum_log_ratio, 4) END"
        ).alias("id_mle"),
    )


# ---------------------------------------------------------------------------
# cross-modal diagnostic: text quality vs embedding centrality correlation
# ---------------------------------------------------------------------------

@register(
    "emb_quality_centrality_corr",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QVEC_DUCK} AS qvec FROM embeddings
    ),
    pos AS (
      SELECT qvec, unnest(range(1, len(qvec) + 1)) AS dim FROM q
    ),
    per_dim AS (
      SELECT dim, CAST(SUM(qvec[dim]) AS BIGINT) AS sd
      FROM pos GROUP BY dim
    ),
    cent AS (
      SELECT list(sd ORDER BY dim) AS cvec,
             CAST(SUM(sd * sd) AS BIGINT) AS c_norm_sq
      FROM per_dim
    ),
    joined AS (
      SELECT round(CAST(len(list_distinct(string_split(d.text, ' ')))
                        AS DOUBLE)
                   / len(string_split(d.text, ' ')), 6) AS qd,
             round(
               CAST(list_sum(list_transform(range(1, len(e.qvec) + 1),
                     i -> e.qvec[i] * c.cvec[i])) AS DOUBLE)
               / (sqrt(CAST(list_sum(list_transform(e.qvec,
                        x -> CAST(x AS BIGINT) * x)) AS DOUBLE))
                  * sqrt(CAST(c.c_norm_sq AS DOUBLE))), 6) AS wd
      FROM documents d
      JOIN q e ON e.vec_id = d.doc_id
      CROSS JOIN cent c
      WHERE list_sum(list_transform(e.qvec,
              x -> CAST(x AS BIGINT) * x)) > 0
    ),
    terms AS (
      SELECT CAST(round(qd * wd, 9) AS DECIMAL(20,9)) AS t_xy,
             CAST(round(qd * qd, 9) AS DECIMAL(20,9)) AS t_xx,
             CAST(round(wd * wd, 9) AS DECIMAL(20,9)) AS t_yy,
             CAST(qd AS DECIMAL(12,6)) AS t_x,
             CAST(wd AS DECIMAL(12,6)) AS t_y
      FROM joined
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(t_x) AS DOUBLE) AS sx,
             CAST(SUM(t_y) AS DOUBLE) AS sy,
             CAST(SUM(t_xx) AS DOUBLE) AS sxx,
             CAST(SUM(t_yy) AS DOUBLE) AS syy,
             CAST(SUM(t_xy) AS DOUBLE) AS sxy
      FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS r_quality_centrality,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope_centrality_per_quality
    FROM agg
    """,
    doc="Cross-modal health check: Pearson correlation (and OLS slope) "
        "between a document's lexical-diversity quality score and its "
        "embedding's CENTRALITY — the cosine to the global int8 centroid "
        "direction, joined on vec_id = doc_id. A strong coupling means "
        "the embedder folds text quality into geometry: quality-filtering "
        "then implicitly reshapes the embedding distribution (and "
        "centroid-based ANN/IVF partitions inherit the bias) — the "
        "check to run before combining quality gates with semantic "
        "dedup. Everything cross-row is exact: the centroid is the "
        "integer dim-sum vector, each row's cosine is one double "
        "expression over exact integers rounded at 6dp, and the Pearson "
        "sufficient statistics are 9dp-rounded DECIMAL sums (the JSD "
        "discipline). One (dim) shuffle for the centroid, a broadcast "
        "of one 64-int row, and a single scan per side.",
)
def emb_quality_centrality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "documents", "embeddings")
    docs, emb = t["documents"], t["embeddings"]
    q = emb.select("vec_id", F.expr(_QVEC_SPARK).alias("qvec"))
    per_dim = q.select(
        F.posexplode("qvec").alias("dim", "qv")
    ).groupBy("dim").agg(F.expr("CAST(SUM(qv) AS BIGINT)").alias("sd"))
    cent = per_dim.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, sd))),"
            " s -> s.sd)"
        ).alias("cvec"),
        F.expr("CAST(SUM(sd * sd) AS BIGINT)").alias("c_norm_sq"),
    )
    joined = (
        docs.join(q, docs["doc_id"] == q["vec_id"])
        .crossJoin(F.broadcast(cent))
        .filter(F.expr(
            "aggregate(transform(qvec, x -> CAST(x AS BIGINT) * x),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v) > 0"
        ))
        .select(
            F.expr(
                "round(CAST(size(array_distinct(split(text, ' ')))"
                " AS DOUBLE) / size(split(text, ' ')), 6)"
            ).alias("qd"),
            F.expr(
                "round("
                "CAST(aggregate(zip_with(qvec, cvec, (a, b)"
                " -> CAST(a AS BIGINT) * b), CAST(0 AS BIGINT),"
                " (acc, v) -> acc + v) AS DOUBLE)"
                " / (sqrt(CAST(aggregate(transform(qvec,"
                " x -> CAST(x AS BIGINT) * x), CAST(0 AS BIGINT),"
                " (acc, v) -> acc + v) AS DOUBLE))"
                " * sqrt(CAST(c_norm_sq AS DOUBLE))), 6)"
            ).alias("wd"),
        )
    )
    terms = joined.selectExpr(
        "CAST(round(qd * wd, 9) AS DECIMAL(20,9)) AS t_xy",
        "CAST(round(qd * qd, 9) AS DECIMAL(20,9)) AS t_xx",
        "CAST(round(wd * wd, 9) AS DECIMAL(20,9)) AS t_yy",
        "CAST(qd AS DECIMAL(12,6)) AS t_x",
        "CAST(wd AS DECIMAL(12,6)) AS t_y",
    )
    agg = terms.agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(t_x) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(t_y) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(t_xx) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(t_yy) AS DOUBLE)").alias("syy"),
        F.expr("CAST(SUM(t_xy) AS DOUBLE)").alias("sxy"),
    )
    return agg.select(
        F.expr("CAST(n AS BIGINT)").alias("n_rows"),
        F.expr(
            "round((n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)"
        ).alias("r_quality_centrality"),
        F.expr(
            "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)"
        ).alias("slope_centrality_per_quality"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random-projection distortion eval
# ---------------------------------------------------------------------------

#: deterministic sampling stride for the eval pair set (vec_id % 11 = 1
#: → ~9% of vectors, all pairs among them — bounded, never all-pairs
#: over the corpus) and the target dimensions evaluated
JL_SAMPLE_MOD = 11
JL_KS = (8, 16, 32)


def _jl_core_sql(hash_int: str, intdiv: str) -> str:
    """Engine-shared core over a `dims` relation (vec_id, i, qi) and a
    `jdom` relation (k, j): ±1 signs from the (i, j) hash, integer
    projections and squared distances (exact, order-free), one
    division per pair ratio, DECIMAL-summed mean — the repo's float
    discipline end to end."""
    sign = (
        f"(CASE WHEN {hash_int.format(x=chr(39) + 'jl:' + chr(39) + ' || jd.j || ' + chr(39) + ':' + chr(39) + ' || d.i')}"
        f" % 2 = 0 THEN 1 ELSE -1 END)"
    )
    return f"""
    proj AS (
      SELECT d.vec_id, jd.k, jd.j,
             CAST(SUM({sign} * d.qi) AS BIGINT) AS p
      FROM dims d CROSS JOIN jdom jd
      GROUP BY d.vec_id, jd.k, jd.j
    ),
    orig AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             CAST(SUM((a.qi - b.qi) * (a.qi - b.qi)) AS BIGINT) AS d2
      FROM dims a JOIN dims b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    pdist AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.k,
             CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS pd2
      FROM proj a JOIN proj b
        ON a.k = b.k AND a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id, a.k
    ),
    ratios AS (
      SELECT p.k,
             round(CAST(p.pd2 AS DOUBLE)
                   / (CAST(p.k AS DOUBLE) * CAST(o.d2 AS DOUBLE)), 9) AS r
      FROM pdist p
      JOIN orig o ON o.a_id = p.a_id AND o.b_id = p.b_id
      WHERE o.d2 > 0
    ),
    ranked AS (
      SELECT k, r,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY r) AS rn,
             COUNT(*) OVER (PARTITION BY k) AS n
      FROM ratios
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(MAX(n) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(r AS DECIMAL(20,9))) AS DOUBLE)
                 / CAST(MAX(n) AS DOUBLE), 6) AS mean_ratio,
           round(MIN(r), 6) AS min_ratio,
           round(MAX(r), 6) AS max_ratio,
           round(MAX(CASE WHEN rn = (n + 1) {intdiv} 2 THEN r END), 6)
             AS p50_ratio
    FROM ranked GROUP BY k ORDER BY k
    """


_JL_HASH_SPARK = "CAST(conv(substr(md5({x}), 1, 8), 16, 10) AS BIGINT)"
_JL_HASH_DUCK = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"


@register(
    "emb_jl_projection_eval",
    oracle=f"""
    WITH dims AS (
      SELECT vec_id, i, qvec[i] AS qi
      FROM (SELECT vec_id, {_QVEC_DUCK} AS qvec,
                   unnest(range(1, 65)) AS i
            FROM embeddings WHERE vec_id % {JL_SAMPLE_MOD} = 1) t
    ),
    jdom AS (
      SELECT k, unnest(range(1, k + 1)) AS j
      FROM (VALUES ({JL_KS[0]}), ({JL_KS[1]}), ({JL_KS[2]})) ks(k)
    ),
    {_jl_core_sql(_JL_HASH_DUCK, "//")}
    """,
    doc="Johnson–Lindenstrauss random-projection distortion evaluation: "
        "project int8-quantized embeddings through a deterministic ±1 "
        "sign matrix (sign(i,j) from an md5 hash — no stored matrix, "
        "any executor regenerates any entry) at k ∈ {8, 16, 32}, and "
        "measure ‖Pa−Pb‖²/(k·‖a−b‖²) over a deterministic ~9% vector "
        "sample's pairs: the table that tells you how few dimensions "
        "ANN can run in before recall collapses (mean ratio ≈ 1 by the "
        "JL lemma; spread shrinks as k grows). All projections and "
        "squared distances are EXACT integer sums of int8 codes "
        "(order-free — the same trick as emb_dim_stats); each pair "
        "contributes one closed-form division. The pair set is "
        "bounded by the sampling stride, never all-pairs over the "
        "corpus; at scale the sample is the standard estimator for "
        "projection quality before committing the full sweep.",
)
def emb_jl_projection_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    emb.createOrReplaceTempView("embeddings")
    return spark.sql(f"""
    WITH dims AS (
      SELECT vec_id, pos + 1 AS i, qi
      FROM (SELECT vec_id, {_QVEC_SPARK} AS qvec
            FROM embeddings WHERE vec_id % {JL_SAMPLE_MOD} = 1) v
      LATERAL VIEW posexplode(qvec) t AS pos, qi
    ),
    jdom AS (
      SELECT k, explode(sequence(1, k)) AS j
      FROM VALUES ({JL_KS[0]}), ({JL_KS[1]}), ({JL_KS[2]}) AS ks(k)
    ),
    {_jl_core_sql(_JL_HASH_SPARK, "DIV")}
    """)


# ---------------------------------------------------------------------------
# bipartite co-purchase projection (market-basket graph construction)
# ---------------------------------------------------------------------------

COPURCHASE_TOP_E = 50

# shared SQL text: the order-part bipartite graph projects onto parts —
# edge weight = number of DISTINCT orders containing both endpoints.
# DISTINCT first so an order holding two lines of the same part cannot
# double-count a pair; all outputs are exact integers.
_COPURCHASE_SQL = f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM pairs
    GROUP BY p1, p2
    ORDER BY n_orders DESC, p1, p2
    LIMIT {COPURCHASE_TOP_E}
"""


@register(
    "graph_copurchase_projection",
    oracle=_COPURCHASE_SQL,
    doc=f"Bipartite projection (market-basket graph construction): the "
        "order-part incidence projects onto a part-part co-purchase graph "
        "whose edge weight is the number of distinct orders containing "
        f"both endpoints; top {COPURCHASE_TOP_E} edges with deterministic "
        "tie-break. The same construction builds doc-term co-occurrence "
        "or user-item graphs for recommendation / contrastive sampling. "
        "Shape at 100 TB: the self-join groups by l_orderkey whose grain "
        "is BOUNDED by lines-per-order (<= 13 here, 7 in TPC-H spec), so "
        "pair fan-out is O(orders x grain^2) — linear in data, never "
        "quadratic; the final cut is a distributed TakeOrdered, no single-"
        "partition sort.",
)
def graph_copurchase_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")["lineitem"]
    lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(_COPURCHASE_SQL)


# ---------------------------------------------------------------------------
# incremental IVF maintenance: batch assignment against FROZEN centroids +
# cell-occupancy drift (the signal that schedules a recluster)
# ---------------------------------------------------------------------------

_INCR_IVF_ORACLE = f"""
    WITH cent AS (
      SELECT label, i - 1 AS dim,
             round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      WHERE vec_id < {EMB_INCR_SPLIT}
      GROUP BY label, dim
    ),
    cent_norm AS (
      SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label
    ),
    vec_dim AS (
      SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      WHERE vec_id >= {EMB_INCR_SPLIT}
    ),
    vec_norm AS (
      SELECT vec_id, sqrt(sum(x * x)) AS vn FROM vec_dim GROUP BY vec_id
    ),
    scores AS (
      SELECT v.vec_id, c.label,
             round(sum(v.x * c.c) / (vn.vn * cn.cn), 6) AS cellcos
      FROM vec_dim v JOIN cent c USING (dim)
      JOIN vec_norm vn ON vn.vec_id = v.vec_id
      JOIN cent_norm cn ON cn.label = c.label
      GROUP BY v.vec_id, c.label, vn.vn, cn.cn
    ),
    assign AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cellcos DESC, label) AS crk
      FROM scores
    ),
    batch_counts AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_batch
      FROM assign WHERE crk = 1 GROUP BY label
    ),
    exist_counts AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_existing
      FROM embeddings WHERE vec_id < {EMB_INCR_SPLIT} GROUP BY label
    ),
    totals AS (
      SELECT CAST(SUM(n_existing) AS DOUBLE) AS te FROM exist_counts
    ),
    btotals AS (
      SELECT CAST(SUM(n_batch) AS DOUBLE) AS tb FROM batch_counts
    )
    SELECT e.label,
           e.n_existing,
           COALESCE(b.n_batch, 0) AS n_batch,
           e.n_existing + COALESCE(b.n_batch, 0) AS n_total,
           round(CAST(e.n_existing AS DOUBLE) / t.te, 6) AS share_before,
           round(CAST(e.n_existing + COALESCE(b.n_batch, 0) AS DOUBLE)
                 / (t.te + bt.tb), 6) AS share_after,
           round(CAST(e.n_existing + COALESCE(b.n_batch, 0) AS DOUBLE)
                 / (t.te + bt.tb)
                 - CAST(e.n_existing AS DOUBLE) / t.te, 6) AS drift
    FROM exist_counts e
    LEFT JOIN batch_counts b ON b.label = e.label
    CROSS JOIN totals t CROSS JOIN btotals bt
    ORDER BY e.label
"""


@register(
    "sim_incremental_ivf_assign",
    oracle=_INCR_IVF_ORACLE,
    doc="Incremental IVF maintenance — the second index family's twin of "
        "sim_incremental_lsh_index: daily batch vectors are assigned to "
        "the FROZEN existing-corpus centroids (no recluster; the "
        "quantizer is immutable between rebuilds, exactly how production "
        "IVF indexes absorb daily data), and the output is per-cell "
        "occupancy before/after plus the share drift — the monitoring "
        "signal that schedules the next full recluster. Centroids are a "
        "bounded-size broadcast; batch assignment is one broadcast "
        "nested-loop over |batch| x |cells| (both tiny relative to the "
        "corpus), so daily work never touches existing vectors.",
)
def sim_incremental_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT)
    cent = _ivf_centroids(existing)
    vecs = batch.select(
        "vec_id", "embedding",
        F.expr(_NORM.format(col="embedding")).alias("v_norm"),
    )
    scores = vecs.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label",
        F.expr(f"round({_DOT_VC} / (v_norm * c_norm), 6)").alias("cellcos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cellcos"), F.asc("label"))
    assign = (
        scores.withColumn("crk", F.row_number().over(w))
        .filter(F.col("crk") == 1)
    )
    batch_counts = assign.groupBy("label").agg(
        F.count("*").cast("long").alias("n_batch")
    )
    exist_counts = existing.groupBy("label").agg(
        F.count("*").cast("long").alias("n_existing")
    )
    totals = exist_counts.agg(
        F.expr("CAST(SUM(n_existing) AS DOUBLE)").alias("te")
    )
    btotals = batch_counts.agg(
        F.expr("CAST(SUM(n_batch) AS DOUBLE)").alias("tb")
    )
    return (
        exist_counts.join(F.broadcast(batch_counts), "label", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btotals))
        .select(
            "label",
            "n_existing",
            F.coalesce(F.col("n_batch"), F.lit(0).cast("long")).alias("n_batch"),
            (F.col("n_existing")
             + F.coalesce(F.col("n_batch"), F.lit(0).cast("long"))
             ).alias("n_total"),
            F.expr("round(CAST(n_existing AS DOUBLE) / te, 6)")
            .alias("share_before"),
            F.expr(
                "round(CAST(n_existing + COALESCE(n_batch, 0) AS DOUBLE)"
                " / (te + tb), 6)"
            ).alias("share_after"),
            F.expr(
                "round(CAST(n_existing + COALESCE(n_batch, 0) AS DOUBLE)"
                " / (te + tb)"
                " - CAST(n_existing AS DOUBLE) / te, 6)"
            ).alias("drift"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# incremental PQ maintenance (third index family, round 11 — the PQ twin of
# sim_incremental_lsh_index / sim_incremental_ivf_assign)
# ---------------------------------------------------------------------------

_INCR_PQ_ORACLE = f"""
    WITH {_PQ_CTES},
    per AS (
      SELECT m,
             CAST(COUNT(CASE WHEN vec_id < {EMB_INCR_SPLIT} THEN 1 END)
                  AS BIGINT) AS n_existing,
             CAST(COUNT(CASE WHEN vec_id >= {EMB_INCR_SPLIT} THEN 1 END)
                  AS BIGINT) AS n_batch,
             round(CAST(SUM(CASE WHEN vec_id < {EMB_INCR_SPLIT}
                            THEN CAST(sq_err AS DECIMAL(18,6)) END)
                        AS DOUBLE)
                   / COUNT(CASE WHEN vec_id < {EMB_INCR_SPLIT} THEN 1 END),
                   6) AS mse_existing,
             round(CAST(SUM(CASE WHEN vec_id >= {EMB_INCR_SPLIT}
                            THEN CAST(sq_err AS DECIMAL(18,6)) END)
                        AS DOUBLE)
                   / COUNT(CASE WHEN vec_id >= {EMB_INCR_SPLIT} THEN 1 END),
                   6) AS mse_batch
      FROM codes GROUP BY m
    )
    SELECT CAST(m AS INT) AS m, n_existing, n_batch,
           mse_existing, mse_batch,
           round(mse_batch - mse_existing, 6) AS mse_drift
    FROM per ORDER BY m
"""


@register(
    "sim_incremental_pq_assign",
    oracle=_INCR_PQ_ORACLE,
    doc="Incremental PQ maintenance — the third index family's twin of "
        "sim_incremental_lsh_index (LSH) and sim_incremental_ivf_assign "
        "(IVF), closing the r10 verdict's stretch item: daily batch "
        "vectors are assigned PQ codes against the FROZEN existing-corpus "
        "codebook (the quantizer is immutable between retrains, exactly "
        "how production PQ/ADC indexes absorb daily data — the codebook "
        "is a pure function of the existing vec_id < PQ_K rows, so batch "
        "arrival cannot change it), and the output is per-subspace code "
        "occupancy plus the RECONSTRUCTION-ERROR drift: mean squared "
        "sub-vector error of the batch vs the existing corpus under the "
        "same codebook — the monitoring signal that schedules codebook "
        "retraining (a distribution shift in new data shows up as rising "
        "batch MSE before recall degrades). In production the existing "
        "side is a stored index statistic; it is recomputed here so the "
        "oracle can check both sides. Scale shape: the codebook is a "
        "broadcast (PQ_M x PQ_K codewords), batch assignment is one "
        "broadcast join + partial-agg argmin over |batch| x PQ_K, daily "
        "work never touches existing vectors, and the final rollup is "
        "PQ_M rows. DECIMAL-exact error sums keep the drift "
        "engine-deterministic; untouched code rows are byte-stable "
        "(tests/test_incremental_pq_assign.py).",
)
def sim_incremental_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    batch = emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT)
    # the incremental contract by construction: existing codes computed
    # WITHOUT the batch, batch codes against the frozen existing codebook
    exist_codes = _codes_from_scored(_pq_scored_frames(existing, existing))
    batch_codes = _codes_from_scored(_pq_scored_frames(existing, batch))
    codes = (
        exist_codes.withColumn("side", F.lit("e"))
        .unionByName(batch_codes.withColumn("side", F.lit("b")))
    )
    per = codes.groupBy(F.col("m").cast("int").alias("m")).agg(
        F.expr(
            "CAST(COUNT(CASE WHEN side = 'e' THEN 1 END) AS BIGINT)"
        ).alias("n_existing"),
        F.expr(
            "CAST(COUNT(CASE WHEN side = 'b' THEN 1 END) AS BIGINT)"
        ).alias("n_batch"),
        F.expr(
            "round(CAST(SUM(CASE WHEN side = 'e' "
            "THEN CAST(sq_err AS DECIMAL(18,6)) END) AS DOUBLE)"
            " / COUNT(CASE WHEN side = 'e' THEN 1 END), 6)"
        ).alias("mse_existing"),
        F.expr(
            "round(CAST(SUM(CASE WHEN side = 'b' "
            "THEN CAST(sq_err AS DECIMAL(18,6)) END) AS DOUBLE)"
            " / COUNT(CASE WHEN side = 'b' THEN 1 END), 6)"
        ).alias("mse_batch"),
    )
    return per.select(
        "m", "n_existing", "n_batch", "mse_existing", "mse_batch",
        F.expr("round(mse_batch - mse_existing, 6)").alias("mse_drift"),
    ).orderBy("m")


# ---------------------------------------------------------------------------
# streaming incremental-index ingest (round 11): the LSH index maintained
# through REAL Structured Streaming micro-batches — the production shape
# ---------------------------------------------------------------------------

_LSH_INDEX_COLS = ["vec_id", "band_id", "band_val", "norm", "embedding"]


@register(
    "stream_incremental_lsh_ingest",
    oracle=_INCR_LSH_ORACLE,
    doc="Streaming incremental ANN-index ingest: the daily vector batch "
        "arrives as a Structured Streaming file source split across "
        "several micro-batches (maxFilesPerTrigger=1, availableNow + "
        "checkpoint); each micro-batch (a) computes its band rows from "
        "the micro-batch ALONE, appends them to the persistent on-disk "
        "index (the maintenance write), and (b) probes them against the "
        "index SNAPSHOT frozen at stream start (the exact file list — "
        "appends from earlier micro-batches stay invisible, preserving "
        "the batch operator's batch-vs-existing contract). Per-vector "
        "probes are independent, so the union over micro-batches is "
        "hash-identical to sim_incremental_lsh_index — SAME oracle, "
        "proving the streaming path end-to-end, micro-batch boundaries "
        "and all. This is the shape a production pipeline runs: a "
        "continuous feed maintaining + querying a persistent index, not "
        "a nightly rebuild.",
)
def stream_incremental_lsh_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    artifact_base_dir: "str | None" = None,
) -> DataFrame:
    import glob
    import os
    import tempfile

    emb = load(spark, sf_dir, "embeddings")["embeddings"]

    # artifact layout: under ``artifact_base_dir`` when the caller wants
    # to inspect THIS run's artifacts (tests), else fresh temp dirs
    if artifact_base_dir is not None:
        index_dir = os.path.join(artifact_base_dir, "index")
        in_dir = os.path.join(artifact_base_dir, "in")
        out_dir = os.path.join(artifact_base_dir, "out")
        ckpt_dir = os.path.join(artifact_base_dir, "ckpt")
        for d in (index_dir, in_dir, out_dir):
            os.makedirs(d, exist_ok=True)
    else:
        index_dir = tempfile.mkdtemp(prefix="stream_lsh_index_")
        in_dir = tempfile.mkdtemp(prefix="stream_lsh_in_")
        out_dir = tempfile.mkdtemp(prefix="stream_lsh_out_")
        ckpt_dir = tempfile.mkdtemp(prefix="stream_lsh_ckpt_")

    # the persistent index artifact (existing corpus only), written once
    _lsh_band_rows(
        emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)
    ).select(*_LSH_INDEX_COLS).write.mode("overwrite").parquet(index_dir)
    # freeze the snapshot by EXPLICIT file list: spark.read over the
    # directory would lazily pick up this stream's own appends
    snapshot_files = sorted(
        glob.glob(os.path.join(index_dir, "*.parquet"))
    )
    index_snapshot = spark.read.parquet(*snapshot_files)

    # the arriving batch, split into several files -> several micro-batches
    emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT).repartition(4).write.mode(
        "overwrite"
    ).parquet(in_dir)
    raw_schema = emb.schema

    def process(batch_df, _batch_id) -> None:
        batch_bands = _lsh_band_rows(batch_df)
        # maintenance write: append this micro-batch's band rows
        batch_bands.select(*_LSH_INDEX_COLS).write.mode("append").parquet(
            index_dir
        )
        # probe against the frozen snapshot
        _incr_lsh_probe(batch_bands, index_snapshot).write.mode(
            "append"
        ).parquet(out_dir)

    query = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.read.parquet(out_dir)


@register(
    "stream_incremental_pq_ingest",
    oracle=_INCR_PQ_ORACLE,
    doc="Streaming incremental PQ-index ingest — completes the round-11 "
        "matrix: all three index families (LSH, BM25, PQ) now maintained "
        "under REAL Structured Streaming. The daily vector batch arrives "
        "as a streaming file source over several micro-batches "
        "(maxFilesPerTrigger=1, availableNow + checkpoint); each "
        "micro-batch assigns PQ codes against the FROZEN existing-corpus "
        "codebook (immutable between retrains — a pure function of the "
        "existing vec_id < PQ_K rows, which the stream never touches), "
        "appends its per-vector code rows to the persistent code store "
        "(old files byte-stable), and appends PQ_M mergeable stats rows "
        "(count + DECIMAL-exact squared-error sum per subspace — both "
        "additive). After the drain the reconstruction-error drift table "
        "is computed from the ARTIFACTS alone: stored existing-side stats "
        "+ the SUM of per-micro-batch rows. Same oracle as "
        "sim_incremental_pq_assign (full recompute), so the hash gate "
        "proves the mergeable-stats law holds across micro-batch "
        "boundaries chosen by the stream. Scale shape: codebook "
        "broadcast, per-batch work O(|micro-batch| x PQ_M x PQ_K), "
        "existing side never rescanned by the stream, final rollup PQ_M "
        "rows.",
)
def stream_incremental_pq_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    artifact_base_dir: "str | None" = None,
) -> DataFrame:
    import os
    import tempfile

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)

    if artifact_base_dir is not None:
        codes_dir = os.path.join(artifact_base_dir, "codes")
        stats_dir = os.path.join(artifact_base_dir, "stats")
        in_dir = os.path.join(artifact_base_dir, "in")
        ckpt_dir = os.path.join(artifact_base_dir, "ckpt")
        for d in (codes_dir, stats_dir, in_dir):
            os.makedirs(d, exist_ok=True)
    else:
        codes_dir = tempfile.mkdtemp(prefix="stream_pq_codes_")
        stats_dir = tempfile.mkdtemp(prefix="stream_pq_stats_")
        in_dir = tempfile.mkdtemp(prefix="stream_pq_in_")
        ckpt_dir = tempfile.mkdtemp(prefix="stream_pq_ckpt_")

    def side_stats(codes):
        # mergeable per-subspace stats: counts and DECIMAL-exact error
        # sums are both additive across arbitrary row splits
        return codes.groupBy(F.col("m").cast("int").alias("m")).agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
            F.expr(
                "CAST(SUM(CAST(sq_err AS DECIMAL(18,6))) AS DECIMAL(38,6))"
            ).alias("sum_sq"),
        )

    # persistent artifacts: existing-side code store + ONE stats row per
    # subspace (what a production index keeps instead of rescanning)
    exist_codes = _codes_from_scored(_pq_scored_frames(existing, existing))
    exist_codes.write.mode("overwrite").parquet(f"{codes_dir}/existing")
    side_stats(exist_codes).write.mode("overwrite").parquet(
        f"{stats_dir}/existing"
    )

    # the arriving batch, split into several files -> several micro-batches
    emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT).repartition(4).write.mode(
        "overwrite"
    ).parquet(in_dir)
    raw_schema = emb.schema

    def process(batch_df, _batch_id) -> None:
        batch_codes = _codes_from_scored(
            _pq_scored_frames(existing, batch_df)
        )
        # maintenance write: append this micro-batch's code rows
        batch_codes.write.mode("append").parquet(f"{codes_dir}/batch")
        # ... and PQ_M mergeable stats rows
        side_stats(batch_codes).write.mode("append").parquet(
            f"{stats_dir}/batches"
        )

    query = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    if not os.path.isdir(f"{stats_dir}/batches"):
        raise RuntimeError(
            "stream_incremental_pq_ingest: stream drained without any "
            "micro-batch writing the stats artifact — empty input split?"
        )

    # drift table from the ARTIFACTS: stored existing rows + the additive
    # merge of per-micro-batch rows (micro-batch boundaries were chosen
    # by the stream, not by us)
    e = spark.read.parquet(f"{stats_dir}/existing").select(
        "m",
        F.col("n").alias("n_existing"),
        F.col("sum_sq").alias("sum_sq_e"),
    )
    b = (
        spark.read.parquet(f"{stats_dir}/batches")
        .groupBy("m")
        .agg(
            F.expr("CAST(SUM(n) AS BIGINT)").alias("n_batch"),
            F.expr("CAST(SUM(sum_sq) AS DECIMAL(38,6))").alias("sum_sq_b"),
        )
    )
    return (
        e.join(b, "m")
        .select(
            "m",
            "n_existing",
            "n_batch",
            F.expr(
                "round(CAST(sum_sq_e AS DOUBLE) / n_existing, 6)"
            ).alias("mse_existing"),
            F.expr(
                "round(CAST(sum_sq_b AS DOUBLE) / n_batch, 6)"
            ).alias("mse_batch"),
        )
        .select(
            "*",
            F.expr("round(mse_batch - mse_existing, 6)").alias("mse_drift"),
        )
        .orderBy("m")
    )


def _ivf_centroids(existing: DataFrame) -> DataFrame:
    """Frozen-quantizer centroids: a pure function of the existing corpus
    (per-label dimension means, rounded) — shared by the batch and
    streaming incremental IVF operators."""
    return (
        existing.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
        .groupBy("label")
        .agg(F.expr(
            "transform(sort_array(collect_list(struct(dim, c))), s -> s.c)"
        ).alias("centroid"))
        .select("label", "centroid",
                F.expr(_NORM.format(col="centroid")).alias("c_norm"))
    )


@register(
    "stream_incremental_ivf_ingest",
    oracle=_INCR_IVF_ORACLE,
    doc="Streaming incremental IVF ingest — the fifth and final index "
        "family in the streaming-maintenance matrix (LSH, BM25, PQ, "
        "minhash, IVF): the daily vector batch arrives as a Structured "
        "Streaming file source over several micro-batches "
        "(maxFilesPerTrigger=1, availableNow + checkpoint); each "
        "micro-batch assigns its vectors to the FROZEN existing-corpus "
        "centroids (the quantizer is immutable between reclusters and a "
        "pure function of existing data the stream never touches), "
        "appends the per-vector cell assignments to the persistent "
        "inverted-list artifact (old part files byte-stable) and ONE set "
        "of mergeable per-cell count rows. After the drain, the cell-"
        "occupancy drift table is computed from the ARTIFACTS alone: "
        "stored existing-side counts + the SUM of per-micro-batch rows. "
        "Same oracle as sim_incremental_ivf_assign, so the hash gate "
        "proves the additive-count law across stream-chosen micro-batch "
        "boundaries. Scale shape: centroid broadcast, per-batch work "
        "O(|micro-batch| x |cells|), final rollup |cells| rows.",
)
def stream_incremental_ivf_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    artifact_base_dir: "str | None" = None,
) -> DataFrame:
    import os
    import tempfile

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    existing = emb.filter(F.col("vec_id") < EMB_INCR_SPLIT)

    if artifact_base_dir is not None:
        assign_dir = os.path.join(artifact_base_dir, "assign")
        stats_dir = os.path.join(artifact_base_dir, "stats")
        in_dir = os.path.join(artifact_base_dir, "in")
        ckpt_dir = os.path.join(artifact_base_dir, "ckpt")
        for d in (assign_dir, stats_dir, in_dir):
            os.makedirs(d, exist_ok=True)
    else:
        assign_dir = tempfile.mkdtemp(prefix="stream_ivf_assign_")
        stats_dir = tempfile.mkdtemp(prefix="stream_ivf_stats_")
        in_dir = tempfile.mkdtemp(prefix="stream_ivf_in_")
        ckpt_dir = tempfile.mkdtemp(prefix="stream_ivf_ckpt_")

    cent = _ivf_centroids(existing)

    # persistent artifacts: existing-side per-cell counts (what a
    # production index keeps as list lengths)
    existing.groupBy("label").agg(
        F.count("*").cast("long").alias("n_existing")
    ).write.mode("overwrite").parquet(f"{stats_dir}/existing")

    emb.filter(F.col("vec_id") >= EMB_INCR_SPLIT).repartition(4).write.mode(
        "overwrite"
    ).parquet(in_dir)
    raw_schema = emb.schema

    def assign(batch_df):
        vecs = batch_df.select(
            "vec_id", "embedding",
            F.expr(_NORM.format(col="embedding")).alias("v_norm"),
        )
        scores = vecs.crossJoin(F.broadcast(cent)).select(
            "vec_id", "label",
            F.expr(f"round({_DOT_VC} / (v_norm * c_norm), 6)")
            .alias("cellcos"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cellcos"), F.asc("label")
        )
        return (
            scores.withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") == 1)
            .select("vec_id", "label", "cellcos")
        )

    def process(batch_df, _batch_id) -> None:
        a = assign(batch_df)
        # maintenance write: append this micro-batch's inverted-list rows
        a.write.mode("append").parquet(assign_dir)
        # ... and mergeable per-cell count rows
        a.groupBy("label").agg(
            F.count("*").cast("long").alias("n")
        ).write.mode("append").parquet(f"{stats_dir}/batches")

    query = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    if not os.path.isdir(f"{stats_dir}/batches"):
        raise RuntimeError(
            "stream_incremental_ivf_ingest: stream drained without any "
            "micro-batch writing the stats artifact — empty input split?"
        )

    # drift table from the ARTIFACTS: stored existing counts + the
    # additive merge of per-micro-batch count rows
    exist_counts = spark.read.parquet(f"{stats_dir}/existing")
    batch_counts = (
        spark.read.parquet(f"{stats_dir}/batches")
        .groupBy("label")
        .agg(F.expr("CAST(SUM(n) AS BIGINT)").alias("n_batch"))
    )
    totals = exist_counts.agg(
        F.expr("CAST(SUM(n_existing) AS DOUBLE)").alias("te")
    )
    btotals = batch_counts.agg(
        F.expr("CAST(SUM(n_batch) AS DOUBLE)").alias("tb")
    )
    return (
        exist_counts.join(F.broadcast(batch_counts), "label", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btotals))
        .select(
            "label",
            "n_existing",
            F.coalesce(F.col("n_batch"), F.lit(0).cast("long"))
            .alias("n_batch"),
            (F.col("n_existing")
             + F.coalesce(F.col("n_batch"), F.lit(0).cast("long"))
             ).alias("n_total"),
            F.expr("round(CAST(n_existing AS DOUBLE) / te, 6)")
            .alias("share_before"),
            F.expr(
                "round(CAST(n_existing + COALESCE(n_batch, 0) AS DOUBLE)"
                " / (te + tb), 6)"
            ).alias("share_after"),
            F.expr(
                "round(CAST(n_existing + COALESCE(n_batch, 0) AS DOUBLE)"
                " / (te + tb)"
                " - CAST(n_existing AS DOUBLE) / te, 6)"
            ).alias("drift"),
        )
        .orderBy("label")
    )


#: neighbors consulted by the kNN label vote
KNN_VOTE_K = 5
#: per-(band, bucket) cap on REFERENCE postings in the LSH-bucketed
#: classifier — the MinHash posting-cap discipline: bounds per-query
#: candidate fan-out at PLANE_BANDS x cap whatever the reference size,
#: so bucket joins stay linear in the query side (lowest-vec_id keep
#: rule = deterministic in both engines)
KNN_BUCKET_CAP = 64


#: confusion-matrix oracle shared by the batch and streaming kNN
#: classifiers (identical result contract)
_KNN_CLASSIFIER_ORACLE = f"""
    WITH scored AS (
      SELECT a.vec_id AS q_id, a.label AS true_label,
             b.vec_id AS n_id, b.label AS n_label,
             round({COS_DUCK}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id % 2 = 0
      WHERE a.vec_id % 2 = 1
    ),
    ranked AS (
      SELECT q_id, true_label, n_label,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, n_id) AS rk
      FROM scored
    ),
    votes AS (
      SELECT q_id, true_label, n_label, COUNT(*) AS v
      FROM ranked WHERE rk <= {KNN_VOTE_K}
      GROUP BY q_id, true_label, n_label
    ),
    pred AS (
      SELECT q_id, true_label, n_label AS pred_label FROM (
        SELECT q_id, true_label, n_label,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY v DESC, n_label) AS pr
        FROM votes
      ) WHERE pr = 1
    )
    SELECT CAST(true_label AS INT) AS true_label,
           CAST(pred_label AS INT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM pred GROUP BY 1, 2
    """


@register(
    "sim_knn_classifier",
    oracle=_KNN_CLASSIFIER_ORACLE,
    doc=f"kNN label classifier over the embedding column — the "
        "supervised consumable of the similarity family (the ANN "
        "indexes find neighbors; this is what a labeling pipeline DOES "
        "with them): even vec_ids are the labeled reference set, each "
        "odd vec_id is classified by majority label among its "
        f"{KNN_VOTE_K} nearest reference vectors (exact cosine, 6dp-"
        "rounded with neighbor-id tie-break — the sim_knn_bruteforce "
        "discipline; vote ties break to the smallest label), rolled up "
        "into a true-vs-predicted confusion matrix. Scale shape: the "
        "REFERENCE side broadcasts (it is the curated labeled set — "
        "small by construction); scoring is one pass over query "
        "vectors + a per-query window, so the plan is the brute-force "
        "kNN plan with a vote rollup; swap the scored CTE for the "
        "IVF/LSH candidate sets (sim_ann_ivf_topk / sim_ann_lsh_topk) "
        "when the reference set outgrows a broadcast.",
)
def sim_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    pred = _knn_vote_predict(
        emb.filter(F.col("vec_id") % 2 == 1), _knn_reference(emb)
    )
    return (
        pred.groupBy(
            F.col("true_label").cast("int").alias("true_label"),
            F.col("n_label").cast("int").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


def _knn_reference(emb: DataFrame) -> DataFrame:
    """The labeled reference half (even vec_ids) with hoisted norms."""
    return emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("b_emb"),
        F.expr(_NORM.format(col="embedding")).alias("b_norm"),
    )


def _knn_vote_predict(queries: DataFrame, ref: DataFrame) -> DataFrame:
    """Majority-vote kNN prediction for query vectors against the
    broadcast reference: returns (q_id, true_label, n_label) with
    n_label the winning vote. Per-query independent — the streaming
    classifier applies it per micro-batch unchanged."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
    )
    scored = q.join(F.broadcast(ref)).select(
        "q_id", "true_label", "n_id", "n_label",
        F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)").alias("cosine"),
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("n_id")
    )
    votes = (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= KNN_VOTE_K)
        .groupBy("q_id", "true_label", "n_label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w_vote = Window.partitionBy("q_id").orderBy(
        F.desc("v"), F.asc("n_label")
    )
    return (
        votes.withColumn("pr", F.row_number().over(w_vote))
        .filter(F.col("pr") == 1)
        .select("q_id", "true_label", "n_label")
    )


@register(
    "stream_knn_classify",
    oracle=_KNN_CLASSIFIER_ORACLE,
    doc="Streaming kNN labeling — the supervised consumable joins the "
        "streaming matrix: the labeled reference half is frozen and "
        "BROADCAST (localCheckpoint so micro-batches reuse the computed "
        "norms); query vectors arrive as a Structured Streaming file "
        "source over several micro-batches (maxFilesPerTrigger=1, "
        "availableNow + checkpoint) and each is classified "
        "independently by the same majority-vote ranking as "
        "sim_knn_classifier — per-vector decisions depend only on the "
        "frozen reference, so the union over micro-batches equals the "
        "batch classifier by construction, proven through the shared "
        "oracle's hash gate. The production shape for labeling a "
        "vector firehose: ship the curated labeled set to the stream, "
        "zero wide shuffles per micro-batch.",
)
def stream_knn_classify(
    spark: SparkSession,
    sf_dir: str,
    *,
    artifact_base_dir: "str | None" = None,
) -> DataFrame:
    import os
    import tempfile

    emb = load(spark, sf_dir, "embeddings")["embeddings"]

    if artifact_base_dir is not None:
        preds_dir = os.path.join(artifact_base_dir, "preds")
        in_dir = os.path.join(artifact_base_dir, "in")
        ckpt_dir = os.path.join(artifact_base_dir, "ckpt")
        for d in (preds_dir, in_dir):
            os.makedirs(d, exist_ok=True)
    else:
        preds_dir = tempfile.mkdtemp(prefix="stream_knn_preds_")
        in_dir = tempfile.mkdtemp(prefix="stream_knn_in_")
        ckpt_dir = tempfile.mkdtemp(prefix="stream_knn_ckpt_")

    ref = _knn_reference(emb).localCheckpoint(eager=True)

    spark.range(0).select(
        F.col("id").alias("q_id"),
        F.col("id").cast("int").alias("true_label"),
        F.col("id").cast("int").alias("n_label"),
    ).write.mode("overwrite").parquet(preds_dir)

    emb.filter(F.col("vec_id") % 2 == 1).repartition(4).write.mode(
        "overwrite"
    ).parquet(in_dir)

    def process(batch_df, _batch_id) -> None:
        _knn_vote_predict(batch_df, ref).select(
            "q_id",
            F.col("true_label").cast("int").alias("true_label"),
            F.col("n_label").cast("int").alias("n_label"),
        ).write.mode("append").parquet(preds_dir)

    from ..streaming import await_drained

    query = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)

    return (
        spark.read.parquet(preds_dir)
        .groupBy(
            F.col("true_label").cast("int").alias("true_label"),
            F.col("n_label").cast("int").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


@register(
    "sim_ann_knn_classifier",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, label, {_signature_duck('embedding')} AS sig
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id, label, band_id,
             (sig >> (band_id * {_BITS})) & {(1 << _BITS) - 1} AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range({PLANE_BANDS})) AS band_id
      ) bs
    ),
    ref_posts AS (
      SELECT band_id, band_val, vec_id, label FROM (
        SELECT band_id, band_val, vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY band_id, band_val
                                  ORDER BY vec_id) AS pn
        FROM bands WHERE vec_id % 2 = 0
      ) WHERE pn <= 64
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS q_id, x.label AS true_label,
             y.vec_id AS n_id, y.label AS n_label
      FROM bands x JOIN ref_posts y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
      WHERE x.vec_id % 2 = 1
    ),
    scored AS (
      SELECT cand.q_id, cand.true_label, cand.n_id, cand.n_label,
             round({COS_DUCK}, 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.q_id
      JOIN embeddings b ON b.vec_id = cand.n_id
    ),
    ranked AS (
      SELECT q_id, true_label, n_label,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, n_id) AS rk
      FROM scored
    ),
    votes AS (
      SELECT q_id, true_label, n_label, COUNT(*) AS v
      FROM ranked WHERE rk <= {KNN_VOTE_K}
      GROUP BY q_id, true_label, n_label
    ),
    pred AS (
      SELECT q_id, true_label, n_label AS pred_label FROM (
        SELECT q_id, true_label, n_label,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY v DESC, n_label) AS pr
        FROM votes
      ) WHERE pr = 1
    )
    SELECT CAST(true_label AS INT) AS true_label,
           CAST(pred_label AS INT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM pred GROUP BY 1, 2
    """,
    doc="LSH-bucketed kNN label classifier — the SCALE PATH for "
        "sim_knn_classifier (whose brute-force query x reference join "
        "is quadratic when both sides grow — measured 39x time at 10x "
        "data): candidate neighbors come from shared random-hyperplane "
        "band buckets (the sim_ann_lsh_topk construction, md5-derived "
        "planes so the DuckDB oracle reproduces the exact candidate "
        "sets), then the same exact-cosine vote over the top-"
        f"{KNN_VOTE_K} candidates. Queries with no bucket collision "
        "against the reference half get no prediction (they drop from "
        "the confusion rollup — the recall trade ANN always makes; "
        "sim_ann_recall_eval quantifies it for this index family). "
        "Scale shape: one band-key shuffle joins the halves — no "
        "all-pairs, no broadcast of the full reference — so both sides "
        "can grow; per-bucket fan-out is bounded by the 4-bit band "
        "domain x posting caps upstream.",
)
def sim_ann_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    sig = emb.select(
        "vec_id", "label", "embedding",
        F.expr(_signature_expr("embedding")).alias("sig"),
    )
    bits = N_PLANES // PLANE_BANDS
    bands = sig.select(
        "vec_id", "label", "embedding",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.expr(
                        f"(sig >> {b * bits}) & {(1 << bits) - 1}"
                    ).alias("band_val"),
                )
                for b in range(PLANE_BANDS)
            ])
        ).alias("bk"),
    ).select("vec_id", "label", "embedding", "bk.band_id", "bk.band_val")
    q = bands.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("a_emb"),
        F.expr(_NORM.format(col="embedding")).alias("a_norm"),
        "band_id", "band_val",
    )
    w_cap = Window.partitionBy("band_id", "band_val").orderBy("vec_id")
    c = (
        bands.filter(F.col("vec_id") % 2 == 0)
        .withColumn("pn", F.row_number().over(w_cap))
        .filter(F.col("pn") <= KNN_BUCKET_CAP)
        .select(
            F.col("vec_id").alias("n_id"),
            F.col("label").alias("n_label"),
            F.col("embedding").alias("b_emb"),
            F.expr(_NORM.format(col="embedding")).alias("b_norm"),
            "band_id", "band_val",
        )
    )
    scored = (
        q.join(c, ["band_id", "band_val"])
        .dropDuplicates(["q_id", "n_id"])
        .select(
            "q_id", "true_label", "n_id", "n_label",
            F.expr(f"round({_DOT_AB} / (a_norm * b_norm), 6)")
            .alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("n_id")
    )
    votes = (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= KNN_VOTE_K)
        .groupBy("q_id", "true_label", "n_label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w_vote = Window.partitionBy("q_id").orderBy(
        F.desc("v"), F.asc("n_label")
    )
    return (
        votes.withColumn("pr", F.row_number().over(w_vote))
        .filter(F.col("pr") == 1)
        .groupBy(
            F.col("true_label").cast("int").alias("true_label"),
            F.col("n_label").cast("int").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )
