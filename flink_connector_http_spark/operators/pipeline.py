"""End-to-end training-data pipeline composition: the single-DAG version
of the full document-preparation flow this engine exists to run at 100 TB —

    exact dedup → quality gate → repetition gate → per-(lang, source)
    acceptance accounting

Each stage reuses the SAME expression text as its standalone operator
(``operators/text.py``, ``operators/dedup.py``), so this query is the proof
that the pieces compose into one Catalyst plan: two shuffles total (content
hash for the dedup keep-rule, (doc_id, token) for the mode computation)
plus the final tiny aggregation — no materialization barriers between
stages, which is what lets Spark pipeline a multi-stage corpus clean-up in
one pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import load, register
from ..streaming import await_drained
from .text import (
    REP_DUP_SHINGLE_RATIO,
    REP_TOP_TOKEN_FRAC,
    SHINGLES_DUCK,
    SHINGLES_SPARK,
    TOKS_DUCK,
    TOKS_SPARK,
    duck_token_exprs,
    spark_token_exprs,
)

_S = spark_token_exprs()
_D = duck_token_exprs()

# the quality gate, verbatim from text_quality_filter
_QUALITY_SPARK = (
    f"{_S['n_tokens']} BETWEEN 20 AND 2000"
    f" AND CAST({_S['n_uniq_tokens']} AS DOUBLE) / {_S['n_tokens']} >= 0.15"
    f" AND CAST({_S['sum_token_len']} AS DOUBLE) / {_S['n_tokens']} BETWEEN 2.0 AND 12.0"
)
_QUALITY_DUCK = (
    f"{_D['n_tokens']} BETWEEN 20 AND 2000"
    f" AND CAST({_D['n_uniq_tokens']} AS DOUBLE) / {_D['n_tokens']} >= 0.15"
    f" AND CAST({_D['sum_token_len']} AS DOUBLE) / {_D['n_tokens']} BETWEEN 2.0 AND 12.0"
)

# the repetition gate, verbatim from text_repetition_stats
_REP_DUP_SPARK = (
    f"CAST(size({SHINGLES_SPARK}) - size(array_distinct({SHINGLES_SPARK})) AS DOUBLE)"
    f" / greatest(size({SHINGLES_SPARK}), 1) > {REP_DUP_SHINGLE_RATIO}"
)
_REP_DUP_DUCK = (
    f"CAST(len({SHINGLES_DUCK}) - len(list_distinct({SHINGLES_DUCK})) AS DOUBLE)"
    f" / greatest(len({SHINGLES_DUCK}), 1) > {REP_DUP_SHINGLE_RATIO}"
)


@register(
    "pipeline_corpus_summary",
    oracle=f"""
    WITH keep AS (
      SELECT MIN(doc_id) AS keep_id
      FROM documents GROUP BY md5(lower(text))
    ),
    tc AS (
      SELECT doc_id, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({TOKS_DUCK}) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    top AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(MAX(c) AS BIGINT) AS top_cnt
      FROM tc GROUP BY doc_id
    ),
    flagged AS (
      SELECT d.lang, d.source, top.n_tokens,
             CASE
               WHEN keep.keep_id IS NULL THEN 'duplicate'
               WHEN NOT ({_QUALITY_DUCK}) THEN 'quality'
               WHEN CAST(top_cnt AS DOUBLE) / top.n_tokens > {REP_TOP_TOKEN_FRAC}
                    OR {_REP_DUP_DUCK} THEN 'repetition'
               ELSE 'kept'
             END AS stage
      FROM documents d
      JOIN top ON top.doc_id = d.doc_id
      LEFT JOIN keep ON keep.keep_id = d.doc_id
    )
    SELECT lang, source, stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM flagged
    GROUP BY lang, source, stage
    """,
    doc="The whole corpus-preparation pipeline as ONE Catalyst DAG: "
        "first-failing-stage attribution (duplicate → quality → "
        "repetition → kept) per (lang, source), with token totals. Stage "
        "predicates are the standalone operators' expressions verbatim; "
        "the dedup keep-rule is a broadcast semi-join of kept ids, so the "
        "full clean-up costs two shuffles on 100 TB, not one job per gate.",
)
def pipeline_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    keep = (
        docs.groupBy(F.expr("md5(lower(text))").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    top = (
        docs.select("doc_id", F.explode(F.expr(TOKS_SPARK)).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.max("c").cast("bigint").alias("top_cnt"),
        )
    )
    flagged = (
        docs.join(top, "doc_id")
        .join(
            F.broadcast(keep),
            docs["doc_id"] == keep["keep_id"],
            "left",
        )
        .select(
            "lang", "source", "n_tokens",
            F.expr(
                f"CASE "
                f"WHEN keep_id IS NULL THEN 'duplicate' "
                f"WHEN NOT ({_QUALITY_SPARK}) THEN 'quality' "
                f"WHEN CAST(top_cnt AS DOUBLE) / n_tokens > {REP_TOP_TOKEN_FRAC} "
                f"OR {_REP_DUP_SPARK} THEN 'repetition' "
                f"ELSE 'kept' END"
            ).alias("stage"),
        )
    )
    return flagged.groupBy("lang", "source", "stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# hybrid search: lexical + vector retrieval fused with RRF
# ---------------------------------------------------------------------------

SEARCH_TERMS = ("hash", "join", "scan")  # the lexical query
SEARCH_QVEC_ID = 0                       # embedding of doc 0 = vector query
RRF_K = 60
CAND_N = 100                             # per-retriever candidate depth
FINAL_K = 20

_TERM_LIST = "('" + "', '".join(SEARCH_TERMS) + "')"
#: term-frequency of the query terms in a doc (integer, exact)
_TF_SPARK = f"size(filter(split(lower(text), ' '), t -> t IN {_TERM_LIST}))"
_TF_DUCK = f"len(list_filter(string_split(lower(text), ' '), t -> t IN {_TERM_LIST}))"


@register(
    "search_hybrid_rrf",
    # Reciprocal-rank fusion: score = Σ 1/(k + rank_i) over the retrievers
    # that returned the doc. Rank-based fusion keeps determinism trivial —
    # ranks are integers from ties-broken orderings, and the only float op
    # is one per-row formula (no cross-row float accumulation).
    oracle=f"""
    WITH lex_top AS (
      SELECT doc_id, tf FROM (
        SELECT doc_id, {_TF_DUCK} AS tf FROM documents
      ) t WHERE tf > 0
      ORDER BY tf DESC, doc_id LIMIT {CAND_N}
    ),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS r_lex
      FROM lex_top
    ),
    q AS (
      SELECT embedding AS qv,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
      FROM embeddings WHERE vec_id = {SEARCH_QVEC_ID}
    ),
    vec_top AS (
      SELECT vec_id AS doc_id,
             round(list_sum(list_transform(range(1, 65),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
                   / (qn * sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
               AS cosine
      FROM embeddings, q
      WHERE vec_id <> {SEARCH_QVEC_ID}
      ORDER BY cosine DESC, doc_id LIMIT {CAND_N}
    ),
    vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_vec
      FROM vec_top
    )
    SELECT doc_id, r_lex, r_vec, rrf, rk FROM (
      SELECT doc_id, r_lex, r_vec, rrf,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rk
      FROM (
        SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
               lex.r_lex, vec.r_vec,
               round(COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + r_lex), CAST(0 AS DOUBLE))
                     + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + r_vec), CAST(0 AS DOUBLE)), 6) AS rrf
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
      ) fused
    ) ranked WHERE rk <= {FINAL_K}
    """,
    doc="Hybrid retrieval: term-frequency lexical ranking over documents "
        "and cosine vector ranking over embeddings, fused with reciprocal-"
        "rank fusion (k=60). Scale shape: each retriever is a full scan "
        "into TakeOrderedAndProject (per-partition heap top-100 — never a "
        "global sort), ranks assigned on the 100-row candidate sets, "
        "full-outer fuse on a tiny set. The retrieval join pattern of a "
        "RAG data pipeline, end-to-end deterministic.",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load(spark, sf_dir, "documents", "embeddings")
    docs, emb = t["documents"], t["embeddings"]

    lex_top = (
        docs.select("doc_id", F.expr(_TF_SPARK).alias("tf"))
        .filter(F.col("tf") > 0)
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(CAND_N)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("tf"), F.asc("doc_id")))
        .alias("r_lex"),
    )

    norm = (
        "sqrt(aggregate(transform({col}, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v))"
    )
    q = emb.filter(F.col("vec_id") == SEARCH_QVEC_ID).select(
        F.col("embedding").alias("qv"),
        F.expr(norm.format(col="embedding")).alias("qn"),
    )
    vec_top = (
        emb.filter(F.col("vec_id") != SEARCH_QVEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(
                "round(aggregate(zip_with(qv, embedding, "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "CAST(0 AS DOUBLE), (a, v) -> a + v) / (qn * "
                + norm.format(col="embedding")
                + "), 6)"
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(CAND_N)
    )
    vec = vec_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc("doc_id")))
        .alias("r_vec"),
    )

    fused = (
        lex.withColumnRenamed("doc_id", "l_id")
        .join(vec.withColumnRenamed("doc_id", "v_id"),
              F.col("l_id") == F.col("v_id"), "full_outer")
        .select(
            F.coalesce(F.col("l_id"), F.col("v_id")).alias("doc_id"),
            "r_lex", "r_vec",
            F.expr(
                f"round(COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + r_lex), "
                f"CAST(0 AS DOUBLE)) "
                f"+ COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + r_vec), "
                f"CAST(0 AS DOUBLE)), 6)"
            ).alias("rrf"),
        )
    )
    return (
        fused.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("rrf"), F.asc("doc_id"))),
        )
        .filter(F.col("rk") <= FINAL_K)
        .select("doc_id", "r_lex", "r_vec", "rrf", "rk")
    )


# ---------------------------------------------------------------------------
# corpus materialization: the actual kept set, with per-doc verdict trail
# ---------------------------------------------------------------------------

#: deterministic temperature mix over lang, verbatim from
#: sample_temperature_mix (alpha = 0.5, sqrt for IEEE exactness) —
#: imported so the two operators cannot silently drift apart
from .text import MIX_SCALE as _MANIFEST_SCALE  # noqa: E402
from .text import TEMP_TARGET as _MANIFEST_TARGET  # noqa: E402


@register(
    "pipeline_corpus_manifest",
    oracle=f"""
    WITH survivors AS (
      SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY md5(lower(text))
                                  ORDER BY doc_id) AS copy_rank
        FROM documents
        WHERE {_QUALITY_DUCK} AND NOT ({_REP_DUP_DUCK})
      ) t WHERE copy_rank = 1
    ),
    counts AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM survivors GROUP BY lang
    ),
    z AS (SELECT SUM(sqrt(cnt)) AS denom FROM counts),
    thr AS (
      SELECT lang,
             CAST(floor(least(1.0,
                 {_MANIFEST_TARGET} * sqrt(cnt)
                 / (SELECT denom FROM z) / cnt) * {_MANIFEST_SCALE}) AS BIGINT)
               AS keep_thr
      FROM counts
    )
    SELECT s.doc_id, s.lang, s.source
    FROM survivors s JOIN thr USING (lang)
    WHERE ('0x' || substr(md5(concat('manifest:', s.doc_id)), 1, 8))::BIGINT
          % {_MANIFEST_SCALE} < thr.keep_thr
    """,
    doc="Corpus manifest materialization — the capstone composition that "
        "emits the ACTUAL training set, not statistics about it: quality "
        "gate and repetition gate as pushed scan filters, exact dedup as "
        "a keep-first-copy window on the content hash, then "
        "temperature-scaled language mixing over the survivors (rates "
        "computed from post-filter counts, as a real corpus build must). "
        "One content-hash shuffle + one tiny census aggregate; every "
        "stage reuses its standalone operator's expression text verbatim, "
        "and the whole flow stays one Catalyst plan with no "
        "materialization barrier.",
    bench=True,
)
def pipeline_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    gated = docs.filter(
        F.expr(f"({_QUALITY_SPARK}) AND NOT ({_REP_DUP_SPARK})")
    ).select("doc_id", "lang", "source", F.expr("md5(lower(text))").alias("h"))
    # keep-first-copy as min_by AGGREGATION, not a row_number window: the
    # partial (map-side) aggregate collapses duplicate groups before the
    # content-hash shuffle and skips the per-partition sort a window
    # needs — measured 1.4x faster at sf0.1 and 10x-sf0.1 alike (round-9
    # profiling of the 10x curve; semantics identical: min doc_id per h)
    survivors = (
        gated.groupBy("h")
        .agg(F.expr("min_by(struct(doc_id, lang, source), doc_id)")
             .alias("kept"))
        .select("kept.doc_id", "kept.lang", "kept.source")
        # the survivor set feeds BOTH the language census (→ broadcast
        # thresholds) and the final keeper join; without a lineage cut
        # the scan + content-hash shuffle execute twice (the round-9 10×
        # profile's dominant cost). localCheckpoint materializes the
        # post-dedup survivors once — far smaller than the input — the
        # same boundary treatment as dedup_clusters' round boundary.
        .localCheckpoint()
    )
    counts = survivors.groupBy("lang").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("cnt")
    )
    z = counts.agg(F.expr("SUM(sqrt(cnt))").alias("denom"))
    thr = counts.crossJoin(F.broadcast(z)).select(
        "lang",
        F.expr(
            f"CAST(floor(least(1.0, {_MANIFEST_TARGET} * sqrt(cnt) / denom / cnt)"
            f" * {_MANIFEST_SCALE}) AS BIGINT)"
        ).alias("keep_thr"),
    )
    keep = (
        "CAST(conv(substr(md5(concat('manifest:', doc_id)), 1, 8), 16, 10) "
        "AS BIGINT)"
    )
    return (
        survivors.join(F.broadcast(thr), "lang")
        .filter(F.expr(f"{keep} % {_MANIFEST_SCALE}") < F.col("keep_thr"))
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# dedup signal agreement (text MinHash vs embedding LSH consistency audit)
# ---------------------------------------------------------------------------

@register(
    "dedup_signal_agreement",
    oracle="""
    WITH text_pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1] || ' ' ||
                        string_split(text, ' ')[i + 2])) AS s
          FROM documents
        )
      ) a JOIN (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1] || ' ' ||
                        string_split(text, ' ')[i + 2])) AS s
          FROM documents
        )
      ) b ON a.s = b.s AND a.doc_id < b.doc_id
      JOIN (SELECT doc_id, COUNT(DISTINCT s) AS c FROM (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1] || ' ' ||
                            string_split(text, ' ')[i + 2])) AS s
              FROM documents)
            GROUP BY doc_id) ca ON ca.doc_id = a.doc_id
      JOIN (SELECT doc_id, COUNT(DISTINCT s) AS c FROM (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1] || ' ' ||
                            string_split(text, ' ')[i + 2])) AS s
              FROM documents)
            GROUP BY doc_id) cb ON cb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id, ca.c, cb.c
      HAVING CAST(COUNT(*) AS DOUBLE) / (ca.c + cb.c - COUNT(*)) >= 0.8
    ),
    emb_pairs AS (
      SELECT a_id, b_id FROM (
    WITH sig AS (
      SELECT vec_id, (CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('0:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 1 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('1:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 2 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('2:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 4 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('3:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 8 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('4:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 16 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('5:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 32 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('6:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 64 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('7:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 128 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('8:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 256 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('9:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 512 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('10:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 1024 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('11:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 2048 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('12:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 4096 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('13:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 8192 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('14:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 16384 ELSE 0 END + CASE WHEN list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ((('0x' || substr(md5(concat('15:', i)), 1, 8))::BIGINT / 2147483648.0) - 1.0))) > 0 THEN 32768 ELSE 0 END) AS sig FROM embeddings
    ),
    bands AS (
      SELECT vec_id, band_id,
             (sig >> (band_id * 4)) & 15 AS band_val
      FROM sig CROSS JOIN (
        SELECT unnest(range(4)) AS band_id
      ) bs
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
      WHERE x.vec_id < y.vec_id
    )
    SELECT cand.a_id, cand.b_id, round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
    FROM cand
    JOIN embeddings a ON a.vec_id = cand.a_id
    JOIN embeddings b ON b.vec_id = cand.b_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.45
) e
    ),
    tagged AS (
      SELECT COALESCE(t.a_id, e.a_id) AS a_id,
             COALESCE(t.b_id, e.b_id) AS b_id,
             t.a_id IS NOT NULL AS has_text,
             e.a_id IS NOT NULL AS has_emb
      FROM text_pairs t
      FULL OUTER JOIN emb_pairs e
        ON t.a_id = e.a_id AND t.b_id = e.b_id
    )
    SELECT CASE WHEN has_text AND has_emb THEN 'both'
                WHEN has_text THEN 'text_only'
                ELSE 'embedding_only' END AS signal,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM tagged GROUP BY signal
    """,
    doc="Multi-signal dedup audit: which near-dup pairs are caught by the "
        "lexical signal (exact 3-gram Jaccard >= 0.8), the semantic "
        "signal (embedding cosine-LSH), or both — the consistency "
        "analysis that calibrates how much each dedup stage contributes "
        "before spending 100 TB of compute on both. A full outer join on "
        "the (a_id, b_id) pair key; both sides are the engine's own "
        "deterministic operators, so even this meta-analysis is "
        "hash-checked.",
)
def dedup_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_ngram_jaccard
    from .similarity import dedup_embedding_lsh

    text_pairs = dedup_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    emb_pairs = dedup_embedding_lsh(spark, sf_dir).select(
        F.col("a_id").alias("e_a"), F.col("b_id").alias("e_b")
    )
    tagged = text_pairs.join(
        emb_pairs,
        (F.col("a_id") == F.col("e_a")) & (F.col("b_id") == F.col("e_b")),
        "full_outer",
    ).select(
        F.col("a_id").isNotNull().alias("has_text"),
        F.col("e_a").isNotNull().alias("has_emb"),
    )
    return (
        tagged.select(
            F.expr(
                "CASE WHEN has_text AND has_emb THEN 'both' "
                "WHEN has_text THEN 'text_only' "
                "ELSE 'embedding_only' END"
            ).alias("signal")
        )
        .groupBy("signal")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# RAG ingestion: chunk -> signed-hash embed -> simhash shard bucket
# ---------------------------------------------------------------------------

from .text import CHUNK_STRIDE as _RAG_STRIDE  # noqa: E402
from .text import CHUNK_TOKENS as _RAG_CHUNK  # noqa: E402
from .text import md5_int32_duck, md5_int32_spark  # noqa: E402

RAG_DIM = 16  # signed-feature-hash embedding width

_RAG_SIGN_SPARK = (
    "CASE WHEN " + md5_int32_spark("concat('sg:', tok)") + " % 2 = 0 "
    "THEN 1 ELSE -1 END"
)


@register(
    "pipeline_rag_ingest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             list_slice(toks, i * {_RAG_STRIDE} + 1,
                        i * {_RAG_STRIDE} + {_RAG_CHUNK}) AS chunk
      FROM t, unnest(range(0,
             greatest(1, CAST(ceil((len(toks) - {_RAG_CHUNK})
                                   / {_RAG_STRIDE}.0) AS BIGINT) + 1)))
             AS u(i)
    ),
    ct AS (
      SELECT doc_id, chunk_idx, len(chunk) AS n_tokens, unnest(chunk) AS tok
      FROM chunks WHERE len(chunk) > 0
    ),
    dims AS (
      SELECT doc_id, chunk_idx, n_tokens,
             CAST({md5_int32_duck('tok')} % {RAG_DIM} AS INT) AS dim,
             SUM(CASE WHEN {md5_int32_duck("concat('sg:', tok)")} % 2 = 0
                      THEN 1 ELSE -1 END) AS v
      FROM ct GROUP BY doc_id, chunk_idx, n_tokens, dim
    )
    SELECT doc_id, chunk_idx, CAST(n_tokens AS INT) AS n_tokens,
           CAST(SUM(CASE WHEN v > 0 THEN 1 << dim ELSE 0 END) AS INT)
             AS shard_bucket,
           CAST(SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS INT)
             AS n_active_dims
    FROM dims GROUP BY doc_id, chunk_idx, n_tokens
    """,
    doc=f"RAG ingestion pipeline in one DAG: overlap-chunk every document "
        f"({_RAG_CHUNK}-token windows, stride {_RAG_STRIDE}), embed each "
        f"chunk by SIGNED feature hashing into {RAG_DIM} dims (token -> "
        "md5 bucket, +-1 sign from an independent salted hash — the "
        "vocabulary-free embedding), and assign a simhash-style shard "
        "bucket from the per-dimension sign pattern. The bucket is the "
        "ANN shard key an index build would partition by — similar "
        "chunks land in the same shard without any learned model or "
        "codebook broadcast. Integer arithmetic end-to-end (sign sums, "
        "bit folds), so the whole pipeline is hash-gate exact. Two "
        "shuffles: (chunk, dim) sign reduce, then the per-chunk bit "
        "fold; chunking itself is a shuffle-free 1-to-N explode.",
)
def pipeline_rag_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    n_chunks = (
        f"greatest(1, CAST(ceil((size(toks) - {_RAG_CHUNK}) "
        f"/ {_RAG_STRIDE}.0) AS BIGINT) + 1)"
    )
    chunks = (
        docs.select("doc_id", F.expr("split(lower(text), ' ')").alias("toks"))
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.expr(
                f"slice(toks, i * {_RAG_STRIDE} + 1, {_RAG_CHUNK})"
            ).alias("chunk"),
        )
        .filter(F.expr("size(chunk) > 0"))
    )
    ct = chunks.select(
        "doc_id", "chunk_idx",
        F.expr("size(chunk)").alias("n_tokens"),
        F.explode("chunk").alias("tok"),
    )
    dims = (
        ct.select(
            "doc_id", "chunk_idx", "n_tokens",
            F.expr(f"CAST({md5_int32_spark('tok')} % {RAG_DIM} AS INT)")
            .alias("dim"),
            F.expr(_RAG_SIGN_SPARK).alias("sign"),
        )
        .groupBy("doc_id", "chunk_idx", "n_tokens", "dim")
        .agg(F.sum("sign").alias("v"))
    )
    return (
        dims.groupBy("doc_id", "chunk_idx", "n_tokens")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN v > 0 THEN shiftleft(1, dim) ELSE 0 END) "
                "AS INT)"
            ).alias("shard_bucket"),
            F.expr(
                "CAST(SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS INT)"
            ).alias("n_active_dims"),
        )
        .select(
            "doc_id", "chunk_idx",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "shard_bucket", "n_active_dims",
        )
    )


# ---------------------------------------------------------------------------
# release-gate scorecard: every audit on one ship/no-ship row
# ---------------------------------------------------------------------------

# composing these gates needs their registrations resolved at import time
from ..plans import relational as _gates_relational  # noqa: E402,F401
from ..plans.registry import REGISTRY as _REG  # noqa: E402
from . import dedup as _gates_dedup  # noqa: E402,F401

#: (gate, source query, violation aggregate over its output, allowed)
_GATES = (
    ("split_leakage", "dedup_split_leakage", "COUNT(*)", 0),
    ("benchmark_contamination", "text_contamination",
     "SUM(CASE WHEN contaminated THEN 1 ELSE 0 END)", 0),
    ("pii_documents", "text_pii_redact",
     "SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)", 0),
    ("referential_orphans", "q_integrity_orphans", "SUM(n)", 0),
    ("k_anonymity_groups", "q_k_anonymity_audit", "COUNT(*)", 0),
)

_SCORECARD_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{gate}' AS gate, CAST({allowed} AS BIGINT) AS allowed, "
    f"CAST(COALESCE({agg}, 0) AS BIGINT) AS n_violations, "
    f"CASE WHEN COALESCE({agg}, 0) <= {allowed} "
    f"THEN 'pass' ELSE 'fail' END AS verdict "
    f"FROM ({_REG[name].oracle}) gate_{i}"
    for i, (gate, name, agg, allowed) in enumerate(_GATES)
)


@register(
    "pipeline_release_gates",
    oracle=_SCORECARD_ORACLE,
    doc="Release-gate scorecard: the five ship/no-ship audits — train/"
        "eval split leakage, benchmark contamination, PII presence, "
        "referential orphans, k-anonymity violations — reduced to one "
        "row each (violation count vs allowance, pass/fail verdict) in "
        "a single DAG. This is the artifact a data-release pipeline "
        "actually blocks on; each underlying audit stays independently "
        "runnable and oracle-gated, and the scorecard reuses their "
        "exact oracle text so the two views can never drift. Every "
        "branch reduces to one row before the union — the scorecard "
        "adds five 1-row aggregates to whatever the audits already "
        "cost. (The synthetic corpus intentionally fails the PII and "
        "contamination gates — seeded findings prove the audits fire.)",
)
def pipeline_release_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.relational import q_integrity_orphans, q_k_anonymity_audit
    from .dedup import dedup_split_leakage
    from .text import text_contamination, text_pii_redact

    sources = {
        "dedup_split_leakage": dedup_split_leakage,
        "text_contamination": text_contamination,
        "text_pii_redact": text_pii_redact,
        "q_integrity_orphans": q_integrity_orphans,
        "q_k_anonymity_audit": q_k_anonymity_audit,
    }
    parts = []
    for gate, name, agg, allowed in _GATES:
        df = sources[name](spark, sf_dir)
        parts.append(
            df.agg(
                F.expr(f"CAST(COALESCE({agg}, 0) AS BIGINT)")
                .alias("n_violations")
            )
            .select(
                F.lit(gate).alias("gate"),
                F.lit(allowed).cast("bigint").alias("allowed"),
                "n_violations",
            )
            .withColumn(
                "verdict",
                F.expr(
                    f"CASE WHEN n_violations <= {allowed} "
                    "THEN 'pass' ELSE 'fail' END"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# curriculum ordering: quality gate → difficulty score → per-source phases
# ---------------------------------------------------------------------------

from .text import FLESCH_DUCK as _CURR_FLESCH_DUCK  # noqa: E402
from .text import FLESCH_SPARK as _CURR_FLESCH_SPARK  # noqa: E402

CURRICULUM_PHASES = 4


@register(
    "pipeline_curriculum_phases",
    # quality gate verbatim from text_quality_filter, difficulty verbatim
    # from text_readability (imported constants — no drift); the phase is
    # the integer quartile (PHASES*(rn-1)) DIV cnt + 1, deterministic via
    # the (flesch DESC, doc_id) tiebreak
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, source, {_CURR_FLESCH_DUCK} AS flesch
      FROM documents WHERE {_QUALITY_DUCK}
    ),
    ranked AS (
      SELECT source, flesch,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY flesch DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS cnt
      FROM gated
    )
    SELECT source,
           CAST(({CURRICULUM_PHASES} * (rn - 1)) // cnt + 1 AS INT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(flesch) AS min_flesch,
           MAX(flesch) AS max_flesch
    FROM ranked
    GROUP BY source, ({CURRICULUM_PHASES} * (rn - 1)) // cnt + 1
    """,
    doc=f"Curriculum construction: quality-gated documents are ordered "
        "easiest-first by Flesch readability within each source and cut "
        f"into {CURRICULUM_PHASES} equal phases (integer quartile of the "
        "per-source rank — deterministic tiebreak on doc_id), with "
        "per-phase document counts and score ranges — the "
        "easy-to-hard schedule curriculum-learning training runs consume. "
        "Gate and score reuse the standalone operators' expression text "
        "verbatim (imported constants), so the composition stays one "
        "Catalyst plan: a per-row projection, one per-source window "
        "(key-parallel across sources; within a giant source this is "
        "Spark's standard range-partitioned sort), and a final "
        "map-side-combinable aggregate.",
)
def pipeline_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    gated = docs.filter(F.expr(_QUALITY_SPARK)).select(
        "doc_id", "source", F.expr(_CURR_FLESCH_SPARK).alias("flesch")
    )
    wr = Window.partitionBy("source").orderBy(F.desc("flesch"), F.asc("doc_id"))
    wc = Window.partitionBy("source")
    ranked = gated.select(
        "source",
        "flesch",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return (
        ranked.withColumn(
            "phase",
            F.expr(f"CAST(({CURRICULUM_PHASES} * (rn - 1)) DIV cnt + 1 AS INT)"),
        )
        .groupBy("source", "phase")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.min("flesch").alias("min_flesch"),
            F.max("flesch").alias("max_flesch"),
        )
    )


# ---------------------------------------------------------------------------
# incremental snapshot diff (the daily-delta manifest at 100 TB)
# ---------------------------------------------------------------------------

#: deterministic snapshot membership: yesterday = docs whose md5 bucket is
#: < 90, today = buckets >= 5 — so ~5% removed, ~10% added, ~85% retained.
_SNAP_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat('snap:', CAST(doc_id AS STRING))), 1, 8), "
    "16, 10) AS BIGINT) % 100"
)
_SNAP_BUCKET_DUCK = (
    "('0x' || substr(md5('snap:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT "
    "% 100"
)


@register(
    "pipeline_incremental_manifest",
    oracle=f"""
    WITH buckets AS (
      SELECT doc_id, source, n_chars,
             {_SNAP_BUCKET_DUCK} AS b, md5(text) AS content_hash
      FROM documents
    ),
    yesterday AS (SELECT * FROM buckets WHERE b < 90),
    today AS (SELECT * FROM buckets WHERE b >= 5),
    diff AS (
      SELECT COALESCE(t.source, y.source) AS source,
             CASE WHEN y.doc_id IS NULL THEN 'added'
                  WHEN t.doc_id IS NULL THEN 'removed'
                  ELSE 'retained' END AS change,
             COALESCE(t.n_chars, y.n_chars) AS n_chars
      FROM yesterday y FULL OUTER JOIN today t ON y.doc_id = t.doc_id
    )
    SELECT source, change,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM diff GROUP BY source, change
    """,
    doc="Incremental corpus manifest: the daily-delta diff between two "
        "snapshot membership sets — added / removed / retained documents "
        "per source with byte accounting, via ONE full-outer join on "
        "doc_id. This is the operator that turns a 100 TB reprocess into "
        "an incremental job: downstream stages (dedup indexes, quality "
        "gates, packing) consume the 'added'/'removed' slices instead of "
        "the whole corpus. The join shuffles both sides on doc_id once; "
        "the rollup is a tiny map-side-combined aggregate.",
)
def pipeline_incremental_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    buckets = docs.select(
        "doc_id", "source", "n_chars",
        F.expr(_SNAP_BUCKET_SPARK).alias("b"),
    )
    y = buckets.filter("b < 90").select(
        F.col("doc_id").alias("y_id"),
        F.col("source").alias("y_source"),
        F.col("n_chars").alias("y_chars"),
    )
    t = buckets.filter("b >= 5").select(
        F.col("doc_id").alias("t_id"),
        F.col("source").alias("t_source"),
        F.col("n_chars").alias("t_chars"),
    )
    diff = y.join(t, F.col("y_id") == F.col("t_id"), "full_outer").select(
        F.coalesce("t_source", "y_source").alias("source"),
        F.expr(
            "CASE WHEN y_id IS NULL THEN 'added' "
            "WHEN t_id IS NULL THEN 'removed' ELSE 'retained' END"
        ).alias("change"),
        F.coalesce("t_chars", "y_chars").alias("n_chars"),
    )
    return diff.groupBy("source", "change").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# dedup-aware source mixing (effective token mass, each unique doc once)
# ---------------------------------------------------------------------------

@register(
    "sample_dedup_aware_mix",
    oracle="""
    WITH copies AS (
      SELECT doc_id, source, n_chars, md5(text) AS h,
             COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS raw_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS unique_docs,
           CAST(SUM(n_chars) AS BIGINT) AS raw_chars,
           round(SUM(CAST(n_chars AS DOUBLE) / n_copies), 6)
             AS effective_chars,
           round(SUM(CAST(n_chars AS DOUBLE) / n_copies)
                 / SUM(CAST(n_chars AS DOUBLE)), 6) AS dedup_discount
    FROM copies GROUP BY source
    """,
    doc="Dedup-aware source mixing: each document's sampling mass is "
        "down-weighted by its exact-duplicate multiplicity (1/n_copies), "
        "so a source whose volume is inflated by syndicated copies "
        "contributes its UNIQUE token mass to the mixture — the "
        "correction between raw corpus shares and the shares a "
        "train-once-per-unique-doc policy actually yields. One window "
        "over the content hash (same shuffle the exact-dedup keep rule "
        "uses) + a per-source rollup. The 1/n sum is exact-rational "
        "before the final round, so the gate hash is stable.",
)
def sample_dedup_aware_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    copies = docs.select(
        "doc_id", "source", "n_chars", F.expr("md5(text)").alias("h")
    ).withColumn(
        "n_copies", F.count("*").over(Window.partitionBy("h"))
    )
    return copies.groupBy("source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("raw_docs"),
        F.expr("CAST(COUNT(DISTINCT h) AS BIGINT)").alias("unique_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("raw_chars"),
        F.expr(
            "round(SUM(CAST(n_chars AS DOUBLE) / n_copies), 6)"
        ).alias("effective_chars"),
        F.expr(
            "round(SUM(CAST(n_chars AS DOUBLE) / n_copies)"
            " / SUM(CAST(n_chars AS DOUBLE)), 6)"
        ).alias("dedup_discount"),
    )


# ---------------------------------------------------------------------------
# filter-ablation matrix (the every-gate-combination census)
# ---------------------------------------------------------------------------


@register(
    "pipeline_filter_ablation",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang,
             CAST({_D['n_tokens']} AS BIGINT) AS n_tokens,
             CAST(CASE WHEN {_QUALITY_DUCK} THEN 1 ELSE 0 END AS INT)
               AS g_quality,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS INT) AS g_lang,
             CAST(CASE WHEN doc_id = MIN(doc_id) OVER (
                 PARTITION BY md5(lower(text))
             ) THEN 1 ELSE 0 END AS INT) AS g_unique
      FROM documents
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT g_quality, g_lang, g_unique,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(COUNT(*) AS DOUBLE) / total.n, 6) AS doc_frac
    FROM gated CROSS JOIN total
    GROUP BY g_quality, g_lang, g_unique, total.n
    ORDER BY g_quality, g_lang, g_unique
    """,
    doc="Filter-ablation matrix: every combination of the pipeline's "
        "gates (quality rules, target language, exact-dedup keeper) with "
        "doc and token counts plus corpus fraction — the census that "
        "shows what each gate removes ALONE vs what only the "
        "intersection removes, read before re-ordering or dropping a "
        "stage (a gate whose cells vanish under the others' intersection "
        "is free to drop; one that carries unique mass is not). The "
        "cube is 2^3 rows from one scan: the dedup-keeper flag is a "
        "window over the content hash (one shuffle), the other gates "
        "are per-row codegen; the rollup groups on three bits.",
)
def pipeline_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy(F.expr("md5(lower(text))"))
    gated = docs.select(
        "doc_id",
        F.expr(f"CAST({_S['n_tokens']} AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"CAST(CASE WHEN {_QUALITY_SPARK} THEN 1 ELSE 0 END AS INT)"
        ).alias("g_quality"),
        F.expr(
            "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS INT)"
        ).alias("g_lang"),
        (F.col("doc_id") == F.min("doc_id").over(w))
        .cast("int").alias("g_unique"),
    )
    total = docs.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    return (
        gated.groupBy("g_quality", "g_lang", "g_unique")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(SUM(n_tokens) AS BIGINT)").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "g_quality", "g_lang", "g_unique", "n_docs", "n_tokens",
            F.expr(
                "round(CAST(n_docs AS DOUBLE) / n, 6)"
            ).alias("doc_frac"),
        )
        .orderBy("g_quality", "g_lang", "g_unique")
    )


# ---------------------------------------------------------------------------
# snapshot distribution drift (the ingest-monitoring tripwire)
# ---------------------------------------------------------------------------


@register(
    "pipeline_distribution_drift",
    oracle="""
    WITH tagged AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'prev' ELSE 'curr' END AS snap,
             lang, source,
             CAST(FLOOR(log2(CAST(n_chars AS DOUBLE)) * 4) AS INT) AS len_bin
      FROM documents
    ),
    unpivoted AS (
      SELECT snap, 'lang' AS col, lang AS val FROM tagged
      UNION ALL SELECT snap, 'source', source FROM tagged
      UNION ALL SELECT snap, 'len_bin', CAST(len_bin AS VARCHAR) FROM tagged
    ),
    counts AS (
      SELECT col, val,
             CAST(COUNT(*) FILTER (WHERE snap = 'prev') AS BIGINT) AS n_prev,
             CAST(COUNT(*) FILTER (WHERE snap = 'curr') AS BIGINT) AS n_curr
      FROM unpivoted GROUP BY col, val
    ),
    tot AS (
      SELECT col, SUM(n_prev) AS t_prev, SUM(n_curr) AS t_curr
      FROM counts GROUP BY col
    )
    SELECT c.col, c.val, c.n_prev, c.n_curr,
           round(CAST(c.n_prev AS DOUBLE) / t.t_prev, 6) AS share_prev,
           round(CAST(c.n_curr AS DOUBLE) / t.t_curr, 6) AS share_curr,
           round(abs(CAST(c.n_prev AS DOUBLE) / t.t_prev
                     - CAST(c.n_curr AS DOUBLE) / t.t_curr), 6) AS abs_drift
    FROM counts c JOIN tot t ON t.col = c.col
    """,
    doc="Snapshot distribution drift: per-value shares of the monitored "
        "columns (lang, source, quarter-octave length bin) in the "
        "previous vs current snapshot with absolute drift — the ingest "
        "tripwire that catches a broken crawler (one source's share "
        "collapses), a language-ID regression (lang mix shifts), or a "
        "truncation bug (length bins migrate) BEFORE a full pipeline "
        "run. doc_id parity stands in for the snapshot tag on the "
        "synthetic corpus; in production the tag is the ingest "
        "partition. One unpivot scan + one map-side-combined (col, val) "
        "aggregate; value cardinality (langs × sources × ~40 bins) "
        "bounds the output at any corpus size.",
)
def pipeline_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tagged = docs.select(
        F.expr(
            "CASE WHEN doc_id % 2 = 0 THEN 'prev' ELSE 'curr' END"
        ).alias("snap"),
        "lang", "source",
        F.expr(
            "CAST(FLOOR(log2(CAST(n_chars AS DOUBLE)) * 4) AS INT)"
        ).alias("len_bin"),
    )
    unpivoted = tagged.selectExpr(
        "snap",
        "stack(3, 'lang', lang, 'source', source, "
        "'len_bin', CAST(len_bin AS STRING)) AS (col, val)",
    )
    counts = unpivoted.groupBy("col", "val").agg(
        F.expr(
            "CAST(COUNT(CASE WHEN snap = 'prev' THEN 1 END) AS BIGINT)"
        ).alias("n_prev"),
        F.expr(
            "CAST(COUNT(CASE WHEN snap = 'curr' THEN 1 END) AS BIGINT)"
        ).alias("n_curr"),
    )
    tot = counts.groupBy("col").agg(
        F.expr("SUM(n_prev)").alias("t_prev"),
        F.expr("SUM(n_curr)").alias("t_curr"),
    )
    return counts.join(F.broadcast(tot), "col").select(
        "col", "val", "n_prev", "n_curr",
        F.expr("round(CAST(n_prev AS DOUBLE) / t_prev, 6)").alias(
            "share_prev"),
        F.expr("round(CAST(n_curr AS DOUBLE) / t_curr, 6)").alias(
            "share_curr"),
        F.expr(
            "round(abs(CAST(n_prev AS DOUBLE) / t_prev"
            " - CAST(n_curr AS DOUBLE) / t_curr), 6)"
        ).alias("abs_drift"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (the lexical-ranking baseline every RAG pipeline ships)
# ---------------------------------------------------------------------------

BM25_TERMS = ("sort", "merge", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20

#: rational idf — identical text in both engines; ln() of it would rank
#: identically per-term but expose libm differences (same design choice
#: as text_tfidf_topk's _IDF)
def _bm25_term_expr(i: int, tf: str) -> str:
    """One query term's BM25 contribution: a pure rational function of
    exact integers (tf, df, n, dl) and avgdl (one double division of
    exact BIGINTs) — no libm. Every non-binary-exact constant is
    CAST(... AS DOUBLE): a bare literal like 2.2 parses as DECIMAL in
    Spark but DOUBLE in DuckDB, and the exact-decimal intermediate
    drifts from the double path at the rounding boundary."""
    k1 = f"CAST({BM25_K1} AS DOUBLE)"
    k1p1 = f"CAST({BM25_K1 + 1.0} AS DOUBLE)"
    b = f"CAST({BM25_B} AS DOUBLE)"
    idf = f"((CAST(n AS DOUBLE) - df{i} + 0.5) / (df{i} + 0.5))"
    sat = (
        f"({tf} * {k1p1}"
        f" / ({tf} + {k1} * (1.0 - {b}"
        f" + {b} * dl / avgdl)))"
    )
    return f"{idf} * {sat}"


def _bm25_score_expr(tf_of) -> str:
    """One fixed left-to-right chain: term1 + term2 + term3 (see
    :func:`_bm25_term_expr`) — no cross-row float accumulation, so both
    engines produce bit-identical scores. ``tf_of(term)`` renders the
    engine's tf expression for a term."""
    parts = [
        _bm25_term_expr(i, tf_of(t)) for i, t in enumerate(BM25_TERMS)
    ]
    return "round(" + " + ".join(parts) + ", 6)"


def _tf_spark(term: str) -> str:
    return f"size(filter(split(lower(text), ' '), x -> x = '{term}'))"


def _tf_duck(term: str) -> str:
    return f"len(list_filter(string_split(lower(text), ' '), x -> x = '{term}'))"


_BM25_STATS_DUCK = ", ".join(
    f"CAST(SUM(CASE WHEN {_tf_duck(t)} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS df{i}"
    for i, t in enumerate(BM25_TERMS)
)
_BM25_STATS_SPARK = [
    (
        f"CAST(SUM(CASE WHEN {_tf_spark(t)} > 0 THEN 1 ELSE 0 END)"
        f" AS BIGINT)",
        f"df{i}",
    )
    for i, t in enumerate(BM25_TERMS)
]


@register(
    "search_bm25_topk",
    bench=True,
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    )
    SELECT doc_id, dl, score,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
    FROM (
      SELECT * FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}
    ) t
    """,
    doc=f"BM25 top-{BM25_TOP_K} retrieval for a fixed {len(BM25_TERMS)}-"
        "term query (k1=1.2, b=0.75, rational idf — cross-engine "
        "deterministic, no libm). The corpus statistics (N, avgdl, per-"
        "term document frequencies) are ONE tiny aggregate broadcast to "
        "a zero-shuffle scoring scan; selection is a distributed "
        "TakeOrdered top-k (per-partition heaps + one small merge, never "
        "a global sort), then ranks over the k survivors only. The "
        "classic lexical-retrieval operator of a RAG data pipeline, "
        "complementing search_hybrid_rrf's rank fusion.",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    stats = docs.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr(
            "CAST(SUM(size(split(lower(text), ' '))) AS DOUBLE) / COUNT(*)"
        ).alias("avgdl"),
        *[F.expr(e).alias(a) for e, a in _BM25_STATS_SPARK],
    )
    scored = (
        docs.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "CAST(size(split(lower(text), ' ')) AS BIGINT)"
            ).alias("dl"),
            F.expr(_bm25_score_expr(_tf_spark)).alias("score"),
            "n", "avgdl",
            *[f"df{i}" for i in range(len(BM25_TERMS))],
        )
        .filter(F.col("score") > 0)
        .select("doc_id", "dl", "score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOP_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query-likelihood retrieval (the LM-based ranker)
# ---------------------------------------------------------------------------

QL_MU = 2000
QL_TOP_K = 20


def _ql_score_expr(tf_of) -> str:
    """Product-form query likelihood Π_t (tf + μ·cf_t/ctot) / (dl + μ):
    the standard formulation takes logs, but a fixed left-to-right product
    of per-term rationals ranks identically and avoids libm entirely.
    Scaled by 1e9 so the 4dp round keeps resolution at corpus-typical
    magnitudes."""
    mu = f"CAST({QL_MU} AS DOUBLE)"
    factors = [
        f"(({tf_of(t)} + {mu} * cf{i} / ctot) / (dl + {mu}))"
        for i, t in enumerate(BM25_TERMS)
    ]
    return "round(1e9 * " + " * ".join(factors) + ", 4)"


_QL_STATS_DUCK = ", ".join(
    f"CAST(SUM({_tf_duck(t)}) AS BIGINT) AS cf{i}"
    for i, t in enumerate(BM25_TERMS)
)
_QL_STATS_SPARK = [
    (f"CAST(SUM({_tf_spark(t)}) AS BIGINT)", f"cf{i}")
    for i, t in enumerate(BM25_TERMS)
]


@register(
    "search_lm_dirichlet_topk",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS ctot,
             {_QL_STATS_DUCK}
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_ql_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    )
    SELECT doc_id, dl, score,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
    FROM (
      SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT {QL_TOP_K}
    ) t
    """,
    doc=f"Dirichlet-smoothed query-likelihood retrieval (μ={QL_MU}) for "
        "the same fixed query as search_bm25_topk — the LM-based ranking "
        "family next to BM25's tf-saturation family. Smoothing from the "
        "collection model means every document scores (missing terms "
        "fall back to μ·cf/|C|), the property that distinguishes QL from "
        "tf-only rankers. Product form instead of the usual log-sum: a "
        "fixed-order product of per-term rationals ranks identically "
        "and is bit-deterministic across engines (no libm). Same scale "
        "shape as BM25: one broadcast stats row, zero-shuffle scoring, "
        "distributed top-k.",
)
def search_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    stats = docs.agg(
        F.expr(
            "CAST(SUM(size(split(lower(text), ' '))) AS BIGINT)"
        ).alias("ctot"),
        *[F.expr(e).alias(a) for e, a in _QL_STATS_SPARK],
    )
    scored = (
        docs.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "CAST(size(split(lower(text), ' ')) AS BIGINT)"
            ).alias("dl"),
            F.expr(_ql_score_expr(_tf_spark)).alias("score"),
        )
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(QL_TOP_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# token-budget training plan (epochs per source under a fixed budget)
# ---------------------------------------------------------------------------

TRAIN_BUDGET_TOKENS = 10_000_000


@register(
    "pipeline_token_budget_plan",
    # alpha = 0.5 temperature weights via sqrt (IEEE correctly rounded,
    # same determinism argument as sample_temperature_mix); every other
    # number is an exact BIGINT or one division of exact BIGINTs
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS unique_tokens
      FROM documents GROUP BY source
    ),
    z AS (SELECT SUM(sqrt(CAST(unique_tokens AS DOUBLE))) AS denom
          FROM per_source)
    SELECT source, unique_tokens,
           CAST(floor({TRAIN_BUDGET_TOKENS} *
                      sqrt(CAST(unique_tokens AS DOUBLE))
                      / (SELECT denom FROM z)) AS BIGINT)
             AS allocated_tokens,
           round(floor({TRAIN_BUDGET_TOKENS} *
                       sqrt(CAST(unique_tokens AS DOUBLE))
                       / (SELECT denom FROM z))
                 / CAST(unique_tokens AS DOUBLE), 4) AS epochs,
           round(floor({TRAIN_BUDGET_TOKENS} *
                       sqrt(CAST(unique_tokens AS DOUBLE))
                       / (SELECT denom FROM z))
                 / CAST({TRAIN_BUDGET_TOKENS} AS DOUBLE), 6) AS budget_share
    FROM per_source
    """,
    doc=f"Token-budget training plan: temperature-weighted (alpha=0.5) "
        f"allocation of a {TRAIN_BUDGET_TOKENS:,}-token budget across "
        "sources, with the resulting epoch count (allocated / unique — "
        "epochs > 1 means the source repeats, the quantity data-mixing "
        "papers bound to avoid memorization) and each source's budget "
        "share. The planning artifact a mixing run ships alongside "
        "sample_temperature_mix's document sample: one tiny per-source "
        "census, everything else scalar arithmetic — at 100 TB this is "
        "one map-side-combined aggregate.",
)
def pipeline_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    per_source = docs.groupBy("source").agg(
        F.expr(
            "CAST(SUM(size(split(lower(text), ' '))) AS BIGINT)"
        ).alias("unique_tokens")
    )
    z = per_source.agg(
        F.expr("SUM(sqrt(CAST(unique_tokens AS DOUBLE)))").alias("denom")
    )
    alloc = (
        f"CAST(floor({TRAIN_BUDGET_TOKENS} * "
        f"sqrt(CAST(unique_tokens AS DOUBLE)) / denom) AS BIGINT)"
    )
    return per_source.crossJoin(F.broadcast(z)).select(
        "source", "unique_tokens",
        F.expr(alloc).alias("allocated_tokens"),
        F.expr(
            f"round({alloc} / CAST(unique_tokens AS DOUBLE), 4)"
        ).alias("epochs"),
        F.expr(
            f"round({alloc} / CAST({TRAIN_BUDGET_TOKENS} AS DOUBLE), 6)"
        ).alias("budget_share"),
    )


# ---------------------------------------------------------------------------
# ranker agreement: BM25 vs Dirichlet-QL top-k overlap and displacement
# ---------------------------------------------------------------------------

@register(
    "search_rank_agreement",
    # all agreement statistics are exact-integer (counts, rank sums); the
    # only floats are two final single divisions
    oracle=f"""
    WITH bm_stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    bm_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN bm_stats
    ),
    bm25 AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM (SELECT * FROM bm_scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}) t
    ),
    ql_stats AS (
      SELECT CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS ctot,
             {_QL_STATS_DUCK}
      FROM documents
    ),
    ql_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_ql_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN ql_stats
    ),
    ql AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM (SELECT * FROM ql_scored
            ORDER BY score DESC, doc_id LIMIT {QL_TOP_K}) t
    )
    SELECT CAST(COUNT(CASE WHEN bm25.doc_id IS NOT NULL
                            AND ql.doc_id IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_overlap,
           round(CAST(COUNT(CASE WHEN bm25.doc_id IS NOT NULL
                                  AND ql.doc_id IS NOT NULL THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS overlap_jaccard,
           CAST(COALESCE(SUM(CASE WHEN bm25.doc_id IS NOT NULL
                                   AND ql.doc_id IS NOT NULL
                             THEN abs(bm25.rk - ql.rk) END), 0) AS BIGINT)
             AS sum_displacement,
           round(CAST(COALESCE(SUM(CASE WHEN bm25.doc_id IS NOT NULL
                                         AND ql.doc_id IS NOT NULL
                                   THEN abs(bm25.rk - ql.rk) END), 0)
                      AS DOUBLE)
                 / greatest(1, COUNT(CASE WHEN bm25.doc_id IS NOT NULL
                                           AND ql.doc_id IS NOT NULL
                                     THEN 1 END)), 4) AS mean_displacement
    FROM bm25 FULL OUTER JOIN ql ON bm25.doc_id = ql.doc_id
    """,
    doc=f"Retrieval-eval artifact: agreement between the BM25 and "
        "Dirichlet-QL rankers for the shared fixed query — top-"
        f"{BM25_TOP_K} overlap count, Jaccard over the union, and the "
        "Spearman-footrule displacement (sum/mean |rank difference|) on "
        "the overlap. Divergence between ranking families flags "
        "length-normalization pathologies in a corpus (QL's smoothing "
        "punishes long documents differently from BM25's b-term). Both "
        "rankings reuse the registered operators' exact plans; the "
        "agreement join runs on two k-row lists.",
)
def search_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm = search_bm25_topk(spark, sf_dir).select(
        F.col("doc_id").alias("bm_doc"), F.col("rk").alias("bm_rk"))
    ql = search_lm_dirichlet_topk(spark, sf_dir).select(
        F.col("doc_id").alias("ql_doc"), F.col("rk").alias("ql_rk"))
    joined = bm.join(
        ql, bm.bm_doc == ql.ql_doc, "full_outer"
    ).select(
        F.expr(
            "CASE WHEN bm_doc IS NOT NULL AND ql_doc IS NOT NULL"
            " THEN 1 END"
        ).alias("hit"),
        F.expr(
            "CASE WHEN bm_doc IS NOT NULL AND ql_doc IS NOT NULL"
            " THEN abs(bm_rk - ql_rk) END"
        ).alias("disp"),
    )
    return joined.agg(
        F.expr("CAST(COUNT(hit) AS BIGINT)").alias("n_overlap"),
        F.expr(
            "round(CAST(COUNT(hit) AS DOUBLE) / COUNT(*), 6)"
        ).alias("overlap_jaccard"),
        F.expr(
            "CAST(COALESCE(SUM(disp), 0) AS BIGINT)"
        ).alias("sum_displacement"),
        F.expr(
            "round(CAST(COALESCE(SUM(disp), 0) AS DOUBLE)"
            " / greatest(1, COUNT(hit)), 4)"
        ).alias("mean_displacement"),
    )


# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance feedback (query expansion from the top-ranked docs)
# ---------------------------------------------------------------------------

PRF_FEEDBACK_DOCS = 5
PRF_TERMS = 10
#: original query terms plus corpus stopwords are never expansion candidates
PRF_EXCLUDE = BM25_TERMS + ("the", "a", "")

_PRF_EXCLUDE_SQL = "(" + ", ".join(f"'{t}'" for t in PRF_EXCLUDE) + ")"


@register(
    "search_rocchio_prf",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    ),
    feedback AS (
      SELECT doc_id FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT {PRF_FEEDBACK_DOCS}
    ),
    toks AS (
      SELECT d.doc_id,
             unnest(string_split(lower(d.text), ' ')) AS term
      FROM documents d JOIN feedback f ON f.doc_id = d.doc_id
    ),
    cand AS (
      SELECT term,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS total_tf
      FROM toks WHERE term NOT IN {_PRF_EXCLUDE_SQL}
      GROUP BY term
    )
    SELECT term, n_docs, total_tf,
           ROW_NUMBER() OVER (ORDER BY n_docs DESC, total_tf DESC, term)
             AS rk
    FROM (
      SELECT * FROM cand
      ORDER BY n_docs DESC, total_tf DESC, term LIMIT {PRF_TERMS}
    ) t
    """,
    doc=f"Rocchio-style pseudo-relevance feedback: run the registered "
        f"BM25 ranker, take its top-{PRF_FEEDBACK_DOCS} documents as the "
        f"(pseudo-)relevant set, and emit the {PRF_TERMS} best expansion "
        "terms — ranked by feedback-set document frequency then total "
        "term frequency — excluding the original query terms and "
        "stopwords. The classic query-expansion step of a lexical "
        "retrieval pipeline (Rocchio's beta term with integer-exact "
        "weights; no alpha/gamma float mixing, so ranking is fully "
        "deterministic across engines). Scale shape: the feedback set "
        "is k rows broadcast into the token explode, so the expansion "
        "scan touches only k documents regardless of corpus size, and "
        "term selection is a distributed TakeOrdered top-k.",
)
def search_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    feedback = (
        search_bm25_topk(spark, sf_dir)
        .filter(F.col("rk") <= PRF_FEEDBACK_DOCS)
        .select("doc_id")
    )
    toks = (
        docs.join(F.broadcast(feedback), "doc_id")
        .select(
            "doc_id",
            F.explode(F.expr("split(lower(text), ' ')")).alias("term"),
        )
        .filter(~F.col("term").isin(*PRF_EXCLUDE))
    )
    cand = toks.groupBy("term").agg(
        F.expr("CAST(COUNT(DISTINCT doc_id) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("total_tf"),
    )
    order = [F.desc("n_docs"), F.desc("total_tf"), F.asc("term")]
    top = cand.orderBy(*order).limit(PRF_TERMS)
    w = Window.orderBy(*order)
    return top.withColumn("rk", F.row_number().over(w))


# ---------------------------------------------------------------------------
# nDCG ranking-quality eval (integer-exact harmonic discount)
# ---------------------------------------------------------------------------

#: LCM(2..21): scaling every harmonic discount 1/(rank+1) for ranks
#: 1..20 to an exact integer, so DCG accumulates in BIGINT instead of
#: an order-sensitive float sum (and no log2 — libm-free by design)
NDCG_SCALE = 232792560


def _ndcg_discount(rank_col: str, duck: bool = False) -> str:
    op = "//" if duck else "DIV"  # same exact integer division, two spellings
    return f"({NDCG_SCALE} {op} ({rank_col} + 1))"


@register(
    "search_ndcg_eval",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    bm_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    ),
    bm25 AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM (SELECT * FROM bm_scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}) t
    ),
    ql_stats AS (
      SELECT CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS ctot,
             {_QL_STATS_DUCK}
      FROM documents
    ),
    ql_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_ql_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN ql_stats
    ),
    ql AS (
      SELECT doc_id,
             CAST({QL_TOP_K} + 1
                  - ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                  AS BIGINT) AS gain,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM (SELECT * FROM ql_scored
            ORDER BY score DESC, doc_id LIMIT {QL_TOP_K}) t
    ),
    dcg AS (
      SELECT CAST(SUM(COALESCE(ql.gain, 0)
                      * {_ndcg_discount('bm25.rk', duck=True)}) AS BIGINT)
               AS dcg_scaled,
             CAST(COUNT(ql.doc_id) AS BIGINT) AS n_graded_hit
      FROM bm25 LEFT JOIN ql ON ql.doc_id = bm25.doc_id
    ),
    ideal AS (
      SELECT CAST(SUM(gain * {_ndcg_discount('rk', duck=True)}) AS BIGINT)
               AS ideal_scaled
      FROM ql
    )
    SELECT n_graded_hit, dcg_scaled, ideal_scaled,
           round(CAST(dcg_scaled AS DOUBLE) / ideal_scaled, 6) AS ndcg
    FROM dcg CROSS JOIN ideal
    """,
    doc=f"nDCG eval of the BM25 ranking against graded relevance derived "
        "from the Dirichlet-QL ranker (QL rank r gets gain "
        f"{QL_TOP_K}+1-r, unranked gets 0) — the graded-gain companion "
        "to search_rank_agreement's rank-displacement view. Twist for "
        "determinism: the discount is HARMONIC 1/(rank+1) scaled by "
        f"LCM(2..21) = {NDCG_SCALE}, so DCG and ideal-DCG accumulate as "
        "exact BIGINTs in any order and the only float op is the final "
        "division (log2-discounted nDCG would drag in libm and an "
        "order-sensitive float sum). Both rankings reuse the registered "
        "operators' plans; the eval join runs on two k-row lists.",
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm = search_bm25_topk(spark, sf_dir).select("doc_id", "rk")
    ql = search_lm_dirichlet_topk(spark, sf_dir).select(
        F.col("doc_id").alias("ql_doc"),
        F.expr(f"CAST({QL_TOP_K} + 1 - rk AS BIGINT)").alias("gain"),
        F.col("rk").alias("ql_rk"),
    )
    dcg = (
        bm.join(ql, bm["doc_id"] == ql["ql_doc"], "left")
        .agg(
            F.expr(
                f"CAST(SUM(COALESCE(gain, 0) * {_ndcg_discount('rk')})"
                " AS BIGINT)"
            ).alias("dcg_scaled"),
            F.expr("CAST(COUNT(ql_doc) AS BIGINT)").alias("n_graded_hit"),
        )
    )
    ideal = ql.agg(
        F.expr(
            f"CAST(SUM(gain * {_ndcg_discount('ql_rk')}) AS BIGINT)"
        ).alias("ideal_scaled")
    )
    return (
        dcg.crossJoin(F.broadcast(ideal))
        .select(
            "n_graded_hit", "dcg_scaled", "ideal_scaled",
            F.expr(
                "round(CAST(dcg_scaled AS DOUBLE) / ideal_scaled, 6)"
            ).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# extractive snippet windows for the top-ranked documents
# ---------------------------------------------------------------------------

SNIPPET_WINDOW = 10
SNIPPET_DOCS = 5


@register(
    "search_snippet_windows",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    ),
    top_docs AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS doc_rk
      FROM (SELECT * FROM scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {SNIPPET_DOCS}) t
    ),
    toks AS (
      SELECT d.doc_id, td.doc_rk,
             string_split(lower(d.text), ' ') AS ts
      FROM documents d JOIN top_docs td ON td.doc_id = d.doc_id
    ),
    hits AS (
      SELECT doc_id, i AS pos
      FROM toks, unnest(range(1, len(ts) + 1)) AS u(i)
      WHERE ts[i] IN {str(BM25_TERMS)}
    ),
    starts AS (
      SELECT doc_id, s
      FROM toks,
           unnest(range(1, greatest(1, len(ts) - {SNIPPET_WINDOW} + 1) + 1))
             AS u(s)
    ),
    windows AS (
      SELECT st.doc_id, st.s,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM starts st JOIN hits h
        ON h.doc_id = st.doc_id
       AND h.pos >= st.s AND h.pos < st.s + {SNIPPET_WINDOW}
      GROUP BY st.doc_id, st.s
    ),
    best AS (
      SELECT doc_id, s, n_hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY n_hits DESC, s) AS rk
      FROM windows
    )
    SELECT t.doc_id, t.doc_rk,
           CAST(b.s AS BIGINT) AS best_start, b.n_hits,
           array_to_string(
             ts[b.s:least(b.s + {SNIPPET_WINDOW} - 1, len(ts))], ' ')
             AS snippet
    FROM best b
    JOIN toks t ON t.doc_id = b.doc_id
    WHERE b.rk = 1
    """,
    doc=f"Extractive snippet selection — the display/RAG-context step "
        f"after retrieval: for each of the BM25 top-{SNIPPET_DOCS} "
        f"documents, the {SNIPPET_WINDOW}-token window containing the "
        "most query-term hits (earliest window on ties), emitted as the "
        "joined snippet string with its start offset and hit count. "
        "All-integer scoring (hit counts and positions — nothing to "
        "drift), and the candidate-window expansion is bounded: it "
        "explodes positions only for the k top-ranked documents, never "
        "the corpus, so cost is k * doc_length * window regardless of "
        "corpus size.",
)
def search_snippet_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    top_docs = (
        search_bm25_topk(spark, sf_dir)
        .filter(F.col("rk") <= SNIPPET_DOCS)
        .select("doc_id", F.col("rk").alias("doc_rk"))
    )
    toks = docs.join(F.broadcast(top_docs), "doc_id").select(
        "doc_id", "doc_rk",
        F.expr("split(lower(text), ' ')").alias("ts"),
    )
    terms_sql = str(BM25_TERMS)
    hits = toks.select(
        "doc_id",
        F.posexplode("ts").alias("pos0", "tok"),
    ).filter(F.expr(f"tok IN {terms_sql}")).select(
        "doc_id", F.expr("pos0 + 1").alias("pos")
    )
    starts = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(1, greatest(1, size(ts) - {SNIPPET_WINDOW} + 1))"
            )
        ).alias("s"),
    )
    windows = (
        starts.join(
            hits,
            (starts["doc_id"] == hits["doc_id"])
            & (hits["pos"] >= starts["s"])
            & (hits["pos"] < starts["s"] + SNIPPET_WINDOW),
        )
        .groupBy(starts["doc_id"].alias("doc_id"), "s")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_hits"))
    )
    wb = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("s"))
    best = (
        windows.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("s").cast("bigint").alias("best_start"),
                "n_hits")
    )
    return best.join(toks, "doc_id").select(
        "doc_id", "doc_rk", "best_start", "n_hits",
        F.expr(
            f"array_join(slice(ts, CAST(best_start AS INT),"
            f" {SNIPPET_WINDOW}), ' ')"
        ).alias("snippet"),
    )


# ---------------------------------------------------------------------------
# maximal-marginal-relevance (MMR) diversified reranking
# ---------------------------------------------------------------------------

from .dedup import COS_DUCK as _MMR_COS_DUCK  # noqa: E402
from .dedup import _DOT_AB as _MMR_DOT  # noqa: E402
from .dedup import _NORM as _MMR_NORM  # noqa: E402

MMR_POOL = 20   # rerank pool: BM25 top-k that carry an embedding
MMR_K = 5       # diversified selections
#: lambda = 0.5 — binary-exact, so 0.5*rel - 0.5*max_sim is a fixed pair
#: of exact halvings and one subtraction on already-6dp-rounded inputs


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as plain CTE stages (no recursion): step t
    scores every unselected candidate 0.5*rel - 0.5*max(sim to the
    selected set) and picks the argmax. K and the pool are fixed small
    constants, so unrolling is exact and engine-portable."""
    head = f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    bm_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    ),
    cand AS (
      SELECT t.doc_id, t.score AS rel, e.embedding
      FROM (SELECT * FROM bm_scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {MMR_POOL}) t
      JOIN embeddings e ON e.vec_id = t.doc_id
    ),
    sims AS (
      SELECT a.doc_id AS sa, b.doc_id AS sb,
             round({_MMR_COS_DUCK}, 6) AS sim
      FROM cand a JOIN cand b ON b.doc_id <> a.doc_id
    ),
    sel1 AS (
      SELECT doc_id, 1 AS step, rel, CAST(0 AS DOUBLE) AS max_sim_prev,
             round(0.5 * rel, 6) AS mmr_score
      FROM cand ORDER BY rel DESC, doc_id LIMIT 1
    ),
    selall1 AS (SELECT * FROM sel1)"""
    stages = []
    for t in range(2, MMR_K + 1):
        p = t - 1
        stages.append(f""",
    scored{t} AS (
      SELECT c.doc_id, c.rel, MAX(s.sim) AS max_sim
      FROM cand c
      JOIN sims s ON s.sa = c.doc_id
      JOIN selall{p} pr ON pr.doc_id = s.sb
      WHERE c.doc_id NOT IN (SELECT doc_id FROM selall{p})
      GROUP BY c.doc_id, c.rel
    ),
    sel{t} AS (
      SELECT doc_id, {t} AS step, rel, max_sim AS max_sim_prev,
             round(0.5 * rel - 0.5 * max_sim, 6) AS mmr_score
      FROM scored{t}
      ORDER BY round(0.5 * rel - 0.5 * max_sim, 6) DESC, doc_id LIMIT 1
    ),
    selall{t} AS (SELECT * FROM selall{p} UNION ALL SELECT * FROM sel{t})""")
    tail = f"""
    SELECT doc_id, CAST(step AS BIGINT) AS step, rel, max_sim_prev,
           mmr_score
    FROM selall{MMR_K}"""
    return head + "".join(stages) + tail


@register(
    "search_mmr_rerank",
    oracle=_mmr_oracle(),
    doc=f"Maximal-marginal-relevance reranking: from the BM25 top-"
        f"{MMR_POOL} (those carrying an embedding), greedily select "
        f"{MMR_K} results maximizing 0.5*relevance - 0.5*max-cosine-to-"
        "already-selected — the standard diversification step between "
        "retrieval and a RAG context window, killing near-duplicate "
        "hits that BM25 ranks adjacently. Greedy selection is "
        "implemented as K bounded DataFrame iterations over the "
        "broadcast k-row pool (rerankers are top-k-bounded by "
        "construction — corpus scale never enters the loop); the oracle "
        "unrolls the same greedy recurrence into K CTE stages. "
        "Determinism: relevance and pairwise cosines are 6dp-rounded "
        "before the loop, lambda=0.5 is binary-exact, ties break on "
        "doc_id.",
)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    pool = (
        search_bm25_topk(spark, sf_dir)
        .filter(F.col("rk") <= MMR_POOL)
        .select("doc_id", F.col("score").alias("rel"))
    )
    cand = (
        pool.join(emb, pool["doc_id"] == emb["vec_id"])
        .select(
            "doc_id", "rel",
            F.col("embedding").alias("a_emb"),
            F.expr(_MMR_NORM.format(col="embedding")).alias("a_norm"),
        )
        .persist()
    )
    right = cand.select(
        F.col("doc_id").alias("sb"),
        F.col("a_emb").alias("b_emb"),
        F.col("a_norm").alias("b_norm"),
    )
    sims = (
        cand.select("doc_id", "a_emb", "a_norm")
        .join(F.broadcast(right), F.col("sb") != F.col("doc_id"))
        .select(
            F.col("doc_id").alias("sa"), "sb",
            F.expr(f"round({_MMR_DOT} / (a_norm * b_norm), 6)").alias(
                "sim"),
        )
        .persist()
    )
    first = (
        cand.orderBy(F.desc("rel"), F.asc("doc_id")).limit(1)
        .select(
            "doc_id", F.lit(1).cast("bigint").alias("step"), "rel",
            F.expr("CAST(0 AS DOUBLE)").alias("max_sim_prev"),
            F.expr("round(0.5 * rel, 6)").alias("mmr_score"),
        )
    )
    sel = first
    for t in range(2, MMR_K + 1):
        prev_ids = sel.select("doc_id")
        scored = (
            cand.select("doc_id", "rel")
            .join(prev_ids, "doc_id", "left_anti")
            .join(sims, F.col("doc_id") == F.col("sa"))
            .join(
                F.broadcast(prev_ids.withColumnRenamed("doc_id", "pid")),
                F.col("sb") == F.col("pid"),
            )
            .groupBy("doc_id", "rel")
            .agg(F.max("sim").alias("max_sim"))
        )
        pick = (
            scored.withColumn(
                "mmr_score",
                F.expr("round(0.5 * rel - 0.5 * max_sim, 6)"),
            )
            .orderBy(F.desc("mmr_score"), F.asc("doc_id"))
            .limit(1)
            .select(
                "doc_id", F.lit(t).cast("bigint").alias("step"), "rel",
                F.col("max_sim").alias("max_sim_prev"), "mmr_score",
            )
        )
        sel = sel.unionAll(pick)
    return sel


# ---------------------------------------------------------------------------
# per-source dataset card (the release-documentation scorecard)
# ---------------------------------------------------------------------------

CARD_SHORT_CHARS = 100


@register(
    "pipeline_dataset_card",
    oracle=f"""
    WITH per_lang AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    top_lang AS (
      SELECT source, lang, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, lang) AS rk
      FROM per_lang
    ),
    base AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS total_tokens,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
             CAST(SUM(CASE WHEN n_chars < {CARD_SHORT_CHARS}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source
    )
    SELECT b.source, n_docs, total_chars, total_tokens,
           round(CAST(total_tokens AS DOUBLE) / n_docs, 4)
             AS mean_doc_tokens,
           n_langs, t.lang AS top_lang,
           round(CAST(t.n AS DOUBLE) / n_docs, 6) AS top_lang_share,
           round(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6)
             AS dup_rate,
           round(CAST(n_short AS DOUBLE) / n_docs, 6) AS short_frac
    FROM base b JOIN top_lang t ON t.source = b.source AND t.rk = 1
    """,
    doc="Per-source dataset card — the one-row-per-source scorecard a "
        "corpus release ships with (datasheets-for-datasets style): "
        "volume (docs, chars, whitespace tokens, mean doc length), "
        "language mix (distinct languages, dominant language and its "
        "share), exact-duplicate rate (1 - distinct text hashes / "
        "docs), and the short-document fraction. Every ratio is one "
        "double division of exact BIGINTs rounded at the boundary. "
        "Scale shape: ONE map-side-combinable aggregate per source "
        "(the distinct-hash count shuffles md5s, not documents) plus a "
        "per-source top-1 language window over the tiny "
        "(source x lang) table.",
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    per_lang = docs.groupBy("source", "lang").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    )
    wl = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    top_lang = (
        per_lang.withColumn("rk", F.row_number().over(wl))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"),
                F.col("n").alias("top_n"))
    )
    base = docs.groupBy("source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("total_chars"),
        F.expr(
            "CAST(SUM(size(split(lower(text), ' '))) AS BIGINT)"
        ).alias("total_tokens"),
        F.expr("CAST(COUNT(DISTINCT md5(text)) AS BIGINT)").alias(
            "n_unique"),
        F.expr(
            f"CAST(SUM(CASE WHEN n_chars < {CARD_SHORT_CHARS}"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_short"),
        F.expr("CAST(COUNT(DISTINCT lang) AS BIGINT)").alias("n_langs"),
    )
    return base.join(F.broadcast(top_lang), "source").select(
        "source", "n_docs", "total_chars", "total_tokens",
        F.expr(
            "round(CAST(total_tokens AS DOUBLE) / n_docs, 4)"
        ).alias("mean_doc_tokens"),
        "n_langs", "top_lang",
        F.expr("round(CAST(top_n AS DOUBLE) / n_docs, 6)").alias(
            "top_lang_share"),
        F.expr(
            "round(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6)"
        ).alias("dup_rate"),
        F.expr(
            "round(CAST(n_short AS DOUBLE) / n_docs, 6)"
        ).alias("short_frac"),
    )


# ---------------------------------------------------------------------------
# MAP / precision@k ranking-quality eval (integer-exact average precision)
# ---------------------------------------------------------------------------

#: NDCG_SCALE = LCM(1..21), so it is divisible by every rank 1..20 and
#: every AP term j/rk scales to an exact integer j * (SCALE // rk)
AP_SCALE = NDCG_SCALE


@register(
    "search_map_eval",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    bm_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    ),
    bm25 AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM (SELECT * FROM bm_scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}) t
    ),
    ql_stats AS (
      SELECT CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS ctot,
             {_QL_STATS_DUCK}
      FROM documents
    ),
    ql_scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_ql_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN ql_stats
    ),
    ql AS (
      SELECT doc_id
      FROM (SELECT * FROM ql_scored
            ORDER BY score DESC, doc_id LIMIT {QL_TOP_K}) t
    ),
    marked AS (
      SELECT bm25.rk, ql.doc_id AS rel_doc
      FROM bm25 LEFT JOIN ql ON ql.doc_id = bm25.doc_id
    ),
    hits AS (
      SELECT rk, ROW_NUMBER() OVER (ORDER BY rk) AS j
      FROM marked WHERE rel_doc IS NOT NULL
    ),
    apx AS (
      SELECT CAST(COALESCE(SUM(j * ({AP_SCALE} // rk)), 0) AS BIGINT)
               AS ap_scaled
      FROM hits
    ),
    cnts AS (
      SELECT
        CAST(COUNT(*) FILTER (rel_doc IS NOT NULL AND rk <= 5)
             AS BIGINT) AS hits_at_5,
        CAST(COUNT(*) FILTER (rel_doc IS NOT NULL AND rk <= 10)
             AS BIGINT) AS hits_at_10,
        CAST(COUNT(*) FILTER (rel_doc IS NOT NULL) AS BIGINT) AS hits_at_20
      FROM marked
    )
    SELECT CAST({QL_TOP_K} AS BIGINT) AS n_relevant,
           hits_at_5, hits_at_10, hits_at_20, ap_scaled,
           round(CAST(hits_at_5 AS DOUBLE) / 5, 6) AS p_at_5,
           round(CAST(hits_at_10 AS DOUBLE) / 10, 6) AS p_at_10,
           round(CAST(hits_at_20 AS DOUBLE) / {BM25_TOP_K}, 6) AS p_at_20,
           round(CAST(hits_at_20 AS DOUBLE) / {QL_TOP_K}, 6)
             AS recall_at_20,
           round(CAST(ap_scaled AS DOUBLE)
                 / (CAST({AP_SCALE} AS DOUBLE) * {QL_TOP_K}), 6) AS map
    FROM cnts CROSS JOIN apx
    """,
    doc=f"MAP / precision@k eval of the BM25 ranking against the "
        f"Dirichlet-QL top-{QL_TOP_K} as the binary relevant set — the "
        "set-based companion to search_ndcg_eval's graded view. Average "
        "precision runs integer-exact: the j-th relevant hit at rank r "
        f"contributes j/r, scaled by LCM(1..21) = {AP_SCALE} so the sum "
        "accumulates in BIGINT in any order; the only float ops are the "
        "final single divisions. The eval joins two k-row lists (both "
        "rankings reuse the registered operators' distributed "
        "orderBy().limit(k) plans), so the windows here see at most "
        f"{BM25_TOP_K} rows.",
)
def search_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    bm = search_bm25_topk(spark, sf_dir).select("doc_id", "rk")
    ql = search_lm_dirichlet_topk(spark, sf_dir).select(
        F.col("doc_id").alias("ql_doc")
    )
    marked = bm.join(F.broadcast(ql), bm["doc_id"] == ql["ql_doc"], "left")
    hits = marked.filter(F.col("ql_doc").isNotNull()).select("rk")
    w = Window.orderBy("rk")  # <= BM25_TOP_K rows by construction
    apx = (
        hits.withColumn("j", F.row_number().over(w))
        .agg(
            F.expr(
                f"CAST(COALESCE(SUM(j * ({AP_SCALE} DIV rk)), 0) AS BIGINT)"
            ).alias("ap_scaled")
        )
    )
    cnts = marked.agg(
        F.expr(
            "CAST(COUNT(*) FILTER (WHERE ql_doc IS NOT NULL AND rk <= 5)"
            " AS BIGINT)"
        ).alias("hits_at_5"),
        F.expr(
            "CAST(COUNT(*) FILTER (WHERE ql_doc IS NOT NULL AND rk <= 10)"
            " AS BIGINT)"
        ).alias("hits_at_10"),
        F.expr(
            "CAST(COUNT(*) FILTER (WHERE ql_doc IS NOT NULL) AS BIGINT)"
        ).alias("hits_at_20"),
    )
    return cnts.crossJoin(F.broadcast(apx)).select(
        F.expr(f"CAST({QL_TOP_K} AS BIGINT)").alias("n_relevant"),
        "hits_at_5", "hits_at_10", "hits_at_20", "ap_scaled",
        F.expr("round(CAST(hits_at_5 AS DOUBLE) / 5, 6)").alias("p_at_5"),
        F.expr("round(CAST(hits_at_10 AS DOUBLE) / 10, 6)").alias("p_at_10"),
        F.expr(
            f"round(CAST(hits_at_20 AS DOUBLE) / {BM25_TOP_K}, 6)"
        ).alias("p_at_20"),
        F.expr(
            f"round(CAST(hits_at_20 AS DOUBLE) / {QL_TOP_K}, 6)"
        ).alias("recall_at_20"),
        F.expr(
            f"round(CAST(ap_scaled AS DOUBLE)"
            f" / (CAST({AP_SCALE} AS DOUBLE) * {QL_TOP_K}), 6)"
        ).alias("map"),
    )


# ---------------------------------------------------------------------------
# per-term BM25 score attribution (retrieval explainability)
# ---------------------------------------------------------------------------

CONTRIB_DOCS = 5


def _contrib_duck_branch(i: int, term: str) -> str:
    return f"""
      SELECT doc_id, doc_rk, score, '{term}' AS term,
             CAST({_tf_duck(term)} AS BIGINT) AS tf,
             round({_bm25_term_expr(i, _tf_duck(term))}, 6) AS contribution
      FROM top_docs"""


@register(
    "search_term_contribution",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    scored AS (
      SELECT doc_id, text,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             n, avgdl,
             {', '.join(f'df{i}' for i in range(len(BM25_TERMS)))},
             {_bm25_score_expr(_tf_duck)} AS score
      FROM documents CROSS JOIN stats
    ),
    top_docs AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS doc_rk
      FROM (SELECT * FROM scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {CONTRIB_DOCS}) t
    ),
    unpivoted AS (
      {' UNION ALL '.join(_contrib_duck_branch(i, t)
                          for i, t in enumerate(BM25_TERMS))}
    )
    SELECT doc_id, doc_rk, term, tf, contribution,
           round(contribution / score, 6) AS share
    FROM unpivoted
    """,
    doc=f"Per-term BM25 score attribution for the top-{CONTRIB_DOCS} "
        "documents — the explainability view behind every relevance "
        "debugging session (is this hit carried by one rare term's idf "
        "or balanced across the query?), and the input to term-pruning "
        "decisions. Each term's contribution re-evaluates exactly the "
        "per-term rational from the scorer (shared helper — the "
        "attribution cannot drift from the ranking), rounded at 6dp, "
        "with share = contribution/score. The unpivot runs over the "
        f"k = {CONTRIB_DOCS} retrieved docs × |terms| grid only; corpus "
        "scale enters solely through the ranker's own plan.",
)
def search_term_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    stats = docs.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr(
            "CAST(SUM(size(split(lower(text), ' '))) AS DOUBLE) / COUNT(*)"
        ).alias("avgdl"),
        *[F.expr(e).alias(a) for e, a in _BM25_STATS_SPARK],
    )
    scored = (
        docs.crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "text",
            F.expr(
                "CAST(size(split(lower(text), ' ')) AS BIGINT)"
            ).alias("dl"),
            "n", "avgdl",
            *[f"df{i}" for i in range(len(BM25_TERMS))],
            F.expr(_bm25_score_expr(_tf_spark)).alias("score"),
        )
        .filter(F.col("score") > 0)
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(CONTRIB_DOCS)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    top_docs = top.withColumn("doc_rk", F.row_number().over(w))
    branches = [
        top_docs.select(
            "doc_id", "doc_rk", "score",
            F.lit(t).alias("term"),
            F.expr(f"CAST({_tf_spark(t)} AS BIGINT)").alias("tf"),
            F.expr(
                f"round({_bm25_term_expr(i, _tf_spark(t))}, 6)"
            ).alias("contribution"),
        )
        for i, t in enumerate(BM25_TERMS)
    ]
    unpivoted = branches[0]
    for b in branches[1:]:
        unpivoted = unpivoted.unionAll(b)
    return unpivoted.select(
        "doc_id", "doc_rk", "term", "tf", "contribution",
        F.expr("round(contribution / score, 6)").alias("share"),
    )


# ---------------------------------------------------------------------------
# retrieval impact of dedup (BM25 top-k on the full vs deduped corpus)
# ---------------------------------------------------------------------------

from .dedup import _JACCARD_ORACLE as _IMPACT_PAIRS  # noqa: E402
from .dedup import _UNIQ_RATIO_DUCK as _IMPACT_QUALITY  # noqa: E402

IMPACT_K = 10


def _impact_bm25_block(src: str, p: str, k: int) -> str:
    """Render the BM25 stats→score→top-k CTE chain against ``src`` with
    CTE names prefixed ``p`` — the corpus is a parameter because the
    deduped index has its own n/avgdl/df statistics (re-ranking the full
    corpus's scores would miss exactly the idf shift dedup causes)."""
    return f"""
    {p}stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM {src}
    ),
    {p}scored AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {_bm25_score_expr(_tf_duck)} AS score
      FROM {src} CROSS JOIN {p}stats
    ),
    {p}top AS (
      SELECT doc_id FROM (SELECT * FROM {p}scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT {k}) t
    )"""


@register(
    "search_dedup_impact",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {_IMPACT_PAIRS}
    ),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    walk(doc_id, reach) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, w.reach FROM edges e JOIN walk w ON w.doc_id = e.dst
    ),
    clus AS (
      SELECT doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_id
      FROM walk GROUP BY doc_id
    ),
    ranked AS (
      SELECT c.doc_id,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY {_IMPACT_QUALITY} DESC, c.doc_id)
               AS rk_best
      FROM clus c JOIN documents d ON d.doc_id = c.doc_id
    ),
    dropped AS (SELECT doc_id FROM ranked WHERE rk_best > 1),
    kept AS (
      SELECT * FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    {_impact_bm25_block('documents', 'f_', IMPACT_K)},
    {_impact_bm25_block('kept', 'k_', IMPACT_K)}
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM dropped) AS n_dropped_docs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM f_top
       WHERE doc_id IN (SELECT doc_id FROM dropped)) AS full_topk_dropped,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM f_top
       WHERE doc_id IN (SELECT doc_id FROM k_top)) AS overlap_at_k,
      round(CAST((SELECT COUNT(*) FROM f_top
                  WHERE doc_id IN (SELECT doc_id FROM k_top)) AS DOUBLE)
            / (SELECT COUNT(*) FROM (SELECT doc_id FROM f_top
                                     UNION
                                     SELECT doc_id FROM k_top) u), 6)
        AS jaccard_at_k
    """,
    doc=f"Retrieval impact of near-dup removal: BM25 top-{IMPACT_K} on "
        "the FULL corpus vs on the deduped corpus (keep-best-quality "
        "representative per cluster, everything else dropped), with the "
        "deduped side re-scored under its own n/avgdl/df statistics — "
        "the idf shift is exactly what a re-ranking shortcut would miss. "
        "Reports how many dropped duplicates sat in the full top-k "
        "(result-list pollution dedup fixes) and the top-k overlap/"
        "jaccard between the two indexes (ranking churn dedup causes). "
        "The comparison frames are two k-row lists; corpus scale enters "
        "only through the dedup and ranking operators' own distributed "
        "plans.",
)
def search_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_clusters, dedup_keep_best

    docs = load(spark, sf_dir, "documents")["documents"]
    clusters = dedup_clusters(spark, sf_dir)
    keepers = dedup_keep_best(spark, sf_dir).select(
        "cluster_id", F.col("keep_doc_id")
    )
    dropped = (
        clusters.join(F.broadcast(keepers), "cluster_id")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select("doc_id")
    )
    kept = docs.join(F.broadcast(dropped), "doc_id", "left_anti")

    def top_ids(src: DataFrame, prefix: str) -> DataFrame:
        stats = src.agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
            F.expr(
                "CAST(SUM(size(split(lower(text), ' '))) AS DOUBLE)"
                " / COUNT(*)"
            ).alias("avgdl"),
            *[F.expr(e).alias(a) for e, a in _BM25_STATS_SPARK],
        )
        scored = (
            src.crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                F.expr(
                    "CAST(size(split(lower(text), ' ')) AS BIGINT)"
                ).alias("dl"),
                F.expr(_bm25_score_expr(_tf_spark)).alias("score"),
            )
            .filter(F.col("score") > 0)
        )
        return (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(IMPACT_K)
            .select(F.col("doc_id").alias(f"{prefix}_doc"))
        )

    f_top = top_ids(docs, "f").persist()
    k_top = top_ids(kept, "k").persist()
    n_dropped = dropped.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_dropped_docs")
    )
    topk_dropped = f_top.join(
        F.broadcast(dropped), f_top["f_doc"] == dropped["doc_id"]
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("full_topk_dropped"))
    overlap = f_top.join(
        F.broadcast(k_top), f_top["f_doc"] == k_top["k_doc"]
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("overlap_at_k"))
    union_n = (
        f_top.select(F.col("f_doc").alias("doc"))
        .union(k_top.select(F.col("k_doc").alias("doc")))
        .distinct()
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_union"))
    )
    return (
        n_dropped.crossJoin(F.broadcast(topk_dropped))
        .crossJoin(F.broadcast(overlap))
        .crossJoin(F.broadcast(union_n))
        .select(
            "n_dropped_docs", "full_topk_dropped", "overlap_at_k",
            F.expr(
                "round(CAST(overlap_at_k AS DOUBLE) / n_union, 6)"
            ).alias("jaccard_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# output shard planning (byte-targeted write sizing)
# ---------------------------------------------------------------------------

#: target bytes per output shard; the 100 TB analogue is 256-1024 MiB
#: parquet files — the constant only sets shard granularity, the plan
#: shape is identical at any target
SHARD_TARGET_BYTES = 32768


@register(
    "pipeline_shard_plan",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, source, n_chars AS nbytes,
             md5(concat('shard:', doc_id)) AS k
      FROM documents
    ),
    pos AS (
      SELECT source, nbytes,
             SUM(nbytes) OVER (PARTITION BY source ORDER BY k, doc_id
                               ROWS UNBOUNDED PRECEDING) - nbytes
               AS start_pos
      FROM sized
    )
    SELECT source,
           CAST(start_pos // {SHARD_TARGET_BYTES} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nbytes) AS BIGINT) AS shard_bytes
    FROM pos GROUP BY source, shard_id
    """,
    doc="Output shard planning — the write-sizing pass a 100 TB corpus "
        "export runs so no shard is tiny or huge: documents are placed "
        "in a deterministic hash order within each source and cut into "
        "byte-targeted shards by running-sum bucketing "
        "(shard = floor(start_offset / target)), emitting the per-shard "
        "manifest (doc count, actual bytes). The prefix sum is the "
        "two-phase bucket discipline of sample_pack_batches (per-"
        "(source, hash-prefix) local windows + a 256-row offset pass), "
        "so no unbounded single-partition window exists at any scale.",
)
def pipeline_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    sized = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("nbytes"),
        F.expr("md5(concat('shard:', doc_id))").alias("k"),
    ).withColumn("bucket", F.expr("substr(k, 1, 2)"))
    w_local = (
        Window.partitionBy("source", "bucket")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn("local_cum", F.sum("nbytes").over(w_local))
    # ≤256 rows per source — sequential only over bucket TOTALS
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        sized.groupBy("source", "bucket")
        .agg(F.sum("nbytes").alias("bucket_total"))
        .withColumn(
            "offset", F.coalesce(F.sum("bucket_total").over(w_off), F.lit(0))
        )
        .select("source", "bucket", "offset")
    )
    placed = local.join(F.broadcast(offsets), ["source", "bucket"]).select(
        "source",
        "nbytes",
        F.expr(
            f"CAST((offset + local_cum - nbytes) DIV {SHARD_TARGET_BYTES}"
            f" AS BIGINT)"
        ).alias("shard_id"),
    )
    return placed.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nbytes").cast("long").alias("shard_bytes"),
    )


# ---------------------------------------------------------------------------
# impact-ordered tiered index plan (champion lists / static pruning)
# ---------------------------------------------------------------------------

TIER_SIZES = (16, 64, 256)


def _tier_postings_sql(tf_of) -> str:
    """UNION ALL of one SELECT per query term: (doc_id, term_i, impact)
    for docs containing the term — the per-term BM25 contribution is the
    posting's IMPACT score (Anh & Moffat impact ordering)."""
    parts = []
    for i, t in enumerate(BM25_TERMS):
        parts.append(
            f"SELECT doc_id, {i} AS term_i, "
            f"round({_bm25_term_expr(i, f'tf{i}')}, 6) AS impact "
            f"FROM base WHERE tf{i} > 0"
        )
    return " UNION ALL ".join(parts)


@register(
    "search_tiered_index_plan",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)
               / COUNT(*) AS avgdl,
             {_BM25_STATS_DUCK}
      FROM documents
    ),
    base AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             {", ".join(f"{_tf_duck(t)} AS tf{i}" for i, t in enumerate(BM25_TERMS))},
             n, avgdl,
             {", ".join(f"df{i}" for i in range(len(BM25_TERMS)))}
      FROM documents CROSS JOIN stats
    ),
    postings AS ({_tier_postings_sql(_tf_duck)}),
    ranked AS (
      SELECT doc_id, term_i, impact,
             ROW_NUMBER() OVER (PARTITION BY term_i
                                ORDER BY impact DESC, doc_id) AS rk
      FROM postings
    ),
    tiered AS (
      SELECT t.tier_n, r.doc_id, r.impact
      FROM ranked r CROSS JOIN (VALUES (16), (64), (256)) t(tier_n)
      WHERE r.rk <= t.tier_n
    ),
    tier_scores AS (
      SELECT tier_n, doc_id,
             CAST(SUM(CAST(impact AS DECIMAL(20,6))) AS DOUBLE) AS score
      FROM tiered GROUP BY tier_n, doc_id
    ),
    tier_top AS (
      SELECT tier_n, doc_id,
             ROW_NUMBER() OVER (PARTITION BY tier_n
                                ORDER BY score DESC, doc_id) AS rk
      FROM tier_scores
    ),
    full_scores AS (
      SELECT doc_id, {_bm25_score_expr(lambda t: f"tf{BM25_TERMS.index(t)}")} AS score
      FROM base
    ),
    full_top AS (
      SELECT doc_id FROM full_scores WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}
    ),
    tier_sizes AS (
      SELECT tier_n, CAST(COUNT(*) AS BIGINT) AS n_tier_postings
      FROM tiered GROUP BY tier_n
    ),
    recall AS (
      SELECT t.tier_n,
             CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM tier_top t LEFT JOIN full_top f ON t.doc_id = f.doc_id
      WHERE t.rk <= {BM25_TOP_K}
      GROUP BY t.tier_n
    )
    SELECT s.tier_n, s.n_tier_postings,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM postings)
             AS n_full_postings,
           round(CAST(r.n_hit AS DOUBLE)
                 / CAST({BM25_TOP_K} AS DOUBLE), 4) AS recall_at_k
    FROM tier_sizes s JOIN recall r ON s.tier_n = r.tier_n
    ORDER BY s.tier_n
    """,
    doc="Impact-ordered tiered-index planner (champion lists / static "
        "pruning, Anh & Moffat impact ordering): each query term's "
        "posting list keeps only its top-N postings by the term's BM25 "
        "contribution (N swept over 16/64/256), documents are re-scored "
        "from tier postings alone (6dp-rounded impacts summed as exact "
        "DECIMAL — no cross-row float accumulation), and the tiered "
        "top-20 is measured against the full-index BM25 top-20 as "
        "recall@20 and posting-count cost. THE web-scale retrieval "
        "trade: a 100 TB index answers from tier 1 (bounded postings "
        "per term, bounded memory) and falls back to deeper tiers only "
        "when recall demands it. Per-term top-N compiles to a "
        "WindowGroupLimit (partial per-partition limit before the "
        "shuffle), never a global sort.",
)
def search_tiered_index_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    stats = docs.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr(
            "CAST(SUM(size(split(lower(text), ' '))) AS DOUBLE) / COUNT(*)"
        ).alias("avgdl"),
        *[F.expr(e).alias(a) for e, a in _BM25_STATS_SPARK],
    )
    base = docs.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.expr("CAST(size(split(lower(text), ' ')) AS BIGINT)").alias("dl"),
        *[
            F.expr(_tf_spark(t)).alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
        "n", "avgdl",
        *[f"df{i}" for i in range(len(BM25_TERMS))],
    )
    postings = None
    for i, t in enumerate(BM25_TERMS):
        p = base.filter(f"tf{i} > 0").select(
            "doc_id",
            F.lit(i).alias("term_i"),
            F.expr(
                f"round({_bm25_term_expr(i, f'tf{i}')}, 6)"
            ).alias("impact"),
        )
        postings = p if postings is None else postings.unionAll(p)
    ranked = postings.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("term_i").orderBy(
                F.desc("impact"), F.asc("doc_id"))
        ),
    )
    tiers = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in TIER_SIZES])).alias("tier_n")
    )
    tiered = ranked.crossJoin(F.broadcast(tiers)).filter(
        F.col("rk") <= F.col("tier_n")
    ).select("tier_n", "doc_id", "impact")
    tier_scores = tiered.groupBy("tier_n", "doc_id").agg(
        F.expr(
            "CAST(SUM(CAST(impact AS DECIMAL(20,6))) AS DOUBLE)"
        ).alias("score")
    )
    tier_top = tier_scores.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("tier_n").orderBy(
                F.desc("score"), F.asc("doc_id"))
        ),
    ).filter(F.col("rk") <= BM25_TOP_K)
    full_top = (
        base.select(
            "doc_id",
            F.expr(
                _bm25_score_expr(lambda t: f"tf{BM25_TERMS.index(t)}")
            ).alias("score"),
        )
        .filter("score > 0")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
        .select(F.col("doc_id").alias("f_doc_id"))
    )
    tier_sizes = tiered.groupBy("tier_n").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tier_postings")
    )
    n_full = postings.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_full_postings")
    )
    recall = (
        tier_top.join(
            F.broadcast(full_top),
            F.col("doc_id") == F.col("f_doc_id"),
            "left",
        )
        .groupBy("tier_n")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN f_doc_id IS NOT NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_hit")
        )
    )
    return (
        tier_sizes.join(recall, "tier_n")
        .crossJoin(F.broadcast(n_full))
        .select(
            "tier_n", "n_tier_postings", "n_full_postings",
            F.expr(
                f"round(CAST(n_hit AS DOUBLE)"
                f" / CAST({BM25_TOP_K} AS DOUBLE), 4)"
            ).alias("recall_at_k"),
        )
        .orderBy("tier_n")
    )


# ---------------------------------------------------------------------------
# annotator agreement (Cohen's kappa between two deterministic labelers)
# ---------------------------------------------------------------------------

def _labeler_exprs(exprs: dict) -> tuple[str, str]:
    """Two independent pass/fail labelers from token statistics, all
    comparisons in exact integers (no float thresholds): labeler A =
    length + stopword density; labeler B = token shape (mean length in
    [3,8]) + lexical diversity (uniq ratio >= 1/2)."""
    a = (
        f"CASE WHEN {exprs['n_tokens']} >= 10"
        f" AND 10 * {exprs['n_en_stop']} >= {exprs['n_tokens']}"
        f" THEN 1 ELSE 0 END"
    )
    b = (
        f"CASE WHEN 3 * {exprs['n_tokens']} <= {exprs['sum_token_len']}"
        f" AND {exprs['sum_token_len']} <= 8 * {exprs['n_tokens']}"
        f" AND 2 * {exprs['n_uniq_tokens']} >= {exprs['n_tokens']}"
        f" THEN 1 ELSE 0 END"
    )
    return a, b


def _kappa_sql(label_a: str, label_b: str) -> str:
    return f"""
    WITH labeled AS (
      SELECT {label_a} AS la, {label_b} AS lb FROM documents
    ),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(la * lb) AS BIGINT) AS both_pass,
             CAST(SUM((1 - la) * (1 - lb)) AS BIGINT) AS both_fail,
             CAST(SUM(la) AS BIGINT) AS a_pass,
             CAST(SUM(lb) AS BIGINT) AS b_pass
      FROM labeled
    )
    SELECT n AS n_docs, both_pass, both_fail,
           n - both_pass - both_fail AS n_disagree,
           round(CAST(both_pass + both_fail AS DOUBLE) / n, 6) AS p_observed,
           round((CAST(a_pass AS DOUBLE) / n) * (CAST(b_pass AS DOUBLE) / n)
                 + (CAST(n - a_pass AS DOUBLE) / n)
                   * (CAST(n - b_pass AS DOUBLE) / n), 6) AS p_chance,
           round((CAST(both_pass + both_fail AS DOUBLE) / n
                  - ((CAST(a_pass AS DOUBLE) / n)
                     * (CAST(b_pass AS DOUBLE) / n)
                     + (CAST(n - a_pass AS DOUBLE) / n)
                       * (CAST(n - b_pass AS DOUBLE) / n)))
                 / (CAST(1 AS DOUBLE)
                    - ((CAST(a_pass AS DOUBLE) / n)
                       * (CAST(b_pass AS DOUBLE) / n)
                       + (CAST(n - a_pass AS DOUBLE) / n)
                         * (CAST(n - b_pass AS DOUBLE) / n))), 6) AS kappa
    FROM counts
    """


@register(
    "pipeline_labeler_agreement",
    oracle=_kappa_sql(*_labeler_exprs(_D)),
    doc="Cohen's kappa between two independent deterministic document "
        "labelers (length+stopword-density vs token-shape+diversity) — "
        "the annotation-QA readout a labeling campaign runs before "
        "trusting its quality labels: observed agreement, chance "
        "agreement from the marginals, and kappa, all closed-form "
        "doubles over exact integer confusion-cell counts from ONE "
        "map-side-combinable aggregate (no shuffle wider than the "
        "5-number summary). Labeler thresholds are exact-integer "
        "comparisons (10*stop>=tokens etc.), so labels are "
        "bit-identical in both engines.",
)
def pipeline_labeler_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    docs.createOrReplaceTempView("documents")
    return spark.sql(_kappa_sql(*_labeler_exprs(_S)))


# ---------------------------------------------------------------------------
# proximity search (NEAR operator): co-occurrence vs within-window share
# ---------------------------------------------------------------------------

PROX_TOPN = 8      # pairs drawn from the top-N corpus tokens
PROX_WINDOW = 5    # |pos_a - pos_b| <= W counts as "near"

#: scoring over `occ` (doc_id, t, pos — positional postings of the
#: top-N tokens): document frequencies, pairwise co-occurrence, and
#: the within-window share — the NEAR operator an inverted index with
#: positions supports and a bag-of-words one cannot. Exact integers
#: plus one final division per pair.
_PROX_SCORE = f"""
    pres AS (SELECT DISTINCT doc_id, t FROM occ),
    df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM pres GROUP BY t),
    co AS (
      SELECT a.t AS t_a, b.t AS t_b, CAST(COUNT(*) AS BIGINT) AS co_df
      FROM pres a JOIN pres b
        ON b.doc_id = a.doc_id AND a.t < b.t
      GROUP BY a.t, b.t
    ),
    near AS (
      SELECT a.t AS t_a, b.t AS t_b,
             CAST(COUNT(DISTINCT a.doc_id) AS BIGINT) AS near_df
      FROM occ a JOIN occ b
        ON b.doc_id = a.doc_id AND a.t < b.t
       AND abs(a.pos - b.pos) <= {PROX_WINDOW}
      GROUP BY a.t, b.t
    )
    SELECT co.t_a, co.t_b,
           da.df AS df_a, db.df AS df_b, co.co_df,
           COALESCE(near.near_df, 0) AS near_df,
           round(CAST(COALESCE(near.near_df, 0) AS DOUBLE)
                 / CAST(co.co_df AS DOUBLE), 6) AS near_share
    FROM co
    JOIN df da ON da.t = co.t_a
    JOIN df db ON db.t = co.t_b
    LEFT JOIN near ON near.t_a = co.t_a AND near.t_b = co.t_b
    ORDER BY co.t_a, co.t_b
    """


@register(
    "search_proximity_lift",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents
    ),
    postok AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks
      FROM toks
    ),
    alltok AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos, toks[pos] AS t
      FROM postok WHERE toks[pos] <> ''
    ),
    topn AS (
      SELECT t FROM (
        SELECT t, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS rk
        FROM alltok GROUP BY t
      ) v WHERE rk <= {PROX_TOPN}
    ),
    occ AS (
      SELECT alltok.doc_id, alltok.t, alltok.pos
      FROM alltok JOIN topn ON topn.t = alltok.t
    ),
    {_PROX_SCORE}
    """,
    doc=f"Proximity search (the NEAR operator): for every pair of the "
        f"{PROX_TOPN} most frequent corpus tokens, the share of "
        f"co-occurring documents where the terms appear within "
        f"{PROX_WINDOW} positions — what a POSITIONAL inverted index "
        "buys over bag-of-words (text_inverted_index stores no "
        "positions; phrase and NEAR queries need them). near_share "
        "close to 1 marks collocations tighter than co-occurrence "
        "alone can see; near 0 marks topically-related-but-separated "
        "pairs. Positional postings join per doc_id (co-partitioned, "
        "position lists per doc are short), document frequencies and "
        "pair counts are exact integers, one division per pair. Top-N "
        "selection is a distributed TakeOrdered on the Spark side.",
)
def search_proximity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    alltok = (
        docs.select(
            "doc_id",
            F.posexplode(F.expr("split(lower(text), ' ')")).alias("p0", "t"),
        )
        .filter("t <> ''")
        .select("doc_id", F.expr("CAST(p0 + 1 AS BIGINT)").alias("pos"), "t")
    )
    topn = (
        alltok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(PROX_TOPN)
        .select("t")
    )
    occ = alltok.join(F.broadcast(topn), "t").select("doc_id", "t", "pos")
    occ.createOrReplaceTempView("occ")
    return spark.sql(f"WITH {_PROX_SCORE}")


# ---------------------------------------------------------------------------
# cost-based gate ordering (run cheap selective filters first)
# ---------------------------------------------------------------------------

#: shared scorer over a `stats` relation (gate, n, npass, cost):
#: pass rates and unit costs are single divisions of exact integers
#: rounded at 9dp; each permutation's expected per-doc cost under the
#: independence model c1 + s1·c2 + s1·s2·c3 is one closed-form
#: expression of those rounded values. The greedy rule (descending
#: drop-rate per unit cost) is provably optimal for independent
#: filters — is_greedy == is_optimal on every run is the empirical
#: restatement of that theorem.
_GATE_ORDER_SCORE = """
    derived AS (
      SELECT gate,
             round(CAST(npass AS DOUBLE) / CAST(n AS DOUBLE), 9) AS s,
             round(CAST(cost AS DOUBLE) / CAST(n AS DOUBLE), 9) AS c
      FROM stats
    ),
    ranked AS (
      SELECT gate, s, c,
             ROW_NUMBER() OVER (
               ORDER BY (CAST(1 AS DOUBLE) - s) / c DESC, gate
             ) AS greedy_rk
      FROM derived
    ),
    perms AS (
      SELECT g1.gate AS ord_first, g2.gate AS ord_second,
             g3.gate AS ord_third,
             round(g1.c + g1.s * g2.c + g1.s * g2.s * g3.c, 6)
               AS expected_cost_per_doc,
             CASE WHEN g1.greedy_rk = 1 AND g2.greedy_rk = 2
                  THEN 1 ELSE 0 END AS is_greedy
      FROM ranked g1
      JOIN ranked g2 ON g2.gate <> g1.gate
      JOIN ranked g3 ON g3.gate <> g1.gate AND g3.gate <> g2.gate
    )
    SELECT ord_first, ord_second, ord_third, expected_cost_per_doc,
           is_greedy,
           CASE WHEN expected_cost_per_doc
                     = MIN(expected_cost_per_doc) OVER () THEN 1
                ELSE 0 END AS is_optimal
    FROM perms
    ORDER BY expected_cost_per_doc, ord_first, ord_second
    """


def _gate_stats_sql(quality: str, shingles_len: str, n_tokens: str) -> str:
    """Per-gate selectivity + unit-cost measurement (engine-specific
    predicate/size expressions): lang is a metadata equality (cost 1
    per doc), quality tokenizes (cost = tokens), repetition shingles
    (cost = shingles)."""
    return f"""
    stats AS (
      SELECT 'lang' AS gate, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS npass,
             CAST(COUNT(*) AS BIGINT) AS cost
      FROM documents
      UNION ALL
      SELECT 'quality' AS gate, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {quality} THEN 1 ELSE 0 END)
                  AS BIGINT) AS npass,
             CAST(SUM({n_tokens}) AS BIGINT) AS cost
      FROM documents
      UNION ALL
      SELECT 'repetition' AS gate, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN NOT ({{rep}}) THEN 1 ELSE 0 END)
                  AS BIGINT) AS npass,
             CAST(SUM({shingles_len}) AS BIGINT) AS cost
      FROM documents
    )
    """


@register(
    "pipeline_gate_cost_order",
    oracle=(
        "WITH "
        + _gate_stats_sql(
            _QUALITY_DUCK, f"len({SHINGLES_DUCK})", _D["n_tokens"]
        ).format(rep=_REP_DUP_DUCK)
        + ","
        + _GATE_ORDER_SCORE
    ),
    doc="Cost-based gate ordering — the pre-flight a 100 TB cleaning "
        "run does before wiring its filter DAG: measure each gate's "
        "pass rate and unit cost (lang = one metadata equality, "
        "quality = tokenize, repetition = shingle), then score every "
        "execution order's expected per-doc cost under independence "
        "(c1 + s1·c2 + s1·s2·c3 — later gates only pay for survivors). "
        "The greedy rule — descending drop-rate per unit cost — is "
        "provably optimal for independent filters, and the output "
        "shows it: the is_greedy row is the is_optimal row. Wrong "
        "ordering costs real money at scale (shingling every doc that "
        "a 1-per-doc lang check would have dropped); this table is "
        "the evidence for the cheap-selective-first wiring. Three "
        "map-side-combinable aggregates; everything downstream is a "
        "6-row bounded permutation join.",
)
def pipeline_gate_cost_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    docs.createOrReplaceTempView("documents")
    return spark.sql(
        "WITH "
        + _gate_stats_sql(
            _QUALITY_SPARK, f"size({SHINGLES_SPARK})", _S["n_tokens"]
        ).format(rep=_REP_DUP_SPARK)
        + ","
        + _GATE_ORDER_SCORE
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit (training-data governance)
# ---------------------------------------------------------------------------

K_ANON = 5   # a quasi-identifier class smaller than this is re-identifiable
L_DIV = 3    # a class needs >= this many distinct sensitive values
ACCTBAL_BAND = 2000  # account-balance generalization width

# one SQL text for BOTH engines (floor/COUNT/CASE are portable and all
# outputs are exact integers or single divisions rounded once at the end)
_K_ANON_SQL = f"""
    WITH classes AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / CAST({ACCTBAL_BAND} AS DOUBLE))
                  AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
      FROM customer
      GROUP BY c_nationkey,
               CAST(floor(c_acctbal / CAST({ACCTBAL_BAND} AS DOUBLE))
                    AS BIGINT)
    )
    SELECT c_nationkey,
           CAST(SUM(class_size) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END)
                AS BIGINT) AS k_violating_classes,
           CAST(SUM(CASE WHEN class_size < {K_ANON} THEN class_size
                         ELSE 0 END) AS BIGINT) AS k_violating_rows,
           CAST(SUM(CASE WHEN n_sensitive >= {L_DIV} THEN 1 ELSE 0 END)
                AS BIGINT) AS l_diverse_classes,
           round(CAST(SUM(CASE WHEN class_size < {K_ANON} THEN class_size
                              ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(class_size) AS DOUBLE), 6) AS suppression_rate
    FROM classes
    GROUP BY c_nationkey
    ORDER BY c_nationkey
"""


@register(
    "pipeline_k_anonymity",
    oracle=_K_ANON_SQL,
    doc=f"k-anonymity / l-diversity privacy audit (training-data "
        f"governance — the release-gate complement of text_pii_redact): "
        f"quasi-identifier classes are (nation, acctbal band of "
        f"{ACCTBAL_BAND}); a class smaller than k={K_ANON} is "
        f"re-identifiable and its rows need suppression or coarser "
        f"generalization before release, and a class whose sensitive "
        f"attribute (mktsegment) shows < l={L_DIV} distinct values leaks "
        "it by membership alone. Per-nation readout: class counts, "
        "k-violations (classes + rows), l-diverse classes, suppression "
        "rate. Shape: ONE map-side-combinable aggregate over the QI "
        "grain then a per-nation rollup — two shuffles on bounded key "
        "spaces regardless of corpus size.",
)
def pipeline_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")["customer"]
    customer.createOrReplaceTempView("customer")
    return spark.sql(_K_ANON_SQL)


# ---------------------------------------------------------------------------
# right-to-be-forgotten deletion cascade (governance twin of k-anonymity)
# ---------------------------------------------------------------------------

DEL_MODULUS = 50  # ~2% of customers request deletion in the fixture

_DEL_HASH_SPARK = (
    "CAST(conv(substr(md5(concat('del:', c_custkey)), 1, 8), 16, 10) "
    "AS BIGINT)"
)
_DEL_HASH_DUCK = "(('0x' || substr(md5(concat('del:', c_custkey)), 1, 8))::BIGINT)"


def _deletion_cascade_sql(hash_int: str) -> str:
    """One SQL text for both engines, parameterized only on the
    hex-md5→BIGINT conversion. The kill-list is a deterministic ~2%
    customer sample; every downstream count is an exact integer."""
    return f"""
    WITH kill AS (
      SELECT c_custkey FROM customer
      WHERE {hash_int} % {DEL_MODULUS} = 0
    ),
    o AS (
      SELECT o_orderkey
      FROM orders JOIN kill ON o_custkey = c_custkey
    ),
    l AS (
      SELECT l_orderkey
      FROM lineitem JOIN o ON lineitem.l_orderkey = o.o_orderkey
    ),
    e AS (
      SELECT event_id
      FROM events JOIN kill ON user_id = c_custkey
    )
    SELECT table_name, n_rows FROM (
      SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM kill
      UNION ALL
      SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM o
      UNION ALL
      SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM l
      UNION ALL
      SELECT 'events', CAST(COUNT(*) AS BIGINT) FROM e
    ) m
    ORDER BY table_name
    """


@register(
    "pipeline_deletion_cascade",
    oracle=_deletion_cascade_sql(_DEL_HASH_DUCK),
    doc="Right-to-be-forgotten deletion manifest (governance twin of "
        "pipeline_k_anonymity): a deterministic ~2% customer kill-list "
        "cascades through the foreign-key graph — orders by custkey, "
        "lineitem by the affected orderkeys, events by user id — and the "
        "output is the per-table delete-row manifest a compliance job "
        "must apply. Shape at 100 TB: the kill-list and the affected "
        "orderkey set are both tiny relative to the fact tables, so every "
        "cascade step is a broadcast semi-join against a full scan — one "
        "pass per table, no fact-table shuffle; counts are map-side "
        "combinable.",
)
def pipeline_deletion_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem", "events"):
        load(spark, sf_dir, t)[t].createOrReplaceTempView(t)
    return spark.sql(_deletion_cascade_sql(_DEL_HASH_SPARK))


# ---------------------------------------------------------------------------
# incremental BM25 index-stats maintenance (round 11 — the SEARCH family's
# incremental twin: LSH has sim_incremental_lsh_index, IVF/PQ theirs)
# ---------------------------------------------------------------------------

def _bm25_side_stats_exprs():
    """One-row mergeable index statistics: exact-integer doc count, total
    document length, and per-query-term document frequencies — every one
    additive over disjoint document sets, which is what makes the daily
    index update an APPEND + ADD, never a corpus rescan."""
    return [
        ("CAST(COUNT(*) AS BIGINT)", "n"),
        ("CAST(SUM(size(split(lower(text), ' '))) AS BIGINT)", "sdl"),
        *_BM25_STATS_SPARK,
    ]


def _bm25_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) postings for the fixed query terms — a pure
    per-document function, so a batch's postings are computed from the
    batch alone and appended; existing postings are never rewritten
    (byte-stability pinned by tests/test_incremental_bm25.py)."""
    entries = F.explode(F.array(*[
        F.struct(
            F.lit(t).alias("term"),
            F.expr(_tf_spark(t)).cast("long").alias("tf"),
        )
        for t in BM25_TERMS
    ])).alias("p")
    return (
        docs.select("doc_id", entries)
        .select("doc_id", "p.term", "p.tf")
        .filter(F.col("tf") > 0)
    )


_INCR_BM25_IDF_BEFORE = (
    "round((CAST(n_existing AS DOUBLE) - df_existing + 0.5)"
    " / (df_existing + 0.5), 6)"
)
_INCR_BM25_IDF_AFTER = (
    "round((CAST(n_total AS DOUBLE) - df_total + 0.5)"
    " / (df_total + 0.5), 6)"
)


def _incr_bm25_oracle() -> str:
    from ..operators.dedup import INCR_SPLIT

    dfe = ", ".join(
        f"CAST(SUM(CASE WHEN {_tf_duck(t)} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS dfe{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    dft = ", ".join(
        f"CAST(SUM(CASE WHEN {_tf_duck(t)} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS dft{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    arms = "\n      UNION ALL\n".join(
        f"""
      SELECT '{t}' AS term, e.dfe{i} AS df_existing,
             f.dft{i} - e.dfe{i} AS df_batch, f.dft{i} AS df_total,
             e.n_e AS n_existing, f.n_t AS n_total,
             round(CAST(e.sdl_e AS DOUBLE) / e.n_e, 6) AS avgdl_existing,
             round(CAST(f.sdl_t AS DOUBLE) / f.n_t, 6) AS avgdl_total,
             round((CAST(e.n_e AS DOUBLE) - e.dfe{i} + 0.5)
                   / (e.dfe{i} + 0.5), 6) AS idf_before,
             round((CAST(f.n_t AS DOUBLE) - f.dft{i} + 0.5)
                   / (f.dft{i} + 0.5), 6) AS idf_after
      FROM e, f"""
        for i, t in enumerate(BM25_TERMS)
    )
    return f"""
    WITH e AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_e,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS sdl_e,
             {dfe}
      FROM documents WHERE doc_id < {INCR_SPLIT}
    ),
    f AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_t,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS sdl_t,
             {dft}
      FROM documents
    ),
    arms AS ({arms}
    )
    SELECT term, df_existing, df_batch, df_total, n_existing, n_total,
           avgdl_existing, avgdl_total, idf_before, idf_after,
           round(idf_after - idf_before, 6) AS idf_drift
    FROM arms ORDER BY term
    """


def _register_incr_bm25():
    from ..operators.dedup import INCR_SPLIT

    @register(
        "search_incremental_bm25",
        oracle=_incr_bm25_oracle(),
        doc="Incremental BM25 index-stats maintenance — the SEARCH "
            "family's incremental twin (fourth family, after the LSH "
            "band index, IVF cells, and PQ codes): a daily document "
            "batch contributes postings computed from the BATCH ALONE "
            "(tf is a pure per-doc function; existing postings are "
            "byte-stable on append) and the ranking-relevant global "
            "stats (N, total doc length, per-term document frequencies) "
            "update by ADDITION of one tiny mergeable row. Output is the "
            "stats-staleness signal that schedules an index refresh: "
            "per query term, df/N/avgdl before vs after the batch and "
            "the rational-idf drift (BM25 served with stale idf degrades "
            "silently as the corpus grows). THE SPARK SIDE COMPUTES THE "
            "TOTALS BY ADDITION of existing-only + batch-only "
            "aggregates while the ORACLE computes them over the full "
            "corpus directly — the driver's hash gate therefore PROVES "
            "merge-equals-rebuild for every statistic, not just asserts "
            "it. Scale shape: two embarrassingly-parallel scans over "
            "disjoint doc sets (production keeps the existing row as a "
            "stored index artifact — daily work is the batch scan only), "
            "one cross join of two 1-row frames, 3 output rows.",
    )
    def search_incremental_bm25(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        docs = load(spark, sf_dir, "documents")["documents"]
        existing = docs.filter(F.col("doc_id") < INCR_SPLIT)
        batch = docs.filter(F.col("doc_id") >= INCR_SPLIT)
        stats_exprs = _bm25_side_stats_exprs()
        e = existing.agg(*[F.expr(x).alias(f"{a}_e") for x, a in stats_exprs])
        b = batch.agg(*[F.expr(x).alias(f"{a}_b") for x, a in stats_exprs])
        stack = ", ".join(
            f"'{t}', df{i}_e, df{i}_b" for i, t in enumerate(BM25_TERMS)
        )
        per_term = e.crossJoin(b).selectExpr(
            "n_e", "n_b", "sdl_e", "sdl_b",
            f"stack({len(BM25_TERMS)}, {stack})"
            " AS (term, df_existing, df_batch)",
        )
        return per_term.select(
            "term",
            "df_existing",
            "df_batch",
            (F.col("df_existing") + F.col("df_batch")).alias("df_total"),
            F.col("n_e").alias("n_existing"),
            (F.col("n_e") + F.col("n_b")).alias("n_total"),
            F.expr("round(CAST(sdl_e AS DOUBLE) / n_e, 6)")
            .alias("avgdl_existing"),
            F.expr(
                "round(CAST(sdl_e + sdl_b AS DOUBLE) / (n_e + n_b), 6)"
            ).alias("avgdl_total"),
        ).select(
            "*",
            F.expr(_INCR_BM25_IDF_BEFORE).alias("idf_before"),
            F.expr(_INCR_BM25_IDF_AFTER).alias("idf_after"),
        ).select(
            "*",
            F.expr("round(idf_after - idf_before, 6)").alias("idf_drift"),
        ).orderBy("term")


_register_incr_bm25()


@register(
    "stream_incremental_bm25_ingest",
    oracle=_incr_bm25_oracle(),
    doc="Streaming BM25 index maintenance — the search-family twin of "
        "stream_incremental_lsh_ingest: the daily document batch arrives "
        "as a Structured Streaming file source over several micro-batches "
        "(maxFilesPerTrigger=1, availableNow + checkpoint); each "
        "micro-batch appends its postings (pure per-doc tf — existing "
        "files byte-stable) AND one mergeable stats row (n, total length, "
        "per-term df — all additive) to the persistent index artifacts. "
        "After the stream drains, the drift table is computed from the "
        "ARTIFACTS: the stored existing-side stats row plus the SUM of "
        "the per-micro-batch stat rows. Same oracle as "
        "search_incremental_bm25 (full-corpus recompute), so the hash "
        "gate proves the mergeable-stats law holds at micro-batch "
        "granularity — stats merged across arbitrary micro-batch "
        "boundaries equal the from-scratch rebuild.",
)
def stream_incremental_bm25_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    artifact_base_dir: "str | None" = None,
) -> DataFrame:
    import os
    import tempfile

    from ..operators.dedup import INCR_SPLIT

    docs = load(spark, sf_dir, "documents")["documents"]
    stats_exprs = _bm25_side_stats_exprs()

    def side_stats(df):
        return df.agg(*[F.expr(x).alias(a) for x, a in stats_exprs])

    # artifact layout: under ``artifact_base_dir`` when the caller wants
    # to inspect THIS run's artifacts (tests), else fresh temp dirs
    if artifact_base_dir is not None:
        stats_dir = os.path.join(artifact_base_dir, "stats")
        post_dir = os.path.join(artifact_base_dir, "postings")
        in_dir = os.path.join(artifact_base_dir, "in")
        ckpt_dir = os.path.join(artifact_base_dir, "ckpt")
        for d in (stats_dir, post_dir, in_dir):
            os.makedirs(d, exist_ok=True)
    else:
        stats_dir = tempfile.mkdtemp(prefix="stream_bm25_stats_")
        post_dir = tempfile.mkdtemp(prefix="stream_bm25_post_")
        in_dir = tempfile.mkdtemp(prefix="stream_bm25_in_")
        ckpt_dir = tempfile.mkdtemp(prefix="stream_bm25_ckpt_")

    # persistent artifacts: existing-side stats row + existing postings
    existing = docs.filter(F.col("doc_id") < INCR_SPLIT)
    side_stats(existing).write.mode("overwrite").parquet(f"{stats_dir}/existing")
    _bm25_postings(existing).write.mode("overwrite").parquet(post_dir)

    # the arriving batch, split into several files -> several micro-batches
    docs.filter(F.col("doc_id") >= INCR_SPLIT).repartition(4).write.mode(
        "overwrite"
    ).parquet(in_dir)

    def process(batch_df, _batch_id) -> None:
        # maintenance writes: postings append (byte-stable for old files)
        _bm25_postings(batch_df).write.mode("append").parquet(post_dir)
        # ... and ONE mergeable stats row per micro-batch
        side_stats(batch_df).write.mode("append").parquet(
            f"{stats_dir}/batches"
        )

    query = (
        spark.readStream.schema(docs.schema)
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
            "stream_incremental_bm25_ingest: stream drained without any "
            "micro-batch writing the stats artifact — empty input split?"
        )

    # drift table from the ARTIFACTS: stored existing row + SUM of the
    # per-micro-batch rows (the additive merge, now across micro-batch
    # boundaries chosen by the stream, not by us)
    e = spark.read.parquet(f"{stats_dir}/existing").select(
        *[F.col(a).alias(f"{a}_e") for _, a in stats_exprs]
    )
    b = spark.read.parquet(f"{stats_dir}/batches").agg(
        *[F.sum(a).cast("bigint").alias(f"{a}_b") for _, a in stats_exprs]
    )
    stack = ", ".join(
        f"'{t}', df{i}_e, df{i}_b" for i, t in enumerate(BM25_TERMS)
    )
    per_term = e.crossJoin(b).selectExpr(
        "n_e", "n_b", "sdl_e", "sdl_b",
        f"stack({len(BM25_TERMS)}, {stack})"
        " AS (term, df_existing, df_batch)",
    )
    return per_term.select(
        "term",
        "df_existing",
        "df_batch",
        (F.col("df_existing") + F.col("df_batch")).alias("df_total"),
        F.col("n_e").alias("n_existing"),
        (F.col("n_e") + F.col("n_b")).alias("n_total"),
        F.expr("round(CAST(sdl_e AS DOUBLE) / n_e, 6)")
        .alias("avgdl_existing"),
        F.expr(
            "round(CAST(sdl_e + sdl_b AS DOUBLE) / (n_e + n_b), 6)"
        ).alias("avgdl_total"),
    ).select(
        "*",
        F.expr(_INCR_BM25_IDF_BEFORE).alias("idf_before"),
        F.expr(_INCR_BM25_IDF_AFTER).alias("idf_after"),
    ).select(
        "*",
        F.expr("round(idf_after - idf_before, 6)").alias("idf_drift"),
    ).orderBy("term")


# ---------------------------------------------------------------------------
# quality-score calibration (reliability bins for the gate-proxy classifier)
# ---------------------------------------------------------------------------

# a deliberately CHEAP document-quality score in [0, 1] — the linear proxy
# a pipeline would fit to predict the expensive gate, built from the same
# shared token features (all-integer counts, so the 6dp-rounded double is
# bit-identical in both engines)
_CALIB_SCORE_SPARK = (
    f"round(0.5 * (CAST({_S['n_uniq_tokens']} AS DOUBLE) / {_S['n_tokens']})"
    f" + 0.3 * (CAST(size(filter({TOKS_SPARK}, t -> length(t) >= 5))"
    f" AS DOUBLE) / {_S['n_tokens']})"
    f" + 0.2 * least(CAST({_S['n_tokens']} AS DOUBLE) / 100, 1.0), 6)"
)
_CALIB_SCORE_DUCK = (
    f"round(0.5 * (CAST({_D['n_uniq_tokens']} AS DOUBLE) / {_D['n_tokens']})"
    f" + 0.3 * (CAST(len(list_filter({TOKS_DUCK}, t -> len(t) >= 5))"
    f" AS DOUBLE) / {_D['n_tokens']})"
    f" + 0.2 * least(CAST({_D['n_tokens']} AS DOUBLE) / 100, 1.0), 6)"
)


@register(
    "pipeline_score_calibration",
    bench=True,
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {_CALIB_SCORE_DUCK} AS score,
             CASE WHEN ({_QUALITY_DUCK}) AND NOT ({_REP_DUP_DUCK})
                  THEN 1.0 ELSE 0.0 END AS accepted
      FROM documents
    )
    SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(avg(score), 6) AS mean_score,
           round(avg(accepted), 6) AS frac_accepted,
           round(abs(round(avg(score), 6) - round(avg(accepted), 6)), 6)
             AS calib_gap
    FROM scored GROUP BY bin
    """,
    doc="Quality-score calibration audit: reliability bins for the cheap "
        "linear gate-proxy score against the composed quality+repetition "
        "gate it stands in for. Ten equal-width score bins; per bin the "
        "mean predicted score, the observed acceptance rate, and the "
        "|gap| — the per-bin terms of expected calibration error. This is "
        "the audit run before TRUSTING a fast filter at 100 TB: a "
        "miscalibrated proxy silently shifts the corpus mix wherever the "
        "expensive gate isn't re-checked. One narrow map over documents "
        "plus a 10-key aggregate — no shuffle pressure at any scale; the "
        "score is 6dp-rounded BEFORE binning/averaging so both engines "
        "bin identically.",
)
def pipeline_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        F.expr(_CALIB_SCORE_SPARK).alias("score"),
        F.expr(
            f"CAST(CASE WHEN ({_QUALITY_SPARK}) AND NOT ({_REP_DUP_SPARK}) "
            "THEN 1.0 ELSE 0.0 END AS DOUBLE)"
        ).alias("accepted"),
    )
    return (
        scored.groupBy(
            F.least(F.floor(F.col("score") * 10), F.lit(9))
            .cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("accepted"), 6).alias("frac_accepted"),
        )
        .select(
            "bin", "n_docs", "mean_score", "frac_accepted",
            F.round(
                F.abs(F.col("mean_score") - F.col("frac_accepted")), 6
            ).alias("calib_gap"),
        )
    )


# -- trained quality classifier (round-15 verdict #3): Naive Bayes as pure
# -- aggregation — the CCNet/GPT-3 pipeline stage that DISTILLS the
# -- hand-set gate into a trained model, completing the
# -- train-a-model-as-a-query family (bigram LM → BPE → DoReMi → this)

#: top-V training-corpus tokens kept as NB features; everything else folds
#: into one OOV bucket, so the trained model is BOUNDED at 2 × (V + 1)
#: rows regardless of corpus size — it broadcasts at 100 TB exactly like
#: the 27^3-bounded char-trigram LM
NB_VOCAB_V = 2000

def _nb_ctes_duck(label_sql: str) -> str:
    """The NB training CTE chain for an arbitrary label expression —
    shared by the binary gate classifier and the multiclass source
    classifier so the model algebra cannot drift between them."""
    return f"""
    gate AS (
      SELECT doc_id, text, {label_sql} AS y
      FROM documents
    ),
    trainset AS (SELECT * FROM gate WHERE doc_id % 2 = 0),
    tok_train AS (
      SELECT y, unnest({TOKS_DUCK}) AS tok FROM trainset
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM tok_train GROUP BY tok
      ) WHERE rk <= {NB_VOCAB_V}
    ),
    vsize AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS v FROM vocab),
    mapped AS (
      SELECT t.y,
             CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<OOV>' END AS tok
      FROM tok_train t LEFT JOIN vocab v ON t.tok = v.tok
    ),
    counts AS (
      SELECT y, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM mapped GROUP BY y, tok
    ),
    label_tot AS (
      SELECT y, CAST(SUM(c) AS BIGINT) AS ct FROM counts GROUP BY y
    ),
    priors AS (
      SELECT y, CAST(COUNT(*) AS BIGINT) AS nd FROM trainset GROUP BY y
    ),
    ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM trainset)
"""


_NB_CTES_DUCK = _nb_ctes_duck(
    f"CASE WHEN ({_QUALITY_DUCK}) THEN 1 ELSE 0 END"
)


@register(
    "text_nb_quality_train",
    oracle=f"""
    WITH {_NB_CTES_DUCK}
    SELECT CAST(c.y AS INT) AS label_pass, c.tok AS token, c.c AS c,
           CAST(c.c + 1 AS BIGINT) AS like_num,
           CAST(lt.ct + vs.v AS BIGINT) AS like_den,
           p.nd AS prior_num, nt.n AS prior_den
    FROM counts c
    JOIN label_tot lt USING (y)
    JOIN priors p USING (y)
    CROSS JOIN vsize vs CROSS JOIN ntot nt
    """,
    doc="Multinomial Naive-Bayes quality classifier, TRAINING as one "
        "aggregation pass: label = the composed quality gate "
        "(text_quality_filter's thresholds), features = the top-"
        f"{NB_VOCAB_V} training-corpus tokens plus one OOV bucket, "
        "trained on the even-doc_id half (held-out odds go to "
        "text_nb_quality_classifier). The model is EXACT-RATIONAL: each "
        "row carries the Laplace-smoothed likelihood as an integer "
        "num/den pair ((c+1) / (label_tokens + V')) and the prior as "
        "n_label/n_train — BIGINTs end to end, so the driver hash gate "
        "compares exact values, no float drift (logs happen only at "
        "SCORING time, the char-LM discipline). Scale shape: vocabulary "
        "selection is a distributed TakeOrdered top-V (no single-"
        "partition window), the OOV fold joins the BROADCAST vocab, and "
        "the model is bounded at 2 x (V + 1) rows whatever the corpus "
        "size — train is one shuffle on (label, token) partials; the "
        "corpus is touched once.",
)
def text_nb_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts, label_tot, priors, vsize, ntot, _vocab = _nb_model(spark, sf_dir)
    return (
        counts.join(F.broadcast(label_tot), "y")
        .join(F.broadcast(priors), "y")
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(ntot))
        .select(
            F.col("y").cast("int").alias("label_pass"),
            F.col("tok").alias("token"),
            "c",
            (F.col("c") + 1).cast("bigint").alias("like_num"),
            (F.col("ct") + F.col("v")).cast("bigint").alias("like_den"),
            F.col("nd").alias("prior_num"),
            F.col("n").alias("prior_den"),
        )
    )


def _nb_model(spark: SparkSession, sf_dir: str, label_expr: str = None):
    """Shared NB training state: (counts, label_tot, priors, vsize, ntot,
    vocab) DataFrames — used by the train query (exact-rational model
    rows) and the scorers (broadcast model, log-space sums). The label
    defaults to the binary quality gate; pass e.g. ``"source"`` for the
    multiclass variant."""
    if label_expr is None:
        label_expr = (
            f"CAST(CASE WHEN ({_QUALITY_SPARK}) THEN 1 ELSE 0 END AS INT)"
        )
    docs = load(spark, sf_dir, "documents")["documents"]
    gate = docs.select(
        "doc_id", "text", F.expr(label_expr).alias("y")
    )
    train = gate.filter(F.col("doc_id") % 2 == 0)
    tok_train = train.select(
        "y", F.explode(F.expr(TOKS_SPARK)).alias("tok")
    )
    # distributed TakeOrderedAndProject, not a single-partition window
    vocab = (
        tok_train.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(NB_VOCAB_V)
        .select("tok")
    )
    vsize = vocab.agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("v")
    )
    mapped = (
        tok_train.join(
            F.broadcast(vocab.withColumn("_v", F.lit(1))), "tok", "left"
        )
        .select(
            "y",
            F.when(F.col("_v").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<OOV>")).alias("tok"),
        )
    )
    counts = mapped.groupBy("y", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    label_tot = counts.groupBy("y").agg(
        F.sum("c").cast("bigint").alias("ct")
    )
    priors = train.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    ntot = train.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return counts, label_tot, priors, vsize, ntot, vocab


#: confusion-matrix oracle shared by the batch scorer and the
#: streaming scorer (identical result contract)
_NB_CLASSIFIER_ORACLE = f"""
    WITH {_NB_CTES_DUCK},
    testset AS (SELECT * FROM gate WHERE doc_id % 2 = 1),
    tok_test AS (
      SELECT doc_id, unnest({TOKS_DUCK}) AS tok FROM testset
    ),
    mapped_test AS (
      SELECT t.doc_id,
             CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<OOV>' END AS tok
      FROM tok_test t LEFT JOIN vocab v ON t.tok = v.tok
    ),
    labels AS (SELECT DISTINCT y FROM trainset),
    terms AS (
      SELECT m.doc_id, l.y,
             ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / (lt.ct + vs.v))
               AS term
      FROM mapped_test m
      CROSS JOIN labels l
      LEFT JOIN counts c ON c.y = l.y AND c.tok = m.tok
      JOIN label_tot lt ON lt.y = l.y
      CROSS JOIN vsize vs
    ),
    doc_scores AS (
      SELECT t.doc_id, t.y,
             SUM(t.term) + ln(CAST(p.nd AS DOUBLE) / nt.n) AS score
      FROM terms t JOIN priors p ON p.y = t.y CROSS JOIN ntot nt
      GROUP BY t.doc_id, t.y, p.nd, nt.n
    ),
    pred AS (
      SELECT doc_id,
             CASE WHEN MAX(CASE WHEN y = 1 THEN score END)
                       > MAX(CASE WHEN y = 0 THEN score END)
                  THEN 1 ELSE 0 END AS pred_pass
      FROM doc_scores GROUP BY doc_id
    )
    SELECT CAST(g.y AS INT) AS gate_pass,
           CAST(p.pred_pass AS INT) AS pred_pass,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN testset g USING (doc_id)
    GROUP BY 1, 2
    """


@register(
    "text_nb_quality_classifier",
    oracle=_NB_CLASSIFIER_ORACLE,
    doc="Naive-Bayes quality classifier, SCORING + confusion matrix on "
        "the held-out odd-doc_id half: per test doc, log-prior plus the "
        "sum of Laplace-smoothed token log-likelihoods under each label "
        "(multinomial NB with the text_nb_quality_train model — same "
        "CTEs, so the two queries cannot drift), argmax prediction with "
        "a deterministic fail-on-tie rule, rolled up into gate-vs-"
        "predicted counts — the CCNet distillation loop closed: hand "
        "gate -> trained classifier -> agreement audit. Float discipline "
        "per the char-LM rule: raw log terms are summed (never rounded "
        "per-term); only the DECISION uses the doubles, and the ~1e-12 "
        "accumulated error sits orders of magnitude inside any real "
        "per-doc margin. Scale shape: the model (<= 2 x (V + 1) rows), "
        "label totals, priors and vocab all BROADCAST; scoring is one "
        "pass over test tokens + one (doc_id) shuffle for the per-doc "
        "sum — the same two-pass train/score plan the perplexity filter "
        "uses at 100 TB.",
)
def text_nb_quality_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    model = _nb_model(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")["documents"]
    gate = docs.select(
        "doc_id",
        "text",
        F.expr(f"CASE WHEN ({_QUALITY_SPARK}) THEN 1 ELSE 0 END")
        .cast("int").alias("y"),
    )
    testset = gate.filter(F.col("doc_id") % 2 == 1)
    pred = _nb_predict(testset, model)
    return (
        pred.join(testset.select("doc_id", "y"), "doc_id")
        .groupBy(
            F.col("y").cast("int").alias("gate_pass"),
            F.col("pred_pass").cast("int").alias("pred_pass"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def _nb_predict(testset: DataFrame, model) -> DataFrame:
    """Binary-gate prediction: ``(doc_id, pred_pass)`` with the strict
    pass-beats-fail comparison (tie -> fail, deterministically)."""
    doc_scores = _nb_doc_scores(testset, model)
    return doc_scores.groupBy("doc_id").agg(
        F.when(
            F.max(F.when(F.col("y") == 1, F.col("score")))
            > F.max(F.when(F.col("y") == 0, F.col("score"))),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("int").alias("pred_pass")
    )


def _nb_doc_scores(testset: DataFrame, model) -> DataFrame:
    """Per-(doc, label) NB log-scores for documents (``doc_id``,
    ``text`` columns required) under the trained model: returns
    ``(doc_id, y, score)``. Per-document work only — broadcast model
    joins plus one (doc_id, label) shuffle — so the streaming scorer
    applies it per micro-batch unchanged."""
    counts, label_tot, priors, vsize, ntot, vocab = model
    tok_test = testset.select(
        "doc_id", F.explode(F.expr(TOKS_SPARK)).alias("tok")
    )
    mapped_test = (
        tok_test.join(
            F.broadcast(vocab.withColumn("_v", F.lit(1))), "tok", "left"
        )
        .select(
            "doc_id",
            F.when(F.col("_v").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<OOV>")).alias("tok"),
        )
    )
    labels = priors.select("y")
    terms = (
        mapped_test.crossJoin(F.broadcast(labels))
        .join(
            F.broadcast(counts.withColumnRenamed("c", "cc")),
            ["y", "tok"], "left",
        )
        .join(F.broadcast(label_tot), "y")
        .crossJoin(F.broadcast(vsize))
        .select(
            "doc_id", "y",
            F.log(
                (F.coalesce(F.col("cc"), F.lit(0)) + 1).cast("double")
                / (F.col("ct") + F.col("v"))
            ).alias("term"),
        )
    )
    doc_scores = (
        terms.join(F.broadcast(priors), "y")
        .crossJoin(F.broadcast(ntot))
        .groupBy("doc_id", "y", "nd", "n")
        .agg(F.sum("term").alias("tsum"))
        .select(
            "doc_id", "y",
            (F.col("tsum")
             + F.log(F.col("nd").cast("double") / F.col("n")))
            .alias("score"),
        )
    )
    return doc_scores


@register(
    "stream_nb_quality_score",
    oracle=_NB_CLASSIFIER_ORACLE,
    doc="Streaming NB quality scoring — the trained-model family joins "
        "the streaming matrix: the Naive-Bayes model (trained in batch "
        "on the even-doc_id half, exactly text_nb_quality_train) is "
        "materialized and BROADCAST; the held-out docs arrive as a "
        "Structured Streaming file source over several micro-batches "
        "(maxFilesPerTrigger=1, availableNow + checkpoint) and each "
        "micro-batch is scored independently — per-document decisions "
        "depend only on the frozen model, so the union over "
        "micro-batches equals the batch scorer BY CONSTRUCTION, and the "
        "shared oracle proves it through the hash gate. This is the "
        "production shape for classifier-gated ingest at 100 TB: train "
        "once on the curated corpus, ship the bounded model to the "
        "stream, score every arriving crawl shard with zero wide "
        "shuffles (broadcast joins + one per-micro-batch doc_id "
        "aggregate).",
)
def stream_nb_quality_score(
    spark: SparkSession,
    sf_dir: str,
    *,
    artifact_base_dir: "str | None" = None,
) -> DataFrame:
    import os
    import tempfile

    docs = load(spark, sf_dir, "documents")["documents"]

    if artifact_base_dir is not None:
        preds_dir = os.path.join(artifact_base_dir, "preds")
        in_dir = os.path.join(artifact_base_dir, "in")
        ckpt_dir = os.path.join(artifact_base_dir, "ckpt")
        for d in (preds_dir, in_dir):
            os.makedirs(d, exist_ok=True)
    else:
        preds_dir = tempfile.mkdtemp(prefix="stream_nb_preds_")
        in_dir = tempfile.mkdtemp(prefix="stream_nb_in_")
        ckpt_dir = tempfile.mkdtemp(prefix="stream_nb_ckpt_")

    # train once, freeze: every model frame is tiny (<= 2 x (V + 1)
    # rows) — localCheckpoint so per-micro-batch scoring reuses the
    # computed model instead of re-running the training lineage
    model = tuple(
        df.localCheckpoint(eager=True) for df in _nb_model(spark, sf_dir)
    )

    # seed so the post-drain read never races an empty stream
    spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("int").alias("pred_pass"),
    ).write.mode("overwrite").parquet(preds_dir)

    test_docs = docs.filter(F.col("doc_id") % 2 == 1)
    test_docs.repartition(4).write.mode("overwrite").parquet(in_dir)

    def process(batch_df, _batch_id) -> None:
        _nb_predict(batch_df, model).write.mode("append").parquet(preds_dir)

    query = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)

    gate = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.expr(f"CASE WHEN ({_QUALITY_SPARK}) THEN 1 ELSE 0 END")
        .cast("int").alias("y"),
    )
    return (
        spark.read.parquet(preds_dir)
        .join(gate, "doc_id")
        .groupBy(
            F.col("y").cast("int").alias("gate_pass"),
            F.col("pred_pass").cast("int").alias("pred_pass"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


_NB_SOURCE_CTES_DUCK = _nb_ctes_duck("source")


@register(
    "text_nb_source_classifier",
    oracle=f"""
    WITH {_NB_SOURCE_CTES_DUCK},
    testset AS (SELECT * FROM gate WHERE doc_id % 2 = 1),
    tok_test AS (
      SELECT doc_id, unnest({TOKS_DUCK}) AS tok FROM testset
    ),
    mapped_test AS (
      SELECT t.doc_id,
             CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<OOV>' END AS tok
      FROM tok_test t LEFT JOIN vocab v ON t.tok = v.tok
    ),
    labels AS (SELECT DISTINCT y FROM trainset),
    terms AS (
      SELECT m.doc_id, l.y,
             ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / (lt.ct + vs.v))
               AS term
      FROM mapped_test m
      CROSS JOIN labels l
      LEFT JOIN counts c ON c.y = l.y AND c.tok = m.tok
      JOIN label_tot lt ON lt.y = l.y
      CROSS JOIN vsize vs
    ),
    doc_scores AS (
      SELECT t.doc_id, t.y,
             SUM(t.term) + ln(CAST(p.nd AS DOUBLE) / nt.n) AS score
      FROM terms t JOIN priors p ON p.y = t.y CROSS JOIN ntot nt
      GROUP BY t.doc_id, t.y, p.nd, nt.n
    ),
    pred AS (
      SELECT doc_id, y AS pred_source FROM (
        SELECT doc_id, y,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY round(score, 6) DESC, y) AS pr
        FROM doc_scores
      ) WHERE pr = 1
    )
    SELECT g.y AS true_source, p.pred_source,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN testset g USING (doc_id)
    GROUP BY 1, 2
    """,
    doc="MULTICLASS Naive Bayes — predict each held-out document's "
        "SOURCE from its token profile (the provenance-attribution / "
        "contamination-tracing pipeline stage: can the engine tell "
        "which crawl a text came from?): same exact training algebra as "
        "the binary gate classifier via the shared CTE builder "
        "(_nb_ctes_duck / _nb_model(label_expr='source')), argmax over "
        "all source labels with 6dp-rounded scores and a smallest-label "
        "tie-break so both engines rank identically, rolled up into the "
        "true-vs-predicted source confusion matrix. Scale shape "
        "unchanged from the binary scorer: the model stays bounded at "
        "n_labels x (V + 1) rows and broadcasts; scoring is one pass "
        "over test tokens + one (doc_id, label) shuffle.",
)
def text_nb_source_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    model = _nb_model(spark, sf_dir, label_expr="source")
    docs = load(spark, sf_dir, "documents")["documents"]
    gate = docs.select("doc_id", "text", F.col("source").alias("y"))
    testset = gate.filter(F.col("doc_id") % 2 == 1)
    doc_scores = _nb_doc_scores(testset, model)
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("y")
    )
    pred = (
        doc_scores.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select("doc_id", F.col("y").alias("pred_source"))
    )
    return (
        pred.join(testset.select("doc_id", "y"), "doc_id")
        .groupBy(
            F.col("y").alias("true_source"),
            F.col("pred_source"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


#: folds in the NB cross-validation eval
NB_KFOLD = 5


@register(
    "text_nb_kfold_eval",
    oracle=f"""
    WITH gate AS (
      SELECT doc_id, text,
             CASE WHEN ({_QUALITY_DUCK}) THEN 1 ELSE 0 END AS y,
             doc_id % {NB_KFOLD} AS fold
      FROM documents
    ),
    folds AS (SELECT unnest(range({NB_KFOLD})) AS f),
    train AS (
      SELECT fl.f, g.doc_id, g.text, g.y
      FROM gate g CROSS JOIN folds fl WHERE g.fold <> fl.f
    ),
    tok_train AS (
      SELECT f, y, unnest({TOKS_DUCK}) AS tok FROM train
    ),
    vocab AS (
      SELECT f, tok FROM (
        SELECT f, tok,
               ROW_NUMBER() OVER (PARTITION BY f
                                  ORDER BY COUNT(*) DESC, tok) AS rk
        FROM tok_train GROUP BY f, tok
      ) WHERE rk <= {NB_VOCAB_V}
    ),
    vsize AS (
      SELECT f, CAST(COUNT(*) + 1 AS BIGINT) AS v FROM vocab GROUP BY f
    ),
    mapped AS (
      SELECT t.f, t.y,
             CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<OOV>' END AS tok
      FROM tok_train t
      LEFT JOIN vocab v ON v.f = t.f AND v.tok = t.tok
    ),
    counts AS (
      SELECT f, y, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM mapped GROUP BY f, y, tok
    ),
    label_tot AS (
      SELECT f, y, CAST(SUM(c) AS BIGINT) AS ct FROM counts GROUP BY f, y
    ),
    priors AS (
      SELECT f, y, CAST(COUNT(*) AS BIGINT) AS nd FROM train GROUP BY f, y
    ),
    ntot AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n FROM train GROUP BY f),
    tok_test AS (
      SELECT fold AS f, doc_id, unnest({TOKS_DUCK}) AS tok FROM gate
    ),
    mapped_test AS (
      SELECT t.f, t.doc_id,
             CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<OOV>' END AS tok
      FROM tok_test t
      LEFT JOIN vocab v ON v.f = t.f AND v.tok = t.tok
    ),
    labels AS (SELECT DISTINCT f, y FROM train),
    terms AS (
      SELECT m.f, m.doc_id, l.y,
             ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / (lt.ct + vs.v))
               AS term
      FROM mapped_test m
      JOIN labels l ON l.f = m.f
      LEFT JOIN counts c ON c.f = m.f AND c.y = l.y AND c.tok = m.tok
      JOIN label_tot lt ON lt.f = m.f AND lt.y = l.y
      JOIN vsize vs ON vs.f = m.f
    ),
    doc_scores AS (
      SELECT t.f, t.doc_id, t.y,
             SUM(t.term) + ln(CAST(p.nd AS DOUBLE) / nt.n) AS score
      FROM terms t
      JOIN priors p ON p.f = t.f AND p.y = t.y
      JOIN ntot nt ON nt.f = t.f
      GROUP BY t.f, t.doc_id, t.y, p.nd, nt.n
    ),
    pred AS (
      SELECT f, doc_id, y AS pred_pass FROM (
        SELECT f, doc_id, y,
               ROW_NUMBER() OVER (PARTITION BY f, doc_id
                                  ORDER BY round(score, 6) DESC, y) AS pr
        FROM doc_scores
      ) WHERE pr = 1
    )
    SELECT CAST(p.f AS INT) AS fold, CAST(g.y AS INT) AS gate_pass,
           CAST(p.pred_pass AS INT) AS pred_pass,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN gate g ON g.doc_id = p.doc_id AND g.fold = p.f
    GROUP BY 1, 2, 3
    """,
    doc=f"{NB_KFOLD}-fold cross-validation of the NB quality classifier "
        "as ONE relational query: the fold id rides every CTE as a "
        "group key (train = corpus x folds minus the held-out fold, "
        "per-fold vocabulary/model/priors, per-fold scoring of exactly "
        "the held-out docs), producing the per-fold confusion cells the "
        "single-split scorer cannot — the variance check run before "
        "trusting a classifier gate at 100 TB. Tie policy matches the "
        "binary scorer (round-6dp rank, tie -> fail). Cost is "
        f"inherently {NB_KFOLD} training passes (k-fold's definition); "
        "each fold's model stays bounded and broadcastable, the fold "
        "dimension just widens the model frames " + str(NB_KFOLD) + "x.",
)
def text_nb_kfold_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    gate = docs.select(
        "doc_id", "text",
        F.expr(f"CASE WHEN ({_QUALITY_SPARK}) THEN 1 ELSE 0 END")
        .cast("int").alias("y"),
        (F.col("doc_id") % NB_KFOLD).alias("fold"),
    )
    folds = spark.range(NB_KFOLD).select(F.col("id").alias("f"))
    train = gate.crossJoin(F.broadcast(folds)).filter(
        F.col("fold") != F.col("f")
    )
    tok_train = train.select(
        "f", "y", F.explode(F.expr(TOKS_SPARK)).alias("tok")
    )
    from pyspark.sql.window import Window as _W

    w_vocab = _W.partitionBy("f").orderBy(F.desc("c"), F.asc("tok"))
    vocab = (
        tok_train.groupBy("f", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(w_vocab))
        .filter(F.col("rk") <= NB_VOCAB_V)
        .select("f", "tok")
    )
    vsize = vocab.groupBy("f").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("v")
    )
    mapped = (
        tok_train.join(
            F.broadcast(vocab.withColumn("_v", F.lit(1))), ["f", "tok"],
            "left",
        )
        .select(
            "f", "y",
            F.when(F.col("_v").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<OOV>")).alias("tok"),
        )
    )
    counts = mapped.groupBy("f", "y", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    label_tot = counts.groupBy("f", "y").agg(
        F.sum("c").cast("bigint").alias("ct")
    )
    priors = train.groupBy("f", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    ntot = train.groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tok_test = gate.select(
        F.col("fold").alias("f"), "doc_id",
        F.explode(F.expr(TOKS_SPARK)).alias("tok"),
    )
    mapped_test = (
        tok_test.join(
            F.broadcast(vocab.withColumn("_v", F.lit(1))), ["f", "tok"],
            "left",
        )
        .select(
            "f", "doc_id",
            F.when(F.col("_v").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<OOV>")).alias("tok"),
        )
    )
    labels = train.select("f", "y").distinct()
    terms = (
        mapped_test.join(F.broadcast(labels), "f")
        .join(
            F.broadcast(counts.withColumnRenamed("c", "cc")),
            ["f", "y", "tok"], "left",
        )
        .join(F.broadcast(label_tot), ["f", "y"])
        .join(F.broadcast(vsize), "f")
        .select(
            "f", "doc_id", "y",
            F.log(
                (F.coalesce(F.col("cc"), F.lit(0)) + 1).cast("double")
                / (F.col("ct") + F.col("v"))
            ).alias("term"),
        )
    )
    doc_scores = (
        terms.join(F.broadcast(priors), ["f", "y"])
        .join(F.broadcast(ntot), "f")
        .groupBy("f", "doc_id", "y", "nd", "n")
        .agg(F.sum("term").alias("tsum"))
        .select(
            "f", "doc_id", "y",
            (F.col("tsum")
             + F.log(F.col("nd").cast("double") / F.col("n")))
            .alias("score"),
        )
    )
    w_pred = _W.partitionBy("f", "doc_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("y")
    )
    pred = (
        doc_scores.withColumn("pr", F.row_number().over(w_pred))
        .filter(F.col("pr") == 1)
        .select("f", "doc_id", F.col("y").alias("pred_pass"))
    )
    return (
        pred.join(
            gate.select(
                "doc_id", F.col("fold").alias("f"),
                F.col("y").alias("gate_pass"),
            ),
            ["f", "doc_id"],
        )
        .groupBy(
            F.col("f").cast("int").alias("fold"),
            F.col("gate_pass").cast("int").alias("gate_pass"),
            F.col("pred_pass").cast("int").alias("pred_pass"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
