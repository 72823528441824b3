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
