"""Text analysis over the ``documents`` table: token statistics, quality
scoring, n-gram-heuristic language ID, document fingerprinting.

Everything is built-in Spark SQL expressions (whole-stage codegen, no
Python in the row path) and every expression has a DuckDB twin so the
driver hash-compares results. Shared token/shingle expression builders
here are reused by the dedup operators.

Scale: all four queries are embarrassingly parallel scans — no shuffle at
all except the final (tiny) aggregations; at 100 TB they are bounded by
parquet scan throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import load, register

# -- shared expression builders (Spark SQL syntax == DuckDB syntax where noted)

#: tokenize on single spaces (the corpus is single-space word soup; split on
#: a literal space keeps Spark's regex split and DuckDB's string_split in
#: exact agreement, empty tokens included)
TOKS_SPARK = "split(text, ' ')"
TOKS_DUCK = "string_split(text, ' ')"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
ES_STOPWORDS = ("el", "la", "de", "los", "que", "y")


def _in_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def spark_token_exprs() -> dict:
    toks = TOKS_SPARK
    return {
        "n_tokens": f"size({toks})",
        "n_uniq_tokens": f"size(array_distinct({toks}))",
        "sum_token_len": f"aggregate(transform({toks}, t -> length(t)), 0, (a, x) -> a + x)",
        "n_en_stop": f"size(filter({toks}, t -> t IN {_in_list(EN_STOPWORDS)}))",
        "n_es_stop": f"size(filter({toks}, t -> t IN {_in_list(ES_STOPWORDS)}))",
    }


def duck_token_exprs() -> dict:
    toks = TOKS_DUCK
    return {
        "n_tokens": f"len({toks})",
        "n_uniq_tokens": f"len(list_distinct({toks}))",
        "sum_token_len": f"list_sum(list_transform({toks}, t -> length(t)))",
        "n_en_stop": f"len(list_filter({toks}, t -> t IN {_in_list(EN_STOPWORDS)}))",
        "n_es_stop": f"len(list_filter({toks}, t -> t IN {_in_list(ES_STOPWORDS)}))",
    }


# 3-token shingles ("n-gram" unit shared by jaccard/minhash dedup).
# Built with slice+zip_with, NOT element_at(split(...), i) in a lambda:
# per-index element_at would re-split the whole text for every position
# (O(n²) per row, and Catalyst does not CSE expressions inside lambdas).
_T = "split(text, ' ')"
_NSH = f"greatest(size({_T}) - 2, 0)"
SHINGLES_SPARK = (
    f"zip_with("
    f"zip_with(slice({_T}, 1, {_NSH}), slice({_T}, 2, {_NSH}), "
    f"(x, y) -> concat(x, ' ', y)), "
    f"slice({_T}, 3, {_NSH}), "
    f"(xy, z) -> concat(xy, ' ', z))"
)
SHINGLES_DUCK = (
    "list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> string_split(text, ' ')[i] || ' ' || "
    "string_split(text, ' ')[i + 1] || ' ' || "
    "string_split(text, ' ')[i + 2])"
)


#: lowercased variants of the shingle builders (HLL sketches fold case)
SHINGLES_SPARK_LOWER = SHINGLES_SPARK.replace("split(text, ' ')", "split(lower(text), ' ')")
SHINGLES_DUCK_LOWER = SHINGLES_DUCK.replace("string_split(text, ' ')", "string_split(lower(text), ' ')")

#: 60-bit integer from a string via md5 — bit-identical in both engines
#: (verified: conv(hex,16,10) == ('0x'||hex)::BIGINT)
def md5_int60_spark(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def md5_int60_duck(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def md5_int32_spark(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def md5_int32_duck(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# token statistics + quality score
# ---------------------------------------------------------------------------

_D = duck_token_exprs()
_S = spark_token_exprs()


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           {_D['n_tokens']} AS n_tokens,
           {_D['n_uniq_tokens']} AS n_uniq_tokens,
           CAST({_D['sum_token_len']} AS DOUBLE) / {_D['n_tokens']} AS avg_token_len,
           CAST({_D['n_uniq_tokens']} AS DOUBLE) / {_D['n_tokens']} AS uniq_ratio,
           CAST({_D['n_en_stop']} AS DOUBLE) / {_D['n_tokens']} AS stopword_ratio
    FROM documents
    """,
    doc="Whitespace token counting + lexical-diversity + stopword-ratio "
        "quality signals, all JVM-side array expressions.",
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.expr(_S["n_tokens"]).alias("n_tokens"),
        F.expr(_S["n_uniq_tokens"]).alias("n_uniq_tokens"),
        F.expr(f"CAST({_S['sum_token_len']} AS DOUBLE) / {_S['n_tokens']}").alias("avg_token_len"),
        F.expr(f"CAST({_S['n_uniq_tokens']} AS DOUBLE) / {_S['n_tokens']}").alias("uniq_ratio"),
        F.expr(f"CAST({_S['n_en_stop']} AS DOUBLE) / {_S['n_tokens']}").alias("stopword_ratio"),
    )


@register(
    "text_quality_filter",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_D['n_tokens']} BETWEEN 20 AND 2000
      AND CAST({_D['n_uniq_tokens']} AS DOUBLE) / {_D['n_tokens']} >= 0.15
      AND CAST({_D['sum_token_len']} AS DOUBLE) / {_D['n_tokens']} BETWEEN 2.0 AND 12.0
    """,
    doc="Quality gate à la C4/Gopher rules: length band, lexical diversity, "
        "mean token length — a pure pushdown-friendly filter.",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.filter(
        F.expr(
            f"{_S['n_tokens']} BETWEEN 20 AND 2000"
            f" AND CAST({_S['n_uniq_tokens']} AS DOUBLE) / {_S['n_tokens']} >= 0.15"
            f" AND CAST({_S['sum_token_len']} AS DOUBLE) / {_S['n_tokens']} BETWEEN 2.0 AND 12.0"
        )
    ).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# language ID (stopword n-gram heuristic)
# ---------------------------------------------------------------------------

@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS lang_labeled,
           CASE WHEN {_D['n_en_stop']} > {_D['n_es_stop']} THEN 'en'
                WHEN {_D['n_es_stop']} > {_D['n_en_stop']} THEN 'es'
                ELSE 'und' END AS lang_pred,
           CAST({_D['n_en_stop']} AS DOUBLE) / {_D['n_tokens']} AS en_score,
           CAST({_D['n_es_stop']} AS DOUBLE) / {_D['n_tokens']} AS es_score
    FROM documents
    """,
    doc="Stopword-hit language heuristic (the reference corpus is synthetic "
        "word soup, so the value is determinism of the scoring pipeline).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        F.expr(
            f"CASE WHEN {_S['n_en_stop']} > {_S['n_es_stop']} THEN 'en' "
            f"WHEN {_S['n_es_stop']} > {_S['n_en_stop']} THEN 'es' "
            f"ELSE 'und' END"
        ).alias("lang_pred"),
        F.expr(f"CAST({_S['n_en_stop']} AS DOUBLE) / {_S['n_tokens']}").alias("en_score"),
        F.expr(f"CAST({_S['n_es_stop']} AS DOUBLE) / {_S['n_tokens']}").alias("es_score"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(lower(text)) AS content_fp,
           list_aggregate(list_transform({SHINGLES_DUCK}, s -> md5(s)), 'min')
               AS min_shingle_fp,
           {md5_int60_duck('lower(text)')} AS fp_int
    FROM documents
    """,
    doc="Content fingerprint (md5 of normalized text), min-shingle rolling "
        "fingerprint, and a 60-bit integer fingerprint for numeric joins.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.expr("md5(lower(text))").alias("content_fp"),
        F.expr(f"array_min(transform({SHINGLES_SPARK}, s -> md5(s)))").alias("min_shingle_fp"),
        F.expr(md5_int60_spark("lower(text)")).alias("fp_int"),
    )


# ---------------------------------------------------------------------------
# corpus vocabulary statistics
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 50


@register(
    "text_vocab_topk",
    oracle=f"""
    SELECT token, n_occurrences, n_docs FROM (
      SELECT token,
             COUNT(*) AS n_occurrences,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
      )
      GROUP BY token
      ORDER BY n_occurrences DESC, token
      LIMIT {VOCAB_TOP_K}
    )
    """,
    doc="Corpus vocabulary: top-k tokens by frequency with document "
        "frequency (deterministic tie-break on token). Map-side partial "
        "aggregation + TakeOrdered — no global sort materialized.",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(VOCAB_TOP_K)
    )


# ---------------------------------------------------------------------------
# deterministic train/eval split (hash-bucketed sampling)
# ---------------------------------------------------------------------------

TRAIN_PCT = 90


@register(
    "sample_split_documents",
    oracle=f"""
    SELECT doc_id,
           CAST({md5_int32_duck("concat('split:', doc_id)")} % 100 AS BIGINT)
               AS bucket,
           CASE WHEN {md5_int32_duck("concat('split:', doc_id)")} % 100
                     < {TRAIN_PCT}
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
    """,
    doc="Deterministic hash-bucketed train/eval split: the assignment is a "
        "pure function of doc_id (salted md5 mod 100), so it is stable "
        "under repartitioning, re-runs, and data growth — the property a "
        "training pipeline needs from a split, which rand()-based sampling "
        "does not give. Zero shuffle: a per-row projection.",
)
def sample_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    salted = md5_int32_spark("concat('split:', doc_id)")
    bucket = f"{salted} % 100"
    return docs.select(
        "doc_id",
        F.expr(f"CAST({bucket} AS BIGINT)").alias("bucket"),
        F.expr(
            f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' ELSE 'eval' END"
        ).alias("split"),
    )


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

# Java regex (Spark) and RE2 (DuckDB) both accept these patterns; Spark SQL
# string literals need backslash doubling, DuckDB treats backslash literally.
_EMAIL_SPARK = r"[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_EMAIL_DUCK = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_SPARK = r"\\b\\d{3}-\\d{3}-\\d{4}\\b"
_PHONE_DUCK = r"\b\d{3}-\d{3}-\d{4}\b"


@register(
    "text_pii_redact",
    # the corpus is PII-free word soup, so both engines inject the same
    # deterministic synthetic PII (email + phone derived from doc_id) and
    # must then find and redact ALL of it — the md5 of the redacted text
    # proves byte-identical scrubbing, not just equal match counts
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             'contact user' || doc_id || '@example.com or call ' ||
             lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_DUCK}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_DUCK}')) AS INT)
               AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '{_EMAIL_DUCK}', '<EMAIL>', 'g'),
                 '{_PHONE_DUCK}', '<PHONE>', 'g'))
               AS redacted_md5
    FROM seeded
    """,
    doc="PII scrub: email/phone regex detection counts + redaction to "
        "placeholder tokens. Pure codegen'd per-row projection, zero "
        "shuffle; the oracle verifies the redacted bytes via md5.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    seeded = docs.select(
        "doc_id",
        F.expr(
            "concat('contact user', doc_id, '@example.com or call ', "
            "lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-555-', "
            "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' ', text)"
        ).alias("text"),
    )
    return seeded.select(
        "doc_id",
        F.expr(
            f"CAST(size(regexp_extract_all(text, '{_EMAIL_SPARK}', 0)) AS INT)"
        ).alias("n_emails"),
        F.expr(
            f"CAST(size(regexp_extract_all(text, '{_PHONE_SPARK}', 0)) AS INT)"
        ).alias("n_phones"),
        F.expr(
            f"md5(regexp_replace(regexp_replace(text, '{_EMAIL_SPARK}', "
            f"'<EMAIL>'), '{_PHONE_SPARK}', '<PHONE>'))"
        ).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# benchmark-contamination check (n-gram overlap vs a held-out set)
# ---------------------------------------------------------------------------

#: pseudo eval-benchmark: every 97th document
_BENCH_PRED_SQL = "doc_id % 97 = 0"


@register(
    "text_contamination",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({SHINGLES_DUCK}) AS s
      FROM documents WHERE {_BENCH_PRED_SQL}
    ),
    corpus AS (
      SELECT doc_id, unnest({SHINGLES_DUCK}) AS s
      FROM documents WHERE NOT ({_BENCH_PRED_SQL})
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN s IN (SELECT s FROM bench)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN s IN (SELECT s FROM bench)
                         THEN 1 ELSE 0 END) AS BIGINT) > 0 AS contaminated
    FROM corpus
    GROUP BY doc_id
    """,
    doc="Decontamination pass: 3-token shingle overlap of every training "
        "document against the benchmark shingle set (docs where "
        "doc_id % 97 = 0). The benchmark set is exploded+distinct'd and "
        "broadcast — at 100 TB the corpus side stays a single scan with a "
        "map-side semi probe, no shuffle of corpus shingles.",
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    bench = (
        docs.filter(F.expr(_BENCH_PRED_SQL))
        .select(F.explode(F.expr(SHINGLES_SPARK)).alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = docs.filter(~F.expr(_BENCH_PRED_SQL)).select(
        "doc_id", F.explode(F.expr(SHINGLES_SPARK)).alias("s")
    )
    return (
        corpus.join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 5

#: BM25-style rational idf ((N - df + 0.5) / (df + 0.5)) instead of ln():
#: pure rational double arithmetic is bit-identical across engines, while
#: libm ln() implementations may differ in the last ulp
_IDF = "((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))"


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, token, tf, df,
             round(CAST(tf AS DOUBLE) * {_IDF}, 6) AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rk
      FROM scored
    ) t WHERE rk <= {TFIDF_TOP_K}
    """,
    doc="Per-document top-k characteristic terms by tf·idf (BM25-style "
        "rational idf — deterministic across engines, unlike ln()). "
        "Shuffles: (doc_id, token) for tf, token for df, doc_id for the "
        "top-k window; df result is broadcast back onto tf.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "token", "tf", "df",
            F.expr(f"round(CAST(tf AS DOUBLE) * {_IDF}, 6)").alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tf", "df", "score", "rk")
    )


# ---------------------------------------------------------------------------
# exact-size stratified sample (k docs per stratum, deterministic)
# ---------------------------------------------------------------------------

STRATUM_K = 20


@register(
    "sample_stratified_exact",
    oracle=f"""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(concat('strat:', doc_id)), doc_id)
                 AS rk
      FROM documents
    ) t WHERE rk <= {STRATUM_K}
    """,
    doc=f"Exactly {STRATUM_K} documents per language stratum, chosen by "
        "deterministic hash order (md5 of salted doc_id) — re-runs, "
        "repartitioning, and data appends keep previously-chosen ranks "
        "stable in expectation, unlike rand()-ordered sampling. "
        "Complements sample_split_documents (hash-threshold split, "
        "probabilistic sizes) with guaranteed per-stratum counts. "
        "One shuffle on the stratum key.",
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("lang").orderBy(
        F.expr("md5(concat('strat:', doc_id))"), F.asc("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_K)
        .select("lang", "doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# deterministic per-epoch shuffle/shard assignment (training data ordering)
# ---------------------------------------------------------------------------

EPOCH_COUNT = 3
EPOCH_SHARDS = 16


@register(
    "sample_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest(range({EPOCH_COUNT})) AS epoch),
    asg AS (
      SELECT epoch, doc_id,
             md5(concat('epoch:', epoch, ':', doc_id)) AS ord,
             ('0x' || substr(md5(concat('epoch:', epoch, ':', doc_id)), 1, 8))
               ::BIGINT % {EPOCH_SHARDS} AS shard
      FROM documents CROSS JOIN e
    )
    SELECT CAST(a.epoch AS INT) AS epoch,
           CAST(a.shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           arg_min(a.doc_id, a.ord) AS first_doc,
           round(AVG(CASE WHEN p.shard = a.shard THEN 1.0 ELSE 0.0 END), 6)
             AS stay_ratio
    FROM asg a LEFT JOIN asg p
      ON p.doc_id = a.doc_id AND p.epoch = a.epoch - 1
    GROUP BY a.epoch, a.shard
    ORDER BY epoch, shard
    """,
    doc=f"Deterministic per-epoch global shuffle for training-data "
        f"ordering: each epoch assigns every document a shard "
        f"(md5('epoch:'||e||':'||doc_id) % {EPOCH_SHARDS}) and a "
        "within-shard position (the full hash as sort key) — a seeded, "
        "reproducible permutation computable as a NARROW map (no global "
        "sort server, no shuffle to assign; at 100 TB the training "
        "loader reads shards independently and an epoch 'reshuffle' is "
        "a hash recompute, zero data movement — the Pile/GPT-style "
        "epoch-seeded ordering). Output audits the permutation per "
        "(epoch, shard): doc count (balance), the deterministic first "
        f"document (arg-min by hash), and stay_ratio — the fraction of "
        "the shard's docs that sat in the SAME shard the previous epoch "
        f"(≈1/{EPOCH_SHARDS} when epochs decorrelate; 1.0 would mean "
        "the seed is broken and every epoch replays the same order; "
        "epoch 0 reads 0 by convention). The decorrelation self-join "
        "co-partitions on doc_id; the rollup is "
        f"{EPOCH_COUNT}x{EPOCH_SHARDS} rows.",
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")
    asg = docs.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {EPOCH_COUNT - 1})")).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.expr("md5(concat('epoch:', epoch, ':', doc_id))").alias("ord"),
        F.expr(
            "CAST(conv(substr(md5(concat('epoch:', epoch, ':', doc_id)),"
            f" 1, 8), 16, 10) AS BIGINT) % {EPOCH_SHARDS}"
        ).alias("shard"),
    )
    prev = asg.select(
        F.col("doc_id").alias("p_doc_id"),
        (F.col("epoch") + 1).alias("p_epoch"),
        F.col("shard").alias("p_shard"),
    )
    joined = asg.join(
        prev,
        (F.col("doc_id") == F.col("p_doc_id"))
        & (F.col("epoch") == F.col("p_epoch")),
        "left",
    )
    return (
        joined.groupBy(
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("int").alias("shard"),
        )
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("min_by(doc_id, ord)").alias("first_doc"),
            F.expr(
                "round(AVG(CAST(CASE WHEN p_shard = shard THEN 1.0 "
                "ELSE 0.0 END AS DOUBLE)), 6)"
            ).alias("stay_ratio"),
        )
        .orderBy("epoch", "shard")
    )


# ---------------------------------------------------------------------------
# per-stratum exact length quantiles
# ---------------------------------------------------------------------------

@register(
    "text_length_quantiles",
    # both engines compute type-7 (linear interpolation) exact quantiles;
    # inputs are integers so the interpolation arithmetic is identical
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.75), 6) AS p75
    FROM documents
    GROUP BY lang
    """,
    doc="Exact per-language document-length quartiles (sort-based "
        "percentile, linear interpolation). One shuffle on lang; at scale "
        "swap to approx_percentile(t-digest) — kept exact here because the "
        "oracle gate hash-compares values.",
)
def text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("round(percentile(n_chars, 0.25), 6)").alias("p25"),
        F.expr("round(percentile(n_chars, 0.50), 6)").alias("p50"),
        F.expr("round(percentile(n_chars, 0.75), 6)").alias("p75"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_MAX = float(1 << 60)  # md5_int60 hash space


@register(
    "sketch_kmv_distinct_tokens",
    # KMV estimator: with the k smallest of the distinct 60-bit token
    # hashes, E[distinct] ≈ (k-1) * HASH_SPACE / kth_min. md5 hashing makes
    # the sketch — unlike HLL — bit-deterministic and engine-portable, so
    # the estimate itself is hash-gate checkable.
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT lang,
             {md5_int60_duck("unnest(string_split(lower(text), ' '))")} AS hv
      FROM documents
    ),
    ranked AS (
      SELECT lang, hv,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rk
      FROM h
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS sketch_size,
           MAX(hv) AS kth_min_hash,
           round(({KMV_K} - 1) * {_KMV_MAX} / MAX(hv), 6) AS est_distinct
    FROM ranked WHERE rk <= {KMV_K}
    GROUP BY lang
    """,
    doc=f"Per-language distinct-token estimate via a {KMV_K}-minimum-values "
        "sketch over md5 hashes. The scale shape of a mergeable sketch: "
        "each partition keeps its k smallest hashes (TakeOrdered, no full "
        "shuffle of tokens), merge = k smallest of the union. Deterministic "
        "md5 hashing → the estimate is exactly reproducible cross-engine, "
        "which HLL sketches cannot offer.",
)
def sketch_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    hashes = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .select("lang", F.expr(md5_int60_spark("token")).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("lang").orderBy("hv")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("sketch_size"),
            F.max("hv").alias("kth_min_hash"),
            F.expr(
                f"round(({KMV_K} - 1) * CAST({_KMV_MAX} AS DOUBLE) / MAX(hv), 6)"
            ).alias("est_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-style regex token counting
# ---------------------------------------------------------------------------

# GPT-2-ish pretokenizer classes, simplified to engine-portable RE2/Java
# syntax: word runs, digit runs, and single non-alnum-non-space marks
_BPE_WORD = "[a-z]+"
_BPE_NUM = "[0-9]+"
_BPE_PUNCT_SPARK = "[^a-z0-9\\\\s]"
_BPE_PUNCT_DUCK = r"[^a-z0-9\s]"


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_WORD}')) AS INT)
               AS n_word_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_NUM}')) AS INT)
               AS n_number_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_PUNCT_DUCK}')) AS INT)
               AS n_punct_tokens,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_WORD}')) +
                len(regexp_extract_all(lower(text), '{_BPE_NUM}')) +
                len(regexp_extract_all(lower(text), '{_BPE_PUNCT_DUCK}')) AS INT)
               AS n_tokens
    FROM documents
    """,
    doc="BPE-style pretokenizer counting (word runs / digit runs / "
        "punctuation marks — the GPT-2 pretokenizer classes, simplified to "
        "portable regex): the token-budget estimator a training pipeline "
        "runs before chunking. Pure codegen'd per-row scan, zero shuffle; "
        "complements whitespace-based text_token_stats.",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    w = f"size(regexp_extract_all(lower(text), '{_BPE_WORD}', 0))"
    n = f"size(regexp_extract_all(lower(text), '{_BPE_NUM}', 0))"
    p = f"size(regexp_extract_all(lower(text), '{_BPE_PUNCT_SPARK}', 0))"
    return docs.select(
        "doc_id",
        F.expr(f"CAST({w} AS INT)").alias("n_word_tokens"),
        F.expr(f"CAST({n} AS INT)").alias("n_number_tokens"),
        F.expr(f"CAST({p} AS INT)").alias("n_punct_tokens"),
        F.expr(f"CAST({w} + {n} + {p} AS INT)").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# count-min sketch (frequency estimation for heavy hitters)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_QUERY_K = 10


def _cms_bucket_spark(d: int) -> str:
    salted = f"concat('cms{d}:', token)"
    return f"{md5_int32_spark(salted)} % {CMS_WIDTH}"


def _cms_bucket_duck(d: int) -> str:
    salted = f"concat('cms{d}:', token)"
    return f"{md5_int32_duck(salted)} % {CMS_WIDTH}"


_CMS_ORACLE = f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    sketch AS (  -- depth x width counter table; GROUP BY = the merge step
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT token, d,
               CASE {' '.join(f"WHEN d = {d} THEN {_cms_bucket_duck(d)}" for d in range(CMS_DEPTH))}
               END AS bucket
        FROM toks CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) ds
      ) GROUP BY d, bucket
    ),
    heavy AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM toks GROUP BY token
      ORDER BY true_count DESC, token LIMIT {CMS_QUERY_K}
    )
    SELECT h.token, h.true_count, MIN(s.c) AS cms_estimate
    FROM heavy h
    CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) ds
    JOIN sketch s
      ON s.d = ds.d
     AND s.bucket = CASE {' '.join(f"WHEN ds.d = {d} THEN {_cms_bucket_duck(d).replace('token', 'h.token')}" for d in range(CMS_DEPTH))}
                    END
    GROUP BY h.token, h.true_count
"""


@register(
    "sketch_cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    doc=f"Count-min sketch ({CMS_DEPTH}×{CMS_WIDTH}, md5-derived rows): "
        "distributed build is one groupBy over (depth, bucket) — the "
        "classic mergeable-sketch shape where partition sketches sum "
        "cell-wise — then the top-k tokens are point-queried "
        "(estimate = min over rows, always ≥ true count). Deterministic "
        "hashing makes even the over-estimates engine-exact.",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    buckets = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(_cms_bucket_spark(d)).alias("bucket"),
                )
                for d in range(CMS_DEPTH)
            ])
        ).alias("db")
    ).select("db.d", "db.bucket")
    sketch = buckets.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    heavy = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("token"))
        .limit(CMS_QUERY_K)
    )
    probes = heavy.select(
        "token",
        "true_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(_cms_bucket_spark(d)).alias("bucket"),
                )
                for d in range(CMS_DEPTH)
            ])
        ).alias("db"),
    ).select("token", "true_count", "db.d", "db.bucket")
    return (
        F.broadcast(probes)
        .join(sketch, ["d", "bucket"])
        .groupBy("token", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# document chunking (fixed token windows with overlap)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 100
CHUNK_STRIDE = 80  # 20-token overlap between consecutive chunks


@register(
    "text_chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i AS INT) AS chunk_idx,
             list_slice(toks, i * {CHUNK_STRIDE} + 1,
                        i * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS chunk
      FROM t, unnest(range(0,
             greatest(1, CAST(ceil((len(toks) - {CHUNK_TOKENS})
                                   / {CHUNK_STRIDE}.0) AS BIGINT) + 1)))
             AS u(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM chunks WHERE len(chunk) > 0
    """,
    doc=f"Training-prep chunking: each document split into {CHUNK_TOKENS}-"
        f"token windows at stride {CHUNK_STRIDE} (overlap preserves "
        "cross-boundary context). Pure array slicing + explode — 1→N row "
        "expansion with zero shuffle, output partitioning follows input "
        "splits; chunk content verified by md5 over the rejoined tokens.",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    n_chunks = (
        f"greatest(1, CAST(ceil((size(toks) - {CHUNK_TOKENS}) "
        f"/ {CHUNK_STRIDE}.0) AS BIGINT) + 1)"
    )
    return (
        docs.select("doc_id", F.expr("split(text, ' ')").alias("toks"))
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.expr(
                f"slice(toks, i * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS})"
            ).alias("chunk"),
        )
        .filter(F.expr("size(chunk) > 0"))
        .select(
            "doc_id",
            "chunk_idx",
            F.expr("CAST(size(chunk) AS INT)").alias("n_tokens"),
            F.expr("md5(array_join(chunk, ' '))").alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# batch packing (token-budget batches over a deterministic order)
# ---------------------------------------------------------------------------

PACK_BUDGET = 2000  # tokens per training batch


@register(
    "sample_pack_batches",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(concat('pack:', doc_id)) AS shuffle_key
      FROM documents
    ),
    running AS (
      SELECT doc_id, n_tokens, shuffle_key,
             SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM sized
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT)
               AS batch_id
    FROM running
    """,
    doc=f"Training-batch packing: documents shuffled into a deterministic "
        f"hash order, then packed into ~{PACK_BUDGET}-token batches by "
        "running-sum bucketing (batch = floor(prefix_sum / budget) — the "
        "streaming-friendly approximation of first-fit). The global "
        "prefix sum is computed DISTRIBUTED in two phases: 256 hash-prefix "
        "buckets get per-bucket window cumsums in parallel, and each "
        "bucket's starting offset comes from a 256-row prefix sum over the "
        "bucket totals — no single-partition pass over the data (a naive "
        "unpartitioned ORDER BY window would move every row to one task).",
)
def sample_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    # bucket = first 2 hex chars of the shuffle key → bucket order is a
    # prefix of the global (shuffle_key, doc_id) order, so
    # global_cum = (sum of all earlier buckets) + local_cum
    sized = docs.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tokens"),
        F.expr("md5(concat('pack:', doc_id))").alias("shuffle_key"),
    ).withColumn("bucket", F.expr("substr(shuffle_key, 1, 2)"))
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    # 256 rows — the only sequential step, over bucket TOTALS not rows
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        sized.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "offset", F.coalesce(F.sum("bucket_total").over(w_off), F.lit(0))
        )
        .select("bucket", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                f"CAST(FLOOR((offset + local_cum - n_tokens) "
                f"/ {PACK_BUDGET}.0) AS BIGINT)"
            ).alias("batch_id"),
        )
    )


# ---------------------------------------------------------------------------
# bigram language-model table (conditional next-token probabilities)
# ---------------------------------------------------------------------------

LM_TOP_K = 3
LM_MIN_COUNT = 30


@register(
    "text_bigram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    bigrams AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(range(1, len(ts))) AS u(i)
    ),
    counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bigrams GROUP BY w1, w2
    ),
    totals AS (
      SELECT w1, CAST(SUM(c) AS BIGINT) AS total
      FROM counts GROUP BY w1
    )
    SELECT w1, w2, c,
           round(CAST(c AS DOUBLE) / total, 6) AS p_next, rk
    FROM (
      SELECT counts.w1, w2, c, total,
             ROW_NUMBER() OVER (PARTITION BY counts.w1
                                ORDER BY c DESC, w2) AS rk
      FROM counts JOIN totals ON totals.w1 = counts.w1
      WHERE total >= {LM_MIN_COUNT}
    ) t WHERE rk <= {LM_TOP_K}
    """,
    doc=f"Bigram LM table: P(next|word) for words with ≥{LM_MIN_COUNT} "
        f"continuations, top-{LM_TOP_K} per word. Bigrams come from one "
        "zip-with pass over the token array (no self-join); two "
        "aggregations on (w1,w2) and w1 plus a per-w1 window — the count "
        "tables an n-gram LM or next-token-statistics pipeline builds.",
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    bigrams = docs.select(
        F.explode(
            F.expr(
                "zip_with(slice(split(lower(text), ' '), 1, "
                "size(split(lower(text), ' ')) - 1), "
                "slice(split(lower(text), ' '), 2, "
                "size(split(lower(text), ' ')) - 1), "
                "(x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("w1").agg(F.sum("c").cast("bigint").alias("total"))
    w = Window.partitionBy("w1").orderBy(F.desc("c"), F.asc("w2"))
    return (
        counts.join(totals, "w1")
        .filter(F.col("total") >= LM_MIN_COUNT)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= LM_TOP_K)
        .select(
            "w1", "w2", "c",
            F.expr("round(CAST(c AS DOUBLE) / total, 6)").alias("p_next"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# repetition quality signals (Gopher/C4-style repetitiveness filters)
# ---------------------------------------------------------------------------

#: Gopher-style gates, adapted to the single-line corpus: a doc is
#: "repetitive" when one token dominates or its 3-gram shingles repeat
REP_TOP_TOKEN_FRAC = 0.2
REP_DUP_SHINGLE_RATIO = 0.3


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, t, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({TOKS_DUCK}) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    td AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(MAX(c) AS BIGINT) AS top_cnt
      FROM tc GROUP BY doc_id
    ),
    sd AS (
      SELECT doc_id,
             len({SHINGLES_DUCK}) AS n_sh,
             len(list_distinct({SHINGLES_DUCK})) AS n_ush
      FROM documents
    )
    SELECT td.doc_id, n_tokens,
           CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_frac,
           CAST(n_sh - n_ush AS DOUBLE) / greatest(n_sh, 1) AS dup_shingle_ratio,
           (CAST(top_cnt AS DOUBLE) / n_tokens > {REP_TOP_TOKEN_FRAC}
            OR CAST(n_sh - n_ush AS DOUBLE) / greatest(n_sh, 1)
               > {REP_DUP_SHINGLE_RATIO}) AS repetitive
    FROM td JOIN sd ON sd.doc_id = td.doc_id
    """,
    doc="Repetitiveness quality signals (the Gopher/C4 repetition-filter "
        "family, adapted to the single-line corpus): most-frequent-token "
        "fraction via explode+two-level aggregate (the scalable mode "
        "computation — per-row O(n²) lambda folds would not survive long "
        "documents), within-doc duplicate-shingle ratio via one array pass. "
        "One shuffle on (doc_id, token), join back on doc_id.",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok_counts = (
        docs.select("doc_id", F.explode(F.expr(TOKS_SPARK)).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = tok_counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.max("c").cast("bigint").alias("top_cnt"),
    )
    shingle_stats = docs.select(
        "doc_id",
        F.expr(f"size({SHINGLES_SPARK})").alias("n_sh"),
        F.expr(f"size(array_distinct({SHINGLES_SPARK}))").alias("n_ush"),
    )
    top_frac = "CAST(top_cnt AS DOUBLE) / n_tokens"
    dup_ratio = "CAST(n_sh - n_ush AS DOUBLE) / greatest(n_sh, 1)"
    return (
        per_doc.join(shingle_stats, "doc_id")
        .select(
            "doc_id", "n_tokens",
            F.expr(top_frac).alias("top_token_frac"),
            F.expr(dup_ratio).alias("dup_shingle_ratio"),
            F.expr(
                f"{top_frac} > {REP_TOP_TOKEN_FRAC} "
                f"OR {dup_ratio} > {REP_DUP_SHINGLE_RATIO}"
            ).alias("repetitive"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (deterministic md5 registers)
# ---------------------------------------------------------------------------

HLL_M = 256          # registers (first 2 md5 hex chars)
HLL_RHO_BITS = 52    # rank taken from the next 13 hex chars
#: alpha_256 * m^2 * 2^53 — the scaled-estimate numerator; the alpha
#: expression is evaluated identically by both engines' IEEE doubles
HLL_NUM = (
    f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
    f"+ CAST(1.079 AS DOUBLE) / {HLL_M})) * {HLL_M * HLL_M} "
    f"* CAST(9007199254740992 AS DOUBLE)"
)


def _hll_rho(lz_expr: str, digit_expr: str) -> str:
    """1-based position of the leftmost 1-bit in a 13-hex-char string,
    given its leading-'0'-run length and first non-zero digit (identical
    SQL in Spark and DuckDB — pure CASE arithmetic, no floats)."""
    return (
        f"CASE WHEN {lz_expr} = 13 THEN {HLL_RHO_BITS + 1} "
        f"ELSE 4 * {lz_expr} + 1 + "
        f"(CASE WHEN {digit_expr} = '1' THEN 3 "
        f"WHEN {digit_expr} IN ('2', '3') THEN 2 "
        f"WHEN {digit_expr} IN ('4', '5', '6', '7') THEN 1 ELSE 0 END) END"
    )


@register(
    "sketch_hll_distinct_shingles",
    # Registers are EXACT integers end-to-end: each register contributes
    # 2^(53-M) to a scaled harmonic sum (BIGINT, max 256*2^52 < 2^61 -- no
    # overflow, no float-addition-order sensitivity), absent registers
    # contribute 2^53; the single double division at the end is
    # deterministic because numerator and denominator are bit-identical in
    # both engines. That makes even HLL hash-gate checkable. Shingles (not
    # tokens) are sketched: the corpus vocabulary (~31 words/lang) sits in
    # HLL's small-range regime where the raw estimator needs a
    # linear-counting fallback whose ln() is libm-order-dependent; 3-gram
    # cardinality (3k-9k/lang) is squarely in the accurate regime, where
    # the raw estimate lands within the ~6.5% rel-error bound of m=256.
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT lang, md5(unnest({SHINGLES_DUCK_LOWER})) AS hx
      FROM documents
    ),
    regs AS (
      SELECT lang,
             ('0x' || substr(hx, 1, 2))::BIGINT AS idx,
             MAX({_hll_rho("length(regexp_extract(substr(hx, 3, 13), '^0*'))",
                           "substr(hx, 3 + length(regexp_extract(substr(hx, 3, 13), '^0*')), 1)")})
               AS m
      FROM h GROUP BY lang, idx
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS registers_hit,
           CAST(MAX(m) AS BIGINT) AS max_rho,
           round({HLL_NUM} /
                 (CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT)
                  + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 53)), 4)
             AS est_distinct
    FROM regs GROUP BY lang
    """,
    doc=f"Per-language HyperLogLog({HLL_M}) distinct-shingle estimate with "
        "md5-derived registers. Scale shape: shingles collapse to <=256 "
        "register rows per group on the map side (partial MAX), so the "
        "shuffle carries registers, not shingles -- the property that lets "
        "HLL count 100 TB of n-grams in one pass. Completes the mergeable "
        "sketch family next to KMV (order-statistics) and count-min (point "
        "frequency).",
)
def sketch_hll_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    h = (
        docs.select("lang", F.explode(F.expr(SHINGLES_SPARK_LOWER)).alias("s"))
        .select("lang", F.expr("md5(s)").alias("hx"))
        .distinct()
    )
    lz = "length(regexp_extract(substr(hx, 3, 13), '^0*', 0))"
    digit = f"substr(hx, 3 + {lz}, 1)"
    regs = (
        h.select(
            "lang",
            F.expr("CAST(conv(substr(hx, 1, 2), 16, 10) AS BIGINT)").alias("idx"),
            F.expr(_hll_rho(lz, digit)).alias("rho"),
        )
        .groupBy("lang", "idx")
        .agg(F.max("rho").alias("m"))
    )
    return regs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("registers_hit"),
        F.max("m").cast("bigint").alias("max_rho"),
        F.expr(
            f"round({HLL_NUM} / "
            f"(CAST(SUM(shiftleft(CAST(1 AS BIGINT), 53 - m)) AS BIGINT) "
            f"+ ({HLL_M} - COUNT(*)) * shiftleft(CAST(1 AS BIGINT), 53)), 4)"
        ).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# bigram-LM coverage scoring (LM-based quality signal, integer-exact)
# ---------------------------------------------------------------------------

LM_COV_MIN_COUNT = 3  # a bigram is "known" once the corpus saw it ≥3 times


@register(
    "text_lm_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    db AS (
      SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(range(1, len(ts))) AS u(i)
    ),
    known AS (
      SELECT w1, w2 FROM db GROUP BY w1, w2
      HAVING COUNT(*) >= {LM_COV_MIN_COUNT}
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM db GROUP BY doc_id
    ),
    hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_known
      FROM db JOIN known USING (w1, w2) GROUP BY doc_id
    )
    SELECT p.doc_id, n_bigrams,
           COALESCE(n_known, 0) AS n_known,
           CAST(COALESCE(n_known, 0) AS DOUBLE) / greatest(n_bigrams, 1)
             AS lm_coverage
    FROM per_doc p LEFT JOIN hits ON hits.doc_id = p.doc_id
    """,
    doc="LM-based fluency proxy: the fraction of a document's bigrams the "
        f"corpus bigram table has seen ≥{LM_COV_MIN_COUNT} times — the "
        "integer-exact stand-in for perplexity scoring (log-prob sums are "
        "libm-order-dependent and would break the cross-engine hash gate). "
        "Composition pipeline: one bigram explode reused for BOTH the "
        "model build and the scoring join; known-set join is map-side "
        "(broadcast) so scoring adds no extra shuffle of the corpus.",
)
def text_lm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    db = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(split(lower(text), ' '), 1, "
                "size(split(lower(text), ' ')) - 1), "
                "slice(split(lower(text), ' '), 2, "
                "size(split(lower(text), ' ')) - 1), "
                "(x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    known = (
        db.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= LM_COV_MIN_COUNT)
        .select("w1", "w2")
    )
    # score in ONE pass over the exploded bigrams: left-join the (small,
    # broadcast) known set and count hits conditionally — two corpus passes
    # total (model build + scoring) instead of three, and no final join
    scored = db.join(
        F.broadcast(known.withColumn("k", F.lit(1))), ["w1", "w2"], "left"
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.count("k").cast("bigint").alias("n_known"),
        )
        .select(
            "doc_id", "n_bigrams", "n_known",
            F.expr(
                "CAST(n_known AS DOUBLE) / greatest(n_bigrams, 1)"
            ).alias("lm_coverage"),
        )
    )


# ---------------------------------------------------------------------------
# bigram association lift (PMI without the log — exactly rational)
# ---------------------------------------------------------------------------

PMI_TOP_K = 200

#: adjacent lowercase token pairs as one string "w1 w2" (2-shingles); same
#: slice+zip_with shape as SHINGLES_SPARK — no per-index re-split
_T2 = "split(lower(text), ' ')"
_N2 = f"greatest(size({_T2}) - 1, 0)"
BIGRAMS_SPARK = (
    f"zip_with(slice({_T2}, 1, {_N2}), slice({_T2}, 2, {_N2}), "
    f"(x, y) -> concat(x, ' ', y))"
)
BIGRAMS_DUCK = (
    "list_transform(range(1, len(string_split(lower(text), ' '))), "
    "i -> string_split(lower(text), ' ')[i] || ' ' || "
    "string_split(lower(text), ' ')[i + 1])"
)

#: identical left-to-right IEEE evaluation order in both engines makes the
#: double bit-exact: lift = (n_xy/n_big) / ((n_x/n_uni) * (n_y/n_uni))
_LIFT = (
    "CAST(n_xy AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE)"
    " / CAST(n_x AS DOUBLE) / CAST(n_y AS DOUBLE) / CAST(n_big AS DOUBLE)"
)


@register(
    "text_pmi_bigrams",
    oracle=f"""
    WITH uni AS (
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_uni FROM uni),
    big AS (
      SELECT bigram, COUNT(*) AS n_xy
      FROM (SELECT unnest({BIGRAMS_DUCK}) AS bigram FROM documents)
      GROUP BY bigram
    ),
    btot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_big FROM big),
    top AS (
      SELECT bigram, n_xy FROM big
      ORDER BY n_xy DESC, bigram LIMIT {PMI_TOP_K}
    )
    SELECT t.bigram, t.n_xy, ux.n AS n_x, uy.n AS n_y,
           {_LIFT} AS lift
    FROM top t
    JOIN uni ux ON ux.token = string_split(t.bigram, ' ')[1]
    JOIN uni uy ON uy.token = string_split(t.bigram, ' ')[2]
    CROSS JOIN tot CROSS JOIN btot
    """,
    doc="Bigram association lift (PMI's exact-rational core, no log): "
        "p(xy)/(p(x)p(y)) for the top-k adjacent token pairs — the "
        "collocation-mining signal used to build tokenizer merge rules and "
        "phrase lists. Two shuffles (unigram, bigram counts); the top-k "
        "bigram set is broadcast into the unigram joins, and corpus totals "
        "ride along as broadcast scalars. The double is a fixed "
        "left-to-right multiply/divide chain, bit-identical across engines.",
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    uni = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = uni.agg(F.expr("CAST(SUM(n) AS BIGINT)").alias("n_uni"))
    big = (
        docs.select(F.explode(F.expr(BIGRAMS_SPARK)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    btot = big.agg(F.expr("CAST(SUM(n_xy) AS BIGINT)").alias("n_big"))
    top = big.orderBy(F.desc("n_xy"), F.asc("bigram")).limit(PMI_TOP_K)
    # 200-row top side broadcast into both unigram probes; scalar totals
    # broadcast via 1-row cross joins — no shuffle after the two counts
    ux = uni.select(F.col("token").alias("tx"), F.col("n").alias("n_x"))
    uy = uni.select(F.col("token").alias("ty"), F.col("n").alias("n_y"))
    return (
        F.broadcast(top)
        .withColumn("tx", F.expr("split(bigram, ' ')[0]"))
        .withColumn("ty", F.expr("split(bigram, ' ')[1]"))
        .join(ux, "tx")
        .join(uy, "ty")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select("bigram", "n_xy", "n_x", "n_y", F.expr(_LIFT).alias("lift"))
    )


# ---------------------------------------------------------------------------
# inverted index (capped posting lists)
# ---------------------------------------------------------------------------

INDEX_TOP_TOKENS = 100
POSTINGS_CAP = 50


@register(
    "text_inverted_index",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT token, doc_id
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
    )
    SELECT token, doc_freq,
           array_to_string(postings_arr, ',') AS postings
    FROM (
      SELECT token,
             COUNT(*) AS doc_freq,
             list_slice(list_sort(list(doc_id)), 1, {POSTINGS_CAP})
               AS postings_arr
      FROM pairs GROUP BY token
      ORDER BY doc_freq DESC, token LIMIT {INDEX_TOP_TOKENS}
    )
    """,
    doc="Inverted index build: token -> document frequency + posting list "
        "of the first {cap} doc_ids. ONE shuffle total: the per-doc "
        "distinct, the doc-freq count, the row_number cap, and the final "
        "collect_list all run on the same (token) hash partitioning — the "
        "(token, doc_id) distinct is a lag-based filter inside the sorted "
        "window pass instead of a dropDuplicates (which would add its own "
        "(token, doc_id) exchange). The cap bounds the array a hot token "
        "('the') materializes in any one task. Output restricted to the "
        "top tokens by document frequency for a stable small result. The "
        "posting list is emitted as a comma-joined STRING scalar (not "
        "ARRAY<STRING>): the driver's oracle gate canonicalizes via pandas "
        "sort/hash over raw columns, which cannot hash list cells.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    pairs = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("token").orderBy("doc_id")
    capped = (
        # distinct (token, doc_id) via lag on the token-partitioned,
        # doc_id-sorted stream — same partitioning the later windows and
        # groupBy need, so Catalyst plans a single exchange
        pairs.withColumn("prev_doc", F.lag("doc_id").over(w))
        .filter(F.col("prev_doc").isNull() | (F.col("doc_id") != F.col("prev_doc")))
        .withColumn("doc_freq", F.count(F.lit(1)).over(
            Window.partitionBy("token")
        ))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= POSTINGS_CAP)
    )
    return (
        capped.groupBy("token")
        .agg(
            F.first("doc_freq").alias("doc_freq"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings"),
        )
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(INDEX_TOP_TOKENS)
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch (mergeable, deterministic)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1020      # 17 words x 60 usable bits (bit 59 max keeps the
BLOOM_WORD = 60        # shifted value positive in a signed BIGINT)
BLOOM_K = 3
BLOOM_PROBES = 1000


def _bloom_pos_spark(key_expr: str, i: int) -> str:
    salted = f"concat('bloom{i}:', {key_expr})"
    return f"({md5_int60_spark(salted)} % {BLOOM_BITS})"


def _bloom_pos_duck(key_expr: str, i: int) -> str:
    salted = f"concat('bloom{i}:', {key_expr})"
    return f"({md5_int60_duck(salted)} % {BLOOM_BITS})"


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH pos AS (
      SELECT unnest([{", ".join(_bloom_pos_duck("text", i) for i in range(BLOOM_K))}]) AS p
      FROM documents
    ),
    words AS (
      SELECT p // {BLOOM_WORD} AS w,
             bit_or(1::BIGINT << CAST(p % {BLOOM_WORD} AS INTEGER)) AS bits
      FROM pos GROUP BY w
    ),
    filt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(bit_count(bits)) AS BIGINT) AS n_set_bits
      FROM words
    ),
    probe_pos AS (
      SELECT k, unnest([{", ".join(_bloom_pos_duck("concat('probe:', k)", i) for i in range(BLOOM_K))}]) AS p
      FROM (SELECT unnest(range({BLOOM_PROBES})) AS k)
    ),
    probe_hits AS (
      SELECT pp.k,
             SUM(CASE WHEN ((w.bits >> CAST(pp.p % {BLOOM_WORD} AS INTEGER)) & 1) = 1
                      THEN 1 ELSE 0 END) AS nh
      FROM probe_pos pp LEFT JOIN words w ON w.w = pp.p // {BLOOM_WORD}
      GROUP BY pp.k
    ),
    fp AS (
      SELECT CAST(COUNT(*) FILTER (nh = {BLOOM_K}) AS BIGINT) AS n_false_pos
      FROM probe_hits
    )
    SELECT CAST({BLOOM_BITS} AS BIGINT) AS m_bits,
           CAST({BLOOM_K} AS BIGINT) AS k_hashes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_inserted,
           filt.n_words, filt.n_set_bits,
           CAST({BLOOM_PROBES} AS BIGINT) AS n_probes,
           fp.n_false_pos
    FROM filt CROSS JOIN fp
    """,
    doc="Mergeable Bloom-filter sketch: insert every document (3 "
        "md5-derived positions in a 1020-bit filter stored as 17 60-bit "
        "words), then probe 1000 non-inserted keys and count false "
        "positives — the approximate-membership primitive for cheap "
        "cross-corpus contamination screens. The build is one map-side "
        "bit_or aggregation to 17 rows (mergeable across partitions, "
        "shards, and days by construction); probes broadcast-join the "
        "17-word filter. Everything is integer md5 arithmetic -> exact "
        "oracle.",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    pos = docs.select(
        F.explode(
            F.array(*[
                F.expr(_bloom_pos_spark("text", i)) for i in range(BLOOM_K)
            ])
        ).alias("p")
    )
    words = (
        pos.select(
            F.expr(f"p DIV {BLOOM_WORD}").alias("w"),
            F.expr(f"shiftleft(1L, CAST(p % {BLOOM_WORD} AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    filt = words.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_words"),
        F.expr("CAST(SUM(bit_count(bits)) AS BIGINT)").alias("n_set_bits"),
    )
    n_docs = docs.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_inserted"))
    probe_pos = (
        spark.range(BLOOM_PROBES)
        .select(F.col("id").alias("k"))
        .select(
            "k",
            F.explode(
                F.array(*[
                    F.expr(_bloom_pos_spark("concat('probe:', k)", i))
                    for i in range(BLOOM_K)
                ])
            ).alias("p"),
        )
    )
    probe_hits = (
        probe_pos.join(
            F.broadcast(words),
            F.col("w") == F.expr(f"p DIV {BLOOM_WORD}"),
            "left",
        )
        .select(
            "k",
            F.expr(
                f"CASE WHEN ((bits >> CAST(p % {BLOOM_WORD} AS INT)) & 1) = 1 "
                "THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
        .groupBy("k")
        .agg(F.sum("hit").alias("nh"))
    )
    fp = probe_hits.agg(
        F.expr(
            f"CAST(COUNT(*) FILTER (WHERE nh = {BLOOM_K}) AS BIGINT)"
        ).alias("n_false_pos")
    )
    return (
        filt.crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(fp))
        .select(
            F.expr(f"CAST({BLOOM_BITS} AS BIGINT)").alias("m_bits"),
            F.expr(f"CAST({BLOOM_K} AS BIGINT)").alias("k_hashes"),
            "n_inserted",
            "n_words",
            "n_set_bits",
            F.expr(f"CAST({BLOOM_PROBES} AS BIGINT)").alias("n_probes"),
            "n_false_pos",
        )
    )


# ---------------------------------------------------------------------------
# source-mix rebalancing (deterministic downsampling to parity)
# ---------------------------------------------------------------------------

MIX_SCALE = 1_000_000


@register(
    "sample_source_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS parity FROM counts
    ),
    thr AS (
      SELECT source,
             CAST(floor(least(1.0,
                 (SELECT parity FROM tot) / CAST(cnt AS DOUBLE))
                 * {MIX_SCALE}) AS BIGINT) AS keep_thr
      FROM counts
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE {md5_int32_duck("concat('mix:', d.doc_id)")} % {MIX_SCALE}
          < thr.keep_thr
    """,
    doc="Deterministic source-mix rebalancing: over-represented sources "
        "are downsampled toward parity (rate = parity/count, capped at 1) "
        "with a salted-hash keep decision — the data-mixing step every "
        "pretraining corpus build runs. The decision is a pure function "
        "of doc_id, so the sample is stable across re-runs, partitioning, "
        "and incremental appends; per-source rates are a broadcast of the "
        "tiny counts aggregate, the filter itself is a zero-shuffle map.",
)
def sample_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    parity = counts.agg(
        F.expr("CAST(SUM(cnt) AS DOUBLE) / COUNT(*)").alias("parity")
    )
    thr = counts.crossJoin(F.broadcast(parity)).select(
        "source",
        F.expr(
            f"CAST(floor(least(1.0, parity / CAST(cnt AS DOUBLE)) "
            f"* {MIX_SCALE}) AS BIGINT)"
        ).alias("keep_thr"),
    )
    keep = md5_int32_spark("concat('mix:', doc_id)")
    return (
        docs.join(F.broadcast(thr), "source")
        .filter(F.expr(f"{keep} % {MIX_SCALE}") < F.col("keep_thr"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# fused wide feature extraction (one scan replaces four)
# ---------------------------------------------------------------------------

@register(
    "text_features_wide",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars,
           {_D['n_tokens']} AS n_tokens,
           {_D['n_uniq_tokens']} AS n_uniq_tokens,
           CAST({_D['n_uniq_tokens']} AS DOUBLE) / {_D['n_tokens']}
             AS uniq_ratio,
           CAST({_D['sum_token_len']} AS DOUBLE) / {_D['n_tokens']}
             AS avg_token_len,
           list_max(list_transform({TOKS_DUCK}, t -> length(t)))
             AS max_token_len,
           CAST({_D['n_en_stop']} AS DOUBLE) / {_D['n_tokens']}
             AS en_stop_ratio,
           CAST({_D['n_es_stop']} AS DOUBLE) / {_D['n_tokens']}
             AS es_stop_ratio,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(n_chars, 1) AS digit_ratio,
           CAST({_D['n_tokens']} BETWEEN 20 AND 2000
            AND CAST({_D['n_uniq_tokens']} AS DOUBLE) / {_D['n_tokens']} >= 0.15
            AND CAST({_D['sum_token_len']} AS DOUBLE) / {_D['n_tokens']}
                BETWEEN 2.0 AND 12.0 AS BOOLEAN) AS quality_pass
    FROM documents
    """,
    doc="Fused feature matrix: every per-document text signal (token "
        "stats, lexical diversity, stopword scores, digit ratio, quality "
        "gate) in ONE whole-stage-codegen scan — the operator-fusion "
        "shape that replaces running the individual feature queries as "
        "separate corpus passes. Zero shuffle; at 100 TB the cost is one "
        "parquet read, and Catalyst CSEs the shared split(text) "
        "subexpression across all the derived columns.",
)
def text_features_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.expr(_S["n_tokens"]).alias("n_tokens"),
        F.expr(_S["n_uniq_tokens"]).alias("n_uniq_tokens"),
        F.expr(
            f"CAST({_S['n_uniq_tokens']} AS DOUBLE) / {_S['n_tokens']}"
        ).alias("uniq_ratio"),
        F.expr(
            f"CAST({_S['sum_token_len']} AS DOUBLE) / {_S['n_tokens']}"
        ).alias("avg_token_len"),
        F.expr(
            f"array_max(transform({TOKS_SPARK}, t -> length(t)))"
        ).alias("max_token_len"),
        F.expr(
            f"CAST({_S['n_en_stop']} AS DOUBLE) / {_S['n_tokens']}"
        ).alias("en_stop_ratio"),
        F.expr(
            f"CAST({_S['n_es_stop']} AS DOUBLE) / {_S['n_tokens']}"
        ).alias("es_stop_ratio"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^0-9]', '')) AS DOUBLE)"
            " / greatest(n_chars, 1)"
        ).alias("digit_ratio"),
        F.expr(
            f"CAST({_S['n_tokens']} BETWEEN 20 AND 2000"
            f" AND CAST({_S['n_uniq_tokens']} AS DOUBLE) / {_S['n_tokens']} >= 0.15"
            f" AND CAST({_S['sum_token_len']} AS DOUBLE) / {_S['n_tokens']}"
            f" BETWEEN 2.0 AND 12.0 AS BOOLEAN)"
        ).alias("quality_pass"),
    )


# ---------------------------------------------------------------------------
# n-gram novelty (memorization/boilerplate signal)
# ---------------------------------------------------------------------------

@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, unnest({SHINGLES_DUCK}) AS s FROM documents
      )
    ),
    df AS (
      SELECT s, COUNT(*) AS docs_with FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (df.docs_with = 1) AS BIGINT) AS n_unique,
           CAST(COUNT(*) FILTER (df.docs_with = 1) AS DOUBLE) / COUNT(*)
             AS novelty
    FROM sh JOIN df USING (s)
    GROUP BY sh.doc_id
    """,
    doc="Per-document n-gram novelty: the fraction of a doc's distinct "
        "3-token shingles that appear in NO other document — high novelty "
        "marks original prose, low novelty marks boilerplate/templated "
        "text and near-copies that slipped past pair-level dedup. Two "
        "shuffles (shingle document-frequency, then per-doc fold); the "
        "shingle-df join and the df aggregation share the shingle "
        "partitioning. The memorization-risk signal used to downweight "
        "repeated content before training.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({SHINGLES_SPARK})")).alias("s"),
    )
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("docs_with"))
    return (
        sh.join(df_counts, "s")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_shingles"),
            F.expr(
                "CAST(COUNT(*) FILTER (WHERE docs_with = 1) AS BIGINT)"
            ).alias("n_unique"),
            F.expr(
                "CAST(COUNT(*) FILTER (WHERE docs_with = 1) AS DOUBLE)"
                " / COUNT(*)"
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# temperature-based language mixing (alpha = 0.5 -> sqrt scaling)
# ---------------------------------------------------------------------------

TEMP_TARGET = 300  # target corpus size after mixing


@register(
    "sample_temperature_mix",
    # alpha = 0.5 temperature scaling implemented as sqrt(), which IEEE 754
    # requires to be correctly rounded — pow(x, 0.5) would depend on each
    # engine's libm. The rate expression is one fixed left-to-right chain.
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM documents GROUP BY lang
    ),
    z AS (SELECT SUM(sqrt(cnt)) AS denom FROM counts),
    thr AS (
      SELECT lang,
             CAST(floor(least(1.0,
                 {TEMP_TARGET} * sqrt(cnt)
                 / (SELECT denom FROM z) / cnt) * {MIX_SCALE}) AS BIGINT)
               AS keep_thr
      FROM counts
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr USING (lang)
    WHERE {md5_int32_duck("concat('temp:', d.doc_id)")} % {MIX_SCALE}
          < thr.keep_thr
    """,
    doc="Temperature-scaled language mixing (alpha = 0.5): per-language "
        "sampling rates proportional to count^alpha / count, the "
        "mC4/XLM-R rule that upweights low-resource languages without "
        "flattening the mix entirely. Same deterministic salted-hash keep "
        "decision as sample_source_mix (stable under re-runs and "
        "appends); sqrt instead of pow because IEEE mandates correctly "
        "rounded sqrt, making the rates bit-identical across engines. "
        "Rates are a broadcast of the tiny language census; the keep "
        "filter is a zero-shuffle map.",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    counts = docs.groupBy("lang").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("cnt")
    )
    z = counts.agg(F.expr("SUM(sqrt(cnt))").alias("denom"))
    thr = counts.crossJoin(F.broadcast(z)).select(
        "lang",
        F.expr(
            f"CAST(floor(least(1.0, {TEMP_TARGET} * sqrt(cnt) / denom / cnt)"
            f" * {MIX_SCALE}) AS BIGINT)"
        ).alias("keep_thr"),
    )
    keep = md5_int32_spark("concat('temp:', doc_id)")
    return (
        docs.join(F.broadcast(thr), "lang")
        .filter(F.expr(f"{keep} % {MIX_SCALE}") < F.col("keep_thr"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# tokenizer fertility by language (tokenizer-eval metric)
# ---------------------------------------------------------------------------

@register(
    "text_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_BPE_WORD}')) +
                    len(regexp_extract_all(lower(text), '{_BPE_NUM}')) +
                    len(regexp_extract_all(lower(text), '{_BPE_PUNCT_DUCK}'))
               ) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS DOUBLE) /
           SUM(len(regexp_extract_all(lower(text), '{_BPE_WORD}')) +
               len(regexp_extract_all(lower(text), '{_BPE_NUM}')) +
               len(regexp_extract_all(lower(text), '{_BPE_PUNCT_DUCK}')))
             AS chars_per_token
    FROM documents GROUP BY lang
    """,
    doc="Tokenizer fertility by language: chars-per-token under the "
        "BPE-style pretokenizer, aggregated per lang — the metric that "
        "exposes when a tokenizer over-fragments some languages (and "
        "hence skews effective per-language compute and context length). "
        "Exact integer sums, one tiny shuffle on lang; the ratio is a "
        "single fixed IEEE division.",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    w = f"size(regexp_extract_all(lower(text), '{_BPE_WORD}', 0))"
    n = f"size(regexp_extract_all(lower(text), '{_BPE_NUM}', 0))"
    p = f"size(regexp_extract_all(lower(text), '{_BPE_PUNCT_SPARK}', 0))"
    return docs.groupBy("lang").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("total_chars"),
        F.expr(f"CAST(SUM({w} + {n} + {p}) AS BIGINT)").alias("total_tokens"),
        F.expr(
            f"CAST(SUM(n_chars) AS DOUBLE) / SUM({w} + {n} + {p})"
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# character trigram profiles per language (lang-id model table)
# ---------------------------------------------------------------------------

CHAR_NGRAM_TOP = 20

# the >= 3 guard matters: Spark's sequence(1, 0) yields the DESCENDING
# [1, 0] (not an empty range like DuckDB's range(1, 1)), so an unguarded
# short document would emit two spurious "trigrams" and diverge from the
# oracle
_TRIGRAMS_SPARK = (
    "CASE WHEN length(lower(text)) >= 3 THEN "
    "transform(sequence(1, length(lower(text)) - 2), "
    "i -> substr(lower(text), i, 3)) "
    "ELSE array() END"
)
_TRIGRAMS_DUCK = (
    "list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1), "
    "i -> substr(lower(text), i, 3))"
)


@register(
    "text_char_trigram_profile",
    oracle=f"""
    SELECT lang, trigram, n, rk FROM (
      SELECT lang, trigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, trigram) AS rk
      FROM (
        SELECT lang, trigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
          SELECT lang, unnest({_TRIGRAMS_DUCK}) AS trigram FROM documents
        )
        GROUP BY lang, trigram
      )
    ) t WHERE rk <= {CHAR_NGRAM_TOP}
    """,
    doc="Per-language character-trigram profile (top-k by frequency): the "
        "model table a char-n-gram language identifier trains — the "
        "char-level modality complement to the token-level stopword "
        "heuristic (text_lang_id). One shuffle on (lang, trigram) with "
        "map-side partials; the per-lang rank runs over the reduced "
        "counts and reuses nothing from the fact scan. A sliding "
        "substr-transform keeps trigram extraction inside codegen — no "
        "Python, no explode-of-explode.",
)
def text_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    tri = docs.select(
        "lang", F.explode(F.expr(_TRIGRAMS_SPARK)).alias("trigram")
    )
    counts = tri.groupBy("lang", "trigram").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("trigram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CHAR_NGRAM_TOP)
        .select("lang", "trigram", "n", "rk")
    )


# ---------------------------------------------------------------------------
# skip-gram co-occurrence pairs (word2vec-style training table)
# ---------------------------------------------------------------------------

SKIPGRAM_WINDOW = 2  # offsets 1..2 on each side
SKIPGRAM_TOP = 200

#: (center, context) pairs for positive offsets 1..W, built from aligned
#: slices — symmetric pairs come from emitting both orientations of each
#: forward pair, so the corpus is scanned once
def _skipgram_fwd_spark(off: int) -> str:
    t = "split(lower(text), ' ')"
    n = f"greatest(size({t}) - {off}, 0)"
    return (
        f"zip_with(slice({t}, 1, {n}), slice({t}, {off + 1}, {n}), "
        f"(x, y) -> struct(x AS w, y AS c))"
    )


def _skipgram_fwd_duck(off: int) -> str:
    t = "string_split(lower(text), ' ')"
    return (
        f"list_transform(range(1, greatest(len({t}) - {off}, 0) + 1), "
        f"i -> struct_pack(w := {t}[i], c := {t}[i + {off}]))"
    )


@register(
    "text_skipgram_pairs",
    oracle=f"""
    WITH fwd AS (
      SELECT unnest(
        {" || ".join(_skipgram_fwd_duck(o) for o in range(1, SKIPGRAM_WINDOW + 1))}
      ) AS p
      FROM documents
    ),
    sym AS (
      SELECT p.w AS center, p.c AS context FROM fwd
      UNION ALL
      SELECT p.c, p.w FROM fwd
    )
    SELECT center, context, n FROM (
      SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
      FROM sym GROUP BY center, context
      ORDER BY n DESC, center, context
      LIMIT {SKIPGRAM_TOP}
    )
    """,
    doc=f"Skip-gram co-occurrence table (window ±{SKIPGRAM_WINDOW}): the "
        "(center, context) count matrix word2vec/GloVe-style embedding "
        "training consumes. Forward offsets are built once from aligned "
        "array slices (codegen, no per-index re-split) and mirrored for "
        "symmetry, so one corpus scan feeds one (center, context) "
        "shuffle with map-side partials; top-k kept for a stable result.",
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    fwd_expr = "concat(" + ", ".join(
        _skipgram_fwd_spark(o) for o in range(1, SKIPGRAM_WINDOW + 1)
    ) + ")"
    fwd = docs.select(F.explode(F.expr(fwd_expr)).alias("p"))
    sym = fwd.select(
        F.col("p.w").alias("center"), F.col("p.c").alias("context")
    ).unionAll(
        fwd.select(F.col("p.c").alias("center"), F.col("p.w").alias("context"))
    )
    return (
        sym.groupBy("center", "context")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
        .orderBy(F.desc("n"), F.asc("center"), F.asc("context"))
        .limit(SKIPGRAM_TOP)
    )


# ---------------------------------------------------------------------------
# feature-hashing TF vectors (the hashing-trick vectorizer)
# ---------------------------------------------------------------------------

HASHED_TF_DIM = 64


@register(
    "text_hashed_tf",
    oracle=f"""
    SELECT doc_id,
           CAST({md5_int32_duck('t')} % {HASHED_TF_DIM} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    )
    GROUP BY doc_id, bucket
    """,
    doc=f"Feature-hashing TF vectors (the hashing trick): tokens map to a "
        f"FIXED {HASHED_TF_DIM}-bucket space via md5, so the vectorizer "
        "needs no vocabulary build, no broadcast dictionary, and no "
        "second corpus pass — the property that makes it the standard "
        "first featurizer for classifier-based quality filtering at "
        "corpus scale (collisions are the accepted trade). Sparse "
        "(doc_id, bucket, tf) triplet output; one shuffle on "
        "(doc_id, bucket) with map-side partials.",
)
def text_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id",
        F.explode(F.expr("split(lower(text), ' ')")).alias("t"),
    )
    return (
        tok.select(
            "doc_id",
            F.expr(f"CAST({md5_int32_spark('t')} % {HASHED_TF_DIM} AS INT)").alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("tf"))
    )


# ---------------------------------------------------------------------------
# character-entropy quality signal (compressibility proxy)
# ---------------------------------------------------------------------------

_ENT_CS_SPARK = "transform(sequence(1, length(lower(text)), 1), i -> substr(lower(text), i, 1))"
_ENT_CS_DUCK = (
    "list_transform(range(1, length(lower(text)) + 1), i -> substr(lower(text), i, 1))"
)

#: Shannon entropy (bits/char) of the character unigram distribution.
#: ln() agrees bit-for-bit across engines on this corpus and round(6)
#: absorbs any residual ulp/fold-order wiggle (verified 500/500 equal).
_ENTROPY_SPARK = (
    f"round(-aggregate(transform(array_distinct({_ENT_CS_SPARK}), c -> "
    f"(CAST(size(filter({_ENT_CS_SPARK}, x -> x = c)) AS DOUBLE) / length(lower(text))) * "
    f"ln(CAST(size(filter({_ENT_CS_SPARK}, x -> x = c)) AS DOUBLE) / length(lower(text)))), "
    f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) / ln(2.0), 6)"
)
_ENTROPY_DUCK = (
    f"round(-list_sum(list_transform(list_distinct({_ENT_CS_DUCK}), c -> "
    f"(CAST(len(list_filter({_ENT_CS_DUCK}, x -> x = c)) AS DOUBLE) / length(lower(text))) * "
    f"ln(CAST(len(list_filter({_ENT_CS_DUCK}, x -> x = c)) AS DOUBLE) / length(lower(text))))) "
    f"/ ln(2.0), 6)"
)


@register(
    "text_char_entropy",
    oracle=f"""
    SELECT doc_id,
           length(lower(text)) AS n_chars_ci,
           {_ENTROPY_DUCK} AS entropy_bits
    FROM documents
    """,
    doc="Character-entropy quality signal: Shannon entropy (bits/char) of "
        "each document's character distribution — the cheap compressibility "
        "proxy that flags repetitive boilerplate (low entropy) and "
        "binary-ish noise (high entropy) without running a compressor. "
        "Pure per-row codegen expression, zero shuffle, zero Python; the "
        "policy gate composes with text_quality_filter's length/punct "
        "signals.",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.expr("length(lower(text))").alias("n_chars_ci"),
        F.expr(_ENTROPY_SPARK).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# KMV/theta sketch INTERSECTION: cross-source vocabulary overlap estimates
# ---------------------------------------------------------------------------


@register(
    "sketch_kmv_source_overlap",
    # theta-sketch set algebra on the per-source KMV sketches: with
    # theta = least(kth_min_a, kth_min_b), the hashes below theta form a
    # uniform sample of each set, so |A∩B| ≈ common_below_theta *
    # HASH_SPACE / theta and the Jaccard estimate is the below-theta ratio.
    # All integer hashing + one fixed division — engine-exact.
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT source,
             {md5_int60_duck("unnest(string_split(lower(text), ' '))")} AS hv
      FROM documents
    ),
    ranked AS (
      SELECT source, hv,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rk
      FROM h
    ),
    sk AS (SELECT source, hv FROM ranked WHERE rk <= {KMV_K}),
    kth AS (SELECT source, MAX(hv) AS kth FROM sk GROUP BY source),
    prs AS (
      SELECT a.source AS a_src, b.source AS b_src,
             least(a.kth, b.kth) AS theta
      FROM kth a JOIN kth b ON a.source < b.source
    ),
    ca AS (
      SELECT p.a_src, p.b_src, COUNT(*) AS na
      FROM prs p JOIN sk ON sk.source = p.a_src AND sk.hv < p.theta
      GROUP BY p.a_src, p.b_src
    ),
    cb AS (
      SELECT p.a_src, p.b_src, COUNT(*) AS nb
      FROM prs p JOIN sk ON sk.source = p.b_src AND sk.hv < p.theta
      GROUP BY p.a_src, p.b_src
    ),
    cc AS (
      SELECT p.a_src, p.b_src, COUNT(*) AS nc
      FROM prs p
      JOIN sk sa ON sa.source = p.a_src AND sa.hv < p.theta
      JOIN sk sb ON sb.source = p.b_src AND sb.hv = sa.hv
      GROUP BY p.a_src, p.b_src
    )
    SELECT p.a_src, p.b_src,
           CAST(COALESCE(cc.nc, 0) AS BIGINT) AS n_common,
           round(COALESCE(cc.nc, 0) * {_KMV_MAX} / p.theta, 6)
             AS est_intersection,
           round(CAST(COALESCE(cc.nc, 0) AS DOUBLE)
                 / (ca.na + cb.nb - COALESCE(cc.nc, 0)), 6) AS est_jaccard
    FROM prs p
    JOIN ca ON ca.a_src = p.a_src AND ca.b_src = p.b_src
    JOIN cb ON cb.a_src = p.a_src AND cb.b_src = p.b_src
    LEFT JOIN cc ON cc.a_src = p.a_src AND cc.b_src = p.b_src
    """,
    doc="Cross-source vocabulary overlap via theta-sketch intersection of "
        f"the per-source {KMV_K}-minimum-values sketches: below "
        "theta = min(kth_a, kth_b) each sketch is a uniform hash sample, "
        "so shared-hash counts scale to |A∩B| and a Jaccard estimate — "
        "the set-algebra step KMV supports and HLL alone does not. At "
        "100 TB only the K-hash sketches meet (pairs of 64-row sets, "
        "broadcast-sized) — the full token sets never co-shuffle. Feeds "
        "source-mix planning (which crawls duplicate each other's "
        "vocabulary) and cross-source contamination triage.",
)
def sketch_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    hashes = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .select("source", F.expr(md5_int60_spark("token")).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("hv")
    sk = (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .select("source", "hv")
        .persist()
    )
    kth = sk.groupBy("source").agg(F.max("hv").alias("kth"))
    a, b = kth.alias("a"), kth.alias("b")
    prs = (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("a_src"),
            F.col("b.source").alias("b_src"),
            F.least(F.col("a.kth"), F.col("b.kth")).alias("theta"),
        )
    )
    prs = F.broadcast(prs)
    ca = (
        prs.join(sk, (sk["source"] == F.col("a_src")) & (sk["hv"] < F.col("theta")))
        .groupBy("a_src", "b_src")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    cb = (
        prs.join(sk, (sk["source"] == F.col("b_src")) & (sk["hv"] < F.col("theta")))
        .groupBy("a_src", "b_src")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    sa, sb = sk.alias("sa"), sk.alias("sb")
    cc = (
        prs.join(sa, (F.col("sa.source") == F.col("a_src"))
                 & (F.col("sa.hv") < F.col("theta")))
        .join(sb, (F.col("sb.source") == F.col("b_src"))
              & (F.col("sb.hv") == F.col("sa.hv")))
        .groupBy("a_src", "b_src")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    return (
        prs.join(F.broadcast(ca), ["a_src", "b_src"])
        .join(F.broadcast(cb), ["a_src", "b_src"])
        .join(F.broadcast(cc), ["a_src", "b_src"], "left")
        .select(
            "a_src",
            "b_src",
            F.expr("CAST(COALESCE(nc, 0) AS BIGINT)").alias("n_common"),
            F.expr(
                f"round(COALESCE(nc, 0) * {_KMV_MAX} / theta, 6)"
            ).alias("est_intersection"),
            F.expr(
                "round(CAST(COALESCE(nc, 0) AS DOUBLE) "
                "/ (na + nb - COALESCE(nc, 0)), 6)"
            ).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# bottom-k uniform sample -> distribution quantile estimates
# ---------------------------------------------------------------------------

BOTTOMK_K = 200
BOTTOMK_PCTS = (25, 50, 75, 90, 99)


@register(
    "sample_bottomk_quantiles",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, n_chars, md5(concat('bk:', doc_id)) AS h FROM documents
    ),
    samp AS (
      SELECT doc_id, n_chars FROM hashed ORDER BY h, doc_id LIMIT {BOTTOMK_K}
    ),
    ranked AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER () AS cnt
      FROM samp
    ),
    pcts AS (SELECT unnest([{", ".join(str(p) for p in BOTTOMK_PCTS)}]) AS pct)
    SELECT CAST(pct AS INT) AS pct,
           CAST(n_chars AS BIGINT) AS est_n_chars,
           CAST(cnt AS BIGINT) AS sample_k
    FROM pcts JOIN ranked ON ranked.r = (pct * ranked.cnt + 99) // 100
    """,
    doc=f"Distribution quantile estimates from a bottom-{BOTTOMK_K} "
        "hash-order sample — the mergeable uniform-sample sketch: the k "
        "lowest md5(doc_id) rows are a uniform random subset, any two "
        "nodes' bottom-k sets merge into the corpus bottom-k, and re-runs "
        "are reproducible because the 'randomness' is the hash. The "
        "estimator reads the ceil(p*k) order statistic of the sample "
        "(integer ceil-division, no float rank math). Scale: the sample "
        "is a distributed top-k selection (per-partition bottom-k, then "
        f"a {BOTTOMK_K}-row driver merge) — NO global sort of the corpus, "
        "unlike exact quantiles; error is O(1/sqrt(k)) in rank, "
        "independent of corpus size, so the same k serves 100 TB.",
)
def sample_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    hashed = docs.select(
        "doc_id", "n_chars", F.expr("md5(concat('bk:', doc_id))").alias("h")
    )
    samp = hashed.orderBy("h", "doc_id").limit(BOTTOMK_K)
    ranked = samp.select(
        "n_chars",
        F.row_number().over(Window.orderBy("n_chars", "doc_id")).alias("r"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("cnt"),
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in BOTTOMK_PCTS])).alias("pct")
    )
    return (
        ranked.join(
            F.broadcast(pcts),
            F.col("r") == F.expr("(pct * cnt + 99) DIV 100"),
        )
        .select(
            F.col("pct").cast("int").alias("pct"),
            F.col("n_chars").cast("bigint").alias("est_n_chars"),
            F.col("cnt").cast("bigint").alias("sample_k"),
        )
    )


# ---------------------------------------------------------------------------
# KMV sketch rollup: daily user sketches merged to weekly (re-aggregation)
# ---------------------------------------------------------------------------

@register(
    "sketch_kmv_user_rollup",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
             {md5_int60_duck("concat('u:', user_id)")} AS hv
      FROM events
    ),
    daily AS (
      SELECT day, hv FROM (
        SELECT day, hv,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv) AS rk
        FROM h
      ) t WHERE rk <= {KMV_K}
    ),
    wk AS (
      SELECT DISTINCT CAST(date_trunc('week', day) AS DATE) AS week, hv
      FROM daily
    ),
    wr AS (
      SELECT week, hv,
             ROW_NUMBER() OVER (PARTITION BY week ORDER BY hv) AS rk
      FROM wk
    ),
    sk AS (
      SELECT week, COUNT(*) AS sketch_size, MAX(hv) AS kth
      FROM wr WHERE rk <= {KMV_K} GROUP BY week
    ),
    exact AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1
    )
    SELECT sk.week,
           CAST(sk.sketch_size AS BIGINT) AS sketch_size,
           round(CASE WHEN sk.sketch_size < {KMV_K}
                      THEN CAST(sk.sketch_size AS DOUBLE)
                      ELSE ({KMV_K} - 1) * CAST({_KMV_MAX} AS DOUBLE) / sk.kth
                 END, 6) AS est_distinct_users,
           CAST(exact.n_exact AS BIGINT) AS exact_distinct_users
    FROM sk JOIN exact ON exact.week = sk.week
    """,
    doc=f"Sketch RE-AGGREGATION: daily {KMV_K}-minimum-values user "
        "sketches merged to weekly distinct-user estimates FROM THE "
        "SKETCH ROWS ALONE — no second pass over raw events. Correct "
        "because bottom-k is a lattice merge: any hash in the weekly "
        "bottom-k is necessarily in its own day's bottom-k, so "
        "bottom-k(union of daily sketches) = bottom-k(week). This is the "
        "pre-aggregated-rollup pattern (store tiny daily sketches, answer "
        "any date-range distinct query later) that exact COUNT(DISTINCT) "
        "fundamentally cannot do — its daily results do not compose. "
        "Sub-k weeks fall back to the exact sketch count (the sketch "
        "holds every value). The exact_distinct_users column is the "
        "accuracy monitor, same pattern as the ANN recall evals.",
)
def sketch_kmv_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")["events"]
    h = ev.select(
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
        F.expr(md5_int60_spark("concat('u:', user_id)")).alias("hv"),
    ).distinct()
    wd = Window.partitionBy("day").orderBy("hv")
    daily = (
        h.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") <= KMV_K)
        .select("day", "hv")
    )
    wk = daily.select(
        F.expr("CAST(date_trunc('week', day) AS DATE)").alias("week"), "hv"
    ).distinct()
    ww = Window.partitionBy("week").orderBy("hv")
    sk = (
        wk.withColumn("rk", F.row_number().over(ww))
        .filter(F.col("rk") <= KMV_K)
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("sketch_size"),
            F.max("hv").alias("kth"),
        )
    )
    exact = ev.groupBy(
        F.expr("CAST(date_trunc('week', ts) AS DATE)").alias("week")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    return sk.join(exact, "week").select(
        "week",
        F.col("sketch_size").cast("bigint").alias("sketch_size"),
        F.expr(
            f"round(CASE WHEN sketch_size < {KMV_K} "
            f"THEN CAST(sketch_size AS DOUBLE) "
            f"ELSE ({KMV_K} - 1) * CAST({_KMV_MAX} AS DOUBLE) / kth END, 6)"
        ).alias("est_distinct_users"),
        F.col("n_exact").cast("bigint").alias("exact_distinct_users"),
    )


# ---------------------------------------------------------------------------
# BPE trainer step: adjacent symbol-pair counts over the weighted vocabulary
# ---------------------------------------------------------------------------

BPE_MERGE_TOPK = 20


@register(
    "text_bpe_merge_pairs",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
    ),
    wf AS (
      SELECT word, COUNT(*) AS f FROM w GROUP BY word
    ),
    p AS (
      SELECT substr(word, i, 2) AS pair, SUM(f) AS cnt
      FROM wf, unnest(range(1, length(word))) AS u(i)
      GROUP BY pair
    )
    SELECT pair, CAST(cnt AS BIGINT) AS pair_count, CAST(rk AS INT) AS rk
    FROM (
      SELECT pair, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rk
      FROM p
    ) t WHERE rk <= {BPE_MERGE_TOPK}
    """,
    doc=f"The BPE tokenizer-training step: corpus-weighted counts of "
        "adjacent symbol pairs, whose argmax is the next merge rule. The "
        "scale-critical move is counting over the DISTINCT-WORD table "
        "weighted by word frequency, not over raw tokens — the vocabulary "
        "is orders of magnitude smaller than the corpus (every real BPE "
        "trainer's first optimization), so the quadratic-ish char-pair "
        "explode runs on |vocab| rows and the corpus is touched exactly "
        "once for the frequency count. Words shorter than 2 chars emit "
        f"nothing; top {BPE_MERGE_TOPK} pairs returned with a total "
        "order (count desc, pair).",
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    wf = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = (
        wf.filter(F.length("word") >= 2)  # sequence(1, 0) is DESCENDING in
        # Spark — guard short words out before the explode
        .select(
            "word", "f",
            F.explode(F.expr("sequence(1, length(word) - 1)")).alias("i"),
        )
        .select(F.expr("substr(word, i, 2)").alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BPE_MERGE_TOPK)
        .select(
            "pair",
            F.col("cnt").cast("bigint").alias("pair_count"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# multi-step BPE training (unrolled merge loop — the tokenizer trainer
# as an engine workload)
# ---------------------------------------------------------------------------

BPE_TRAIN_ROUNDS = 8


def _bpe_merge_round_duck(t: int) -> str:
    """One unrolled BPE training round over the positions table p{t-1}:
    count adjacent symbol pairs (corpus-frequency-weighted), pick the
    argmax as merge rule b{t}, then apply it GREEDY left-to-right
    non-overlapping — for x != y candidate positions can never be
    adjacent, and for x == y a run of m x's merges floor(m/2) pairs at
    even offsets, both covered by one gaps-and-islands pass (islands of
    consecutive candidate rows; merge at even island offsets)."""
    p = t - 1
    return f""",
    lead{t} AS (
      SELECT word, f, pos, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM p{p}
    ),
    b{t} AS (
      SELECT sym AS bx, nxt AS by, CAST(SUM(f) AS BIGINT) AS bcnt
      FROM lead{t} WHERE nxt IS NOT NULL
      GROUP BY sym, nxt
      ORDER BY bcnt DESC, bx, by LIMIT 1
    ),
    flag{t} AS (
      SELECT l.*,
             (l.nxt IS NOT NULL AND l.sym = b.bx AND l.nxt = b.by) AS c
      FROM lead{t} l CROSS JOIN b{t} b
    ),
    isl{t} AS (
      SELECT *,
             rn - ROW_NUMBER() OVER (PARTITION BY word, c ORDER BY pos)
               AS isl
      FROM flag{t}
    ),
    mrg{t} AS (
      SELECT *,
             c AND ((ROW_NUMBER() OVER
                      (PARTITION BY word, c, isl ORDER BY pos) - 1)
                    % 2 = 0) AS mrg
      FROM isl{t}
    ),
    p{t} AS (
      SELECT word, f, pos,
             CASE WHEN mrg THEN sym || nxt ELSE sym END AS sym
      FROM (
        SELECT *, COALESCE(LAG(mrg) OVER (PARTITION BY word ORDER BY pos),
                           FALSE) AS consumed
        FROM mrg{t}
      ) WHERE NOT consumed
    )"""


def _bpe_train_ctes() -> str:
    """Shared CTE body: wf (corpus-wide word frequencies), p0 (char
    positions), then the unrolled rounds — b{{t}} are the learned rules
    and p{BPE_TRAIN_ROUNDS} is the final merged-vocabulary state."""
    head = """
    WITH wf AS (
      SELECT word, COUNT(*) AS f
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      GROUP BY word
    ),
    p0 AS (
      SELECT word, f, i AS pos, substr(word, i, 1) AS sym
      FROM wf, unnest(range(1, length(word) + 1)) AS u(i)
    )"""
    rounds = "".join(
        _bpe_merge_round_duck(t) for t in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    return head + rounds


def _bpe_train_oracle() -> str:
    rules = "\n      UNION ALL\n".join(
        f"      SELECT {t} AS step, bx, by, bcnt FROM b{t}"
        for t in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    tail = f"""
    SELECT CAST(step AS INT) AS step,
           bx AS left_sym, by AS right_sym,
           bx || by AS merged,
           bcnt AS pair_count
    FROM (
{rules}
    ) ORDER BY step"""
    return _bpe_train_ctes() + tail


@register(
    "text_bpe_train_merges",
    bench=True,
    oracle=_bpe_train_oracle(),
    doc=f"Multi-step BPE TRAINING: {BPE_TRAIN_ROUNDS} merge rules learned "
        "by the full loop — count corpus-weighted adjacent symbol pairs, "
        "take the argmax as the next merge (ties: count desc, then pair "
        "lexicographic), apply it greedy left-to-right non-overlapping "
        "(subword-nmt semantics: a run of m identical symbols merges "
        "floor(m/2) pairs), RE-PAIR over the merged vocabulary, repeat — "
        "completing the tokenizer family (token count → fertility → "
        "one-step merge-pairs → training). Each vocabulary state is one "
        "(word, f, syms ARRAY) row per distinct word, so the greedy "
        "merge is a single zero-shuffle left-to-right fold per word "
        "(_BPE_MERGE_EXPR; a fold IS the greedy scan — see the "
        "expression's comment for why a just-merged token can never "
        "re-merge) — no recursion, no Python. Scale shape: pair "
        "statistics and merges run over the DISTINCT-WORD table "
        "weighted by frequency (the |vocab| << corpus optimization "
        "every real BPE trainer uses; the corpus is touched once for "
        "the frequency census); each round is one partial-aggregated "
        "pair census + tiny global argmax + a map-only merge, with "
        "localCheckpoint cutting the per-round lineage exactly like the "
        "star-contraction CC loop (dedup.py:619).",
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    rules, _states = _bpe_train_state(spark, sf_dir, need_rules=True)
    out = rules[0]
    for r in rules[1:]:
        out = out.unionAll(r)
    return out.orderBy("step")


#: adjacent symbol pairs of a vocabulary-state ``syms`` array — the
#: per-round pair census input. The ``size >= 2`` guard matters:
#: ``sequence(1, 0)`` is DESCENDING ([1, 0]) in Spark, so a one-symbol
#: word would otherwise index past the array.
_BPE_PAIRS_EXPR = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS sym, element_at(syms, i + 1) AS nxt))"
    " ELSE CAST(array() AS array<struct<sym:string,nxt:string>>) END"
)

#: greedy left-to-right non-overlapping application of merge rule
#: (bx, by) to a ``syms`` array, as a single zero-shuffle fold
#: (subword-nmt semantics). A left-to-right fold IS the greedy scan:
#: append each symbol unless the accumulator's last element equals bx
#: and the current one equals by, in which case replace the last element
#: with the merged token. A token merged THIS round can never re-merge
#: as bx at the same position because merged = bx||by != bx (by is
#: non-empty), so a run of m identical symbols merges exactly
#: floor(m/2) pairs — the same result the former four-window
#: gaps-and-islands pass produced, without any exchange or sort.
_BPE_MERGE_EXPR = (
    "aggregate(syms, CAST(array() AS array<string>), "
    "(acc, x) -> CASE WHEN size(acc) > 0 "
    "AND element_at(acc, size(acc)) = bx AND x = by "
    "THEN concat(slice(acc, 1, size(acc) - 1), array(concat(bx, by))) "
    "ELSE concat(acc, array(x)) END)"
)


def _bpe_pair_census(state: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair argmax over a vocabulary state:
    one explode + one partial-aggregated exchange + TakeOrdered(1)."""
    return (
        state.select("f", F.explode(F.expr(_BPE_PAIRS_EXPR)).alias("p"))
        .groupBy("p.sym", "p.nxt")
        .agg(F.sum("f").cast("bigint").alias("bcnt"))
        .orderBy(F.desc("bcnt"), F.asc("sym"), F.asc("nxt"))
        .limit(1)
        .select(F.col("sym").alias("bx"), F.col("nxt").alias("by"), "bcnt")
    )


def _bpe_train_state(
    spark: SparkSession,
    sf_dir: str,
    wf: "DataFrame | None" = None,
    need_rules: bool = False,
):
    """Run the {BPE_TRAIN_ROUNDS}-round training loop; returns
    ``(rules, states)`` — the list of one-row merge-rule DataFrames and
    the list of ``(word, f, syms)`` vocabulary states (``syms`` the
    symbol ARRAY of the word under the merges so far), ``states[0]``
    being the char-level start and ``states[-1]`` the fully merged
    vocabulary. Shared by the trainer (rules), the trained-tokenizer
    fertility eval (final state), and the merge curve (every state).

    Round 15 (optimization): the state is one array row per word
    instead of one row per (word, position). The pair census is an
    explode + partial-aggregated groupBy (the pair domain is tiny, so
    map-side aggregation collapses the exchange to ~|pairs| rows), and
    the greedy merge application is a zero-shuffle fold
    (``_BPE_MERGE_EXPR``) — the former implementation paid a
    word-partitioned exchange plus four window sorts per round for the
    same result (equivalence pinned in tests/test_bpe_array_merge.py;
    measured 4.7 s -> 2.0 s at sf0.1, and strictly fewer exchanges at
    any scale). The merged STATE is localCheckpoint'd every round (the
    state feeds census + rebuild, so the cut keeps the per-round plan
    flat — the CC-loop hazard, dedup.py:583 — and the tables are
    vocabulary-bounded, so the cut is cheap); the census argmax is
    checkpointed only when ``need_rules`` (see the loop comment).

    ``wf`` optionally supplies a precomputed ``(word, f)`` frequency
    census so a caller that already paid a corpus tokenization pass
    (the fertility eval's per-language census) does not pay a second
    one."""
    if wf is None:
        docs = load(spark, sf_dir, "documents")["documents"]
        wf = (
            docs.select(
                F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("f"))
        )
    # Consecutive/leading/trailing spaces in text split into empty
    # words; sequence(1, 0) is DESCENDING ([1, 0]) in Spark, so an
    # empty word would produce a spurious ['', ''] symbol array that the
    # DuckDB oracle's range(1, length+1) (empty) never produces —
    # drop them before building symbol arrays (same trap as the
    # greatest(..., 0) guard in BIGRAMS_SPARK).
    state = (
        wf.filter(F.length("word") >= 1)
        .select(
            "word", "f",
            F.expr(
                "transform(sequence(1, length(word)), "
                "i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint()
    )
    rules = []
    states = [state]
    for t in range(1, BPE_TRAIN_ROUNDS + 1):
        # checkpoint the census argmax only when the caller consumes the
        # RULES (the trainer): its output re-reads every round's best
        # pair, and without the cut each re-read re-runs that round's
        # census. The curve and fertility evals consume only the STATES,
        # so for them the census executes exactly once — inside the next
        # state's checkpoint job, as a broadcast subtree — and its own
        # checkpoint is a pure extra job barrier per round (measured
        # +0.2 s per query at sf0.1; alternating A/B, see
        # OPTIMIZATION_r15.md).
        best = _bpe_pair_census(state)
        if need_rules:
            best = best.localCheckpoint()
        rules.append(
            best.select(
                F.lit(t).cast("int").alias("step"),
                F.col("bx").alias("left_sym"),
                F.col("by").alias("right_sym"),
                F.concat("bx", "by").alias("merged"),
                F.col("bcnt").alias("pair_count"),
            )
        )
        state = (
            state.crossJoin(F.broadcast(best.select("bx", "by")))
            .select("word", "f", F.expr(_BPE_MERGE_EXPR).alias("syms"))
            .localCheckpoint()
        )
        states.append(state)
    return rules, states


@register(
    "text_bpe_trained_fertility",
    oracle=_bpe_train_ctes() + f""",
    wfl AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS fl
      FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      GROUP BY lang, word
    ),
    tok AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM p{BPE_TRAIN_ROUNDS} GROUP BY word
    )
    SELECT lang,
           CAST(SUM(fl) AS BIGINT) AS n_word_occurrences,
           CAST(SUM(fl * length(word)) AS BIGINT) AS total_chars,
           CAST(SUM(fl * n_tok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(fl * length(word)) AS DOUBLE)
                 / greatest(SUM(fl * n_tok), 1), 6) AS chars_per_token,
           round(CAST(SUM(fl * n_tok) AS DOUBLE)
                 / greatest(SUM(fl), 1), 6) AS tokens_per_word
    FROM wfl JOIN tok USING (word)
    WHERE length(word) >= 1
    GROUP BY lang
    """,
    doc=f"Fertility of the TRAINED tokenizer: apply the "
        f"{BPE_TRAIN_ROUNDS} merge rules text_bpe_train_merges learns "
        "(the identical unrolled loop — training and application share "
        "one construction, so the eval measures exactly the tokenizer "
        "that was trained) and report per-language chars-per-token and "
        "tokens-per-word over the corpus. Against the character "
        "baseline (1 char = 1 token, chars_per_token = 1.0) this is the "
        "compression the learned merges buy, per language — the "
        "end-of-training eval that closes the tokenizer family loop "
        "(count → fertility → merge-pairs → training → trained-"
        "tokenizer eval) and exposes which languages the merges "
        "under-serve (same skew signal as text_tokenizer_fertility, "
        "but for the tokenizer THIS engine trained rather than the "
        "fixed regex pretokenizer). Scale shape: merges run once over "
        "the distinct-word table; application is free (the final "
        "positions state IS the tokenization); the per-language rollup "
        "joins corpus (lang, word) frequencies to per-word token "
        "counts — vocabulary-sized join, corpus touched once for the "
        "frequency census.",
    bench=True,
)
def text_bpe_trained_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    # ONE corpus tokenization pass: the per-(lang, word) census is the
    # finer grain, so the trainer's (word, f) census is derived from it
    # by re-aggregation instead of a second explode over the corpus
    # (identical counts — summing per-language frequencies over
    # languages IS the corpus frequency). localCheckpoint because wfl
    # feeds both the derived wf (consumed eagerly by the training loop)
    # and the final per-language rollup.
    wfl = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("fl"))
        .localCheckpoint()
    )
    wf = wfl.groupBy("word").agg(F.sum("fl").alias("f"))
    _rules, states = _bpe_train_state(spark, sf_dir, wf=wf)
    # the final vocabulary state IS the tokenization: tokens per word =
    # the length of its merged symbol array (was a positions-table
    # groupBy before the round-15 array-state optimization)
    tok = states[-1].select(
        "word", F.size("syms").cast("bigint").alias("n_tok")
    )
    return (
        wfl.filter(F.length("word") >= 1)
        .join(tok, "word")
        .groupBy("lang")
        .agg(
            F.sum("fl").cast("bigint").alias("n_word_occurrences"),
            F.expr("CAST(SUM(fl * length(word)) AS BIGINT)").alias(
                "total_chars"
            ),
            F.expr("CAST(SUM(fl * n_tok) AS BIGINT)").alias("total_tokens"),
            F.expr(
                "round(CAST(SUM(fl * length(word)) AS DOUBLE)"
                " / greatest(SUM(fl * n_tok), 1), 6)"
            ).alias("chars_per_token"),
            F.expr(
                "round(CAST(SUM(fl * n_tok) AS DOUBLE)"
                " / greatest(SUM(fl), 1), 6)"
            ).alias("tokens_per_word"),
        )
    )


@register(
    "text_bpe_merge_curve",
    oracle=_bpe_train_ctes() + """,
    curve AS (
      SELECT 0 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p0
      UNION ALL
      SELECT 1 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p1
      UNION ALL
      SELECT 2 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p2
      UNION ALL
      SELECT 3 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p3
      UNION ALL
      SELECT 4 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p4
      UNION ALL
      SELECT 5 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p5
      UNION ALL
      SELECT 6 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p6
      UNION ALL
      SELECT 7 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p7
      UNION ALL
      SELECT 8 AS step, CAST(SUM(f) AS BIGINT) AS corpus_tokens FROM p8
    ),
    base AS (SELECT CAST(SUM(f) AS BIGINT) AS total_chars FROM p0)
    SELECT CAST(step AS INT) AS step, corpus_tokens, total_chars,
           round(CAST(total_chars AS DOUBLE) / corpus_tokens, 6)
             AS chars_per_token
    FROM curve CROSS JOIN base ORDER BY step
    """,
    doc="The tokenizer TRAINING CURVE: corpus token count and "
        "chars-per-token after each of the {K} learned "
        "merges (step 0 = the character baseline) -- the marginal-"
        "compression-per-merge diagnostic a tokenizer trainer reads to "
        "pick vocabulary size (merges hit diminishing returns when the "
        "curve flattens). Each point is one SUM over the corresponding "
        "vocabulary state the training loop already materialized "
        "(states are localCheckpoint'd per round, so the nine aggregates "
        "are nine tiny scans of vocab-chars-bounded tables, not nine "
        "corpus passes); chars-per-token divides by the step-0 scalar "
        "broadcast. Completes the tokenizer family's observability: "
        "train -> per-step curve -> final fertility.".format(
            K=BPE_TRAIN_ROUNDS),
    bench=True,
)
def text_bpe_merge_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    _rules, states = _bpe_train_state(spark, sf_dir)
    # corpus tokens after step t = sum over the vocabulary of
    # frequency x symbols-per-word (the array-state equivalent of the
    # former positions-table SUM(f) — one row per position each carried
    # f, so the two sums are identical)
    aggs = [
        st.agg(
            F.sum(F.col("f") * F.size("syms")).cast("bigint")
            .alias("corpus_tokens")
        ).select(F.lit(t).cast("int").alias("step"), "corpus_tokens")
        for t, st in enumerate(states)
    ]
    curve = aggs[0]
    for a in aggs[1:]:
        curve = curve.unionAll(a)
    base = states[0].agg(
        F.sum(F.col("f") * F.size("syms")).cast("bigint").alias("total_chars")
    )
    return (
        curve.crossJoin(F.broadcast(base))
        .select(
            "step", "corpus_tokens", "total_chars",
            F.expr(
                "round(CAST(total_chars AS DOUBLE) / corpus_tokens, 6)"
            ).alias("chars_per_token"),
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# language-ID confusion matrix (classifier evaluation)
# ---------------------------------------------------------------------------

@register(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS lang_labeled,
             CASE WHEN {_D['n_en_stop']} > {_D['n_es_stop']} THEN 'en'
                  WHEN {_D['n_es_stop']} > {_D['n_en_stop']} THEN 'es'
                  ELSE 'und' END AS lang_pred
      FROM documents
    ),
    cells AS (
      SELECT lang_labeled, lang_pred, COUNT(*) AS n
      FROM pred GROUP BY lang_labeled, lang_pred
    ),
    row_tot AS (
      SELECT lang_labeled, SUM(n) AS rt FROM cells GROUP BY lang_labeled
    ),
    col_tot AS (
      SELECT lang_pred, SUM(n) AS ct FROM cells GROUP BY lang_pred
    )
    SELECT c.lang_labeled, c.lang_pred,
           CAST(c.n AS BIGINT) AS n_docs,
           round(CAST(c.n AS DOUBLE) / r.rt, 6) AS recall_share,
           round(CAST(c.n AS DOUBLE) / t.ct, 6) AS precision_share
    FROM cells c
    JOIN row_tot r ON r.lang_labeled = c.lang_labeled
    JOIN col_tot t ON t.lang_pred = c.lang_pred
    """,
    doc="Language-ID confusion matrix: the stopword-heuristic classifier "
        "(text_lang_id) evaluated against the labeled lang column — each "
        "(labeled, predicted) cell with its count, per-class recall "
        "share (cell / labeled-class total), and precision share "
        "(cell / predicted-class total) as exact integer ratios. The "
        "classifier-eval pattern every quality-filter model needs before "
        "it gates a corpus; the matrix is |langs|^2 rows, broadcast-"
        "sized, and marginals reduce before the ratio join.",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_lang_id(spark, sf_dir).select("lang_labeled", "lang_pred")
    cells = pred.groupBy("lang_labeled", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = cells.groupBy("lang_labeled").agg(F.sum("n").alias("rt"))
    col_tot = cells.groupBy("lang_pred").agg(F.sum("n").alias("ct"))
    return (
        cells.join(F.broadcast(row_tot), "lang_labeled")
        .join(F.broadcast(col_tot), "lang_pred")
        .select(
            "lang_labeled", "lang_pred",
            F.col("n").cast("bigint").alias("n_docs"),
            F.expr("round(CAST(n AS DOUBLE) / rt, 6)").alias("recall_share"),
            F.expr("round(CAST(n AS DOUBLE) / ct, 6)").alias("precision_share"),
        )
    )


# ---------------------------------------------------------------------------
# class-balanced downsampling (equalize strata to the smallest class)
# ---------------------------------------------------------------------------

@register(
    "sample_balanced_downsample",
    oracle="""
    WITH sizes AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    floor_n AS (SELECT MIN(n) AS k FROM sizes),
    ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(concat('bal:', doc_id)), doc_id)
               AS rk
      FROM documents
    )
    SELECT lang, doc_id, rk
    FROM ranked WHERE rk <= (SELECT k FROM floor_n)
    """,
    doc="Class-balanced downsampling: every language stratum cut to the "
        "SMALLEST class's size by deterministic hash order — the "
        "imbalance fix applied before training classifiers (language-ID, "
        "quality gates) whose loss would otherwise be dominated by the "
        "majority class. Differs from sample_stratified_exact's fixed "
        "per-stratum k: the cut size is DATA-DEPENDENT (min class "
        "count), computed as a 1-row broadcast, so re-runs under data "
        "growth stay balanced without retuning. One shuffle on the "
        "stratum key; hash order keeps previously-selected members "
        "stable in expectation as classes grow.",
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    floor_n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).agg(
        F.min("n").alias("k")
    )
    w = Window.partitionBy("lang").orderBy(
        F.expr("md5(concat('bal:', doc_id))"), F.asc("doc_id")
    )
    return (
        docs.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("k"))
        .select("lang", "doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# vocabulary growth curve (Heaps'-law checkpoints)
# ---------------------------------------------------------------------------

VOCAB_CHECKPOINTS = (100, 200, 300, 400, 500)


@register(
    "text_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    firsts AS (
      SELECT t, MIN(doc_id) AS first_doc FROM tok GROUP BY t
    ),
    doc_tok AS (
      SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ),
    cps AS (
      SELECT unnest([{", ".join(str(c) for c in VOCAB_CHECKPOINTS)}]) AS cp
    ),
    tt AS (
      SELECT cp, SUM(d.n) AS total_tokens
      FROM cps JOIN doc_tok d ON d.doc_id < cp GROUP BY cp
    ),
    vv AS (
      SELECT cp, COUNT(*) AS vocab_size
      FROM cps JOIN firsts f ON f.first_doc < cp GROUP BY cp
    )
    SELECT CAST(tt.cp AS INT) AS n_docs,
           CAST(tt.total_tokens AS BIGINT) AS total_tokens,
           CAST(vv.vocab_size AS BIGINT) AS vocab_size,
           round(CAST(vv.vocab_size AS DOUBLE) / tt.total_tokens, 6)
             AS type_token_ratio
    FROM tt JOIN vv ON vv.cp = tt.cp
    """,
    doc="Vocabulary growth curve (the Heaps'-law measurement): cumulative "
        "distinct-token count at document-count checkpoints, against "
        "cumulative token volume. 'Cumulative distinct' sounds "
        "inherently sequential; the FIRST-OCCURRENCE trick makes it one "
        "distributed aggregate — a token is new at checkpoint c iff its "
        "min doc_id < c, so one (token -> min doc) reduce serves every "
        "checkpoint, no ordered scan, no re-processing per checkpoint. "
        "A flattening curve (falling type/token ratio) is the classic "
        "saturation signal that more same-source crawl adds tokens but "
        "no vocabulary; a curve that will not flatten flags OCR noise / "
        "serial-number text. Checkpoint joins are broadcasts of a "
        f"{len(VOCAB_CHECKPOINTS)}-row list.",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    doc_tok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(c) for c in VOCAB_CHECKPOINTS])
        ).alias("cp")
    )
    tt = (
        doc_tok.join(F.broadcast(cps), F.col("doc_id") < F.col("cp"))
        .groupBy("cp")
        .agg(F.sum("n").alias("total_tokens"))
    )
    vv = (
        firsts.join(F.broadcast(cps), F.col("first_doc") < F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    return tt.join(vv, "cp").select(
        F.col("cp").cast("int").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("vocab_size").cast("bigint").alias("vocab_size"),
        F.expr(
            "round(CAST(vocab_size AS DOUBLE) / total_tokens, 6)"
        ).alias("type_token_ratio"),
    )


# ---------------------------------------------------------------------------
# source distribution divergence (integer-exact total variation distance)
# ---------------------------------------------------------------------------

@register(
    "text_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t
    ),
    tot AS (
      SELECT source, SUM(c) AS n FROM cnt GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS na, b.n AS nb
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    joint AS (
      SELECT p.source_a, p.source_b, p.na, p.nb,
             COALESCE(ca.c, 0) AS cta, COALESCE(cb.c, 0) AS ctb
      FROM pairs p
      JOIN (SELECT DISTINCT t FROM cnt) v ON TRUE
      LEFT JOIN cnt ca ON ca.source = p.source_a AND ca.t = v.t
      LEFT JOIN cnt cb ON cb.source = p.source_b AND cb.t = v.t
    )
    SELECT source_a, source_b,
           CAST(MAX(na) AS BIGINT) AS tokens_a,
           CAST(MAX(nb) AS BIGINT) AS tokens_b,
           round(CAST(SUM(abs(cta * nb - ctb * na)) AS DOUBLE)
                 / (2.0 * MAX(na) * MAX(nb)), 6) AS tvd
    FROM joint GROUP BY source_a, source_b
    """,
    doc="Domain-shift measurement: total-variation distance between every "
        "pair of sources' unigram distributions, computed EXACTLY in "
        "integers — TVD = sum|c_a*n_b - c_b*n_a| / (2*n_a*n_b) clears "
        "the denominators, so the whole accumulation is a BIGINT sum "
        "with one float division at the end (a naive sum of "
        "|p_i - q_i| doubles is float-summation-order-dependent and "
        "engine-divergent). TVD 0 = identical vocabular mix, 1 = "
        "disjoint; the pairwise matrix drives source-mix rebalancing "
        "and flags a crawl source that drifted. Shuffles on (source, "
        "token) then token — both map-side combinable; the |sources|^2 "
        "pair frame is broadcast-sized.",
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    a = tot.alias("a")
    b = tot.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    vocab = cnt.select("t").distinct().withColumnRenamed("t", "vt")
    ca = cnt.select(
        F.col("source").alias("sa_key"), F.col("t").alias("ta"),
        F.col("c").alias("cta"),
    )
    cb = cnt.select(
        F.col("source").alias("sb_key"), F.col("t").alias("tb"),
        F.col("c").alias("ctb"),
    )
    joint = (
        pairs.join(F.broadcast(vocab), F.lit(True))
        .join(ca, (F.col("source_a") == F.col("sa_key"))
              & (F.col("vt") == F.col("ta")), "left")
        .join(cb, (F.col("source_b") == F.col("sb_key"))
              & (F.col("vt") == F.col("tb")), "left")
        .select(
            "source_a", "source_b", "na", "nb",
            F.coalesce("cta", F.lit(0)).alias("cta"),
            F.coalesce("ctb", F.lit(0)).alias("ctb"),
        )
    )
    return joint.groupBy("source_a", "source_b").agg(
        F.max("na").cast("bigint").alias("tokens_a"),
        F.max("nb").cast("bigint").alias("tokens_b"),
        F.expr(
            "round(CAST(SUM(abs(cta * nb - ctb * na)) AS DOUBLE) "
            "/ (2.0 * MAX(na) * MAX(nb)), 6)"
        ).alias("tvd"),
    )


# ---------------------------------------------------------------------------
# hapax legomena ratio (vocabulary richness per source)
# ---------------------------------------------------------------------------

@register(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_share
    FROM cnt GROUP BY source
    """,
    doc="Hapax legomena profile per source: the share of vocabulary "
        "occurring exactly once — the classic corpus-linguistics "
        "richness statistic and a sharp noise detector (OCR garbage and "
        "serial-number text push hapax share toward 1; template spam "
        "pushes it toward 0). Near-zero-extra-cost companion to "
        "text_vocab_growth: one (source, token) count reduce, then a "
        "per-source fold — both map-side combinable, shuffles carry the "
        "vocabulary, never the corpus.",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    cnt = (
        docs.select(
            "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_hapax"),
        F.expr(
            "round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*), 6)"
        ).alias("hapax_share"),
    )


# ---------------------------------------------------------------------------
# readability scoring (Flesch reading ease, integer-count heuristic)
# ---------------------------------------------------------------------------

_WORD_RE = "[a-z0-9]+"
_SENT_RE = "[.!?]+"
_SYL_RE = "[aeiouy]+"

#: standalone Flesch expressions over a ``text`` column — importable by
#: composition operators (pipeline curriculum) so the score text cannot
#: drift from text_readability's
FLESCH_SPARK = (
    f"round(206.835"
    f" - 1.015 * (CAST(size(regexp_extract_all(lower(text), '{_WORD_RE}', 0)) AS DOUBLE)"
    f"            / greatest(size(regexp_extract_all(text, '{_SENT_RE}', 0)), 1))"
    f" - 84.6 * (CAST(size(regexp_extract_all(lower(text), '{_SYL_RE}', 0)) AS DOUBLE)"
    f"           / greatest(size(regexp_extract_all(lower(text), '{_WORD_RE}', 0)), 1)), 6)"
)
FLESCH_DUCK = (
    f"round(206.835"
    f" - 1.015 * (CAST(len(regexp_extract_all(lower(text), '{_WORD_RE}')) AS DOUBLE)"
    f"            / greatest(len(regexp_extract_all(text, '{_SENT_RE}')), 1))"
    f" - 84.6 * (CAST(len(regexp_extract_all(lower(text), '{_SYL_RE}')) AS DOUBLE)"
    f"           / greatest(len(regexp_extract_all(lower(text), '{_WORD_RE}')), 1)), 6)"
)


@register(
    "text_readability",
    # all three inputs are exact integer regex-group counts over the same
    # lowercased bytes; the score is one double expression over those
    # integers, rounded to 6dp — identical in both engines
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{_WORD_RE}')) AS w,
             greatest(len(regexp_extract_all(text, '{_SENT_RE}')), 1) AS s,
             len(regexp_extract_all(lower(text), '{_SYL_RE}')) AS y
      FROM documents
    )
    SELECT doc_id,
           CAST(w AS INT) AS n_words,
           CAST(s AS INT) AS n_sentences,
           CAST(y AS INT) AS n_syllables,
           round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                         - 84.6 * (CAST(y AS DOUBLE) / greatest(w, 1)), 6)
             AS flesch
    FROM c
    """,
    doc="Flesch reading-ease score per document from three integer "
        "counts: words (alnum runs), sentences (terminal-punctuation "
        "runs, floored at 1), and syllables approximated as vowel-group "
        "runs — the classic cheap readability gate corpus curation uses "
        "to downweight telegraphic or run-on text. Pure codegen'd per-row "
        "regex counting, zero shuffle; the only floats are two divisions "
        "of exact integers rounded at 6dp.",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.expr(
            f"CAST(size(regexp_extract_all(lower(text), '{_WORD_RE}', 0)) AS INT)"
        ).alias("n_words"),
        F.expr(
            f"CAST(greatest(size(regexp_extract_all(text, '{_SENT_RE}', 0)), 1) AS INT)"
        ).alias("n_sentences"),
        F.expr(
            f"CAST(size(regexp_extract_all(lower(text), '{_SYL_RE}', 0)) AS INT)"
        ).alias("n_syllables"),
        F.expr(
            "round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)"
            " - 84.6 * (CAST(n_syllables AS DOUBLE) / greatest(n_words, 1)), 6)"
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment + balance audit
# ---------------------------------------------------------------------------

KFOLDS = 5


@register(
    "sample_kfold_balance",
    # fold = salted md5 of doc_id mod k (same determinism contract as
    # sample_split_documents); the audit grid is (source x fold) with the
    # per-source uniform deviation in exact integer per-mille
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, source,
             {md5_int32_duck("concat('fold:', doc_id)")} % {KFOLDS} AS fold
      FROM documents
    ),
    per AS (
      SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM assigned GROUP BY source, fold
    ),
    tot AS (
      SELECT source, SUM(n_docs) AS t FROM per GROUP BY source
    )
    SELECT p.source, CAST(p.fold AS INT) AS fold, p.n_docs,
           round(CAST(p.n_docs AS DOUBLE) / t.t, 6) AS fold_share,
           CAST(({KFOLDS} * 1000 * p.n_docs - 1000 * t.t) AS BIGINT)
             AS dev_permille_scaled
    FROM per p JOIN tot t ON t.source = p.source
    """,
    doc=f"k-fold CV assignment (k={KFOLDS}) with a per-source balance "
        "audit: fold membership is a salted-md5 pure function of doc_id "
        "(stable under repartitioning/appends — the sample_split_documents "
        "contract), and the audit reports each (source, fold) cell's "
        "share plus its deviation from the uniform 1/k in EXACT scaled "
        "integers (k*1000*n - 1000*total: positive = oversubscribed "
        "cell). A skewed cell means fold metrics won't be comparable. "
        "One map-side-combinable aggregate on (source, fold) plus a "
        "|sources|-row broadcast join.",
)
def sample_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    fold_hash = md5_int32_spark("concat('fold:', doc_id)")
    assigned = docs.select(
        "source",
        F.expr(f"{fold_hash} % {KFOLDS}").alias("fold"),
    )
    per = assigned.groupBy("source", "fold").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs")
    )
    tot = per.groupBy("source").agg(F.sum("n_docs").alias("t"))
    return per.join(F.broadcast(tot), "source").select(
        "source",
        F.col("fold").cast("int").alias("fold"),
        "n_docs",
        F.expr("round(CAST(n_docs AS DOUBLE) / t, 6)").alias("fold_share"),
        F.expr(
            f"CAST(({KFOLDS} * 1000 * n_docs - 1000 * t) AS BIGINT)"
        ).alias("dev_permille_scaled"),
    )


# ---------------------------------------------------------------------------
# Zipf-law slope fit over the token frequency distribution
# ---------------------------------------------------------------------------

ZIPF_TOP_V = 500  # fit over the top-V vocabulary (distributed top-k)


@register(
    "text_zipf_slope",
    # log-log OLS with the established float-determinism discipline:
    # ln() is computed PER ROW and rounded to 6dp, then all sums run as
    # DECIMAL (order-independent); the slope/intercept are single final
    # divisions of exact decimals
    oracle=f"""
    WITH freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk
      FROM freq ORDER BY n DESC, tok LIMIT {ZIPF_TOP_V}
    ),
    xy AS (
      SELECT CAST(round(ln(rk), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(n), 6) AS DECIMAL(18,6)) AS y,
             CAST(round(ln(rk) * ln(n), 6) AS DECIMAL(28,6)) AS xy,
             CAST(round(ln(rk) * ln(rk), 6) AS DECIMAL(28,6)) AS xx
      FROM ranked
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(xy) AS sxy, SUM(xx) AS sxx
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / n, 6) AS log_intercept
    FROM s
    """,
    doc=f"Zipf-law fit: OLS slope of log-frequency vs log-rank over the "
        f"top-{ZIPF_TOP_V} vocabulary — natural corpora fit ~-1; a "
        "materially flatter slope is the synthetic/templated-text "
        "signature and a steeper one flags vocabulary collapse, so the "
        "single number is a cheap corpus-authenticity gate. Determinism: "
        "per-row ln() rounded at 6dp then DECIMAL sums (order-"
        "independent), one final division pair. Scale shape: one "
        "vocabulary aggregate with map-side partials, a distributed "
        f"top-{ZIPF_TOP_V} selection (TakeOrdered, no global sort), and "
        "a single-row reduction.",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    freq = (
        docs.select(F.explode(F.expr(TOKS_SPARK)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    )
    top = freq.orderBy(F.desc("n"), F.asc("tok")).limit(ZIPF_TOP_V)
    ranked = top.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok")))
    )
    xy = ranked.select(
        F.expr("CAST(round(ln(rk), 6) AS DECIMAL(18,6))").alias("x"),
        F.expr("CAST(round(ln(n), 6) AS DECIMAL(18,6))").alias("y"),
        F.expr("CAST(round(ln(rk) * ln(n), 6) AS DECIMAL(28,6))").alias("xy"),
        F.expr("CAST(round(ln(rk) * ln(rk), 6) AS DECIMAL(28,6))").alias("xx"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.expr(
            "round(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE), 6)"
        ).alias("zipf_slope"),
        F.expr(
            "round((CAST(sy AS DOUBLE)"
            " - CAST(n * sxy - sx * sy AS DOUBLE)"
            "   / CAST(n * sxx - sx * sx AS DOUBLE)"
            "   * CAST(sx AS DOUBLE)) / n, 6)"
        ).alias("log_intercept"),
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-ES keys)
# ---------------------------------------------------------------------------

WEIGHTED_K = 50


@register(
    "sample_weighted_topk",
    # A-ES: drawing k items by key u^(1/w) (u uniform, w the weight) is
    # EXACTLY weighted sampling without replacement. Rank on ln(u)/w
    # (monotone in the key), computed per row and rounded at 6dp so both
    # engines order identically; u = (md5_int32 + 1) / 2^33 stays in (0,
    # 0.5] — strictly positive, ln() defined
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(ln(({md5_int32_duck("concat('aes:', doc_id)")} + 1)
                      / 8589934592.0) / n_chars, 6) AS sort_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, sort_key,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT doc_id, n_chars, sort_key,
             ROW_NUMBER() OVER (ORDER BY sort_key DESC, doc_id) AS rk
      FROM keyed
    ) t WHERE rk <= {WEIGHTED_K}
    """,
    doc=f"Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
        f"A-ES): {WEIGHTED_K} documents drawn with probability "
        "proportional to length via the key u^(1/w) — the principled "
        "way to length-weight a training subsample where independent "
        "per-row coin flips (A-RES's cousin) cannot hit an exact k. "
        "The 'randomness' is salted md5, so re-runs, repartitioning, "
        "and engine choice all reproduce the same sample — and the "
        "selection is a DISTRIBUTED top-k on the per-row key "
        "(TakeOrdered: per-partition heads then one tiny merge, no "
        "global sort), the property that lets the same k serve 100 TB.",
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    aes_hash = md5_int32_spark("concat('aes:', doc_id)")
    u = f"({aes_hash} + 1) / 8589934592.0"
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        F.expr(f"round(ln({u}) / n_chars, 6)").alias("sort_key"),
    )
    top = keyed.orderBy(F.desc("sort_key"), F.asc("doc_id")).limit(WEIGHTED_K)
    w = Window.orderBy(F.desc("sort_key"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        "sort_key",
        F.row_number().over(w).cast("int").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source token distributions
# ---------------------------------------------------------------------------

_JSD_TERM = """
    CAST(round(
      CASE WHEN cta > 0 THEN
        0.5 * (CAST(cta AS DOUBLE) / na)
            * ln(2.0 * (CAST(cta AS DOUBLE) / na)
                 / ((CAST(cta AS DOUBLE) / na) + (CAST(ctb AS DOUBLE) / nb)))
      ELSE 0.0 END
      +
      CASE WHEN ctb > 0 THEN
        0.5 * (CAST(ctb AS DOUBLE) / nb)
            * ln(2.0 * (CAST(ctb AS DOUBLE) / nb)
                 / ((CAST(cta AS DOUBLE) / na) + (CAST(ctb AS DOUBLE) / nb)))
      ELSE 0.0 END, 9) AS DECIMAL(20,9))
"""


@register(
    "text_js_divergence",
    # same per-row-rounded-then-DECIMAL-summed discipline as the corpus
    # float aggregates: each token's JSD contribution is one double
    # expression rounded at 9dp, the accumulation is exact DECIMAL
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t
    ),
    tot AS (
      SELECT source, SUM(c) AS n FROM cnt GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS na, b.n AS nb
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    joint AS (
      SELECT p.source_a, p.source_b, p.na, p.nb,
             COALESCE(ca.c, 0) AS cta, COALESCE(cb.c, 0) AS ctb
      FROM pairs p
      JOIN (SELECT DISTINCT t FROM cnt) v ON TRUE
      LEFT JOIN cnt ca ON ca.source = p.source_a AND ca.t = v.t
      LEFT JOIN cnt cb ON cb.source = p.source_b AND cb.t = v.t
    )
    SELECT source_a, source_b,
           round(CAST(SUM({_JSD_TERM}) AS DOUBLE), 6) AS jsd_nats
    FROM joint GROUP BY source_a, source_b
    """,
    doc="Jensen-Shannon divergence (nats) between every source pair's "
        "unigram distribution — the smooth, always-finite companion to "
        "text_source_divergence's total-variation distance (JSD weighs "
        "HOW different the disagreeing probability mass is, TVD only how "
        "much; reading both separates 'long tail drifted' from 'head "
        "vocabulary replaced'). Each token's contribution is one double "
        "expression rounded at 9dp then summed as exact DECIMAL — no "
        "float-summation order sensitivity. Same (source, token) / token "
        "shuffle shape as the TVD pass; the pair frame is "
        "broadcast-sized.",
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    a = tot.alias("a")
    b = tot.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    vocab = cnt.select("t").distinct()
    ca = cnt.select(
        F.col("source").alias("source_a"), F.col("t").alias("t"),
        F.col("c").alias("ca_c"),
    )
    cb = cnt.select(
        F.col("source").alias("source_b"), F.col("t").alias("t"),
        F.col("c").alias("cb_c"),
    )
    joint = (
        F.broadcast(pairs)
        .crossJoin(vocab)
        .join(ca, ["source_a", "t"], "left")
        .join(cb, ["source_b", "t"], "left")
        .select(
            "source_a", "source_b", "na", "nb",
            F.coalesce(F.col("ca_c"), F.lit(0)).alias("cta"),
            F.coalesce(F.col("cb_c"), F.lit(0)).alias("ctb"),
        )
    )
    return joint.groupBy("source_a", "source_b").agg(
        F.expr(f"round(CAST(SUM({_JSD_TERM}) AS DOUBLE), 6)").alias("jsd_nats")
    )


# ---------------------------------------------------------------------------
# count-min width sweep: overcount vs memory, measured on the same corpus
# ---------------------------------------------------------------------------

CMS_SWEEP_WIDTHS = (64, 256)


def _cms_w_bucket_spark(d: int, w: int) -> str:
    salted = f"concat('cms{d}:', token)"
    return f"{md5_int32_spark(salted)} % {w}"


def _cms_w_bucket_duck(d: int, w: int) -> str:
    salted = f"concat('cms{d}:', token)"
    return f"{md5_int32_duck(salted)} % {w}"


@register(
    "sketch_cms_width_sweep",
    # one token pass feeds BOTH widths (same salted md5 rows, different
    # modulus); estimates are min-over-depth point queries per width —
    # every number is an exact integer, so the sweep itself is under the
    # hash gate
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    cells AS (
      SELECT w, d, bucket, COUNT(*) AS c FROM (
        SELECT token, ws.w, ds.d,
               CASE {' '.join(f"WHEN ws.w = {w} AND ds.d = {d} THEN {_cms_w_bucket_duck(d, w)}" for w in CMS_SWEEP_WIDTHS for d in range(CMS_DEPTH))}
               END AS bucket
        FROM toks
        CROSS JOIN (SELECT unnest([{', '.join(str(w) for w in CMS_SWEEP_WIDTHS)}]) AS w) ws
        CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) ds
      ) b GROUP BY w, d, bucket
    ),
    heavy AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM toks GROUP BY token
      ORDER BY true_count DESC, token LIMIT {CMS_QUERY_K}
    )
    SELECT h.token, h.true_count, CAST(ws.w AS INT) AS width,
           CAST(MIN(c.c) AS BIGINT) AS est_count,
           CAST(MIN(c.c) - h.true_count AS BIGINT) AS overcount
    FROM heavy h
    CROSS JOIN (SELECT unnest([{', '.join(str(w) for w in CMS_SWEEP_WIDTHS)}]) AS w) ws
    JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) ds ON TRUE
    JOIN cells c
      ON c.w = ws.w AND c.d = ds.d
     AND c.bucket = CASE {' '.join(f"WHEN ws.w = {w} AND ds.d = {d} THEN {_cms_w_bucket_duck(d, w).replace('token', 'h.token')}" for w in CMS_SWEEP_WIDTHS for d in range(CMS_DEPTH))}
                    END
    GROUP BY h.token, h.true_count, ws.w
    """,
    doc=f"Count-min width sweep: the SAME corpus sketched at widths "
        f"{CMS_SWEEP_WIDTHS[0]} and {CMS_SWEEP_WIDTHS[1]} (identical "
        "salted-md5 rows, different modulus) and point-queried on the "
        "same top-k tokens — the measured overcount-vs-memory curve that "
        "sizes a production sketch (theory bounds error by N*e/w; this "
        "is the observed counterpart on real token skew, the CMS twin "
        "of the b-bit MinHash audit). Exact integers end to end; one "
        "token scan feeds both widths, cells merge cell-wise "
        "(map-side-combinable), the probe side is k tokens broadcast.",
)
def sketch_cms_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    cells = (
        toks.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(w).alias("w"),
                        F.lit(d).alias("d"),
                        F.expr(_cms_w_bucket_spark(d, w)).alias("bucket"),
                    )
                    for w in CMS_SWEEP_WIDTHS
                    for d in range(CMS_DEPTH)
                ])
            ).alias("c")
        )
        .select("c.w", "c.d", "c.bucket")
        .groupBy("w", "d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    heavy = (
        toks.groupBy("token")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("token"))
        .limit(CMS_QUERY_K)
    )
    probes = heavy.select(
        "token",
        "true_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(w).alias("w"),
                    F.lit(d).alias("d"),
                    F.expr(_cms_w_bucket_spark(d, w)).alias("bucket"),
                )
                for w in CMS_SWEEP_WIDTHS
                for d in range(CMS_DEPTH)
            ])
        ).alias("p"),
    ).select("token", "true_count", "p.w", "p.d", "p.bucket")
    return (
        F.broadcast(probes)
        .join(cells, ["w", "d", "bucket"])
        .groupBy("token", "true_count", "w")
        .agg(F.expr("CAST(MIN(c) AS BIGINT)").alias("est_count"))
        .select(
            "token", "true_count",
            F.col("w").cast("int").alias("width"),
            "est_count",
            F.expr("CAST(est_count - true_count AS BIGINT)").alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# token burstiness (variance-to-mean ratio over documents)
# ---------------------------------------------------------------------------

BURST_TOP_V = 100


@register(
    "text_token_burstiness",
    # VMR = var/mean over ALL docs (zeros included) collapses to
    # (N*ss - s^2) / (N*s) with s = total count, ss = sum of squared
    # per-doc counts, N = corpus size — exact integers, one final division
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    stats AS (
      SELECT tok,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS docs_with
      FROM per_doc GROUP BY tok
      ORDER BY s DESC, tok LIMIT {BURST_TOP_V}
    )
    SELECT tok, s AS total_count, docs_with,
           round(CAST(n.n_docs * ss - s * s AS DOUBLE)
                 / (n.n_docs * s), 6) AS vmr
    FROM stats CROSS JOIN n
    """,
    doc=f"Token burstiness (Church & Gale): variance-to-mean ratio of "
        f"per-document counts for the top-{BURST_TOP_V} tokens, zeros "
        "included — VMR near 1 is Poisson-like function-word behavior, "
        "VMR >> 1 marks bursty topical terms (the signal behind "
        "burstiness-aware TF weighting and stopword induction; a "
        "template-stamped corpus shows pathological VMR on its "
        "boilerplate tokens). Cleared-denominator integers until one "
        "final division. One (doc, token) aggregate, a distributed "
        "top-V by total count, and a 1-row broadcast of the corpus "
        "size.",
)
def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    per_doc = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    )
    n = docs.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"))
    stats = (
        per_doc.groupBy("tok")
        .agg(
            F.expr("CAST(SUM(c) AS BIGINT)").alias("s"),
            F.expr("CAST(SUM(c * c) AS BIGINT)").alias("ss"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("docs_with"),
        )
        .orderBy(F.desc("s"), F.asc("tok"))
        .limit(BURST_TOP_V)
    )
    return stats.crossJoin(F.broadcast(n)).select(
        "tok",
        F.col("s").alias("total_count"),
        "docs_with",
        F.expr(
            "round(CAST(n_docs * ss - s * s AS DOUBLE) / (n_docs * s), 6)"
        ).alias("vmr"),
    )


# ---------------------------------------------------------------------------
# HTML/markup stripping (the web-corpus extraction step before any gate)
# ---------------------------------------------------------------------------

#: deterministic HTML-ish wrapper around each document so the strip path
#: exercises real tag/entity removal on the synthetic corpus: every 6th
#: token is bolded, the whole body is fenced in structural tags, and an
#: entity is injected per document. Spark transform() indexes 0-based,
#: DuckDB list_transform() 1-based — the modulus predicates align them.
_HTML_SPARK = (
    "concat('<html><head><title>', source, '</title></head><body><p>', "
    "array_join(transform(split(text, ' '), (w, j) -> "
    "CASE WHEN j % 6 = 0 THEN concat('<b>', w, '</b>') ELSE w END), ' '), "
    "' &amp; tail</p></body></html>')"
)
_HTML_DUCK = (
    "'<html><head><title>' || source || '</title></head><body><p>' || "
    "array_to_string(list_transform(string_split(text, ' '), (w, j) -> "
    "CASE WHEN (j - 1) % 6 = 0 THEN '<b>' || w || '</b>' ELSE w END), ' ') || "
    "' &amp; tail</p></body></html>'"
)


@register(
    "text_html_strip",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_HTML_DUCK} AS html, text FROM documents
    ),
    stripped AS (
      SELECT doc_id, html,
             replace(regexp_replace(html, '<[^>]+>', '', 'g'),
                     '&amp;', '&') AS clean
      FROM raw
    )
    SELECT doc_id,
           CAST(length(html) AS BIGINT) AS n_raw_chars,
           CAST(length(clean) AS BIGINT) AS n_clean_chars,
           CAST(length(html) - length(regexp_replace(html, '<', '', 'g'))
                AS BIGINT) AS n_tags,
           round(CAST(length(html) - length(clean) AS DOUBLE)
                 / length(html), 6) AS markup_ratio
    FROM stripped
    """,
    doc="HTML/markup stripping — the extraction step every web-scale "
        "corpus runs before any quality gate: tags removed by one regex "
        "pass, entities decoded, with per-doc markup-overhead accounting "
        "(markup_ratio is the boilerplate-weight signal trafilatura-style "
        "extractors threshold on). Pure JVM regexp codegen, zero shuffle, "
        "zero Python — at 100 TB this is scan-bound, exactly as it should "
        "be. The synthetic corpus is wrapped in a deterministic HTML "
        "envelope so both engines strip REAL markup.",
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    raw = docs.select("doc_id", F.expr(_HTML_SPARK).alias("html"))
    stripped = raw.withColumn(
        "clean",
        F.expr("replace(regexp_replace(html, '<[^>]+>', ''), '&amp;', '&')"),
    )
    return stripped.select(
        "doc_id",
        F.expr("CAST(length(html) AS BIGINT)").alias("n_raw_chars"),
        F.expr("CAST(length(clean) AS BIGINT)").alias("n_clean_chars"),
        F.expr(
            "CAST(length(html) - length(regexp_replace(html, '<', '')) "
            "AS BIGINT)"
        ).alias("n_tags"),
        F.expr(
            "round(CAST(length(html) - length(clean) AS DOUBLE)"
            " / length(html), 6)"
        ).alias("markup_ratio"),
    )


# ---------------------------------------------------------------------------
# boilerplate-line removal (cross-document repeated-line cleaning)
# ---------------------------------------------------------------------------

BOILER_LINE_TOKENS = 8   # a "line" = one non-overlapping 8-token run
BOILER_MIN_DOCS = 3      # a line in >= 3 distinct docs is boilerplate

_LINES_SPARK = (
    f"transform(sequence(0, CAST(ceil(size(split(text, ' ')) / "
    f"{BOILER_LINE_TOKENS}.0) AS INT) - 1), "
    f"i -> array_join(slice(split(text, ' '), i * {BOILER_LINE_TOKENS} + 1, "
    f"{BOILER_LINE_TOKENS}), ' '))"
)
_LINES_DUCK = (
    f"list_transform(range(0, CAST(ceil(len(string_split(text, ' ')) / "
    f"{BOILER_LINE_TOKENS}.0) AS INT)), "
    f"i -> array_to_string(list_slice(string_split(text, ' '), "
    f"i * {BOILER_LINE_TOKENS} + 1, (i + 1) * {BOILER_LINE_TOKENS}), ' '))"
)


@register(
    "text_boilerplate_lines",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, unnest({_LINES_DUCK}) AS line FROM documents
    ),
    freq AS (
      SELECT line, COUNT(DISTINCT doc_id) AS docs_with
      FROM lines GROUP BY line
    ),
    flagged AS (
      SELECT l.doc_id, l.line,
             CASE WHEN f.docs_with >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END
               AS is_boiler
      FROM lines l JOIN freq f USING (line)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(is_boiler) AS BIGINT) AS n_boilerplate,
           round(CAST(SUM(is_boiler) AS DOUBLE) / COUNT(*), 6)
             AS boilerplate_ratio
    FROM flagged GROUP BY doc_id
    """,
    doc=f"Cross-document boilerplate-line removal (the C4/RefinedWeb "
        "cleaning rule: a line repeated across many pages is navigation/"
        f"footer chrome, not content): docs split into "
        f"{BOILER_LINE_TOKENS}-token lines, a line appearing in >= "
        f"{BOILER_MIN_DOCS} distinct documents is flagged, and each doc "
        "reports its boilerplate line ratio — the removal mask. "
        "Skew-guarded: lines pre-aggregate per (doc, line) so repeats "
        "collapse before any wide exchange, doc frequency is a map-side-"
        "combined COUNT(*) over the deduped pairs, and the per-doc join "
        "attaches only the filtered boilerplate-line set (1 match per "
        "row; a residual hot line is the textbook AQE skew-join split "
        "case) — a cookie-banner line repeated across half the corpus "
        "never funnels raw postings through one reducer.",
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    lines = docs.select(
        "doc_id", F.explode(F.expr(_LINES_SPARK)).alias("line")
    )
    # skew guard (round-4 verdict): joining raw lines against full
    # doc-frequency keys on the line VALUE makes one ubiquitous
    # boilerplate line (cookie banner) a classic hot join key. Instead:
    # (1) pre-aggregate per-(doc, line) so within-doc repeats collapse
    #     and the later exchanges carry distinct pairs only;
    # (2) doc frequency is then a plain map-side-combined COUNT(*) over
    #     the deduped pairs (the COUNT DISTINCT expand goes away);
    # (3) the join attaches only the FILTERED boilerplate-line set —
    #     orders of magnitude smaller than full freq, 1 match per row
    #     (no fan-out), and the residual hot left key is exactly the
    #     shape AQE's skew-join split handles.
    dl = lines.groupBy("doc_id", "line").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")
    )
    boiler = (
        dl.groupBy("line")
        .agg(F.expr("COUNT(*)").alias("docs_with"))
        .filter(F.col("docs_with") >= BOILER_MIN_DOCS)
        .select("line", F.lit(1).alias("is_boiler"))
    )
    flagged = dl.join(boiler, "line", "left").select(
        "doc_id", "cnt",
        F.expr("COALESCE(is_boiler, 0)").alias("is_boiler"),
    )
    return flagged.groupBy("doc_id").agg(
        F.expr("CAST(SUM(cnt) AS BIGINT)").alias("n_lines"),
        F.expr("CAST(SUM(cnt * is_boiler) AS BIGINT)").alias("n_boilerplate"),
        F.expr(
            "round(CAST(SUM(cnt * is_boiler) AS DOUBLE) / SUM(cnt), 6)"
        ).alias("boilerplate_ratio"),
    )


# ---------------------------------------------------------------------------
# unicode/character-class profile (encoding-junk + casing quality signal)
# ---------------------------------------------------------------------------

def _charclass_exprs(engine: str) -> dict:
    """Per-class character counts via regex removal deltas — identical
    regex classes both engines; DuckDB needs the explicit 'g' flag."""
    g = ", 'g'" if engine == "duck" else ""
    n = "length(text)"
    return {
        "n_chars": f"CAST({n} AS BIGINT)",
        "n_letters": (
            f"CAST({n} - length(regexp_replace(text, '[A-Za-z]', ''{g})) AS BIGINT)"
        ),
        "n_digits": (
            f"CAST({n} - length(regexp_replace(text, '[0-9]', ''{g})) AS BIGINT)"
        ),
        "n_spaces": (
            f"CAST({n} - length(regexp_replace(text, ' ', ''{g})) AS BIGINT)"
        ),
        "n_upper": (
            f"CAST({n} - length(regexp_replace(text, '[A-Z]', ''{g})) AS BIGINT)"
        ),
    }


@register(
    "text_unicode_profile",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             {_charclass_exprs('duck')['n_chars']} AS n_chars,
             {_charclass_exprs('duck')['n_letters']} AS n_letters,
             {_charclass_exprs('duck')['n_digits']} AS n_digits,
             {_charclass_exprs('duck')['n_spaces']} AS n_spaces,
             {_charclass_exprs('duck')['n_upper']} AS n_upper
      FROM documents
    )
    SELECT doc_id, n_chars, n_letters, n_digits, n_spaces, n_upper,
           CAST(n_chars - n_letters - n_digits - n_spaces AS BIGINT) AS n_other,
           round(CAST(n_letters AS DOUBLE) / n_chars, 6) AS letter_ratio,
           round(CAST(n_chars - n_letters - n_digits - n_spaces AS DOUBLE)
                 / n_chars, 6) AS junk_ratio
    FROM c
    """,
    doc="Character-class profile: per-document letter/digit/space/upper "
        "counts and the junk ratio (everything else — the encoding-"
        "garbage signal quality pipelines threshold to drop mojibake, "
        "binary spill, and ascii-art pages). Pure codegen regex deltas in "
        "one scan, no shuffle; a 100 TB pass is IO-bound.",
)
def text_unicode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    e = _charclass_exprs("spark")
    c = docs.select(
        "doc_id",
        F.expr(e["n_chars"]).alias("n_chars"),
        F.expr(e["n_letters"]).alias("n_letters"),
        F.expr(e["n_digits"]).alias("n_digits"),
        F.expr(e["n_spaces"]).alias("n_spaces"),
        F.expr(e["n_upper"]).alias("n_upper"),
    )
    return c.select(
        "doc_id", "n_chars", "n_letters", "n_digits", "n_spaces", "n_upper",
        F.expr(
            "CAST(n_chars - n_letters - n_digits - n_spaces AS BIGINT)"
        ).alias("n_other"),
        F.expr(
            "round(CAST(n_letters AS DOUBLE) / n_chars, 6)"
        ).alias("letter_ratio"),
        F.expr(
            "round(CAST(n_chars - n_letters - n_digits - n_spaces AS DOUBLE)"
            " / n_chars, 6)"
        ).alias("junk_ratio"),
    )


# ---------------------------------------------------------------------------
# char-trigram LM cross-entropy (the perplexity-filter proxy)
# ---------------------------------------------------------------------------

_LM_V = 27 ** 3  # [a-z ] alphabet -> bounded trigram vocabulary

_CLEAN_SPARK = "regexp_replace(lower(text), '[^a-z ]', '')"
_CLEAN_DUCK = "regexp_replace(lower(text), '[^a-z ]', '', 'g')"

# CASE guard: Spark's sequence(1, 0) yields the DESCENDING [1, 0] (two bogus
# trigrams for cleaned length <= 2) while DuckDB's range(1, 1) is empty, so
# short docs must short-circuit to an empty array on the Spark side.
_TRIS_SPARK = (
    f"CASE WHEN length({_CLEAN_SPARK}) >= 3 THEN "
    f"transform(sequence(1, length({_CLEAN_SPARK}) - 2), "
    f"i -> substr({_CLEAN_SPARK}, i, 3)) "
    f"ELSE CAST(array() AS array<string>) END"
)
_TRIS_DUCK = (
    f"list_transform(range(1, greatest(length({_CLEAN_DUCK}) - 1, 1)), "
    f"i -> substr({_CLEAN_DUCK}, i, 3))"
)


@register(
    "text_char_lm_perplexity",
    # no per-term rounding: Spark rounds doubles via the exact BigDecimal
    # expansion while DuckDB rounds via x*10^n, so rounded per-term logs
    # drift at ANY precision (observed at both 6dp and 4dp). Instead sum
    # raw doubles and round only the final per-doc outputs at 3dp — the
    # accumulated float error (~1e-12 over a few hundred terms) is nine
    # orders of magnitude inside the 5e-4 rounding-boundary window.
    oracle=f"""
    WITH tris AS (
      SELECT doc_id, unnest({_TRIS_DUCK}) AS tri FROM documents
    ),
    model AS (
      SELECT tri, CAST(COUNT(*) AS BIGINT) AS c FROM tris GROUP BY tri
    ),
    total AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM model),
    terms AS (
      SELECT tris.doc_id,
             log2(CAST(model.c + 1 AS DOUBLE) / (total.t + {_LM_V})) AS term
      FROM tris JOIN model USING (tri) CROSS JOIN total
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           round(-SUM(term) / COUNT(*), 3) AS cross_entropy_bits,
           round(pow(2, round(-SUM(term) / COUNT(*), 3)), 3) AS perplexity
    FROM terms GROUP BY doc_id
    """,
    doc="Char-trigram LM cross-entropy per document — the perplexity-"
        "filter proxy (CCNet-style: score every doc against a corpus-"
        "trained LM, drop the high-perplexity junk tail and the "
        "suspiciously-low boilerplate head). The model is the corpus's "
        "own add-1-smoothed trigram distribution: its vocabulary is "
        "BOUNDED at 27^3 regardless of corpus size, so the trained model "
        "broadcasts to every executor and scoring is one broadcast join "
        "over exploded trigrams — at 100 TB that is two passes (train "
        "aggregate, score scan) with no wide shuffle of document data. "
        "Raw log terms are summed and only the final per-doc outputs are "
        "rounded (3dp), so engine-level float drift never breaks the "
        "hash gate.",
)
def text_char_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tris = docs.select(
        "doc_id", F.explode(F.expr(_TRIS_SPARK)).alias("tri")
    )
    model = tris.groupBy("tri").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    )
    total = model.agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("t"))
    terms = (
        tris.join(F.broadcast(model), "tri")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                f"log2(CAST(c + 1 AS DOUBLE) / (t + {_LM_V}))"
            ).alias("term"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_trigrams"),
        F.expr(
            "round(-SUM(term) / COUNT(*), 3)"
        ).alias("cross_entropy_bits"),
        F.expr(
            "round(pow(2, round(-SUM(term) / COUNT(*), 3)), 3)"
        ).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed n-gram importance resampling)
# ---------------------------------------------------------------------------

#: hashed-feature dimensionality for the two unigram distributions — a
#: FIXED bucket space, so both trained models broadcast regardless of
#: corpus size (the DSIR design point: Xie et al. 2023, "Data Selection
#: for Language Models via Importance Resampling" — hashed n-gram bag
#: features make target/raw density estimation a pair of count vectors)
DSIR_DIM = 64

#: the "curated target" proxy on the synthetic corpus: English documents
#: (DSIR's canonical use targets a small high-quality corpus and scores
#: the big raw crawl against it)
_DSIR_TARGET = "lang = 'en'"


@register(
    "sample_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             CAST({md5_int32_duck('t')} % {DSIR_DIM} AS INT) AS bucket
      FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
      )
    ),
    tgt_docs AS (SELECT doc_id FROM documents WHERE {_DSIR_TARGET}),
    model AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS c_raw,
             CAST(COUNT(*) FILTER (
               WHERE doc_id IN (SELECT doc_id FROM tgt_docs)
             ) AS BIGINT) AS c_tgt
      FROM tok GROUP BY bucket
    ),
    totals AS (
      SELECT CAST(SUM(c_raw) AS BIGINT) AS t_raw,
             CAST(SUM(c_tgt) AS BIGINT) AS t_tgt
      FROM model
    ),
    scored AS (
      SELECT tok.doc_id,
             log2((CAST(model.c_tgt + 1 AS DOUBLE) / (totals.t_tgt + {DSIR_DIM}))
                  / (CAST(model.c_raw + 1 AS DOUBLE) / (totals.t_raw + {DSIR_DIM})))
               AS term
      FROM tok JOIN model USING (bucket) CROSS JOIN totals
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(SUM(term), 3) AS log2_weight,
           round(SUM(term) / COUNT(*), 4) AS log2_weight_per_token,
           CAST(max(CASE WHEN d.{_DSIR_TARGET}
                    THEN 1 ELSE 0 END) AS INT) AS in_target
    FROM scored s JOIN documents d USING (doc_id)
    GROUP BY s.doc_id
    """,
    doc=f"DSIR importance weights (Xie et al. 2023): score every raw doc "
        f"by how target-like its hashed-unigram bag is — log importance "
        f"weight = Σ_tokens log2(p_target(bucket) / p_raw(bucket)), with "
        f"add-1-smoothed {DSIR_DIM}-bucket hashed distributions trained "
        "on the corpus itself (target = English docs here). The selection "
        "signal behind quality-targeted pretraining-data sampling: rank "
        "by weight, sample ∝ exp(weight). Both models are FIXED-size "
        "count vectors → broadcast; scoring is one map-side pass over "
        "exploded tokens + a doc_id rollup — two shuffles total at any "
        "corpus size. Raw log terms are summed unrounded and only the "
        "final outputs round (3/4dp), per the module's float-drift rule.",
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id",
        F.explode(F.expr("split(lower(text), ' ')")).alias("t"),
    ).select(
        "doc_id",
        F.expr(f"CAST({md5_int32_spark('t')} % {DSIR_DIM} AS INT)").alias(
            "bucket"
        ),
    )
    tgt_ids = docs.filter(F.expr(_DSIR_TARGET)).select("doc_id")
    model = (
        tok.join(F.broadcast(tgt_ids.withColumn("is_tgt", F.lit(1))),
                 "doc_id", "left")
        .groupBy("bucket")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("c_raw"),
            F.expr("CAST(COUNT(is_tgt) AS BIGINT)").alias("c_tgt"),
        )
    )
    totals = model.agg(
        F.expr("CAST(SUM(c_raw) AS BIGINT)").alias("t_raw"),
        F.expr("CAST(SUM(c_tgt) AS BIGINT)").alias("t_tgt"),
    )
    scored = (
        tok.join(F.broadcast(model), "bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.expr(
                f"log2((CAST(c_tgt + 1 AS DOUBLE) / (t_tgt + {DSIR_DIM}))"
                f" / (CAST(c_raw + 1 AS DOUBLE) / (t_raw + {DSIR_DIM})))"
            ).alias("term"),
        )
    )
    flags = docs.select(
        "doc_id",
        F.expr(
            f"CAST(CASE WHEN {_DSIR_TARGET} THEN 1 ELSE 0 END AS INT)"
        ).alias("in_target"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tokens"),
            F.expr("round(SUM(term), 3)").alias("log2_weight"),
            F.expr("round(SUM(term) / COUNT(*), 4)").alias(
                "log2_weight_per_token"
            ),
        )
        .join(flags, "doc_id")
        .select("doc_id", "n_tokens", "log2_weight",
                "log2_weight_per_token", "in_target")
    )


# ---------------------------------------------------------------------------
# DoReMi-style source reweighting (Xie et al. 2023, "DoReMi: Optimizing
# Data Mixtures Speeds Up Language Model Pretraining")
# ---------------------------------------------------------------------------

DOREMI_ROUNDS = 8
#: weights carried as exact parts-per-million BIGINTs — the whole
#: multiplicative-weights iteration is integer arithmetic, so the two
#: engines agree bit-for-bit with no float-summation-order risk
DOREMI_SCALE = 1_000_000
#: final smoothing with the uniform mix, c = 0.1 (DoReMi eq. 3's
#: (1-c)*alpha + c*u), as (9*w + uniform) // 10
DOREMI_SMOOTH_NUM = 9


def _doremi_ctes() -> str:
    """Unrolled multiplicative-weights rounds as plain CTE stages.

    Round t: mixture loss L̄ = Σ_s w_s·loss_s (exact integer dot product
    at ppm scale), per-source excess = loss_s − L̄, update
    w_s ← w_s·(SCALE + excess) then renormalize to Σ = SCALE by integer
    division. The update factor is the LINEAR Hedge surrogate
    (1 + η·excess, η = 1) instead of DoReMi's exp(η·excess): exp() is
    libm-dependent and would break the cross-engine hash gate, and with
    per-round normalization the linear update is the same
    mirror-descent step to first order. All divisions have non-negative
    operands, so DuckDB ``//`` and Spark ``div`` agree."""
    head = f"""
    WITH db AS (
      SELECT source, unnest({BIGRAMS_DUCK}) AS bg FROM documents
    ),
    known AS (
      SELECT bg FROM db GROUP BY bg HAVING COUNT(*) >= {LM_COV_MIN_COUNT}
    ),
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(COUNT(*) FILTER (WHERE bg IN (SELECT bg FROM known))
                  AS BIGINT) AS n_known
      FROM db GROUP BY source
    ),
    w0 AS (
      SELECT source, n_bigrams, n_known,
             ((n_bigrams - n_known) * {DOREMI_SCALE})
               // greatest(n_bigrams, 1) AS loss_ppm,
             CAST(COUNT(*) OVER () AS BIGINT) AS s_n,
             CAST({DOREMI_SCALE} AS BIGINT)
               // (CAST(COUNT(*) OVER () AS BIGINT)) AS w
      FROM per_src
    )"""
    stages = []
    for t in range(1, DOREMI_ROUNDS + 1):
        p = t - 1
        stages.append(f""",
    u{t} AS (
      SELECT source, n_bigrams, n_known, loss_ppm, s_n,
             w * ({DOREMI_SCALE} + loss_ppm
                  - (SUM(w * loss_ppm) OVER ()) // {DOREMI_SCALE}) AS u
      FROM w{p}
    ),
    w{t} AS (
      SELECT source, n_bigrams, n_known, loss_ppm, s_n,
             (u * {DOREMI_SCALE}) // (SUM(u) OVER ()) AS w
      FROM u{t}
    )""")
    final = f""",
    doremi AS (
      SELECT source, n_bigrams, n_known,
             CAST(loss_ppm AS BIGINT) AS loss_ppm,
             CAST(({DOREMI_SMOOTH_NUM} * w + {DOREMI_SCALE} // s_n) // 10
                  AS BIGINT) AS weight_ppm
      FROM w{DOREMI_ROUNDS}
    )"""
    return head + "".join(stages) + final


def _doremi_oracle() -> str:
    return _doremi_ctes() + f"""
    SELECT source, n_bigrams, n_known, loss_ppm, weight_ppm,
           round(CAST(weight_ppm AS DOUBLE) / {DOREMI_SCALE}, 6) AS weight
    FROM doremi"""


@register(
    "sample_doremi_weights",
    bench=True,
    oracle=_doremi_oracle(),
    doc=f"DoReMi-style source reweighting (Xie et al. 2023): per-source "
        "mixture weights from the excess of a cheap proxy loss over the "
        "current-mix baseline, multiplicative-weights updated for "
        f"{DOREMI_ROUNDS} unrolled rounds and smoothed 9:1 with the "
        "uniform mix — the excess-loss reweighting loop modern "
        "pretraining mixes use, completing the mixing family next to "
        "temperature (mC4), DSIR, dedup-aware, and token-budget "
        "planning. Proxy loss per source = 1 − bigram-LM coverage "
        "(sample of text_lm_coverage's machinery: fraction of bigrams "
        f"the corpus saw ≥{LM_COV_MIN_COUNT}×), exactly rational as "
        "integer ppm ((n_big−n_known)·1e6 div n_big); each round "
        "computes the mixture loss as an integer dot product, updates "
        "w ← w·(1 + excess) — the LINEAR Hedge surrogate for "
        "DoReMi's exp step, because exp() is libm-dependent and would "
        "break the cross-engine hash gate — and renormalizes by integer "
        "division (all operands non-negative, so Spark div and DuckDB "
        "// agree). Sources whose docs are harder than the evolving "
        "mixture average gain weight, exactly DoReMi's Group-DRO "
        "direction. Scale shape: ONE corpus bigram explode feeds both "
        "the known-set build and the per-source rollup (the "
        "text_lm_coverage pattern); the K-round iteration then runs "
        "over the bounded per-source frame via global windows — "
        "single-partition by construction, over ~dozens of rows "
        "regardless of corpus size.",
)
def sample_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    # ONE corpus bigram explode in ONE LINEAR pipeline (round 15): the
    # former shape fed the raw explode into two consumers (the known-set
    # census and the per-source rollup), paying the corpus pass twice.
    # Aggregate to (source, bigram) grain first (map-side partials
    # collapse the exchange to ~|distinct bigrams| x |sources| rows),
    # then attach each bigram's GLOBAL count by re-aggregating that
    # small grain table and joining back on the bigram key. A first cut
    # used a bigram-partitioned window instead — but a window cannot do
    # partial aggregation and must SORT its partition, so its cost
    # tracked the shuffle-partition count (1.15 s at 256 initial
    # partitions, 2.0 s at the 32 default, isolated A/B); the
    # aggregate-join shape hits the vocabulary-grain rollup with
    # map-side partials and lets AQE broadcast the per-bigram counts,
    # which removes the partition sensitivity outright.
    bs = docs.select(
        "source", F.explode(F.expr(BIGRAMS_SPARK)).alias("bg")
    ).groupBy("source", "bg").agg(F.count(F.lit(1)).alias("c"))
    bg_tot = bs.groupBy("bg").agg(F.sum("c").alias("ct"))
    bs = bs.join(bg_tot, "bg")
    per_src = bs.groupBy("source").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_bigrams"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN ct >= {LM_COV_MIN_COUNT} "
            "THEN c END), 0) AS BIGINT)"
        ).alias("n_known"),
    )
    w = per_src.selectExpr(
        "source", "n_bigrams", "n_known",
        f"((n_bigrams - n_known) * {DOREMI_SCALE})"
        " div greatest(n_bigrams, 1) AS loss_ppm",
        "CAST(COUNT(*) OVER () AS BIGINT) AS s_n",
    ).selectExpr(
        "*", f"CAST({DOREMI_SCALE} AS BIGINT) div s_n AS w"
    )
    for _ in range(DOREMI_ROUNDS):
        w = w.selectExpr(
            "source", "n_bigrams", "n_known", "loss_ppm", "s_n",
            f"w * ({DOREMI_SCALE} + loss_ppm"
            f" - (SUM(w * loss_ppm) OVER ()) div {DOREMI_SCALE}) AS u",
        ).selectExpr(
            "source", "n_bigrams", "n_known", "loss_ppm", "s_n",
            f"(u * {DOREMI_SCALE}) div (SUM(u) OVER ()) AS w",
        )
    return w.selectExpr(
        "source", "n_bigrams", "n_known",
        "CAST(loss_ppm AS BIGINT) AS loss_ppm",
        f"CAST(({DOREMI_SMOOTH_NUM} * w + {DOREMI_SCALE} div s_n) div 10"
        " AS BIGINT) AS weight_ppm",
        f"round(CAST(({DOREMI_SMOOTH_NUM} * w + {DOREMI_SCALE} div s_n)"
        f" div 10 AS DOUBLE) / {DOREMI_SCALE}, 6) AS weight",
    )


@register(
    "sample_doremi_mix_plan",
    oracle=_doremi_ctes() + f""",
    census AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM census),
    plan AS (
      SELECT c.source, c.n_docs, d.weight_ppm,
             (d.weight_ppm * t.total_docs) // {DOREMI_SCALE} AS target_docs,
             least({DOREMI_SCALE},
                   ((d.weight_ppm * t.total_docs) // {DOREMI_SCALE})
                     * {DOREMI_SCALE} // c.n_docs) AS keep_thr_ppm
      FROM census c JOIN doremi d USING (source) CROSS JOIN tot t
    )
    SELECT p.source, p.n_docs, p.weight_ppm,
           CAST(p.target_docs AS BIGINT) AS target_docs,
           CAST(p.keep_thr_ppm AS BIGINT) AS keep_thr_ppm,
           CAST(COUNT(*) FILTER (
             WHERE {md5_int32_duck("concat('doremi:', doc_id)")}
                   % {DOREMI_SCALE} < p.keep_thr_ppm
           ) AS BIGINT) AS docs_kept
    FROM plan p JOIN documents dd USING (source)
    GROUP BY p.source, p.n_docs, p.weight_ppm, p.target_docs, p.keep_thr_ppm
    """,
    doc="The DoReMi weights made ACTIONABLE: a per-source resampling "
        "plan at constant corpus size — target_docs = weight × total "
        "(exact ppm integer arithmetic), keep threshold = target/n_docs "
        "capped at 1.0, then the actual deterministic keep decision per "
        "document with the same salted-hash rule the other mixing "
        "operators use (stable under re-runs and appends; "
        "sample_source_mix / sample_temperature_mix pattern), reported "
        "as docs_kept per source against the target. Upweighted sources "
        "saturate at keep-all (a weight above natural share needs "
        "EPOCHS, not subsampling — the cap makes that visible as "
        "docs_kept = n_docs < target_docs); downweighted sources are "
        "thinned deterministically. Scale shape: the doremi iteration's "
        "tiny per-source frame broadcast-joins the corpus census; the "
        "per-doc keep test is a zero-shuffle map folded into one "
        "source-grain rollup.",
    bench=True,
)
def sample_doremi_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    weights = sample_doremi_weights(spark, sf_dir).select(
        "source", "weight_ppm"
    )
    census = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = census.agg(F.sum("n_docs").cast("bigint").alias("total_docs"))
    plan = (
        census.join(F.broadcast(weights), "source")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "source", "n_docs", "weight_ppm",
            f"(weight_ppm * total_docs) div {DOREMI_SCALE} AS target_docs",
            f"least(CAST({DOREMI_SCALE} AS BIGINT), "
            f"((weight_ppm * total_docs) div {DOREMI_SCALE})"
            f" * {DOREMI_SCALE} div n_docs) AS keep_thr_ppm",
        )
    )
    keep = md5_int32_spark("concat('doremi:', doc_id)")
    return (
        docs.select("source", "doc_id")
        .join(F.broadcast(plan), "source")
        .groupBy("source", "n_docs", "weight_ppm", "target_docs",
                 "keep_thr_ppm")
        .agg(
            F.expr(
                f"CAST(COUNT(CASE WHEN {keep} % {DOREMI_SCALE}"
                " < keep_thr_ppm THEN 1 END) AS BIGINT)"
            ).alias("docs_kept")
        )
        .select(
            "source", "n_docs", "weight_ppm",
            F.col("target_docs").cast("bigint").alias("target_docs"),
            F.col("keep_thr_ppm").cast("bigint").alias("keep_thr_ppm"),
            "docs_kept",
        )
    )


# ---------------------------------------------------------------------------
# context-length packing-efficiency curve (pretraining batch planning)
# ---------------------------------------------------------------------------

PACK_EFF_LENGTHS = (256, 512, 1024, 2048)


@register(
    "sample_packing_efficiency",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    lens AS (SELECT unnest(ARRAY{list(PACK_EFF_LENGTHS)}) AS seq_len)
    SELECT CAST(seq_len AS INT) AS seq_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM((n_tokens + seq_len - 1) // seq_len) AS BIGINT)
             AS padded_seqs,
           CAST(SUM((n_tokens + seq_len - 1) // seq_len * seq_len
                    - n_tokens) AS BIGINT) AS padded_waste,
           round(CAST(SUM((n_tokens + seq_len - 1) // seq_len * seq_len
                          - n_tokens) AS DOUBLE)
                 / SUM((n_tokens + seq_len - 1) // seq_len * seq_len), 6)
             AS waste_ratio,
           CAST((SUM(n_tokens) + seq_len - 1) // seq_len AS BIGINT)
             AS packed_seqs
    FROM sized CROSS JOIN lens
    GROUP BY seq_len ORDER BY seq_len
    """,
    doc=f"Context-length packing-efficiency curve over "
        f"{PACK_EFF_LENGTHS}: for each candidate training sequence "
        "length, the pad-every-doc-to-L cost (padded_seqs, padded_waste, "
        "waste_ratio) vs the perfect-concat-packing floor (packed_seqs). "
        "The table behind choosing a context length and a packing "
        "strategy before a pretraining run — waste_ratio at short L and "
        "the padded/packed gap at long L quantify what document-aware "
        "packing buys. Pure closed-form integer math from per-doc token "
        "counts; one scan, a 4-way explode of a constant array, and a "
        "4-group aggregate — nothing here grows with corpus size except "
        "the scan.",
)
def sample_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    sized = docs.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tokens"),
    )
    lens = F.array(*[F.lit(n) for n in PACK_EFF_LENGTHS])
    exploded = sized.select(
        "n_tokens", F.explode(lens).alias("seq_len")
    )
    # integer ceil, not float: (n + L - 1) div L
    ceil_seqs = "((n_tokens + seq_len - 1) DIV seq_len)"
    return (
        exploded.groupBy(F.col("seq_len").cast("int").alias("seq_len"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(SUM(n_tokens) AS BIGINT)").alias("total_tokens"),
            F.expr(f"CAST(SUM({ceil_seqs}) AS BIGINT)").alias("padded_seqs"),
            F.expr(
                f"CAST(SUM({ceil_seqs} * seq_len - n_tokens) AS BIGINT)"
            ).alias("padded_waste"),
            F.expr(
                f"round(CAST(SUM({ceil_seqs} * seq_len - n_tokens) AS DOUBLE)"
                f" / SUM({ceil_seqs} * seq_len), 6)"
            ).alias("waste_ratio"),
            F.expr(
                "CAST((SUM(n_tokens) + FIRST(seq_len) - 1)"
                " DIV FIRST(seq_len) AS BIGINT)"
            ).alias("packed_seqs"),
        )
        .orderBy("seq_len")
    )


# ---------------------------------------------------------------------------
# mojibake / encoding-damage score (ftfy-style corpus hygiene signal)
# ---------------------------------------------------------------------------

#: classic UTF-8-read-as-Latin-1 damage markers (the ftfy repertoire):
#: 'Ã' starts every mangled two-byte sequence, 'â€' every mangled
#: punctuation triple, 'Â' precedes mangled NBSP/degree signs, and
#: U+FFFD is the decoder's own white flag
_MOJIBAKE_MARKERS = ("Ã", "â€", "Â", "�")


def _count_expr(marker: str) -> str:
    """Occurrence count of ``marker`` via length delta — the identical
    expression works in both engines (length() counts characters and
    replace() is plain substring replace in each)."""
    esc = marker.replace("'", "''")
    span = len(marker)
    if span == 1:
        return f"(length(text) - length(replace(text, '{esc}', '')))"
    return (
        f"((length(text) - length(replace(text, '{esc}', ''))) / {span})"
    )


@register(
    "text_mojibake_score",
    oracle=f"""
    SELECT doc_id, lang,
           CAST({' + '.join(_count_expr(m) for m in _MOJIBAKE_MARKERS)}
                AS BIGINT) AS n_mojibake,
           CAST(length(text)
                - length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))
                AS BIGINT) AS n_non_ascii,
           round(CAST(length(text)
                      - length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))
                      AS DOUBLE) / length(text), 6) AS non_ascii_ratio,
           CAST(CASE WHEN {' + '.join(_count_expr(m) for m in _MOJIBAKE_MARKERS)} > 0
                THEN 1 ELSE 0 END AS INT) AS suspect
    FROM documents
    """,
    doc="Encoding-damage (mojibake) score, ftfy-style: counts the "
        "canonical UTF-8-read-as-Latin-1 markers ('Ã', 'â€', 'Â', "
        "U+FFFD) plus the non-ASCII character ratio per document — the "
        "corpus-hygiene triage that separates double-encoded crawl junk "
        "from legitimately non-Latin text (a zh doc has high "
        "non_ascii_ratio and zero markers; a mangled en doc has both). "
        "Pure per-row codegen string math; zero shuffles — at 100 TB "
        "this is an IO-bound scan that rides along any other pass.",
)
def text_mojibake_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    moji = " + ".join(_count_expr(m) for m in _MOJIBAKE_MARKERS)
    return docs.select(
        "doc_id", "lang",
        F.expr(f"CAST({moji} AS BIGINT)").alias("n_mojibake"),
        F.expr(
            "CAST(length(text)"
            " - length(regexp_replace(text, '[\\\\x00-\\\\x7F]', ''))"
            " AS BIGINT)"
        ).alias("n_non_ascii"),
        F.expr(
            "round(CAST(length(text)"
            " - length(regexp_replace(text, '[\\\\x00-\\\\x7F]', ''))"
            " AS DOUBLE) / length(text), 6)"
        ).alias("non_ascii_ratio"),
        F.expr(
            f"CAST(CASE WHEN {moji} > 0 THEN 1 ELSE 0 END AS INT)"
        ).alias("suspect"),
    )


# ---------------------------------------------------------------------------
# shared-affix boilerplate (identical doc heads/tails across a source)
# ---------------------------------------------------------------------------

AFFIX_TOKENS = 8     # tokens compared at each end
AFFIX_MIN_DOCS = 3   # docs sharing an affix to call it boilerplate

_PREFIX_SPARK = (
    f"array_join(slice({TOKS_SPARK}, 1, {AFFIX_TOKENS}), ' ')"
)
_SUFFIX_SPARK = (
    f"array_join(slice({TOKS_SPARK}, -{AFFIX_TOKENS}, {AFFIX_TOKENS}), ' ')"
)
_PREFIX_DUCK = (
    f"array_to_string(list_slice({TOKS_DUCK}, 1, {AFFIX_TOKENS}), ' ')"
)
_SUFFIX_DUCK = (
    f"array_to_string(list_slice({TOKS_DUCK}, -{AFFIX_TOKENS}, -1), ' ')"
)


@register(
    "text_affix_boilerplate",
    oracle=f"""
    WITH affixed AS (
      SELECT doc_id, source,
             {_PREFIX_DUCK} AS head,
             {_SUFFIX_DUCK} AS tail
      FROM documents
      WHERE len({TOKS_DUCK}) >= {AFFIX_TOKENS}
    ),
    heads AS (
      SELECT head, COUNT(*) AS n FROM affixed GROUP BY head
    ),
    tails AS (
      SELECT tail, COUNT(*) AS n FROM affixed GROUP BY tail
    )
    SELECT a.doc_id, a.source,
           CAST(CASE WHEN h.n >= {AFFIX_MIN_DOCS} THEN 1 ELSE 0 END AS INT)
             AS head_boiler,
           CAST(CASE WHEN t.n >= {AFFIX_MIN_DOCS} THEN 1 ELSE 0 END AS INT)
             AS tail_boiler,
           CAST(h.n AS BIGINT) AS head_docs,
           CAST(t.n AS BIGINT) AS tail_docs
    FROM affixed a
    JOIN heads h ON h.head = a.head
    JOIN tails t ON t.tail = a.tail
    """,
    doc=f"Shared-affix boilerplate detection: a document HEAD or TAIL "
        f"({AFFIX_TOKENS} tokens) repeated across ≥ {AFFIX_MIN_DOCS} "
        "documents is template chrome (site headers, footers, license "
        "blocks) — the doc-level complement of the per-line "
        "text_boilerplate_lines rule, and the cheap first cut at "
        "template-families detection. Two map-side-combined affix "
        "frequency aggregates plus two joins keyed on the affix string; "
        "the affix is a FIXED-token prefix so key length is bounded and "
        "a hot template affix is the standard AQE skew-split shape.",
)
def text_affix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    affixed = docs.filter(
        F.expr(f"size({TOKS_SPARK}) >= {AFFIX_TOKENS}")
    ).select(
        "doc_id", "source",
        F.expr(_PREFIX_SPARK).alias("head"),
        F.expr(_SUFFIX_SPARK).alias("tail"),
    )
    heads = affixed.groupBy("head").agg(F.expr("COUNT(*)").alias("hn"))
    tails = affixed.groupBy("tail").agg(F.expr("COUNT(*)").alias("tn"))
    return (
        affixed.join(heads, "head")
        .join(tails, "tail")
        .select(
            "doc_id", "source",
            F.expr(
                f"CAST(CASE WHEN hn >= {AFFIX_MIN_DOCS} THEN 1 ELSE 0 END"
                " AS INT)"
            ).alias("head_boiler"),
            F.expr(
                f"CAST(CASE WHEN tn >= {AFFIX_MIN_DOCS} THEN 1 ELSE 0 END"
                " AS INT)"
            ).alias("tail_boiler"),
            F.expr("CAST(hn AS BIGINT)").alias("head_docs"),
            F.expr("CAST(tn AS BIGINT)").alias("tail_docs"),
        )
    )


# ---------------------------------------------------------------------------
# mergeable log-binned quantile sketch (the re-aggregatable p50/p90/p99)
# ---------------------------------------------------------------------------

#: quarter-octave bins: bin = floor(log2(x) * 4) — relative value error
#: within a bin is bounded at 2^(1/4) ≈ 19%, and the sketch is a plain
#: (bin → count) map, so daily sub-sketches MERGE by adding counts (the
#: property exact quantiles lack: a p99 of p99s is meaningless, a summed
#: bin histogram re-yields the true sketch)
_QBIN_SPARK = "CAST(FLOOR(log2(CAST(n_chars AS DOUBLE)) * 4) AS INT)"
_QBIN_DUCK = "CAST(FLOOR(log2(CAST(n_chars AS DOUBLE)) * 4) AS INT)"


@register(
    "sketch_logbin_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT source, {_QBIN_DUCK} AS bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, bin
    ),
    w AS (
      SELECT source, bin, c,
             SUM(c) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY source) AS tot
      FROM b
    )
    SELECT source,
           CAST(MAX(tot) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN cum >= CEIL(0.50 * tot) THEN bin END) AS INT)
             AS p50_bin,
           CAST(MIN(CASE WHEN cum >= CEIL(0.90 * tot) THEN bin END) AS INT)
             AS p90_bin,
           CAST(MIN(CASE WHEN cum >= CEIL(0.99 * tot) THEN bin END) AS INT)
             AS p99_bin,
           CAST(COUNT(*) AS BIGINT) AS sketch_bins
    FROM w GROUP BY source
    """,
    doc="Mergeable log-binned quantile sketch over document lengths per "
        "source: quarter-octave bins (relative error ≤ 2^(1/4)) whose "
        "(bin → count) map MERGES by addition — the re-aggregation "
        "property exact quantiles lack, so daily per-source sketches "
        "roll up to weekly/corpus sketches without re-scanning (same "
        "discipline as sketch_kmv_user_rollup). p50/p90/p99 read off "
        "the cumulative histogram as integer bin ids (gate-stable). "
        "One map-side-combined shuffle on (source, bin); sketch size is "
        "bounded by the bin range regardless of corpus size.",
)
def sketch_logbin_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    b = docs.select(
        "source", F.expr(_QBIN_SPARK).alias("bin")
    ).groupBy("source", "bin").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    )
    w_cum = (
        Window.partitionBy("source").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("source")
    wdf = b.select(
        "source", "bin", "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("tot"),
    )
    def qbin(q: float, alias: str):
        return F.expr(
            f"CAST(MIN(CASE WHEN cum >= CEIL({q} * tot) THEN bin END)"
            " AS INT)"
        ).alias(alias)

    return wdf.groupBy("source").agg(
        F.expr("CAST(MAX(tot) AS BIGINT)").alias("n_docs"),
        qbin(0.50, "p50_bin"),
        qbin(0.90, "p90_bin"),
        qbin(0.99, "p99_bin"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("sketch_bins"),
    )


# ---------------------------------------------------------------------------
# HLL union proof (sub-sketches merge to the direct global sketch)
# ---------------------------------------------------------------------------

_HLL_LZ_DUCK = "length(regexp_extract(substr(hx, 3, 13), '^0*'))"
_HLL_DIG_DUCK = f"substr(hx, 3 + {_HLL_LZ_DUCK}, 1)"
_HLL_LZ_SPARK = "length(regexp_extract(substr(hx, 3, 13), '^0*', 0))"
_HLL_DIG_SPARK = f"substr(hx, 3 + {_HLL_LZ_SPARK}, 1)"

_HLL_EST = (
    f"round({HLL_NUM} / (CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT)"
    f" + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 53)), 4)"
)


@register(
    "sketch_hll_union",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT source, md5(unnest({SHINGLES_DUCK_LOWER})) AS hx
      FROM documents
    ),
    sub AS (
      SELECT source, ('0x' || substr(hx, 1, 2))::BIGINT AS idx,
             MAX({_hll_rho(_HLL_LZ_DUCK, _HLL_DIG_DUCK)}) AS m
      FROM h GROUP BY source, idx
    ),
    merged AS (SELECT idx, MAX(m) AS m FROM sub GROUP BY idx),
    direct AS (
      SELECT idx, MAX(m) AS m FROM (
        SELECT DISTINCT ('0x' || substr(hx, 1, 2))::BIGINT AS idx,
               {_hll_rho(_HLL_LZ_DUCK, _HLL_DIG_DUCK)} AS m
        FROM h
      ) t GROUP BY idx
    ),
    em AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS registers_hit, {_HLL_EST} AS est
      FROM merged
    ),
    ed AS (SELECT {_HLL_EST} AS est FROM direct),
    ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM h)
    SELECT ns.n_sources, em.registers_hit,
           em.est AS est_merged, ed.est AS est_direct,
           CAST(CASE WHEN em.est = ed.est THEN 1 ELSE 0 END AS INT)
             AS merged_equals_direct
    FROM em CROSS JOIN ed CROSS JOIN ns
    """,
    doc=f"HLL union proof: per-source HLL({HLL_M}) sub-sketches merged by "
        "per-register MAX must yield EXACTLY the sketch built from the "
        "whole corpus directly — the lattice property that lets a fleet "
        "sketch shards independently and union the 256-register maps at "
        "the coordinator (same discipline as the KMV weekly rollup). The "
        "hash gate pins merged_equals_direct = 1 in both engines. At "
        "100 TB the merge step moves sources × 256 registers, never "
        "shingles.",
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    h = (
        docs.select("source", F.explode(F.expr(SHINGLES_SPARK_LOWER)).alias("s"))
        .select("source", F.expr("md5(s)").alias("hx"))
        .distinct()
    )
    rho = _hll_rho(_HLL_LZ_SPARK, _HLL_DIG_SPARK)
    idx = "CAST(conv(substr(hx, 1, 2), 16, 10) AS BIGINT)"
    sub = h.select(
        "source", F.expr(idx).alias("idx"), F.expr(rho).alias("rho")
    ).groupBy("source", "idx").agg(F.expr("MAX(rho)").alias("m"))
    merged = sub.groupBy("idx").agg(F.expr("MAX(m)").alias("m"))
    direct = (
        h.select(F.expr(idx).alias("idx"), F.expr(rho).alias("rho"))
        .distinct()
        .groupBy("idx").agg(F.expr("MAX(rho)").alias("m"))
    )
    em = merged.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("registers_hit"),
        F.expr(_HLL_EST).alias("est_merged"),
    )
    ed = direct.agg(F.expr(_HLL_EST).alias("est_direct"))
    ns = h.agg(
        F.expr("CAST(COUNT(DISTINCT source) AS BIGINT)").alias("n_sources")
    )
    return (
        em.crossJoin(F.broadcast(ed))
        .crossJoin(F.broadcast(ns))
        .select(
            "n_sources", "registers_hit", "est_merged", "est_direct",
            F.expr(
                "CAST(CASE WHEN est_merged = est_direct THEN 1 ELSE 0 END"
                " AS INT)"
            ).alias("merged_equals_direct"),
        )
    )


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram language model
# ---------------------------------------------------------------------------

KN_DISCOUNT = "0.75"  # binary-exact literal (3/4) — safe in both engines
KN_TOP_K = 20

#: identical expression text in Spark SQL and DuckDB: one fixed tree of
#: integer-exact inputs (c, total, n_follow, n_prec, b_types) with three
#: double divisions — no cross-row float accumulation, no libm
_KN_PROB = (
    f"round(greatest(CAST(c AS DOUBLE) - {KN_DISCOUNT}, CAST(0 AS DOUBLE))"
    " / total"
    f" + ({KN_DISCOUNT} * n_follow / total)"
    " * (CAST(n_prec AS DOUBLE) / b_types), 6)"
)


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    bigrams AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(range(1, len(ts))) AS u(i)
    ),
    counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bigrams GROUP BY w1, w2
    ),
    ctx AS (
      SELECT w1, CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_follow
      FROM counts GROUP BY w1
    ),
    cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_prec
      FROM counts GROUP BY w2
    ),
    btypes AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_types FROM counts),
    scored AS (
      SELECT counts.w1, counts.w2, c, total, n_follow, n_prec,
             {_KN_PROB} AS p_kn
      FROM counts
      JOIN ctx ON ctx.w1 = counts.w1
      JOIN cont ON cont.w2 = counts.w2
      CROSS JOIN btypes
    )
    SELECT w1, w2, c AS c_bigram, total AS c_context, n_follow, n_prec,
           p_kn,
           ROW_NUMBER() OVER (ORDER BY c DESC, w1, w2) AS rk
    FROM (
      SELECT * FROM scored ORDER BY c DESC, w1, w2 LIMIT {KN_TOP_K}
    ) t
    """,
    doc=f"Interpolated Kneser-Ney bigram LM (discount d = 0.75): "
        "P(w2|w1) = max(c - d, 0)/c(w1) + d*N1+(w1,.)/c(w1) * "
        "N1+(.,w2)/|bigram types| — the absolute-discount backoff whose "
        "continuation count (how many DISTINCT contexts a word follows) "
        "famously fixes the 'san francisco' pathology of raw-frequency "
        f"backoff. Reported for the {KN_TOP_K} most frequent bigrams "
        "with all count components. Complements text_bigram_lm (MLE "
        "next-token table) and text_char_lm_perplexity (char-level "
        "scoring). The discount 0.75 is a binary-exact literal and every "
        "other input is an exact BIGINT, so the three-division smoothing "
        "expression is bit-deterministic across engines. Scale shape: "
        "all four count tables derive from ONE map-side-combinable "
        "(w1,w2) aggregate; the type total is a 1-row broadcast; "
        "selection is a distributed TakeOrdered top-k.",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    bigrams = docs.select(
        F.explode(
            F.expr(
                "zip_with(slice(split(lower(text), ' '), 1, "
                "size(split(lower(text), ' ')) - 1), "
                "slice(split(lower(text), ' '), 2, "
                "size(split(lower(text), ' ')) - 1), "
                "(x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    counts = bigrams.groupBy("w1", "w2").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    )
    ctx = counts.groupBy("w1").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("total"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_follow"),
    )
    cont = counts.groupBy("w2").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_prec")
    )
    btypes = counts.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("b_types")
    )
    scored = (
        counts.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            "w1", "w2", "c", "total", "n_follow", "n_prec",
            F.expr(_KN_PROB).alias("p_kn"),
        )
    )
    order = [F.desc("c"), F.asc("w1"), F.asc("w2")]
    top = scored.orderBy(*order).limit(KN_TOP_K)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(
            "w1", "w2",
            F.col("c").alias("c_bigram"),
            F.col("total").alias("c_context"),
            "n_follow", "n_prec", "p_kn", "rk",
        )
    )


# ---------------------------------------------------------------------------
# cumulative vocabulary coverage (how far the head of Zipf carries you)
# ---------------------------------------------------------------------------

COVERAGE_TOP_K = 50


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM toks GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS n_total FROM counts),
    topk AS (
      SELECT token, n_occurrences
      FROM counts
      ORDER BY n_occurrences DESC, token
      LIMIT {COVERAGE_TOP_K}
    )
    SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
           token, n_occurrences,
           CAST(SUM(n_occurrences) OVER w AS BIGINT) AS cum_occurrences,
           round(CAST(SUM(n_occurrences) OVER w AS DOUBLE) / tot.n_total, 6)
             AS cum_share
    FROM topk CROSS JOIN tot
    WINDOW w AS (ORDER BY n_occurrences DESC, token)
    """,
    doc=f"Cumulative corpus coverage of the top-{COVERAGE_TOP_K} "
        "vocabulary types — the Zipf-head profile behind tokenizer and "
        "stopword decisions (how much of the token mass the first k "
        "types absorb; a too-steep curve flags boilerplate, a too-flat "
        "one flags mojibake or shredded tokenization). Counts are exact "
        "BIGINTs; the cumulative window runs over the k retrieved rows "
        "only (distributed TakeOrdered precedes it, the "
        "sample_weighted_topk pattern), and each cum_share is a single "
        "integer division rounded per row — nothing order-sensitive "
        "anywhere.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_occurrences"))
    )
    tot = counts.agg(
        F.expr("CAST(SUM(n_occurrences) AS BIGINT)").alias("n_total")
    )
    topk = counts.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(COVERAGE_TOP_K)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        topk.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).cast("bigint").alias("rk"),
            "token", "n_occurrences",
            F.sum("n_occurrences").over(w).cast("bigint").alias(
                "cum_occurrences"),
            "n_total",
        )
        .select(
            "rk", "token", "n_occurrences", "cum_occurrences",
            F.expr(
                "round(CAST(cum_occurrences AS DOUBLE) / n_total, 6)"
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# CMS inner-product estimate (join-size / distribution-affinity between
# sources from their mergeable sketches alone)
# ---------------------------------------------------------------------------

@register(
    "sketch_cms_inner_product",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    counts AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, token
    ),
    exact AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(a.c * b.c) AS BIGINT) AS exact_inner
      FROM counts a JOIN counts b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    ),
    cells AS (
      SELECT source, d,
             CASE {' '.join(f"WHEN d = {d} THEN {_cms_bucket_duck(d)}"
                            for d in range(CMS_DEPTH))}
             END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) ds
      GROUP BY 1, 2, 3
    ),
    dots AS (
      SELECT a.source AS source_a, b.source AS source_b, a.d,
             CAST(SUM(a.c * b.c) AS BIGINT) AS dot_d
      FROM cells a JOIN cells b
        ON a.d = b.d AND a.bucket = b.bucket AND a.source < b.source
      GROUP BY 1, 2, 3
    ),
    est AS (
      SELECT source_a, source_b, CAST(MIN(dot_d) AS BIGINT) AS cms_estimate
      FROM dots GROUP BY 1, 2
    )
    SELECT e.source_a, e.source_b, x.exact_inner, e.cms_estimate,
           round(CAST(e.cms_estimate AS DOUBLE) / x.exact_inner, 6)
             AS overestimate_ratio
    FROM est e JOIN exact x
      ON x.source_a = e.source_a AND x.source_b = e.source_b
    """,
    doc=f"Count-min inner-product estimation between every source pair's "
        "token-frequency vectors: est = min over the {CMS_DEPTH} rows of "
        "the cell-wise sketch dot product — the classic sketch-only "
        "join-size / distribution-affinity estimator (AMS/CMS): two "
        "corpora can be compared from their "
        f"{CMS_DEPTH}×{CMS_WIDTH}-cell sketches without ever co-locating "
        "their tokens, which is the whole point at 100 TB (ship "
        "kilobytes, not corpora). The exact inner product rides along "
        "as ground truth, and min-row estimates are provably >= exact "
        "(pinned by the ratio column). Everything is exact integer "
        "arithmetic on deterministic md5 buckets; sketch cells merge "
        "cell-wise across partitions (map-side combine).",
)
def sketch_cms_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    counts = toks.groupBy("source", "token").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    )
    ca = counts.select(
        F.col("source").alias("source_a"), "token", F.col("c").alias("cca"))
    cb = counts.select(
        F.col("source").alias("source_b"),
        F.col("token").alias("tokenb"), F.col("c").alias("ccb"))
    exact = (
        ca.join(cb, (F.col("token") == F.col("tokenb"))
                & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.expr("CAST(SUM(cca * ccb) AS BIGINT)").alias("exact_inner"))
    )
    cells = toks.select(
        "source",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(_cms_bucket_spark(d)).alias("bucket"),
                )
                for d in range(CMS_DEPTH)
            ])
        ).alias("db"),
    ).select("source", "db.d", "db.bucket").groupBy(
        "source", "d", "bucket"
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    sa = cells.select(
        F.col("source").alias("source_a"), "d", "bucket",
        F.col("c").alias("cca"))
    sb = cells.select(
        F.col("source").alias("source_b"), F.col("d").alias("db2"),
        F.col("bucket").alias("bucketb"), F.col("c").alias("ccb"))
    dots = (
        sa.join(F.broadcast(sb),
                (F.col("d") == F.col("db2"))
                & (F.col("bucket") == F.col("bucketb"))
                & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b", "d")
        .agg(F.expr("CAST(SUM(cca * ccb) AS BIGINT)").alias("dot_d"))
    )
    est = dots.groupBy("source_a", "source_b").agg(
        F.expr("CAST(MIN(dot_d) AS BIGINT)").alias("cms_estimate")
    )
    return est.join(exact, ["source_a", "source_b"]).select(
        "source_a", "source_b", "exact_inner", "cms_estimate",
        F.expr(
            "round(CAST(cms_estimate AS DOUBLE) / exact_inner, 6)"
        ).alias("overestimate_ratio"),
    )


# ---------------------------------------------------------------------------
# KMV theta-sketch A-not-B (set difference) with exact ground truth
# ---------------------------------------------------------------------------

@register(
    "sketch_kmv_anb",
    # theta-sketch A-not-B: below theta = min(kth_a, kth_b) both sketches
    # are uniform hash samples of their sets, so A-hashes below theta
    # ABSENT from B's below-theta sample estimate |A \ B| by the same
    # theta scaling as the intersection. The exact ground truth joins the
    # full distinct-hash sets — the small-data eval baseline documenting
    # the sketch's error; at scale only the sketches meet.
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT source,
             {md5_int60_duck("unnest(string_split(lower(text), ' '))")} AS hv
      FROM documents
    ),
    ranked AS (
      SELECT source, hv,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rk
      FROM h
    ),
    sk AS (SELECT source, hv FROM ranked WHERE rk <= {KMV_K}),
    kth AS (SELECT source, MAX(hv) AS kth FROM sk GROUP BY source),
    prs AS (
      SELECT a.source AS a_src, b.source AS b_src,
             least(a.kth, b.kth) AS theta
      FROM kth a JOIN kth b ON a.source <> b.source
    ),
    anb AS (
      SELECT p.a_src, p.b_src, COUNT(*) AS nd
      FROM prs p
      JOIN sk sa ON sa.source = p.a_src AND sa.hv < p.theta
      LEFT JOIN sk sb ON sb.source = p.b_src AND sb.hv = sa.hv
      WHERE sb.hv IS NULL
      GROUP BY p.a_src, p.b_src
    ),
    exact AS (
      SELECT ha.source AS a_src, p.b_src, COUNT(*) AS true_diff
      FROM h ha
      JOIN prs p ON p.a_src = ha.source
      LEFT JOIN h hb ON hb.source = p.b_src AND hb.hv = ha.hv
      WHERE hb.hv IS NULL
      GROUP BY ha.source, p.b_src
    )
    SELECT p.a_src, p.b_src,
           CAST(COALESCE(anb.nd, 0) AS BIGINT) AS n_sample_diff,
           round(COALESCE(anb.nd, 0) * {_KMV_MAX} / p.theta, 6)
             AS est_a_not_b,
           CAST(exact.true_diff AS BIGINT) AS true_a_not_b
    FROM prs p
    LEFT JOIN anb ON anb.a_src = p.a_src AND anb.b_src = p.b_src
    JOIN exact ON exact.a_src = p.a_src AND exact.b_src = p.b_src
    ORDER BY p.a_src, p.b_src
    """,
    doc=f"Theta-sketch A-not-B (set difference) between every ordered "
        f"source pair from the per-source {KMV_K}-minimum-values "
        "sketches — the third operation of the sketch set algebra "
        "(union = sketch_hll_union, intersection = "
        "sketch_kmv_source_overlap): A-sample hashes below theta absent "
        "from B's sample scale by HASH_SPACE/theta to estimate |A \\\\ B| "
        "(unique vocabulary a source would LOSE if dropped from the "
        "mix). Exact ground truth from the full distinct-hash sets "
        "rides along as the eval baseline; at 100 TB only the 64-row "
        "sketches meet (broadcast-sized), the full token sets never "
        "co-shuffle.",
)
def sketch_kmv_anb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")["documents"]
    hashes = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .select("source", F.expr(md5_int60_spark("token")).alias("hv"))
        .distinct()
        .persist()
    )
    w = Window.partitionBy("source").orderBy("hv")
    sk = (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .select("source", "hv")
        .persist()
    )
    kth = sk.groupBy("source").agg(F.max("hv").alias("kth"))
    a, b = kth.alias("a"), kth.alias("b")
    prs = F.broadcast(
        a.join(b, F.col("a.source") != F.col("b.source"))
        .select(
            F.col("a.source").alias("a_src"),
            F.col("b.source").alias("b_src"),
            F.least(F.col("a.kth"), F.col("b.kth")).alias("theta"),
        )
    )
    sa, sb = sk.alias("sa"), sk.alias("sb")
    anb = (
        prs.join(
            sa,
            (F.col("sa.source") == F.col("a_src"))
            & (F.col("sa.hv") < F.col("theta")),
        )
        .join(
            sb,
            (F.col("sb.source") == F.col("b_src"))
            & (F.col("sb.hv") == F.col("sa.hv")),
            "left",
        )
        .filter(F.col("sb.hv").isNull())
        .groupBy("a_src", "b_src")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    ha, hb = hashes.alias("ha"), hashes.alias("hb")
    exact = (
        prs.join(ha, F.col("ha.source") == F.col("a_src"))
        .join(
            hb,
            (F.col("hb.source") == F.col("b_src"))
            & (F.col("hb.hv") == F.col("ha.hv")),
            "left",
        )
        .filter(F.col("hb.hv").isNull())
        .groupBy("a_src", "b_src")
        .agg(F.count(F.lit(1)).alias("true_diff"))
    )
    return (
        prs.join(F.broadcast(anb), ["a_src", "b_src"], "left")
        .join(F.broadcast(exact), ["a_src", "b_src"])
        .select(
            "a_src", "b_src",
            F.expr("CAST(COALESCE(nd, 0) AS BIGINT)").alias("n_sample_diff"),
            F.expr(
                f"round(COALESCE(nd, 0) * {_KMV_MAX} / theta, 6)"
            ).alias("est_a_not_b"),
            F.expr("CAST(true_diff AS BIGINT)").alias("true_a_not_b"),
        )
        .orderBy("a_src", "b_src")
    )


# ---------------------------------------------------------------------------
# systematic importance resampling (the selection half of the DSIR loop)
# ---------------------------------------------------------------------------

#: resample m = n/SIR_FRACTION docs; weights are LINEARIZED from the
#: DSIR log2-per-token weight (SIR_BASE + SIR_SCALE·wpt, clamped ≥ 1).
#: A 2^wpt transform would be the textbook exponential tilt, but pow()
#: is engine-libm-dependent at the last ulp and the hash gate demands
#: bit equality — the linear surrogate is monotone in the DSIR weight,
#: which is all systematic resampling needs, and keeps EVERY quantity
#: from here on an exact integer.
SIR_FRACTION = 5
SIR_BASE = 1000
SIR_SCALE = 250

from ..plans.registry import REGISTRY as _REGISTRY  # noqa: E402

#: floor(x + 1/2) for x = cum·m/S in EXACT integer arithmetic:
#: (2·cum·m + S) // (2·S) — the midpoint-offset systematic-sampling
#: pick count, no double division anywhere
_SIR_COPIES = (
    "CAST((2 * {cum} * m + tot) {intdiv} (2 * tot)"
    " - (2 * ({cum} - w_int) * m + tot) {intdiv} (2 * tot) AS BIGINT)"
)


@register(
    "sample_sir_resample",
    oracle=f"""
    WITH dsir_out AS ({{dsir}}),
    w AS (
      SELECT doc_id, in_target,
             greatest(CAST(1 AS BIGINT),
                      CAST({SIR_BASE} + round(log2_weight_per_token
                           * CAST({SIR_SCALE} AS DOUBLE), 0) AS BIGINT))
               AS w_int
      FROM dsir_out
    ),
    c AS (
      SELECT doc_id, in_target, w_int,
             CAST(SUM(w_int) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
      FROM w
    ),
    t AS (
      SELECT CAST(SUM(w_int) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) // {SIR_FRACTION} AS m
      FROM w
    ),
    picked AS (
      SELECT doc_id, w_int, in_target,
             {_SIR_COPIES.format(cum="cum", intdiv="//")} AS n_copies
      FROM c CROSS JOIN t
    )
    SELECT doc_id, w_int AS weight_scaled, in_target, n_copies
    FROM picked WHERE n_copies >= 1
    """.format(dsir=_REGISTRY["sample_dsir_weights"].oracle),
    doc=f"Systematic importance resampling — the SELECTION half of the "
        f"DSIR loop (sample_dsir_weights scores, this picks): docs are "
        f"laid on a weight line (linearized DSIR weight, exact "
        f"integers), and m = n/{SIR_FRACTION} equally-spaced "
        "midpoint-offset pointers pick each doc floor(cum·m/S + 1/2) − "
        "floor((cum−w)·m/S + 1/2) times — computed ENTIRELY in integer "
        "arithmetic ((2·cum·m + S) div (2·S)), so there is no float "
        "anywhere after the per-doc weight. Lower variance than "
        "multinomial sampling, fully deterministic, and high-weight "
        "docs surface with n_copies > 1 (the epoch-repeat signal). "
        "The global cumulative weight uses the two-phase _global_cumsum "
        "(parallel per-bucket windows + a ≤64-row prefix pass) — never "
        "a single-partition sort at corpus scale.",
)
def sample_sir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.relational import _global_cumsum

    w = (
        sample_dsir_weights(spark, sf_dir)
        .select("doc_id", "log2_weight_per_token", "in_target")
        .withColumn(
            "w_int",
            F.expr(
                f"greatest(CAST(1 AS BIGINT),"
                f" CAST({SIR_BASE} + round(log2_weight_per_token"
                f" * CAST({SIR_SCALE} AS DOUBLE), 0) AS BIGINT))"
            ),
        )
    )
    c = _global_cumsum(
        w, "doc_id", [F.col("doc_id")], "w_int", with_total=True
    )
    n = w.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"))
    return (
        c.crossJoin(F.broadcast(n))
        .withColumn("m", F.expr(f"n_docs DIV {SIR_FRACTION}"))
        .withColumn("tot", F.col("__total"))
        .withColumn(
            "n_copies", F.expr(_SIR_COPIES.format(cum="__cum", intdiv="DIV"))
        )
        .filter("n_copies >= 1")
        .select(
            "doc_id",
            F.col("w_int").alias("weight_scaled"),
            "in_target",
            "n_copies",
        )
    )



# ---------------------------------------------------------------------------
# Burrows' Delta: stylometric distance between sources
# ---------------------------------------------------------------------------

BURROWS_TOPK = 50

#: scoring over two relations: `tok` (source, t) — one row per token
#: occurrence — and `topk` (t) — the corpus-wide most-frequent tokens.
#: Relative frequencies are single divisions of exact integers rounded
#: at 9dp; means/variances across the BOUNDED source set and the final
#: per-pair mean |z_a - z_b| are DECIMAL(20,9) sums of 9dp-rounded
#: terms (the text_js_divergence discipline); z-scores round at 6dp
#: before pairing.
_BURROWS_SCORE = f"""
    stot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM tok GROUP BY source
    ),
    cst AS (
      SELECT tok.source, tok.t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok JOIN topk ON topk.t = tok.t
      GROUP BY tok.source, tok.t
    ),
    freqs AS (
      SELECT s.source, k.t,
             round(CAST(COALESCE(c.c, 0) AS DOUBLE)
                   / CAST(s.n_tok AS DOUBLE), 9) AS f
      FROM stot s CROSS JOIN topk k
      LEFT JOIN cst c ON c.source = s.source AND c.t = k.t
    ),
    mu AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(CAST(f AS DECIMAL(20,9))) AS DOUBLE) AS sf,
             CAST(SUM(CAST(round(f * f, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sff
      FROM freqs GROUP BY t
    ),
    z AS (
      SELECT fr.source, fr.t,
             round((fr.f - mu.sf / CAST(mu.ns AS DOUBLE))
                   / sqrt(greatest(
                       mu.sff / CAST(mu.ns AS DOUBLE)
                       - (mu.sf / CAST(mu.ns AS DOUBLE))
                         * (mu.sf / CAST(mu.ns AS DOUBLE)),
                       CAST(1e-18 AS DOUBLE))), 6) AS z
      FROM freqs fr JOIN mu ON mu.t = fr.t
    ),
    zpairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             round(abs(a.z - b.z), 9) AS dz
      FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
    )
    SELECT src_a, src_b,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           round(CAST(SUM(CAST(dz AS DECIMAL(20,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS burrows_delta
    FROM zpairs GROUP BY src_a, src_b
    ORDER BY src_a, src_b
    """


@register(
    "text_burrows_delta",
    oracle=f"""
    WITH tok AS (
      SELECT source, t FROM (
        SELECT source, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
      ) WHERE t <> ''
    ),
    topk AS (
      SELECT t FROM (
        SELECT t, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS rk
        FROM tok GROUP BY t
      ) v WHERE rk <= {BURROWS_TOPK}
    ),
    {_BURROWS_SCORE}
    """,
    doc=f"Burrows' Delta stylometric distance between every source pair "
        f"— the authorship-attribution statistic repurposed as corpus "
        f"QA: each source's relative frequency of the {BURROWS_TOPK} "
        "most frequent corpus tokens is z-scored per token across "
        "sources, and Delta(a,b) = mean |z_a − z_b|. Two sources from "
        "the same generator/template score near 0; an outlier row "
        "means one crawl's function-word profile drifted (boilerplate "
        "injection, language contamination, markup leakage). "
        "Frequencies and z-scores are single closed-form expressions "
        "over exact integer counts; cross-source means and the pair "
        "mean run as DECIMAL sums of 9dp-rounded terms over the "
        "BOUNDED source set. The token count is one map-side-"
        "combinable aggregation; top-K selection is a distributed "
        "TakeOrdered on the Spark side (never a vocabulary-wide "
        "single-partition window).",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "source", F.explode(F.expr("split(lower(text), ' ')")).alias("t")
    ).filter("t <> ''")
    topk = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(BURROWS_TOPK)
        .select("t")
    )
    tok.createOrReplaceTempView("tok")
    topk.createOrReplaceTempView("topk")
    return spark.sql(f"WITH {_BURROWS_SCORE}")


# ---------------------------------------------------------------------------
# RAKE-lite keyword extraction (statistical stopwords as phrase delimiters)
# ---------------------------------------------------------------------------

RAKE_STOP_TOPN = 10   # corpus-frequency stopword set (no fixed wordlist)
RAKE_TOPK = 20

#: shared scoring over `tokpos` (doc_id, pos, t) and `stops` (t):
#: phrases are maximal stopword-free runs (phrase id = running stop
#: count per doc — a doc-partitioned window); RAKE word score =
#: degree/frequency where degree sums the lengths of every phrase the
#: word appears in; a phrase scores the sum of its members' scores
#: (9dp-rounded ratios, DECIMAL-summed per phrase). {ptext} is the
#: engine's in-order string aggregation.
_RAKE_SCORE = f"""
    flagged AS (
      SELECT tp.doc_id, tp.pos, tp.t,
             CASE WHEN s.t IS NOT NULL THEN 1 ELSE 0 END AS is_stop
      FROM tokpos tp LEFT JOIN stops s ON s.t = tp.t
    ),
    segmented AS (
      SELECT doc_id, pos, t, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS phrase_id
      FROM flagged
    ),
    words AS (
      SELECT doc_id, phrase_id, pos, t FROM segmented WHERE is_stop = 0
    ),
    plen AS (
      SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen
      FROM words GROUP BY doc_id, phrase_id
    ),
    wstats AS (
      SELECT w.t, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.plen) AS BIGINT) AS degree
      FROM words w
      JOIN plen p ON p.doc_id = w.doc_id AND p.phrase_id = w.phrase_id
      GROUP BY w.t
    ),
    pscore AS (
      SELECT w.doc_id, w.phrase_id,
             {{ptext}} AS phrase,
             CAST(SUM(CAST(round(CAST(ws.degree AS DOUBLE)
                                 / CAST(ws.freq AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS score
      FROM words w JOIN wstats ws ON ws.t = w.t
      GROUP BY w.doc_id, w.phrase_id
    ),
    dedup AS (
      SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             round(MIN(score), 6) AS rake_score
      FROM pscore GROUP BY phrase
    )
    """


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS a FROM documents
    ),
    postok AS (
      SELECT doc_id, unnest(range(1, len(a) + 1)) AS pos, a FROM toks
    ),
    tokpos AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos, a[pos] AS t
      FROM postok WHERE a[pos] <> ''
    ),
    stops AS (
      SELECT t FROM (
        SELECT t, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS rk
        FROM tokpos GROUP BY t
      ) v WHERE rk <= {RAKE_STOP_TOPN}
    ),
    {_RAKE_SCORE.format(ptext="string_agg(w.t, ' ' ORDER BY w.pos)")},
    topk AS (
      SELECT phrase, n_occurrences, rake_score,
             ROW_NUMBER() OVER (ORDER BY rake_score DESC, phrase) AS rk
      FROM dedup
    )
    SELECT phrase, n_occurrences, rake_score
    FROM topk WHERE rk <= {RAKE_TOPK}
    ORDER BY rake_score DESC, phrase
    """,
    doc=f"RAKE keyword extraction (Rose et al. 2010), corpus-adaptive: "
        f"phrase delimiters are the {RAKE_STOP_TOPN} most frequent "
        "corpus tokens (STATISTICAL stopwords — no language-specific "
        "wordlist, so it works on any corpus/language), candidate "
        "phrases are maximal delimiter-free runs, each word scores "
        "degree/frequency over the phrase graph, and a phrase scores "
        f"the sum of its members; top-{RAKE_TOPK} distinct phrases "
        "emitted. Phrase segmentation is one doc-partitioned prefix "
        "window; word stats are map-side-combinable aggregates; the "
        "final top-k is a distributed TakeOrdered on the Spark side. "
        "Scores are integer ratios 9dp-rounded then DECIMAL-summed "
        "per phrase.",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    tokpos = (
        docs.select(
            "doc_id",
            F.posexplode(F.expr("split(lower(text), ' ')")).alias("p0", "t"),
        )
        .filter("t <> ''")
        .select("doc_id", F.expr("CAST(p0 + 1 AS BIGINT)").alias("pos"), "t")
    )
    stops = (
        tokpos.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(RAKE_STOP_TOPN)
        .select("t")
    )
    tokpos.createOrReplaceTempView("tokpos")
    stops.createOrReplaceTempView("stops")
    ptext = (
        "array_join(transform(array_sort(collect_list("
        "struct(w.pos, w.t))), s -> s.t), ' ')"
    )
    scored = spark.sql(
        "WITH " + _RAKE_SCORE.format(ptext=ptext) + " SELECT * FROM dedup"
    )
    return (
        scored.orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(RAKE_TOPK)
        .select("phrase", "n_occurrences", "rake_score")
    )
