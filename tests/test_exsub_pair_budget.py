"""ExactSubstr per-anchor pair budget (round-15 verdict item #2).

The df cap (EXSUB_DF_MAX) bounds fan-out PER ANCHOR; on a dirty corpus
the aggregate candidate-PAIR volume across anchors is still a data
property (the 10x salted replica produced 75.6x pairs for 10x data).
``SPARK_GRAFT_EXSUB_PAIR_MAX`` / ``_exsub_spans(pair_max=...)`` is the
opt-in escape hatch: keep only the budget-many lowest-doc_id postings
per anchor. These tests pin

- the capped join really is restricted to the kept postings,
- the default stays UNCAPPED (oracle semantics),
- the env knob engages the same path as the explicit argument, and
- the audit query's truncation accounting matches the closed-form
  algebra on a corpus where the budget binds.
"""

import os

import pytest

from flink_connector_http_spark.operators.dedup import (
    EXSUB_PAIR_BUDGET_AUDIT,
    _exsub_spans,
    dedup_exsub_pair_budget_audit,
)

N_DOCS = 12
BUDGET = 8
SHARED = "the quick brown fox jumps over the lazy dog near the riverbank"
# windows fully inside the shared prefix → anchors common to all docs
N_ANCHORS = len(SHARED) - 29  # K = 30


@pytest.fixture(scope="module")
def budget_docs_dir(spark, tmp_path_factory):
    """12 docs sharing one 62-char sentence (plus a unique suffix each):
    every in-sentence anchor posts to all 12 docs, so any budget < 12
    binds on every anchor. Suffixes share NO prefix with each other
    (distinct repeated letters butted directly against the sentence),
    so boundary-crossing windows are df-1 and drop out of the anchor
    join entirely."""
    d = str(tmp_path_factory.mktemp("exsub_budget"))
    rows = [
        (i, SHARED + chr(ord("A") + i - 1) * 11, "en", "web",
         len(SHARED) + 11)
        for i in range(1, N_DOCS + 1)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_uncapped_default_reports_all_pairs(spark, budget_docs_dir):
    spans = _exsub_spans(spark, budget_docs_dir).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in spans}
    assert len(pairs) == N_DOCS * (N_DOCS - 1) // 2  # C(12, 2) = 66


def test_capped_join_restricted_to_kept_postings(spark, budget_docs_dir):
    spans = _exsub_spans(spark, budget_docs_dir, pair_max=BUDGET).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in spans}
    # lowest-doc_id rule: only docs 1..BUDGET survive per anchor
    assert pairs == {
        (a, b)
        for a in range(1, BUDGET + 1)
        for b in range(a + 1, BUDGET + 1)
    }
    # the spans themselves are untouched by the cap: the shared sentence
    # is one maximal diagonal-0 span covering all of it
    for r in spans:
        assert (r["diag"], r["sa"], r["ea"]) == (0, 1, len(SHARED))


def test_env_knob_engages_same_path(spark, budget_docs_dir):
    os.environ["SPARK_GRAFT_EXSUB_PAIR_MAX"] = str(BUDGET)
    try:
        via_env = _exsub_spans(spark, budget_docs_dir).collect()
    finally:
        del os.environ["SPARK_GRAFT_EXSUB_PAIR_MAX"]
    explicit = _exsub_spans(spark, budget_docs_dir, pair_max=BUDGET).collect()
    key = lambda r: (r["a_id"], r["b_id"], r["diag"], r["sa"], r["ea"])
    assert sorted(map(key, via_env)) == sorted(map(key, explicit))


def test_audit_truncation_algebra(spark, budget_docs_dir):
    """Every in-sentence anchor posts to all 12 docs; at the audit budget
    B the accounting must be the closed form:
    kept = B, dropped = 12 - B, pairs C(12,2) -> C(B,2), per anchor."""
    row = dedup_exsub_pair_budget_audit(spark, budget_docs_dir).collect()[0]
    b = EXSUB_PAIR_BUDGET_AUDIT
    assert row["budget"] == b
    assert row["n_anchors"] == N_ANCHORS
    assert row["n_anchors_truncated"] == N_ANCHORS  # 12 > B for all
    assert row["postings_kept"] == N_ANCHORS * b
    assert row["postings_dropped"] == N_ANCHORS * (N_DOCS - b)
    assert row["pairs_uncapped"] == N_ANCHORS * N_DOCS * (N_DOCS - 1) // 2
    assert row["pairs_capped"] == N_ANCHORS * b * (b - 1) // 2
