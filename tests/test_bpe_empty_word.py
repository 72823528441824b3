"""Empty-word guard in the BPE trainer (round-15 ADVICE medium).

Splitting text on a single space turns consecutive/leading/trailing
spaces into EMPTY words, and Spark's ``sequence(1, length(word))`` is
DESCENDING for ``length = 0`` (``sequence(1, 0) = [1, 0]``) — without
the ``length(word) >= 1`` filter the position explode would emit two
spurious ``sym = ''`` rows per empty word, corrupting the pair counts
and the per-round argmax, while the DuckDB oracle's
``range(1, length + 1)`` (empty range) never produces them: a latent
cross-engine parity break on perfectly legal corpora.
"""

import os

import pytest

from flink_connector_http_spark.operators.text import _bpe_train_state


@pytest.fixture(scope="module")
def spaced_docs_dir(spark, tmp_path_factory):
    """A tiny documents table whose texts produce empty split words in
    every position: leading, consecutive-interior, and trailing."""
    d = str(tmp_path_factory.mktemp("bpe_spaced"))
    rows = [
        (1, "ab  ab", "en", "web", 6),       # interior double space
        (2, " ab ab ", "en", "web", 7),      # leading + trailing
        (3, "cd   cd", "en", "books", 7),    # triple space
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_no_empty_symbols_in_char_state(spark, spaced_docs_dir):
    rules, states = _bpe_train_state(spark, spaced_docs_dir)
    p0 = states[0].collect()
    assert p0, "char-level state must be non-empty"
    assert all(s != "" for r in p0 for s in r["syms"]), (
        "empty words leaked '' symbols into the vocabulary state"
    )
    assert all(r["word"] != "" for r in p0)


def test_pair_argmax_unpolluted(spark, spaced_docs_dir):
    """With empty words dropped, round 1 must pick the true best pair
    ('a','b') — frequency 4 across the two 'ab' docs — not a pair
    involving the spurious empty symbol."""
    rules, _ = _bpe_train_state(spark, spaced_docs_dir)
    first = rules[0].collect()[0]
    assert (first["left_sym"], first["right_sym"]) == ("a", "b")
    assert first["pair_count"] == 4
    assert first["merged"] == "ab"
