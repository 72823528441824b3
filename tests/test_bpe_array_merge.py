"""Round-15 optimization: the BPE trainer's greedy merge is now a
zero-shuffle left-to-right fold over a per-word symbol ARRAY
(``_BPE_MERGE_EXPR``) instead of the former four-window
gaps-and-islands pass over a positions table. These tests pin the fold
to subword-nmt greedy semantics on the shapes where the two could
diverge — identical-symbol runs (floor(m/2) merges), merged tokens
that could shadow a rule side, and back-to-back merge opportunities.
"""

import pytest
from pyspark.sql import functions as F

from flink_connector_http_spark.operators.text import (
    _BPE_MERGE_EXPR,
    _BPE_PAIRS_EXPR,
)


def _apply(spark, syms, bx, by):
    df = spark.createDataFrame(
        [(syms,)], "syms array<string>"
    ).select(
        F.lit(bx).alias("bx"), F.lit(by).alias("by"), "syms"
    )
    return df.select(F.expr(_BPE_MERGE_EXPR).alias("out")).collect()[0]["out"]


@pytest.mark.parametrize(
    "syms,bx,by,expected",
    [
        # distinct-symbol rule: every candidate merges
        (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
        # identical-symbol run of 3: greedy merges floor(3/2) = 1 pair
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        # run of 4: floor(4/2) = 2
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        # run of 5: floor(5/2) = 2, trailing singleton survives
        (["a", "a", "a", "a", "a"], "a", "a", ["aa", "aa", "a"]),
        # merged token equals a later left side only in a LATER round —
        # within one round "ab"+"a","b" must not re-merge ("aab" needs
        # rule (ab, b) or (a, ab), not (a, b))
        (["a", "b", "b"], "a", "b", ["ab", "b"]),
        # back-to-back opportunities across a just-merged token: after
        # merging (c,d) the pair (b,cd) is NOT the rule, so it stays
        (["b", "c", "d", "c", "d"], "c", "d", ["b", "cd", "cd"]),
        # no candidates: array unchanged
        (["x", "y"], "a", "b", ["x", "y"]),
        # single symbol: unchanged
        (["q"], "a", "b", ["q"]),
        # pre-merged multi-char symbols participate as atoms
        (["ab", "ab", "c"], "ab", "ab", ["abab", "c"]),
        (["th", "e"], "th", "e", ["the"]),
    ],
)
def test_greedy_fold_semantics(spark, syms, bx, by, expected):
    assert _apply(spark, syms, bx, by) == expected


def test_pairs_expr_empty_and_singleton(spark):
    """size < 2 arrays must yield zero pair rows, not a descending
    sequence(1, 0) explosion."""
    df = spark.createDataFrame(
        [(["a"],), ([],), (["a", "b", "c"],)], "syms array<string>"
    )
    rows = (
        df.select(F.explode(F.expr(_BPE_PAIRS_EXPR)).alias("p"))
        .select("p.sym", "p.nxt")
        .collect()
    )
    assert sorted((r["sym"], r["nxt"]) for r in rows) == [
        ("a", "b"), ("b", "c")
    ]
