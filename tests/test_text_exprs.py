"""Edge-case pins for codegen'd text expressions whose corpus-scale
correctness the DuckDB oracles prove but whose degenerate inputs the
synthetic corpus never exercises (its min text length is ~47 chars)."""

from flink_connector_http_spark.operators.text import _TRIGRAMS_SPARK


def test_trigrams_empty_for_short_text(spark):
    """Spark's sequence(1, 0) is the DESCENDING [1, 0]; the guarded
    expression must emit NO trigrams for texts under 3 chars instead of
    two spurious ones (which would hash-diverge from DuckDB's empty
    range(1, 1))."""
    df = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",), ("abcd",), ("AbCdE",)],
        "text string",
    )
    rows = df.selectExpr("text", f"{_TRIGRAMS_SPARK} AS tg").collect()
    got = {r.text: r.tg for r in rows}
    assert got[""] == []
    assert got["a"] == []
    assert got["ab"] == []
    assert got["abc"] == ["abc"]
    assert got["abcd"] == ["abc", "bcd"]
    assert got["AbCdE"] == ["abc", "bcd", "cde"]  # lowercased first
