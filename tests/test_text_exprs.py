"""Edge-case pins for codegen'd text expressions whose corpus-scale
correctness the DuckDB oracles prove but whose degenerate inputs the
synthetic corpus never exercises (its min text length is ~47 chars)."""

import pytest

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


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_char_lm_perplexity_rounding_boundary_distance(sf_dir):
    """text_char_lm_perplexity sums RAW doubles and rounds only the final
    3dp outputs; Spark and DuckDB accumulate in different orders, so the
    engines can differ by ~1e-12 before rounding. That is only safe while
    no document's pre-round value sits ON a 0.0005 rounding boundary.
    This guard asserts every doc at the gate SFs keeps >=1e-6 distance
    (six orders of magnitude above the drift) for BOTH rounded outputs —
    if a regenerated corpus ever lands near a boundary, this trips before
    the driver gate flakes."""
    import duckdb

    from flink_connector_http_spark.operators.text import _LM_V, _TRIS_DUCK

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(f"""
        WITH tris AS (
          SELECT doc_id, unnest({_TRIS_DUCK}) AS tri FROM documents
        ),
        model AS (
          SELECT tri, CAST(COUNT(*) AS BIGINT) AS c FROM tris GROUP BY tri
        ),
        total AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM model),
        terms AS (
          SELECT tris.doc_id,
                 log2(CAST(model.c + 1 AS DOUBLE) / (total.t + {_LM_V}))
                     AS term
          FROM tris JOIN model USING (tri) CROSS JOIN total
        )
        SELECT doc_id, -SUM(term) / COUNT(*) AS raw_ce FROM terms
        GROUP BY doc_id
    """).fetchall()
    assert rows

    def boundary_distance(x: float) -> float:
        # round(x, 3) flips at k + 0.0005: distance of frac(x*1000) to 0.5
        frac = (x * 1000.0) % 1.0
        return abs(frac - 0.5)

    min_ce = min(boundary_distance(ce) for _, ce in rows)
    # perplexity rounds pow(2, ALREADY-ROUNDED ce) at 3dp — pow itself can
    # drift by 1 ulp across engines, so it needs the same clearance
    min_pp = min(
        boundary_distance(2.0 ** round(ce, 3)) for _, ce in rows
    )
    assert min_ce > 1e-6, f"cross_entropy_bits within {min_ce} of a boundary"
    assert min_pp > 1e-6, f"perplexity within {min_pp} of a boundary"
