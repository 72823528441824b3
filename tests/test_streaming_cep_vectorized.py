"""Vectorized-NFA equivalence: the round-15 register-algebra rewrite of
cep_funnel_stream's transition function must emit exactly what the
original per-row loop emitted, on randomized multi-batch sequences —
including carry of every register across micro-batch boundaries. The
reference loop lives here, in the test, as executable spec."""

import random

import pyspark.sql.types as T

from flink_connector_http_spark.plans.relational import CEP_WITHIN_US
from flink_connector_http_spark.streaming.stateful import cep_funnel_stream

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("u", T.LongType()),
])

H = 3_600_000_000  # one hour in micros


def _loop_reference(rows, within_us):
    """The pre-round-15 per-row NFA, verbatim semantics."""
    out = []
    st = {}
    for uid, _eid, ev, u in rows:
        lv, eav, cc, cv, eacv, ec = st.get(uid, (-1, -1, -1, -1, -1, 0))
        if ev == "view":
            lv, eav = u, ec
        elif ev == "click":
            cc, cv, eacv = u, lv, eav
        elif ev == "error":
            ec += 1
        elif ev == "purchase":
            if (
                cc != -1
                and u - cc <= within_us
                and cv != -1
                and cc - cv <= within_us
            ):
                out.append((uid, u - cv, 1 if ec - eacv > 0 else 0))
        st[uid] = (lv, eav, cc, cv, eacv, ec)
    return sorted(out)


def test_vectorized_nfa_matches_loop_reference(spark, tmp_path):
    rng = random.Random(421)
    types = ["view", "click", "error", "purchase"]
    # 12 users x 40 events each, random types, strictly increasing
    # timestamps per user with occasional window-busting gaps
    per_user = {}
    for uid in range(1, 13):
        t, rows = 0, []
        for i in range(40):
            t += rng.choice([H, 2 * H, CEP_WITHIN_US + H])
            rows.append((uid, i + 1, rng.choice(types), t))
        per_user[uid] = rows
    # split every user's sequence across three micro-batches at random
    # cut points so registers must carry across batch boundaries
    batches = [[], [], []]
    for uid, rows in per_user.items():
        c1 = rng.randint(1, 38)
        c2 = rng.randint(c1 + 1, 39)
        batches[0].extend(rows[:c1])
        batches[1].extend(rows[c1:c2])
        batches[2].extend(rows[c2:])

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    query = None
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
        if query is None:
            query = (
                cep_funnel_stream(
                    spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
                    "user_id", ["u", "event_id"], CEP_WITHIN_US,
                )
                .writeStream.format("memory")
                .queryName("cep_vec_prop")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start()
            )
        query.processAllAvailable()
    got = sorted(
        (r.user_id, r.gap_us, r.blocked)
        for r in spark.table("cep_vec_prop").collect()
    )
    query.stop()

    all_rows = sorted(
        (r for b in batches for r in b), key=lambda r: (r[3], r[1])
    )
    assert got == _loop_reference(all_rows, CEP_WITHIN_US)
    assert got  # the draw must actually exercise emissions
