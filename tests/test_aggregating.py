"""Aggregating/SummingMergeTree semantics (operators/aggregating.py):
merge must be state-path-independent — any batching of the input rows
merges to the same final answer, and that answer equals direct
aggregation over the whole data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.operators.aggregating import (
    finalize,
    merge_states,
    partial_states,
)


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        (i, f"K{i % 5}", float(100 + (i * 37) % 50), (i * 13) % 7 + 1)
        for i in range(400)
    ]
    return spark.createDataFrame(
        data, "rid long, key string, price double, qty long"
    )


def _final(states):
    return {
        r.key: (r.n, r.sum_qty, r.min_price, r.max_price, r.distinct_est)
        for r in finalize(states, ("key",))
        .withColumnRenamed("sum_qty", "sum_qty")
        .collect()
    }


def _parts(df, splits):
    return [
        partial_states(
            df.filter(cond),
            ("key",),
            sum_cols=("qty",),
            min_cols=("price",),
            max_cols=("price",),
            hll_col="rid",
        ).withColumnRenamed("sum_qty", "sum_qty")
        for cond in splits
    ]


def test_split_invariance_and_direct_equality(rows):
    whole = _parts(rows, [F.lit(True)])[0]
    by3 = _parts(rows, [F.pmod(F.col("rid"), F.lit(3)) == i for i in range(3)])
    skewed = _parts(
        rows, [F.col("rid") < 7, (F.col("rid") >= 7) & (F.col("rid") < 9),
               F.col("rid") >= 9]
    )
    a = _final(whole)
    b = _final(by3[0].unionAll(by3[1]).unionAll(by3[2]))
    c = _final(skewed[0].unionAll(skewed[1]).unionAll(skewed[2]))
    assert a == b == c
    # direct truth: counts/sums/extrema exact; rid is unique per row so
    # the HLL estimate must sit within the sketch's error band
    direct = {
        r.key: (r.n, r.sq, r.mn, r.mx)
        for r in rows.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("qty").alias("sq"),
            F.min("price").alias("mn"), F.max("price").alias("mx"),
        )
        .collect()
    }
    for k, (n, sq, mn, mx, est) in a.items():
        assert (n, sq, mn, mx) == direct[k]
        assert abs(est - n) <= max(3, 0.15 * n)


def test_merge_is_associative(rows):
    p = _parts(rows, [F.pmod(F.col("rid"), F.lit(4)) == i for i in range(4)])
    left = merge_states(
        merge_states(p[0].unionAll(p[1]), ("key",)).unionAll(
            merge_states(p[2].unionAll(p[3]), ("key",))
        ),
        ("key",),
    )
    flat = merge_states(p[0].unionAll(p[1]).unionAll(p[2]).unionAll(p[3]), ("key",))
    assert _final(left) == _final(flat)


def test_rejects_unmergeable_columns(rows):
    bad = partial_states(rows, ("key",), sum_cols=("qty",)).withColumn(
        "avg_qty", F.lit(1.0)
    )
    with pytest.raises(ValueError):
        merge_states(bad, ("key",))


def test_scalar_only_states(rows):
    st = partial_states(rows, ("key",), sum_cols=("qty",))
    out = {r.key: (r.n, r.sum_qty) for r in finalize(st, ("key",)).collect()}
    want = {
        r.key: (r.n, r.sq)
        for r in rows.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("sq"))
        .collect()
    }
    assert out == want


def test_states_stream_restart_and_replay(spark, tmp_path):
    """Streaming maintenance (CH materialized-view shape): 3 file
    micro-batches of events feed partial states; a kill/restart on the
    same checkpoint resumes without reprocessing; the finalized read
    equals direct aggregation over all rows; replaying a committed
    batch is idempotent."""
    import os

    from transaq_clickhouse_exporter_spark.operators.aggregating import (
        partial_states,
        read_final,
        states_stream_sink,
    )
    from transaq_clickhouse_exporter_spark.sources.replay import (
        write_jsonl_fixture,
    )

    rows = [
        {"rid": i, "key": f"K{i % 4}", "price": float(100 + (i * 31) % 40),
         "qty": (i * 7) % 5 + 1}
        for i in range(300)
    ]
    batches = [rows[:100], rows[100:200], rows[200:]]
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    spec = dict(sum_cols=("qty",), min_cols=("price",), max_cols=("price",),
                hll_col="rid")
    schema = "rid long, key string, price double, qty long"

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        return (
            stream.writeStream.foreachBatch(
                states_stream_sink(state, ("key",), **spec)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    write_jsonl_fixture(os.path.join(src, "b0.jsonl"), batches[0], mtime=1_000)
    write_jsonl_fixture(os.path.join(src, "b1.jsonl"), batches[1], mtime=2_000)
    run_stream().awaitTermination(300)

    # kill happened (availableNow drained); third batch arrives, a new
    # query on the SAME checkpoint resumes at the next offset
    write_jsonl_fixture(os.path.join(src, "b2.jsonl"), batches[2], mtime=3_000)
    run_stream().awaitTermination(300)

    got = {
        r.key: (r.n, r.sum_qty, r.min_price, r.max_price, r.distinct_est)
        for r in read_final(spark, state, ("key",)).collect()
    }
    whole = spark.createDataFrame(rows, schema)
    want = _final(
        partial_states(whole, ("key",), **spec)
    )
    assert got == want

    # replay idempotence: recommitting batch 1 overwrites its own dir
    b1 = spark.createDataFrame(batches[1], schema)
    partial_states(b1, ("key",), **spec).write.mode("overwrite").parquet(
        f"{state}/b1"
    )
    again = {
        r.key: (r.n, r.sum_qty, r.min_price, r.max_price, r.distinct_est)
        for r in read_final(spark, state, ("key",)).collect()
    }
    assert again == got


def test_all_null_hll_key_keeps_scalars(spark):
    """ADVICE r6: a key whose hll column is NULL on every row must not
    vanish from merge_states/finalize — scalars survive, est = 0."""
    from transaq_clickhouse_exporter_spark.operators.aggregating import (
        finalize,
        merge_states,
        partial_states,
    )

    rows = [("a", 1, "x"), ("a", 2, "y"), ("b", 5, None), ("b", 7, None)]
    df = spark.createDataFrame(rows, "k string, v long, u string")
    st = partial_states(df, ("k",), sum_cols=("v",), hll_col="u")
    merged = {r.k: r for r in merge_states(st, ("k",)).collect()}
    assert set(merged) == {"a", "b"}
    assert merged["b"].sum_v == 12 and merged["b"].hll == {}
    fin = {r.k: r for r in finalize(st, ("k",)).collect()}
    assert set(fin) == {"a", "b"}
    assert fin["b"].n == 2 and fin["b"].sum_v == 12
    assert fin["b"].distinct_est == 0
    assert fin["a"].distinct_est == 2
