"""Round-16 ADVICE regressions.

1. (high) ``asof_join_stream``'s fold must materialize the WHOLE
   group micro-batch before sorting: applyInPandasWithState splits a
   group into Arrow chunks at ``arrow.maxRecordsPerBatch`` (and the
   operator's union puts every left row before every right row), so a
   per-chunk merge would let lefts in an early chunk silently miss
   rights delivered in a later chunk with smaller ts.  Repro: force
   maxRecordsPerBatch tiny and push one big single-key micro-batch —
   the stream digest must equal the batch ``asof_join``.
2. (medium) A right row arriving in a later micro-batch with ts BELOW
   the carried state (cross-batch right disorder) must not crash
   merge_asof ("right keys must be sorted") and must not regress the
   carry to an older right.
3. (low) histogram-quantile's single-partition windows must use a
   NON-foldable constant partition key — a bare ``lit(0)`` is
   constant-folded back to an empty partition spec.
4. (low) ``arrayJoin`` (row-multiplying) and ``arrayReduce``
   (aggregate-combinator argument) must NOT pass the maxIntersections
   known-scalar guard — such calls in HAVING/ORDER BY decline to the
   always-correct fold.
"""

from __future__ import annotations

import pandas as pd

from transaq_clickhouse_exporter_spark.operators.asof import asof_join
from transaq_clickhouse_exporter_spark.operators.asof_stream import (
    asof_join_stream,
)


def _run_stream(spark, tmp_path, trade_chunks, quote_chunks):
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    for i, rows in enumerate(trade_chunks):
        spark.createDataFrame(rows, "g int, t double, lv int") \
            .coalesce(1).write.parquet(f"{tdir}/c{i}")
    for i, rows in enumerate(quote_chunks):
        spark.createDataFrame(rows, "g int, qt double, price double") \
            .coalesce(1).write.parquet(f"{qdir}/c{i}")
    ts = (spark.readStream.schema("g int, t double, lv int")
          .option("maxFilesPerTrigger", 1).parquet(f"{tdir}/c*"))
    qs = (spark.readStream.schema("g int, qt double, price double")
          .option("maxFilesPerTrigger", 1).parquet(f"{qdir}/c*"))
    out = asof_join_stream(ts, qs, by=["g"], left_ts="t",
                           right_ts="qt", right_ts_out="mqt")
    sink = str(tmp_path / "out")
    q = (out.writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return [tuple(r) for r in spark.read.parquet(sink).collect()]


def test_group_batch_survives_arrow_chunking(spark, tmp_path):
    # ONE key, ONE micro-batch, 120 trades + 120 quotes interleaved in
    # event time.  With maxRecordsPerBatch=16 the union (all 120 lefts
    # first, then all 120 rights) arrives as ~15 chunks; the old
    # per-chunk fold matched ZERO trades.  Digest must equal batch.
    n = 120
    trades = [[(1, float(2 * i + 1), i) for i in range(n)]]
    quotes = [[(1, float(2 * i), 100.0 + i) for i in range(n)]]
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "16")
    try:
        got = sorted(_run_stream(spark, tmp_path, trades, quotes),
                     key=repr)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    ldf = spark.createDataFrame(trades[0], "g int, t double, lv int")
    rdf = spark.createDataFrame(quotes[0], "g int, qt double, price double")
    want = sorted(
        (tuple(r) for r in asof_join(
            ldf, rdf, by=["g"], left_ts="t", right_ts="qt",
            right_ts_out="mqt").collect()),
        key=repr)
    assert got == want and len(got) == n
    # every trade (ts 2i+1) matches quote (ts 2i) — nothing unmatched
    assert all(r[3] is not None for r in got)


def test_cross_batch_right_disorder_degrades_not_crashes(spark, tmp_path):
    # batch 0 carries quote ts=50 into state; batch 1 delivers a
    # DISORDERED right (ts=8 < carry 50) plus a fresh one (ts=60) and
    # two trades.  Old code: rdf = [carry 50, 8, 60] unsorted ->
    # merge_asof raises and the query dies.  New contract: sort,
    # trade 55 matches the carry (50), trade 70 matches 60, and the
    # state never regresses below 60 (checked via a 3rd batch).
    trades = [[(1, 51.0, 100)], [(1, 55.0, 101), (1, 70.0, 102)],
              [(1, 80.0, 103)]]
    quotes = [[(1, 50.0, 1.0)], [(1, 8.0, 2.0), (1, 60.0, 3.0)], []]
    got = {r[1]: (r[3], r[4]) for r in
           _run_stream(spark, tmp_path, trades, quotes)}
    assert got[51.0] == (1.0, 50.0)
    assert got[55.0] == (1.0, 50.0)   # disordered 8.0 loses to carry
    assert got[70.0] == (3.0, 60.0)
    assert got[80.0] == (3.0, 60.0)   # carry kept max-ts right (60)


def test_quantile_window_key_not_constant_folded(spark):
    # Verified empirically: Window.partitionBy(F.lit(0)) is constant-
    # folded to an EMPTY partition spec (windowspecdefinition starts
    # straight at the ORDER key), while the bucket % 1 idiom survives
    # as a _wN partition attribute.  Pin that every ungrouped window
    # inside quantiles_from_histogram carries the non-foldable key.
    from pyspark.sql import Window, functions as F

    from transaq_clickhouse_exporter_spark.functions.quantiles import (
        histogram_sketch, quantiles_from_histogram,
    )
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "price double")
    hist = histogram_sketch(df, "price", buckets=8)
    out = quantiles_from_histogram(hist, qs=(0.5, 0.9))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the folded shape (what lit(0) produces) must not appear: a spec
    # whose FIRST element is already the order key of the cum window
    folded = "windowspecdefinition(bucket"
    assert folded not in plan.lower().replace("#", ""), plan
    assert "% 1" in plan, plan  # the non-foldable key survived
    got = {r["q"]: r["est"] for r in out.collect()}
    assert set(got) == {0.5, 0.9} and got[0.5] <= got[0.9]

    # and the control: a bare lit really does fold (the premise)
    probe = df.select(F.sum("price").over(
        Window.partitionBy(F.lit(0)).orderBy("price")).alias("s"))
    pplan = probe._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(price" in pplan.lower().replace(
        "#0", "").replace("#", "")


def test_maxint_guard_rejects_arrayjoin_and_arrayreduce():
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        _known_scalar,
    )
    assert not _known_scalar("arrayJoin")
    assert not _known_scalar("arrayReduce")
    assert _known_scalar("arraySum")           # genuine scalars stay
    assert _known_scalar("toStartOfInterval")
