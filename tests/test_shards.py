"""Training-shard export (datapipe/shards.py): content-stable shard
assignment, one-file-per-shard layout, deterministic within-shard
order, manifest round-trip, and corruption detection."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.datapipe.sampling import assign_split
from transaq_clickhouse_exporter_spark.datapipe.shards import (
    assign_shard,
    shard_manifest,
    verify_shards,
    write_training_shards,
)
from transaq_clickhouse_exporter_spark.testdata import register_views


def _docs(spark, sf_smoke):
    register_views(spark, sf_smoke)
    return spark.table("documents")


def test_assignment_is_content_stable(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    a = assign_shard(docs, "doc_id", 8).select("doc_id", "shard", "order_key")
    # repartitioning the input must not move any document's shard
    b = assign_shard(docs.repartition(13), "doc_id", 8).select(
        "doc_id", "shard", "order_key"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.filter((F.col("shard") < 0) | (F.col("shard") >= 8)).count() == 0


def test_write_layout_and_order(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", 4, token_col="n_chars")
    # exactly one data file per shard directory
    for k in range(4):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)
    # within-shard rows are in hash (order_key) order — deterministic tape
    one = spark.read.parquet(f"{path}/shard=0/*.parquet")
    keys = [r.order_key for r in one.select("order_key").collect()]
    assert keys == sorted(keys)
    # every document present exactly once overall
    total = spark.read.parquet(path)
    assert total.count() == docs.count()
    assert total.select("doc_id").distinct().count() == docs.count()


def test_manifest_roundtrip_and_verify(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    path = str(tmp_path / "shards")
    m = write_training_shards(docs, path, "doc_id", 4, token_col="n_chars")
    stored = spark.read.parquet(path + "/_manifest")
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, stored.collect()))
    assert verify_shards(spark, path, "doc_id").count() == 0
    # corrupt one shard (drop a row) -> verify flags exactly that shard
    data = spark.read.parquet(path)
    victim = data.filter(F.col("shard") == 2).limit(1).collect()[0].doc_id
    data.filter(~((F.col("shard") == 2) & (F.col("doc_id") == victim))).write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(str(tmp_path / "bad"))
    stored.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "bad" / "_manifest")
    )
    diff = verify_shards(spark, str(tmp_path / "bad"), "doc_id").collect()
    assert {r.shard for r in diff} == {2} and len(diff) == 2


def test_split_aware_sharding(spark, sf_smoke, tmp_path):
    docs = assign_split(_docs(spark, sf_smoke), "doc_id")
    path = str(tmp_path / "shards")
    write_training_shards(
        docs, path, "doc_id", 2, token_col="n_chars", split_col="split"
    )
    back = spark.read.parquet(path)
    assert set(back.select("split").distinct().toPandas()["split"]) >= {"train"}
    # manifest keys are (split, shard)
    m = spark.read.parquet(path + "/_manifest")
    assert {"split", "shard", "n_docs", "id_checksum", "n_tokens"} == set(m.columns)
    assert verify_shards(spark, path, "doc_id").count() == 0
