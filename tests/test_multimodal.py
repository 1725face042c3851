"""Multimodal pipeline plumbing: schemas, Arrow batch flow, fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.operators import multimodal as mm


def _media(spark, sf_dir, n=50):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n)
    return mm.attach_media(docs)


def test_attach_media_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "meta": "struct<format:string,declared_width:int,declared_height:int>",
    }
    assert media.count() == 50


def test_decode_stub_raises_without_fake(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        mm.decode_image(_media(spark, sf_dir))


def test_decode_fake_is_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    a = sorted(tuple(r) for r in mm.decode_image(media, deterministic_fake=True).collect())
    b = sorted(tuple(r) for r in mm.decode_image(media, deterministic_fake=True).collect())
    assert a == b
    assert all(r[4] for r in a)  # ok flag
    assert all(1 <= r[1] <= 1920 for r in a)


def test_extract_features_shape_and_norm(spark, sf_dir):
    out = mm.extract_features(_media(spark, sf_dir), dim=8).collect()
    assert len(out) == 50
    for r in out:
        assert r["vector_dim"] == 8
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-5


def test_sample_frames_fans_out(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = mm.sample_frames(media, every_n_bytes=64, max_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per)
    assert frames.count() >= media.count()


def test_resize_stub_shapes(spark, sf_dir):
    media = _media(spark, sf_dir)
    with pytest.raises(NotImplementedError):
        mm.resize_image(media)
    out = mm.resize_image(media, width=16, height=16, deterministic_fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(bytes(r["payload"])) == 256 for r in rows)
    assert all(r["width"] == 16 and r["height"] == 16 for r in rows)


def test_dedup_by_payload(spark, sf_dir):
    media = _media(spark, sf_dir)
    dup = media.withColumn("media_id", F.col("media_id") + 10_000)
    corpus = media.unionByName(dup)
    kept = mm.dedup_by_payload(corpus)
    assert kept.count() == 50
    assert kept.filter(F.col("media_id") >= 10_000).count() == 0


def test_media_feature_neighbors_composition(spark, sf_dir):
    from neo4j_enterprise_spark.plans import all_queries

    q = all_queries()["media_feature_neighbors"]
    a = [tuple(r) for r in q.spark(spark, sf_dir).collect()]
    b = [tuple(r) for r in q.spark(spark, sf_dir).collect()]
    assert a == b  # deterministic featurizer + quantized scoring
    assert len(a) == 30  # 10 seeds x top-3
    assert all(row[0] != row[1] for row in a)  # self excluded
