"""Multimodal binary-column plumbing tests: schema, batching, fan-out,
determinism (decode itself is stubbed — no codec libs in container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odin_rs_spark.operators import multimodal as mm
from odin_rs_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    """Binary media rows synthesized from the documents table (text bytes
    as opaque blobs — deterministic, no codecs needed)."""
    docs = load_table(spark, "documents", sf_dir).limit(50)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").cast("binary").alias("content"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def test_extract_features_schema_and_determinism(spark, media):
    out = mm.extract_features(media, n_features=8)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "n_bytes", "features", "mean_val", "max_val",
    ]
    r1 = {r.media_id: r.features for r in out.collect()}
    r2 = {r.media_id: r.features for r in mm.extract_features(media, 8).collect()}
    assert r1 == r2  # deterministic across runs
    assert all(len(v) == 8 and all(0 <= x < 1 for x in v) for v in r1.values())


def test_tile_fanout(spark, media):
    tiles = mm.tile_media(media, nx=2, ny=2)
    n_media = media.count()
    assert tiles.count() == 4 * n_media
    per = tiles.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)
    coords = {
        (r.tile_x, r.tile_y)
        for r in tiles.filter(F.col("media_id") == per[0].media_id).collect()
    }
    assert coords == {(0, 0), (1, 0), (0, 1), (1, 1)}


def test_classify_stub(spark, media):
    scored = media.select("media_id", mm.classify_stub("content").alias("pred"))
    rows = scored.collect()
    assert all(r.pred.label in ("smoke", "fire", "none") for r in rows)
    assert all(0 <= r.pred.confidence < 1 for r in rows)
    # deterministic
    again = {r.media_id: r.pred for r in scored.collect()}
    assert all(again[r.media_id] == r.pred for r in rows)


def test_frame_sample_bounded(spark, media):
    frames = mm.frame_sample(media, every_n=2, max_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] <= 4 for r in per)
    assert frames.filter(F.col("frame_no") % 2 != 0).count() == 0


def test_media_repartition(spark, media):
    rp = mm.media_repartition(media, partitions=6)
    assert rp.rdd.getNumPartitions() == 6
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == "64"
    )


def test_image_similarity_self_is_one(spark, media):
    sim = mm.image_similarity(media, media)
    rows = sim.collect()
    assert len(rows) == media.count()
    assert all(abs(r.similarity - 1.0) < 1e-9 for r in rows)
