"""Multimodal plumbing: binary columns, Arrow kernel shape, stubs."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = M.synth_media(spark, 48)
    df.cache().count()
    return df


def test_metadata_pass(spark, media):
    meta = M.media_metadata(media).collect()
    assert len(meta) == 48
    assert all(r["n_bytes"] >= 128 and len(r["payload_sha256"]) == 64 for r in meta)


def test_fake_features_deterministic(spark, media):
    f1 = {r["media_id"]: r["features"] for r in M.extract_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in M.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    assert all(-1.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_real_decoder_is_marked_stub(spark, media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_frame_sampling(spark, media):
    frames = M.sample_frames(media, every_n=3)
    rows = frames.collect()
    assert rows and all(r["frame_idx"] % 3 == 0 for r in rows)
    # only video rows explode
    kinds = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == kinds


def test_resize_plan(spark, media):
    plan = M.resize_meta(media, max_side=100).collect()
    assert all(max(r["target_w"], r["target_h"]) <= 100 for r in plan)
