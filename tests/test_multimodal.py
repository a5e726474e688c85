"""Multimodal plumbing tests: schema, deterministic fake codec, stubs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spider_spark.functions.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 30).cache()


class TestSynthMedia:
    def test_schema_and_kinds(self, media):
        assert [f.name for f in media.schema.fields] == [
            "media_id", "kind", "payload", "meta",
        ]
        kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
        assert kinds == {"image", "audio", "video"}

    def test_meta_typed_by_kind(self, media):
        rows = media.collect()
        for r in rows:
            if r["kind"] == "image":
                assert r["meta"]["width"] is not None and r["meta"]["mime"] == "image/png"
            if r["kind"] == "audio":
                assert r["meta"]["sample_rate"] == 16000
            if r["kind"] == "video":
                assert r["meta"]["n_frames"] >= 1


class TestExtractFeatures:
    def test_digest_matches_md5(self, media):
        feats = {r["media_id"]: r for r in extract_features(media, dim=8).collect()}
        for r in media.collect():
            f = feats[r["media_id"]]
            payload = bytes(r["payload"])
            assert f["digest"] == hashlib.md5(payload).hexdigest()
            assert f["n_bytes"] == len(payload)
            assert len(f["feature"]) == 8
            assert all(0.0 <= x < 1.0 for x in f["feature"])

    def test_real_backend_is_stubbed(self, media):
        with pytest.raises(NotImplementedError):
            extract_features(media, backend="real")
        with pytest.raises(NotImplementedError):
            resize_images(media, 64, 64, backend="real")


class TestResizeAndFrames:
    def test_resize_rewrites_meta(self, media):
        out = resize_images(media, 64, 48).collect()
        assert out and all(
            r["meta"]["width"] == 64 and r["meta"]["height"] == 48 for r in out
        )
        assert all(bytes(r["payload"]).startswith(b"resized:64x48:") for r in out)

    def test_sample_frames_counts(self, media):
        got = sample_frames(media, every=30).groupBy("media_id").agg(
            F.count("*").alias("n")
        ).collect()
        nf = {
            r["media_id"]: r["meta"]["n_frames"]
            for r in media.filter(F.col("kind") == "video").collect()
        }
        assert {r["media_id"] for r in got} == set(nf)
        for r in got:
            assert r["n"] == (nf[r["media_id"]] - 1) // 30 + 1
