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

    def test_real_backend_needs_codec_for_compressed_kinds(self, media):
        """synth_media payloads are fake compressed blobs (png/wav/mp4
        mimes) — the real backend names the missing codec for those."""
        with pytest.raises(Exception, match="decode"):
            extract_features(media, backend="real").collect()


class TestRealCodecs:
    """The dependency-free real path: PPM images + WAV audio actually
    decode; features are true statistics; resize really resamples."""

    @pytest.fixture(scope="class")
    def real_media(self, spark):
        from spider_spark.functions.multimodal import synth_media_real

        return synth_media_real(spark, 24).localCheckpoint(eager=True)

    def test_ppm_wav_roundtrip_kernels(self):
        import numpy as np

        from spider_spark.functions.multimodal import (
            decode_ppm,
            decode_wav,
            encode_ppm,
            encode_wav,
        )

        px = (np.arange(5 * 7 * 3).reshape(5, 7, 3) % 256).astype(np.uint8)
        assert (decode_ppm(encode_ppm(px)) == px).all()
        samples = (np.sin(np.arange(400) / 10.0) * 16000).astype("<i2")
        got, sr = decode_wav(encode_wav(samples, 8000))
        assert sr == 8000
        assert np.allclose(got * 32768.0, samples, atol=1.0)

    def test_real_features_are_true_statistics(self, real_media):
        import numpy as np

        feats = {
            r["media_id"]: r
            for r in extract_features(real_media, dim=8, backend="real").collect()
        }
        for r in real_media.collect():
            f = feats[r["media_id"]]
            if r["kind"] == "image":
                # [w, h, mean_R, mean_G, mean_B, 0...]
                assert f["feature"][0] == r["meta"]["width"]
                assert f["feature"][1] == r["meta"]["height"]
                # blue channel of the synthetic gradient is constant id%256
                assert f["feature"][4] == pytest.approx(r["media_id"] % 256)
            else:
                # [duration, rms, zcr, sr_khz, 0...]: 0.05 s sine at half
                # amplitude → rms ≈ 0.5/√2
                assert f["feature"][0] == pytest.approx(0.05, rel=1e-3)
                assert f["feature"][1] == pytest.approx(0.5 / np.sqrt(2), rel=0.05)
                assert f["feature"][3] == pytest.approx(8.0)

    def test_real_resize_resamples_pixels(self, real_media):
        from spider_spark.functions.multimodal import decode_ppm

        out = resize_images(real_media, 8, 6, backend="real").collect()
        assert out
        for r in out:
            px = decode_ppm(bytes(r["payload"]))
            assert px.shape == (6, 8, 3)
            assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
            # gradient preserved: red increases left→right after resample
            assert px[0, 0, 0] <= px[0, -1, 0]


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
