"""Injectable media codec (VERDICT r1 #7): the three codec-dependent
operators must accept a codec callable, route every payload through it,
and keep the Spark-side plumbing (schema, batching, explode shape) intact.
The default (real) codec must still raise on undecodable payloads so
nobody silently ships fake pixels; real-format coverage is in
test_codecs.py."""

import pytest

from composable_logs_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_video_frames,
    synthetic_media_from_documents,
)


def _make_fake_codec():
    # nested so cloudpickle ships it by VALUE — the tests module is not
    # importable from Spark's python workers
    def fake_codec(payload: bytes, kind: str, op: str = "decode", **kwargs):
        if op == "decode":
            # "decoded pixels" = payload reversed, deterministic
            return {"pixels": payload[::-1]}
        if op == "resize":
            w, h = kwargs["width"], kwargs["height"]
            return {"payload": payload[: w * h], "width": w, "height": h}
        if op == "frames":
            every = kwargs["every_ms"]
            return {
                "frames": [
                    (i, i * every, payload[i : i + 4])
                    for i in range(min(3, len(payload)))
                ]
            }
        raise AssertionError(f"unknown op {op}")

    return fake_codec


fake_codec = _make_fake_codec()


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthetic_media_from_documents(spark, sf_dir).limit(20).cache()


def test_extract_features_with_codec(spark, media):
    out = extract_features(media, deterministic_features=False, codec=fake_codec)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9
    # histogram over reversed bytes == histogram over original bytes,
    # so the fake-codec path must agree with the deterministic path
    det = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    for r in rows:
        assert r["features"] == det[r["media_id"]]


def test_resize_images_with_codec(spark, media):
    out = resize_images(media, width=4, height=3, codec=fake_codec).collect()
    assert len(out) == 20
    for r in out:
        assert r["meta"]["width"] == 4
        assert r["meta"]["height"] == 3
        assert len(r["payload"]) <= 12
        assert r["meta"]["n_bytes"] == len(r["payload"])


def test_sample_video_frames_with_codec(spark, media):
    out = sample_video_frames(media, every_ms=500, codec=fake_codec).collect()
    # 3 frames per media row, schema as declared
    assert len(out) == 60
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for frames in by_media.values():
        assert sorted(f["frame_idx"] for f in frames) == [0, 1, 2]
        assert {f["frame_ms"] for f in frames} == {0, 500, 1000}


def test_default_codec_raises_on_undecodable_payload(spark, media):
    # media here is utf-8 text bytes, not PNM/WAV — the real default
    # codec must refuse rather than fabricate pixels
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        extract_features(media, deterministic_features=False).collect()
