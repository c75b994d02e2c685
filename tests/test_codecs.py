"""Real stdlib media codec: byte-level PNM/WAV/PPM-stream decode, resize
and frame-sampling, both pure-Python and end-to-end through the Spark
multimodal operators (Arrow-batched mapInPandas)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from composable_logs_spark.operators.codecs import (
    decode_pnm,
    encode_pnm,
    encode_wav,
    stdlib_codec,
)
from composable_logs_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_video_frames,
)


def _gradient(w, h, c=3):
    arr = np.zeros((h, w, c), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            for ch in range(c):
                arr[y, x, ch] = (x * 7 + y * 13 + ch * 29) % 256
    return arr


def test_pnm_roundtrip_and_comments():
    arr = _gradient(5, 4)
    out, maxval = decode_pnm(encode_pnm(arr))
    assert maxval == 255 and np.array_equal(out, arr)
    # header comments per the spec
    withc = b"P6\n# a comment\n5 4\n# more\n255\n" + arr.tobytes()
    out2, _ = decode_pnm(withc)
    assert np.array_equal(out2, arr)


def test_codec_decode_and_resize():
    arr = _gradient(8, 6)
    d = stdlib_codec(encode_pnm(arr), "image", op="decode")
    assert (d["width"], d["height"], d["n_channels"]) == (8, 6, 3)
    assert d["pixels"] == arr.tobytes()
    r = stdlib_codec(encode_pnm(arr), "image", op="resize", width=4, height=3)
    got, _ = decode_pnm(r["payload"])
    # nearest-neighbour: every output pixel exists at its source index
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got[0, 0], arr[0, 0])


def test_codec_wav_decode_and_frames():
    pcm = bytes(range(256)) * 125  # 32000 bytes = 2 s of 8 kHz 16-bit mono
    wav = encode_wav(pcm, rate=8000, n_channels=1, sample_width=2)
    d = stdlib_codec(wav, "audio", op="decode")
    assert d["pixels"] == pcm and d["rate"] == 8000
    out = stdlib_codec(wav, "audio", op="frames", every_ms=500)["frames"]
    assert [f[1] for f in out] == [0, 500, 1000, 1500]
    assert b"".join(f[2] for f in out) == pcm  # chunks tile the stream


def test_codec_wav_chunks_align_to_pcm_frames():
    """44.1 kHz stereo 16-bit at every_ms=333 gives 58741.2 bytes per
    chunk; an unaligned int() cut splits mid-sample and every later
    chunk's bytes decode as garbage audio. Chunks must be whole PCM
    frames (n_channels * sample_width)."""
    frame_size = 2 * 2
    n_frames = 44100  # 1 s
    pcm = bytes((i % 251 for i in range(n_frames * frame_size)))
    wav = encode_wav(pcm, rate=44100, n_channels=2, sample_width=2)
    out = stdlib_codec(wav, "audio", op="frames", every_ms=333)["frames"]
    assert all(len(f[2]) % frame_size == 0 for f in out)
    assert b"".join(f[2] for f in out) == pcm  # chunks still tile the stream


def test_codec_ppm_stream_frames():
    imgs = [_gradient(4, 3) for _ in range(10)]
    stream = b"".join(encode_pnm(a) for a in imgs)
    # 25 fps -> 40 ms/frame; every_ms=120 -> every 3rd frame
    out = stdlib_codec(stream, "video", op="frames", every_ms=120)["frames"]
    assert [f[0] for f in out] == [0, 3, 6, 9]
    assert [f[1] for f in out] == [0, 120, 240, 360]
    got, _ = decode_pnm(out[1][2])
    assert np.array_equal(got, imgs[3])


def test_codec_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        stdlib_codec(b"\xff\xd8\xff\xe0 jpeg-ish", "image", op="decode")


@pytest.fixture(scope="module")
def pnm_media(spark):
    rows = [
        (i, "image", bytearray(encode_pnm(_gradient(6 + i, 4 + i))), None)
        for i in range(5)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,n_bytes:bigint>",
    )


def test_resize_images_default_codec_end_to_end(spark, pnm_media):
    out = resize_images(pnm_media, width=4, height=3).collect()
    assert len(out) == 5
    for r in out:
        arr, _ = decode_pnm(bytes(r["payload"]))
        assert arr.shape == (3, 4, 3)
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 3


def test_extract_features_decodes_real_pixels(spark, pnm_media):
    out = extract_features(pnm_media, deterministic_features=False).collect()
    # n_bytes is the DECODED pixel count, not the payload (header) size
    sizes = {r["media_id"]: r["n_bytes"] for r in out}
    assert sizes == {i: (6 + i) * (4 + i) * 3 for i in range(5)}


def test_sample_video_frames_default_codec_end_to_end(spark):
    stream = b"".join(encode_pnm(_gradient(4, 3)) for _ in range(6))
    media = spark.createDataFrame(
        [(1, "video", bytearray(stream), None)],
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,n_bytes:bigint>",
    )
    out = sample_video_frames(media, every_ms=80).collect()  # every 2nd frame
    assert [(r["frame_idx"], r["frame_ms"]) for r in out] == [
        (0, 0), (2, 80), (4, 160),
    ]
