"""Real, dependency-free media codecs for the multimodal operators.

``stdlib_codec`` implements the codec contract documented on
``multimodal._decode_stub`` for every format decodable with the Python
stdlib + numpy — no PIL/librosa/pyav required:

- **PPM (P6) / PGM (P5)** binary images: header parse + numpy pixel
  array. ``resize`` is nearest-neighbour index sampling re-encoded in
  the same format.
- **WAV (RIFF/PCM)** audio via the stdlib ``wave`` module. ``decode``
  returns raw PCM; ``frames`` chops fixed-duration PCM chunks every
  ``every_ms`` — real audio frame sampling.
- **Concatenated-PPM streams** (what ``ffmpeg -f image2pipe -c:v ppm``
  emits) as the video container: ``frames`` parses successive P6
  headers and samples one frame per ``every_ms`` at the assumed
  ``fps`` (default 25).

Anything else (JPEG/PNG/MP4/...) raises NotImplementedError with the
sniffed magic — production swaps in a PIL/pyav wrapper through the same
``codec=`` injection point; nothing in the Spark plumbing changes.

Design note (100 TB): codecs run INSIDE mapInPandas batches on
executors; they must be pure functions of the payload bytes (no files,
no driver state) — both codecs here are.
"""

from __future__ import annotations

import io
import wave

import numpy as np

_PPM_MAGICS = {b"P6": 3, b"P5": 1}  # magic -> channels


def _parse_pnm_header(buf: bytes, off: int = 0):
    """Parse a binary PNM (P5/P6) header starting at ``off``; returns
    (magic, width, height, maxval, data_offset). Handles comments and
    arbitrary whitespace per the spec."""
    magic = buf[off : off + 2]
    if magic not in _PPM_MAGICS:
        raise NotImplementedError(f"not a binary PNM payload: magic={magic!r}")
    pos = off + 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(buf) and buf[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM rasters not supported")
    return magic, w, h, maxval, pos


def decode_pnm(payload: bytes):
    """PNM payload -> (array[h, w, c] uint8, maxval)."""
    magic, w, h, maxval, pos = _parse_pnm_header(payload)
    c = _PPM_MAGICS[magic]
    n = w * h * c
    raster = payload[pos : pos + n]
    if len(raster) < n:
        raise ValueError(f"truncated PNM raster: want {n} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, c), maxval


def encode_pnm(arr: "np.ndarray", maxval: int = 255) -> bytes:
    """(h, w, c) uint8 array -> binary PNM bytes (P5 for c=1, P6 for c=3)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = {1: b"P5", 3: b"P6"}[c]
    header = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    return header + arr.astype(np.uint8).tobytes()


def _resize_nearest(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


def _iter_ppm_stream(payload: bytes):
    """Yield (start, end) byte ranges of successive PNM images in a
    concatenated stream."""
    off = 0
    while off < len(payload):
        magic, w, h, _maxval, pos = _parse_pnm_header(payload, off)
        end = pos + w * h * _PPM_MAGICS[magic]
        yield off, end
        off = end


def _decode_wav(payload: bytes):
    with wave.open(io.BytesIO(payload), "rb") as f:
        return {
            "pixels": f.readframes(f.getnframes()),
            "rate": f.getframerate(),
            "n_channels": f.getnchannels(),
            "sample_width": f.getsampwidth(),
        }


def encode_wav(pcm: bytes, rate: int = 8000, n_channels: int = 1, sample_width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(sample_width)
        f.setframerate(rate)
        f.writeframes(pcm)
    return buf.getvalue()


def _is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def stdlib_codec(payload: bytes, kind: str, op: str = "decode", **kwargs):
    """Codec-contract implementation over PNM images, concatenated-PNM
    streams, and RIFF/PCM WAV. See module docstring."""
    if op == "decode":
        if _is_wav(payload):
            return _decode_wav(payload)
        arr, _ = decode_pnm(payload)
        return {
            "pixels": arr.tobytes(),
            "width": arr.shape[1],
            "height": arr.shape[0],
            "n_channels": arr.shape[2],
        }

    if op == "resize":
        arr, maxval = decode_pnm(payload)
        out = _resize_nearest(arr, kwargs["width"], kwargs["height"])
        return {
            "payload": encode_pnm(out, maxval),
            "width": kwargs["width"],
            "height": kwargs["height"],
        }

    if op == "frames":
        every_ms = int(kwargs.get("every_ms", 1000))
        if _is_wav(payload):
            wav = _decode_wav(payload)
            frame_size = wav["n_channels"] * wav["sample_width"]
            bytes_per_ms = wav["rate"] * frame_size / 1000.0
            # align the chunk to whole PCM frames: e.g. 44.1 kHz stereo
            # 16-bit at every_ms=333 gives 58749.2 bytes/chunk, and an
            # unaligned cut splits mid-sample, shifting every later
            # frame's bytes into misaligned audio
            chunk = max(frame_size, int(bytes_per_ms * every_ms) // frame_size * frame_size)
            pcm = wav["pixels"]
            frames = [
                (i, int(start / bytes_per_ms), pcm[start : start + chunk])
                for i, start in enumerate(range(0, len(pcm), chunk))
            ]
            return {"frames": frames}
        fps = float(kwargs.get("fps", 25.0))
        frame_ms = 1000.0 / fps
        stride = max(1, int(round(every_ms / frame_ms)))
        frames = []
        for idx, (start, end) in enumerate(_iter_ppm_stream(payload)):
            if idx % stride == 0:
                frames.append((idx, int(idx * frame_ms), payload[start:end]))
        return {"frames": frames}

    raise ValueError(f"unknown codec op: {op!r}")
