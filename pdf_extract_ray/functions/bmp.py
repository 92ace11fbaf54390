"""From-scratch codecs for the two media formats the sandbox CAN decode
with the stdlib: 24-bit uncompressed BMP (struct + numpy) and PCM WAV
(stdlib ``wave``).  These make the multimodal stages real end-to-end —
synthesize encoded bytes, ship them through actor-pool map_batches as
opaque ``large_binary`` payloads, and decode REAL pixels/samples on the
worker — while the JPEG/MP4 slots stay stubbed (no codec libs here).

BMP subset: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, BI_RGB
(uncompressed), bottom-up or top-down rows, 4-byte row padding.  That is
the classic baseline every real BMP reader supports.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res, res, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, ...

BI_RGB = 0


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp bottom-up BI_RGB BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = _FILE_HDR.size + _INFO_HDR.size
    return (
        _FILE_HDR.pack(b"BM", off + len(data), 0, 0, off)
        + _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, BI_RGB, len(data),
                         2835, 2835, 0, 0)
        + data
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB.  Supports the encode_bmp subset
    plus top-down images (negative height).  Raises ValueError on
    anything else — callers route undecodable rows by status, they don't
    crash the batch."""
    if len(data) < _FILE_HDR.size + _INFO_HDR.size or data[:2] != b"BM":
        raise ValueError("not a BMP")
    _, _file_size, _, _, off = _FILE_HDR.unpack_from(data, 0)
    (hdr_size, w, h, _planes, bpp, comp, *_rest) = _INFO_HDR.unpack_from(
        data, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size or bpp != 24 or comp != BI_RGB:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * 3 + 3) & ~3
    end = off + stride * h
    if end > len(data):
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return px if top_down else px[::-1]


def split_bmp_stream(data: bytes) -> list[bytes]:
    """Split a concatenation of BMP files into the individual files using
    each header's declared file size — the 'video container' the sandbox
    can build and parse for real (each frame is independently decodable)."""
    frames, pos, n = [], 0, len(data)
    while pos + _FILE_HDR.size <= n:
        if data[pos : pos + 2] != b"BM":
            raise ValueError(f"bad frame magic at byte {pos}")
        (_, size, _, _, _) = _FILE_HDR.unpack_from(data, pos)
        if size < _FILE_HDR.size or pos + size > n:
            raise ValueError(f"bad frame size {size} at byte {pos}")
        frames.append(data[pos : pos + size])
        pos += size
    if pos != n:
        raise ValueError("trailing bytes after last BMP frame")
    return frames


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    s = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (int16 mono samples, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only 16-bit mono PCM supported")
        raw = w.readframes(w.getnframes())
        return np.frombuffer(raw, dtype="<i2"), w.getframerate()
