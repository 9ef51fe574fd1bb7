"""Animated play clips: APNG container over the distributed
renderer's frames — the engine-side counterpart of the reference's
matplotlib FuncAnimation clips (reference src/visualization/play.py:
330-351, assets/clips/).

Same philosophy as pipeline/multimodal.py's BMP/WAV codecs: a real,
self-contained, pure-python + stdlib-zlib implementation of a narrow,
deterministic profile — 8-bit truecolor RGB, filter 0 on every
scanline, full-frame fcTL rectangles, dispose/blend 0 — with
``decode_apng`` the exact inverse of ``encode_apng`` (pixel equality
pinned in tests/test_viz_anim.py). No imaging library involved.

``animate_plays`` assembles one APNG per play DISTRIBUTEDLY: the
rendered BMP frames (viz/render.py::render_play_frames) group by play
and each group zips into one animation blob inside a single
``applyInPandas`` — blobs never leave the executors, exactly like the
multimodal decode path. A play's clip is bounded (~70 frames x a
fixed-canvas raster), so the group size is a model constant, never
data-sized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _raw_scanlines(frame: np.ndarray) -> bytes:
    """Filter-0 scanlines: one 0x00 filter byte then the RGB row."""
    h, w, _ = frame.shape
    rows = np.empty((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 0] = 0
    rows[:, 1:] = frame.reshape(h, w * 3)
    return rows.tobytes()


def encode_apng(
    frames: list[np.ndarray], delay_num: int = 1, delay_den: int = 10
) -> bytes:
    """Encode uint8 (h, w, 3) frames as an APNG (default 10 fps — the
    reference's tracking FRAME_RATE, src/core/settings.py:68-70).
    Every frame must share the first frame's shape; the first frame is
    both the PNG default image and animation frame 0, so any PNG
    viewer shows a valid still."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("frames must be (h, w, 3) RGB")
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be uint8 with one shape")
    out = [_PNG_SIG]
    out.append(
        _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    )
    # acTL: frame count + infinite loop
    out.append(_chunk(b"acTL", struct.pack(">II", len(frames), 0)))
    seq = 0

    def fctl(width: int, height: int) -> bytes:
        nonlocal seq
        data = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delay_num, delay_den, 0, 0
        )
        seq += 1
        return _chunk(b"fcTL", data)

    out.append(fctl(w, h))
    out.append(_chunk(b"IDAT", zlib.compress(_raw_scanlines(frames[0]), 6)))
    for frame in frames[1:]:
        out.append(fctl(w, h))
        payload = struct.pack(">I", seq) + zlib.compress(
            _raw_scanlines(frame), 6
        )
        seq += 1
        out.append(_chunk(b"fdAT", payload))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_apng(data: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """Exact inverse of :func:`encode_apng` for the profile it emits
    (8-bit RGB, filter 0, full-frame rectangles). Returns the frame
    list and the (delay_num, delay_den) of the first fcTL."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    delay = (0, 0)
    streams: list[bytes] = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, ctype_, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype_, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG profile")
        elif ctype == b"fcTL":
            (_, fw, fh, fx, fy, dn, dd, dop, bop) = struct.unpack(
                ">IIIIIHHBB", body
            )
            if (fw, fh, fx, fy, dop, bop) != (w, h, 0, 0, 0, 0):
                raise ValueError("unsupported fcTL rectangle")
            if not streams:
                delay = (dn, dd)
        elif ctype == b"IDAT":
            streams.append(body)
        elif ctype == b"fdAT":
            streams.append(body[4:])
        elif ctype == b"IEND":
            break
    frames: list[np.ndarray] = []
    stride = 1 + w * 3
    for blob in streams:
        raw = zlib.decompress(blob)
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        if (rows[:, 0] != 0).any():
            raise ValueError("unsupported filter byte")
        frames.append(rows[:, 1:].reshape(h, w, 3).copy())
    return frames, delay


ANIM_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType()),
        T.StructField("play_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("animation", T.BinaryType()),
    ]
)


def animate_plays(frames: DataFrame, delay_den: int = 10) -> DataFrame:
    """One APNG clip per play from ``render_play_frames`` output:
    group the BMP frame rows by (game_id, play_id), decode, and zip
    each ordered frame stack into a single animation blob executor-
    side. The shuffle key is the play — the clip (a bounded frame
    count at a fixed canvas size) is the unit of work, so partitions
    stay balanced at any corpus scale."""
    from ..pipeline.multimodal import decode_bmp

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame_id")
        imgs = [decode_bmp(bytes(b)) for b in pdf["image"]]
        blob = encode_apng(imgs, 1, delay_den)
        h, w, _ = imgs[0].shape
        return pd.DataFrame(
            {
                "game_id": [int(pdf["game_id"].iloc[0])],
                "play_id": [int(pdf["play_id"].iloc[0])],
                "n_frames": [len(imgs)],
                "width": [w],
                "height": [h],
                "media_type": ["apng"],
                "animation": [blob],
            }
        )

    return frames.groupBy("game_id", "play_id").applyInPandas(
        assemble, ANIM_SCHEMA
    )
