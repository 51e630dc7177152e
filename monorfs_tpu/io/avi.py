"""Minimal MJPEG AVI writer/reader (pure stdlib RIFF + PIL JPEG codec).

The reference recording format embeds a `sidebar.avi` with the sensor view
(reference: mono-rfs-lib/UI/Simulation.cs:391-488 writes it via
Util.SaveAsAvi, Util.cs:297-378; the Viewer plays it back through
FileCaptureX). This module provides the same capability without external
video dependencies: standard AVI 1.0 RIFF container, one MJPG video stream,
one JPEG per frame, with the idx1 index required by common players.
"""

import io
import struct


def jpeg_encode(frame, quality=85):
    from PIL import Image
    import numpy as np

    arr = np.asarray(frame)
    if arr.dtype != np.uint8:
        lo, hi = float(arr.min()), float(arr.max())
        arr = ((arr - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
    if arr.ndim == 2:
        img = Image.fromarray(arr, "L").convert("RGB")
    else:
        img = Image.fromarray(arr[..., :3], "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue(), img.size  # (bytes, (w, h))


_jpeg_encode = jpeg_encode  # back-compat alias


def write_mjpeg(path_or_file, frames, fps=30, quality=85):
    """Write frames (uint8 [H, W] / [H, W, 3] arrays, or pre-encoded JPEG
    bytes) as an MJPEG AVI. Returns the number of frames written."""
    encoded = []
    size = None
    for f in frames:
        if isinstance(f, (bytes, bytearray)):
            data = bytes(f)
            if size is None:
                from PIL import Image

                size = Image.open(io.BytesIO(data)).size
        else:
            data, size = jpeg_encode(f, quality)
        if len(data) % 2:
            data += b"\x00"
        encoded.append(data)
    if not encoded:
        raise ValueError("no frames")
    w, h = size
    n = len(encoded)
    max_size = max(len(d) for d in encoded)

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc, payload):
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 / fps),  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        n, 0, 1,  # frames, initial, streams
        max_size,  # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I2HI", 0, 0, 0, 0)  # flags, prio, lang, initial
        + struct.pack("<2I", 1, fps)  # scale, rate
        + struct.pack("<3I", 0, n, max_size)  # start, length, bufsize
        + struct.pack("<iI", -1, 0)  # quality, samplesize
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H4s5I", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )

    movi_payload = b"movi"
    idx = b""
    for d in encoded:
        offset = len(movi_payload)
        movi_payload += chunk(b"00dc", d)
        idx += b"00dc" + struct.pack("<3I", 0x10, offset, len(d))
    movi = chunk(b"LIST", movi_payload)
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    data = b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload
    if hasattr(path_or_file, "write"):
        path_or_file.write(data)
    else:
        with open(path_or_file, "wb") as f:
            f.write(data)
    return n


def read_mjpeg(path_or_file):
    """Read back the JPEG frame payloads of an MJPEG AVI (our writer's
    layout or any standard single-video-stream file). Returns a list of
    JPEG byte strings."""
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    frames = []

    def walk(buf, pos, end):
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body = pos + 8
            if fourcc == b"LIST":
                walk(buf, body + 4, body + size)
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(buf[body:body + size].rstrip(b"\x00"))
            pos = body + size + (size & 1)

    walk(data, 12, len(data))
    return frames


def decode_frames(jpegs):
    """Decode JPEG payloads to uint8 RGB arrays (PIL)."""
    import numpy as np
    from PIL import Image

    return [np.asarray(Image.open(io.BytesIO(j)).convert("RGB"))
            for j in jpegs]
