"""Native IO runtime tests (librfsio via ctypes; skipped without toolchain)."""

import struct
import zlib

import numpy as np
import pytest

from monorfs_tpu import native


def make_png(arr, bitdepth, color):
    """Craft a PNG with filter-0 rows."""
    h, w = arr.shape[:2]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color, 0, 0, 0)
    raw = b""
    for row in range(h):
        raw += b"\x00"
        raw += arr[row].astype(">u2").tobytes() if bitdepth == 16 else arr[
            row
        ].tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


needs_native = pytest.mark.skipif(
    not native.available(), reason="librfsio not built"
)


@needs_native
def test_png_roundtrips():
    rng = np.random.default_rng(0)
    g8 = rng.integers(0, 255, (5, 7), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_png(make_png(g8, 8, 0)), g8)
    g16 = rng.integers(0, 65535, (4, 6), dtype=np.uint16)
    np.testing.assert_array_equal(native.decode_png(make_png(g16, 16, 0)), g16)
    rgb = rng.integers(0, 255, (3, 4, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_png(make_png(rgb, 8, 2)), rgb)


@needs_native
def test_png_matches_python_fallback():
    from monorfs_tpu.frontend.dataset import _load_png_py

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (16, 12), dtype=np.uint8)
    data = make_png(img, 8, 0)
    np.testing.assert_array_equal(native.decode_png(data), _load_png_py(data))


@needs_native
def test_parse_doubles():
    out = native.parse_doubles("1.5 2 -3.25\n4e-3  7")
    np.testing.assert_allclose(out, [1.5, 2, -3.25, 4e-3, 7])


@needs_native
def test_png_bad_data():
    with pytest.raises(ValueError):
        native.decode_png(b"not a png at all")
