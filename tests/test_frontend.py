"""Frontend tests: FAST detection, descriptor matching, RANSAC filter,
pixel-range conversion (the reference ships no tests for kpextractor;
SURVEY §4 lists this as a gap to fill)."""

import numpy as np
import jax
import jax.numpy as jnp

from monorfs_tpu.frontend import fast, kinect, latch, matching


def checkerboard_corners(h=120, w=160, seed=0, n=6):
    """Synthetic image with bright square blobs on dark background: strong
    corners at known-ish locations."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 30.0)
    centers = []
    for _ in range(n):
        cy = rng.integers(30, h - 30)
        cx = rng.integers(30, w - 30)
        img[cy - 4 : cy + 4, cx - 4 : cx + 4] = 220.0
        centers.append((cx, cy))
    img += rng.normal(size=(h, w)) * 2.0
    return img, np.asarray(centers)


def test_fast_detects_blob_corners():
    img, centers = checkerboard_corners()
    xy, score, valid = fast.detect(jnp.asarray(img), threshold=40.0,
                                   max_keypoints=64, border=8)
    pts = np.asarray(xy)[np.asarray(valid)]
    assert len(pts) >= len(centers), len(pts)
    # every blob contributes at least one detection near its corners
    for cx, cy in centers:
        d = np.min(np.abs(pts - [cx, cy]).max(axis=1))
        assert d <= 6, (cx, cy, d)


def test_fast_no_corners_flat():
    img = jnp.full((64, 64), 100.0)
    xy, score, valid = fast.detect(img, threshold=20.0, max_keypoints=16)
    assert int(valid.sum()) == 0


def test_descriptor_translation_invariance():
    """Descriptors of the same scene shifted by a few pixels match under
    Hamming distance; unrelated points do not."""
    img, _ = checkerboard_corners(seed=3)
    shift = 3
    img2 = np.roll(img, (shift, shift), axis=(0, 1))

    xy1, _, v1 = fast.detect(jnp.asarray(img), 40.0, 32, border=16)
    d1 = latch.describe(jnp.asarray(img), xy1, v1)
    xy2, _, v2 = fast.detect(jnp.asarray(img2), 40.0, 32, border=16)
    d2 = latch.describe(jnp.asarray(img2), xy2, v2)

    match, matched = matching.knn_match(d1, v1, d2, v2, max_norm_distance=0.37)
    m = np.asarray(matched) & np.asarray(v1)
    assert m.sum() >= 4, m.sum()
    # matched pairs should be displaced by about (shift, shift)
    disp = np.asarray(xy2)[np.asarray(match)[m]] - np.asarray(xy1)[m]
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [shift, shift], atol=1.5)


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    n = 40
    src = rng.uniform(0, 100, size=(n, 2))
    dst = src + np.array([5.0, -3.0])  # pure translation homography
    outliers = rng.choice(n, size=8, replace=False)
    dst[outliers] += rng.uniform(20, 40, size=(8, 2))
    mask = jnp.ones(n, bool)
    inl = matching.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), mask, jax.random.PRNGKey(0),
        tolerance=3.0,
    )
    inl = np.asarray(inl)
    assert inl.sum() >= n - 10
    assert not inl[outliers].any()


def test_subsample_and_range_conversion():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    sub = kinect.subsample(img, 2)
    np.testing.assert_allclose(sub, [[2.5, 4.5], [10.5, 12.5]])


def test_kinect_source_pipeline():
    """End-to-end: synthetic RGB-D frames -> pixel-range measurements with
    plausible ranges."""

    class FakeDataset:
        def __init__(self):
            img, self.centers = checkerboard_corners(h=96, w=128, seed=5, n=4)
            self.img = img
            self.depth = np.full((96, 128), 1.5, np.float32)

        def frame(self, i):
            # slight shift per frame for the temporal filter
            img = np.roll(self.img, (i, i), axis=(0, 1))
            return float(i), self.depth, img

    from monorfs_tpu.models.prm3d import Params

    src = kinect.KinectSource(
        FakeDataset(), camera=Params(focal=100.0), delta=1, max_keypoints=32,
        threshold=40.0,
    )
    z0, depth0 = src.measure(0)
    z1, depth1 = src.measure(1)
    assert len(z0) >= 4
    assert len(z1) >= 3  # survived the temporal filter
    # ranges must be >= depth (range >= z distance)
    assert np.all(z1[:, 2] >= 1.5 - 1e-6)
    assert np.all(z1[:, 2] < 3.0)


def _write_png(path, arr, bitdepth=8):
    """Minimal PNG encoder (filter 0 rows) for fixture generation."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    color = 2 if arr.ndim == 3 else 0
    if bitdepth == 16:
        payload = arr.astype(">u2").tobytes()
        bpp = 2 * (3 if color == 2 else 1)
    else:
        payload = arr.astype(np.uint8).tobytes()
        bpp = 3 if color == 2 else 1
    stride = w * bpp
    raw = b"".join(
        b"\x00" + payload[r * stride : (r + 1) * stride] for r in range(h)
    )

    def chunk(ctype, data):
        c = ctype + data
        return (
            struct.pack(">I", len(data)) + c
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def test_convert_tum_roundtrip(tmp_path):
    """convert_tum (the video2oni replacement, video2oni.cpp:335-480) must
    decode real 16-bit depth + 8-bit RGB PNGs, apply the TUM depth scale,
    gray-convert, and associate each depth frame with the nearest rgb
    timestamp."""
    from monorfs_tpu.frontend.dataset import RGBDDataset, convert_tum

    d = tmp_path / "tum"
    (d / "depth").mkdir(parents=True)
    (d / "rgb").mkdir()
    rng = np.random.default_rng(7)
    h, w = 24, 32
    depth_lines, rgb_lines = [], []
    true_depths, true_grays = [], []
    for i in range(3):
        t = 10.0 + i * 0.0333
        dm = rng.uniform(0.5, 3.0, size=(h, w)).astype(np.float32)
        d16 = np.round(dm * 5000.0).astype(np.uint16)
        _write_png(d / "depth" / f"{i}.png", d16, bitdepth=16)
        depth_lines.append(f"{t:.4f} depth/{i}.png")
        true_depths.append(d16.astype(np.float32) / 5000.0)
        rgb = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        # rgb timestamps slightly offset: nearest-association must pick i
        _write_png(d / "rgb" / f"{i}.png", rgb)
        rgb_lines.append(f"{t + 0.005:.4f} rgb/{i}.png")
        true_grays.append(rgb.mean(axis=-1).astype(np.uint8))
    (d / "depth.txt").write_text(
        "# depth maps\n" + "\n".join(depth_lines) + "\n"
    )
    (d / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")

    out = convert_tum(str(d), str(tmp_path / "seq.npz"))
    ds = RGBDDataset(out)
    assert len(ds) == 3
    for i in range(3):
        t, depth, gray = ds.frame(i)
        np.testing.assert_allclose(depth, true_depths[i], atol=1e-4)
        np.testing.assert_array_equal(gray, true_grays[i])
    # max_frames truncation
    out2 = convert_tum(str(d), str(tmp_path / "seq2.npz"), max_frames=2)
    assert len(RGBDDataset(out2)) == 2


def test_pure_python_png_decoder_16bit(tmp_path):
    """_load_png_py must decode the same fixtures as the native fast path
    (it is the fallback when librfsio is unavailable)."""
    from monorfs_tpu.frontend.dataset import _load_png_py

    rng = np.random.default_rng(8)
    d16 = rng.integers(0, 65535, size=(16, 20)).astype(np.uint16)
    p = tmp_path / "d.png"
    _write_png(p, d16, bitdepth=16)
    out = _load_png_py(p.read_bytes())
    np.testing.assert_array_equal(out, d16)

    rgb = rng.integers(0, 255, size=(16, 20, 3)).astype(np.uint8)
    p2 = tmp_path / "c.png"
    _write_png(p2, rgb)
    np.testing.assert_array_equal(_load_png_py(p2.read_bytes()), rgb)
