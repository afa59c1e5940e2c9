"""IO round-trip tests: dmb, pfm, ply, calib readers, visualizations."""
import numpy as np
import pytest

from gipuma_tpu.io import calib, dmb, pfm, ply, vis


def test_dmb_roundtrip(tmp_path, rng):
    a = rng.normal(size=(13, 17)).astype(np.float32)
    p = tmp_path / "d.dmb"
    dmb.write_dmb(p, a)
    np.testing.assert_array_equal(dmb.read_dmb(p), a)
    # header layout check: type=1, h, w, nb little-endian int32
    raw = p.read_bytes()
    assert np.frombuffer(raw[:16], "<i4").tolist() == [1, 13, 17, 1]

    n = rng.normal(size=(5, 6, 3)).astype(np.float32)
    p2 = tmp_path / "n.dmb"
    dmb.write_dmb(p2, n)
    np.testing.assert_array_equal(dmb.read_dmb(p2), n)


def test_pfm_roundtrip(tmp_path, rng):
    a = rng.normal(size=(9, 11)).astype(np.float32)
    p = tmp_path / "d.pfm"
    pfm.write_pfm(p, a)
    np.testing.assert_array_equal(pfm.read_pfm(p), a)


def test_ply_roundtrip(tmp_path, rng):
    h, w = 8, 10
    depth = rng.uniform(1, 5, size=(h, w)).astype(np.float32)
    depth[0, 0] = 0.0  # invalid
    normals = rng.normal(size=(h, w, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    K = np.array([[50.0, 0, 5], [0, 50, 4], [0, 0, 1]])
    P = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    p = tmp_path / "c.ply"
    n = ply.write_ply(p, depth, normals, colors, P)
    assert n == h * w - 1
    pts, nrm, col = ply.read_ply(p)
    assert pts.shape == (n, 3)
    # Reproject a few points: P @ (X, 1) should give the pixel back.
    Xh = np.concatenate([pts, np.ones((n, 1))], axis=1)
    q = Xh @ P.T
    xy = q[:, :2] / q[:, 2:3]
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    valid = depth > 0
    np.testing.assert_allclose(xy[:, 0], xs[valid], atol=1e-3)
    np.testing.assert_allclose(xy[:, 1], ys[valid], atol=1e-3)
    np.testing.assert_allclose(q[:, 2], depth[valid], rtol=1e-5)


def test_read_P_file(tmp_path):
    p = tmp_path / "a.P"
    p.write_text("CONTOUR\n1 2 3 4\n5 6 7 8\n9 10 11 12\n")
    P = calib.read_P_file(p)
    np.testing.assert_array_equal(P, np.arange(1, 13).reshape(3, 4))


def test_read_krt_middlebury(tmp_path):
    K = [100, 0, 32, 0, 100, 24, 0, 0, 1]
    R = list(np.eye(3).ravel())
    t = [0.1, 0.2, 0.3]
    line = "img1.png " + " ".join(str(v) for v in K + R + t)
    f = tmp_path / "par.txt"
    f.write_text("1\n" + line + "\n")
    (P,) = calib.read_krt_file_middlebury(f, ["img1.png"])
    Km = np.array(K).reshape(3, 3)
    expect = Km @ np.hstack([np.eye(3), np.array(t)[:, None]])
    np.testing.assert_allclose(P, expect)


def test_read_kitti(tmp_path):
    f = tmp_path / "calib.txt"
    f.write_text("P0: " + " ".join(str(v) for v in range(12)) + "\n"
                 "P1: " + " ".join(str(v) for v in range(12, 24)) + "\n")
    P0, P1 = calib.read_calib_file_kitti(f)
    np.testing.assert_array_equal(P0, np.arange(12).reshape(3, 4))
    np.testing.assert_array_equal(P1, np.arange(12, 24).reshape(3, 4))


def test_vis_shapes(tmp_path, rng):
    depth = rng.uniform(1, 5, size=(16, 20)).astype(np.float32)
    normals = rng.normal(size=(16, 20, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    jet = vis.depth_to_jet(depth, 1.0, 5.0)
    assert jet.shape == (16, 20, 3) and jet.dtype == np.uint8
    npng = vis.normals_png(normals)
    assert npng.shape == (16, 20, 3)
    g16 = vis.disparity_to_gray16(depth, 5.0)
    assert g16.dtype == np.uint16
    vis.save_png(tmp_path / "d.png", jet)
    vis.save_png(tmp_path / "g16.png", g16)
    assert (tmp_path / "d.png").exists()


def test_bundler_range(tmp_path):
    # 1 camera, 2 points at distances 2 and 10 from origin.
    content = ["# Bundle file v0.3", "1 2"]
    content += ["0 0 0", "1 0 0", "0 1 0", "0 0 1", "0 0 0"]  # camera block
    content += ["0 0 2", "255 0 0", "0"]
    content += ["0 0 10", "0 255 0", "0"]
    f = tmp_path / "bundle.rd.out"
    f.write_text("\n".join(content) + "\n")
    dmin, dmax = calib.bundler_depth_range(f, np.zeros(3))
    assert dmin == pytest.approx(2 * 0.6)
    assert dmax == pytest.approx(10 * 1.2)


def test_native_io_roundtrip(tmp_path, rng):
    """Native C++ IO (when g++ builds) matches the python path exactly."""
    from gipuma_tpu.io import native
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    a = rng.normal(size=(9, 7, 3)).astype(np.float32)
    p = tmp_path / "n.dmb"
    assert native.write_dmb_native(p, a)
    np.testing.assert_array_equal(native.read_dmb_native(p), a)

    pts = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.uniform(0, 255, size=(100, 3)).astype(np.float32)
    pply = tmp_path / "n.ply"
    n = native.write_ply_native(pply, pts, nrm, col)
    assert n == 100
    rp, rn, rc = ply.read_ply(pply)
    np.testing.assert_allclose(rp, pts, rtol=1e-6)
    np.testing.assert_allclose(rn, nrm, rtol=1e-6)
    np.testing.assert_array_equal(rc, np.clip(col, 0, 255).astype(np.uint8))


def test_dmb_python_native_same_bytes(tmp_path, rng):
    from gipuma_tpu.io import native
    a = rng.normal(size=(5, 6)).astype(np.float32)
    p1 = tmp_path / "py.dmb"
    # force python path
    import gipuma_tpu.io.dmb as dmb_mod
    import struct
    with open(p1, "wb") as f:
        f.write(struct.pack("<iiii", 1, 5, 6, 1))
        f.write(a.astype("<f4").tobytes())
    if native.available():
        p2 = tmp_path / "nat.dmb"
        native.write_dmb_native(p2, a)
        assert p1.read_bytes() == p2.read_bytes()


def test_read_daisy(tmp_path):
    f = tmp_path / "cam.txt"
    f.write_text("# comment\np " + " ".join(str(v) for v in range(12)) + "\n")
    P = calib.read_calib_file_daisy(f)
    np.testing.assert_array_equal(P, np.arange(12).reshape(3, 4))


def _write_png(path, arr, depth):
    """Minimal PNG encoder (filter 0) for round-trip tests of the raw
    reader; arr uint [H,W] or [H,W,3]."""
    import struct
    import zlib

    arr = np.asarray(arr)
    h, w = arr.shape[:2]
    nch = 1 if arr.ndim == 2 else arr.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if depth == 16:
        px = arr.astype(">u2").tobytes()
    else:
        px = arr.astype(np.uint8).tobytes()
    stride = w * nch * depth // 8
    raw = b"".join(b"\x00" + px[y * stride:(y + 1) * stride]
                   for y in range(h))

    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                           ctype, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def test_load_image_raw_16bit_png(tmp_path):
    """imread(-1) analog: 16-bit grayscale and RGB PNGs keep their values
    (PIL alone collapses 16-bit RGB; GT workflows need the raw values)."""
    from gipuma_tpu.io.images import load_image_raw

    rng = np.random.default_rng(0)
    g16 = rng.integers(0, 65536, size=(7, 9), dtype=np.uint16)
    _write_png(tmp_path / "g16.png", g16, 16)
    np.testing.assert_array_equal(load_image_raw(tmp_path / "g16.png"),
                                  g16.astype(np.float32))

    c16 = rng.integers(0, 65536, size=(6, 5, 3), dtype=np.uint16)
    _write_png(tmp_path / "c16.png", c16, 16)
    np.testing.assert_array_equal(load_image_raw(tmp_path / "c16.png"),
                                  c16.astype(np.float32))

    c8 = rng.integers(0, 256, size=(4, 8, 3), dtype=np.uint8)
    _write_png(tmp_path / "c8.png", c8, 8)
    np.testing.assert_array_equal(load_image_raw(tmp_path / "c8.png"),
                                  c8.astype(np.float32))


def test_png_raw_filtered_rows(tmp_path):
    """The raw decoder must agree with PIL on PNGs using real row filters
    (PIL's encoder picks Sub/Up/Average/Paeth on natural images)."""
    from PIL import Image

    from gipuma_tpu.io.images import _read_png_raw

    rng = np.random.default_rng(1)
    base = np.cumsum(rng.integers(0, 3, size=(16, 20, 3)), axis=1)
    img = (base % 256).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "f.png")
    np.testing.assert_array_equal(_read_png_raw(str(tmp_path / "f.png")),
                                  img)


def test_decode_normal_map_16u(tmp_path):
    """GT normal decode (main.cpp:800-817): n*32767+32767 round-trips to
    unit normals; encoded-zero pixels stay (0,0,0)."""
    from gipuma_tpu.io.images import decode_normal_map_16u, load_image_raw

    n = np.zeros((5, 4, 3), np.float32)
    n[..., 2] = 1.0
    n[1, 1] = [0.6, 0.0, 0.8]
    n[2, 2] = [-0.36, 0.48, 0.8]
    enc = np.round(n * 32767 + 32767).astype(np.uint16)
    enc[3, 3] = 32767   # encoded zero-normal
    _write_png(tmp_path / "n.png", enc, 16)
    dec = decode_normal_map_16u(load_image_raw(tmp_path / "n.png"))
    np.testing.assert_allclose(dec[1, 1], [0.6, 0.0, 0.8], atol=1e-3)
    np.testing.assert_allclose(dec[2, 2], [-0.36, 0.48, 0.8], atol=1e-3)
    np.testing.assert_array_equal(dec[3, 3], [0.0, 0.0, 0.0])
    assert np.allclose(np.linalg.norm(dec[0, 0]), 1.0, atol=1e-4)
