"""Native C++ library: builds, and agrees with the numpy fallbacks."""
import numpy as np
import pytest

from mudg_tpu.utils import native as N


@pytest.fixture(scope="module")
def lib():
    lib = N.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def _tfrecord_bytes(payloads):
    out = b""
    for p in payloads:
        out += len(p).to_bytes(8, "little") + b"\x00" * 4 + p + b"\x00" * 4
    return out


def test_tfrecord_index(lib):
    payloads = [b"hello", b"world!!", b"x" * 100]
    data = _tfrecord_bytes(payloads)
    recs = N.tfrecord_index(data)
    assert len(recs) == 3
    for (off, ln), p in zip(recs, payloads):
        assert data[off : off + ln] == p


def test_tfrecord_index_fallback_matches(lib):
    data = _tfrecord_bytes([b"abc", b"defgh"])
    native = N.tfrecord_index(data)
    # force fallback
    saved, N._LIB = N._LIB, None
    try:
        fallback = N.tfrecord_index(data)
    finally:
        N._LIB = saved
    assert native == fallback


def test_voxel_downsample_matches_numpy(lib):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(5000, 3)).astype(np.float32) * 3
    rgb = rng.random((5000, 3)).astype(np.float32)
    nx, nc = N.voxel_downsample(xyz, rgb, 0.5)
    from mudg_tpu.render.pointcloud import voxel_downsample as np_vd

    px, pc = np_vd(xyz, rgb, 0.5)
    assert nx.shape == px.shape
    # order differs: compare as sorted sets of centroids
    ns = nx[np.lexsort(nx.T)]
    ps = px[np.lexsort(px.T)]
    np.testing.assert_allclose(ns, ps, atol=1e-4)


def test_transform_points(lib):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    mat = np.eye(4, dtype=np.float32)
    mat[:3, 3] = [1, 2, 3]
    theta = 0.3
    mat[:2, :2] = [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    out = N.transform_points(xyz, mat)
    expected = xyz @ mat[:3, :3].T + mat[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_points_in_box(lib):
    xyz = np.array([[0, 0, 0], [2, 0, 0], [0.9, 0.9, 0.9]], np.float32)
    w2b = np.eye(4, dtype=np.float32)
    mask = N.points_in_box(xyz, w2b, (1, 1, 1))
    np.testing.assert_array_equal(mask, [True, False, True])
