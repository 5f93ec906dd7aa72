"""Waymo Frame wire decoder + full no-TF ETL tests.

The encoder here is written independently of mudg_tpu/data/waymo_proto.py
(separate varint/tag code paths) so the decode tests actually cross-check the
wire mechanics rather than inverting the same functions.
"""
from __future__ import annotations

import io
import struct
import zlib

import numpy as np
import pytest

from mudg_tpu.data import waymo_etl as ETL
from mudg_tpu.data import waymo_proto as WP


# ---------------------------------------------------------------------------
# independent mini encoder (proto wire format)
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = b""
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wt: int) -> bytes:
    return _varint(field << 3 | wt)


def f_varint(field, v):
    return _tag(field, 0) + _varint(v)


def f_double(field, v):
    return _tag(field, 1) + struct.pack("<d", v)


def f_bytes(field, v: bytes):
    return _tag(field, 2) + _varint(len(v)) + v


def f_packed_doubles(field, vals):
    return f_bytes(field, b"".join(struct.pack("<d", v) for v in vals))


def f_packed_floats(field, vals):
    return f_bytes(field, b"".join(struct.pack("<f", v) for v in vals))


def f_packed_varints(field, vals):
    return f_bytes(field, b"".join(_varint(v) for v in vals))


def enc_transform(mat: np.ndarray) -> bytes:
    return f_packed_doubles(1, np.asarray(mat, np.float64).reshape(-1))


def enc_matrix_float(arr: np.ndarray) -> bytes:
    shape = f_packed_varints(1, list(arr.shape))
    return f_packed_floats(1, arr.reshape(-1).tolist()) + f_bytes(2, shape)


def enc_range_image(arr: np.ndarray, pose: np.ndarray | None = None) -> bytes:
    out = f_bytes(2, zlib.compress(enc_matrix_float(arr)))
    if pose is not None:
        out += f_bytes(4, zlib.compress(enc_matrix_float(pose)))
    return out


def enc_box(cx, cy, cz, length, width, height, heading) -> bytes:
    return (f_double(1, cx) + f_double(2, cy) + f_double(3, cz) +
            f_double(4, width) + f_double(5, length) + f_double(6, height) +
            f_double(7, heading))


def enc_label(oid, typ, box: bytes, speed=(0.0, 0.0)) -> bytes:
    meta = f_double(1, speed[0]) + f_double(2, speed[1])
    return (f_bytes(1, box) + f_bytes(2, meta) + f_varint(3, typ) +
            f_bytes(4, oid.encode()))


def _pose(tx, ty, tz, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = [tx, ty, tz]
    return m


def build_frame(frame_ind: int, n_frames: int = 3) -> bytes:
    """A wire-valid Frame: 1 camera, 2 lidars (TOP w/ pose image), 2 labels."""
    rng = np.random.default_rng(42 + frame_ind)
    v2w = _pose(2.0 * frame_ind + 5.0, 1.0, 0.5)

    cam_calib = (
        f_varint(1, 1)  # FRONT
        + f_packed_doubles(2, [100.0, 100.0, 32.0, 24.0, 0, 0, 0, 0, 0])
        + f_bytes(3, enc_transform(_pose(1.5, 0.0, 2.0)))
        + f_varint(4, 64) + f_varint(5, 48)
        + f_varint(6, 1)
    )
    top_calib = (
        f_varint(1, 1)  # TOP
        + f_packed_doubles(2, np.linspace(-0.3, 0.1, 8).tolist())
        + f_bytes(5, enc_transform(_pose(1.4, 0.0, 2.2, yaw=0.1)))
    )
    front_lidar_calib = (
        f_varint(1, 2)  # FRONT lidar: min/max inclinations only
        + f_double(3, -0.4) + f_double(4, 0.0)
        + f_bytes(5, enc_transform(_pose(4.0, 0.0, 0.6)))
    )
    context = (f_bytes(1, b"segment-test-0001")
               + f_bytes(2, cam_calib)
               + f_bytes(3, top_calib) + f_bytes(3, front_lidar_calib))

    # tiny but real JPEG payload
    import cv2

    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    cam_image = (
        f_varint(1, 1) + f_bytes(2, jpg.tobytes())
        + f_bytes(3, enc_transform(v2w))
        + f_double(5, 10.0 + 0.1 * frame_ind)  # pose_timestamp
        + f_double(6, 0.01) + f_double(7, 10.0) + f_double(8, 10.05)
    )

    # TOP range image 8x16 with a pose image (valid everywhere except col 0)
    ri = np.zeros((8, 16, 4), np.float32)
    ri[..., 0] = rng.uniform(5.0, 40.0, (8, 16)).astype(np.float32)
    ri[2, 3, 0] = -1.0  # an invalid return
    pose_img = np.zeros((8, 16, 6), np.float32)
    pose_img[..., 3:] = v2w[:3, 3] + rng.normal(0, 0.01, (8, 16, 3))
    pose_img[..., 0] = 0.01  # roll (valid pixels need all-nonzero channels:
    pose_img[..., 1] = 0.02  # pitch  preprocess.py:366 masks on reduce_all!=0)
    pose_img[..., 2] = 0.05  # yaw
    pose_img[:, 0, :] = 0.0  # invalid pixels
    top_laser = f_varint(1, 1) + f_bytes(2, enc_range_image(ri, pose_img))

    ri2 = np.zeros((4, 10, 4), np.float32)
    ri2[..., 0] = rng.uniform(2.0, 20.0, (4, 10)).astype(np.float32)
    front_laser = f_varint(1, 2) + f_bytes(2, enc_range_image(ri2))

    moving = enc_label(
        "obj-moving", 1,
        enc_box(10.0 + 1.0 * frame_ind, 0.0, 1.0, 4.5, 2.0, 1.6, 0.3),
        speed=(3.0, 0.0))
    # world-static pedestrian: counter-move in the vehicle frame so its world
    # location stays fixed at (-5, 2, 1)
    static = enc_label(
        "obj-static", 2,
        enc_box(-5.0 - (2.0 * frame_ind + 5.0), 2.0 - 1.0, 1.0 - 0.5,
                0.8, 0.8, 1.8, 0.0))

    frame = (
        f_bytes(1, context)
        + f_varint(2, 1_600_000_000_000_000 + frame_ind * 100_000)
        + f_bytes(3, enc_transform(v2w))
        + f_bytes(4, cam_image)
        + f_bytes(5, top_laser) + f_bytes(5, front_laser)
        + f_bytes(6, moving) + f_bytes(6, static)
        # unknown fields must be skipped: one varint + one length-delimited
        + f_varint(11, 7) + f_bytes(12, b"future-field")
    )
    return frame


def write_tfrecord(path: str, records: list[bytes]):
    with open(path, "wb") as f:
        for rec in records:
            f.write(struct.pack("<Q", len(rec)))
            f.write(b"\0" * 4)           # length crc (readers skip)
            f.write(rec)
            f.write(b"\0" * 4)           # data crc


# ---------------------------------------------------------------------------
# decoder unit tests
# ---------------------------------------------------------------------------

def test_parse_frame_fields_roundtrip():
    fr = WP.parse_frame(build_frame(1))
    assert fr.context.name == "segment-test-0001"
    assert fr.timestamp_micros == 1_600_000_000_000_000 + 100_000

    np.testing.assert_allclose(fr.pose, _pose(7.0, 1.0, 0.5), atol=1e-12)

    [cam] = fr.context.camera_calibrations
    assert (cam.width, cam.height) == (64, 48)
    assert cam.rolling_shutter_direction == 1
    np.testing.assert_allclose(cam.intrinsic[:4], [100, 100, 32, 24])
    np.testing.assert_allclose(cam.extrinsic, _pose(1.5, 0, 2.0))

    top, front = sorted(fr.context.laser_calibrations, key=lambda c: c.name)
    assert len(top.beam_inclinations) == 8
    assert front.beam_inclination_min == pytest.approx(-0.4)
    assert len(front.beam_inclinations) == 0

    [img] = fr.images
    assert img.name == 1 and img.image[:2] == b"\xff\xd8"  # JPEG SOI
    assert img.pose_timestamp == pytest.approx(10.1)
    assert img.shutter == pytest.approx(0.01)

    lasers = {l.name: l for l in fr.lasers}
    ri = lasers[1].ri_return1.matrix()
    assert ri.shape == (8, 16, 4)
    assert ri[2, 3, 0] == -1.0
    pose_img = WP.decode_compressed_matrix(
        lasers[1].ri_return1.range_image_pose_compressed)
    assert pose_img.shape == (8, 16, 6)
    assert lasers[2].ri_return1.range_image_pose_compressed == b""

    labels = {l.id: l for l in fr.laser_labels}
    mv = labels["obj-moving"]
    assert mv.type == 1
    assert mv.box.length == pytest.approx(4.5)
    assert mv.box.width == pytest.approx(2.0)
    assert mv.box.heading == pytest.approx(0.3)
    assert mv.metadata.speed_x == pytest.approx(3.0)


def test_unpacked_repeated_scalars_accepted():
    # same repeated double field written unpacked (wt 1 per element)
    unpacked = b"".join(f_double(1, v) for v in [1.0, 2.0, 3.0])
    vals: list = []
    for f, wt, v in WP.iter_fields(unpacked):
        WP._repeated_double(vals, wt, v)
    assert vals == [1.0, 2.0, 3.0]


def test_negative_int32_varint():
    buf = f_varint(4, (1 << 64) - 5)  # -5 sign-extended, as protobuf encodes
    [(f, wt, v)] = list(WP.iter_fields(buf))
    assert WP._signed32(v) == -5


# ---------------------------------------------------------------------------
# end-to-end ETL on a synthetic wire-valid tfrecord
# ---------------------------------------------------------------------------

def test_process_sequence_end_to_end(tmp_path):
    rec_path = str(tmp_path / "seq.tfrecord")
    n = 4
    write_tfrecord(rec_path, [build_frame(i, n) for i in range(n)])

    out = str(tmp_path / "scene")
    scenario = ETL.process_sequence(rec_path, out)

    assert scenario["scene_id"] == "segment-test-0001"
    metas = scenario["metas"]
    assert metas["n_frames"] == n
    # world offset = frame0 translation
    np.testing.assert_allclose(metas["world_offset"], [5.0, 1.0, 0.5])

    obs = scenario["observers"]
    cam = obs["camera_FRONT"]
    assert cam["n_frames"] == n
    assert cam["data"]["c2w"].shape == (n, 4, 4)
    # frame 0 pose is offset to the origin: c2w = I @ c2v @ opencv_to_waymo
    np.testing.assert_allclose(
        cam["data"]["c2w"][0],
        _pose(1.5, 0, 2.0) @ ETL.OPENCV_TO_WAYMO, atol=1e-12)
    # timestamps offset by frame0's
    assert metas["frame_timestamps"][0] == 0.0
    assert cam["data"]["global_timestamps"][0] == pytest.approx(
        10.0 - 1_600_000_000_000_000 / 1e6)

    # images saved as valid jpegs
    import cv2

    img = cv2.imread(f"{out}/images/camera_FRONT/00000002.jpg")
    assert img is not None and img.shape == (48, 64, 3)

    # TOP lidar: masked rays + dpose; FRONT: full grid
    top = np.load(f"{out}/lidars/lidar_TOP/00000000.npz")
    n_valid = 8 * 16 - 8  # column 0 zeroed in the pose image
    assert top["rays_o"].shape == (1, n_valid, 3)
    assert top["rays_d"].shape == (1, n_valid, 3)
    assert top["ranges"].shape == (1, n_valid)
    assert top["dpose"].shape == (1, n_valid, 4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(top["rays_d"], axis=-1), 1.0, atol=1e-4)

    front = np.load(f"{out}/lidars/lidar_FRONT/00000000.npz")
    assert front["rays_d"].shape == (4, 10, 3)
    assert front["ranges"].shape == (4, 10)
    np.testing.assert_allclose(front["rays_o"], 0.0)

    # objects: moving vehicle crosses both dynamic filters, pedestrian static
    objects = scenario["objects"]
    seg = objects["obj-moving"]["segments"][0]
    assert seg["start_frame"] == 0 and seg["n_frames"] == n
    assert seg["data"]["transform"].shape == (n, 4, 4)
    np.testing.assert_allclose(seg["data"]["scale"][0], [4.5, 2.0, 1.6])
    # object world x advances by ego (2/frame) + box (1/frame)
    dx = seg["data"]["transform"][1][0, 3] - seg["data"]["transform"][0][0, 3]
    assert dx == pytest.approx(3.0, abs=1e-6)

    stats = metas["dynamic_stats"]
    assert "obj-moving" in stats["Vehicle"]["is_dynamic"]
    assert "obj-moving" in stats["Vehicle"]["by_speed"]
    assert "obj-moving" in stats["Vehicle"]["by_loc"]
    assert stats["Pedestrian"]["n_dynamic"] == 0

    # SceneReader consumes the output directly
    from mudg_tpu.data.scene import SceneReader

    sr = SceneReader(out)
    assert sr.n_frames("lidar_TOP") == n
    cf = sr.camera("camera_FRONT", 0)
    assert cf.hw == (48, 64)


def test_dynamic_stats_collectors():
    frames = [WP.parse_frame(build_frame(i)) for i in range(3)]
    cats, ego = ETL.collect_loc_motion(frames)
    assert ego.shape == (3, 3)
    assert len(cats["Vehicle"]["obj-moving"]["paths"]) == 3
    # moving object: 3 m/frame in world xy
    assert cats["Vehicle"]["obj-moving"]["motions"][1] == pytest.approx(3.0, abs=1e-6)
    speeds = ETL.collect_box_speed(frames)
    assert speeds["Vehicle"]["obj-moving"]["motions"][0] == pytest.approx(3.0)
    counts = ETL.count_all(frames)
    assert counts["Pedestrian"]["obj-static"] == 2  # 0-based like reference


# ---------------------------------------------------------------------------
# colmap points3D.bin reader + sfm/lidar merge (tools/merge_points.py)
# ---------------------------------------------------------------------------

def test_colmap_points3d_and_merge(tmp_path):
    from mudg_tpu.render import pointcloud as PC

    rng = np.random.default_rng(0)
    n = 17
    xyz = rng.normal(0, 10, (n, 3))
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    err = rng.random(n)

    # write a wire-valid points3D.bin with variable-length tracks
    bin_path = str(tmp_path / "points3D.bin")
    with open(bin_path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Qddd", i + 1, *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            tl = int(rng.integers(0, 4))
            f.write(struct.pack("<Q", tl))
            for t in range(tl):
                f.write(struct.pack("<ii", t, t * 2))

    x2, c2, e2 = PC.read_colmap_points3d_bin(bin_path)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(c2, rgb)
    np.testing.assert_allclose(e2, err)

    # lidar cloud + merge
    lidar_xyz = rng.normal(0, 5, (9, 3)).astype(np.float32)
    lidar_rgb = rng.integers(0, 256, (9, 3)).astype(np.uint8)
    lidar_ply = str(tmp_path / "pointcloud.ply")
    PC.store_ply(lidar_ply, lidar_xyz, lidar_rgb)

    merged_ply = str(tmp_path / "merged.ply")
    mx, mc = PC.merge_sfm_lidar(merged_ply, bin_path, lidar_ply)
    assert mx.shape == (n + 9, 3)
    rx, rc, _ = PC.fetch_ply(merged_ply)
    assert rx.shape == (n + 9, 3)
    np.testing.assert_allclose(rx[:9], lidar_xyz, atol=1e-5)
    np.testing.assert_allclose(rx[9:], xyz, atol=1e-4)
