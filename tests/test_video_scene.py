"""VideoClipDataset (WebVid-style legacy path) and the SceneReader API."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mudg_tpu.data.video import VideoClipDataset, read_video_frames, video_frame_count
from mudg_tpu.data.scene import SceneReader


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    if not w.isOpened():
        pytest.skip("no mp4 codec available")
    for i in range(40):
        frame = np.full((48, 64, 3), i * 6, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_read_specific_frames(sample_video):
    assert video_frame_count(sample_video) == 40
    frames = read_video_frames(sample_video, [0, 10, 20])
    assert frames.shape == (3, 48, 64, 3)
    # brightness increases with frame index (codec-lossy, so compare means)
    means = frames.mean(axis=(1, 2, 3))
    assert means[0] < means[1] < means[2]


def test_video_clip_dataset(sample_video):
    ds = VideoClipDataset([sample_video], captions=["road"], video_length=8,
                          resolution=(32, 32), frame_stride=4)
    item = ds[0]
    assert item["dense_frames"].shape == (8, 32, 32, 3)
    assert -1.0 <= item["dense_frames"].min() and item["dense_frames"].max() <= 1.0
    assert item["caption"] == "road"
    assert 1 <= item["frame_stride"] <= 4
    assert item["fps"] >= 1


def test_scene_reader(scene):
    r = SceneReader(scene)
    assert "camera_FRONT" in r.camera_names
    assert r.n_frames() == 4
    cam = r.camera("camera_FRONT", 0)
    assert cam.hw == (64, 96)
    assert cam.K.shape == (3, 3) and cam.c2w.shape == (4, 4)
    img = r.image("camera_FRONT", 0)
    assert img.shape == (64, 96, 3)
    objs = r.objects_info()
    assert objs[0]["id"] == "car0"
    xyz, rgb, _ = r.background_cloud()
    assert xyz.shape[1] == 3 and len(xyz) > 1000
    # derived modality paths follow the pipeline layout
    assert r.sparse_path("camera_FRONT", 3).endswith("sparse/camera_FRONT/00000003.jpg")
    assert r.depth_path("camera_FRONT", 1, virtual=2).endswith(
        "virtual_depth/camera_FRONT/00000001_2.npy")
