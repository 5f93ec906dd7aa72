"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates on real TPU
separately). The axon sitecustomize pins JAX_PLATFORMS=axon, so we must
override through jax.config, before any backend is initialized."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: XLA compiles route through a slow remote
# service in this environment, and compile time dominates the suite (~30 min
# cold). With the cache, repeat runs skip every unchanged compile.
# Delete .jax_test_cache if the host ever SIGILLs on a cached executable
# (the compile service machine advertises more ISA features than the host).
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# shared synthetic scene fixture (see tests/test_data_pipeline.py for the
# consumers): a colored point-cloud wall + camera track + per-frame images
# ---------------------------------------------------------------------------
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="session")
def scene(tmp_path_factory):
    """Build a minimal processed-scene directory: a colored point cloud,
    camera track, per-frame images, sparse/depth condition dirs."""
    import cv2
    import os
    from mudg_tpu.render import pointcloud as PC
    from mudg_tpu.utils import media
    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    n_frames, h, w = 4, 64, 96
    cam = "camera_FRONT"

    # camera track moving forward along +z (OpenCV convention)
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]])
    c2ws, hws, intrs = [], [], []
    for i in range(n_frames):
        c2w = np.eye(4)
        c2w[2, 3] = i * 0.5
        c2ws.append(c2w)
        hws.append((h, w))
        intrs.append(K)

    scenario = {
        "observers": {
            cam: {"class_name": "Camera", "n_frames": n_frames,
                  "data": {"hw": hws, "intr": intrs, "c2w": c2ws}},
            "lidar_TOP": {"n_frames": n_frames},
        }
    }
    with open(root / "scenario.pt", "wb") as f:
        pickle.dump(scenario, f)

    # background cloud: a wall of colored points at z=8
    gx, gy = np.meshgrid(np.linspace(-4, 4, 60), np.linspace(-2.5, 2.5, 40))
    xyz = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 8.0)], 1).astype(np.float32)
    rgb = rng.random((len(xyz), 3)).astype(np.float32) * 0.7 + 0.3
    os.makedirs(root / "objects", exist_ok=True)
    PC.store_ply(str(root / "objects" / "background.ply"), xyz, (rgb * 255).astype(np.uint8))

    obj_info = [{
        "id": "car0",
        "visibility": np.ones(n_frames, np.int64),
        "transform_obj": [np.eye(4) @ np.diag([1, 1, 1, 1.0]) for _ in range(n_frames)],
        "point_cloud": {
            "points": rng.normal(0, 0.3, (50, 3)).astype(np.float32) + [0.5, 0, 5.0],
            "colors": np.full((50, 3), 0.6, np.float32),
        },
    }]
    with open(root / "objects_info.pkl", "wb") as f:
        pickle.dump(obj_info, f)

    # dense camera images
    img_dir = root / "images" / cam
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_frames):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:08d}.jpg"), img)
    # dense semantic images
    sem_dir = root / "semantic_dense" / cam
    os.makedirs(sem_dir, exist_ok=True)
    for i in range(n_frames):
        ids = rng.integers(0, 19, (h, w))
        cv2.imwrite(str(sem_dir / f"{i:08d}.jpg"),
                    media.encode_semantic(ids)[:, :, ::-1])
    # dense depth npys
    dd = root / "six_frames_depth" / cam
    os.makedirs(dd, exist_ok=True)
    for i in range(n_frames):
        np.save(str(dd / f"{i:08d}.npy"), rng.random((h, w)).astype(np.float32) * 60)
    return str(root)




# ---------------------------------------------------------------------------
# test tiers: e2e app tests that each cost ~1-2 min of REAL execution (orbax
# IO, multi-step CLI invocations on the 1-core host) are marked slow and
# skipped by default so the iteration suite stays fast. Full (release-gate)
# run: `python -m pytest tests/ -q --slow`.
# ---------------------------------------------------------------------------
def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (full release-gate suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: e2e app test skipped unless --slow is given")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("MUDG_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow e2e tier — run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
