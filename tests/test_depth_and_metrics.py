"""Depth densification math, PFM I/O, segmentation driver, quality metrics."""
import os

import numpy as np
import pytest

from mudg_tpu.data import depth_tools as DT
from mudg_tpu.data import segmentation as SEG
from mudg_tpu.utils import metrics as MET


def test_align_depth_recovers_scale_shift():
    rng = np.random.default_rng(0)
    true = rng.random((32, 32)).astype(np.float32) * 50 + 5
    pred_rel = (true - 3.0) / 2.0  # relative depth: scale 2, shift 3
    sparse = np.zeros_like(true)
    idx = rng.integers(0, 32, (2, 60))
    sparse[idx[0], idx[1]] = true[idx[0], idx[1]]
    aligned, (a, b) = DT.align_depth(pred_rel, sparse)
    np.testing.assert_allclose(a, 2.0, rtol=1e-4)
    np.testing.assert_allclose(b, 3.0, atol=1e-3)
    np.testing.assert_allclose(aligned, true, atol=1e-2)


def test_fill_sky_and_clamp():
    depth = np.full((8, 8), 30.0, np.float32)
    sem = np.zeros((8, 8), np.int64)
    sem[:2] = DT.SKY_CLASS
    out = DT.fill_sky(depth, sem)
    assert np.all(out[:2] == 100.0) and np.all(out[2:] == 30.0)
    assert DT.clamp_metric(np.array([150.0]))[0] == 100.0


def test_densify_classical_fills_holes():
    sparse = np.zeros((24, 24), np.float32)
    sparse[::4, ::4] = 10.0  # regular lidar-like grid
    dense = DT.densify_classical(sparse, iterations=50)
    assert np.all(dense > 0)  # every hole filled
    np.testing.assert_allclose(dense[::4, ::4], 10.0, atol=1e-5)  # pins known
    assert abs(dense.mean() - 10.0) < 1.0


def test_densify_depth_map_pipeline():
    sparse = np.zeros((16, 16), np.float32)
    sparse[::2, ::2] = 20.0
    sem = np.zeros((16, 16), np.int64)
    sem[0] = DT.SKY_CLASS
    out = DT.densify_depth_map(sparse, sem)
    assert out.shape == (16, 16)
    assert np.all(out[0] == 100.0)  # sky
    assert np.all((out >= 0) & (out <= 100))


def test_pfm_roundtrip(tmp_path):
    data = np.random.default_rng(0).integers(0, 19, (20, 30)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    SEG.write_pfm(path, data)
    back, scale = SEG.read_pfm(path)
    np.testing.assert_array_equal(back, data)
    assert scale == 1.0


def test_segment_frames_with_stub_predictor(tmp_path, scene):
    cam = "camera_FRONT"
    out_root = str(tmp_path / "semantic")
    pal_root = str(tmp_path / "semantic_rgb")

    def stub_predictor(img):
        return (img[:, :, 0] > 128).astype(np.int64) * 10  # fake 2-class seg

    n = SEG.segment_frames(
        os.path.join(scene, "images", cam), out_root, cam, stub_predictor,
        palette_dir=pal_root,
    )
    assert n == 4
    ids, _ = SEG.read_pfm(os.path.join(out_root, cam, "seg", "00000000.pfm"))
    assert set(np.unique(ids)).issubset({0.0, 10.0})
    assert os.path.exists(os.path.join(pal_root, cam, "00000000.jpg"))


def test_segment_app_cli(tmp_path, scene, monkeypatch):
    """apps/segment (pipeline_segment.py CLI equivalent): drives the
    predictor over the scene cameras and writes pfm + palette outputs;
    exits 1 when no weights resolve."""
    from mudg_tpu.apps import segment as APP

    def stub_loader(model_path=None):
        return lambda img: (img[:, :, 0] > 128).astype(np.int64) * 7

    import mudg_tpu.data.segmentation as SEGMOD

    # the app does a call-time `from ..data.segmentation import ...`, so
    # patching the source module attribute is sufficient
    monkeypatch.setattr(SEGMOD, "load_segformer_predictor", stub_loader)

    out_root = str(tmp_path / "sem")
    # --no_palette: the session-scoped scene fixture's semantic_dense/ GT
    # must not be overwritten for later tests
    rc = APP.main(["--scene", scene, "--out", out_root, "--no_palette"])
    assert rc == 0
    ids, _ = SEG.read_pfm(
        os.path.join(out_root, "camera_FRONT", "seg", "00000000.pfm"))
    assert set(np.unique(ids)).issubset({0.0, 7.0})

    # no weights -> clean failure exit code (not an exception)
    monkeypatch.setattr(SEGMOD, "load_segformer_predictor",
                        lambda model_path=None: None)
    rc = APP.main(["--scene", scene, "--out", out_root, "--no_palette"])
    assert rc == 1


def test_psnr_and_ssim():
    a = np.zeros((16, 16, 3))
    assert MET.psnr(a, a) == float("inf")
    b = a + 0.1
    # MSE 0.01 over range 2 -> 10*log10(4/0.01) = 26.02
    np.testing.assert_allclose(MET.psnr(a, b), 26.02, atol=0.01)
    assert MET.ssim(np.random.rand(16, 16, 3), np.random.rand(16, 16, 3)) < 1.0
    m, per = MET.video_psnr(np.zeros((2, 4, 4, 3)), np.full((2, 4, 4, 3), 0.1))
    assert len(per) == 2


def test_eval_nvs_app(tmp_path):
    import cv2
    from mudg_tpu.apps import eval_nvs

    d = tmp_path / "virtual_color"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        gt = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        noisy = np.clip(gt.astype(int) + rng.integers(-8, 8, gt.shape), 0, 255).astype(np.uint8)
        cv2.imwrite(str(d / f"color_gt_{i}.png"), gt)
        cv2.imwrite(str(d / f"color_re_{i}.png"), noisy)
    out = str(tmp_path / "frames.jsonl")
    summary = eval_nvs.main(["--dir", str(d), "--out", out])
    assert summary["n_frames"] == 3
    assert 20 < summary["psnr_mean"] < 50
    import json
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 3 and all("ssim" in r for r in rows)


def test_depth_metrics_and_miou():
    gt = np.array([[1.0, 2.0], [4.0, 0.0]])  # one invalid pixel
    pred = gt * 1.1
    m = MET.depth_metrics(pred, gt)
    np.testing.assert_allclose(m["abs_rel"], 0.1, atol=1e-6)
    assert m["delta1"] == 1.0 and m["n_valid"] == 3
    m2 = MET.depth_metrics(gt * 2.0, gt)
    assert m2["delta1"] == 0.0

    pred_ids = np.array([[0, 1], [1, 2]])
    gt_ids = np.array([[0, 1], [2, 2]])
    r = MET.miou(pred_ids, gt_ids, 19)
    # class0: 1/1, class1: 1/2, class2: 1/2 -> mIoU 2/3; acc 3/4
    np.testing.assert_allclose(r["miou"], 2 / 3, atol=1e-6)
    np.testing.assert_allclose(r["pixel_acc"], 0.75, atol=1e-6)
    assert r["n_classes_present"] == 3


def test_eval_nvs_depth_and_semantic(tmp_path):
    import cv2
    from mudg_tpu.apps import eval_nvs
    from mudg_tpu.utils import media

    # depth: predictions 10% off the GT npys
    d = tmp_path / "virtual_depth"
    d.mkdir()
    gtd = tmp_path / "six_frames_depth"
    gtd.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        gt = rng.uniform(1, 80, (16, 24)).astype(np.float32)
        np.save(str(gtd / f"{i:08d}.npy"), gt)
        np.save(str(d / f"depth_re_{i}.npy"), gt * 1.1)
    s = eval_nvs.main(["--dir", str(d), "--task", "depth",
                       "--gt_depth", str(gtd)])
    assert s["n_frames"] == 2
    np.testing.assert_allclose(s["abs_rel_mean"], 0.1, atol=1e-3)
    assert s["delta1_mean"] == 1.0

    # semantic: palette-encoded ids, one of four pixels flipped
    sd = tmp_path / "virtual_semantic"
    sd.mkdir()
    ids_gt = rng.integers(0, 19, (16, 24))
    ids_re = ids_gt.copy()
    ids_re[::2, ::2] = (ids_re[::2, ::2] + 1) % 19
    cv2.imwrite(str(sd / "semantic_gt_0.png"),
                media.encode_semantic(ids_gt)[:, :, ::-1].astype(np.uint8))
    cv2.imwrite(str(sd / "semantic_re_0.png"),
                media.encode_semantic(ids_re)[:, :, ::-1].astype(np.uint8))
    s2 = eval_nvs.main(["--dir", str(sd), "--task", "semantic"])
    assert s2["n_frames"] == 1
    np.testing.assert_allclose(s2["pixel_acc_mean"], 0.75, atol=0.01)
    assert 0 < s2["miou_mean"] < 1


# ---------------------------------------------------------------------------
# LPIPS (utils/lpips.py)
# ---------------------------------------------------------------------------

def _lpips_torch_sd(rng):
    """Random-valued torch state dict in the lpips-pip key layout
    (net.sliceK.N.* + linK.model.1.weight)."""
    import torch

    convs = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
             (256, 256, 3)]
    idx = [0, 3, 6, 8, 10]
    sd = {}
    for i, ((ci, co, k), ix) in enumerate(zip(convs, idx)):
        sd[f"net.slice{i + 1}.{ix}.weight"] = torch.tensor(
            rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.05)
        sd[f"net.slice{i + 1}.{ix}.bias"] = torch.tensor(
            rng.normal(size=(co,)).astype(np.float32) * 0.01)
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(size=(1, co, 1, 1))).astype(np.float32))
    return sd


def test_lpips_basic_properties():
    import jax
    import jax.numpy as jnp

    from mudg_tpu.utils import lpips as LP

    params = LP.init_lpips(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d_aa = np.asarray(jax.jit(LP.lpips)(params, a, a))
    d_ab = np.asarray(jax.jit(LP.lpips)(params, a, b))
    d_ba = np.asarray(jax.jit(LP.lpips)(params, b, a))
    assert d_aa.shape == (2,)
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-6)
    assert np.all(d_ab > 1e-4)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_lpips_load_and_torch_oracle(tmp_path):
    """load_lpips parses the lpips-pip key layout and the JAX forward matches
    a from-scratch torch implementation of the published LPIPS recipe."""
    import torch
    import torch.nn.functional as TF
    import jax

    from mudg_tpu.utils import lpips as LP

    rng = np.random.default_rng(3)
    sd = _lpips_torch_sd(rng)
    path = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, path)
    params = LP.load_lpips(path)
    assert params is not None

    a = rng.uniform(-1, 1, (1, 48, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 48, 64, 3)).astype(np.float32)
    d_jax = np.asarray(jax.jit(LP.lpips)(params, a, b))

    def feats_torch(x):
        h = torch.tensor(x.transpose(0, 3, 1, 2))  # NCHW
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        h = (h - shift) / scale
        taps = []
        specs = [(1, 0, 4, 2), (2, 3, 1, 2), (3, 6, 1, 1), (4, 8, 1, 1),
                 (5, 10, 1, 1)]
        for i, (sl, ix, s, p) in enumerate(specs):
            w = sd[f"net.slice{sl}.{ix}.weight"]
            bb = sd[f"net.slice{sl}.{ix}.bias"]
            h = TF.relu(TF.conv2d(h, w, bb, stride=s, padding=p))
            taps.append(h)
            if i < 2:
                h = TF.max_pool2d(h, 3, 2)
        return taps

    fa, fb = feats_torch(a), feats_torch(b)
    d_ref = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        w = sd[f"lin{i}.model.1.weight"]
        d_ref = d_ref + TF.conv2d((na - nb) ** 2, w).mean(dim=(1, 2, 3))
    d_ref = d_ref.numpy()
    np.testing.assert_allclose(d_jax, d_ref, rtol=2e-4, atol=1e-6)

    # torchvision-style dict (features.N.*, no lin heads) degrades to
    # uniform heads rather than failing
    sd2 = {k.replace(f"net.slice{sl}.", "features."): v
           for k, v in sd.items() if k.startswith("net.")
           for sl in [int(k.split(".")[1][5:])] }
    path2 = str(tmp_path / "alexnet.pth")
    torch.save(sd2, path2)
    p2 = LP.load_lpips(path2)
    assert p2 is not None
    d2 = np.asarray(LP.lpips(p2, a, a))
    np.testing.assert_allclose(d2, 0.0, atol=1e-6)

    # absent path -> None (eval reports lpips: null)
    assert LP.load_lpips(str(tmp_path / "missing.pth")) is None


def test_eval_nvs_lpips_key(tmp_path):
    """eval_nvs --lpips emits the lpips metric; without weights it doesn't."""
    import cv2
    import torch

    from mudg_tpu.apps import eval_nvs

    d = tmp_path / "virtual_color"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        gt = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        noisy = np.clip(gt.astype(int) + rng.integers(-30, 30, gt.shape),
                        0, 255).astype(np.uint8)
        cv2.imwrite(str(d / f"color_gt_{i}.png"), gt)
        cv2.imwrite(str(d / f"color_re_{i}.png"), noisy)
    path = str(tmp_path / "lpips.pth")
    torch.save(_lpips_torch_sd(rng), path)
    s = eval_nvs.main(["--dir", str(d), "--lpips", path])
    assert s["lpips_mean"] is not None and s["lpips_mean"] > 0
    s0 = eval_nvs.main(["--dir", str(d)])
    assert "lpips_mean" not in s0
