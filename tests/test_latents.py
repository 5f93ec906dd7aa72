"""Precomputed-latent training (data/latents.py + the training_loss moments
branch): the encode/sample split must be exact, the cached pipeline must
reproduce the on-the-fly latents, and the train app must run end-to-end
from caches (the ~30%-of-step frozen-encode removal, docs/STATE.md r4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mudg_tpu.nn import vae as V


def tiny_vcfg():
    return V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)


def test_moments_split_matches_encode():
    """encode_video == sample_scaled(encode_moments_video) bit-for-bit for
    both the sampling and mode paths (the cacheable split)."""
    cfg = tiny_vcfg()
    params = V.init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 24, 3),
                           minval=-1, maxval=1)
    m = V.encode_moments_video(params, cfg, x, chunk=0)
    for rng in (None, jax.random.PRNGKey(2)):
        z_ref = V.encode_video(params, cfg, x, rng=rng, chunk=0)
        z_got = V.sample_scaled(cfg, m, rng=rng)
        np.testing.assert_array_equal(np.asarray(z_ref), np.asarray(z_got))


def _items_for(scene, tmp_path, n=4):
    from mudg_tpu.apps.make_conditions import render_scene_conditions
    from mudg_tpu.data.waymo import write_items

    render_scene_conditions(scene, ("camera_FRONT",))
    cam = "camera_FRONT"
    item = {
        "frames": [f"{i:08d}.jpg" for i in range(4)],
        "dense_color_base": os.path.join(scene, "images", cam),
        "sparse_color_base": os.path.join(scene, "sparse", cam),
        "dense_semantic_base": os.path.join(scene, "semantic_dense", cam),
        "dense_depth_base": os.path.join(scene, "six_frames_depth", cam),
        "sparse_depth_base": os.path.join(scene, "depth", cam),
    }
    items_path = str(tmp_path / "items.txt")
    write_items(items_path, [item] * n)
    return items_path


def test_precompute_matches_on_the_fly(scene, tmp_path):
    """The cached pipeline (precompute -> WaymoDataset(latents=True) ->
    sample_scaled) reproduces the pixel pipeline's latents: mode-latents
    match to the f16 storage tolerance, and the frame-0 splice carries the
    dense color frame's moment into the sparse stack."""
    from mudg_tpu.data import latents as L
    from mudg_tpu.data.waymo import WaymoDataset, read_items

    cfg = tiny_vcfg()
    vae = V.init_vae(jax.random.PRNGKey(0), cfg)
    res = (32, 64)
    items_path = _items_for(scene, tmp_path)
    items = read_items(items_path)

    n = L.precompute(items, vae, cfg, res, batch=4, log=None)
    assert n > 0
    # idempotent: second run writes nothing
    assert L.precompute(items, vae, cfg, res, batch=4, log=None) == 0

    ds_px = WaymoDataset(items_path, video_length=4, resolution=res)
    ds_z = WaymoDataset(items_path, video_length=4, resolution=res,
                        latents=True)
    it_px = ds_px.load_item(0, task="color")
    it_z = ds_z.load_item(0, task="color")

    for key_px, key_z in (("dense_frames", "dense_moments"),
                          ("sparse_frames", "sparse_moments"),
                          ("sparse_depth", "depth_moments")):
        z_ref = V.encode_video(
            vae, cfg, jnp.asarray(it_px[key_px])[None].astype(jnp.bfloat16),
            rng=None, chunk=0)[0]
        z_got = V.sample_scaled(cfg, jnp.asarray(it_z[key_z])[None],
                                rng=None)[0]
        d = float(jnp.max(jnp.abs(z_ref.astype(jnp.float32) - z_got)))
        scale = float(jnp.max(jnp.abs(z_ref.astype(jnp.float32)))) + 1e-9
        assert d / scale < 0.05, (key_z, d, scale)
    # frame-0 splice: sparse moment 0 == dense color frame-0 moment
    np.testing.assert_array_equal(it_z["sparse_moments"][0],
                                  np.load(L.latent_path(
                                      ds_z._paths(ds_z.items[0],
                                                  "dense_color_base")[0],
                                      res, "b")).astype(np.float32))
    assert it_z["sparse_frame0"].shape == (32, 64, 3)


def test_train_app_latents_end_to_end(scene, tmp_path):
    """precompute-latents CLI -> train-mdm --latents: 2 finite steps from
    moment caches only (the training step never runs the VAE encoder), with
    --sample_every exercising the moments path of sample logging (cached
    posterior moments decoded in place of pixel conditions)."""
    from mudg_tpu.apps import precompute_latents, train_mdm

    items_path = _items_for(scene, tmp_path, n=6)
    precompute_latents.main([
        "--items", items_path, "--preset", "tiny",
        "--height", "32", "--width", "64", "--batch", "4",
    ])
    out_dir = str(tmp_path / "run")
    train_mdm.main([
        "--items", items_path, "--out", out_dir, "--preset", "tiny",
        "--height", "32", "--width", "64", "--video_length", "4",
        "--batch_size", "2", "--accum", "1", "--max_steps", "2",
        "--ckpt_every", "2", "--log_every", "1", "--latents",
        "--sample_every", "2",
    ])
    import json
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    assert any("loss" in l and np.isfinite(l["loss"]) for l in lines)
    assert os.path.exists(os.path.join(out_dir, "samples", "step_2.mp4"))
