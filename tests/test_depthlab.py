"""DepthLab (SD2 dual-UNet depth inpainting) tests.

Covers the learned depth-densification stage the reference drives externally
(`data_process/depthlab_tools.py:446-490`): the diffusers-layout 2D UNet,
the ReferenceNet write/read attention protocol, diffusers-format weight
import (UNet + AutoencoderKL), and the end-to-end predictor behind
`data/depth_tools.densify_depth_map`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.models import depthlab, sd_unet2d
from mudg_tpu.nn import vae as VAE
from mudg_tpu.train import checkpoint as CKPT

TINY = sd_unet2d.SDUNetConfig(
    in_channels=6, out_channels=4, block_out_channels=(16, 32),
    layers_per_block=1, cross_attention_dim=24, head_dim=8,
    norm_num_groups=4,
)


def _n_attn_blocks(cfg):
    n = 0
    for i in range(cfg.num_levels):
        if cfg.level_has_attn_down(i):
            n += cfg.layers_per_block * cfg.transformer_depth
    n += cfg.transformer_depth  # mid
    for i in range(cfg.num_levels):
        if cfg.level_has_attn_up(i):
            n += (cfg.layers_per_block + 1) * cfg.transformer_depth
    return n


def test_sd_unet_forward_shapes():
    p = sd_unet2d.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 24))
    t = jnp.array([10, 500])
    out = sd_unet2d.apply(p, TINY, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_reference_write_read_identity():
    """Attending over KV = cat([x, ref]) with ref == x equals plain
    self-attention (duplicate keys halve each weight, the average is
    unchanged) — so reading a bank written by the SAME model on the SAME
    input must reproduce the plain forward. This pins the write/read
    pairing order and the concat axis."""
    cfg = sd_unet2d.SDUNetConfig(
        in_channels=4, out_channels=4, block_out_channels=(16, 32),
        layers_per_block=1, cross_attention_dim=24, head_dim=8,
        norm_num_groups=4,
    )
    p = sd_unet2d.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 24))
    t = jnp.array([123])

    plain = sd_unet2d.apply(p, cfg, x, t, ctx)
    out_w, bank = sd_unet2d.apply(p, cfg, x, t, ctx, ref_mode="write")
    assert len(bank) == _n_attn_blocks(cfg)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(plain), atol=1e-6)
    out_r = sd_unet2d.apply(p, cfg, x, t, ctx, ref_mode="read", ref_bank=bank)
    np.testing.assert_allclose(
        np.asarray(out_r), np.asarray(plain), rtol=2e-4, atol=2e-5)

    # a different reference must actually change the output
    bank2 = [b + 1.0 for b in bank]
    out_r2 = sd_unet2d.apply(p, cfg, x, t, ctx, ref_mode="read", ref_bank=bank2)
    assert float(jnp.abs(out_r2 - plain).max()) > 1e-3


def test_diffusers_unet_state_dict_roundtrip():
    """Export the pytree to torch layout under diffusers names and re-import:
    exact round trip, and the flat keys are the diffusers UNet names."""
    p = sd_unet2d.init(jax.random.PRNGKey(3), TINY)
    sd = CKPT.pytree_to_state_dict(p)
    for expect in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.1.conv2.weight",
        "mid_block.attentions.0.proj_out.weight",
        "up_blocks.1.attentions.1.transformer_blocks.0.attn2.to_k.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert expect in sd, expect
    # torch Linear layout check: attn to_q stored as (out, in)
    assert sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"].shape == (16, 16)
    assert sd["down_blocks.0.downsamplers.0.conv.weight"].shape == (16, 16, 3, 3)

    p2 = CKPT.state_dict_to_pytree(sd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        p, p2)


TINY_VAE = VAE.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                         embed_dim=4)

# CompVis -> diffusers key renames (test-side inverse of the import mapping)
def _compvis_to_diffusers(key: str, num_levels: int) -> str:
    k = key
    k = k.replace("norm_out", "conv_norm_out")
    k = k.replace("mid.block_1", "mid_block.resnets.0")
    k = k.replace("mid.block_2", "mid_block.resnets.1")
    k = k.replace("mid.attn_1", "mid_block.attentions.0")
    if ".attentions.0." in k:
        k = k.replace(".norm.", ".group_norm.")
        k = k.replace(".q.", ".to_q.").replace(".k.", ".to_k.").replace(".v.", ".to_v.")
        k = k.replace(".proj_out.", ".to_out.0.")
    k = k.replace(".nin_shortcut.", ".conv_shortcut.")
    if ".down." in k:
        k = k.replace(".down.", ".down_blocks.").replace(".block.", ".resnets.")
        k = k.replace(".downsample.conv.", ".downsamplers.0.conv.")
    if ".up." in k:
        parts = k.split(".")
        i = parts.index("up")
        parts[i] = "up_blocks"
        parts[i + 1] = str(num_levels - 1 - int(parts[i + 1]))
        k = ".".join(parts).replace(".block.", ".resnets.")
        k = k.replace(".upsample.conv.", ".upsamplers.0.conv.")
    return k


def test_diffusers_vae_import():
    p = VAE.init_vae(jax.random.PRNGKey(0), TINY_VAE)
    compvis_sd = CKPT.pytree_to_state_dict(p)
    n = len(TINY_VAE.ch_mult)
    diff_sd = {}
    for key, val in compvis_sd.items():
        new = _compvis_to_diffusers(key, n)
        # diffusers attention projections are Linear, not 1x1 convs
        if ".attentions.0.to_" in new and new.endswith("weight") and val.ndim == 4:
            val = val.reshape(val.shape[:2])
        diff_sd[new] = val
    p2 = depthlab.diffusers_vae_to_pytree(diff_sd, num_levels=n)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        p, p2)
    # and the remapped tree actually runs
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    z = VAE.encode_moments(p2, TINY_VAE, x).mode()
    assert z.shape == (1, 8, 8, 4)


def test_depthlab_predict_and_densify():
    cfg = depthlab.DepthLabConfig(
        unet=sd_unet2d.SDUNetConfig(
            in_channels=12, out_channels=4, block_out_channels=(16, 32),
            layers_per_block=1, cross_attention_dim=24, head_dim=8,
            norm_num_groups=4),
        ref_unet=sd_unet2d.SDUNetConfig(
            in_channels=4, out_channels=4, block_out_channels=(16, 32),
            layers_per_block=1, cross_attention_dim=24, head_dim=8,
            norm_num_groups=4),
        vae=TINY_VAE,
    )
    params = depthlab.init(jax.random.PRNGKey(0), cfg)
    vae_params = VAE.init_vae(jax.random.PRNGKey(1), cfg.vae)

    rng = np.random.default_rng(0)
    image = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    sparse = np.zeros((32, 32), np.float32)
    pts = rng.choice(32 * 32, 60, replace=False)
    sparse.flat[pts] = rng.uniform(2.0, 50.0, 60)

    rel = depthlab.predict_depth(params, cfg, vae_params, image, sparse, steps=3)
    assert rel.shape == (32, 32)
    assert np.isfinite(rel).all()

    from mudg_tpu.data.depth_tools import densify_depth_map

    predictor = depthlab.DepthLabPredictor(params, cfg, vae_params, steps=2)
    dense = densify_depth_map(sparse, predictor=predictor)
    assert dense.shape == sparse.shape
    assert np.isfinite(dense).all()
    assert (dense >= 0).all() and (dense <= 100).all()


def _write_safetensors(path, arrays):
    import json
    import struct

    header, bufs, off = {}, [], 0
    for name, a in arrays.items():
        a = np.ascontiguousarray(a, np.float32)
        header[name] = {"dtype": "F32", "shape": list(a.shape),
                        "data_offsets": [off, off + a.nbytes]}
        bufs.append(a.tobytes())
        off += a.nbytes
    hj = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        f.write(b"".join(bufs))


def test_load_depthlab_dir(tmp_path):
    """Round-trip the reference's checkpoint-dir layout
    (depthlab_tools.py:467-476): .pth UNets + mapping layer + a safetensors
    diffusers VAE, reassembled into working pytrees."""
    import torch

    cfg = depthlab.DepthLabConfig(
        unet=sd_unet2d.SDUNetConfig(
            in_channels=12, out_channels=4, block_out_channels=(16, 32),
            layers_per_block=1, cross_attention_dim=24, head_dim=8,
            norm_num_groups=4),
        ref_unet=sd_unet2d.SDUNetConfig(
            in_channels=4, out_channels=4, block_out_channels=(16, 32),
            layers_per_block=1, cross_attention_dim=24, head_dim=8,
            norm_num_groups=4),
        vae=TINY_VAE,
    )
    params = depthlab.init(jax.random.PRNGKey(0), cfg)
    for name in ("denoising_unet", "reference_unet"):
        sd = {k: torch.tensor(np.asarray(v)) for k, v in
              CKPT.pytree_to_state_dict(params[name]).items()}
        torch.save(sd, tmp_path / f"{name}.pth")
    map_sd = {f"proj.{k}": torch.tensor(np.asarray(v))
              for k, v in CKPT.pytree_to_state_dict(
                  {"weight": params["mapping_layer"]["weight"],
                   "bias": params["mapping_layer"]["bias"]}).items()}
    torch.save(map_sd, tmp_path / "mapping_layer.pth")

    vae_p = VAE.init_vae(jax.random.PRNGKey(1), TINY_VAE)
    n = len(TINY_VAE.ch_mult)
    diff_sd = {}
    for key, val in CKPT.pytree_to_state_dict(vae_p).items():
        new = _compvis_to_diffusers(key, n)
        if ".attentions.0.to_" in new and new.endswith("weight") and val.ndim == 4:
            val = val.reshape(val.shape[:2])
        diff_sd[new] = val
    (tmp_path / "vae").mkdir()
    _write_safetensors(tmp_path / "vae" / "diffusion_pytorch_model.safetensors",
                       diff_sd)

    params2, cfg2, vae2 = depthlab.load_depthlab_dir(str(tmp_path), cfg=cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        params, params2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        vae_p, vae2)


def test_densify_scene_app(tmp_path):
    """apps/densify_depth drives the reference main loop
    (depthlab_tools.py:480-549): per-camera-frame dense/aligned/processed
    npys + Spectral visualizations, sky filled from the semantic pfm."""
    import cv2

    from mudg_tpu.apps.densify_depth import densify_scene
    from mudg_tpu.data.segmentation import write_pfm

    scene = tmp_path / "scene"
    cam = "camera_FRONT"
    for d in (f"images/{cam}", f"six_frames_depth/{cam}", f"semantic/{cam}/seg"):
        (scene / d).mkdir(parents=True)

    rng = np.random.default_rng(0)
    H, W = 24, 32
    for i in range(2):
        stem = f"{i:08d}"
        cv2.imwrite(str(scene / "images" / cam / f"{stem}.jpg"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        sparse = np.where(rng.uniform(size=(H, W)) < 0.2,
                          rng.uniform(2, 60, (H, W)), 0).astype(np.float32)
        np.save(scene / "six_frames_depth" / cam / f"{stem}.npy", sparse)
        sem = np.zeros((H, W), np.float32)
        sem[:4] = 10.0  # sky band
        write_pfm(str(scene / "semantic" / cam / "seg" / f"{stem}.pfm"), sem)

    n = densify_scene(str(scene), cameras=(cam,))
    assert n == 2
    for sub in ("dense", "aligned", "processed"):
        files = sorted((scene / f"six_frames_depth_{sub}" / cam).iterdir())
        assert len(files) == 2, sub
    processed = np.load(scene / "six_frames_depth_processed" / cam / "00000000.npy")
    assert processed.shape == (H, W)
    assert (processed[:4] == 100.0).all()          # sky filled
    assert (processed >= 0).all() and (processed <= 100).all()
    vis = sorted((scene / "six_frames_depth_vis" / cam).iterdir())
    assert len(vis) == 8  # 4 stages x 2 frames


def test_mapping_layer():
    from mudg_tpu.nn import functional as F

    p = F.init_linear(jax.random.PRNGKey(0), 1024, 768)
    emb = jnp.ones((2, 1024))
    ctx = depthlab.mapping_apply(p, emb)
    assert ctx.shape == (2, 1, 768)


def test_sd2_config_heads_and_shapes():
    """The production SD2/Marigold config maps to head counts 5/10/20/20
    (attention_head_dim 64), the shape contract Marigold weights need."""
    cfg = sd_unet2d.SDUNetConfig()
    assert [cfg.heads(c) for c in cfg.block_out_channels] == [5, 10, 20, 20]
    assert cfg.level_has_attn_down(3) is False
    assert cfg.level_has_attn_up(0) is False
