"""Torch checkpoint import: pickle reading, layout transforms, surgery, and
golden-value forward parity between torch modules and our JAX functions.

These tests construct standard torch layers with the same state_dict layout
as the reference (guided-diffusion/LDM conventions), save real .ckpt files,
import them with mudg_tpu.train.checkpoint, and assert the JAX forward
matches the torch forward to fp32 tolerance.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from mudg_tpu.train import checkpoint as C  # noqa: E402
from mudg_tpu.nn import functional as F  # noqa: E402
from mudg_tpu.nn import attention as A  # noqa: E402
from mudg_tpu.nn import unet3d as U  # noqa: E402


def _roundtrip(sd, tmp_path, name="m.ckpt"):
    path = str(tmp_path / name)
    torch.save({"state_dict": sd}, path)
    raw = C._load_torch_pickle(path)
    return C.normalize_state_dict(raw)


def test_pickle_reader_matches_torch(tmp_path):
    sd = {
        "a.weight": torch.randn(4, 3),
        "b.weight": torch.randn(8, 4, 3, 3).half(),
        "c.bias": torch.arange(5, dtype=torch.float32),
        "d.weight": torch.randn(2, 3, 3, 1, 1).bfloat16(),
    }
    out = _roundtrip(sd, tmp_path)
    for k in sd:
        np.testing.assert_allclose(
            np.asarray(out[k], dtype=np.float32),
            sd[k].float().numpy(),
            rtol=1e-6,
        )


def test_layout_transforms():
    lin = np.arange(6, dtype=np.float32).reshape(2, 3)  # torch (out=2, in=3)
    out = C.torch_to_jax_layout("x.to_q.weight", lin)
    np.testing.assert_array_equal(out, lin.T)

    conv = np.random.randn(8, 4, 3, 3).astype(np.float32)
    out = C.torch_to_jax_layout("x.conv.weight", conv)
    assert out.shape == (3, 3, 4, 8)

    conv3 = np.random.randn(8, 4, 3, 1, 1).astype(np.float32)
    assert C.torch_to_jax_layout("x.weight", conv3).shape == (3, 1, 1, 4, 8)

    # keep-list: resampler latents, rel-pos table
    lat = np.random.randn(1, 16, 8).astype(np.float32)
    np.testing.assert_array_equal(C.torch_to_jax_layout("latents", lat), lat)
    tab = np.random.randn(9, 4).astype(np.float32)
    np.testing.assert_array_equal(
        C.torch_to_jax_layout("relative_position_k.embeddings_table", tab), tab
    )
    # biases untouched
    b = np.random.randn(7).astype(np.float32)
    np.testing.assert_array_equal(C.torch_to_jax_layout("x.bias", b), b)


def test_conv_in_surgery():
    w = np.random.randn(320, 8, 3, 3).astype(np.float32)
    sd = {"model.diffusion_model.input_blocks.0.0.weight": w}
    out = C.apply_surgery(sd, expand_conv_in=True)
    w2 = out["model.diffusion_model.input_blocks.0.0.weight"]
    assert w2.shape == (320, 12, 3, 3)
    # whole kernel halved; channels 8:12 duplicate 4:8 (utils_train.py:200-204)
    np.testing.assert_allclose(w2[:, :8], w * 0.5, rtol=1e-6)
    np.testing.assert_allclose(w2[:, 8:12], w[:, 4:8] * 0.5, rtol=1e-6)


def test_class_embed_surgery():
    sd = {
        "model.diffusion_model.time_embed.0.weight": np.ones((1280, 320), np.float32),
        "model.diffusion_model.time_embed.0.bias": np.zeros(1280, np.float32),
        "model.diffusion_model.time_embed.2.weight": np.ones((1280, 1280), np.float32),
        "model.diffusion_model.time_embed.2.bias": np.zeros(1280, np.float32),
    }
    out = C.apply_surgery(sd, add_class_embed=True)
    np.testing.assert_array_equal(
        out["model.diffusion_model.class_embed.0.weight"],
        sd["model.diffusion_model.time_embed.0.weight"],
    )


def test_deepspeed_and_rename_normalization():
    sd = {"_forward_module.model.x.weight": np.ones((2, 2), np.float32)}
    out = C.normalize_state_dict({"module": sd})
    assert "model.x.weight" in out
    out2 = C.normalize_state_dict(
        {"state_dict": {"framestride_embed.0.weight": np.ones((2, 2), np.float32)}}
    )
    assert "fps_embedding.0.weight" in out2


# ---------------------------------------------------------------------------
# Golden-value parity: torch forward == our forward on imported weights
# ---------------------------------------------------------------------------

def _import_tree(module: tnn.Module, tmp_path, name):
    sd = module.state_dict()
    flat = _roundtrip(sd, tmp_path, name)
    return C.state_dict_to_pytree(flat)


def test_parity_linear_conv_groupnorm(tmp_path):
    torch.manual_seed(0)
    m = tnn.Sequential(
        tnn.GroupNorm(4, 16), tnn.SiLU(), tnn.Conv2d(16, 32, 3, padding=1)
    )
    tree = _import_tree(m, tmp_path, "gnc.ckpt")
    x = torch.randn(2, 16, 8, 8)
    with torch.no_grad():
        ref = m(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = F.conv2d(tree["2"], F.silu(F.group_norm(tree["0"], xj, num_groups=4)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5
    )


def test_parity_conv3d_temporal(tmp_path):
    torch.manual_seed(1)
    m = tnn.Conv3d(8, 8, (3, 1, 1), padding=(1, 0, 0))
    tree = _import_tree(m, tmp_path, "c3.ckpt")
    x = torch.randn(2, 8, 4, 5, 6)  # (B, C, T, H, W)
    with torch.no_grad():
        ref = m(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # (B, T, H, W, C)
    out = F.conv3d(tree, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=2e-5
    )


def test_parity_strided_downsample(tmp_path):
    torch.manual_seed(2)
    m = tnn.Conv2d(8, 8, 3, stride=2, padding=1)
    tree = _import_tree(m, tmp_path, "ds.ckpt")
    x = torch.randn(1, 8, 16, 16)
    with torch.no_grad():
        ref = m(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = F.conv2d(tree, xj, stride=2, padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5
    )


class _TorchCrossAttention(tnn.Module):
    """Standard QKV cross-attention with the reference's state_dict layout
    (to_q/to_k/to_v/to_out.0 + decoupled to_k_ip/to_v_ip image branch)."""

    def __init__(self, dim, ctx_dim, heads, dim_head, image_cross=False):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim), tnn.Dropout(0.0))
        if image_cross:
            self.to_k_ip = tnn.Linear(ctx_dim, inner, bias=False)
            self.to_v_ip = tnn.Linear(ctx_dim, inner, bias=False)

    def _attn(self, q, k, v):
        b, lq, _ = q.shape
        h, d = self.heads, self.dim_head
        q = q.view(b, lq, h, d).transpose(1, 2)
        k = k.view(b, -1, h, d).transpose(1, 2)
        v = v.view(b, -1, h, d).transpose(1, 2)
        w = (q @ k.transpose(-1, -2)) * d**-0.5
        w = w.softmax(-1)
        return (w @ v).transpose(1, 2).reshape(b, lq, h * d)

    def forward(self, x, ctx=None, text_len=77, ip_scale=1.0):
        if ctx is None:
            q, kv = x, x
            out = self._attn(self.to_q(q), self.to_k(kv), self.to_v(kv))
        else:
            text, img = ctx[:, :text_len], ctx[:, text_len:]
            q = self.to_q(x)
            out = self._attn(q, self.to_k(text), self.to_v(text))
            out = out + ip_scale * self._attn(q, self.to_k_ip(img), self.to_v_ip(img))
        return self.to_out(out)


def test_parity_cross_attention_image_branch(tmp_path):
    torch.manual_seed(3)
    dim, ctx_dim, heads, dh = 32, 24, 2, 16
    m = _TorchCrossAttention(dim, ctx_dim, heads, dh, image_cross=True)
    tree = _import_tree(m, tmp_path, "ca.ckpt")
    x = torch.randn(2, 12, dim)
    ctx = torch.randn(2, 77 + 8, ctx_dim)
    with torch.no_grad():
        ref = m(x, ctx).numpy()
    out = A.cross_attention(
        tree, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        heads=heads, image_cross=True, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_parity_layernorm_geglu(tmp_path):
    torch.manual_seed(4)

    class TorchGEGLUFF(tnn.Module):
        def __init__(self, dim, mult=4):
            super().__init__()
            inner = dim * mult

            class GEGLU(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.proj = tnn.Linear(dim, inner * 2)

                def forward(self, x):
                    a, g = self.proj(x).chunk(2, dim=-1)
                    return a * torch.nn.functional.gelu(g)

            self.net = tnn.Sequential(GEGLU(), tnn.Dropout(0.0), tnn.Linear(inner, dim))

        def forward(self, x):
            return self.net(x)

    m = TorchGEGLUFF(16)
    tree = _import_tree(m, tmp_path, "ff.ckpt")
    x = torch.randn(3, 5, 16)
    with torch.no_grad():
        ref = m(x).numpy()
    out = A.feed_forward(tree, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_parity_resblock_with_temporal_conv(tmp_path):
    """Full ResBlock (+TemporalConvBlock) parity, including the reference's
    'temopral_conv' key spelling."""
    torch.manual_seed(5)
    c_in, c_out, emb_dim, b, t = 8, 16, 12, 2, 4

    class TorchResBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.in_layers = tnn.Sequential(
                tnn.GroupNorm(4, c_in), tnn.SiLU(), tnn.Conv2d(c_in, c_out, 3, padding=1)
            )
            self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb_dim, c_out))
            self.out_layers = tnn.Sequential(
                tnn.GroupNorm(4, c_out), tnn.SiLU(), tnn.Dropout(0.0),
                tnn.Conv2d(c_out, c_out, 3, padding=1),
            )
            self.skip_connection = tnn.Conv2d(c_in, c_out, 1)

            class TCB(tnn.Module):
                def __init__(self):
                    super().__init__()
                    mk = lambda: tnn.Conv3d(c_out, c_out, (3, 1, 1), padding=(1, 0, 0))
                    self.conv1 = tnn.Sequential(tnn.GroupNorm(4, c_out), tnn.SiLU(), mk())
                    self.conv2 = tnn.Sequential(tnn.GroupNorm(4, c_out), tnn.SiLU(), tnn.Dropout(0.0), mk())
                    self.conv3 = tnn.Sequential(tnn.GroupNorm(4, c_out), tnn.SiLU(), tnn.Dropout(0.0), mk())
                    self.conv4 = tnn.Sequential(tnn.GroupNorm(4, c_out), tnn.SiLU(), tnn.Dropout(0.0), mk())

                def forward(self, x):
                    return x + self.conv4(self.conv3(self.conv2(self.conv1(x))))

            self.temopral_conv = TCB()

        def forward(self, x, emb):
            h = self.in_layers(x)
            e = self.emb_layers(emb)[:, :, None, None]
            h = self.out_layers(h + e)
            h = self.skip_connection(x) + h
            bt, c, hh, ww = h.shape
            hv = h.view(b, t, c, hh, ww).permute(0, 2, 1, 3, 4)
            hv = self.temopral_conv(hv)
            return hv.permute(0, 2, 1, 3, 4).reshape(bt, c, hh, ww)

    m = TorchResBlock()
    tree = _import_tree(m, tmp_path, "rb.ckpt")
    x = torch.randn(b * t, c_in, 6, 6)
    emb = torch.randn(b * t, emb_dim)
    with torch.no_grad():
        ref = m(x, emb).numpy()

    # our group_norm default is 32 groups; these test layers use 4
    import mudg_tpu.nn.functional as Fn
    orig = Fn.group_norm
    try:
        Fn.group_norm = lambda p, x, num_groups=4, eps=1e-5: orig(p, x, 4, eps)
        out = U.resblock(
            tree, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(emb.numpy()), batch_size=b,
        )
    finally:
        Fn.group_norm = orig
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-5
    )


def test_state_dict_roundtrip():
    """pytree -> torch layout -> pytree is the identity (full interop)."""
    sd = {
        "model.lin.weight": np.random.randn(8, 4).astype(np.float32),
        "model.lin.bias": np.random.randn(8).astype(np.float32),
        "model.conv.weight": np.random.randn(16, 8, 3, 3).astype(np.float32),
        "model.c3.weight": np.random.randn(8, 8, 3, 1, 1).astype(np.float32),
        "model.c1.weight": np.random.randn(8, 4, 1).astype(np.float32),
        "token_embedding.weight": np.random.randn(32, 8).astype(np.float32),
        "attn.in_proj_weight": np.random.randn(24, 8).astype(np.float32),
        "norm.weight": np.random.randn(8).astype(np.float32),
        "latents": np.random.randn(1, 4, 8).astype(np.float32),
    }
    tree = C.state_dict_to_pytree(sd, skip_buffers=False)
    back = C.pytree_to_state_dict(tree)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


# ---------------------------------------------------------------------------
# Weight-day drill: fabricated Lightning/deepspeed .ckpt -> full import ->
# sample (VERDICT r4 item 8) — so real published weights are a one-liner.
# ---------------------------------------------------------------------------

def test_weight_day_drill(tmp_path):
    """Fabricate a reference-layout .ckpt from tiny-config params (state_dict
    with first/cond-stage towers under their real prefixes, framestride_embed
    legacy naming, 8-channel conv_in, a non-contiguous tensor) plus the
    deepspeed 'module' variant, then drive load_mudg_checkpoint ->
    surgery -> M.sample end-to-end exactly as apps/train_mdm.py:170-182 /
    render_infer do."""
    from mudg_tpu.models import mdm as M
    from mudg_tpu.models import presets

    cfg = presets.get("tiny")
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)

    # export with the real sub-model prefixes (ddpm3d.py:86,529-530,1037-41)
    sd = {}
    sd.update(C.pytree_to_state_dict(params["unet"],
                                     prefix="model.diffusion_model."))
    sd.update(C.pytree_to_state_dict(params["vae"],
                                     prefix="first_stage_model."))
    sd.update(C.pytree_to_state_dict(params["image_proj"],
                                     prefix="image_proj_model."))
    sd.update(C.pytree_to_state_dict(params["clip_text"],
                                     prefix="cond_stage_model.model."))
    sd.update(C.pytree_to_state_dict(params["clip_image"],
                                     prefix="embedder.model.visual."))

    # published DynamiCrafter ckpts predate the class_embed (cloned at import,
    # utils_train.py:174-182) and carry an 8-channel conv_in + the
    # framestride_embed legacy key naming
    for suffix in ("0.weight", "0.bias", "2.weight", "2.bias"):
        del sd[f"model.diffusion_model.class_embed.{suffix}"]
    sd = {k.replace(".fps_embedding.", ".framestride_embed."): v
          for k, v in sd.items()}
    ck = "model.diffusion_model.input_blocks.0.0.weight"
    w12 = sd[ck]                     # torch layout (out, 12, 3, 3)
    sd[ck] = (w12[:, :8] * 2.0).copy()

    tsd = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
    # a non-contiguous tensor (torch 2.13 serializes numpy strides — the
    # reader must rebuild via as_strided, round-2 bug class)
    nk = "model.diffusion_model.time_embed.0.weight"
    tsd[nk] = torch.tensor(np.asarray(sd[nk]).T.copy()).t()
    assert not tsd[nk].is_contiguous()

    lightning = str(tmp_path / "mudg.ckpt")
    torch.save({"state_dict": tsd, "epoch": 3, "global_step": 1000},
               lightning)
    dspath = str(tmp_path / "mudg_ds.ckpt")
    torch.save({"module": {
        "_forward_module." + k.replace(".framestride_embed.",
                                       ".fps_embedding."): v
        for k, v in tsd.items()}}, dspath)

    trees = C.load_mudg_checkpoint(lightning, expand_conv_in=True,
                                   add_class_embed=True)
    imported = {
        "unet": trees["unet"],
        "vae": trees["vae"],
        "image_proj": trees["image_proj"],
        "clip_text": trees["clip_text"].get("model", trees["clip_text"]),
        "clip_image": trees["clip_image"].get("model", {}).get(
            "visual", trees["clip_image"]),
    }

    # structure must match init exactly (what jit/sharding placement needs)
    assert (jax.tree.structure(jax.tree.map(lambda x: 0, imported))
            == jax.tree.structure(jax.tree.map(lambda x: 0, params)))
    # non-contiguous leaf round-trips exactly
    np.testing.assert_array_equal(
        imported["unet"]["time_embed"]["0"]["weight"],
        np.asarray(params["unet"]["time_embed"]["0"]["weight"]))
    # conv_in surgery math, checked independently in torch layout
    got = C.pytree_to_state_dict(
        {"x": {"weight": imported["unet"]["input_blocks"]["0"]["0"]
               ["weight"]}})["x.weight"]
    w8 = np.asarray(sd[ck])
    np.testing.assert_allclose(got[:, :8], w8 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(got[:, 8:12], w8[:, 4:8] * 0.5, rtol=1e-6)
    # class_embed == time_embed clone
    np.testing.assert_array_equal(
        imported["unet"]["class_embed"]["0"]["weight"],
        imported["unet"]["time_embed"]["0"]["weight"])

    # deepspeed layout import lands on the identical trees
    trees_ds = C.load_mudg_checkpoint(dspath, expand_conv_in=True,
                                      add_class_embed=True)
    for a, b in zip(jax.tree.leaves(trees["unet"]),
                    jax.tree.leaves(trees_ds["unet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # end-to-end: sample from the imported weights (render_infer's path)
    imported = jax.tree.map(jnp.asarray, imported)
    out = jax.jit(lambda p: M.sample(
        p, cfg, jax.random.PRNGKey(1),
        sparse_frames=jnp.zeros((1, 4, 32, 64, 3)),
        sparse_depth=jnp.zeros((1, 4, 32, 64, 3)),
        tokens=jnp.zeros((1, 77), jnp.int32),
        null_tokens=jnp.zeros((77,), jnp.int32),
        class_label=jnp.zeros((1,), jnp.int32),
        num_steps=2))(imported)
    assert out.shape == (1, 4, 32, 64, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
