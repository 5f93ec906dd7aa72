"""Whole-model parity against the ACTUAL reference code as oracle.

Unlike test_ckpt_import.py (which compares against small torch modules
rebuilt inline), these tests import the reference repo's own classes from
/root/reference (UNetModel from lvdm/modules/networks/openaimodel3d.py,
Encoder/Decoder from ae_modules.py, Resampler from encoders/resampler.py),
instantiate them at a tiny config, push their state_dict through our
train/checkpoint.py import path, and compare FULL forward passes in fp32.
This catches any layout or algebra drift across the whole stack, not just
per-layer.

The reference zero-initializes several output projections (zero_module on
proj_out / out conv / resblock out_layers), which would make a fresh model's
output identically zero; weights are therefore re-randomized with a fixed
torch generator before export so every path carries signal.
"""
from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from mudg_tpu.train import checkpoint as CK  # noqa: E402


def _randomize(model: "torch.nn.Module", seed: int = 0, std: float = 0.05):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in sorted(model.named_parameters(), key=lambda kv: kv[0]):
            p.copy_(torch.randn(p.shape, generator=gen) * std)
    return model


def _to_tree(model: "torch.nn.Module") -> dict:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return CK.state_dict_to_pytree(sd)


def _report(name, ours, ref):
    diff = np.abs(ours - ref)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.isfinite(ours).all(), f"{name}: non-finite output"
    assert diff.max() <= 2e-3 * scale + 5e-5, (
        f"{name}: max|diff|={diff.max():.3e} vs scale {scale:.3e} "
        f"(rel {diff.max()/scale:.3e})"
    )


def test_unet_forward_matches_reference_oracle():
    """Full 3D-UNet forward vs lvdm UNetModel (openaimodel3d.py:567-628) at a
    tiny config exercising: conv_in, init_attn, res+temporal-conv blocks,
    spatial+temporal transformers, image-KV cross attention, down/upsample,
    fs/class embeddings, and the 77+T*16 context split."""
    from lvdm.modules.networks.openaimodel3d import UNetModel

    from mudg_tpu.nn import unet3d as U

    t, b, hw = 4, 2, 8
    ref = UNetModel(
        in_channels=12, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1], channel_mult=[1, 2], num_head_channels=16,
        transformer_depth=1, context_dim=16, use_linear=True,
        temporal_conv=True, temporal_attention=True,
        use_relative_position=False, use_causal_attention=False,
        temporal_length=t, addition_attention=True,
        image_cross_attention=True, fs_condition=True,
        class_label_condition=True, default_fs=10, dropout=0.0,
    )
    _randomize(ref)
    ref.eval()

    cfg = U.UNetConfig(
        in_channels=12, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=16,
        context_dim=16, temporal_length=t, image_tokens_per_frame=16,
        dropout=0.0,
    )
    params = _to_tree(ref)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (b, 12, t, hw, hw)).astype(np.float32)
    context = rng.normal(0, 1, (b, 77 + t * 16, 16)).astype(np.float32)
    timesteps = np.array([3, 777], np.int64)
    c_label = np.array([0, 1], np.int64)
    fs = np.array([10, 24], np.int64)

    with torch.no_grad():
        y_ref = ref(
            torch.from_numpy(x), torch.from_numpy(timesteps),
            c_label=torch.from_numpy(c_label),
            context=torch.from_numpy(context), fs=torch.from_numpy(fs),
        ).numpy()

    import jax.numpy as jnp

    y = U.unet_apply(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timesteps.astype(np.int32)), jnp.asarray(context),
        c_label=jnp.asarray(c_label.astype(np.int32)),
        fs=jnp.asarray(fs.astype(np.int32)), impl="xla",
    )
    y = np.asarray(y).transpose(0, 4, 1, 2, 3)
    _report("unet", y, y_ref)


def test_vae_roundtrip_matches_reference_oracle():
    """Encoder -> quant_conv -> mode -> scale -> decode vs the reference
    ae_modules Encoder/Decoder + AutoencoderKL quant convs
    (autoencoder.py:30-35,97-107)."""
    from lvdm.modules.networks.ae_modules import Decoder, Encoder

    from mudg_tpu.nn import vae as V

    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], in_channels=3, resolution=32,
              z_channels=4, double_z=True, dropout=0.0)
    enc, dec = Encoder(**dd), Decoder(**dd)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)

    full = torch.nn.ModuleDict(
        {"encoder": enc, "decoder": dec, "quant_conv": quant,
         "post_quant_conv": post_quant}
    )
    _randomize(full, std=0.08)
    full.eval()

    cfg = V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params = _to_tree(full)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.5, (2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        moments = quant(enc(torch.from_numpy(x)))
        mean = moments[:, :4]
        z_ref = cfg.scale_factor * mean
        dec_ref = dec(post_quant(z_ref / cfg.scale_factor)).numpy()
        z_ref = z_ref.numpy()

    import jax.numpy as jnp

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    z = V.encode(params, cfg, xj)  # mode path (no rng)
    _report("vae-encode", np.asarray(z).transpose(0, 3, 1, 2), z_ref)
    xd = V.decode(params, cfg, z)
    _report("vae-decode", np.asarray(xd).transpose(0, 3, 1, 2), dec_ref)


def test_resampler_matches_reference_oracle():
    """Perceiver Resampler vs lvdm/modules/encoders/resampler.py:96-145."""
    from lvdm.modules.encoders.resampler import Resampler

    from mudg_tpu.nn import resampler as R

    ref = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=3,
                    embedding_dim=24, output_dim=16, ff_mult=2, video_length=4)
    _randomize(ref)
    ref.eval()

    cfg = R.ResamplerConfig(dim=32, depth=2, dim_head=8, heads=4,
                            num_queries=3, embedding_dim=24, output_dim=16,
                            ff_mult=2, video_length=4)
    params = _to_tree(ref)

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (4, 5, 24)).astype(np.float32)  # B*T tokens

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    import jax.numpy as jnp

    y = np.asarray(R.resampler_apply(params, cfg, jnp.asarray(x)))
    _report("resampler", y, y_ref)
