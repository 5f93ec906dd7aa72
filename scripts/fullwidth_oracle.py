"""Full-width oracle parity (VERDICT round-2 item 4): ONE forward of the
ACTUAL reference UNetModel at the REAL MDM512 config (1.44B params,
model_channels=320, context_dim=1024, T=16, 40x64 latents,
/root/reference/lvdm/modules/networks/openaimodel3d.py:567-628) and the
full-size VAE (ch=128, mult 1/2/4/4) at 320x512, both fp32 CPU, compared
against our checkpoint-import + XLA path. Retires the scale-only parity
risk class (head packing at C=1280, the fused in_proj, init_attn's
512-wide inner at mc=320) that the tiny-config tests in
tests/test_reference_oracle.py cannot see.

Run (hours of single-core CPU — background it):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fullwidth_oracle.py
Results go to STATE.md once measured.
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import torch

from mudg_tpu.train import checkpoint as CK

torch.manual_seed(0)
torch.set_num_threads(1)


def _randomize(model, seed=0, std=0.05):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in sorted(model.named_parameters(), key=lambda kv: kv[0]):
            p.copy_(torch.randn(p.shape, generator=gen) * std)
    return model


def _report(name, ours, ref):
    diff = np.abs(ours - ref)
    scale = max(np.abs(ref).max(), 1e-6)
    ok = np.isfinite(ours).all()
    print(f"{name}: max|diff|={diff.max():.3e}  out-scale={scale:.3e}  "
          f"rel={diff.max()/scale:.3e}  finite={ok}", flush=True)


def unet_stage():
    from lvdm.modules.networks.openaimodel3d import UNetModel

    from mudg_tpu.nn import unet3d as U

    print("== UNet full-width (MDM512: mc=320, ctx=1024, T=16, 40x64) ==",
          flush=True)
    t0 = time.perf_counter()
    ref = UNetModel(
        in_channels=12, out_channels=4, model_channels=320,
        num_res_blocks=2, attention_resolutions=[4, 2, 1],
        channel_mult=[1, 2, 4, 4], num_head_channels=64,
        transformer_depth=1, context_dim=1024, use_linear=True,
        temporal_conv=True, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=16,
        addition_attention=True, image_cross_attention=True,
        fs_condition=True, class_label_condition=True, default_fs=10,
        dropout=0.0,
    )
    _randomize(ref)
    ref.eval()
    n_params = sum(p.numel() for p in ref.parameters())
    print(f"built+randomized ref ({n_params/1e9:.2f}B params) "
          f"in {time.perf_counter()-t0:.0f}s", flush=True)

    b, t, hh, ww = 1, 16, 40, 64
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (b, 12, t, hh, ww)).astype(np.float32)
    context = rng.normal(0, 1, (b, 77 + t * 16, 1024)).astype(np.float32)
    timesteps = np.array([500], np.int64)
    c_label = np.array([1], np.int64)
    fs = np.array([10], np.int64)

    t0 = time.perf_counter()
    with torch.no_grad():
        y_ref = ref(
            torch.from_numpy(x), torch.from_numpy(timesteps),
            c_label=torch.from_numpy(c_label),
            context=torch.from_numpy(context), fs=torch.from_numpy(fs),
        ).numpy()
    print(f"torch forward: {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    del ref
    gc.collect()
    params = CK.state_dict_to_pytree(sd)
    del sd
    gc.collect()
    print(f"export+import: {time.perf_counter()-t0:.0f}s", flush=True)

    import jax.numpy as jnp

    cfg = U.UNetConfig(dropout=0.0)
    t0 = time.perf_counter()
    fn = jax.jit(lambda p, x, ts, ctx, lab, fs: U.unet_apply(
        p, cfg, x, ts, ctx, c_label=lab, fs=fs, impl="xla"))
    y = fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timesteps.astype(np.int32)), jnp.asarray(context),
        jnp.asarray(c_label.astype(np.int32)),
        jnp.asarray(fs.astype(np.int32)),
    )
    y = np.asarray(y).transpose(0, 4, 1, 2, 3)
    print(f"jax forward (incl compile): {time.perf_counter()-t0:.0f}s",
          flush=True)
    _report("unet-full-width", y, y_ref)
    del params
    gc.collect()


def vae_stage():
    from lvdm.modules.networks.ae_modules import Decoder, Encoder

    from mudg_tpu.nn import vae as V

    print("== VAE full-size (ch=128, mult 1/2/4/4, 320x512) ==", flush=True)
    dd = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
              attn_resolutions=[], in_channels=3, resolution=256,
              z_channels=4, double_z=True, dropout=0.0)
    t0 = time.perf_counter()
    enc, dec = Encoder(**dd), Decoder(**dd)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    full = torch.nn.ModuleDict(
        {"encoder": enc, "decoder": dec, "quant_conv": quant,
         "post_quant_conv": post_quant})
    _randomize(full, std=0.04)
    full.eval()
    print(f"built in {time.perf_counter()-t0:.0f}s", flush=True)

    cfg = V.VAEConfig()
    params = CK.state_dict_to_pytree(
        {k: v.detach().numpy() for k, v in full.state_dict().items()})

    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.5, (1, 3, 320, 512)).astype(np.float32)

    t0 = time.perf_counter()
    with torch.no_grad():
        moments = quant(enc(torch.from_numpy(x)))
        mean = moments[:, :4]
        z_ref = cfg.scale_factor * mean
        dec_ref = dec(post_quant(mean)).numpy()
        z_ref = z_ref.numpy()
    print(f"torch roundtrip: {time.perf_counter()-t0:.0f}s", flush=True)
    del full, enc, dec
    gc.collect()

    import jax.numpy as jnp

    t0 = time.perf_counter()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    z = jax.jit(lambda p, x: V.encode(p, cfg, x))(params, xj)
    _report("vae-full-encode", np.asarray(z).transpose(0, 3, 1, 2), z_ref)
    xd = jax.jit(lambda p, z: V.decode(p, cfg, z))(params, z)
    print(f"jax roundtrip (incl compile): {time.perf_counter()-t0:.0f}s",
          flush=True)
    _report("vae-full-decode", np.asarray(xd).transpose(0, 3, 1, 2), dec_ref)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "vae"):
        vae_stage()  # cheap one first: fails fast if anything is off
    if which in ("all", "unet"):
        unet_stage()
    print("done.", flush=True)
