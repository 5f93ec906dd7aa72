"""Backward-side per-family ablation of the REAL training step (VERDICT
round-2 item 1): time fwd+bwd of M.training_loss at the training config
(MDM512, bs=1, impl="train", remat=True), then re-time with one op family
stubbed to identity at trace time. The difference is that family's integrated
fwd+replay+bwd cost.

Uses the exact gstep harness from scripts/trainbench.py --grad_only (the
855 ms round-2 baseline). Each variant pays a full remote compile (~2-5 min).

Run: PYTHONPATH=/root/repo python scripts/fambwd.py [families...]
(default: all; pass names to run a subset, e.g. `spatial temporal`)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

from mudg_tpu.models import mdm as M
from mudg_tpu.nn import attention as A
from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U
from mudg_tpu.train import step as TS

REMAT = True  # --remat=dots_attn etc. to ablate at the training default
PRESET = "mdm512"
for _a in sys.argv:
    if _a.startswith("--remat="):
        _v = _a.split("=", 1)[1]
        REMAT = True if _v == "True" else _v
    if _a.startswith("--preset="):
        PRESET = _a.split("=", 1)[1]


def build():
    if PRESET == "mdm1024":
        from mudg_tpu.models import presets

        cfg = presets.get("mdm1024")
        hh, ww = 576, 1024
    else:
        cfg = M.MDMConfig()
        hh, ww = 320, 512
    shapes = jax.eval_shape(lambda k: M.init_mdm(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), shapes)
    trainable, frozen = TS.split_params(params)

    bs, t = 1, 16
    key = jax.random.PRNGKey(1)
    if "--latents" in sys.argv:
        # precomputed-moments batch (data/latents.py): the step skips the
        # frozen VAE encode entirely — shapes are all that matter here
        batch = {
            "dense_moments": jax.random.normal(
                key, (bs, t, hh // 8, ww // 8, 8)),
            "sparse_moments": jax.random.normal(
                key, (bs, t, hh // 8, ww // 8, 8)),
            "depth_moments": jax.random.normal(
                key, (bs, t, hh // 8, ww // 8, 8)),
            "sparse_frame0": jax.random.uniform(
                key, (bs, hh, ww, 3), minval=-1, maxval=1),
            "tokens": jnp.zeros((bs, 77), jnp.int32),
            "class_label": jnp.zeros((bs,), jnp.int32),
            "fps": jnp.full((bs,), 10, jnp.int32),
        }
    else:
        batch = {
            "dense_frames": jax.random.uniform(key, (bs, t, hh, ww, 3), minval=-1, maxval=1),
            "sparse_frames": jax.random.uniform(key, (bs, t, hh, ww, 3), minval=-1, maxval=1),
            "sparse_depth": jax.random.uniform(key, (bs, t, hh, ww, 3), minval=-1, maxval=1),
            "tokens": jnp.zeros((bs, 77), jnp.int32),
            "class_label": jnp.zeros((bs,), jnp.int32),
            "fps": jnp.full((bs,), 10, jnp.int32),
        }
    sched_arrays = M.schedule_arrays(cfg.schedule())
    null_tokens = jnp.zeros((77,), jnp.int32)
    return cfg, trainable, frozen, batch, sched_arrays, null_tokens


def timed(cfg, trainable, frozen, batch, sched_arrays, null_tokens):
    null_emb = jax.jit(
        lambda fz, toks: M.encode_text(fz, cfg, toks[None])
    )(frozen, null_tokens)

    # --freeze: the stage-2 recipe (configs/stage2-1024 config.yaml:65 —
    # temporal transformers frozen). Grads for masked leaves are cut at
    # trace time (stop_gradient), so their wgrad work disappears from the
    # backward, exactly like the app's grad_mask path would after DCE.
    mask = None
    if "--freeze" in sys.argv:
        mask = {
            "unet": TS.temporal_frozen_mask(cfg.unet, trainable["unet"]),
            "image_proj": jax.tree.map(lambda _: True,
                                       trainable["image_proj"]),
        }

    def loss_fn(tr, fz, batch, key):
        if mask is not None:
            tr = jax.tree.map(
                lambda p, m: p if m else jax.lax.stop_gradient(p), tr, mask)
        p = TS.merge_params(tr, fz)
        loss, _ = M.training_loss(
            p, cfg, sched_arrays, batch, key,
            null_emb=null_emb, impl="train", remat=REMAT)
        return loss

    @jax.jit
    def gstep(tr, fz, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(tr, fz, batch, key)
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    t0 = time.perf_counter()
    loss, _ = gstep(trainable, frozen, batch, jax.random.PRNGKey(2))
    _ = float(loss)
    print(f"  # compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        loss, _ = gstep(trainable, frozen, batch, jax.random.PRNGKey(3 + i))
        _ = float(loss)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    want = [a for a in sys.argv[1:] if not a.startswith("-")]
    ctx = build()

    base = timed(*ctx)
    print(f"full fwd+bwd: {base*1e3:7.1f} ms", flush=True)

    saved = {}

    def stub(mod, name, repl):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, repl)

    def restore():
        for (mod, name), v in saved.items():
            setattr(mod, name, v)
        saved.clear()

    variants = {
        # whole spatial transformer blocks (self+cross attn + FF + proj)
        "spatial": lambda: stub(A, "spatial_transformer",
                                lambda p, x, context=None, **kw: x),
        # whole temporal transformer blocks
        "temporal": lambda: stub(A, "temporal_transformer",
                                 lambda p, x, context=None, **kw: x),
        # the GEGLU FFs inside both (overlaps the two above)
        "ff": lambda: stub(A, "feed_forward_block",
                           lambda pf, pn, x, impl="auto": x),
        # temporal conv blocks (4x GN+SiLU+(3,1,1)conv chains)
        "tconv": lambda: stub(U, "temporal_conv_block", lambda p, x, **kw: x),
        # all GroupNorms (fp32 island) — replaced by identity
        "gnorm": lambda: stub(F, "group_norm", lambda p, x, **kw: x),
        # every attention CORE (flash/dense QK^T+softmax+PV) — projections
        # kept; scalar-mean keeps v in the graph without shape coupling
        # (cross-attn has Lk != Lq and image-KV a different head split)
        "attend": lambda: stub(
            A, "attend", lambda q, k, v, **kw: q + 0.0 * jnp.mean(v)),
        # the frozen 3-way stacked VAE encode (no grads flow; pure fwd cost)
        "encode": lambda: stub(
            M.V, "encode_video",
            lambda p, c, x, rng=None, chunk=1: jnp.zeros(
                (x.shape[0], x.shape[1], x.shape[2] // 8, x.shape[3] // 8, 4),
                jnp.bfloat16) + 0.0 * jnp.mean(x).astype(jnp.bfloat16)),
    }
    import os

    for name, do in variants.items():
        if want and name not in want:
            continue
        try:
            if name == "spatial":
                # the spatial-stubbed graph OOMs the compile helper's scoped
                # vmem inside the fused FF bwd kernel (16.73M > 16M, rounds
                # 3-4) — a planning interaction, not a real family cost.
                # Disable the fused FF for BOTH a fresh base and the stub so
                # the difference stays self-consistent (reported base shows
                # the unfused-FF bias).
                os.environ["MUDG_FUSED_FF"] = "0"
                b2 = timed(*ctx)          # unstubbed base, unfused FF
                do()
                t = timed(*ctx)           # spatial stubbed, unfused FF
                print(f"-{name:9s}: {t*1e3:7.1f} ms  (family ~{(b2-t)*1e3:6.1f}"
                      f" ms; unfused-FF base {b2*1e3:7.1f})", flush=True)
                del os.environ["MUDG_FUSED_FF"]
                continue
            do()
            t = timed(*ctx)
            print(f"-{name:9s}: {t*1e3:7.1f} ms  (family ~{(base-t)*1e3:6.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"-{name}: FAIL {type(e).__name__}: {e}", flush=True)
        finally:
            os.environ.pop("MUDG_FUSED_FF", None)
            restore()


if __name__ == "__main__":
    main()
