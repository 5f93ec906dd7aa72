"""Precompute VAE posterior moments for every frame an item list touches.

Usage:
    python -m mudg_tpu precompute-latents --items items.txt \
        [--ckpt model.ckpt|orbax_dir] [--height 320 --width 512] [--batch 16]

Writes sibling .npy caches next to each source frame (data/latents.py
layout). Train with them via `train-mdm --latents`: the training step then
skips the frozen VAE encode entirely (~30% of the MDM512 bs=1 step,
docs/STATE.md round 4). Re-run after changing resolution (caches are
resolution-keyed) or VAE weights (pass --force to overwrite).

The reference has no analog — it re-encodes every batch
(lvdm/models/ddpm3d.py:1077-1079); the Waymo loader is deterministic per
frame file (waymo_data.py:39-43), which is what makes caching exact.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("precompute-latents")
    p.add_argument("--items", required=True, nargs="+",
                   help="item list file(s) (train + val)")
    p.add_argument("--ckpt", default=None,
                   help="torch .ckpt or orbax dir holding the VAE; random "
                        "init when omitted (tests only — WARNS)")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--preset", default=None,
                   choices=(None, "mdm512", "mdm1024", "tiny"))
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--force", action="store_true",
                   help="re-encode even if a cache file exists")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data import latents as L
    from ..data.waymo import read_items
    from ..models import mdm as M
    from ..nn import vae as V
    from ..train import checkpoint as C

    if args.preset:
        from ..models import presets

        cfg = presets.get(args.preset)
    else:
        cfg = M.MDMConfig()
    if args.ckpt and args.ckpt.endswith(".ckpt"):
        vae = jax.tree.map(
            jnp.asarray, C.load_mudg_checkpoint(args.ckpt)["vae"])
    elif args.ckpt:
        tree = C.load_pytree(args.ckpt)
        vae = tree["vae"] if "vae" in tree else tree
    else:
        print("WARNING: random-init VAE (no --ckpt) — test use only")
        vae = M.init_mdm(jax.random.PRNGKey(args.seed), cfg)["vae"]

    items = []
    for path in args.items:
        items.extend(read_items(path))
    n = L.precompute(items, vae, cfg.vae, (args.height, args.width),
                     batch=args.batch, skip_existing=not args.force)
    print(f"precompute-latents: {n} moment files written "
          f"({args.height}x{args.width})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
