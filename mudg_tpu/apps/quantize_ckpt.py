"""Offline checkpoint quantization: torch/orbax checkpoint -> quantized orbax.

Quantize once, serve many: converts a MuDG checkpoint (torch .ckpt via the
pure-python reader, or a native orbax dir) into an orbax checkpoint whose
UNet weights are int8 (quant.py W8A8 or weight-only). render_infer/serve load
the result directly via --ckpt <out_dir> — startup then skips both the torch
decode and the per-launch quantization pass, and the on-disk/HBM UNet is
half size.

Usage:
    python -m mudg_tpu quantize --ckpt mdm512.ckpt --out mdm512-int8 \
        [--mode int8|int8-weights] [--preset mdm512]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="source checkpoint (.ckpt torch zip or orbax dir)")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--preset", default="mdm512")
    p.add_argument("--mode", default="int8", choices=("int8", "int8-weights"))
    p.add_argument("--min_size", type=int, default=None,
                   help="min weight elements to quantize (default "
                        "quant.MIN_QUANT_SIZE)")
    p.add_argument("--conv_mode", default=None, choices=("int8", "int8-weights"),
                   help="override for conv layers; use int8-weights if the "
                        "artifact will serve under --seq_parallel (XLA SPMD "
                        "cannot partition int8 convs)")
    p.add_argument("--which", default="all", choices=("all", "conv"),
                   help="'conv' quantizes only spatial convs — the measured "
                        "latency-win population (blanket W8A8 loses the "
                        "fused bf16 Pallas kernels; docs/STATE.md)")
    args = p.parse_args(argv)

    import jax

    from .. import quant
    from ..models import presets
    from ..train import checkpoint as C
    from .render_infer import load_params

    cfg = presets.get(args.preset)
    params = load_params(args, cfg)
    mode = "w8a8" if args.mode == "int8" else "w8"
    conv_mode = (None if args.conv_mode is None
                 else "w8a8" if args.conv_mode == "int8" else "w8")
    params = dict(params, unet=quant.quantize_pytree(
        params["unet"], mode=mode, min_size=args.min_size,
        conv_mode=conv_mode, which=args.which))
    rep = quant.size_report(params["unet"])
    # orbax restores what was saved — materialize on host-visible devices
    params = jax.tree.map(jax.numpy.asarray, params)
    C.save_pytree(args.out, params)
    print(f"quantize: wrote {args.out} ({mode}; UNet "
          f"{rep['int8_bytes']/2**20:.0f} MiB int8 + "
          f"{rep['other_bytes']/2**20:.0f} MiB fp)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
