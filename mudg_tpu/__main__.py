"""Umbrella CLI: python -m mudg_tpu <command> [args...]

Commands map to the apps package:
  train        MDM stage-1/2 fine-tuning           (apps.train_mdm)
  render       multi-modal autoregressive inference (apps.render_infer)
  serve        warm-model request-spool daemon      (apps.serve)
  conditions   offline sparse RGB/depth generation  (apps.make_conditions)
  refine-gs    3DGS scene refinement                (apps.refine_gs)
  eval         PSNR/SSIM novel-view evaluation      (apps.eval_nvs)
  preprocess   Waymo tfrecord -> scene dirs ETL     (apps.preprocess)
  segment      SegFormer semantic maps per frame    (apps.segment)
  densify      learned/classical depth densification (apps.densify_depth)
  quantize     checkpoint -> int8 orbax for serving (apps.quantize_ckpt)
  precompute-latents  VAE moment caches for fast training (apps.precompute_latents)
  bench        the repo benchmark                   (bench.py main)
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    # hyphenated module-style aliases (docs/scripts use either form)
    cmd = {"render-infer": "render", "train-mdm": "train",
           "make-conditions": "conditions", "eval-nvs": "eval"}.get(cmd, cmd)
    if cmd == "train":
        from .apps.train_mdm import main as run
    elif cmd == "render":
        from .apps.render_infer import main as run
    elif cmd == "serve":
        from .apps.serve import main as run
    elif cmd == "conditions":
        from .apps.make_conditions import main as run
    elif cmd == "refine-gs":
        from .apps.refine_gs import main as run
    elif cmd == "eval":
        from .apps.eval_nvs import main as run
    elif cmd == "preprocess":
        from .apps.preprocess import main as run
    elif cmd == "segment":
        from .apps.segment import main as run
    elif cmd == "densify":
        from .apps.densify_depth import main as run
    elif cmd == "quantize":
        from .apps.quantize_ckpt import main as run
    elif cmd == "precompute-latents":
        from .apps.precompute_latents import main as run
    elif cmd == "bench":
        import importlib.util
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(root, "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        return 2
    rc = run(rest)
    # apps return int exit codes, None, or a result object (e.g. eval's
    # summary dict) — only a real int is an exit status
    return rc if isinstance(rc, int) else 0


if __name__ == "__main__":
    raise SystemExit(main())
