"""Multi-modal inference app: autoregressive novel-view video synthesis.

Rebuild of `virtual_render/virtual_pose_render.py:150-368` (run_inference_multi):
  * three task batches (color / depth / semantic) share one sparse-RGB + one
    sparse-depth condition window; distinct class labels 0/500/1,
  * all three tasks AND their CFG variants run in ONE jitted sampler call
    (batch tasks*variants per UNet step),
  * autoregressive sliding window: advance by video_length//2 frames, splice
    the previous window's generated color frames into the next window's
    sparse condition, always re-anchoring frame 0 to dense GT (:246,271-274),
  * per-task saving: color PNGs, depth .npy + Spectral visualization,
    semantic nearest-palette decode, side-by-side compare mp4s.

Usage:
    python -m mudg_tpu.apps.render_infer --items items.txt --out out/ \
        [--ckpt model.ckpt] [--height 320 --width 512] [--steps 50]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

TASKS = ("color", "depth", "semantic")


def load_params(args, cfg):
    import jax
    import jax.numpy as jnp
    from ..models import mdm as M

    if args.ckpt and args.ckpt.endswith(".ckpt"):
        from ..train import checkpoint as C

        trees = C.load_mudg_checkpoint(args.ckpt)
        params = {
            "unet": trees["unet"],
            "vae": trees["vae"],
            "image_proj": trees["image_proj"],
            "clip_text": trees["clip_text"].get("model", trees["clip_text"]),
            "clip_image": trees["clip_image"].get("model", {}).get("visual",
                          trees["clip_image"]),
        }
        params = jax.tree.map(jnp.asarray, params)
    elif args.ckpt:
        from ..train import checkpoint as C

        params = C.load_pytree(args.ckpt)
    else:
        print("WARNING: no checkpoint given; using random weights")
        params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    return params


def make_sp(seq_parallel: bool):
    """Build the sequence-parallel sharding when requested and >1 device is
    visible. Returns (sp, impl): sp=None/impl='auto' otherwise. impl='xla'
    because the SPMD partitioner cannot split Pallas calls (parallel/sp.py)."""
    import jax

    if seq_parallel and jax.device_count() > 1:
        from ..parallel import mesh as PM
        from ..parallel import sp as SP

        return SP.make_seq_sharding(PM.make_mesh(axis_names=("seq",))), "xla"
    return None, "auto"


def prepare_serving_params(params, quantize: str, sp, min_size=None):
    """Apply serving-time quantization (shared by render_infer and serve).

    quantize: 'none' | 'int8' (W8A8 dynamic, every conv/linear) |
    'int8-conv' (W8A8 on spatial convs ONLY — the measured-win policy) |
    'int8-conv-wide' (convs + wide C>=1024 matmuls, where no fused bf16
    kernel is displaced — see quant.quantize_pytree) |
    'int8-weights' (weight-only). min_size: minimum weight-element count to
    quantize (None = quant.py default).
    Measured end-to-end on v5e (docs/STATE.md): blanket 'int8' is a net
    LOSS for latency (7.23 vs bf16's 5.53 s/clip — quantized matmul layers
    forfeit the fused Pallas kernels); use it for HBM relief, not speed.
    'int8-conv' quantizes only the layer population where int8 measured
    1.5-2x (conv3x3) and displaces no fused kernel.
    Under sequence parallelism conv leaves fall back to weight-only — XLA's
    SPMD partitioner cannot handle int8 conv_general_dilated (see
    quant.quantize_pytree docstring) — including convs inside an
    already-quantized checkpoint artifact (apps/quantize_ckpt.py), whose
    w8a8 conv leaves are demoted by a pure key rename."""
    from .. import quant

    if quantize != "none":
        mode = "w8" if quantize == "int8-weights" else "w8a8"
        params = dict(params, unet=quant.quantize_pytree(
            params["unet"], mode=mode, min_size=min_size,
            which={"int8-conv": "conv",
                   "int8-conv-wide": "conv_wide"}.get(quantize, "all"),
            conv_mode="w8" if sp is not None else None))
    if sp is not None:
        unet, n = quant.conv_w8a8_to_w8(params["unet"])
        if n:
            params = dict(params, unet=unet)
            print(f"seq-parallel: {n} int8 conv layers demoted to "
                  "weight-only (SPMD cannot partition int8 convs)", flush=True)
        # checkpoint loads commit arrays to ONE device; the sharded sampler
        # needs them replicated over the mesh (uncommitted random-init params
        # only worked by accident of placement freedom)
        from ..parallel import mesh as PM

        params = PM.replicate(params, sp.rows.mesh)
    if quantize != "none":
        rep = quant.size_report(params["unet"])
        print(f"{quantize} UNet: {rep['int8_bytes']/2**20:.0f} MiB int8 + "
              f"{rep['other_bytes']/2**20:.0f} MiB fp", flush=True)
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--items", required=True, help="dict-per-line item file")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--bpe", default=None, help="CLIP BPE vocab path")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--cfg_img", type=float, default=None)
    p.add_argument("--multiple_cond_cfg", action="store_true")
    p.add_argument("--guidance_rescale", type=float, default=0.7)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--sampler", default="ddim", choices=("ddim", "dpmpp"),
                   help="dpmpp = DPM-Solver++(2M): ~50-step-DDIM quality in "
                        "~20 steps (net-new; ddim is the reference recipe)")
    p.add_argument("--timestep_spacing", default="uniform_trailing")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--prompt", default="A photo a of driving scene.")
    p.add_argument("--task_serial", action="store_true",
                   help="run the 3 tasks as separate UNet batches "
                        "(fits a single 16G chip at full resolution)")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--max_windows", type=int, default=None)
    p.add_argument("--preset", default="mdm512",
                   choices=("mdm512", "mdm1024", "tiny"))
    p.add_argument("--base_scale", type=float, default=None,
                   help="dynamic-rescale base override (0.7 stage1 / 0.3 stage2)")
    p.add_argument("--dtype", default="bf16", choices=("bf16", "f32"),
                   help="compute dtype; bf16 matches the reference's fp16 "
                        "autocast inference (virtual_pose_render.py:218) and "
                        "is ~2x faster on TPU (fp32 norm/softmax islands "
                        "apply either way)")
    p.add_argument("--quantize", default="none",
                   choices=("none", "int8", "int8-conv", "int8-conv-wide",
                            "int8-weights"),
                   help="post-training quantization of the UNet for serving "
                        "(quant.py). 'int8' = W8A8 dynamic (int8 weights + "
                        "dynamic activation scales, int32 MXU dots); "
                        "'int8-conv' = W8A8 on spatial convs only (the "
                        "latency-win policy — see prepare_serving_params); "
                        "'int8-weights' = weight-only (int8 storage/HBM, "
                        "bf16 compute — no activation-quantization error)")
    p.add_argument("--quantize_min_size", type=int, default=None,
                   help="min weight elements to quantize (default: quant.py "
                        "MIN_QUANT_SIZE). 200000 is the MFU-aware sweet spot "
                        "on v5e: keeps C<=320 square linears (already ~95% "
                        "MFU in bf16) full precision, quantizes the rest "
                        "(see prepare_serving_params docstring)")
    p.add_argument("--seq_parallel", action="store_true",
                   help="shard ONE clip's sampling over all devices "
                        "(parallel/sp.py: spatial layers frame-sharded, "
                        "temporal layers W-sharded); forces impl='xla' "
                        "because the SPMD partitioner cannot split Pallas "
                        "calls. Ignored on a single device.")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models import mdm as M
    from ..data import conditions as DC
    from ..data.waymo import read_items
    from ..conditioning.tokenizer import default_tokenizer
    from ..utils import media

    assert args.height % 16 == 0 and args.width % 16 == 0, \
        "image size must be a multiple of 16"  # virtual_pose_render.py:165

    from ..models import presets

    cfg = presets.get(args.preset)
    if args.base_scale is not None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, base_scale=args.base_scale)
    params = load_params(args, cfg)
    sp, impl = make_sp(args.seq_parallel)
    params = prepare_serving_params(params, args.quantize, sp,
                                    min_size=args.quantize_min_size)
    # real checkpoints demand the real BPE table (hash ids would index
    # meaningless rows of the learned text embedding)
    tokenizer = default_tokenizer(args.bpe, require_real=bool(args.ckpt))
    resolution = (args.height, args.width)
    vl = args.video_length

    items = read_items(args.items)
    n_items = len(items)

    tokens = jnp.asarray(tokenizer([args.prompt] * len(TASKS)))
    null_tokens = jnp.asarray(tokenizer([""])[0])

    sample_fn = build_sampler(
        cfg, steps=args.steps, cfg_scale=args.cfg_scale, cfg_img=args.cfg_img,
        multiple_cond_cfg=args.multiple_cond_cfg,
        guidance_rescale=args.guidance_rescale, eta=args.eta,
        timestep_spacing=args.timestep_spacing, fps=args.fps,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        impl=impl, sp=sp, sampler=args.sampler,
    )
    render_items(
        params, sample_fn, items, args.out,
        tokens=tokens, null_tokens=null_tokens, video_length=vl,
        resolution=resolution, task_serial=args.task_serial, fps=args.fps,
        max_windows=args.max_windows, seed=args.seed,
    )


def build_sampler(cfg, *, steps, cfg_scale=7.5, cfg_img=None,
                  multiple_cond_cfg=False, guidance_rescale=0.7, eta=1.0,
                  timestep_spacing="uniform_trailing", fps=10, dtype=None,
                  impl="auto", sp=None, sampler="ddim"):
    """One jitted 3-task guided sampler; reused across windows AND requests
    (apps/serve.py keeps it warm — recompiles only if `steps`/shapes change)."""
    import jax
    import jax.numpy as jnp

    from ..models import mdm as M

    dtype = jnp.bfloat16 if dtype is None else dtype

    # params/tokens go through jit as ARGUMENTS (captured closures would be
    # baked into the executable as constants -> multi-GB, slow compiles)
    @jax.jit
    def sample_fn(params, tokens, null_tokens, key, sparse_frames,
                  sparse_depth, class_label):
        return M.sample(
            params, cfg, key,
            sparse_frames=sparse_frames, sparse_depth=sparse_depth,
            tokens=tokens, null_tokens=null_tokens, class_label=class_label,
            num_steps=steps, guidance_scale=cfg_scale,
            cfg_img=cfg_img, multiple_cond_cfg=multiple_cond_cfg,
            guidance_rescale=guidance_rescale, eta=eta,
            timestep_spacing=timestep_spacing, fs=fps,
            dtype=dtype, impl=impl, sp=sp, sampler=sampler,
        )

    return sample_fn


def render_items(params, sample_fn, items, out_dir, *, tokens, null_tokens,
                 video_length, resolution, task_serial=False, fps=10,
                 max_windows=None, seed=123):
    """The autoregressive 3-task window loop (virtual_pose_render.py:150-368)
    over one item list; writes per-task frames + compare videos under
    out_dir. Returns {'windows': N, 'seconds': dt}."""
    import jax
    import jax.numpy as jnp

    from ..data import conditions as DC
    from ..utils import media

    vl = video_length
    n_items = len(items)
    rng = jax.random.PRNGKey(seed)
    os.makedirs(out_dir, exist_ok=True)
    compare = {t: [] for t in TASKS}

    index = 0
    carry_color = None  # generated frames spliced into next window
    n_windows = 0
    t_start = time.time()
    while index < n_items:
        sample = items[index]
        task_data = {t: DC.get_task_frames(sample, t, resolution) for t in TASKS}
        sparse_depth = DC.get_sparse_depth(sample, resolution)

        sparse = task_data["color"]["sparse_frames"].copy()
        if carry_color is not None:
            # splice previous generated colors into the first half
            sparse[0 : vl // 2] = carry_color[: vl // 2]
            sparse[0] = task_data["color"]["dense_frames"][0]  # re-anchor GT

        sparse_b = np.stack([sparse] * len(TASKS))
        depth_b = np.stack([sparse_depth] * len(TASKS))
        labels = np.asarray(
            [task_data[t]["class_label"] for t in TASKS], np.int32
        )

        rng, key = jax.random.split(rng)
        if task_serial:
            # memory-saving mode: one UNet batch per task (the 3-task batch
            # at full 320x512 exceeds a single 16G chip's HBM; batching is
            # the default on pods where it rides the batch sharding)
            outs = []
            for ti in range(len(TASKS)):
                outs.append(np.asarray(sample_fn(
                    params, tokens[ti : ti + 1], null_tokens, key,
                    jnp.asarray(sparse_b[ti : ti + 1]),
                    jnp.asarray(depth_b[ti : ti + 1]),
                    jnp.asarray(labels[ti : ti + 1]),
                )))
            out = np.concatenate(outs, axis=0)
        else:
            out = np.asarray(sample_fn(
                params, tokens, null_tokens, key,
                jnp.asarray(sparse_b), jnp.asarray(depth_b), jnp.asarray(labels),
            ))  # (3, T, H, W, 3) in [-1,1]

        for ti, task in enumerate(TASKS):
            video = out[ti]
            dense = task_data[task]["dense_frames"]
            tdir = os.path.join(out_dir, f"virtual_{task}")
            os.makedirs(tdir, exist_ok=True)
            for fi in range(vl):
                gi = index + fi
                re_u8 = media.to_uint8(video[fi])
                gt_u8 = media.to_uint8(dense[fi])
                if task == "depth":
                    # mean over channels -> metric depth (eval_tools.py:72-75)
                    d = (video[fi].mean(-1) + 1) / 2 * 100.0
                    np.save(os.path.join(tdir, f"depth_re_{gi}.npy"), d)
                    re_u8 = media.visualize_depth(d, vmin=0, vmax=100)
                elif task == "semantic":
                    re_u8, _ = media.decode_semantic(re_u8.astype(np.float32))
                media.save_image(os.path.join(tdir, f"{task}_re_{gi}.png"), re_u8)
                media.save_image(os.path.join(tdir, f"{task}_gt_{gi}.png"), gt_u8)
                if fi >= 1 and fi <= vl // 2:
                    compare[task].append(np.concatenate([re_u8, gt_u8], axis=1))

        # autoregressive carry: second half of the generated color window
        carry_color = out[0, vl // 2 :].copy()
        index += vl // 2
        n_windows += 1
        if max_windows and n_windows >= max_windows:
            break
        print(f"window {n_windows}: frames {index - vl // 2}..{index}")

    for task in TASKS:
        if compare[task]:
            media.save_video(
                os.path.join(out_dir, f"compare_{task}.mp4"),
                np.stack(compare[task]), fps=fps,
            )
    dt = time.time() - t_start
    print(f"done: {n_windows} windows in {dt:.1f}s "
          f"({dt / max(n_windows, 1):.1f}s/window)")
    return {"windows": n_windows, "seconds": dt}


if __name__ == "__main__":
    main()
