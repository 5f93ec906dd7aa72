"""3DGS scene refinement app: diffusion-supervised splat optimization.

The MuDG paper's third stage (the reference defers it to external CUDA repos,
README.md:113-114): initialize Gaussians from the aggregated LiDAR cloud,
optimize them against MDM-generated dense RGB (+ depth) supervision for the
real and virtual camera trajectories, then render held-out novel views.

Inputs:
  --scene          processed scene dir (objects/background.ply, scenario.pt)
  --supervision    render_infer output dir (virtual_color/ + virtual_depth/)
                   or any dir of {name}_re_{i}.png frames; falls back to the
                   scene's dense images when omitted
Outputs: renders/ novel-view PNGs + gaussians checkpoint + metrics.json.

Usage:
    python -m mudg_tpu.apps.refine_gs --scene <dir> --out out/ [--steps 2000]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def load_views(scene: str, supervision: str | None, cam: str, resolution,
               limit: int | None = None, semantic: bool = False):
    """Build training views: K, w2c, rgb target (+ optional depth and
    semantic class-id maps)."""
    import cv2

    from ..utils import media

    with open(os.path.join(scene, "scenario.pt"), "rb") as f:
        data = pickle.load(f)
    camera = data["observers"][cam]
    n = camera["n_frames"]
    if limit:
        n = min(n, limit)
    h, w = resolution

    views = []
    for i in range(n):
        K = np.asarray(camera["data"]["intr"][i], np.float32).copy()
        c2w = np.asarray(camera["data"]["c2w"][i], np.float32)
        h0, w0 = (int(v) for v in camera["data"]["hw"][i])
        # rescale intrinsics to the working resolution
        K[0] *= w / w0
        K[1] *= h / h0

        img_path = None
        if supervision:
            for cand in (os.path.join(supervision, f"color_re_{i}.png"),
                         os.path.join(supervision, "virtual_color", f"color_re_{i}.png")):
                if os.path.exists(cand):
                    img_path = cand
                    break
        if img_path is None:
            img_path = os.path.join(scene, "images", cam, f"{i:08d}.jpg")
        if not os.path.exists(img_path):
            continue
        img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)

        view = {
            "K": K,
            "w2c": np.linalg.inv(c2w).astype(np.float32),
            "rgb": img.astype(np.float32) / 255.0,
            "frame": i,
        }
        dpath = os.path.join(supervision or "", "virtual_depth", f"depth_re_{i}.npy")
        if supervision and os.path.exists(dpath):
            d = np.load(dpath)
            d = cv2.resize(d, (w, h), interpolation=cv2.INTER_NEAREST)
            view["depth"] = d.astype(np.float32)
            view["depth_mask"] = (d > 0).astype(np.float32)
        if semantic:
            # MDM-generated semantics first, else the scene's SegFormer maps
            spath = None
            for cand in (
                os.path.join(supervision or "", "virtual_semantic",
                             f"semantic_re_{i}.png"),
                os.path.join(scene, "semantic_dense", cam, f"{i:08d}.jpg"),
            ):
                if os.path.exists(cand):
                    spath = cand
                    break
            if spath is not None:
                sem_img = cv2.cvtColor(cv2.imread(spath), cv2.COLOR_BGR2RGB)
                sem_img = cv2.resize(sem_img, (w, h),
                                     interpolation=cv2.INTER_NEAREST)
                _, ids = media.decode_semantic(sem_img)
                view["sem_ids"] = ids.astype(np.int32)
        views.append(view)
    return views


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--supervision", default=None,
                   help="render_infer output dir with MDM-generated frames")
    p.add_argument("--camera", default="camera_FRONT")
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--capacity", type=int, default=200_000)
    p.add_argument("--voxel", type=float, default=0.15)
    p.add_argument("--limit_frames", type=int, default=None)
    p.add_argument("--holdout_every", type=int, default=8)
    p.add_argument("--sh_degree", type=int, default=0, choices=(0, 1, 2, 3),
                   help="spherical-harmonics degree for view-dependent "
                        "color (0 = plain RGB; 3 = full 3DGS)")
    p.add_argument("--semantic", action="store_true",
                   help="train a per-gaussian semantic field against the "
                        "MDM-generated (or SegFormer) class maps and report "
                        "holdout pixel accuracy (StreetGaussians-style; "
                        "forces the XLA rasterizer)")
    p.add_argument("--semantic_weight", type=float, default=0.5)
    p.add_argument("--appearance", action="store_true",
                   help="learn a per-training-view affine color transform "
                        "absorbing exposure/white-balance drift (NeRF-W "
                        "style); holdout renders use the raw scene colors")
    p.add_argument("--dynamic", action="store_true",
                   help="StreetGaussians-style dynamic scene: per-object "
                        "gaussian groups seeded from objects_info.pkl "
                        "canonical clouds, rigidly moved per frame by the "
                        "tracked box poses (gaussians.apply_group_transforms)")
    p.add_argument("--init_gaussians", default=None,
                   help="warm-start from an INRIA-layout gaussians .ply "
                        "(a previous refine-gs export or an external 3DGS "
                        "checkpoint) instead of seeding from the point "
                        "cloud; incompatible with --dynamic (the ply has "
                        "no group ids)")
    p.add_argument("--render_virtual", action="store_true",
                   help="after refinement, render the refined scene along "
                        "the +/-shift lateral virtual trajectories "
                        "(render/splat.virtual_poses) and write PNGs + mp4s "
                        "— the pipeline's novel-view end product")
    p.add_argument("--shift", type=float, default=2.0)
    p.add_argument("--max_pairs", type=int, default=0,
                   help="Pallas-path pair budget; 0 (default) right-sizes "
                        "per scene via the exact count pass "
                        "(tile_raster.auto_budgets)")
    p.add_argument("--raster_backend", default="auto",
                   choices=("auto", "pallas", "xla"),
                   help="auto = Pallas tile kernels on TPU, XLA elsewhere")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..gs import gaussians as G
    from ..gs import train as GT
    from ..render import pointcloud as PC
    from ..utils import media, metrics, native

    xyz, rgb, _ = PC.fetch_ply(os.path.join(args.scene, "objects", "background.ply"))
    if len(xyz) > args.capacity // 2:
        xyz, rgb = native.voxel_downsample(xyz, rgb, args.voxel)
    n0 = min(len(xyz), args.capacity)
    xyz, rgb = xyz[:n0], rgb[:n0]
    grp = obj_info = None
    if args.dynamic:
        with open(os.path.join(args.scene, "objects_info.pkl"), "rb") as f:
            obj_info = pickle.load(f)
        obj_info = [o for o in obj_info if len(o["point_cloud"]["points"])]
        # objects get their slots FIRST — a capacity-filling background must
        # never silently truncate the dynamic groups this mode exists for
        n_obj = sum(len(o["point_cloud"]["points"]) for o in obj_info)
        assert n_obj < args.capacity, \
            f"--capacity {args.capacity} cannot hold {n_obj} object points"
        if n0 > args.capacity - n_obj:
            n0 = args.capacity - n_obj
            print(f"dynamic: background trimmed to {n0} points to reserve "
                  f"{n_obj} object slots")
        xs, cs, gi = [xyz[:n0]], [rgb[:n0]], [np.zeros(n0, np.int32)]
        for j, o in enumerate(obj_info):
            pts = np.asarray(o["point_cloud"]["points"], np.float32)
            xs.append(pts)
            cs.append(np.asarray(o["point_cloud"]["colors"], np.float32))
            gi.append(np.full(len(pts), j + 1, np.int32))
        xyz = np.concatenate(xs)
        rgb = np.concatenate(cs)
        grp = np.concatenate(gi)
        n0 = len(xyz)
    if args.init_gaussians:
        assert not args.dynamic, "--init_gaussians + --dynamic unsupported"
        from ..gs.io import load_gaussians_ply

        g0 = load_gaussians_ply(args.init_gaussians)
        n0 = min(g0.n, args.capacity)
        pad = args.capacity - n0

        def padded(x, fill=0.0):
            x = np.asarray(x)[:n0]
            return jnp.asarray(np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)]))

        g = G.Gaussians(
            means=padded(g0.means), log_scales=padded(g0.log_scales),
            quats=padded(g0.quats), opacity=padded(g0.opacity, -6.0),
            colors=padded(g0.colors),
            active=jnp.arange(args.capacity) < n0,
            sh=None if g0.sh is None else padded(g0.sh),
        )
        print(f"warm start: {n0} splats from {args.init_gaussians}")
    else:
        g = G.init_from_points(
            jnp.asarray(xyz), jnp.asarray(rgb), capacity=args.capacity
        )
        if grp is not None:
            pad = np.zeros(args.capacity, np.int32)
            pad[:n0] = grp
            g = g._replace(group=jnp.asarray(pad))
            print(f"dynamic: {len(obj_info)} tracked objects as rigid groups")
    print(f"init: {n0} gaussians (capacity {args.capacity})")

    views = load_views(args.scene, args.supervision, args.camera,
                       (args.height, args.width), limit=args.limit_frames,
                       semantic=args.semantic)
    assert views, "no training views found"
    if args.semantic:
        assert any("sem_ids" in v for v in views), \
            "--semantic: no semantic maps found (supervision dir or scene)"
    if args.dynamic:
        # per-frame canonical->world transform + visibility per rigid group
        # (row 0 = static background)
        n_frames = max(v["frame"] for v in views) + 1
        n_groups = 1 + len(obj_info)
        T_tab = np.tile(np.eye(4, dtype=np.float32), (n_frames, n_groups, 1, 1))
        # frames without tracking info hide the object (identity would plant
        # it at the canonical box pose near the origin); background stays on
        vis_tab = np.zeros((n_frames, n_groups), bool)
        vis_tab[:, 0] = True
        for j, o in enumerate(obj_info):
            for f_i in range(min(n_frames, len(o["transform_obj"]))):
                T_tab[f_i, j + 1] = np.asarray(o["transform_obj"][f_i], np.float32)
                vis_tab[f_i, j + 1] = bool(np.asarray(o["visibility"])[f_i])
        for v in views:
            v["obj_T"] = T_tab[v["frame"]]
            v["obj_vis"] = vis_tab[v["frame"]]
    for v in views:
        v.pop("frame")
    train_views = [v for i, v in enumerate(views) if i % args.holdout_every != 0]
    hold_views = [v for i, v in enumerate(views) if i % args.holdout_every == 0]
    if not train_views:
        train_views = views
    print(f"views: {len(train_views)} train / {len(hold_views)} holdout")
    if args.semantic:
        # the TRAINING split must carry maps or the CE term never fires and
        # the semantic field silently stays at its uniform init
        assert any("sem_ids" in v for v in train_views), \
            "--semantic: no semantic maps in the training split"

    views_j = [
        {k: jnp.asarray(v[k]) for k in v} for v in train_views
    ]
    cfg = GT.GSConfig(backend=args.raster_backend, sh_degree=args.sh_degree,
                      semantic_weight=args.semantic_weight if args.semantic
                      else 0.0, appearance=args.appearance,
                      max_pairs=args.max_pairs or None)
    state, history = GT.fit_scene(
        g, views_j, cfg, width=args.width, height=args.height,
        steps=args.steps, log_every=max(args.steps // 20, 1),
    )
    # eval budgets are resolved over ALL views (train + holdout — holdout
    # and +/-shift virtual cameras can see more pairs than any training
    # view; the old train-views-only budget silently truncated novel
    # views), with extra slack for the virtual trajectories. n_dropped is
    # still checked per render below.
    all_views_j = views_j + [
        {k: jnp.asarray(v[k]) for k in v} for v in hold_views
    ]
    raster = GT._pick_raster(
        cfg, args.width, args.height,
        GT.resolve_budgets(cfg, state.gaussians, all_views_j,
                           width=args.width, height=args.height,
                           slack=1.5))

    os.makedirs(args.out, exist_ok=True)
    rdir = os.path.join(args.out, "renders")
    os.makedirs(rdir, exist_ok=True)

    # jitted eval renderers: eager jax dispatch is pathologically slow here
    # (remote tunnel, ~0.4 s per new dispatch — CLAUDE.md); one compile each,
    # fast replays across frames/sides
    if state.gaussians.sem is not None:
        _render_jit = jax.jit(lambda gg, K, w2c: raster(
            gg, K, w2c, features=jax.nn.softmax(gg.sem, -1)))
    else:
        _render_jit = jax.jit(lambda gg, K, w2c: raster(gg, K, w2c))
    dropped_renders = []

    def render_fn(gg, K, w2c, what="render"):
        out = _render_jit(gg, K, w2c)
        nd = int(out.n_dropped)
        if nd:
            dropped_renders.append({"view": what, "n_dropped": nd})
            print(f"WARNING: {what}: {nd} pairs over the rasterizer budget "
                  "were dropped (deepest-sorted tail) — re-run with a "
                  "larger --max_pairs for exact output", flush=True)
        return out
    transform_fn = jax.jit(G.apply_group_transforms)

    def view_gaussians(v):
        if "obj_T" in v:
            return transform_fn(state.gaussians, jnp.asarray(v["obj_T"]),
                                jnp.asarray(v["obj_vis"]))
        return state.gaussians

    psnrs, sem_accs = [], []
    for i, v in enumerate(hold_views or train_views[:4]):
        out = render_fn(view_gaussians(v), jnp.asarray(v["K"]),
                        jnp.asarray(v["w2c"]), what=f"holdout {i}")
        img = np.asarray(out.color)
        media.save_image(os.path.join(rdir, f"nv_{i:04d}.png"),
                         (np.clip(img, 0, 1) * 255).astype(np.uint8))
        psnrs.append(metrics.psnr(img, v["rgb"], data_range=1.0))
        if out.features is not None and "sem_ids" in v:
            pred = np.asarray(jnp.argmax(out.features, -1))
            covered = np.asarray(out.alpha) > 0.5
            if covered.any():
                sem_accs.append(
                    float((pred[covered] == v["sem_ids"][covered]).mean()))
            media.save_image(
                os.path.join(rdir, f"sem_{i:04d}.png"),
                media.encode_semantic(pred).astype(np.uint8))

    if args.render_virtual:
        from ..render.splat import virtual_poses

        sides = ("left", "right")
        frames = {s: [] for s in sides}
        for s in sides:
            os.makedirs(os.path.join(args.out, "virtual_renders", s),
                        exist_ok=True)
        for i, v in enumerate(views):
            gv = view_gaussians(v)  # one group transform per frame
            c2w = np.linalg.inv(np.asarray(v["w2c"], np.float64))
            vposes = virtual_poses(c2w, shift=args.shift, with_original=False)
            for side, vpose in zip(sides, vposes):
                w2c_v = jnp.asarray(np.linalg.inv(vpose), jnp.float32)
                out = render_fn(gv, jnp.asarray(v["K"]), w2c_v,
                                what=f"virtual {side} {i}")
                img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
                media.save_image(os.path.join(
                    args.out, "virtual_renders", side, f"nv_{i:04d}.png"), img)
                frames[side].append(img)
        for side in sides:
            media.save_video(os.path.join(args.out, f"virtual_{side}.mp4"),
                             np.stack(frames[side]), fps=10)

    result = {
        "n_gaussians_active": int(np.asarray(state.gaussians.active).sum()),
        "holdout_psnr_mean": float(np.mean(psnrs)) if psnrs else None,
        "holdout_semantic_acc": float(np.mean(sem_accs)) if sem_accs else None,
        "dropped_renders": dropped_renders,  # nonempty = budget exceeded
        "history": history,
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(result, f, indent=2)
    with open(os.path.join(args.out, "gaussians.pkl"), "wb") as f:
        pickle.dump(
            {k: np.asarray(getattr(state.gaussians, k))
             for k in state.gaussians._fields
             if getattr(state.gaussians, k) is not None}, f,
        )
    # ecosystem interop: standard INRIA point_cloud.ply (any splat viewer)
    from ..gs.io import save_gaussians_ply

    n_ply = save_gaussians_ply(
        os.path.join(args.out, "gaussians.ply"), state.gaussians)
    print(f"wrote gaussians.ply ({n_ply} splats, INRIA 3DGS layout)")
    print(json.dumps({k: result[k] for k in ("n_gaussians_active", "holdout_psnr_mean")}))


if __name__ == "__main__":
    main()
