"""Diffusion-supervised 3DGS scene refinement (the paper's stage the
reference delegates to external CUDA repos, README.md:113-114).

Optimizes a fixed-capacity Gaussian set against MDM-generated supervision:
RGB (L1 + D-SSIM), optional depth L1 on the alpha-weighted expected depth.
Per-parameter-group Adam learning rates follow the 3DGS defaults. Adaptive
density control (clone/split/prune) runs on host between jitted segments and
reuses inactive capacity slots so array shapes never change (no recompiles).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .gaussians import Gaussians
from .rasterize import rasterize
from .tile_raster import rasterize_pallas


@dataclasses.dataclass(frozen=True)
class GSConfig:
    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacity: float = 0.05
    lr_colors: float = 2.5e-3
    lr_sh: float = 1.25e-4           # 3DGS convention: feature lr / 20
    sh_degree: int = 0               # 0 = view-independent color (legacy);
                                     # 1..3 adds rest-band SH coefficients
                                     # (gaussians.view_colors) for
                                     # view-dependent effects
    ssim_weight: float = 0.2
    depth_weight: float = 0.1
    semantic_weight: float = 0.0     # >0 trains a per-gaussian semantic
                                     # field (Gaussians.sem logits) against
                                     # per-view class-id maps, composited as
                                     # extra feature channels (both backends)
    semantic_classes: int = 19       # cityscapes train ids (SegFormer)
    lr_sem: float = 2.5e-3
    appearance: bool = False         # per-view affine color compensation
                                     # (NeRF-W/StreetGaussians-style): a
                                     # learned (3,4) transform per TRAINING
                                     # view absorbs exposure/white-balance
                                     # drift so the gaussians learn the
                                     # consistent scene; holdout renders use
                                     # the raw colors
    lr_appearance: float = 1e-3
    densify_every: int = 100
    opacity_reset_every: int = 3000  # 3DGS floater control: periodically
                                     # clamp all opacities to <= 0.01 and let
                                     # supervision re-grow the real surfaces
                                     # (0 disables)
    densify_grad_thresh: float = 2e-4
    prune_opacity_thresh: float = 0.005
    split_scale_thresh: float = 0.05   # world units; split if larger
    max_per_tile: int = 256          # XLA-path capacity (backend="xla")
    tiles_per_gaussian: int = 16     # XLA-path per-gaussian tile cap
    backend: str = "auto"            # "auto" | "pallas" | "xla": auto picks
                                     # the capacity-free Pallas tile kernels
                                     # on TPU, the sort+scan path elsewhere
    max_pairs: int | None = 1 << 21  # Pallas-path global pair budget; None =
                                     # right-size per scene via
                                     # tile_raster.auto_budgets (build_pairs
                                     # cost scales with the budget — a blind
                                     # budget is pure waste); re-resolved
                                     # after every densify (which recompiles
                                     # anyway: N changes shape)


def gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(a, b, window=None):
    """Single-scale SSIM on (H, W, C) images in [0,1] (3DGS loss component)."""
    if window is None:
        window = gaussian_window()
    w = window[:, :, None, None]  # HWIO with I=1

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.transpose(2, 0, 1)[:, None],  # (C,1,H,W)
            window[None, None],
            (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[:, 0].transpose(1, 2, 0)

    mu_a, mu_b = filt(a), filt(b)
    sig_a = filt(a * a) - mu_a**2
    sig_b = filt(b * b) - mu_b**2
    sig_ab = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * mu_a * mu_b + c1) * (2 * sig_ab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (sig_a + sig_b + c2)
    )
    return jnp.mean(s)


class GSTrainState(NamedTuple):
    gaussians: Gaussians
    opt_state: object
    grad_accum: jnp.ndarray   # (N,) accumulated positional grad norms
    grad_count: jnp.ndarray   # (N,)
    step: jnp.ndarray
    appearance: jnp.ndarray | None = None  # (V, 3, 4) per-view affine color


def _float_fields(g: Gaussians) -> dict:
    f = {"means": g.means, "log_scales": g.log_scales, "quats": g.quats,
         "opacity": g.opacity, "colors": g.colors}
    if g.sh is not None:
        f["sh"] = g.sh
    if g.sem is not None:
        f["sem"] = g.sem
    return f


def _with_floats(g: Gaussians, f: dict) -> Gaussians:
    return Gaussians(means=f["means"], log_scales=f["log_scales"],
                     quats=f["quats"], opacity=f["opacity"],
                     colors=f["colors"], active=g.active, sh=f.get("sh"),
                     sem=f.get("sem"), group=g.group)


def make_gs_optimizer(cfg: GSConfig):
    """Per-field Adam via optax.multi_transform over the trainable fields
    (the boolean active mask is not a parameter). Labels are computed from
    the param dict so the optional 'sh' field joins automatically."""
    names = {"means": "means", "log_scales": "scales", "quats": "quats",
             "opacity": "opacity", "colors": "colors", "sh": "sh",
             "sem": "sem", "appearance": "appearance"}
    tx = {
        "means": optax.adam(cfg.lr_means),
        "scales": optax.adam(cfg.lr_scales),
        "quats": optax.adam(cfg.lr_quats),
        "opacity": optax.adam(cfg.lr_opacity),
        "colors": optax.adam(cfg.lr_colors),
        "sh": optax.adam(cfg.lr_sh),
        "sem": optax.adam(cfg.lr_sem),
        "appearance": optax.adam(cfg.lr_appearance),
    }
    return optax.multi_transform(tx, lambda params: {k: names[k] for k in params})


def _identity_appearance(n_views: int):
    A = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    return jnp.tile(A[None], (n_views, 1, 1))


def _train_params(state: GSTrainState) -> dict:
    f = _float_fields(state.gaussians)
    if state.appearance is not None:
        f["appearance"] = state.appearance
    return f


def init_state(g: Gaussians, cfg: GSConfig,
               n_views: int = 0) -> GSTrainState:
    opt = make_gs_optimizer(cfg)
    appearance = (_identity_appearance(n_views)
                  if cfg.appearance and n_views else None)
    state = GSTrainState(
        gaussians=g,
        opt_state=None,
        grad_accum=jnp.zeros((g.n,), jnp.float32),
        grad_count=jnp.zeros((g.n,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        appearance=appearance,
    )
    return state._replace(opt_state=opt.init(_train_params(state)))


def _use_pallas(cfg: GSConfig) -> bool:
    return cfg.backend == "pallas" or (
        cfg.backend == "auto" and jax.default_backend() == "tpu"
    )


def _pick_raster(cfg: GSConfig, width: int, height: int, budgets=None):
    """budgets: optional (max_rows, max_pairs) from tile_raster.auto_budgets,
    overriding cfg.max_pairs (fit_scene resolves them per scene when
    cfg.max_pairs is None)."""
    if _use_pallas(cfg):
        if budgets is not None:
            mr, mp = budgets
        else:
            mr, mp = None, cfg.max_pairs or (1 << 21)
        return partial(rasterize_pallas, width=width, height=height,
                       max_pairs=mp, max_rows=mr)
    return partial(
        rasterize, width=width, height=height,
        max_per_tile=cfg.max_per_tile, tiles_per_gaussian=cfg.tiles_per_gaussian,
    )


def resolve_budgets(cfg: GSConfig, g: Gaussians, views, *, width: int,
                    height: int, slack: float = 1.25, sample: int = 8):
    """(max_rows, max_pairs) for the scene: max of the exact count pass over
    <= `sample` evenly-spaced views, bucketed with extra slack for the
    unsampled views and for group-transform drift. None when auto-sizing is
    off (cfg.max_pairs set) or the XLA backend is active."""
    if cfg.max_pairs is not None or not _use_pallas(cfg):
        return None
    from .tile_raster import auto_budgets

    idx = np.unique(np.linspace(0, len(views) - 1,
                                min(sample, len(views))).astype(int))
    mr = mp = 1024
    for i in idx:
        v = views[i]
        # dynamic scenes: count at the view's object poses, not canonical
        # (an off-screen canonical box contributes ~0 pairs but can fill
        # the frame once transformed)
        ot = v.get("obj_T") if g.group is not None else None
        r, p = auto_budgets(g, v["K"], v["w2c"],
                            width=width, height=height, slack=slack,
                            obj_T=ot,
                            obj_vis=v.get("obj_vis") if ot is not None
                            else None)
        mr, mp = max(mr, r), max(mp, p)
    return mr, mp


def make_gs_train_step(cfg: GSConfig, *, width: int, height: int,
                       budgets=None):
    opt = make_gs_optimizer(cfg)
    raster = _pick_raster(cfg, width, height, budgets)

    def loss_fn(floats, active, group, obj_T, obj_vis, view_idx, K, w2c,
                target_rgb, target_depth, depth_mask, sem_ids):
        g = _with_floats(
            Gaussians(None, None, None, None, None, active, group=group),
            floats)
        if obj_T is not None:
            from .gaussians import apply_group_transforms

            g = apply_group_transforms(g, obj_T, obj_vis)
        semantic = g.sem is not None and sem_ids is not None
        if semantic:
            out = raster(g, K, w2c, features=jax.nn.softmax(g.sem, -1))
        else:
            out = raster(g, K, w2c)
        color = out.color
        if "appearance" in floats:
            # per-view affine exposure compensation applied to the RENDER:
            # the view's drift is absorbed here, not in the scene colors
            A = floats["appearance"][view_idx]
            color = jnp.einsum("hwc,dc->hwd", color, A[:, :3]) + A[:, 3]
        l1 = jnp.mean(jnp.abs(color - target_rgb))
        loss = (1 - cfg.ssim_weight) * l1 + cfg.ssim_weight * (
            1.0 - ssim(color, target_rgb)
        )
        if target_depth is not None:
            d = out.depth / jnp.maximum(out.alpha, 1e-6)
            dl = jnp.abs(d - target_depth) * depth_mask
            loss = loss + cfg.depth_weight * jnp.sum(dl) / jnp.maximum(
                jnp.sum(depth_mask), 1.0
            )
        if semantic:
            # alpha-normalized expected class distribution vs the target id;
            # supervise only covered pixels (the class mixture is undefined
            # where nothing was splatted)
            p = out.features / jnp.maximum(out.alpha[..., None], 1e-6)
            tgt = jax.nn.one_hot(sem_ids, p.shape[-1])
            ce = -jnp.log(jnp.sum(p * tgt, -1).clip(1e-8))
            mask = (out.alpha > 0.5).astype(jnp.float32)
            loss = loss + cfg.semantic_weight * jnp.sum(ce * mask) / \
                jnp.maximum(jnp.sum(mask), 1.0)
        return loss, out

    @jax.jit
    def step(state: GSTrainState, K, w2c, target_rgb, target_depth,
             depth_mask, obj_T=None, obj_vis=None, sem_ids=None,
             view_idx=0):
        floats = _train_params(state)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            floats, state.gaussians.active, state.gaussians.group,
            obj_T, obj_vis, view_idx, K, w2c, target_rgb, target_depth,
            depth_mask, sem_ids,
        )
        updates, opt_state = opt.update(grads, state.opt_state, floats)
        if "appearance" in updates:
            # only the sampled view's affine moves: Adam's momentum would
            # otherwise keep drifting every OTHER view's row (zero gradient,
            # nonzero m_hat) for ~1/(1-b1) steps after it was last sampled
            one = jax.nn.one_hot(view_idx, updates["appearance"].shape[0],
                                 dtype=updates["appearance"].dtype)
            updates = dict(updates, appearance=updates["appearance"]
                           * one[:, None, None])
        new_floats = optax.apply_updates(floats, updates)
        appearance = new_floats.pop("appearance", None)
        g = _with_floats(state.gaussians, new_floats)
        # densification statistics: positional gradient magnitude
        pos_grad = jnp.linalg.norm(grads["means"], axis=-1)
        touched = pos_grad > 0
        new_state = GSTrainState(
            gaussians=g,
            opt_state=opt_state,
            grad_accum=state.grad_accum + pos_grad,
            grad_count=state.grad_count + touched.astype(jnp.float32),
            step=state.step + 1,
            appearance=appearance,
        )
        return new_state, {"loss": loss, "n_dropped": out.n_dropped}

    return step


def reset_opacity(state: GSTrainState, cfg: GSConfig,
                  ceiling: float = 0.01) -> GSTrainState:
    """3DGS periodic opacity reset (gaussian-splatting train.py cadence
    3000): clamp every opacity to <= ceiling so floaters fade unless the
    supervision re-grows them. The affected Adam moments are reset (like
    after densify, which already re-inits the optimizer)."""
    logit = float(np.log(ceiling / (1 - ceiling)))
    g = state.gaussians._replace(
        opacity=jnp.minimum(state.gaussians.opacity, logit))
    opt = make_gs_optimizer(cfg)
    state = state._replace(gaussians=g)
    return state._replace(opt_state=opt.init(_train_params(state)))


def densify_and_prune(state: GSTrainState, cfg: GSConfig) -> GSTrainState:
    """Host-side adaptive density control reusing inactive slots.

    Prune: opacity below threshold. Clone: high positional gradient + small
    scale (copy, slight offset). Split: high gradient + large scale (shrink
    by 1.6, sample two children). New gaussians overwrite inactive slots up
    to capacity; shapes never change.
    """
    g = jax.device_get(state.gaussians)
    accum = np.asarray(state.grad_accum)
    count = np.maximum(np.asarray(state.grad_count), 1.0)
    avg_grad = accum / count
    active = np.asarray(g.active).copy()
    opacity = 1 / (1 + np.exp(-np.asarray(g.opacity)))
    scales = np.exp(np.asarray(g.log_scales)).max(axis=-1)

    means = np.asarray(g.means).copy()
    log_scales = np.asarray(g.log_scales).copy()
    quats = np.asarray(g.quats).copy()
    opa = np.asarray(g.opacity).copy()
    colors = np.asarray(g.colors).copy()
    sh = None if g.sh is None else np.asarray(g.sh).copy()
    sem = None if g.sem is None else np.asarray(g.sem).copy()
    group = None if g.group is None else np.asarray(g.group).copy()

    # prune
    prune = active & (opacity < cfg.prune_opacity_thresh)
    active[prune] = False

    hot = active & (avg_grad > cfg.densify_grad_thresh)
    clone_src = np.where(hot & (scales <= cfg.split_scale_thresh))[0]
    split_src = np.where(hot & (scales > cfg.split_scale_thresh))[0]
    free = np.where(~active)[0]

    fi = 0
    rng = np.random.default_rng(int(state.step))
    for src in clone_src:
        if fi >= len(free):
            break
        dst = free[fi]; fi += 1
        means[dst] = means[src] + rng.normal(0, np.exp(log_scales[src]).mean() * 0.1, 3)
        log_scales[dst] = log_scales[src]
        quats[dst] = quats[src]
        opa[dst] = opa[src]
        colors[dst] = colors[src]
        if sh is not None:
            sh[dst] = sh[src]
        if sem is not None:
            sem[dst] = sem[src]
        if group is not None:
            group[dst] = group[src]
        active[dst] = True
    for src in split_src:
        if fi >= len(free):
            break
        dst = free[fi]; fi += 1
        offset = rng.normal(0, np.exp(log_scales[src]).mean() * 0.5, 3)
        means[dst] = means[src] + offset
        means[src] = means[src] - offset
        log_scales[src] = log_scales[src] - np.log(1.6)
        log_scales[dst] = log_scales[src]
        quats[dst] = quats[src]
        opa[dst] = opa[src]
        colors[dst] = colors[src]
        if sh is not None:
            sh[dst] = sh[src]
        if sem is not None:
            sem[dst] = sem[src]
        if group is not None:
            group[dst] = group[src]
        active[dst] = True

    new_g = Gaussians(
        means=jnp.asarray(means), log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats), opacity=jnp.asarray(opa),
        colors=jnp.asarray(colors), active=jnp.asarray(active),
        sh=None if sh is None else jnp.asarray(sh),
        sem=None if sem is None else jnp.asarray(sem),
        group=None if group is None else jnp.asarray(group),
    )
    opt = make_gs_optimizer(cfg)
    new_state = GSTrainState(
        gaussians=new_g,
        opt_state=None,  # moments reset after re-allocation
        grad_accum=jnp.zeros_like(state.grad_accum),
        grad_count=jnp.zeros_like(state.grad_count),
        step=state.step,
        appearance=state.appearance,
    )
    return new_state._replace(opt_state=opt.init(_train_params(new_state)))


def fit_scene(gaussians: Gaussians, views: list[dict], cfg: GSConfig,
              *, width: int, height: int, steps: int = 1000,
              log_every: int = 100, seed: int = 0):
    """views: list of dicts with K, w2c, rgb (H,W,3 [0,1]),
    optional depth (H,W) + depth_mask. Returns trained state + history."""
    if cfg.sh_degree > 0 and gaussians.sh is None:
        from .gaussians import with_sh

        gaussians = with_sh(gaussians, cfg.sh_degree)
    if cfg.semantic_weight > 0 and gaussians.sem is None:
        from .gaussians import with_sem

        gaussians = with_sem(gaussians, cfg.semantic_classes)
    state = init_state(gaussians, cfg, n_views=len(views))
    budgets = resolve_budgets(cfg, gaussians, views, width=width,
                              height=height)
    step_fn = make_gs_train_step(cfg, width=width, height=height,
                                 budgets=budgets)
    rng = np.random.default_rng(seed)
    history = []
    for i in range(steps):
        vi = int(rng.integers(len(views)))
        v = views[vi]
        td = v.get("depth")
        tm = v.get("depth_mask")
        if td is None:
            td = jnp.zeros((height, width), jnp.float32)
            tm = jnp.zeros((height, width), jnp.float32)
        state, metrics = step_fn(
            state, v["K"], v["w2c"], v["rgb"], td, tm,
            v.get("obj_T"), v.get("obj_vis"), v.get("sem_ids"),
            jnp.asarray(vi, jnp.int32),
        )
        nd = int(metrics.get("n_dropped", 0))
        if nd > 0:
            # budgets were sized from sampled views of a past snapshot; an
            # unsampled view or mid-interval growth can exceed them, which
            # silently truncates pairs and biases gradients. Re-size now
            # instead of waiting for the next densify boundary.
            import sys
            print(f"# gs.fit_scene step {i + 1}: {nd} pairs dropped on view "
                  f"{vi} — re-resolving pair budgets", file=sys.stderr)
            budgets = resolve_budgets(cfg, state.gaussians, views,
                                      width=width, height=height)
            step_fn = make_gs_train_step(cfg, width=width, height=height,
                                         budgets=budgets)
        if cfg.opacity_reset_every and (i + 1) % cfg.opacity_reset_every == 0:
            state = reset_opacity(state, cfg)
        if (i + 1) % cfg.densify_every == 0:
            state = densify_and_prune(state, cfg)
            # N changed shape -> the step recompiles regardless; re-size the
            # pair budget for the grown/pruned scene while we're at it
            nb = resolve_budgets(cfg, state.gaussians, views, width=width,
                                 height=height)
            if nb != budgets:
                budgets = nb
                step_fn = make_gs_train_step(cfg, width=width, height=height,
                                             budgets=budgets)
        if (i + 1) % log_every == 0:
            history.append({"step": i + 1, "loss": float(metrics["loss"])})
    return state, history
