"""The MDM (multi-modal diffusion model): conditioning assembly, training
loss, and guided sampling.

Functional rebuild of LatentVisualDiffusion (`lvdm/models/ddpm3d.py:1033-1300`)
plus the DiffusionWrapper 'hybrid' routing (:1303-1372) and the inference-side
condition assembly of `virtual_render/virtual_pose_render.py:62-147`.

Layouts: videos are (B, T, H, W, C) channels-last in [-1, 1]; latents
(B, T, h, w, 4). Conditioning:
  c_concat    = cat(sparse_rgb_z, sparse_depth_z) channels -> (B,T,h,w,8)
  c_crossattn = cat(text_emb (B,77,1024), img_emb (B,T*16,1024))
Task identity is a class label in {color:0, semantic:1, depth:500,
normal:1000} fed through the UNet's class embedding.

TPU-first choices vs the reference:
  * CFG variants (uncond / img-only / full) are stacked on the batch axis and
    denoised in ONE UNet call per DDIM step instead of 2-3 sequential calls
    (ddim.py:221-226), tripling MXU batch efficiency,
  * the whole sampler (including VAE decode) jits into a single XLA program;
    the DDIM loop is a lax.scan (diffusion/ddim.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ..core import diffusion as D
from ..core import schedules as S
from ..diffusion import ddim, dpm
from ..nn import unet3d as U
from ..nn import vae as V
from ..parallel.sp import frames as SP_frames
from ..nn import resampler as R
from ..conditioning import clip as CL

TASK_LABELS = {"color": 0, "semantic": 1, "depth": 500, "normal": 1000}


@dataclasses.dataclass(frozen=True)
class MDMConfig:
    """Bundle of sub-model configs + diffusion hyperparameters
    (configs/stage1-512_mdm_waymo/config.yaml)."""
    unet: U.UNetConfig = dataclasses.field(default_factory=U.UNetConfig)
    vae: V.VAEConfig = dataclasses.field(default_factory=V.VAEConfig)
    resampler: R.ResamplerConfig = dataclasses.field(default_factory=R.ResamplerConfig)
    clip_text: CL.TextConfig = dataclasses.field(default_factory=CL.TextConfig)
    clip_image: CL.VisionConfig = dataclasses.field(default_factory=CL.VisionConfig)
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.012
    rescale_betas_zero_snr: bool = True
    parameterization: str = "v"
    uncond_prob: float = 0.05
    use_dynamic_rescale: bool = True
    base_scale: float = 0.7          # 0.3 for stage-2 (1024) configs
    turning_step: int = 400
    default_fs: int = 10
    vae_chunk: int = 1               # frames per VAE scan step (perframe_ae)
    # frames per scan step for the TRAINING-side stacked encode (dense +
    # sparse RGB + sparse depth in one call). Measured (scripts/condbench.py,
    # v5e, 3x16 frames 320x512 bf16): chunk=1 234 ms, chunk=16 215 ms,
    # chunk=48 211 ms but ~4 GB transient; chunk=3 anomalously slow (622 ms,
    # same XLA anomaly family as decode chunk=4 — avoid tiny non-1 chunks).
    # Inference keeps vae_chunk (perframe_ae is a memory lever there);
    # numerics identical. Auto-halved until it divides the frame count.
    train_encode_chunk: int = 16
    noise_strength: float = 0.0      # offset noise (ddpm3d.py:742-745)
    interp_mode: bool = False        # frame-interp conditioning (ddpm3d.py:1114-1118)
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0

    def schedule(self) -> S.DiffusionSchedule:
        return S.DiffusionSchedule.create(
            timesteps=self.timesteps,
            beta_schedule=self.beta_schedule,
            linear_start=self.linear_start,
            linear_end=self.linear_end,
            rescale_betas_zero_snr=self.rescale_betas_zero_snr,
            parameterization=self.parameterization,
            use_dynamic_rescale=self.use_dynamic_rescale,
            base_scale=self.base_scale,
            turning_step=self.turning_step,
        )


def stage2_config(**overrides) -> MDMConfig:
    """MDM1024 deltas (configs/stage2-1024_mdm_waymo/config.yaml): 576x1024
    latents, base_scale 0.3; architecture unchanged."""
    return MDMConfig(base_scale=0.3, **overrides)


def schedule_arrays(sched: S.DiffusionSchedule) -> dict:
    """Device copies of the schedule fields used inside jitted training."""
    out = {
        "sqrt_alphas_cumprod": jnp.asarray(sched.sqrt_alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(sched.sqrt_one_minus_alphas_cumprod),
        "lvlb_weights": jnp.asarray(sched.lvlb_weights),
    }
    if sched.scale_arr is not None:
        out["scale_arr"] = jnp.asarray(sched.scale_arr)
    return out


def init_mdm(rng, cfg: MDMConfig) -> dict:
    k = jax.random.split(rng, 5)
    return {
        "unet": U.init_unet(k[0], cfg.unet),
        "vae": V.init_vae(k[1], cfg.vae),
        "image_proj": R.init_resampler(k[2], cfg.resampler),
        "clip_text": CL.init_text_tower(k[3], cfg.clip_text),
        "clip_image": CL.init_vision_tower(k[4], cfg.clip_image),
    }


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------

def encode_text(params, cfg: MDMConfig, tokens):
    """tokens (B, 77) -> (B, 77, 1024); FrozenOpenCLIPEmbedder equivalent."""
    return CL.text_tower_apply(params["clip_text"], cfg.clip_text, tokens)


def embed_image(params, cfg: MDMConfig, images):
    """images (B, H, W, 3) in [-1,1] -> resampled tokens (B, T*16, 1024)
    (ddpm3d.py:1107-1111: embedder + image_proj_model)."""
    tokens = CL.vision_tower_apply(params["clip_image"], cfg.clip_image, images)
    return R.resampler_apply(params["image_proj"], cfg.resampler, tokens)


def encode_conditions(params, cfg: MDMConfig, sparse_frames, sparse_depth,
                      rng=None):
    """VAE-encode the sparse RGB + depth condition videos -> c_concat
    (B, T, h, w, 8) (ddpm3d.py:1078-1079,1122). Both videos go through ONE
    stacked encode call: the encoder is bandwidth-bound, so streaming its
    weights once for batch 2B beats two separate calls."""
    x = jnp.concatenate([sparse_frames, sparse_depth], axis=0)
    z = V.encode_video(params["vae"], cfg.vae, x, rng=rng,
                       chunk=cfg.vae_chunk)
    sparse_z, depth_z = jnp.split(z, 2, axis=0)
    return jnp.concatenate([sparse_z, depth_z], axis=-1)


def denoise(params, cfg: MDMConfig, z_noisy, t, c_concat, context, class_label,
            fs=None, *, impl="auto", remat=False, drop_rng=None, sp=None):
    """DiffusionWrapper 'hybrid' forward (ddpm3d.py:1320-1324): channel-concat
    conditions + cross-attention context + class label."""
    x = jnp.concatenate([z_noisy, c_concat.astype(z_noisy.dtype)], axis=-1)
    return U.unet_apply(
        params["unet"], cfg.unet, x, t, context, c_label=class_label, fs=fs,
        impl=impl, remat=remat, drop_rng=drop_rng, sp=sp,
    )


# ---------------------------------------------------------------------------
# Training loss
# ---------------------------------------------------------------------------

def training_loss(
    params, cfg: MDMConfig, sched_arrays: Mapping[str, jnp.ndarray], batch,
    rng, *, null_tokens=None, null_emb=None, train_unet=True, impl="train",
    remat=True, compute_dtype=jnp.bfloat16, sp=None,
):
    """shared_step/p_losses for the MDM (ddpm3d.py:1056-1149, 741-788).

    batch keys (all device arrays):
      dense_frames  (B, T, H, W, 3)   task target in [-1, 1]
      sparse_frames (B, T, H, W, 3)   sparse RGB condition (frame0 = dense rgb)
      sparse_depth  (B, T, H, W, 3)   sparse depth condition
      tokens        (B, 77) int32     caption tokens
      class_label   (B,) int32        task id
      fps           (B,) int32
    OR the precomputed-latent form (WaymoDataset(latents=True), see
    data/latents.py — removes the frozen VAE encode from the step):
      {dense,sparse,depth}_moments (B, T, H/8, W/8, 2z) posterior moments
      sparse_frame0 (B, H, W, 3)    spliced frame-0 pixels (CLIP branch)
      tokens / class_label / fps    as above
    null_tokens: (77,) tokens of the empty prompt (CFG null); OR pass
    null_emb (1-or-B, 77, D), the precomputed null-prompt embedding — the
    null prompt is constant across steps, so encoding it once outside the
    step (make_train_step does this) saves a full CLIP text forward per
    step. sched_arrays: device copies of the DiffusionSchedule fields.

    Returns (loss, metrics dict).
    """
    b = batch["dense_moments" if "dense_moments" in batch
              else "dense_frames"].shape[0]
    keys = jax.random.split(rng, 7)

    # AMP for the frozen encoders: the reference trains precision:16, so its
    # VAE/CLIP forwards run under torch autocast in fp16 (main/trainer.py:120,
    # configs stage1/stage2 precision: 16). Casting the frames to the compute
    # dtype runs every conv/matmul in bf16 with the usual fp32 GroupNorm /
    # softmax islands. Measured (scripts/condbench.py, v5e): 87.7 -> 77.6 ms
    # per 16-frame encode (the encoder is bandwidth-bound, not MXU-bound, so
    # the win is real but modest); x3 encodes per step. Latents return to
    # f32 for the q_sample/target algebra below.
    if cfg.interp_mode:
        z = V.encode_video(params["vae"], cfg.vae,
                           batch["dense_frames"].astype(compute_dtype),
                           rng=keys[0], chunk=cfg.vae_chunk).astype(jnp.float32)
        # start + end frame conditioning: zeros except frames 0 and -1 of the
        # target latents, duplicated into both concat channels' worth
        # (ddpm3d.py:1114-1118 uses z; depth channel zeroed)
        zc = jnp.zeros_like(z)
        zc = zc.at[:, 0].set(z[:, 0]).at[:, -1].set(z[:, -1])
        c_concat = jnp.concatenate([zc, jnp.zeros_like(zc)], axis=-1)
    elif "dense_moments" in batch:
        # Precomputed-latent path (data/latents.py, net-new vs the
        # reference): the dataset ships cached posterior MOMENTS; only the
        # posterior sampling (elementwise) runs here. Removes the frozen
        # encoder forward — ~225 ms of the 737 ms bs=1 step (30%,
        # scripts/fambwd.py 'encode' family, docs/STATE.md round 4).
        # Sampling at train time keeps the latent noise distribution
        # identical to on-the-fly encoding.
        m3 = jnp.concatenate(
            [batch["dense_moments"], batch["sparse_moments"],
             batch["depth_moments"]], axis=0).astype(jnp.float32)
        z3 = V.sample_scaled(cfg.vae, m3, rng=keys[0])
        z, sparse_z, depth_z = jnp.split(z3, 3, axis=0)
        c_concat = jnp.concatenate(
            [sparse_z, depth_z], axis=-1).astype(compute_dtype)
    else:
        # One stacked VAE encode for all three per-step encodes (dense target
        # + sparse RGB + sparse depth, ddpm3d.py:1077-1079): the encoder is
        # bandwidth-bound, so streaming its weights once for batch 3B beats
        # three separate calls (scripts/condbench.py).
        enc_in = jnp.concatenate(
            [batch["dense_frames"], batch["sparse_frames"],
             batch["sparse_depth"]], axis=0).astype(compute_dtype)
        n_frames = enc_in.shape[0] * enc_in.shape[1]
        chunk = cfg.train_encode_chunk
        while chunk > 1 and n_frames % chunk:
            chunk //= 2
        z3 = V.encode_video(params["vae"], cfg.vae, enc_in, rng=keys[0],
                            chunk=chunk)
        z, sparse_z, depth_z = jnp.split(z3, 3, axis=0)
        z = z.astype(jnp.float32)
        c_concat = jnp.concatenate([sparse_z, depth_z], axis=-1)
    # frozen stages do not propagate gradients (ddpm3d.py:580-596)
    z = jax.lax.stop_gradient(z)
    c_concat = jax.lax.stop_gradient(c_concat)

    cond_emb = jax.lax.stop_gradient(encode_text(params, cfg, batch["tokens"]))
    if null_emb is None:
        null_emb = encode_text(
            params, cfg,
            jnp.broadcast_to(null_tokens, (b, null_tokens.shape[-1])))
    null_emb = jax.lax.stop_gradient(
        jnp.broadcast_to(null_emb, cond_emb.shape).astype(cond_emb.dtype))

    # disjoint 5%/5%/5% text/image/both CFG dropout (ddpm3d.py:1091-1099)
    random_num = jax.random.uniform(keys[2], (b,))
    prompt_mask = (random_num < 2 * cfg.uncond_prob)[:, None, None]
    input_mask = 1.0 - (
        (random_num >= cfg.uncond_prob) & (random_num < 3 * cfg.uncond_prob)
    ).astype(z.dtype).reshape(b, 1, 1, 1)

    prompt_emb = jnp.where(prompt_mask, null_emb, cond_emb)
    # cached-latent batches carry the spliced sparse frame 0 (= dense color
    # frame 0, waymo_data.py:100) as pixels for the CLIP image branch
    img_src = (batch["sparse_frame0"] if "sparse_frame0" in batch
               else batch["sparse_frames"][:, 0])
    img = img_src * input_mask
    # trainable image_proj inside; CLIP tower + resampler in compute_dtype
    # (AMP, see the encoder note above). The resampler's grads flow in bf16
    # exactly as the reference's fp16 autocast does.
    img_emb = embed_image(params, cfg, img.astype(compute_dtype))
    context = jnp.concatenate([prompt_emb, img_emb], axis=1)

    # diffusion target
    t = jax.random.randint(keys[3], (b,), 0, cfg.timesteps)
    scale_arr = sched_arrays.get("scale_arr")
    if scale_arr is not None:
        z = z * D.extract(scale_arr, t, z.ndim)
    noise = jax.random.normal(keys[4], z.shape, z.dtype)
    if cfg.noise_strength > 0:
        # offset noise: shared per (batch, channel, frame) low-frequency
        # component (ddpm3d.py:742-745)
        offs = jax.random.normal(keys[6], (b, z.shape[1], 1, 1, z.shape[-1]), z.dtype)
        noise = noise + cfg.noise_strength * offs
    sa = sched_arrays["sqrt_alphas_cumprod"]
    soma = sched_arrays["sqrt_one_minus_alphas_cumprod"]
    z_noisy = D.q_sample(z, t, noise, sa, soma)
    target = D.get_v(z, noise, t, sa, soma)

    # mixed precision: UNet forward/backward in compute_dtype (the reference
    # trains fp16 AMP, main/trainer config precision:16); q_sample/target
    # algebra and the loss stay f32. Params are f32 masters — functional
    # layers cast weights to the activation dtype at application.
    v_pred = denoise(
        params, cfg, z_noisy.astype(compute_dtype), t,
        c_concat.astype(compute_dtype), context.astype(compute_dtype),
        batch["class_label"],
        fs=batch.get("fps"), impl=impl, remat=remat, drop_rng=keys[5], sp=sp,
    ).astype(jnp.float32)
    target = target.astype(jnp.float32)
    loss_simple = jnp.mean((v_pred - target) ** 2, axis=(1, 2, 3, 4))
    loss = cfg.l_simple_weight * jnp.mean(loss_simple)
    if cfg.original_elbo_weight > 0:
        lvlb_w = sched_arrays.get("lvlb_weights")
        if lvlb_w is not None:
            loss_vlb = jnp.mean(lvlb_w[t] * loss_simple)
            loss = loss + cfg.original_elbo_weight * loss_vlb
    return loss, {"loss_simple": jnp.mean(loss_simple),
                  "t_mean": jnp.mean(t.astype(jnp.float32))}


# ---------------------------------------------------------------------------
# Guided sampling (inference)
# ---------------------------------------------------------------------------

def sample(
    params,
    cfg: MDMConfig,
    rng,
    *,
    sparse_frames=None,
    sparse_depth=None,
    sparse_moments=None,
    depth_moments=None,
    frame0=None,
    tokens=None,
    null_tokens=None,
    class_label=None,
    num_steps: int = 50,
    guidance_scale: float = 7.5,
    cfg_img: float | None = None,
    multiple_cond_cfg: bool = False,
    guidance_rescale: float = 0.7,
    eta: float = 1.0,
    timestep_spacing: str = "uniform_trailing",
    fs: int | None = None,
    decode: bool = True,
    impl: str = "auto",
    dtype=jnp.float32,
    vae_dtype=None,
    sp=None,
    sampler: str = "ddim",
):
    """image_guided_synthesis (virtual_pose_render.py:62-147).

    sparse_frames/sparse_depth: (B, T, H, W, 3) in [-1,1] (B = tasks batch);
    tokens: (B, 77); class_label: (B,). Returns decoded video (B, T, H, W, 3)
    in [-1,1] (or latents when decode=False).

    Precomputed-latent form (net-new, pairs with data/latents.py): pass
    sparse_moments/depth_moments (B, T, h, w, 2z) posterior moments plus
    frame0 (B, H, W, 3) pixels for the CLIP image branch instead of
    sparse_frames/sparse_depth — c_concat comes from the posterior MODE
    (identical to encode_conditions with rng=None), skipping the frozen
    VAE encode. This is what lets `train-mdm --latents --sample_every`
    log samples without pixel conditions in the batch.

    All CFG condition variants are stacked on the batch axis: one UNet pass
    per DDIM step at batch n_variants*B.

    vae_dtype (default: follow `dtype`) is the compute dtype of the frozen
    VAE/CLIP encoders and the final VAE decode. The reference inferences
    under torch fp16 autocast (virtual_pose_render.py:218), so bf16 here is
    parity-faithful; measured decode 188.9 -> 157.3 ms at 70.8 dB pixel PSNR
    vs the f32 decode (scripts/vaebench.py). fp32 GroupNorm/softmax islands
    apply regardless.

    sp: optional parallel.sp.SeqSharding for sequence-parallel single-clip
    latency scaling over a mesh (requires impl="xla").

    sampler: "ddim" (reference parity, virtual_pose_render.py recipe) or
    "dpmpp" (DPM-Solver++(2M), diffusion/dpm.py — net-new: ~50-step-DDIM
    quality in ~20 model calls; eta is ignored, the solver is deterministic).
    """
    vdt = dtype if vae_dtype is None else vae_dtype
    sched = cfg.schedule()
    if sampler == "dpmpp":
        consts = dpm.make_dpmpp_constants(
            sched, num_steps, timestep_spacing=timestep_spacing)
    else:
        consts = ddim.make_ddim_constants(
            sched, num_steps, timestep_spacing=timestep_spacing, eta=eta
        )
    use_moments = sparse_moments is not None
    b, t_frames = (sparse_moments if use_moments else sparse_frames).shape[:2]
    fs_arr = jnp.full((b,), cfg.default_fs if fs is None else fs, jnp.int32)

    # conditions (shared by all CFG variants: c_concat is never dropped,
    # virtual_pose_render.py:100,108). Under sp the frozen VAE passes are
    # frame-sharded too (frames are independent through the 2D encoder), so
    # the encode/decode around the sampler scales with the mesh as well.
    if use_moments:
        m2 = jnp.concatenate(
            [sparse_moments, depth_moments], axis=0).astype(jnp.float32)
        sz, dz = jnp.split(V.sample_scaled(cfg.vae, m2, rng=None), 2, axis=0)
        c_concat = jnp.concatenate([sz, dz], axis=-1).astype(dtype)
    else:
        c_concat = encode_conditions(
            params, cfg,
            SP_frames(sparse_frames.astype(vdt), sp),
            SP_frames(sparse_depth.astype(vdt), sp),
        ).astype(dtype)

    cond_emb = encode_text(params, cfg, tokens).astype(dtype)
    uc_emb = encode_text(
        params, cfg, jnp.broadcast_to(null_tokens, tokens.shape)
    ).astype(dtype)
    img = (frame0 if use_moments else sparse_frames[:, 0]).astype(vdt)
    # cond + uncond image embeds in one stacked CLIP-tower/resampler pass
    both = embed_image(
        params, cfg, jnp.concatenate([img, jnp.zeros_like(img)], axis=0))
    img_emb, uc_img_emb = (e.astype(dtype) for e in jnp.split(both, 2, axis=0))

    ctx_cond = jnp.concatenate([cond_emb, img_emb], axis=1)
    ctx_uc = jnp.concatenate([uc_emb, uc_img_emb], axis=1)
    variants = [ctx_uc]
    if multiple_cond_cfg:
        variants.append(jnp.concatenate([uc_emb, img_emb], axis=1))
    variants.append(ctx_cond)
    n_var = len(variants)

    ctx_all = jnp.concatenate(variants, axis=0)            # (n_var*B, L, D)
    cc_all = jnp.tile(c_concat, (n_var, 1, 1, 1, 1))
    label_all = jnp.tile(class_label, (n_var,))
    fs_all = jnp.tile(fs_arr, (n_var,))

    def model_fn(x, t):
        xb = jnp.tile(x, (n_var, 1, 1, 1, 1))
        tb = jnp.tile(t, (n_var,))
        v = denoise(params, cfg, xb, tb, cc_all, ctx_all, label_all,
                    fs=fs_all, impl=impl, sp=sp)
        parts = jnp.split(v, n_var, axis=0)
        if n_var == 3:
            out = D.cfg_combine_multicond(parts[0], parts[1], parts[2],
                                          guidance_scale, cfg_img)
        elif n_var == 2:
            out = D.cfg_combine(parts[0], parts[1], guidance_scale)
        else:
            out = parts[0]
        if guidance_rescale > 0.0 and n_var > 1:
            out = D.rescale_noise_cfg(out, parts[-1], guidance_rescale)
        return out

    h, w = c_concat.shape[2], c_concat.shape[3]
    shape = (b, t_frames, h, w, cfg.unet.out_channels)
    if sampler == "dpmpp":
        z = dpm.dpmpp_sample(model_fn, rng, shape, consts, dtype=dtype)
    else:
        z = ddim.ddim_sample(model_fn, rng, shape, consts, dtype=dtype)
    if not decode:
        return z
    x = V.decode_video(params["vae"], cfg.vae,
                       SP_frames(z.astype(vdt), sp), chunk=cfg.vae_chunk)
    return jnp.clip(x, -1.0, 1.0).astype(jnp.float32)
