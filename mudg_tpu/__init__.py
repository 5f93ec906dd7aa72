"""MuDG-TPU: a TPU-native (JAX/XLA/Pallas) framework for urban-scene novel-view
synthesis with multi-modal latent video diffusion, providing the capabilities of
the MuDG reference pipeline (heiheishuang/MuDG) rebuilt TPU-first.

Layout:
    core/          pure diffusion math: schedules, v/eps/x0 algebra, CFG
    nn/            functional neural modules over torch-layout param pytrees
    kernels/       Pallas TPU kernels (flash attention, splatting, 3DGS tiles)
    diffusion/     DDIM sampler compiled as lax.scan
    conditioning/  CLIP text/image towers + Perceiver resampler
    parallel/      device mesh + sharding rules
    train/         train step, optimizer, EMA, checkpointing
    render/        LiDAR point aggregation + sparse condition rendering
    data/          Waymo multi-task dataset + host-side loaders
    apps/          CLI entry points (train, render/infer, make-conditions)
"""

__version__ = "0.1.0"
