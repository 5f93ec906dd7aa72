"""INRIA-format 3DGS PLY interop.

The de-facto ecosystem format (graphdeco gaussian-splatting
`scene/gaussian_model.py save_ply/load_ply`; used by StreetGaussians — the
repo MuDG's README defers its refinement stage to — and by every common
splat viewer/editor): one binary_little_endian vertex element with
    x y z nx ny nz f_dc_0..2 [f_rest_0..3K-1] opacity scale_0..2 rot_0..3
where opacity is the raw logit, scale_* the log-scales, rot_* the
unnormalized wxyz quaternion, f_dc = (rgb - 0.5) / C0, and f_rest the rest
SH coefficients flattened CHANNEL-major ((N, K, 3) -> transpose -> (N, 3K)).
Our Gaussians fields map 1:1 (same basis constants in gaussians.sh_basis),
so refined scenes open directly in standard viewers and external 3DGS
checkpoints load here.
"""
from __future__ import annotations

import numpy as np

SH_C0 = 0.28209479177387814


def save_gaussians_ply(path: str, g, active_only: bool = True) -> int:
    """Write Gaussians to an INRIA-layout PLY; returns the vertex count.
    group/sem fields have no standard encoding and are not exported (the
    pkl checkpoint keeps them)."""
    means = np.asarray(g.means, np.float32)
    keep = np.asarray(g.active, bool) if active_only else np.ones(len(means), bool)
    means = means[keep]
    n = len(means)
    f_dc = (np.asarray(g.colors, np.float32)[keep] - 0.5) / SH_C0
    rest = None
    if g.sh is not None:
        sh = np.asarray(g.sh, np.float32)[keep]          # (n, K, 3)
        rest = sh.transpose(0, 2, 1).reshape(n, -1)      # channel-major (n, 3K)
    opacity = np.asarray(g.opacity, np.float32)[keep]
    scales = np.asarray(g.log_scales, np.float32)[keep]
    rots = np.asarray(g.quats, np.float32)[keep]

    names = ["x", "y", "z", "nx", "ny", "nz",
             "f_dc_0", "f_dc_1", "f_dc_2"]
    if rest is not None:
        names += [f"f_rest_{i}" for i in range(rest.shape[1])]
    names += ["opacity", "scale_0", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3"]
    rec = np.zeros(n, dtype=[(nm, "<f4") for nm in names])
    rec["x"], rec["y"], rec["z"] = means.T
    for c in range(3):
        rec[f"f_dc_{c}"] = f_dc[:, c]
    if rest is not None:
        for i in range(rest.shape[1]):
            rec[f"f_rest_{i}"] = rest[:, i]
    rec["opacity"] = opacity
    for c in range(3):
        rec[f"scale_{c}"] = scales[:, c]
    for c in range(4):
        rec[f"rot_{c}"] = rots[:, c]

    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n"
              + "".join(f"property float {nm}\n" for nm in names)
              + "end_header\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
    return n


def load_gaussians_ply(path: str):
    """Read an INRIA-layout PLY into a Gaussians pytree (all slots active)."""
    import jax.numpy as jnp

    from .gaussians import Gaussians

    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    n = int(next(l.split()[2] for l in header
                 if l.startswith("element vertex")))
    np_types = {"float": "<f4", "double": "<f8", "uchar": "u1"}
    props = [(l.split()[2], np_types[l.split()[1]])
             for l in header if l.startswith("property")]
    rec = np.frombuffer(data[end:], dtype=props, count=n)

    means = np.stack([rec["x"], rec["y"], rec["z"]], -1).astype(np.float32)
    colors = np.stack([rec[f"f_dc_{c}"] for c in range(3)], -1) * SH_C0 + 0.5
    n_rest = sum(1 for nm, _ in props if nm.startswith("f_rest_"))
    sh = None
    if n_rest:
        rest = np.stack([rec[f"f_rest_{i}"] for i in range(n_rest)], -1)
        k = n_rest // 3
        sh = rest.reshape(n, 3, k).transpose(0, 2, 1)    # back to (n, K, 3)
    return Gaussians(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(
            np.stack([rec[f"scale_{c}"] for c in range(3)], -1).astype(np.float32)),
        quats=jnp.asarray(
            np.stack([rec[f"rot_{c}"] for c in range(4)], -1).astype(np.float32)),
        opacity=jnp.asarray(rec["opacity"].astype(np.float32)),
        colors=jnp.asarray(colors.astype(np.float32)),
        active=jnp.ones((n,), bool),
        sh=None if sh is None else jnp.asarray(sh.astype(np.float32)),
    )
