"""LPIPS perceptual distance (AlexNet backbone) in JAX.

Completes the paper's NVS metric triplet (PSNR / SSIM / LPIPS) for
`apps/eval_nvs.py`. The reference repo itself ships no eval code (its
metrics live in the MuDG paper), so this follows the canonical LPIPS
recipe (Zhang et al., CVPR 2018; the `lpips` pip package with
net='alex'):

    d(a, b) = sum_l  mean_hw  w_l . ( f̂_l(a) - f̂_l(b) )^2

with f_l the AlexNet relu1..relu5 features, f̂ channel-unit-normalized,
and w_l the learned non-negative per-channel calibration weights.

Environment honesty: this image has no torchvision/lpips weights and zero
egress, so `load_lpips()` looks for a user-provided torch state dict
(MUDG_LPIPS_PATH or an explicit path; both the `lpips.LPIPS(net='alex')`
full-model layout with `net.sliceK.N.*` keys and a bare torchvision
`features.N.*` AlexNet plus separate `linK.model.1.weight` heads are
accepted) and returns None when nothing is available — eval then reports
`lpips: null` instead of a made-up number. `init_lpips` builds a
random-weight tower with the exact same structure for tests.
"""
from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet feature tower: (out_ch, kernel, stride, pad) per conv,
# with relu taps after each conv and 3x3/s2 maxpools between groups 1-2-3.
_CONVS = (
    (64, 11, 4, 2),    # features.0
    (192, 5, 1, 2),    # features.3
    (384, 3, 1, 1),    # features.6
    (256, 3, 1, 1),    # features.8
    (256, 3, 1, 1),    # features.10
)
_CONV_IDX = (0, 3, 6, 8, 10)
_POOL_AFTER = (True, True, False, False, False)  # pool feeds the NEXT conv

# lpips.ScalingLayer buffers (fixed in every released LPIPS checkpoint)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(rng, in_ch: int = 3):
    """Random-weight LPIPS pytree with the production structure (tests; a
    random tower is still a valid metric-like distance, just uncalibrated).

    Layout: {'features': {str(i): {'weight': (kh,kw,in,out), 'bias': (out,)}},
             'lins': [ (C_l,) non-negative, one per tap ]}"""
    ks = jax.random.split(rng, len(_CONVS) * 2)
    feats, lins = {}, []
    c_in = in_ch
    for i, (c_out, k, _, _) in enumerate(_CONVS):
        w = jax.random.normal(ks[2 * i], (k, k, c_in, c_out), jnp.float32)
        w = w * (2.0 / np.sqrt(k * k * c_in))
        feats[str(_CONV_IDX[i])] = {"weight": w,
                                    "bias": jnp.zeros((c_out,), jnp.float32)}
        lins.append(jax.random.uniform(ks[2 * i + 1], (c_out,), jnp.float32))
        c_in = c_out
    return {"features": feats, "lins": lins}


def load_lpips(path: str | None = None):
    """Load LPIPS weights from a torch state dict; None if unavailable.

    Accepts the `lpips` pip package full-model dict (scaling_layer.*,
    net.sliceK.N.*, linK.model.1.weight), a torchvision AlexNet dict
    (features.N.*) with or without lin heads (missing heads degrade to
    uniform weights — still a useful uncalibrated perceptual distance,
    reported as such), or a dict already in those key shapes inside a
    'state_dict' wrapper."""
    path = path or os.environ.get("MUDG_LPIPS_PATH")
    if not path or not os.path.exists(path):
        return None
    from ..train.checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    feats, lin_vecs = {}, {}
    for k, v in sd.items():
        m = re.match(r"(?:net\.slice\d+|features)\.(\d+)\.(weight|bias)$", k)
        if m:
            idx, leaf = m.group(1), m.group(2)
            v = np.asarray(v, np.float32)
            if leaf == "weight":  # torch (out,in,kh,kw) -> (kh,kw,in,out)
                v = v.transpose(2, 3, 1, 0)
            feats.setdefault(idx, {})[leaf] = jnp.asarray(v)
            continue
        m = re.match(r"lin(\d)\.model\.1\.weight$", k)
        if m:
            lin_vecs[int(m.group(1))] = jnp.asarray(
                np.asarray(v, np.float32).reshape(-1))
    if set(feats) != {str(i) for i in _CONV_IDX}:
        return None
    lins = []
    for i, (c_out, *_rest) in enumerate(_CONVS):
        w = lin_vecs.get(i)
        if w is None or w.shape != (c_out,):
            # torchvision-only dict: uncalibrated uniform heads
            w = jnp.full((c_out,), 1.0 / c_out, jnp.float32)
        lins.append(w)
    return {"features": feats, "lins": lins}


def _conv(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _features(params, x):
    """x: (N,H,W,3) in [-1,1] -> list of relu1..relu5 feature maps."""
    h = (x - _SHIFT) / _SCALE
    taps = []
    for i, (_, k, s, pad) in enumerate(_CONVS):
        h = jax.nn.relu(_conv(params["features"][str(_CONV_IDX[i])], h, s, pad))
        taps.append(h)
        if _POOL_AFTER[i]:
            h = _maxpool(h)
    return taps


def lpips(params, a, b):
    """LPIPS distance per batch element. a, b: (N,H,W,3) RGB in [-1,1]
    (fp32 recommended; the feature tower runs in the input dtype)."""
    fa, fb = _features(params, a), _features(params, b)
    total = 0.0
    for w, xa, xb in zip(params["lins"], fa, fb):
        na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
        nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
        d = jnp.sum((na - nb) ** 2 * w, axis=-1)   # 1x1 conv head
        total = total + jnp.mean(d, axis=(1, 2))
    return total
