"""SegFormer JAX implementation vs the HuggingFace torch model as oracle
(random weights at a tiny config; the B3 cityscapes checkpoint loads through
the same import path when present)."""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mudg_tpu.models import segformer as S  # noqa: E402


def _tiny_pair(seed=0):
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    hf_cfg = SegformerConfig(
        num_encoder_blocks=4, depths=[1, 1, 2, 1], sr_ratios=[8, 4, 2, 1],
        hidden_sizes=[16, 24, 32, 48], num_attention_heads=[1, 2, 4, 8],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        decoder_hidden_size=64, num_labels=19,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
    )
    ref = SegformerForSemanticSegmentation(hf_cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in sorted(ref.named_parameters(), key=lambda kv: kv[0]):
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    ref.eval()

    cfg = S.SegFormerConfig(
        hidden_sizes=(16, 24, 32, 48), depths=(1, 1, 2, 1),
        num_attention_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
        decoder_hidden_size=64,
    )
    params = S.import_hf_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    return ref, cfg, params


def test_segformer_matches_hf_oracle():
    ref, cfg, params = _tiny_pair()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 3, 64, 96)).astype(np.float32)

    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(x)).logits.numpy()  # (B, 19, H/4, W/4)

    import jax.numpy as jnp

    logits = S.segformer_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    logits = np.asarray(logits).transpose(0, 3, 1, 2)
    assert logits.shape == logits_ref.shape
    diff = np.abs(logits - logits_ref).max()
    scale = np.abs(logits_ref).max()
    assert diff <= 2e-3 * scale + 1e-4, f"max diff {diff:.2e} vs scale {scale:.2e}"


def test_segformer_init_structure_matches_hf():
    """Random-init pytree has exactly the HF checkpoint's leaf paths/shapes."""
    import jax

    ref, cfg, params = _tiny_pair()
    init = S.init_segformer(jax.random.PRNGKey(0), cfg)

    def paths(tree):
        out = {}

        def walk(n, pre):
            if isinstance(n, dict):
                for k, v in n.items():
                    walk(v, pre + (k,))
            else:
                out[pre] = tuple(np.shape(n))

        walk(tree, ())
        return out

    pa, pb = paths(params), paths(init)
    assert set(pa) == set(pb), (
        f"missing: {sorted(set(pa) - set(pb))[:5]} "
        f"extra: {sorted(set(pb) - set(pa))[:5]}"
    )
    for k in pa:
        assert pa[k] == pb[k], f"{k}: ckpt {pa[k]} vs init {pb[k]}"


def test_segment_end_to_end_shapes():
    import jax

    cfg = S.SegFormerConfig(
        hidden_sizes=(16, 24, 32, 48), depths=(1, 1, 1, 1),
        num_attention_heads=(1, 2, 4, 8), decoder_hidden_size=64,
    )
    params = S.init_segformer(jax.random.PRNGKey(1), cfg)
    img = np.random.default_rng(0).random((64, 96, 3)).astype(np.float32)
    ids = np.asarray(S.segment(params, cfg, img))
    assert ids.shape == (64, 96)
    assert ids.dtype == np.int32
    assert ids.min() >= 0 and ids.max() < 19
