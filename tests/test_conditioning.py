"""CLIP towers: shapes, causal masking, checkpoint-layout import parity for
the fused-MHA resblock; tokenizer BPE mechanics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mudg_tpu.conditioning import clip as CL
from mudg_tpu.conditioning import tokenizer as T


def small_text_cfg():
    return CL.TextConfig(vocab_size=128, width=32, heads=2, layers=3,
                         context_length=16, skip_last_layers=1)


def small_vision_cfg():
    return CL.VisionConfig(image_size=28, patch_size=14, width=32, heads=2, layers=2)


def test_text_tower_shapes_and_penultimate():
    cfg = small_text_cfg()
    p = CL.init_text_tower(jax.random.PRNGKey(0), cfg)
    toks = jnp.zeros((2, 16), jnp.int32)
    out = CL.text_tower_apply(p, cfg, toks)
    assert out.shape == (2, 16, 32)
    # penultimate: last resblock must not affect the output
    p2 = jax.tree.map(lambda x: x, p)
    p2["transformer"]["resblocks"]["2"] = jax.tree.map(
        lambda x: x * 100.0, p2["transformer"]["resblocks"]["2"]
    )
    out2 = CL.text_tower_apply(p2, cfg, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_text_tower_causality():
    cfg = small_text_cfg()
    p = CL.init_text_tower(jax.random.PRNGKey(0), cfg)
    t1 = jnp.zeros((1, 16), jnp.int32).at[0, 5].set(7)
    t2 = t1.at[0, 10].set(9)  # change a *later* token
    o1 = CL.text_tower_apply(p, cfg, t1)
    o2 = CL.text_tower_apply(p, cfg, t2)
    # positions <= 9 unaffected by the change at position 10
    np.testing.assert_allclose(np.asarray(o1[:, :10]), np.asarray(o2[:, :10]), atol=1e-5)
    assert float(jnp.abs(o1[:, 10:] - o2[:, 10:]).max()) > 1e-6


def test_vision_tower_shapes():
    cfg = small_vision_cfg()
    p = CL.init_vision_tower(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = CL.vision_tower_apply(p, cfg, img, preprocess=False)
    assert out.shape == (2, cfg.tokens, 32)  # 4 patches + cls = 5
    assert cfg.tokens == 5


def test_preprocess_resizes_and_normalizes():
    img = jnp.zeros((1, 64, 48, 3))  # value 0 in [-1,1] => 0.5 in [0,1]
    out = CL.preprocess_image(img)
    assert out.shape == (1, 224, 224, 3)
    expected = (0.5 - np.array(CL.CLIP_MEAN)) / np.array(CL.CLIP_STD)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-5)


def test_mha_parity_with_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from mudg_tpu.train import checkpoint as C

    torch.manual_seed(0)
    width, heads = 32, 4
    m = tnn.MultiheadAttention(width, heads, batch_first=True)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    tree = C.state_dict_to_pytree(sd)
    x = torch.randn(2, 9, width)
    with torch.no_grad():
        ref, _ = m(x, x, x, need_weights=False)
    out = CL._mha(tree, jnp.asarray(x.numpy()), heads)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_hash_tokenizer_interface():
    tok = T.HashTokenizer()
    out = tok(["a driving scene", "another"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    assert tok.eot in out[0]
    # deterministic
    np.testing.assert_array_equal(out, tok(["a driving scene", "another"]))


def test_clip_bpe_tokenizer_with_tiny_table(tmp_path):
    """Exercise real BPE mechanics with a miniature merges table."""
    merges = "#version\nh e\nhe l\nhel l\nhell o</w>\n"
    path = tmp_path / "merges.txt"
    path.write_text(merges)
    tok = T.ClipTokenizer(str(path))
    ids = tok.encode("hello")
    # 'hello' fully merges into the single token 'hello</w>'
    assert len(ids) == 1
    assert ids[0] == tok.encoder["hello</w>"]
    arr = tok(["hello hello"])
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.sot and arr[0, 3] == tok.eot
    assert arr[0, 1] == arr[0, 2] == tok.encoder["hello</w>"]


def test_bytes_to_unicode_reversible():
    m = T.bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_clip_bpe_matches_transformers_oracle(tmp_path):
    """Cross-check our BPE against the canonical HF CLIPTokenizer given the
    SAME merge table + the open_clip vocab construction — validates the
    algorithm end-to-end (open_clip and HF produce identical ids for the
    published vocab)."""
    import json

    transformers = pytest.importorskip("transformers")

    merges = ["i n", "t h", "a n", "r e", "in g</w>", "th e</w>", "an d</w>",
              "c a", "ca r</w>", "s t", "st re", "stre e", "stree t</w>",
              "d r", "dr i", "dri v", "driv ing</w>"]
    mpath = tmp_path / "merges.txt"
    mpath.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")

    ours = T.ClipTokenizer(str(mpath))

    vocab = {tok: i for i, tok in enumerate(
        list(T.bytes_to_unicode().values())
        + [v + "</w>" for v in T.bytes_to_unicode().values()]
        + ["".join(m.split()) for m in merges]
        + ["<|startoftext|>", "<|endoftext|>"]
    )}
    vpath = tmp_path / "vocab.json"
    vpath.write_text(json.dumps(vocab))

    hf = transformers.CLIPTokenizer(str(vpath), str(mpath))

    for text in ("the car and the street", "Driving, fast! in the rain",
                 "a  weird   WHITESPACE\tstring", "don't stop"):
        ours_ids = [ours.sot] + ours.encode(text) + [ours.eot]
        hf_ids = hf(text)["input_ids"]
        assert ours_ids == hf_ids, f"{text!r}: {ours_ids} != {hf_ids}"


def test_fix_mojibake():
    # UTF-8 read as cp1252 (the dominant mojibake class ftfy fixes)
    assert T._fix_mojibake("CafÃ©") == "Café"
    assert T._fix_mojibake("itâ€™s") == "it’s"
    # double-encoded round unwinds within the iteration bound
    twice = "é".encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
    assert T._fix_mojibake(twice) == "é"
    # correctly encoded unicode and plain ASCII pass through untouched
    assert T._fix_mojibake("café naïve") == "café naïve"
    assert T._fix_mojibake("plain ascii") == "plain ascii"
    # flows through _clean (open_clip runs ftfy before whitespace_clean)
    assert T._clean("CafÃ©  Street") == "café street"
