"""Model construction + forward-shape + init-distribution tests (tiny dims)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models import (
    CLIP, CLIPFDT, FDTConfig, TextConfig, VisionConfig, model_entry,
)

TINY_VISION = VisionConfig(input_resolution=32, patch_size=8, width=64, layers=2,
                           heads=2, embed_dim=32)
TINY_TEXT = TextConfig(context_length=16, vocab_size=1000, width=48, heads=2,
                       layers=2, embed_dim=32)
TINY_FDT = FDTConfig(sd_num=64, sd_dim=32, raw_img_ft_dim=64, raw_txt_ft_dim=48,
                     sd_temperature=10.0)


def _batch(b=2, ctx=16, res=32):
    rng = np.random.RandomState(0)
    images = rng.randn(b, res, res, 3).astype(np.float32)
    tokens = np.zeros((b, ctx), dtype=np.int32)
    pad_mask = np.full((b, ctx), -np.inf, dtype=np.float32)
    for i in range(b):
        n = 5 + i
        tokens[i, 0] = 997
        tokens[i, 1:n - 1] = rng.randint(1, 900, n - 2)
        tokens[i, n - 1] = 999  # eot = max id
        pad_mask[i, :n] = 0.0
    return jnp.asarray(images), jnp.asarray(tokens), jnp.asarray(pad_mask)


@pytest.fixture(scope="module")
def clip_model():
    model = CLIP(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT)
    images, tokens, pad_mask = _batch()
    params = model.init(jax.random.PRNGKey(0), images, tokens, pad_mask)
    return model, params


@pytest.fixture(scope="module")
def fdt_model():
    model = CLIPFDT(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT, fdt_cfg=TINY_FDT)
    images, tokens, pad_mask = _batch()
    params = model.init(jax.random.PRNGKey(0), images, tokens, pad_mask)
    return model, params


def test_clip_forward_shapes(clip_model):
    model, params = clip_model
    images, tokens, pad_mask = _batch()
    out = model.apply(params, images, tokens, pad_mask)
    assert out["image_embed"].shape == (2, 32)
    assert out["text_embed"].shape == (2, 32)
    # embeddings are L2-normalised
    np.testing.assert_allclose(np.linalg.norm(out["image_embed"], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out["text_embed"], axis=-1), 1.0, atol=1e-5)
    # logit scale starts at exp(ln(1/0.07)) = 14.28..
    np.testing.assert_allclose(out["logit_scale"], 1 / 0.07, rtol=1e-5)


def test_fdt_forward_shapes(fdt_model):
    model, params = fdt_model
    images, tokens, pad_mask = _batch()
    out = model.apply(params, images, tokens, pad_mask)
    assert out["image_embed"].shape == (2, 32)
    assert out["text_embed"].shape == (2, 32)
    assert out["img_att"].shape == (2, 64)
    assert out["txt_att"].shape == (2, 64)
    # sparsemax attention rows live on the simplex
    np.testing.assert_allclose(np.asarray(out["img_att"]).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(out["img_att"]) >= 0).all()


def test_fdt_extract_methods(fdt_model):
    model, params = fdt_model
    images, tokens, pad_mask = _batch()
    att_w, img_ft = model.apply(params, images, method="extract_img_sd_ft")
    assert img_ft.shape == (2, 32)
    att_w, txt_ft = model.apply(params, tokens, pad_mask, method="extract_txt_sd_ft")
    assert txt_ft.shape == (2, 32)
    patch_q = model.apply(params, images, method="extract_patch_ft")
    assert patch_q.shape == (2, 16, 32)  # (32/8)^2 = 16 patches -> sd_dim
    word_q, pm = model.apply(params, tokens, pad_mask, method="extract_word_ft")
    assert word_q.shape == (2, 16, 32)


def test_pad_mask_ignores_padding(fdt_model):
    """Changing tokens under the pad mask must not change text FDT features."""
    model, params = fdt_model
    images, tokens, pad_mask = _batch()
    _, ft1 = model.apply(params, tokens, pad_mask, method="extract_txt_sd_ft")
    tokens2 = np.asarray(tokens).copy()
    tokens2[0, 10:] = 123  # padded region for row 0 (n=5... beyond eot)
    # NOTE: changing padded *input tokens* changes the transformer features of
    # pad positions, but the causal mask + pad-mask zeroing must keep the
    # pooled FDT feature identical for real positions only if attention from
    # real->pad is masked. CLIP's text tower attends causally (pad positions
    # are in the future of real ones), so real-token features are unaffected.
    _, ft2 = model.apply(params, jnp.asarray(tokens2), pad_mask, method="extract_txt_sd_ft")
    np.testing.assert_allclose(np.asarray(ft1[0]), np.asarray(ft2[0]), atol=1e-5)


def test_registry_reference_yaml_schema():
    """model_entry accepts the reference YAML kwargs schema."""
    cfg = {
        "type": "clip_fdt_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 512},
            "text_encode": {
                "bpe_path": "ignored",
                "text_encode_type": "Transformer",
                "text_model_utils": {"random": False, "freeze": False},
                "embed_dim": 512,
            },
            "fdt": {
                "sd_temperature": 1000,
                "att_func_type": "sparsemax",
                "pool_type": "max",
                "use_allgather": True,
                "sd_num": 4096,
                "sd_dim": 512,
                "raw_img_ft_dim": 768,
                "raw_txt_ft_dim": 512,
            },
        },
    }
    model = model_entry(cfg)
    assert isinstance(model, CLIPFDT)
    assert model.fdt_cfg.sd_num == 4096
    assert model.vision_cfg.width == 768
    assert model.text_cfg.width == 512


def test_auxilary_factory_aliases_clip_b32():
    """Reference clip_vitb32_auxilary (clip.py:209-216) = CLIP B/32 with
    attention-surfacing towers; here the same module graph (checkpoints
    interchangeable), attention via return_attn at call time."""
    aux = model_entry({"type": "clip_vitb32_auxilary", "kwargs": {}})
    base = model_entry({"type": "clip_vitb32", "kwargs": {}})
    assert isinstance(aux, CLIP)
    assert aux.vision_cfg == base.vision_cfg
    assert aux.text_cfg == base.text_cfg


def test_init_distributions(clip_model):
    """Spot-check the torch-parity init stds (visual tower)."""
    _, params = clip_model
    p = params["params"]["visual"]
    width, layers = TINY_VISION.width, TINY_VISION.layers
    blocks = p["transformer"]["resblocks"]
    attn_w = np.asarray(blocks["attn"]["in_proj"]["kernel"])  # [L, D, 3D]
    assert attn_w.shape[0] == layers
    np.testing.assert_allclose(attn_w.std(), width ** -0.5, rtol=0.1)
    proj_w = np.asarray(blocks["attn"]["out_proj"]["kernel"])
    np.testing.assert_allclose(proj_w.std(), (width ** -0.5) * (2 * layers) ** -0.5, rtol=0.1)
    fc_w = np.asarray(blocks["mlp"]["c_fc"]["kernel"])
    np.testing.assert_allclose(fc_w.std(), (2 * width) ** -0.5, rtol=0.1)
    # conv1: torch kaiming uniform bound 1/sqrt(fan_in), std = bound/sqrt(3)
    conv_w = np.asarray(p["conv1"]["kernel"])
    fan_in = conv_w.shape[0] * conv_w.shape[1] * conv_w.shape[2]
    np.testing.assert_allclose(conv_w.std(), (1 / np.sqrt(fan_in)) / np.sqrt(3), rtol=0.1)


def test_unroll_matches_scan():
    """unroll=True only changes scheduling: params structure and outputs are
    bit-identical to the scanned towers (checkpoints interchange freely)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iterated_learning_for_vlm_tpu.models.vit import VisionConfig, VisionTransformer

    kw = dict(input_resolution=16, patch_size=8, width=32, layers=3, heads=2,
              embed_dim=16)
    m_scan = VisionTransformer(VisionConfig(**kw, unroll=False))
    m_unroll = VisionTransformer(VisionConfig(**kw, unroll=True))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    p = m_scan.init(jax.random.PRNGKey(0), x)["params"]
    a = m_scan.apply({"params": p}, x)["embed"]
    b = m_unroll.apply({"params": p}, x)["embed"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv1_stop_gradient():
    """conv1 is permanently frozen: its gradient must be exactly zero while
    everything else trains (reference freeze_conv1=True)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iterated_learning_for_vlm_tpu.models.vit import VisionConfig, VisionTransformer

    m = VisionTransformer(VisionConfig(input_resolution=16, patch_size=8, width=32,
                                       layers=1, heads=2, embed_dim=16))
    x = jnp.ones((2, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    g = jax.grad(lambda pp: m.apply({"params": pp}, x)["embed"].sum())(p)
    assert float(np.abs(np.asarray(g["conv1"]["kernel"])).max()) == 0.0
    assert float(np.abs(np.asarray(g["proj"])).max()) > 0.0


def test_tower_attn_and_hidden_collection():
    """Per-layer attention probs + hidden states (reference ``*_auxilary`` /
    ``*_inter`` encoder-variant surfaces, SURVEY §2.1)."""
    from iterated_learning_for_vlm_tpu.models.text import TextTransformer
    from iterated_learning_for_vlm_tpu.models.vit import VisionTransformer

    images, tokens, pad_mask = _batch()
    b, s_img = 2, (32 // 8) ** 2 + 1

    vt = VisionTransformer(TINY_VISION)
    vparams = vt.init(jax.random.PRNGKey(0), images)
    out = vt.apply(vparams, images, return_attn=True)
    attn = out["attn_weights"]
    assert attn.shape == (TINY_VISION.layers, b, s_img, s_img)
    # rows are softmax distributions
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-4)
    assert out["cls_attn"].shape == (TINY_VISION.layers, b, s_img)
    np.testing.assert_allclose(
        np.asarray(out["cls_attn"]), np.asarray(attn[:, :, 0, :]), atol=0)
    # plain forward identical with/without collection
    base = vt.apply(vparams, images)
    np.testing.assert_allclose(np.asarray(base["embed"]),
                               np.asarray(out["embed"]), atol=1e-5)

    tt = TextTransformer(TINY_TEXT)
    tparams = tt.init(jax.random.PRNGKey(1), tokens, pad_mask)
    tout = tt.apply(tparams, tokens, pad_mask, return_attn=True)
    tattn = tout["attn_weights"]
    ctx = TINY_TEXT.context_length
    assert tattn.shape == (TINY_TEXT.layers, b, ctx, ctx)
    # causal: no probability mass above the diagonal
    upper = np.triu(np.ones((ctx, ctx)), k=1)
    assert float(np.abs(np.asarray(tattn) * upper).max()) < 1e-6


def test_transformer_hidden_states_stacked():
    from iterated_learning_for_vlm_tpu.models.layers import Transformer

    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 16), jnp.float32)
    tr = Transformer(width=16, layers=3, heads=2)
    params = tr.init(jax.random.PRNGKey(0), x)
    y, hidden = tr.apply(params, x, return_hidden_states=True)
    assert hidden.shape == (3, 2, 7, 16)
    # last collected hidden state == final output
    np.testing.assert_allclose(np.asarray(hidden[-1]), np.asarray(y), atol=1e-6)
    y2, hidden2, attn = tr.apply(params, x, return_hidden_states=True,
                                 return_attn_weights=True)
    assert attn.shape == (3, 2, 7, 7)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_attn_layout_bqhk_matches_bhqk():
    """The head-minor XLA score layout ("bqhk" — skips the [B,H,S,hd]
    canonicalization transposes) must match the canonical layout numerically
    on both towers (same math, different einsum layout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iterated_learning_for_vlm_tpu.models.layers import MultiheadAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 13, 64)), jnp.float32)
    bias = jnp.triu(jnp.full((13, 13), -jnp.inf, jnp.float32), k=1)
    for b in (None, bias):
        outs = {}
        for layout in ("bhqk", "bqhk"):
            m = MultiheadAttention(num_heads=4, attn_layout=layout)
            params = m.init(jax.random.PRNGKey(0), x, b)
            outs[layout], _ = m.apply(params, x, b)
        np.testing.assert_allclose(np.asarray(outs["bqhk"]),
                                   np.asarray(outs["bhqk"]),
                                   rtol=2e-5, atol=2e-5)
