"""Swin + ModifiedResNet tower smoke tests (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models.resnet import ModifiedResNet, ResNetConfig
from iterated_learning_for_vlm_tpu.models.swin import SwinConfig, SwinTransformer


@pytest.mark.slow  # re-tiered r4 (~13s); v1 forward keeps the Swin fast-lane
def test_swin_v2_tiny_forward():
    cfg = SwinConfig(input_resolution=32, patch_size=4, window_size=4, embed_dim=16,
                     depths=(1, 1), num_heads=(2, 4), v2=True, output_dim=24)
    model = SwinTransformer(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    # 32/4 = 8 -> stage1 merge -> 4x4 = 16 tokens, dim 32
    assert out["embed"].shape == (2, 24)
    assert out["patches"].shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out["embed"])).all()


def test_swin_v1_tiny_forward_shifted():
    cfg = SwinConfig(input_resolution=32, patch_size=4, window_size=4, embed_dim=16,
                     depths=(2,), num_heads=(2,), v2=False, output_dim=24)
    model = SwinTransformer(cfg)
    imgs = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["embed"].shape == (2, 24)
    assert np.isfinite(np.asarray(out["embed"])).all()


def test_swin_mlp_tiny_forward_shifted():
    # depths=(2,) exercises the zero-pad shifted block (swin_mlp.py:122-152)
    cfg = SwinConfig(input_resolution=32, patch_size=4, window_size=4, embed_dim=16,
                     depths=(2,), num_heads=(2,), v2=False, output_dim=24,
                     mlp_mix=True)
    model = SwinTransformer(cfg)
    imgs = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["embed"].shape == (2, 24)
    assert np.isfinite(np.asarray(out["embed"])).all()
    # attention-free: no qkv/logit_scale params anywhere
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = "/".join(jax.tree_util.keystr(p) for p, _ in flat)
    assert "qkv" not in names and "spatial_mlp" in names


def test_swin_factory_structural_overrides():
    """Config kwargs can reshape the tower (the reference's Swin YAML fields:
    DEPTHS/NUM_HEADS/WINDOW_SIZE/IMG_SIZE...); embed_dim keeps its CLIP
    output-dim meaning."""
    from iterated_learning_for_vlm_tpu.models.swin import swin_b_v2

    cfg = swin_b_v2(embed_dim=64, input_resolution=64, window_size=4,
                    depths=[1, 1], num_heads=[2, 4])
    assert cfg.output_dim == 64 and cfg.embed_dim == 128  # stage-0 channels
    assert cfg.depths == (1, 1) and cfg.num_heads == (2, 4)
    assert cfg.input_resolution == 64 and cfg.window_size == 4


def test_swin_mlp_registry_factory():
    from iterated_learning_for_vlm_tpu.models import model_entry

    model = model_entry({"type": "clip_swinMLP_B", "kwargs": {
        "image_encode": {"embed_dim": 32},
        "text_encode": {"embed_dim": 32},
    }})
    assert model.vision_cfg.mlp_mix is True
    assert model.vision_cfg.depths == (2, 2, 18, 2)


def test_spatial_mlp_matches_grouped_linear():
    """SpatialMLP == per-head [N,N] position mix (the reference's grouped
    Conv1d over nH*ws^2 channels, swin_mlp.py:104-141)."""
    from iterated_learning_for_vlm_tpu.models.swin import SpatialMLP

    rng = np.random.RandomState(4)
    nw, n, heads, hd = 3, 9, 2, 4
    x = rng.randn(nw, n, heads * hd).astype(np.float32)
    mod = SpatialMLP(heads=heads)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    w = np.asarray(params["params"]["mix_kernel"])   # [H, N, N]
    b = np.asarray(params["params"]["mix_bias"])     # [H, N]
    xh = x.reshape(nw, n, heads, hd)
    want = np.einsum("hnm,wmhc->wnhc", w, xh) + b.T[None, :, :, None]
    np.testing.assert_allclose(got, want.reshape(nw, n, heads * hd), rtol=1e-5, atol=1e-5)


def test_resnet_tiny_forward():
    cfg = ResNetConfig(layers=(1, 1), width=16, input_resolution=32, embed_dim=24,
                       heads=4)
    model = ModifiedResNet(cfg)
    imgs = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(variables, imgs)
    assert out["embed"].shape == (2, 24)
    assert np.isfinite(np.asarray(out["embed"])).all()
    assert "batch_stats" in variables
