"""Pallas fused attention vs the einsum reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.ops.flash_attention import flash_attention


def _reference_attention(q, k, v, bias=None):
    d = q.shape[-1]
    logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) * (d ** -0.5)
    if bias is not None:
        logits = logits + bias
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhc->bqhc", p.astype(q.dtype), v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    shape = (2, 16, 2, 32)  # [B, S, H, D]
    return tuple(jnp.asarray(rng.randn(*shape).astype(np.float32)) for _ in range(3))


def test_forward_matches(qkv):
    q, k, v = qkv
    out = flash_attention(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_causal(qkv):
    q, k, v = qkv
    s = q.shape[1]
    bias = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)
    out = flash_attention(q, k, v, bias=bias)
    ref = _reference_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grads_match(qkv):
    q, k, v = qkv
    s = q.shape[1]
    bias = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)

    def f_ours(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias=bias) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, bias=bias) ** 2)

    g1 = jax.grad(f_ours, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_model_with_flash_matches_einsum():
    """A tiny ViT with use_flash=True must match the einsum path."""
    from iterated_learning_for_vlm_tpu.models import VisionConfig, VisionTransformer

    imgs = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3).astype(np.float32))
    cfg = dict(input_resolution=16, patch_size=8, width=32, layers=2, heads=2, embed_dim=16)
    m1 = VisionTransformer(VisionConfig(**cfg, use_flash=False))
    m2 = VisionTransformer(VisionConfig(**cfg, use_flash=True))
    params = m1.init(jax.random.PRNGKey(0), imgs)
    o1 = m1.apply(params, imgs)["embed"]
    o2 = m2.apply(params, imgs)["embed"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
