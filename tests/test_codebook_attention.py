"""Fused codebook attention vs the XLA QueryModel math (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models.sparsemax import sparsemax
from iterated_learning_for_vlm_tpu.ops.codebook_attention import (
    fused_codebook_attention, pooled_codebook_logits,
)


def _reference_chain(q, sd, keep, temp):
    inner = jnp.einsum("btd,nd->btn", q, sd) / jnp.sqrt(jnp.float32(q.shape[-1]))
    if keep is not None:
        inner = inner * keep[..., None]
    inner = inner / temp
    pooled = jnp.max(inner, axis=1)
    att = sparsemax(pooled)
    att_ft = att @ sd
    return pooled, att, att_ft


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(4, 9, 32).astype(np.float32))
    sd = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    keep = jnp.asarray((rng.rand(4, 9) > 0.3).astype(np.float32))
    return q, sd, keep


def test_pooled_matches(data):
    q, sd, keep = data
    pooled = pooled_codebook_logits(q, sd, keep, 7.0)
    ref, _, _ = _reference_chain(q, sd, keep, 7.0)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), atol=1e-5)


def test_pooled_matches_no_mask(data):
    q, sd, _ = data
    pooled = pooled_codebook_logits(q, sd, None, 3.0)
    ref, _, _ = _reference_chain(q, sd, None, 3.0)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), atol=1e-5)


def test_fused_attention_matches(data):
    q, sd, keep = data
    att, att_ft = fused_codebook_attention(q, sd, keep_mask=keep, temperature=7.0)
    _, ref_att, ref_ft = _reference_chain(q, sd, keep, 7.0)
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref_att), atol=2e-5)
    np.testing.assert_allclose(np.asarray(att_ft), np.asarray(ref_ft), atol=1e-4)


def test_explicit_tile_overrides_match_auto(data):
    """Static (bb, nn) tile overrides (fwd_tiles/bwd_tiles) change only the
    kernel schedule — values and grads must be identical to the auto-picked
    tiles (the on-chip sweep tunes these per token count)."""
    q, sd, keep = data

    def f(q_, sd_, tiles):
        att, att_ft = fused_codebook_attention(
            q_, sd_, keep_mask=keep, temperature=7.0,
            fwd_tiles=tiles, bwd_tiles=tiles)
        return jnp.sum(att_ft ** 2)

    base = jax.grad(f, argnums=(0, 1))(q, sd, None)
    for tiles in [(2, 32), (4, 64), (1, 16)]:
        got = jax.jit(jax.grad(f, argnums=(0, 1)), static_argnums=2)(q, sd, tiles)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(base[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(base[1]), atol=1e-5)


def test_gradients_match_non_dividing_codebook_tile():
    """nn NOT dividing the codebook size: in the dq kernel the codebook axis
    is the ACCUMULATED axis, so the final tile's undefined padded tail must
    be masked or it corrupts every retained dq row (reproduced on the real
    TPU backend at n=192, nn=128 before the in-kernel guard; interpret mode
    zero-fills pads, the chip does not)."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 9, 32).astype(np.float32))
    sd = jnp.asarray(rng.randn(192, 32).astype(np.float32))
    keep = jnp.asarray((rng.rand(4, 9) > 0.3).astype(np.float32))

    def f_fused(q, sd):
        att, att_ft = fused_codebook_attention(
            q, sd, keep_mask=keep, temperature=7.0,
            fwd_tiles=(4, 128), bwd_tiles=(4, 128))
        return jnp.sum(att_ft ** 2)

    def f_ref(q, sd):
        _, _, att_ft = _reference_chain(q, sd, keep, 7.0)
        return jnp.sum(att_ft ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1))(q, sd)
    g2 = jax.grad(f_ref, argnums=(0, 1))(q, sd)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


def test_gradients_match(data):
    q, sd, keep = data

    def f_fused(q, sd):
        att, att_ft = fused_codebook_attention(q, sd, keep_mask=keep, temperature=7.0)
        return jnp.sum(att_ft ** 2)

    def f_ref(q, sd):
        _, _, att_ft = _reference_chain(q, sd, keep, 7.0)
        return jnp.sum(att_ft ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1))(q, sd)
    g2 = jax.grad(f_ref, argnums=(0, 1))(q, sd)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)
