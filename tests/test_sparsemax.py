import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models.sparsemax import sparsemax, sparsemax_bisect


def _reference_sparsemax(z: np.ndarray) -> np.ndarray:
    """Direct numpy transcription of the reference math (sparsemax.py:40-63)."""
    z = z - z.max(axis=-1, keepdims=True)
    n = z.shape[-1]
    zs = -np.sort(-z, axis=-1)
    rng = np.arange(1, n + 1, dtype=z.dtype)
    bound = 1 + rng * zs
    cumsum = np.cumsum(zs, axis=-1)
    is_gt = (bound > cumsum).astype(z.dtype)
    k = np.max(is_gt * rng, axis=-1, keepdims=True)
    taus = (np.sum(is_gt * zs, axis=-1, keepdims=True) - 1) / k
    return np.maximum(z - taus, 0.0)


@pytest.fixture(scope="module")
def logits():
    rng = np.random.RandomState(0)
    return rng.randn(16, 257).astype(np.float32) * 3.0


def test_matches_reference(logits):
    ours = np.asarray(sparsemax(jnp.asarray(logits)))
    ref = _reference_sparsemax(logits)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_simplex(logits):
    out = np.asarray(sparsemax(jnp.asarray(logits)))
    assert (out >= 0).all()
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_sparsity():
    z = jnp.array([[10.0, 0.0, -5.0, -5.0]])
    out = np.asarray(sparsemax(z))
    np.testing.assert_allclose(out, [[1.0, 0, 0, 0]], atol=1e-6)


def test_bisect_matches_sort(logits):
    a = np.asarray(sparsemax(jnp.asarray(logits)))
    b = np.asarray(sparsemax_bisect(jnp.asarray(logits)))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_gradient_rule(logits):
    """Grad must equal the reference backward: nz*(g - sum(g*nz)/k)."""
    z = jnp.asarray(logits[:4])

    def f(z):
        return jnp.sum(sparsemax(z) * jnp.arange(z.shape[-1], dtype=jnp.float32))

    g = jax.grad(f)(z)
    out = np.asarray(sparsemax(z))
    upstream = np.broadcast_to(np.arange(z.shape[-1], dtype=np.float32), out.shape)
    nz = (out != 0).astype(np.float32)
    expected = nz * (upstream - (upstream * nz).sum(-1, keepdims=True) / nz.sum(-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-5)


def test_gradient_bisect_matches_sort(logits):
    z = jnp.asarray(logits[:4])

    def fa(z):
        return jnp.sum(sparsemax(z) ** 2)

    def fb(z):
        return jnp.sum(sparsemax_bisect(z) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(fa)(z)), np.asarray(jax.grad(fb)(z)), atol=1e-4
    )
