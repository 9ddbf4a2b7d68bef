"""Spectral-norm penalty / normalisation tests."""
import jax
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.train.lipreg import (
    init_power_vectors, spectral_normalize_tree, spectral_penalty,
)


def _params(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
                  "bias": jnp.zeros((8,))},
        "out_proj": {"kernel": jnp.asarray(rng.randn(8, 8).astype(np.float32))},
    }


def test_penalty_approximates_sigma_max():
    params = _params()
    pv = init_power_vectors(params, jax.random.PRNGKey(0))
    penalty, new_pv = spectral_penalty(params, pv, lambda_reg=1.0, num_iterations=20)
    expected = sum(
        np.linalg.svd(np.asarray(params[k]["kernel"]), compute_uv=False)[0]
        for k in ("dense", "out_proj")
    )
    assert float(penalty) == float(np.float32(expected)) or abs(float(penalty) - expected) / expected < 0.02
    # power vectors updated + unit norm
    v = np.asarray(jax.tree.leaves(new_pv)[0])
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)


def test_penalty_differentiable():
    params = _params()
    pv = init_power_vectors(params, jax.random.PRNGKey(0))

    def f(p):
        pen, _ = spectral_penalty(p, pv, 0.1, num_iterations=5)
        return pen

    g = jax.grad(f)(params)
    assert np.isfinite(np.asarray(g["dense"]["kernel"])).all()
    assert float(np.abs(np.asarray(g["dense"]["kernel"])).max()) > 0


def test_spectral_normalize():
    params = _params()
    normed = spectral_normalize_tree(params, num_iterations=30)
    sigma = np.linalg.svd(np.asarray(normed["dense"]["kernel"]), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, atol=5e-2)
    # out_proj excluded (reference skips out_proj, clip_fdt.py:27)
    np.testing.assert_array_equal(
        np.asarray(normed["out_proj"]["kernel"]), np.asarray(params["out_proj"]["kernel"])
    )
