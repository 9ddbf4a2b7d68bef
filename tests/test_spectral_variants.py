"""Spectral-norm (_sp) variant training + lipreg-in-step tests."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.models import CLIP, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.train.lipreg import (
    init_power_vectors, init_spectral_u, spectral_reparam,
)
from iterated_learning_for_vlm_tpu.train.optim import (
    adamw_init, build_wd_tree, trainable_mask_tree,
)
from iterated_learning_for_vlm_tpu.train.schedule import cosine
from iterated_learning_for_vlm_tpu.train.step import make_train_step
from iterated_learning_for_vlm_tpu.train.train_state import TrainState

V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=2, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=12, vocab_size=128, width=32, heads=2, layers=2,
               embed_dim=16)


def _setup(spectral=False, lipreg=0.0):
    model = CLIP(vision_cfg=V, text_cfg=T)
    b = 8
    batch = {
        "image": jnp.asarray(np.random.RandomState(0).randn(b, 16, 16, 3), jnp.float32),
        "tokens": jnp.asarray(np.random.RandomState(1).randint(1, 127, (b, 12)), jnp.int32),
        "pad_mask": jnp.zeros((b, 12), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"], batch["tokens"],
                        batch["pad_mask"])["params"]
    if spectral:
        su = init_spectral_u(params, jax.random.PRNGKey(7))
    elif lipreg > 0:
        su = init_power_vectors(params, jax.random.PRNGKey(7))
    else:
        su = None
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()), None, su)
    step = make_train_step(model, cosine(1e-3, 2e-3, 0, 2, 10),
                           build_wd_tree(params, 0.0, {}), is_fdt=False,
                           grad_clip_type="none", spectral_norm=spectral,
                           lipreg_lambda=lipreg, donate=False)
    return model, state, step, batch


def test_spectral_reparam_sigma_one():
    model, state, _, _ = _setup(spectral=True)
    sn_params, new_u = spectral_reparam(state.params, state.spectral_u, num_iterations=30)
    k = np.asarray(sn_params["text"]["text_projection"]["kernel"])
    sigma = np.linalg.svd(k, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, atol=0.05)
    # scanned kernel handled too
    ks = np.asarray(sn_params["text"]["transformer"]["resblocks"]["mlp"]["c_fc"]["kernel"])
    sigma0 = np.linalg.svd(ks[0], compute_uv=False)[0]
    np.testing.assert_allclose(sigma0, 1.0, atol=0.1)
    # out_proj untouched
    np.testing.assert_array_equal(
        np.asarray(sn_params["text"]["transformer"]["resblocks"]["attn"]["out_proj"]["kernel"]),
        np.asarray(state.params["text"]["transformer"]["resblocks"]["attn"]["out_proj"]["kernel"]),
    )


def test_sp_train_step_runs():
    _, state, step, batch = _setup(spectral=True)
    u0 = np.asarray(jax.tree.leaves(state.spectral_u)[0]).copy()
    s1, m1 = step(state, batch, jnp.asarray(0.0))
    s2, m2 = step(s1, batch, jnp.asarray(0.0))
    assert np.isfinite(float(m2["loss"]))
    # power vectors updated across steps
    u2 = np.asarray(jax.tree.leaves(s2.spectral_u)[0])
    assert not np.allclose(u0, u2)


@pytest.mark.slow  # heavy 8-device compile; covered by make test-all + TPU smokes
def test_lipreg_step_increases_loss():
    _, state0, step0, batch = _setup(lipreg=0.0)
    _, state1, step1, _ = _setup(lipreg=0.1)
    _, m0 = step0(state0, batch, jnp.asarray(0.0))
    _, m1 = step1(state1, batch, jnp.asarray(0.0))
    assert float(m1["loss"]) > float(m0["loss"])  # penalty added
