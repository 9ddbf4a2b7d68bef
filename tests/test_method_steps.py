"""FILIP / SLIP recipe step smoke tests (tiny CLIP)."""
import jax
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.models import CLIP, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.train.method_steps import (
    make_filip_train_step, make_slip_train_step,
)
from iterated_learning_for_vlm_tpu.train.optim import (
    adamw_init, build_wd_tree, trainable_mask_tree,
)
from iterated_learning_for_vlm_tpu.train.schedule import cosine
from iterated_learning_for_vlm_tpu.train.train_state import TrainState

V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=12, vocab_size=128, width=32, heads=2, layers=1,
               embed_dim=16)


def _setup():
    model = CLIP(vision_cfg=V, text_cfg=T)
    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "image": jnp.asarray(rng.randn(b, 16, 16, 3).astype(np.float32)),
        "image_v2": jnp.asarray(rng.randn(b, 16, 16, 3).astype(np.float32)),
        "tokens": jnp.asarray(rng.randint(1, 127, (b, 12)), jnp.int32),
        "pad_mask": jnp.zeros((b, 12), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"], batch["tokens"],
                        batch["pad_mask"])["params"]
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()))
    wd = build_wd_tree(params, 0.0, {})
    return model, state, batch, wd


def test_token_feature_extraction():
    model, state, batch, _ = _setup()
    patch_ft = model.apply({"params": state.params}, batch["image"],
                           method="extract_patch_ft")
    assert patch_ft.shape == (8, 4, 16)  # (16/8)^2 patches -> embed 16
    word_ft, pm = model.apply({"params": state.params}, batch["tokens"],
                              batch["pad_mask"], method="extract_word_ft")
    assert word_ft.shape == (8, 12, 16)


def test_filip_step():
    model, state, batch, wd = _setup()
    step = make_filip_train_step(model, cosine(1e-3, 1e-3, 0, 0, 10), wd,
                                 donate=False)
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])  # overfits the fixed batch


def test_slip_step():
    model, state, batch, wd = _setup()
    step = make_slip_train_step(model, cosine(1e-3, 1e-3, 0, 0, 10), wd,
                                ssl_scale=0.5, donate=False)
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m2["loss"]))
    assert "ssl_loss" in m2 and "clip_loss" in m2
