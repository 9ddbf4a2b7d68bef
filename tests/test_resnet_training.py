"""ResNet-CLIP end-to-end training (BN stats through the main step) +
AdamW_SGD composite optimizer tests."""
import jax
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.models import CLIP, TextConfig
from iterated_learning_for_vlm_tpu.models.resnet import ResNetConfig
from iterated_learning_for_vlm_tpu.train.optim import (
    adamw_init, adamw_sgd_init, adamw_sgd_update, build_wd_tree, trainable_mask_tree,
)
from iterated_learning_for_vlm_tpu.train.schedule import cosine
from iterated_learning_for_vlm_tpu.train.step import make_train_step
from iterated_learning_for_vlm_tpu.train.train_state import TrainState

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute e2e compiles; 'make test-all' runs these


T = TextConfig(context_length=12, vocab_size=128, width=32, heads=2, layers=1,
               embed_dim=24)
R = ResNetConfig(layers=(1, 1), width=16, input_resolution=32, embed_dim=24, heads=4)


def test_resnet_clip_train_step():
    model = CLIP(vision_cfg=R, text_cfg=T)
    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "image": jnp.asarray(rng.randn(b, 32, 32, 3).astype(np.float32)),
        "tokens": jnp.asarray(rng.randint(1, 127, (b, 12)), jnp.int32),
        "pad_mask": jnp.zeros((b, 12), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["tokens"],
                           batch["pad_mask"], train=True)
    params, bn = variables["params"], variables["batch_stats"]
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()), None,
                              batch_stats=bn)
    step = make_train_step(model, cosine(1e-3, 1e-3, 0, 0, 10),
                           build_wd_tree(params, 0.0, {}), is_fdt=False,
                           grad_clip_type="none", donate=False)
    bn_before = np.asarray(jax.tree.leaves(bn)[0]).copy()
    s1, m1 = step(state, batch, jnp.asarray(0.0))
    s2, m2 = step(s1, batch, jnp.asarray(0.0))
    assert np.isfinite(float(m2["loss"]))
    assert not np.allclose(np.asarray(jax.tree.leaves(s2.batch_stats)[0]), bn_before)
    assert int(s2.step) == 2


def test_adamw_sgd_composite():
    params = {"visual": {"kernel": jnp.ones((4, 4))},
              "text": {"kernel": jnp.ones((4, 4))}}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    wd = build_wd_tree(params, 0.0, {})
    mask = trainable_mask_tree(params, frozenset())
    state = adamw_sgd_init(params)

    new_p, new_s = adamw_sgd_update(
        grads, state, params, lr_adamw=1e-3, lr_sgd=1e-1, wd_tree=wd,
        trainable=mask, sgd_group=lambda path: path[0] == "visual",
    )
    # sgd leaf: p - lr*momentum_update = 1 - 0.1*0.1 = 0.99
    np.testing.assert_allclose(np.asarray(new_p["visual"]["kernel"]), 0.99, atol=1e-6)
    # adamw leaf stepped with its own lr (bias-corrected step ~ lr)
    np.testing.assert_allclose(np.asarray(new_p["text"]["kernel"]), 1 - 1e-3,
                               atol=1e-4)
    # momentum only accumulated for the sgd group
    assert float(np.abs(np.asarray(new_s["momentum"]["visual"]["kernel"])).max()) > 0
    np.testing.assert_array_equal(np.asarray(new_s["momentum"]["text"]["kernel"]), 0.0)
    # adam moments only for the adamw group... (mu updated everywhere but
    # unused for sgd leaves; count advanced globally) — spot check adam applied
    assert float(np.asarray(new_s["count"]["text"]["kernel"])) == 1.0
