"""DeCLIP multi-task train step smoke test (BN stats threading, loss terms)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.models import FDTConfig, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.models.declip_fdt import DeCLIPConfig, DeCLIPFDT
from iterated_learning_for_vlm_tpu.train.declip_step import (
    DeCLIPLossWeights, make_declip_train_step,
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
F = FDTConfig(sd_num=32, sd_dim=1024, raw_img_ft_dim=32, raw_txt_ft_dim=32,
              sd_temperature=10.0)


@pytest.mark.slow  # heavy 8-device compile; covered by make test-all + TPU smokes
def test_declip_step_runs_and_updates_bn():
    model = DeCLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F,
                      declip_cfg=DeCLIPConfig(text_mask_type="MLM"))
    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "image": jnp.asarray(rng.randn(b, 16, 16, 3).astype(np.float32)),
        "image_v2": jnp.asarray(rng.randn(b, 16, 16, 3).astype(np.float32)),
        "tokens": jnp.asarray(rng.randint(1, 127, (b, 12)), jnp.int32),
        "pad_mask": jnp.zeros((b, 12), jnp.float32),
        "mlm_labels": jnp.asarray(
            np.where(rng.rand(b, 12) < 0.15, rng.randint(1, 127, (b, 12)), -100),
            jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"], batch["image_v2"],
                           batch["tokens"], batch["pad_mask"], train=True)
    params, bn = variables["params"], variables["batch_stats"]
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()),
                              params["space_dict"], batch_stats=bn)
    step = make_declip_train_step(
        model, cosine(1e-3, 1e-3, 0, 0, 10), build_wd_tree(params, 0.0, {}),
        weights=DeCLIPLossWeights(clip=1.0, simsiam=1.0, mlm=0.5), donate=False,
    )
    bn_before = np.asarray(jax.tree.leaves(bn)[0]).copy()
    s1, m1 = step(state, batch, jnp.asarray(10.0))
    s2, m2 = step(s1, batch, jnp.asarray(10.0))
    for k in ("loss", "clip_loss", "simsiam_loss", "mlm_loss"):
        assert np.isfinite(float(m2[k])), k
    # simsiam is a cosine: in [-1, 1]
    assert -1.0 <= float(m2["simsiam_loss"]) <= 1.0
    # BN running stats moved
    bn_after = np.asarray(jax.tree.leaves(s2.batch_stats)[0])
    assert not np.allclose(bn_before, bn_after)
    assert int(s2.step) == 2


def test_two_view_pipeline(tmp_path):
    from tests.test_data import _make_shards

    from iterated_learning_for_vlm_tpu.data.pipeline import get_wds_dataset
    from iterated_learning_for_vlm_tpu.utils.config import Config

    paths = _make_shards(tmp_path, 1, 8)
    cfg = Config({"data_path": paths, "transforms": "MOCOV2", "num_samples": 8,
                  "workers": 1, "batch_size": 4, "context_length": 16})
    info = get_wds_dataset(cfg, world_size=1)
    batch = next(iter(info.dataloader))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["image_v2"].shape == (4, 224, 224, 3)
    # independent augmentations
    assert not np.allclose(batch["image"], batch["image_v2"])
