"""Vision-distillation phase + solver checkpoint-resume tests."""
import jax
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.data.synthetic import SyntheticClipData
from iterated_learning_for_vlm_tpu.models import CLIPFDT, FDTConfig, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.parallel.mesh import create_mesh
from iterated_learning_for_vlm_tpu.train.distill import run_vision_distillation
from iterated_learning_for_vlm_tpu.train.il import ILController, ResetConfig
from iterated_learning_for_vlm_tpu.train.optim import adamw_init, trainable_mask_tree
from iterated_learning_for_vlm_tpu.train.schedule import cosine
from iterated_learning_for_vlm_tpu.train.solver import Solver
from iterated_learning_for_vlm_tpu.train.train_state import TrainState
from iterated_learning_for_vlm_tpu.utils.config import Config

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute e2e compiles; 'make test-all' runs these


V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=16, width=32, heads=2, layers=1, embed_dim=16)
F = FDTConfig(sd_num=32, sd_dim=16, raw_img_ft_dim=32, raw_txt_ft_dim=32,
              sd_temperature=10.0)


def test_vision_distillation_phase():
    model = CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F)
    data = SyntheticClipData(batch_size=8, image_size=16, context_length=16,
                             num_batches=4)
    b0 = data.batch(0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b0["image"]),
                        jnp.asarray(b0["tokens"]), jnp.asarray(b0["pad_mask"]))["params"]
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()),
                              params["space_dict"])
    il = ILController(ResetConfig(enable=True, reset_steps=4, reset_nums=2,
                                  smooth_steps=2), jax.random.PRNGKey(1))
    text_before = np.asarray(params["text"]["text_projection"]["kernel"]).copy()
    codebook_before = np.asarray(params["space_dict"]).copy()
    # note: distillation matches FDT features built from pre-proj patch
    # tokens, so visual.proj gets no gradient — track an MLP kernel instead
    vision_before = np.asarray(
        params["visual"]["transformer"]["resblocks"]["mlp"]["c_fc"]["kernel"]).copy()

    batches = ({k: jnp.asarray(v) for k, v in b.items()} for b in data)
    out = run_vision_distillation(model, state, il, batches, total_steps=3,
                                  schedule=cosine(1e-3, 1e-3, 0, 0, 10))
    # text + codebook frozen through distillation
    np.testing.assert_array_equal(
        np.asarray(out.params["text"]["text_projection"]["kernel"]), text_before)
    np.testing.assert_array_equal(np.asarray(out.params["space_dict"]), codebook_before)
    # vision moved (it was swapped/reset then trained)
    assert not np.allclose(
        np.asarray(out.params["visual"]["transformer"]["resblocks"]["mlp"]["c_fc"]["kernel"]),
        vision_before,
    )
    # all trainable again afterwards (except conv1)
    from flax import traverse_util

    tm = {tuple(map(str, k)): float(v)
          for k, v in traverse_util.flatten_dict(out.trainable).items()}
    assert tm[("text", "text_projection", "kernel")] == 1.0
    assert tm[("visual", "conv1", "kernel")] == 0.0


def test_solver_checkpoint_resume(tmp_path):
    from iterated_learning_for_vlm_tpu.models import register_model

    register_model("clip_fdt_tiny_resume",
                   lambda **kw: CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F))
    cfg = Config({
        "model": {"type": "clip_fdt_tiny_resume", "kwargs": {}},
        "grad_clip": {"type": "logit_scale_param_value", "value": 3, "max_value": 6},
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.0,
                      "betas": [0.9, 0.98], "eps": 1e-8}, "pconfig": {}},
        "lr_scheduler": {"type": "Cosine", "kwargs": {"base_lr": 1e-3,
                         "warmup_lr": 2e-3, "min_lr": 0.0, "warmup_steps": 2,
                         "max_iter": 8}},
        "data": {"train": {"synthetic": True, "batch_size": 8, "epoch": 1,
                           "num_batches": 4, "workers": 0}},
        "saver": {"print_freq": 2, "val_freq": 0, "save_freq": 4},
        "reset": {"enable": False},
    })
    mesh = create_mesh(8)
    s1 = Solver(Config(cfg.to_dict()), output_path=str(tmp_path), debug=True, mesh=mesh)
    state1 = s1.train()
    assert int(state1.step) == 4

    # resume from the auto-found checkpoint and continue
    s2 = Solver(Config(cfg.to_dict()), output_path=str(tmp_path), debug=True,
                mesh=mesh, ckpt_path="auto")
    assert s2._last_iter == 4
    np.testing.assert_array_equal(
        np.asarray(s2.state.params["space_dict"]),
        np.asarray(state1.params["space_dict"]),
    )
    state2 = s2.train()
    assert int(state2.step) == 8
