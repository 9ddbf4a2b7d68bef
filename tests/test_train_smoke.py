"""End-to-end smoke training over the 8-device CPU mesh.

Covers: Solver build (registry/custom model), synthetic data, sharded batch +
replicated state, the jitted step (loss decreases), and IL invariants under a
tiny reset cadence — the SURVEY §4 test-pyramid top.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models import (
    CLIP, CLIPFDT, FDTConfig, TextConfig, VisionConfig, register_model,
)
from iterated_learning_for_vlm_tpu.parallel.mesh import create_mesh
from iterated_learning_for_vlm_tpu.train.solver import Solver, fdt_temperature
from iterated_learning_for_vlm_tpu.utils.config import Config

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute e2e compiles; 'make test-all' runs these


V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=2, heads=2, embed_dim=16)
T = TextConfig(context_length=16, width=32, heads=2, layers=2, embed_dim=16)
F = FDTConfig(sd_num=32, sd_dim=16, raw_img_ft_dim=32, raw_txt_ft_dim=32,
              sd_temperature=100.0)

register_model("clip_tiny_test", lambda **kw: CLIP(vision_cfg=V, text_cfg=T))
register_model(
    "clip_fdt_tiny_test", lambda **kw: CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F)
)


def _config(model_type, max_iter=8, reset=None):
    return Config({
        "model": {"type": model_type, "kwargs": {}},
        "grad_clip": {"type": "logit_scale_param_value", "value": 3, "max_value": 6},
        "t_decay": {"org_t": 100.0, "sd_T_decay_iter": 4, "sd_T_decay_w": 0.5,
                    "sd_T_min": 0.01},
        "optimizer": {
            "type": "AdamW",
            "kwargs": {"lr": 1e-3, "weight_decay": 0.1, "betas": [0.9, 0.98],
                       "eps": 1e-8},
            "pconfig": {"ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
                        "bias": {"weight_decay": 0}, "logit_scale": {"weight_decay": 0}},
        },
        "lr_scheduler": {"type": "Cosine", "kwargs": {
            "base_lr": 1e-3, "warmup_lr": 2e-3, "min_lr": 0.0, "warmup_steps": 2,
            "max_iter": max_iter}},
        "data": {"train": {"synthetic": True, "batch_size": 16, "epoch": 1,
                           "num_batches": max_iter, "workers": 0}},
        "saver": {"print_freq": 4, "val_freq": 0, "save_freq": 0},
        "reset": reset or {"enable": False},
    })


def test_fdt_temperature_decay():
    t_decay = Config({"org_t": 1000, "sd_T_decay_iter": 2700, "sd_T_decay_w": 0.5,
                      "sd_T_min": 0.01})
    assert fdt_temperature(1, t_decay, 1000.0) == 1000.0
    assert fdt_temperature(2700, t_decay, 1000.0) == 500.0
    assert fdt_temperature(5400, t_decay, 1000.0) == 250.0
    assert fdt_temperature(10 ** 6, t_decay, 1000.0) == pytest.approx(0.01)


def test_clip_smoke_train(tmp_path):
    mesh = create_mesh(8)
    solver = Solver(_config("clip_tiny_test", max_iter=6), output_path=str(tmp_path),
                    debug=True, mesh=mesh)
    state = solver.train()
    assert int(state.step) == 6
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(state.params))
    # params moved
    p0 = solver._init_fn()
    moved = np.abs(
        np.asarray(state.params["text"]["text_projection"]["kernel"])
        - np.asarray(p0["text"]["text_projection"]["kernel"])
    ).max()
    assert moved > 0
    # conv1 did NOT move (permanently frozen)
    np.testing.assert_array_equal(
        np.asarray(state.params["visual"]["conv1"]["kernel"]),
        np.asarray(p0["visual"]["conv1"]["kernel"]),
    )


def test_fdt_il_smoke_train(tmp_path):
    mesh = create_mesh(8)
    # window (4, 12); reset fires at step 8, smooth until step 8+3 -> training
    # ends at step 9, i.e. mid-smooth: codebook must be held to the snapshot
    # and the vision tower must be frozen.
    reset = {"enable": True, "reset_steps": 4, "reset_nums": 3, "smooth_steps": 3,
             "save_freq": 1, "distil_steps": 0}
    solver = Solver(_config("clip_fdt_tiny_test", max_iter=9, reset=reset),
                    output_path=str(tmp_path), debug=True, mesh=mesh)
    state = solver.train()
    assert int(state.step) == 9
    assert np.isfinite(np.asarray(state.params["space_dict"]).sum())
    assert float(state.hold_codebook) == 1.0
    np.testing.assert_allclose(
        np.asarray(state.params["space_dict"]), np.asarray(state.stored_codebook)
    )
    # vision frozen mid-smooth, text trainable
    from flax import traverse_util

    tm = {tuple(map(str, k)): float(v)
          for k, v in traverse_util.flatten_dict(state.trainable).items()}
    assert tm[("visual", "proj")] == 0.0
    assert tm[("text", "text_projection", "kernel")] == 1.0
