"""Launcher-reachable tensor parallelism.

`parallel.model_parallel: N` in a training config carves an N-way `model`
axis out of the solver's mesh and applies the Megatron-style param/moment
shardings (parallel/sharding_rules.py) to the TrainState — previously that
path was only exercised by __graft_entry__.dryrun_multichip and
tools/mp_host_dryrun.py, not reachable from `scripts/train.py --config`.
The reference has no TP at all (SURVEY §2.6) — this is scaling headroom,
and it must train identically to the dp-only path.
"""
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models import (
    CLIPFDT, FDTConfig, TextConfig, VisionConfig, register_model,
)
from iterated_learning_for_vlm_tpu.parallel.mesh import MODEL_AXIS
from iterated_learning_for_vlm_tpu.train.solver import Solver
from iterated_learning_for_vlm_tpu.utils.config import Config

V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=16, width=32, heads=2, layers=1, embed_dim=16)
F = FDTConfig(sd_num=32, sd_dim=16, raw_img_ft_dim=32, raw_txt_ft_dim=32,
              sd_temperature=100.0, sparsemax_method="bisect")

register_model("clip_fdt_tiny_tp_test",
               lambda **kw: CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F))


def _config(model_parallel: int, max_iter: int = 3, reset: dict = None) -> Config:
    return Config({
        "reset": reset or {"enable": False},
        "model": {"type": "clip_fdt_tiny_tp_test", "kwargs": {}},
        "parallel": {"model_parallel": model_parallel},
        "optimizer": {
            "type": "AdamW",
            "kwargs": {"lr": 1e-3, "weight_decay": 0.1, "betas": [0.9, 0.98],
                       "eps": 1e-8},
            "pconfig": {"ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
                        "bias": {"weight_decay": 0},
                        "logit_scale": {"weight_decay": 0}},
        },
        "lr_scheduler": {"type": "Cosine", "kwargs": {
            "base_lr": 1e-3, "warmup_lr": 2e-3, "min_lr": 0.0,
            "warmup_steps": 2, "max_iter": max_iter}},
        "data": {"train": {"synthetic": True, "batch_size": 16, "epoch": 1,
                           "num_batches": max_iter, "workers": 0}},
        "saver": {"print_freq": 1, "val_freq": 0, "save_freq": 0},
    })


def _losses(tmp_path, model_parallel):
    solver = Solver(_config(model_parallel), output_path=str(tmp_path),
                    exp_name=f"tp{model_parallel}", debug=True)
    state = solver.train()
    assert int(state.step) == 3
    return solver, state


@pytest.mark.slow
def test_model_parallel_config_key_trains_identically(tmp_path):
    s_dp, st_dp = _losses(tmp_path / "dp", 1)
    s_tp, st_tp = _losses(tmp_path / "tp", 2)
    # the config key actually carved a model axis
    assert int(s_dp.mesh.shape[MODEL_AXIS]) == 1
    assert int(s_tp.mesh.shape[MODEL_AXIS]) == 2
    # codebook rows are sharded over it
    sd = st_tp.params["space_dict"]
    spec = sd.sharding.spec if hasattr(sd.sharding, "spec") else None
    assert spec is not None and spec[0] == MODEL_AXIS, spec
    # same data, same seed -> same trained params either way
    for key in ("logit_scale", "logit_scale_sd"):
        np.testing.assert_allclose(np.asarray(st_tp.params[key]),
                                   np.asarray(st_dp.params[key]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(st_dp.params["space_dict"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_il_reset_preserves_tp_shardings(tmp_path):
    """A reset re-draws leaves with no sharded operand; without re-pinning
    (ILEngine._match_shardings) the text tower would come back replicated —
    recompiling the step and dropping the Megatron splits for the rest of
    the run."""
    from iterated_learning_for_vlm_tpu.parallel.sharding_rules import param_shardings

    cfg = _config(2, max_iter=4,
                  reset={"enable": True, "reset_steps": 2, "reset_nums": 3,
                         "smooth_steps": 1, "semantics": "reference",
                         "reset_optimizer_state": True,
                         "freeze_vision_during_smooth": True})
    solver = Solver(cfg, output_path=str(tmp_path), exp_name="tp_il", debug=True)
    state = solver.train()
    assert int(state.step) == 4  # reset fired after step 4 (2 < 4 < 6)
    expected = param_shardings(state.params, solver.mesh)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(state.params)
    exp_flat = traverse_util.flatten_dict(expected)
    checked = 0
    for path, leaf in flat.items():
        exp_sharding = exp_flat[path]
        if MODEL_AXIS not in str(exp_sharding.spec):
            continue
        # Compare PHYSICAL layouts, not spec strings: JAX normalizes trailing
        # P(..., None) away after computation, so P('model',) == P('model', None)
        # for a 2-d leaf even though the spec objects differ.
        assert leaf.sharding.is_equivalent_to(exp_sharding, leaf.ndim), (
            path, leaf.sharding, exp_sharding)
        checked += 1
    assert checked >= 3  # codebook + reset-scope tp kernels were re-pinned
