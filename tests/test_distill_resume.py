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


def test_mid_epoch_resume_bit_deterministic(tmp_path):
    """A mid-epoch checkpoint resume must produce bit-identical final params
    to the uninterrupted run: the solver deterministically skips INTO the
    resume epoch (solver._batches skip=) instead of replaying it from its
    start (which double-trains the epoch head — the reference's wds
    granularity, clip_dataset_wsd.py:158-240, can't do better)."""
    import io
    import os

    from PIL import Image

    from iterated_learning_for_vlm_tpu.data.shards import write_tar_shard
    from iterated_learning_for_vlm_tpu.models import register_model

    rng = np.random.default_rng(7)
    shard_dir = tmp_path / "shards"
    os.makedirs(shard_dir)
    for s in range(2):
        samples = []
        for i in range(16):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8)).save(
                buf, format="JPEG")
            samples.append({"__key__": f"{s}_{i}", "jpg": buf.getvalue(),
                            "txt": f"a photo of item {s} {i}".encode()})
        write_tar_shard(str(shard_dir / f"{s:05d}.tar"), iter(samples))

    register_model("clip_tiny_midresume",
                   lambda **kw: CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F))

    def make_cfg(max_iter, save_freq):
        return Config({
            "model": {"type": "clip_tiny_midresume", "kwargs": {}},
            "grad_clip": {"type": "logit_scale_param_value", "value": 3,
                          "max_value": 6},
            "optimizer": {"type": "AdamW", "kwargs": {
                "lr": 1e-3, "weight_decay": 0.0, "betas": [0.9, 0.98],
                "eps": 1e-8}, "pconfig": {}},
            "lr_scheduler": {"type": "Cosine", "kwargs": {
                "base_lr": 1e-3, "warmup_lr": 2e-3, "min_lr": 0.0,
                "warmup_steps": 2, "max_iter": max_iter}},
            "data": {"train": {
                "data_path": str(shard_dir / "{00000..00001}.tar"),
                "transforms": "ONECROP", "image_size": 16,
                "num_samples": 32, "num_shards": 2, "workers": 1,
                "batch_size": 4, "epoch": 1}},
            "saver": {"print_freq": 100, "val_freq": 0, "save_freq": save_freq,
                      "async_save": False},
            "reset": {"enable": False},
        })

    mesh = create_mesh(1)
    # uninterrupted 6-step run (8 batches/epoch: step 6 is mid-epoch),
    # checkpointing at step 3 — also mid-epoch
    import shutil

    sA = Solver(make_cfg(6, 3), output_path=str(tmp_path / "A"), debug=True,
                mesh=mesh)
    stateA = sA.train()
    assert int(stateA.step) == 6

    # resume the SAME run from its mid-epoch step-3 checkpoint
    shutil.rmtree(sA.save_path + "/ckpt_6")
    sB = Solver(make_cfg(6, 0), output_path=str(tmp_path / "A"), debug=True,
                mesh=mesh, ckpt_path="auto")
    assert sB._last_iter == 3
    stateB = sB.train()
    assert int(stateB.step) == 6

    flatA = {k: np.asarray(v) for k, v in jax.tree_util.tree_leaves_with_path(
        stateA.params)}
    flatB = {k: np.asarray(v) for k, v in jax.tree_util.tree_leaves_with_path(
        stateB.params)}
    assert flatA.keys() == flatB.keys()
    for k in flatA:
        np.testing.assert_array_equal(flatA[k], flatB[k], err_msg=str(k))


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


def test_solver_reinitialize_swaps_seed_without_step_rebuild(tmp_path):
    """tools/il_effectiveness_ab.py contract: reinitialize() re-draws
    params/data/IL from a new seed reusing the compiled step for the same
    schedule flavor, and caches one executable per flavor."""
    from iterated_learning_for_vlm_tpu.models import register_model

    register_model("clip_fdt_tiny_reinit",
                   lambda **kw: CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F))
    cfg = Config({
        "model": {"type": "clip_fdt_tiny_reinit", "kwargs": {}},
        "grad_clip": {"type": "logit_scale_param_value", "value": 3,
                      "max_value": 6},
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3,
                      "weight_decay": 0.0, "betas": [0.9, 0.98], "eps": 1e-8},
                      "pconfig": {}},
        "lr_scheduler": {"type": "Cosine", "kwargs": {"base_lr": 1e-3,
                         "warmup_lr": 2e-3, "min_lr": 0.0, "warmup_steps": 2,
                         "max_iter": 6}},
        "data": {"train": {"synthetic": True, "batch_size": 8, "epoch": 1,
                           "num_batches": 6, "workers": 0}},
        "saver": {"print_freq": 100, "val_freq": 0, "save_freq": 0},
        "reset": {"enable": True, "reset_steps": 2, "reset_nums": 3,
                  "smooth_steps": 1},
    })
    mesh = create_mesh(1)
    s = Solver(Config(cfg.to_dict()), output_path=str(tmp_path / "a"),
               debug=True, mesh=mesh)
    step_il = s.train_step
    p0 = np.asarray(s.state.params["text"]["text_projection"]["kernel"]).copy()
    s.train()

    s.reinitialize(1, output_path=str(tmp_path / "b"), reset_enable=True)
    assert s.train_step is step_il          # same flavor -> same executable
    assert int(s.state.step) == 0
    p1 = np.asarray(s.state.params["text"]["text_projection"]["kernel"])
    assert not np.allclose(p0, p1)          # new seed -> new draw
    state1 = s.train()
    assert int(state1.step) == 6

    s.reinitialize(1, output_path=str(tmp_path / "c"), reset_enable=False)
    step_noil = s.train_step
    assert step_noil is not step_il         # other flavor -> other schedule
    p2 = np.asarray(s.state.params["text"]["text_projection"]["kernel"])
    np.testing.assert_array_equal(p1, p2)   # same seed -> same init draw
    state2 = s.train()
    assert int(state2.step) == 6

    s.reinitialize(2, output_path=str(tmp_path / "d"), reset_enable=True)
    assert s.train_step is step_il          # flavor cache reused
