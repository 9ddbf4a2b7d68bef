"""End-to-end test of the ``test.sh`` front-end (``scripts/test.py``):
checkpoint sweep -> per-ckpt eval CLI runs -> JSON results -> table render.
"""
import importlib.util
import json
import os
import sys

import numpy as np
import yaml

from iterated_learning_for_vlm_tpu.eval import builder
from iterated_learning_for_vlm_tpu.models import (
    CLIP, TextConfig, VisionConfig, register_model,
)
from iterated_learning_for_vlm_tpu.train.checkpoint import save_checkpoint

V = VisionConfig(input_resolution=32, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=16, width=32, heads=2, layers=1, embed_dim=16)
register_model("clip_tiny_sweep", lambda **kw: CLIP(vision_cfg=V, text_cfg=T))


def _load_driver():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "test.py")
    spec = importlib.util.spec_from_file_location("test_driver", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_dummy():
    from PIL import Image

    from iterated_learning_for_vlm_tpu.eval.builder import EvalDataset

    rng = np.random.default_rng(0)
    images = [Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype("uint8"))
              for _ in range(4)]
    return EvalDataset(
        name="dummy", task="zeroshot_classification", images=images,
        labels=np.asarray([0, 1, 0, 1]), classnames=["blank image", "noisy image"],
        templates=["a photo of {}"],
    )


def test_checkpoint_sweep_recognition(tmp_path, monkeypatch):
    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    cfg_path = tmp_path / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(
        {"model": {"type": "clip_tiny_sweep", "kwargs": {}}}))

    # two real Orbax checkpoints of the tiny model's state
    from iterated_learning_for_vlm_tpu.eval.model_loader import (
        build_model_from_config, init_template_state,
    )

    model, _ = build_model_from_config(str(cfg_path))
    state = init_template_state(model)
    ckpt_dir = tmp_path / "checkpoints"
    for step in (10, 20):
        save_checkpoint(str(ckpt_dir), state.replace(), step)

    driver = _load_driver()
    out_root = tmp_path / "results"
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--model_config", str(cfg_path), "--ckpt_dir", str(ckpt_dir),
        "--task", "recognition", "--datasets", "dummy",
        "--output_folder", str(out_root), "--batch_size", "4",
    ])
    driver.main()

    files = sorted(os.listdir(out_root))
    assert files == ["10_dummy_zeroshot_classification.json",
                     "20_dummy_zeroshot_classification.json"]
    rec = json.loads((out_root / files[0]).read_text())
    assert rec["task"] == "zeroshot_classification"
    assert "acc1" in rec["metrics"]
