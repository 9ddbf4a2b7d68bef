"""End-to-end eval CLI test (the reference CI's ``test_base`` equivalent:
full cli.run on the Dummy dataset, CPU)."""
import json

import pytest
import yaml

from iterated_learning_for_vlm_tpu.eval import cli as eval_cli
from iterated_learning_for_vlm_tpu.models import (
    CLIP, TextConfig, VisionConfig, register_model,
)

V = VisionConfig(input_resolution=32, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=16, width=32, heads=2, layers=1, embed_dim=16)

register_model("clip_tiny_cli", lambda **kw: CLIP(vision_cfg=V, text_cfg=T))


def _config_file(tmp_path):
    cfg = {"model": {"type": "clip_tiny_cli", "kwargs": {}}}
    p = tmp_path / "model.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_cli_zeroshot_dummy(tmp_path, monkeypatch):
    # Dummy images are 224x224 by default; shrink via builder monkeypatch
    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    out = tmp_path / "result.json"
    rec = eval_cli.main([
        "eval", "--model_config", _config_file(tmp_path), "--dataset", "dummy",
        "--batch_size", "8", "--output", str(out),
    ])
    assert rec["task"] == "zeroshot_classification"
    assert "acc1" in rec["metrics"]
    saved = json.loads(out.read_text())
    assert saved["dataset"] == "dummy"
    assert saved["language"] == "en"


def _tiny_dummy():
    import numpy as np
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


def test_cli_sugar_crepe(tmp_path):
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data_dir = tmp_path / "sc"
    data_dir.mkdir()
    items = {}
    for i in range(3):
        Image.fromarray(np.full((32, 32, 3), 40 * i, np.uint8)).save(img_dir / f"{i}.jpg")
        items[str(i)] = {"filename": f"{i}.jpg", "caption": f"a photo number {i}",
                         "negative_caption": f"the wrong thing {i}"}
    (data_dir / "add_obj.json").write_text(json.dumps(items))
    rec = eval_cli.main([
        "sugar_crepe", "--model_config", _config_file(tmp_path),
        "--data_root", str(data_dir), "--image_root", str(img_dir),
        "--batch_size", "4",
    ])
    assert "sugar-crepe-add_obj" in rec["metrics"]
    assert 0.0 <= rec["metrics"]["sugar-crepe-add_obj"] <= 1.0


def test_cli_clf_roundtrip_custom_names_skip_existing(tmp_path, monkeypatch):
    """save_clf -> load_clfs roundtrip, custom classname override,
    dump_classnames, and --skip_existing (reference cli.py knobs)."""
    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    cfg = _config_file(tmp_path)
    clf = tmp_path / "clf.npy"
    out1 = tmp_path / "r1.json"
    rec = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--batch_size", "8", "--save_clf", str(clf), "--output", str(out1),
        "--dump_classnames",
    ])
    assert clf.exists()
    assert rec["classnames"] == ["blank image", "noisy image"]

    # loading the saved classifier (twice -> averaged) reproduces the metrics
    rec2 = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--batch_size", "8", "--load_clfs", str(clf), str(clf),
    ])
    assert rec2["metrics"]["acc1"] == rec["metrics"]["acc1"]

    # custom classname file changes the dumped names
    names = tmp_path / "names.json"
    names.write_text(json.dumps({"dummy": ["empty picture", "static picture"]}))
    rec3 = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--batch_size", "8", "--custom_classname_file", str(names),
        "--dump_classnames",
    ])
    assert rec3["classnames"] == ["empty picture", "static picture"]

    # skip_existing: formatted output exists -> no records produced
    recs = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--batch_size", "8", "--output", str(out1), "--skip_existing",
    ])
    assert recs == []


def test_sd_temperature_override(tmp_path):
    """--sd_temperature rebuilds the FDT model at the decayed eval T.

    Uses a tiny registered FDT type (full B/32 towers cost ~20 s of CPU init
    for a test that only checks config plumbing); the YAML -> model_entry ->
    init -> encoder path is identical."""
    import yaml as _yaml

    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder
    from iterated_learning_for_vlm_tpu.models import CLIPFDT, FDTConfig

    register_model(
        "clip_fdt_tiny_cli",
        lambda **kw: CLIPFDT(vision_cfg=V, text_cfg=T,
                             fdt_cfg=FDTConfig(**kw.get("fdt", {}))),
    )
    cfg = {"model": {"type": "clip_fdt_tiny_cli", "kwargs": {
        "fdt": {"sd_num": 8, "sd_dim": 16, "raw_img_ft_dim": 32,
                "raw_txt_ft_dim": 32, "sd_temperature": 1000,
                "att_func_type": "sparsemax", "pool_type": "max"},
    }}}
    p = tmp_path / "fdt.yaml"
    p.write_text(_yaml.safe_dump(cfg))
    enc = load_eval_encoder(str(p), None, sd_temperature=2.0)
    assert enc.model.fdt_cfg.sd_temperature == 2.0
    enc2 = load_eval_encoder(str(p), None)
    assert enc2.model.fdt_cfg.sd_temperature == 1000


def test_template_set_ensembles(tmp_path, monkeypatch):
    """--template_set 80 swaps in the CLIP prompt ensemble (token-exact vs
    the reference prompt file) and zeroshot still runs."""
    from iterated_learning_for_vlm_tpu.eval import builder
    from iterated_learning_for_vlm_tpu.eval.prompts import (
        PROMPT_80, get_prompt_set,
    )

    assert len(PROMPT_80) == 80 and len(set(PROMPT_80)) == 80
    assert get_prompt_set("8")[0] == "a photo of a {}"

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    rec = eval_cli.main([
        "eval", "--model_config", _config_file(tmp_path), "--dataset", "dummy",
        "--batch_size", "8", "--template_set", "6", "--dump_templates",
    ])
    assert len(rec["templates"]) == 6
    assert "acc1" in rec["metrics"]


def test_skip_existing_resolves_auto_task(tmp_path, monkeypatch):
    """--skip_existing must format the candidate path with the RESOLVED task
    (reference resolves before formatting), not the literal 'auto'."""
    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    cfg = _config_file(tmp_path)
    tmpl = str(tmp_path / "{dataset}_{task}_{language}.json")
    rec = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--batch_size", "8", "--output", tmpl,
    ])
    assert rec["task"] == "zeroshot_classification"
    assert (tmp_path / "dummy_zeroshot_classification_en.json").exists()
    recs = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--batch_size", "8", "--output", tmpl, "--skip_existing",
    ])
    assert recs == []  # matched the resolved-task filename and skipped


def test_dataset_list_file_and_product(tmp_path, monkeypatch):
    """--dataset takes multiple entries; a text-file entry expands to one
    dataset per line (reference cli.py:135-145 / test.sh webdatasets.txt)."""
    from iterated_learning_for_vlm_tpu.eval import builder

    def fake_build(name, root="", split="test", language="en", **kw):
        ds = _tiny_dummy()
        ds.name = name
        return ds

    monkeypatch.setattr(builder, "build_dataset", fake_build)
    lst = tmp_path / "webdatasets.txt"
    lst.write_text("wds/ds_a\nwds/ds_b\n")
    tmpl = str(tmp_path / "{dataset}_{task}_{language}.json")
    recs = eval_cli.main([
        "eval", "--model_config", _config_file(tmp_path),
        "--dataset", str(lst), "dummy", "--batch_size", "8", "--output", tmpl,
    ])
    assert [r["dataset"] for r in recs] == ["wds/ds_a", "wds/ds_b", "dummy"]
    assert (tmp_path / "wds_ds_a_zeroshot_classification_en.json").exists()
    assert (tmp_path / "dummy_zeroshot_classification_en.json").exists()


def test_linear_probe_feature_cache_and_skip_load(tmp_path, monkeypatch):
    """--feature_root caches probe features; --skip_load then evaluates
    without building the model at all (reference cli.py --feature_root /
    --skip_load)."""
    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    cfg = _config_file(tmp_path)
    froot = str(tmp_path / "features")
    argv = [
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--task", "linear_probe", "--batch_size", "4", "--fewshot_epochs", "1",
        "--feature_root", froot,
    ]
    rec = eval_cli.main(argv)
    assert "acc1" in rec["metrics"]
    import os

    # key folds in model config + ckpt tag + split names (no sweep collisions)
    prefix = os.path.join(froot, "dummy", "model__random_init__train-test")
    for s in ("train", "test"):
        assert os.path.exists(f"{prefix}_{s}_feats.npy")
        assert os.path.exists(f"{prefix}_{s}_labels.npy")

    # cache complete: --skip_load must not touch the model loader
    monkeypatch.setattr(eval_cli, "_load_encoder",
                        lambda a: (_ for _ in ()).throw(AssertionError("loaded")))
    rec2 = eval_cli.main(argv + ["--skip_load"])
    assert rec2["metrics"]["acc1"] == rec["metrics"]["acc1"]


def test_linear_probe_val_split(tmp_path, monkeypatch):
    """--val_split drives the WD search from an explicit split and is
    mutually exclusive with --val_proportion (reference cli.py:35-37)."""
    import pytest

    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dataset",
                        lambda name, root="", split="test", language="en", **kw:
                        _tiny_dummy())
    cfg = _config_file(tmp_path)
    rec = eval_cli.main([
        "eval", "--model_config", cfg, "--dataset", "dummy",
        "--task", "linear_probe", "--batch_size", "4", "--fewshot_epochs", "1",
        "--val_split", "val",
    ])
    assert "weight_decay" in rec["metrics"]
    with pytest.raises(SystemExit):
        eval_cli.main([
            "eval", "--model_config", cfg, "--dataset", "dummy",
            "--task", "linear_probe", "--val_split", "val",
            "--val_proportion", "0.2",
        ])


@pytest.mark.slow  # re-tiered r4 (~16s)
def test_pretrained_model_sweep(tmp_path, monkeypatch):
    """--pretrained_model sweeps (model_config, ckpt) pairs from args or a
    file, overriding --model_config/--pretrained (reference cli.py:117-133)."""
    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    cfg = _config_file(tmp_path)
    lst = tmp_path / "models.txt"
    lst.write_text(f"{cfg}\n{cfg},\n")  # two entries, no checkpoints
    recs = eval_cli.main([
        "eval", "--dataset", "dummy", "--batch_size", "8",
        "--pretrained_model", str(lst), f"{cfg}",
    ])
    assert isinstance(recs, list) and len(recs) == 3
    assert all(r["model"] == cfg for r in recs)
    import pytest

    with pytest.raises(SystemExit):
        eval_cli.main(["eval", "--dataset", "dummy"])


def test_expand_datasets_sniffing(tmp_path):
    """File entries expand only when they look like dataset-name lists;
    JSON/data files pass through to the builder untouched."""
    from iterated_learning_for_vlm_tpu.eval.cli import _expand_datasets

    lst = tmp_path / "sets.txt"
    lst.write_text("# comment\nwds/a\ncifar:/data/c.pkl\n\n")
    data = tmp_path / "retrieval.json"
    data.write_text('[{"image": "x.jpg", "caption": "a"}]')
    out = _expand_datasets([str(lst), str(data), "dummy"])
    assert out == ["wds/a", "cifar:/data/c.pkl", str(data), "dummy"]


def test_annotation_file_resolves_bare_retrieval_name(tmp_path):
    """--annotation_file supplies retrieval annotations for a bare dataset
    name (reference cli.py --annotation_file for mscoco_captions/flickr)."""
    import numpy as np
    from PIL import Image

    from iterated_learning_for_vlm_tpu.eval.builder import build_dataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / f"{i}.jpg")
    ann = tmp_path / "karpathy.json"
    ann.write_text(json.dumps([
        {"image": "0.jpg", "captions": ["a dog", "a canine"]},
        {"image": "1.jpg", "captions": ["a cat"]},
    ]))
    ds = build_dataset("mscoco_captions", root=str(img_dir),
                       annotation_file=str(ann))
    assert ds.task == "zeroshot_retrieval"
    assert len(ds.images) == 2
    assert ds.captions_per_image[0] == ["a dog", "a canine"]
    # without an annotation file the bare name is still unknown
    import pytest

    with pytest.raises(KeyError):
        build_dataset("mscoco_captions", root=str(img_dir))


@pytest.mark.slow  # re-tiered r4 (~15s)
def test_encoder_normalize_per_call_override(tmp_path):
    """JitEncoder normalize is a static per-call override: the probe can get
    raw features while zeroshot keeps unit-norm ones."""
    import numpy as np

    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder

    enc = load_eval_encoder(_config_file(tmp_path), batch_size=4)
    imgs = np.random.default_rng(0).standard_normal((3, 32, 32, 3)).astype(np.float32)
    unit = enc.encode_images(imgs)
    raw = enc.encode_images(imgs, normalize=False)
    np.testing.assert_allclose(np.linalg.norm(unit, axis=-1), 1.0, atol=1e-4)
    assert not np.allclose(np.linalg.norm(raw, axis=-1), 1.0, atol=1e-3)
    # texts too
    t_raw = enc.encode_texts(["a dog", "a cat"], normalize=False)
    assert not np.allclose(np.linalg.norm(t_raw, axis=-1), 1.0, atol=1e-3)


def test_no_normalize_probe_cli(tmp_path, monkeypatch):
    """--no_normalize reaches the linear probe (raw features, distinct cache
    tag, 'normalized' recorded in metrics — reference --normalize)."""
    import os

    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    froot = str(tmp_path / "features")
    rec = eval_cli.main([
        "eval", "--model_config", _config_file(tmp_path), "--dataset", "dummy",
        "--task", "linear_probe", "--batch_size", "4", "--fewshot_epochs", "1",
        "--feature_root", froot, "--no_normalize",
    ])
    assert rec["metrics"]["normalized"] is False
    prefix = os.path.join(froot, "dummy", "model__random_init__train-test-nonorm")
    assert os.path.exists(f"{prefix}_test_feats.npy")
    import numpy as np

    feats = np.load(f"{prefix}_test_feats.npy")
    assert not np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)


@pytest.mark.slow  # re-tiered r4 (~27s)
def test_no_amp_forces_fp32_and_quiet_silences(tmp_path, monkeypatch, capsys):
    """--no_amp forces fp32 tower compute (reference autocast toggle);
    --quiet suppresses the progress line (reference --quiet)."""
    import jax.numpy as jnp

    from iterated_learning_for_vlm_tpu.eval import builder
    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder
    from iterated_learning_for_vlm_tpu.models import CLIP as _CLIP

    register_model("clip_tiny_cli_dtype",
                   lambda **kw: _CLIP(vision_cfg=V, text_cfg=T,
                                      dtype={"float32": jnp.float32,
                                             "bfloat16": jnp.bfloat16}[
                                          str(kw.get("dtype", "bfloat16"))]))
    cfg = {"model": {"type": "clip_tiny_cli_dtype",
                     "kwargs": {"dtype": "bfloat16"}}}
    p = tmp_path / "model_dt.yaml"
    p.write_text(yaml.safe_dump(cfg))
    enc = load_eval_encoder(str(p), amp=False)
    assert enc.model.dtype == jnp.float32
    enc2 = load_eval_encoder(str(p))
    assert enc2.model.dtype == jnp.bfloat16

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    eval_cli.main([
        "eval", "--model_config", _config_file(tmp_path), "--dataset", "dummy",
        "--batch_size", "8",
    ])
    assert "Running 'zeroshot_classification'" in capsys.readouterr().err
    eval_cli.main([
        "eval", "--model_config", _config_file(tmp_path), "--dataset", "dummy",
        "--batch_size", "8", "--quiet",
    ])
    assert "Running" not in capsys.readouterr().err


def test_num_workers_threaded_preprocess(tmp_path):
    """--num_workers threads eval preprocessing; outputs identical to the
    serial path (order-preserving map, deterministic eval transforms)."""
    import numpy as np
    from PIL import Image

    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder

    rng = np.random.default_rng(2)
    imgs = [Image.fromarray(rng.integers(0, 255, (40, 40, 3)).astype("uint8"))
            for _ in range(6)]
    cfg = _config_file(tmp_path)
    serial = load_eval_encoder(cfg, num_workers=1).preprocess(imgs)
    threaded = load_eval_encoder(cfg, num_workers=4).preprocess(imgs)
    np.testing.assert_array_equal(serial, threaded)


@pytest.mark.slow  # re-tiered r4 (~11s)
def test_no_normalize_does_not_leak_to_zeroshot(tmp_path, monkeypatch):
    """--no_normalize only reaches the linear probe; zeroshot metrics are
    identical with and without it (cosine, not dot — reference semantics)."""
    from iterated_learning_for_vlm_tpu.eval import builder

    monkeypatch.setattr(builder, "build_dummy", lambda n=8: _tiny_dummy())
    cfg = _config_file(tmp_path)
    base = eval_cli.main(["eval", "--model_config", cfg, "--dataset", "dummy",
                          "--batch_size", "8"])
    flagged = eval_cli.main(["eval", "--model_config", cfg, "--dataset", "dummy",
                             "--batch_size", "8", "--no_normalize"])
    assert base["metrics"] == flagged["metrics"]


def test_platform_flags_parse_and_validate():
    """--platform/--cpu_devices mirror scripts/train.py (the env-var route
    loses to device plugins; the config API is authoritative)."""
    p = eval_cli.build_parser()
    args = p.parse_args(["eval", "--model_config", "x.yaml", "--dataset",
                         "dummy", "--platform", "cpu", "--cpu_devices", "8"])
    assert args.platform == "cpu" and args.cpu_devices == 8
    with pytest.raises(SystemExit):
        eval_cli.main(["eval", "--model_config", "x.yaml", "--dataset",
                       "dummy", "--cpu_devices", "8"])
