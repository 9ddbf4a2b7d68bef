"""Context-length bucketing: static-shape text-context reduction.

New vs the reference (which always computes the full 77-token context,
``text_transformer.py:155-167``): batches whose captions all fit a smaller
bucket run the text tower at that static length.  These tests pin the
load-bearing claims: (a) the bucket slice is exact — every consumer of token
features is causal/EOT/pad-masked, so dropping all-pad tail columns changes
no output; (b) the pipeline picks the right bucket; (c) under multi-host
sharding the loader never buckets — without ``context_buckets_sync`` buckets
disable, with it the solver's main loop applies a cross-host agreed bucket
(``bucket_global_batch``; proven end-to-end by the 2-process cluster test).
"""
import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from iterated_learning_for_vlm_tpu.data.pipeline import bucket_context, get_wds_dataset
from iterated_learning_for_vlm_tpu.data.shards import write_tar_shard
from iterated_learning_for_vlm_tpu.models import (
    CLIP, CLIPFDT, FDTConfig, TextConfig, VisionConfig,
)
from iterated_learning_for_vlm_tpu.utils.config import Config

V = VisionConfig(input_resolution=32, patch_size=16, width=64, layers=2,
                 heads=2, embed_dim=32)
T = TextConfig(context_length=77, width=64, heads=2, layers=2, embed_dim=32)
F = FDTConfig(sd_num=64, sd_dim=32, raw_img_ft_dim=64, raw_txt_ft_dim=64,
              sparsemax_method="bisect")


def _tokens(bs, ctx, max_len, seed=0):
    """Random token rows with true lengths <= max_len (EOT = the max id)."""
    rng = np.random.default_rng(seed)
    tokens = np.zeros((bs, ctx), np.int32)
    pad = np.full((bs, ctx), -np.inf, np.float32)
    for i in range(bs):
        n = int(rng.integers(3, max_len + 1))
        tokens[i, : n - 1] = rng.integers(1, 40000, n - 1)
        tokens[i, n - 1] = 49408  # EOT: highest id, drives argmax pooling
        pad[i, :n] = 0.0
    return jnp.asarray(tokens), jnp.asarray(pad)


# ---------------------------------------------------------------- helper --

def test_bucket_context_picks_smallest_fitting():
    tokens = np.zeros((4, 77), np.int32)
    pad = np.full((4, 77), -np.inf, np.float32)
    pad[:, :20] = 0.0  # max true length 20
    batch = {"tokens": tokens, "pad_mask": pad, "image": np.zeros((4, 2))}
    out = bucket_context(batch, [32, 77])
    assert out["tokens"].shape == (4, 32)
    assert out["pad_mask"].shape == (4, 32)
    assert out["image"].shape == (4, 2)  # non-token keys untouched


def test_bucket_context_falls_back_to_full():
    tokens = np.zeros((2, 77), np.int32)
    pad = np.full((2, 77), -np.inf, np.float32)
    pad[0, :50] = 0.0  # one long caption
    batch = {"tokens": tokens, "pad_mask": pad}
    out = bucket_context(batch, [32, 77])
    assert out["tokens"].shape == (2, 77)
    # bucket list without the full context: overflow returns the batch as-is
    out = bucket_context(batch, [32])
    assert out["tokens"].shape == (2, 77)
    # no buckets configured: identity
    assert bucket_context(batch, ()) is batch


def test_bucket_context_slices_mlm_labels():
    tokens = np.zeros((2, 77), np.int32)
    pad = np.full((2, 77), -np.inf, np.float32)
    pad[:, :10] = 0.0
    batch = {"tokens": tokens, "pad_mask": pad,
             "mlm_labels": np.full((2, 77), -100, np.int32)}
    out = bucket_context(batch, [16, 77])
    assert out["mlm_labels"].shape == (2, 16)


# ------------------------------------------------------------- exactness --

def test_clip_text_embed_exact_across_buckets():
    tok77, pad77 = _tokens(6, 77, max_len=20)
    model = CLIP(vision_cfg=V, text_cfg=T)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, tok77[:2], pad77[:2])["params"]

    full = model.apply({"params": params}, tok77, pad77,
                       method=type(model).encode_text)
    cut = model.apply({"params": params}, tok77[:, :32], pad77[:, :32],
                      method=type(model).encode_text)
    # Exact in real arithmetic; tolerance covers XLA reduction-order
    # reassociation between the S=32 and S=77 programs (~1e-6 in fp32).
    np.testing.assert_allclose(np.asarray(cut), np.asarray(full),
                               rtol=1e-5, atol=5e-6)


@pytest.mark.slow  # re-tiered r4: exhaustive bucket-exactness variant (~40s); clip_text_embed keeps the fast-lane coverage
def test_fdt_text_codebook_embed_exact_across_buckets():
    tok77, pad77 = _tokens(5, 77, max_len=24, seed=3)
    model = CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, tok77[:2], pad77[:2])["params"]

    att_full, emb_full = model.apply({"params": params}, tok77, pad77,
                                     method=type(model).extract_txt_sd_ft)
    att_cut, emb_cut = model.apply({"params": params}, tok77[:, :32], pad77[:, :32],
                                   method=type(model).extract_txt_sd_ft)
    np.testing.assert_allclose(np.asarray(emb_cut), np.asarray(emb_full),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(att_cut), np.asarray(att_full),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # re-tiered r4 (~22s)
def test_fdt_text_grads_exact_across_buckets():
    """Gradients through the bucketed text path match the full-context run
    (the training-step claim, not just inference)."""
    tok77, pad77 = _tokens(4, 77, max_len=16, seed=7)
    model = CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, tok77[:2], pad77[:2])["params"]

    def loss(p, tok, pad):
        _, emb = model.apply({"params": p}, tok, pad,
                             method=type(model).extract_txt_sd_ft)
        return jnp.sum(emb ** 2)

    g_full = jax.grad(loss)(params, tok77, pad77)
    g_cut = jax.grad(loss)(params, tok77[:, :32], pad77[:, :32])
    # Param shapes are identical (only the pos-embedding USAGE is sliced);
    # pad-tail pos rows get zero grad in both runs (causal + pad-masked).
    for a, b in zip(jax.tree.leaves(g_cut), jax.tree.leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# -------------------------------------------------------------- pipeline --

def _jpeg_bytes(value, size=32):
    img = Image.fromarray(np.full((size, size, 3), value, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _shard(tmp_path, captions):
    samples = [{"__key__": f"{i:06d}", "jpg": _jpeg_bytes(i * 29 % 255),
                "txt": c.encode()} for i, c in enumerate(captions)]
    path = str(tmp_path / "00000.tar")
    write_tar_shard(path, iter(samples))
    return path


def _cfg(path, **kw):
    base = dict(data_path=[path], batch_size=4, workers=1, num_samples=8,
                transforms="ONECROP", image_size=32, context_buckets=[32, 77])
    base.update(kw)
    return Config(base)


def test_pipeline_buckets_short_captions(tmp_path):
    path = _shard(tmp_path, [f"a cat number {i}" for i in range(8)])
    info = get_wds_dataset(_cfg(path), world_size=1)
    batch = next(info.loader_fn(0))
    assert batch["tokens"].shape == (4, 32)
    assert batch["pad_mask"].shape == (4, 32)


def test_pipeline_long_caption_overflows_to_full(tmp_path):
    long = " ".join(["wordy"] * 60)
    path = _shard(tmp_path, [long] * 8)
    info = get_wds_dataset(_cfg(path), world_size=1)
    batch = next(info.loader_fn(0))
    assert batch["tokens"].shape == (4, 77)


def test_pipeline_buckets_disabled_multihost(tmp_path):
    path = _shard(tmp_path, [f"a cat number {i}" for i in range(8)])
    info = get_wds_dataset(_cfg(path, num_samples=4), world_size=2, rank=0)
    batch = next(info.loader_fn(0))
    assert batch["tokens"].shape == (4, 77)


# ------------------------------------------------------------ eval encoder --

def test_jit_encoder_text_buckets_exact():
    """JitEncoder.encode_texts buckets short prompts to a smaller static
    context (eval/serving mirror of the train-pipeline bucketing); embeddings
    match the full-context encoder."""
    from iterated_learning_for_vlm_tpu.eval.encode import JitEncoder

    model = CLIP(vision_cfg=V, text_cfg=T)  # ctx 77
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    tok = jnp.zeros((1, 77), jnp.int32)
    pad = jnp.zeros((1, 77), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, tok, pad)["params"]

    texts = ["a cat", "a photo of a dog", "short"]
    bucketed = JitEncoder(model, params, is_fdt=False, batch_size=4)
    full = JitEncoder(model, params, is_fdt=False, batch_size=4,
                      text_buckets=())
    assert bucketed.text_buckets == (16, 32, 77)
    assert full.text_buckets == (77,)
    np.testing.assert_allclose(bucketed.encode_texts(texts),
                               full.encode_texts(texts), rtol=1e-5, atol=5e-6)
    # a long caption overflows every small bucket and still works
    long = " ".join(["word"] * 70)
    np.testing.assert_allclose(bucketed.encode_texts([long]),
                               full.encode_texts([long]), rtol=1e-5, atol=5e-6)


# ------------------------------------------------------- multi-host sync --

def test_pipeline_sync_defers_bucketing_to_solver(tmp_path):
    """Under host sharding the LOADER never buckets — with
    context_buckets_sync the slice is deferred to the solver's main loop
    (bucket_global_batch), because the cross-host agreement must be
    dispatched from the step-dispatch thread, not the prefetch producer."""
    path = _shard(tmp_path, [f"a cat number {i}" for i in range(8)])
    info = get_wds_dataset(_cfg(path, num_samples=4, context_buckets_sync=True),
                           world_size=2, rank=0)
    assert info.deferred_buckets == (32, 77)  # solver's single source of truth
    batch = next(info.loader_fn(0))
    assert batch["tokens"].shape == (4, 77)  # deferred, not sliced in-loader
    # without the sync flag nothing is deferred (buckets just disable)
    info = get_wds_dataset(_cfg(path, num_samples=4), world_size=2, rank=0)
    assert info.deferred_buckets == ()
    # single host: loader buckets itself, nothing deferred
    info = get_wds_dataset(_cfg(path, num_samples=4), world_size=1, rank=0)
    assert info.deferred_buckets == ()


def test_bucket_global_batch_slices_and_overflows():
    from iterated_learning_for_vlm_tpu.data.pipeline import bucket_global_batch

    tokens = jnp.zeros((4, 77), jnp.int32)
    pad = jnp.full((4, 77), -jnp.inf)
    pad = pad.at[:, :20].set(0.0)
    out = bucket_global_batch({"tokens": tokens, "pad_mask": pad,
                               "image": jnp.zeros((4, 2))}, (32, 77))
    assert out["tokens"].shape == (4, 32)
    assert out["pad_mask"].shape == (4, 32)
    assert out["image"].shape == (4, 2)
    # matches the host-side bucket choice
    ref = bucket_context({"tokens": np.zeros((4, 77), np.int32),
                          "pad_mask": np.asarray(pad)}, [32, 77])
    assert ref["tokens"].shape == (4, 32)
    # overflow falls back to full context
    pad = pad.at[0, :50].set(0.0)
    out = bucket_global_batch({"tokens": tokens, "pad_mask": pad}, (32, 77))
    assert out["tokens"].shape == (4, 77)


def test_synced_bucket_batches_lookahead_stream():
    """The solver's pipelined form (one-batch lookahead) yields every batch,
    in order, with exactly the slice bucket_global_batch would apply."""
    from iterated_learning_for_vlm_tpu.data.pipeline import (
        bucket_global_batch, synced_bucket_batches)

    def mk(true_len, tag):
        pad = jnp.full((4, 77), -jnp.inf).at[:, :true_len].set(0.0)
        return {"tokens": jnp.full((4, 77), tag, jnp.int32), "pad_mask": pad}

    batches = [mk(12, 0), mk(40, 1), mk(5, 2)]
    out = list(synced_bucket_batches(iter(batches), (32, 77)))
    ref = [bucket_global_batch(b, (32, 77)) for b in batches]
    assert [o["tokens"].shape for o in out] == [(4, 32), (4, 77), (4, 32)]
    for o, r in zip(out, ref):
        assert o["tokens"].shape == r["tokens"].shape
        assert int(o["tokens"][0, 0]) == int(r["tokens"][0, 0])  # order kept
    # no buckets -> passthrough
    assert list(synced_bucket_batches(iter(batches), ())) == batches


def test_prefetch_producer_failure_propagates():
    """A dying loader must raise on the consuming (step-dispatch) thread,
    never silently end the epoch: under multi-host training a short batch
    stream on one host deadlocks every other host's next collective."""
    from iterated_learning_for_vlm_tpu.data.pipeline import prefetch_to_device

    def loader():
        yield {"x": np.zeros((2,), np.float32)}
        raise RuntimeError("decode exploded")

    it = prefetch_to_device(loader(), mesh=None, size=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(it)


def test_prefetch_abandoned_consumer_releases_producer():
    """Breaking out of the prefetch stream mid-epoch (solver hitting
    max_iter off an epoch boundary) must unblock the producer thread and
    close the underlying loader, not leave both parked for the process
    lifetime on a full queue."""
    import threading

    from iterated_learning_for_vlm_tpu.data.pipeline import prefetch_to_device

    closed = threading.Event()

    def loader():
        try:
            for i in range(100):
                yield {"x": np.full((2,), i, np.float32)}
        finally:
            closed.set()

    it = prefetch_to_device(loader(), mesh=None, size=2)
    assert float(next(it)["x"][0]) == 0.0
    it.close()  # what `break` in a for-loop does on GC / scope exit
    # producer notices within its put-poll interval and closes the loader
    assert closed.wait(timeout=5.0), "abandoned prefetch leaked the loader"


@pytest.mark.slow
def test_synced_buckets_two_process_cluster(tmp_path):
    """TRUE multi-host synced bucketing: two OS processes, host-sharded wds
    loaders with DIFFERENT caption-length mixes, context_buckets_sync on.
    A per-step shape disagreement would deadlock the cross-process
    collectives; completion + identical per-step global losses in both logs
    is the proof the hosts agreed on every bucket."""
    import re
    import socket
    import subprocess
    import sys

    import yaml

    # rank-dependent length mix: split_by_node hands each rank a disjoint
    # shard subset; shards alternate short-only / containing-long captions
    long = " ".join(["wordy"] * 20)  # > 8 BPE tokens -> needs the 16 bucket
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    # long captions live ONLY in shard 3 (one rank's split): that rank's
    # local max differs from the other's on the batches that draw them
    # (the disagreement an unsynced loader would deadlock on), while their
    # rarity (2/8 in one shard) leaves other batches all-short so the
    # 8-token bucket demonstrably fires (asserted below; the draw is
    # deterministic for the pinned seeds)
    for s in range(4):
        caps = [long if (s == 3 and i < 2) else f"a cat {i}"
                for i in range(8)]
        samples = [{"__key__": f"{s:02d}{i:04d}", "jpg": _jpeg_bytes((s * 8 + i) * 7 % 255),
                    "txt": c.encode()} for i, c in enumerate(caps)]
        write_tar_shard(str(shard_dir / f"{s:05d}.tar"), iter(samples))

    cfg = {
        "model": {"type": "clip_vitb32", "kwargs": {
            "image_encode": {"embed_dim": 32, "width": 64, "layers": 2,
                             "heads": 2, "input_resolution": 32, "patch_size": 16},
            "text_encode": {"embed_dim": 32, "width": 64, "heads": 2,
                            "layers": 2, "context_length": 16},
        }},
        "grad_clip": {"type": "logit_scale_param_value", "value": 3, "max_value": 6},
        "optimizer": {"type": "AdamW", "kwargs": {
            "lr": 0.0005, "weight_decay": 0.1, "betas": [0.9, 0.98], "eps": 1e-8}},
        "lr_scheduler": {"type": "Cosine", "kwargs": {
            "base_lr": 0.0005, "warmup_lr": 0.005, "min_lr": 0.0,
            "warmup_steps": 2, "max_iter": 4}},
        "data": {"train": {
            "data_path": str(shard_dir) + "/{00000..00003}.tar",
            "transforms": "ONECROP", "image_size": 32, "context_length": 16,
            "num_samples": 32, "num_shards": 4, "workers": 1,
            "batch_size": 4, "epoch": 1,
            "context_buckets": [8, 16], "context_buckets_sync": True,
        }},
        "saver": {"print_freq": 1, "val_freq": 0, "save_freq": 0,
                  "save_many": False},
        "reset": {"enable": False},
    }
    cfg_path = tmp_path / "mh_bucket.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    train = os.path.join(os.path.dirname(__file__), "..", "scripts", "train.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, train, "--config", str(cfg_path),
             "--output_path", str(tmp_path / f"out{i}"), "--exp_name", "mhb",
             "--debug", "--platform", "cpu", "--cpu_devices", "1",
             "--multihost", "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:  # never leak a deadlocked rank (it holds the port)
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    losses = [re.findall(r"Iter \[\d+/\d+\] loss ([\d.]+)", out) for out in outs]
    assert losses[0] and losses[0] == losses[1], (losses, outs[0][-2000:])
    # NOT vacuous: prove synced bucketing actually engaged and actually
    # sliced (identical losses alone would also pass if bucketing silently
    # disabled).  Every iter line logs the step's static text context.
    assert "synced context buckets engaged" in outs[0], outs[0][-2000:]
    ctxs = [re.findall(r" ctx (\d+)$", out, re.MULTILINE) for out in outs]
    assert ctxs[0] and ctxs[0] == ctxs[1], (ctxs, outs[0][-2000:])
    assert any(int(c) < 16 for c in ctxs[0]), (
        "no batch ran below the full 16-token context", ctxs)
    assert any(int(c) == 16 for c in ctxs[0]), (
        "no batch drew a long caption — the cross-host disagreement case "
        "was never exercised", ctxs)
