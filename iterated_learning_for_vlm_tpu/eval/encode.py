"""Batched jitted encoders for the evaluation harness.

Replaces the reference adapter ``CLIP_benchmark/clip_benchmark/models/fdt.py``
(``MyModelZoo``): one wrapper exposes ``encode_images`` / ``encode_texts``
over numpy/PIL inputs for both CLIP and CLIP-FDT params (FDT checkpoints use
``extract_*_sd_ft`` features, CLIP uses ``encode_image/text`` — the same
fallback order as the reference, fdt.py:60-83).

All eval paths are *batched and jit-compiled with fixed shapes* (partial
batches are padded), unlike the reference's batch-1 Python loops
(e.g. ``eval/sugar_crepe.py:29-63`` runs ~14k single-sample forwards).
"""
from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import build_common_augmentation
from ..data.tokenizer import get_tokenizer


_CAST_KEEP_FP32 = ("ln_", "norm", "bn", "batch", "logit_scale", "space_dict",
                   "running_", "relative_position")


def serving_cast_params(params, dtype=jnp.bfloat16):
    """Pre-cast matmul-consumed weights to the compute dtype ONCE, halving
    weight HBM reads per encode pass (the latency lever for small serving
    batches).  Bit-exact for bf16-compute models: every cast param is one the
    towers already consume via ``.astype(dtype)`` / ``promote_dtype`` — we
    just move the cast out of the graph.  Params consumed at fp32 stay fp32:
    LayerNorm/BatchNorm scales+biases, ``logit_scale``, Swin relative-position
    tables, and the FDT codebook (``space_dict``: the Pallas kernel consumes
    it raw, models/fdt.py:100).  Only meaningful when the model's compute
    dtype is bf16 — with fp32 compute the cast would CHANGE numerics.

    Measured on-chip (tools/bench_serve.py --cast-weights,
    results/serve_bench_bf16w.json): +2-4% image throughput at bs256 and
    -10% CLIP text latency at bs32 (2.65 -> 2.40 ms); neutral elsewhere —
    XLA already overlaps most in-graph weight casts, so this stays opt-in
    (``JitEncoder(weight_dtype="bfloat16")``)."""

    def cast(path, x):
        p = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        if any(s in p for s in _CAST_KEEP_FP32) or x.dtype != jnp.float32:
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


class JitEncoder:
    def __init__(
        self,
        model,
        params,
        is_fdt: bool,
        tokenizer=None,
        batch_size: int = 64,
        transform: str = "ONECROP",
        normalize: bool = True,
        num_workers: int = 4,
        text_buckets: Optional[Sequence[int]] = (16, 32),
        weight_dtype=None,
        data_parallel: bool = False,
        mesh=None,
        sd_temperature: Optional[float] = None,
    ):
        self.model = model
        if weight_dtype is not None:  # serving: pre-cast matmul weights
            model_dtype = jnp.dtype(getattr(model, "dtype", jnp.float32))
            if model_dtype != jnp.dtype(weight_dtype):
                # the cast is only EXACT when the towers already compute in
                # weight_dtype (they cast per-use); under fp32 compute it
                # would silently round every weight
                raise ValueError(
                    f"weight_dtype={weight_dtype} requires a model computing "
                    f"in that dtype (model dtype is {model_dtype}); build the "
                    "model with dtype: bfloat16 or drop weight_dtype")
            params = serving_cast_params(params, jnp.dtype(weight_dtype))
        self.is_fdt = is_fdt
        self.tokenizer = tokenizer or get_tokenizer()
        # an out-of-range token id turns into a SILENT NaN embedding (XLA
        # gather is undefined out of bounds) — fail loudly instead.  The
        # repo tokenizer's vocab is 49409 (DeCLIP lineage: CLIP's 49408 +
        # ``<|mask|>``, data/tokenizer.py:6), a classic mismatch with models
        # built at CLIP's 49408.
        tok_vs = getattr(self.tokenizer, "vocab_size", None)
        if tok_vs and tok_vs > int(model.text_cfg.vocab_size):
            raise ValueError(
                f"tokenizer vocab ({tok_vs}) exceeds the model's "
                f"text embedding table ({model.text_cfg.vocab_size}); "
                "out-of-range ids would gather garbage/NaN embeddings")
        self.batch_size = batch_size
        # Data-parallel eval over all local devices (the TPU-native form of
        # the reference's ``--distributed`` flag, cli.py:69 — there it splits
        # the eval set over GPU ranks; here the fixed-shape encode batch is
        # sharded over a 1-axis mesh and pjit partitions the towers, so every
        # metric sees bit-identical gathered embeddings).  Single-process
        # only: eval never needs a pod (the training mesh path covers that).
        self.mesh = None
        self._batch_sharding = None
        if data_parallel or mesh is not None:
            from ..parallel.mesh import (
                DATA_AXIS, batch_sharding, create_mesh, replicate_tree,
            )

            self.mesh = mesh if mesh is not None else create_mesh()
            if jax.process_count() > 1:
                # plain device_put in _put fails on shards placed on
                # NON-ADDRESSABLE devices.  Only reject meshes that actually
                # contain such devices — a caller-provided mesh built from
                # jax.local_devices() works fine even on a pod.
                local = set(jax.local_devices())
                if any(d not in local for d in self.mesh.devices.flat):
                    raise ValueError(
                        "data-parallel eval needs a locally-addressable mesh; "
                        "pass mesh=create_mesh(devices=jax.local_devices()) "
                        "or run eval on one host (training handles "
                        "multi-host meshes)")
            ndata = int(self.mesh.shape[DATA_AXIS])
            if ndata > 1:
                # fixed encode shape must split evenly over the DATA axis
                # (model-parallel extents don't constrain the batch)
                self.batch_size = -(-self.batch_size // ndata) * ndata
                self._batch_sharding = batch_sharding(self.mesh)
                params = replicate_tree(params, self.mesh)
            else:
                self.mesh = None
        self.params = params
        self.normalize = normalize
        self.num_workers = max(1, int(num_workers))
        self.context_length = model.text_cfg.context_length
        # static text-context buckets for encode_texts (mirrors the train
        # pipeline's context bucketing, data/pipeline.py:bucket_context):
        # eval prompts/captions are mostly far shorter than the 77 context,
        # and the EOT feature is exact at any context that holds the caption
        # (tests/test_context_bucketing.py).  The full context is always a
        # member; () disables.  One jit compile per distinct bucket used.
        self.text_buckets = tuple(sorted(
            {int(b) for b in (text_buckets or ()) if int(b) < self.context_length}
            | {self.context_length}))
        self.image_size = model.vision_cfg.input_resolution
        # resize/crop scaled to the model's input resolution for EVERY
        # recipe (reference: Resize(256) -> CenterCrop(224) for 224-px)
        self.transform = build_common_augmentation(
            transform, image_size=self.image_size)

        # FDT codebook temperature as a TRACED argument: re-scoring another
        # checkpoint at its decayed T (tools/il_effectiveness_ab.py sweeps
        # many) swaps ``self.sd_temperature`` without recompiling — the
        # reference rebuilds the model per checkpoint instead.
        self.sd_temperature = float(
            sd_temperature if sd_temperature is not None
            else (model.fdt_cfg.sd_temperature if is_fdt else 0.0))

        def img_fn(params, images, temp, normalize):
            if is_fdt:
                _, emb = model.apply({"params": params}, images,
                                     method="extract_img_sd_ft",
                                     temperature=temp)
            else:
                emb = model.apply({"params": params}, images, method="encode_image")
            if normalize:
                emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-10)
            return emb

        def txt_fn(params, tokens, pad_mask, temp, normalize):
            if is_fdt:
                _, emb = model.apply(
                    {"params": params}, tokens, pad_mask,
                    method="extract_txt_sd_ft", temperature=temp,
                )
            else:
                emb = model.apply({"params": params}, tokens, pad_mask, method="encode_text")
            if normalize:
                emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-10)
            return emb

        # normalize is a STATIC per-call override: the reference's
        # ``--normalize`` flag only reaches the linear-probe featurizer
        # (linear_probe.py:36-44,152) while every other metric L2-normalizes
        # unconditionally — so the probe can request raw features without
        # changing the zeroshot/retrieval paths.
        self._img_fn = jax.jit(img_fn, static_argnums=3)
        self._txt_fn = jax.jit(txt_fn, static_argnums=4)

    def _put(self, x) -> jnp.ndarray:
        """Host array -> device; batch-sharded over the mesh when the encoder
        runs data-parallel (jit then partitions the whole encode)."""
        if self._batch_sharding is not None:
            return jax.device_put(x, self._batch_sharding)
        return jnp.asarray(x)

    # -- images --------------------------------------------------------------
    def preprocess(self, pil_images: Iterable) -> np.ndarray:
        """Decode + transform, threaded when num_workers > 1 (reference
        --num_workers / torch DataLoader workers; the augment hot path is
        GIL-releasing native code, data/native/fused_augment.c, so threads
        parallelize for real)."""
        pil_images = list(pil_images)
        if self.num_workers > 1 and len(pil_images) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                arrays = list(pool.map(lambda im: self.transform(im, None),
                                       pil_images))
        else:
            arrays = [self.transform(im, None) for im in pil_images]
        return np.stack(arrays).astype(np.float32)

    def encode_images(self, images, normalize: Optional[bool] = None) -> np.ndarray:
        """images: [N,H,W,3] float array, or a sequence of PIL images.
        normalize: per-call override of the constructor default."""
        nrm = bool(self.normalize if normalize is None else normalize)
        if not isinstance(images, np.ndarray):
            images = self.preprocess(images)
        n = len(images)
        out = []
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = images[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            emb = np.asarray(self._img_fn(
                self.params, self._put(chunk),
                jnp.asarray(self.sd_temperature, jnp.float32), nrm))
            out.append(emb[: len(images[i : i + bs])])
        return np.concatenate(out) if out else np.zeros((0, 1), np.float32)

    def _bucket_tokens(self, tokens: np.ndarray, pad_mask: np.ndarray):
        """Slice a tokenized chunk to the smallest static bucket that holds
        every caption (exact: causal masking + EOT/pad-masked pooling).
        Selection logic is shared with the train pipeline."""
        from ..data.pipeline import pick_context_bucket

        if len(self.text_buckets) <= 1:
            return tokens, pad_mask
        b = pick_context_bucket(pad_mask, self.text_buckets)
        if b is None:
            return tokens, pad_mask
        return tokens[:, :b], pad_mask[:, :b]

    # -- texts ---------------------------------------------------------------
    def encode_texts(self, texts: Sequence[str], normalize: Optional[bool] = None) -> np.ndarray:
        nrm = bool(self.normalize if normalize is None else normalize)
        n = len(texts)
        out = []
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = list(texts[i : i + bs])
            real = len(chunk)
            if real < bs:
                chunk = chunk + ["" for _ in range(bs - real)]
            tokens, pad_mask = self.tokenizer(chunk, context_length=self.context_length)
            tokens, pad_mask = self._bucket_tokens(tokens, pad_mask)
            emb = np.asarray(
                self._txt_fn(self.params, self._put(tokens), self._put(pad_mask),
                             jnp.asarray(self.sd_temperature, jnp.float32), nrm)
            )
            out.append(emb[:real])
        return np.concatenate(out) if out else np.zeros((0, 1), np.float32)
