"""DeCLIP-FDT: FDT on the DeCLIP multi-task recipe (legacy capability).

Parity target: reference ``prototype/model/declip_fdt.py`` (``DECLIP_FDT``):
CLIP-FDT plus DeCLIP's self-supervision heads —

- ``projection_MLP`` (3x Linear+BN, reference lines 20-77) and
  ``prediction_MLP`` (bottleneck 2-layer, lines 80-117) SimSiam heads for
  image-image (two augmented views) and text-text similarity,
- optional NN-memory-bank supervision (``models/memory_bank.py``),
- optional MLM head (``text_label_predictor``) over masked tokens
  (``data/mask_tokens.py``).

BatchNorm note: the reference's Sync-BN is stubbed to a no-sync BatchNorm1d
(``prototype/linklink/nn.py``); here the MLP heads use flax BatchNorm with a
``batch_stats`` collection (thread ``mutable=["batch_stats"]`` when training).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .clip import LOGIT_SCALE_INIT, constant_init, l2_normalize
from .fdt import FDTConfig, QueryModel
from .initializers import torch_kaiming_uniform
from .text import TextConfig, TextTransformer
from .vit import VisionConfig, VisionTransformer


class ProjectionMLP(nn.Module):
    """3-layer SimSiam projector, BN on every fc (reference lines 20-77)."""

    hidden_dim: int = 1024
    out_dim: int = 1024
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        x = nn.relu(bn("bn1")(dense(self.hidden_dim, "linear1")(x)))
        x = bn("bn2")(dense(self.hidden_dim, "linear2")(x))
        if self.num_layers == 3:
            x = nn.relu(x)
            x = bn("bn3")(dense(self.out_dim, "linear3")(x))
        return x


class PredictionMLP(nn.Module):
    """Bottleneck SimSiam predictor (reference lines 80-117)."""

    hidden_dim: int = 512
    out_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hidden_dim, kernel_init=torch_kaiming_uniform(),
                     dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn1")(h))
        return nn.Dense(self.out_dim, kernel_init=torch_kaiming_uniform(),
                        dtype=self.dtype, param_dtype=jnp.float32, name="layer2")(h)


@dataclass(frozen=True)
class DeCLIPConfig:
    feature_dim: int = 1024
    return_simsiam_text: bool = False
    return_nn_bank: bool = False
    text_mask_type: Optional[str] = None  # "MLM" enables the label predictor
    nn_size: int = 2 ** 16
    nn_topk: int = 1
    # DeFILIP (reference prototype/solver/defilip_solver.py): per-token dense
    # projections into a shared space for the FILIP late-interaction term.
    return_dense: bool = False
    dense_dim: int = 256


class DeCLIPFDT(nn.Module):
    """CLIP-FDT + DeCLIP heads. ``__call__(view1, view2, tokens, pad_mask)``
    returns contrastive embeddings plus SimSiam (p, z) pairs per view."""

    vision_cfg: VisionConfig
    text_cfg: TextConfig
    fdt_cfg: FDTConfig
    declip_cfg: DeCLIPConfig = field(default_factory=DeCLIPConfig)
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.fdt_cfg
        self.visual = VisionTransformer(self.vision_cfg, dtype=self.dtype, name="visual")
        self.text = TextTransformer(self.text_cfg, dtype=self.dtype, name="text")
        self.space_dict = self.param(
            "space_dict", nn.initializers.normal(1.0), (cfg.sd_num, cfg.sd_dim)
        )
        qm = dict(sd_dim=cfg.sd_dim, att_func_type=cfg.att_func_type,
                  pool_type=cfg.pool_type, sparsemax_method=cfg.sparsemax_method,
                  dtype=self.dtype)
        self.img_query = QueryModel(ft_dim=cfg.raw_img_ft_dim, name="img_query", **qm)
        self.txt_query = QueryModel(ft_dim=cfg.raw_txt_ft_dim, name="txt_query", **qm)
        self.logit_scale = self.param("logit_scale", constant_init(LOGIT_SCALE_INIT), (1,))

        self.projector = ProjectionMLP(dtype=self.dtype, name="projector")
        self.predictor = PredictionMLP(dtype=self.dtype, name="predictor")
        if self.declip_cfg.return_simsiam_text:
            self.projector_text = ProjectionMLP(dtype=self.dtype, name="projector_text")
            self.predictor_text = PredictionMLP(dtype=self.dtype, name="predictor_text")
        if self.declip_cfg.text_mask_type is not None:
            self.text_label_predictor = nn.Dense(
                self.text_cfg.vocab_size, kernel_init=torch_kaiming_uniform(),
                dtype=self.dtype, param_dtype=jnp.float32, name="text_label_predictor",
            )
        if self.declip_cfg.return_dense:
            d = self.declip_cfg.dense_dim
            self.img_dense_proj = nn.Dense(
                d, use_bias=False, kernel_init=torch_kaiming_uniform(),
                dtype=self.dtype, param_dtype=jnp.float32, name="img_dense_proj")
            self.txt_dense_proj = nn.Dense(
                d, use_bias=False, kernel_init=torch_kaiming_uniform(),
                dtype=self.dtype, param_dtype=jnp.float32, name="txt_dense_proj")

    def _image_sd(self, images, temperature):
        patches = self.visual(images)["patches"]
        _, sd_ft = self.img_query(patches, self.space_dict, temperature=temperature)
        return sd_ft, patches

    def _text_sd(self, tokens, pad_mask, temperature):
        out = self.text(tokens, pad_mask)
        _, sd_ft = self.txt_query(out["words"], self.space_dict, mask=pad_mask,
                                  temperature=temperature)
        return sd_ft, out["words"]

    # -- eval protocol (same surface as CLIPFDT for the benchmark harness:
    # the kwarg is ``temperature`` to match CLIPFDT's extract methods —
    # eval/encode.py's JitEncoder passes it as a traced kwarg by that name) --
    def extract_img_sd_ft(self, images, temperature=None):
        t = self.fdt_cfg.sd_temperature if temperature is None else temperature
        patches = self.visual(images)["patches"]
        att, sd_ft = self.img_query(patches, self.space_dict, temperature=t)
        return att, sd_ft

    def extract_txt_sd_ft(self, tokens, pad_mask=None, temperature=None):
        t = self.fdt_cfg.sd_temperature if temperature is None else temperature
        out = self.text(tokens, pad_mask)
        att, sd_ft = self.txt_query(out["words"], self.space_dict, mask=pad_mask,
                                    temperature=t)
        return att, sd_ft

    def __call__(self, images_v1, images_v2, tokens, pad_mask=None,
                 sd_temperature=None, train: bool = False):
        t = self.fdt_cfg.sd_temperature if sd_temperature is None else sd_temperature

        img1, patches1 = self._image_sd(images_v1, t)
        img2, patches2 = self._image_sd(images_v2, t)
        txt, words = self._text_sd(tokens, pad_mask, t)

        # SimSiam image branch: z = proj(feat), p = pred(z)
        z1 = self.projector(img1, train=train)
        z2 = self.projector(img2, train=train)
        p1 = self.predictor(z1, train=train)
        p2 = self.predictor(z2, train=train)

        out = {
            "image_embed": l2_normalize(img1.astype(jnp.float32), 1e-10),
            "image_embed_v2": l2_normalize(img2.astype(jnp.float32), 1e-10),
            "text_embed": l2_normalize(txt.astype(jnp.float32), 1e-10),
            "logit_scale": jnp.minimum(jnp.exp(self.logit_scale[0]), 100.0),
            "simsiam": (p1, z1, p2, z2),
        }
        if self.declip_cfg.return_simsiam_text:
            zt = self.projector_text(txt, train=train)
            out["simsiam_text"] = (self.predictor_text(zt, train=train), zt)
        if self.declip_cfg.text_mask_type is not None:
            out["mlm_logits"] = self.text_label_predictor(words)
        if self.declip_cfg.return_dense:
            # FILIP late-interaction features: per-token projections to the
            # shared dense space, L2-normalized (defilip_solver.py dense logits)
            out["patches_proj"] = l2_normalize(
                self.img_dense_proj(patches1).astype(jnp.float32), 1e-10)
            out["patches_proj_v2"] = l2_normalize(
                self.img_dense_proj(patches2).astype(jnp.float32), 1e-10)
            out["words_proj"] = l2_normalize(
                self.txt_dense_proj(words).astype(jnp.float32), 1e-10)
        return out


def declip_fdt_vitb32(**kw):
    from . import _common  # reuse kwargs plumbing

    img_kw, txt_kw, dtype = _common(kw)
    fdt_kw = dict(kw.get("fdt", {}))
    fdt_kw.pop("use_allgather", None)
    declip_kw = dict(kw.get("declip", {}))
    from .vit import vit_b32
    from .text import text_base

    return DeCLIPFDT(
        vision_cfg=vit_b32(**img_kw), text_cfg=text_base(**txt_kw),
        fdt_cfg=FDTConfig(**fdt_kw), declip_cfg=DeCLIPConfig(**declip_kw),
        dtype=dtype,
    )


def defilip_fdt_vitb32(**kw):
    """DeFILIP: the DeCLIP multi-task model with per-token dense projections
    enabled for the FILIP late-interaction term (reference
    ``prototype/solver/defilip_solver.py`` composition)."""
    declip_kw = dict(kw.get("declip", {}))
    declip_kw.setdefault("return_dense", True)
    kw = dict(kw)
    kw["declip"] = declip_kw
    return declip_fdt_vitb32(**kw)
