"""CLIP-FDT: factorized-discrete-token codebook model.

Parity target: reference ``prototype/model/clip_fdt.py``:

- a learnable codebook ``space_dict`` of shape ``[sd_num, sd_dim]`` drawn from
  N(0,1) (``clip_fdt.py:215``),
- per-modality :class:`QueryModel` heads (``clip_fdt.py:54-162``): a 2-layer
  MLP (LN -> Linear -> GELU -> LN -> Linear) maps patch/word tokens into the
  codebook space; scaled inner product against the codebook; pad-mask zeroing;
  temperature division; pooling over tokens (max/mean/sum); sparsemax (or
  softmax/sigmoid) normalisation; output = attention-weighted codebook sum,
- dual logit scales (``logit_scale``/``logit_scale_sd``, both ln(1/0.07)).

The FDT temperature is a *call argument* (traced scalar), so the solver's
T-decay schedule (reference ``train_solver.py:353-364``) changes it without
recompilation — the reference mutates a Python attribute instead.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import LOGIT_SCALE_INIT, LOGIT_SCALE_MAX, constant_init, l2_normalize
from .initializers import torch_bias_uniform, torch_kaiming_uniform
from .layers import LayerNorm
from .sparsemax import sparsemax, sparsemax_bisect
from .text import TextConfig, TextTransformer
from .vit import VisionConfig, VisionTransformer


@dataclass(frozen=True)
class FDTConfig:
    sd_num: int = 4096
    sd_dim: int = 512
    raw_img_ft_dim: int = 768
    raw_txt_ft_dim: int = 512
    att_func_type: str = "sparsemax"  # sparsemax | softmax | sigmoid
    pool_type: str = "max"  # max | mean | sum
    sd_temperature: float = 1000.0
    sparsemax_method: str = "sort"  # sort | bisect
    use_fused_kernel: bool = False  # Pallas fused codebook attention


class QueryModel(nn.Module):
    """Token -> codebook attention head (reference ``Query_model``)."""

    ft_dim: int
    sd_dim: int
    att_func_type: str = "sparsemax"
    pool_type: str = "max"
    sparsemax_method: str = "sort"
    use_fused_kernel: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.ln_1 = LayerNorm(dtype=self.dtype, name="ln_1")
        self.fc_1 = nn.Dense(
            self.sd_dim,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(self.ft_dim),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc_1",
        )
        self.ln_2 = LayerNorm(dtype=self.dtype, name="ln_2")
        self.fc_2 = nn.Dense(
            self.sd_dim,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(self.sd_dim),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc_2",
        )

    def q_map(self, ft):
        """The LN->Linear->GELU->LN->Linear query projection
        (reference ``clip_fdt.py:86-92``; exact-erf GELU like torch)."""
        h = self.ln_1(ft.astype(self.dtype))
        h = self.fc_1(h)
        h = jax.nn.gelu(h, approximate=False)
        h = self.ln_2(h)
        return self.fc_2(h)

    def __call__(self, ft, sd, mask=None, temperature=1.0, return_token_att=False):
        """ft: [B, T, ft_dim] tokens; sd: [sd_num, sd_dim] codebook;
        mask: [B, T] additive pad mask (0 real / -inf pad) or None.
        Returns (att_weight, att_ft); with ``return_token_att`` the first
        element is the raw token attention (for the codebook visualizer).
        """
        q = self.q_map(ft)

        if self.use_fused_kernel and not return_token_att and self.att_func_type == "sparsemax":
            from ..ops.codebook_attention import fused_codebook_attention

            keep = None if mask is None else (mask == 0)
            att_weight, att_ft = fused_codebook_attention(
                q, sd, keep_mask=keep, temperature=temperature, pool_type=self.pool_type
            )
            return att_weight, att_ft

        # [B, T, sd_num] inner products on the MXU.
        inner = jnp.einsum(
            "btd,nd->btn", q, sd.astype(self.dtype), preferred_element_type=jnp.float32
        )
        token_att = inner
        inner = inner / jnp.sqrt(jnp.float32(self.sd_dim))

        if mask is not None:
            keep = (mask == 0).astype(inner.dtype)[..., None]  # 1 real, 0 pad
            inner = inner * keep
            token_att = inner

        inner = inner / temperature

        if self.pool_type == "sum":
            pooled = jnp.sum(inner, axis=1)
        elif self.pool_type == "mean":
            pooled = jnp.mean(inner, axis=1)
        else:
            pooled = jnp.max(inner, axis=1)

        if self.att_func_type == "softmax":
            att_weight = jax.nn.softmax(pooled, axis=-1)
        elif self.att_func_type == "sparsemax":
            if self.sparsemax_method == "bisect":
                att_weight = sparsemax_bisect(pooled)
            else:
                att_weight = sparsemax(pooled)
        else:
            att_weight = jax.nn.sigmoid(pooled)

        att_ft = jnp.einsum(
            "bn,nd->bd",
            att_weight.astype(self.dtype),
            sd.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.att_func_type == "sigmoid":
            att_ft = att_ft / jnp.sum(att_weight, axis=-1, keepdims=True)

        if return_token_att:
            return token_att, att_ft
        return att_weight, att_ft


class CLIPFDT(nn.Module):
    vision_cfg: VisionConfig
    text_cfg: TextConfig
    fdt_cfg: FDTConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.fdt_cfg
        from .clip import build_vision_tower

        self.visual = build_vision_tower(self.vision_cfg, self.dtype)
        self.text = TextTransformer(self.text_cfg, dtype=self.dtype, name="text")
        self.space_dict = self.param(
            "space_dict", nn.initializers.normal(stddev=1.0), (cfg.sd_num, cfg.sd_dim)
        )
        qm_kw = dict(
            sd_dim=cfg.sd_dim,
            att_func_type=cfg.att_func_type,
            pool_type=cfg.pool_type,
            sparsemax_method=cfg.sparsemax_method,
            use_fused_kernel=cfg.use_fused_kernel,
            dtype=self.dtype,
        )
        self.img_query = QueryModel(ft_dim=cfg.raw_img_ft_dim, name="img_query", **qm_kw)
        self.txt_query = QueryModel(ft_dim=cfg.raw_txt_ft_dim, name="txt_query", **qm_kw)
        self.logit_scale = self.param("logit_scale", constant_init(LOGIT_SCALE_INIT), (1,))
        self.logit_scale_sd = self.param(
            "logit_scale_sd", constant_init(LOGIT_SCALE_INIT), (1,)
        )

    # -- feature extraction (reference ``extract_*`` API) -------------------
    def extract_img_sd_ft(self, images, temperature=None, return_token_att=False):
        """Reference ``clip_fdt.py:324-338``."""
        t = self.fdt_cfg.sd_temperature if temperature is None else temperature
        patches = self.visual(images)["patches"]
        return self.img_query(
            patches, self.space_dict, temperature=t, return_token_att=return_token_att
        )

    def extract_txt_sd_ft(self, tokens, pad_mask, temperature=None, return_token_att=False):
        """Reference ``clip_fdt.py:367-376``."""
        t = self.fdt_cfg.sd_temperature if temperature is None else temperature
        words = self.text(tokens, pad_mask)["words"]
        return self.txt_query(
            words, self.space_dict, mask=pad_mask, temperature=t,
            return_token_att=return_token_att,
        )

    def extract_patch_ft(self, images):
        """Query-projected patch tokens (reference ``clip_fdt.py:341-354``)."""
        patches = self.visual(images)["patches"]
        return self.img_query.q_map(patches)

    def extract_word_ft(self, tokens, pad_mask):
        """Query-projected word tokens (reference ``clip_fdt.py:357-365``)."""
        words = self.text(tokens, pad_mask)["words"]
        return self.txt_query.q_map(words), pad_mask

    def __call__(self, images, tokens, pad_mask=None, sd_temperature=None):
        t = self.fdt_cfg.sd_temperature if sd_temperature is None else sd_temperature

        patches = self.visual(images)["patches"]
        words = self.text(tokens, pad_mask)["words"]

        img_att, sd_img_ft = self.img_query(patches, self.space_dict, temperature=t)
        txt_att, sd_txt_ft = self.txt_query(
            words, self.space_dict, mask=pad_mask, temperature=t
        )

        sd_img_ft = l2_normalize(sd_img_ft.astype(jnp.float32), eps=1e-10)
        sd_txt_ft = l2_normalize(sd_txt_ft.astype(jnp.float32), eps=1e-10)

        scale = jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)
        return {
            "image_embed": sd_img_ft,
            "text_embed": sd_txt_ft,
            "logit_scale": scale,
            "img_att": img_att,
            "txt_att": txt_att,
        }
