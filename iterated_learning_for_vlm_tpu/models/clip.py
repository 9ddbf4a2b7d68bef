"""CLIP dual-encoder model.

Parity target: reference ``prototype/model/clip.py:46-149`` — dual encoder,
L2-normalised embeddings (text norm gets +1e-10, image does not, matching
``clip.py:133-134``), learnable ``logit_scale`` initialised to ``ln(1/0.07)``
with its exponential clamped to <=100.

TPU-first difference: the model returns *local* embeddings + the clamped
scale; the global-batch all-gather and the BxB_global logits live in the loss
(``train/loss.py``) where XLA's SPMD partitioner turns plain matmuls over
sharded arrays into the reference's ``AllGather`` trick (``clip.py:22-42``)
automatically — no hand-written autograd Function, no comm layer.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from typing import Any

from .text import TextConfig, TextTransformer
from .vit import VisionConfig, VisionTransformer

LOGIT_SCALE_INIT = float(np.log(1.0 / 0.07))
LOGIT_SCALE_MAX = 100.0


def constant_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def l2_normalize(x, eps: float = 0.0):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def build_vision_tower(cfg, dtype):
    """Dispatch the image encoder by config type (ViT / ResNet / Swin)."""
    from .resnet import ModifiedResNet, ResNetConfig
    from .swin import SwinConfig, SwinTransformer

    if isinstance(cfg, ResNetConfig):
        return ModifiedResNet(cfg, dtype=dtype, name="visual")
    if isinstance(cfg, SwinConfig):
        return SwinTransformer(cfg, dtype=dtype, name="visual")
    return VisionTransformer(cfg, dtype=dtype, name="visual")


class CLIP(nn.Module):
    vision_cfg: VisionConfig
    text_cfg: TextConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = build_vision_tower(self.vision_cfg, self.dtype)
        self.text = TextTransformer(self.text_cfg, dtype=self.dtype, name="text")
        self.logit_scale = self.param("logit_scale", constant_init(LOGIT_SCALE_INIT), (1,))

    def encode_image(self, images, train: bool = False):
        out = self._visual(images, train)
        return out["embed"]

    def _visual(self, images, train: bool = False):
        """Call the tower; only BN towers (ResNet) take the train flag."""
        from .resnet import ResNetConfig

        if isinstance(self.vision_cfg, ResNetConfig):
            return self.visual(images, train=train)
        return self.visual(images)

    def encode_text(self, tokens, pad_mask=None):
        return self.text(tokens, pad_mask)["embed"]

    def extract_patch_ft(self, images):
        """Projected patch tokens (reference ``CLIP.extract_patch_ft``,
        clip.py:98-105): ln_post + proj applied per patch token."""
        return self.visual(images)["patches_proj"]

    def extract_word_ft(self, tokens, pad_mask=None):
        """Projected word tokens + pad mask (reference
        ``CLIP.extract_word_ft``, clip.py:107-115)."""
        out = self.text(tokens, pad_mask)
        return out["words_proj"], pad_mask

    def __call__(self, images, tokens, pad_mask=None, train: bool = False):
        vis_out = self._visual(images, train)
        image_features = vis_out["embed"]
        text_features = self.encode_text(tokens, pad_mask)

        image_features = l2_normalize(image_features.astype(jnp.float32))
        text_features = l2_normalize(text_features.astype(jnp.float32), eps=1e-10)

        scale = jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)
        out = {
            "image_embed": image_features,
            "text_embed": text_features,
            "logit_scale": scale,
        }
        if "moe_aux" in vis_out:  # Swin-MoE load-balancing loss term
            out["moe_aux"] = vis_out["moe_aux"]
        return out
