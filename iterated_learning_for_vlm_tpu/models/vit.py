"""Vision transformer tower (CLIP-style).

Parity target: reference ``prototype/model/image_encoder/visual_transformer.py``:
conv patch embed (bias-free, *permanently frozen* per ``freeze_conv1=True``,
lines 12,45-52 — the freeze itself lives in the optimizer masks here, see
``train/optim.py``), class token, learned positional embedding, pre/post LN,
linear projection; ``forward`` returns the projected CLS embedding plus
optionally the dense patch tokens (pre-``ln_post``) and the raw CLS feature.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import scaled_normal, torch_kaiming_uniform
from .layers import LayerNorm, Transformer


@dataclass(frozen=True)
class VisionConfig:
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    remat: bool = False
    use_flash: bool = False
    fused_attn: bool = False
    fused_attn_group: int = 2
    fused_attn_sample_group: int = 2
    fused_attn_bwd_fuse3: bool = False
    fused_attn_group_bwd: int | None = None
    fused_attn_sample_group_bwd: int | None = None
    attn_layout: str = "bhqk"
    unroll: bool = False


class FrozenPatchEmbed(nn.Module):
    """Bias-free conv patch embed whose kernel is PERMANENTLY frozen
    (reference ``visual_transformer.py:12,45-52`` — ``freeze_conv1=True`` in
    every factory).  ``stop_gradient`` on the kernel makes XLA skip the
    weight-grad matmul entirely instead of computing a gradient the optimizer
    mask then discards.  Param path stays ``conv1/kernel`` for checkpoint
    parity (plain module, no flax transform — ``nn.map_variables`` breaks on
    re-entrant calls from two-view models like DECLIP-FDT)."""
    features: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        kernel = self.param(
            "kernel", torch_kaiming_uniform(), (p, p, x.shape[-1], self.features),
            jnp.float32,
        )
        kernel = jax.lax.stop_gradient(kernel).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class VisionTransformer(nn.Module):
    cfg: VisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, return_attn: bool = False):
        """images: [B, H, W, 3] (NHWC, TPU-native layout).

        Returns dict with ``embed`` [B, E], ``patches`` [B, grid^2, W] (dense
        tokens before ln_post), ``pooled_raw`` [B, W] (CLS after ln_post).

        ``return_attn`` adds ``attn_weights`` [L, B, S, S] (per-layer
        head-averaged attention probs) and ``cls_attn`` [L, B, S] (the CLS
        query row — the reference ``*_auxilary`` variants' ``att[:, 0]``
        surface, ``visual_transformer_auxilary.py:55,76``).
        """
        cfg = self.cfg
        scale = cfg.width ** -0.5

        x = FrozenPatchEmbed(
            features=cfg.width, patch_size=cfg.patch_size, dtype=self.dtype,
            name="conv1",
        )(images.astype(self.dtype))
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)

        cls = self.param("class_embedding", scaled_normal(scale), (cfg.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, w)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            scaled_normal(0.01),
            ((cfg.input_resolution // cfg.patch_size) ** 2 + 1, cfg.width),
        )
        x = x + pos.astype(self.dtype)
        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)

        x = Transformer(
            width=cfg.width,
            layers=cfg.layers,
            heads=cfg.heads,
            causal=False,
            remat=cfg.remat,
            unroll=cfg.unroll,
            dtype=self.dtype,
            use_flash=cfg.use_flash,
            fused_attn=cfg.fused_attn,
            fused_attn_group=cfg.fused_attn_group,
            fused_attn_sample_group=cfg.fused_attn_sample_group,
            fused_attn_bwd_fuse3=cfg.fused_attn_bwd_fuse3,
            fused_attn_group_bwd=cfg.fused_attn_group_bwd,
            fused_attn_sample_group_bwd=cfg.fused_attn_sample_group_bwd,
            attn_layout=cfg.attn_layout,
            name="transformer",
        )(x, return_attn_weights=return_attn)
        attn = None
        if return_attn:
            x, _, attn = x

        patches = x[:, 1:, :]
        # ln_post over all tokens (per-token op): row 0 is the reference's
        # CLS path; rows 1.. give the projected patch tokens used by FILIP
        # (reference CLIP.extract_patch_ft, clip.py:98-105).
        ln_all = LayerNorm(dtype=self.dtype, name="ln_post")(x)
        pooled_raw = ln_all[:, 0, :]
        proj = self.param("proj", scaled_normal(scale), (cfg.width, cfg.embed_dim))
        embed = pooled_raw @ proj.astype(self.dtype)
        patches_proj = ln_all[:, 1:, :] @ proj.astype(self.dtype)
        out = {"embed": embed, "patches": patches, "pooled_raw": pooled_raw,
               "patches_proj": patches_proj}
        if return_attn:
            out["attn_weights"] = attn
            out["cls_attn"] = attn[:, :, 0, :]
        return out


# Factory configs mirroring the reference factory dims
# (``visual_transformer.py:97-168``).
def _cfg(defaults: dict, kw: dict) -> VisionConfig:
    # explicit config kwargs override the factory dims (tiny CPU-cluster
    # smokes, ablations) — same pattern as the Swin factories
    defaults.update(kw)
    return VisionConfig(**defaults)


def vit_b32(embed_dim=512, **kw) -> VisionConfig:
    return _cfg(dict(patch_size=32, width=768, layers=12, heads=12,
                     embed_dim=embed_dim), kw)


def vit_b16(embed_dim=512, **kw) -> VisionConfig:
    return _cfg(dict(patch_size=16, width=768, layers=12, heads=12,
                     embed_dim=embed_dim), kw)


def vit_l14(embed_dim=768, **kw) -> VisionConfig:
    return _cfg(dict(patch_size=14, width=1024, layers=24, heads=16,
                     embed_dim=embed_dim), kw)


def vit_l16(embed_dim=768, **kw) -> VisionConfig:
    return _cfg(dict(patch_size=16, width=1024, layers=24, heads=16,
                     embed_dim=embed_dim), kw)
