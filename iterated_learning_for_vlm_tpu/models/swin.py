"""Swin Transformer image tower (v1 + v2), compact flax implementation.

Parity target: reference ``prototype/model/swin/`` (vendored Microsoft Swin,
3595 LoC + 40 YAML configs) as consumed by the CLIP factories ``clip_swinL``,
``clip_swinL_v2``, ``clip_swinB_v2`` and ``clip_fdt_swinB_v2``
(``clip.py:254-297``, ``clip_fdt.py:476-489``): 4-stage hierarchy with
windowed attention, shifted windows on odd blocks, patch-merging downsample,
and for CLIP use a final pooled feature + dense patch tokens.

v1: pre-norm blocks, scaled dot-product window attention with a learned
relative-position-bias table.  v2: post-norm ("res-post-norm") blocks, cosine
attention with a learnable logit scale (clamped at ln(100)) and log-spaced
continuous position bias (2-layer MLP on log-scaled relative coords).

TPU notes: window partitioning is pure reshape/transpose (static shapes);
attention over 49-token windows batches all windows into one einsum per
block, which XLA maps straight onto the MXU.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import scaled_normal, torch_kaiming_uniform
from .layers import LayerNorm


@dataclass(frozen=True)
class SwinConfig:
    input_resolution: int = 224
    patch_size: int = 4
    window_size: int = 7
    embed_dim: int = 128  # stage-0 channels (B=128, L=192)
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    v2: bool = True
    output_dim: int = 512  # CLIP projection dim
    remat: bool = False


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, h, w):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_coords(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    return rel.transpose(1, 2, 0)  # [N, N, 2]


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window_size: int
    v2: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        nw, n, c = x.shape  # [num_windows*B, tokens, C]
        h = self.heads
        head_dim = c // h

        qkv = nn.Dense(3 * c, use_bias=True, kernel_init=torch_kaiming_uniform(),
                       dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(nw, n, h, head_dim)
        k = k.reshape(nw, n, h, head_dim)
        v = v.reshape(nw, n, h, head_dim)

        rel = _relative_coords(self.window_size)  # [N, N, 2]
        if self.v2:
            # cosine attention + learnable per-head logit scale (<= ln 100)
            qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
            attn = jnp.einsum("wqhc,wkhc->whqk", qn, kn,
                              preferred_element_type=jnp.float32)
            logit_scale = self.param(
                "logit_scale",
                lambda key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
                (h, 1, 1),
            )
            attn = attn * jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))
            # log-spaced continuous position bias MLP
            log_rel = np.sign(rel) * np.log1p(np.abs(rel)) / np.log(8.0)
            log_rel = jnp.asarray(log_rel, jnp.float32)
            cpb = nn.Dense(512, name="cpb_fc1", param_dtype=jnp.float32)(log_rel)
            cpb = nn.relu(cpb)
            cpb = nn.Dense(h, use_bias=False, name="cpb_fc2",
                           param_dtype=jnp.float32)(cpb)  # [N, N, H]
            bias = 16.0 * jax.nn.sigmoid(cpb).transpose(2, 0, 1)  # [H, N, N]
        else:
            attn = jnp.einsum("wqhc,wkhc->whqk", q, k,
                              preferred_element_type=jnp.float32) * head_dim ** -0.5
            table = self.param(
                "relative_position_bias_table", scaled_normal(0.02),
                ((2 * self.window_size - 1) ** 2, h),
            )
            idx = (rel[..., 0] + self.window_size - 1) * (2 * self.window_size - 1) + (
                rel[..., 1] + self.window_size - 1
            )
            bias = table[jnp.asarray(idx)].transpose(2, 0, 1)  # [H, N, N]

        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:  # [num_windows, N, N] additive (shifted windows)
            nw_per_img = mask.shape[0]
            attn = attn.reshape(-1, nw_per_img, h, n, n) + mask[None, :, None]
            attn = attn.reshape(nw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whqk,wkhc->wqhc", attn, v).reshape(nw, n, c)
        return nn.Dense(c, kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    resolution: int
    window_size: int
    shift: int
    mlp_ratio: float
    v2: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        b, l, c = x.shape
        hw = self.resolution
        ws = min(self.window_size, hw)
        shift = self.shift if ws < hw else 0

        def attn_part(x):
            img = x.reshape(b, hw, hw, c)
            if shift > 0:
                img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
            wins = _window_partition(img, ws)
            mask = self._shift_mask(hw, ws, shift) if shift > 0 else None
            wins = WindowAttention(self.dim, self.heads, ws, self.v2,
                                   dtype=self.dtype, name="attn")(wins, mask)
            img = _window_reverse(wins, ws, hw, hw)
            if shift > 0:
                img = jnp.roll(img, (shift, shift), axis=(1, 2))
            return img.reshape(b, l, c)

        def mlp_part(x):
            hdim = int(self.dim * self.mlp_ratio)
            hmid = nn.Dense(hdim, kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                            param_dtype=jnp.float32, name="mlp_fc1")(x)
            hmid = nn.gelu(hmid, approximate=False)
            return nn.Dense(self.dim, kernel_init=torch_kaiming_uniform(),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="mlp_fc2")(hmid)

        if self.v2:  # res-post-norm
            x = x + LayerNorm(dtype=self.dtype, name="norm1")(attn_part(x))
            x = x + LayerNorm(dtype=self.dtype, name="norm2")(mlp_part(x))
        else:  # pre-norm
            x = x + attn_part(LayerNorm(dtype=self.dtype, name="norm1")(x))
            x = x + mlp_part(LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x, None

    def _shift_mask(self, hw, ws, shift):
        img_mask = np.zeros((1, hw, hw, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
        wins = _window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
        diff = wins[:, None, :] - wins[:, :, None]
        return jnp.where(diff != 0, -100.0, 0.0)


class PatchMerging(nn.Module):
    dim: int
    resolution: int
    v2: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        hw = self.resolution
        img = x.reshape(b, hw // 2, 2, hw // 2, 2, c)
        img = img.transpose(0, 1, 3, 4, 2, 5).reshape(b, (hw // 2) ** 2, 4 * c)
        if self.v2:  # v2: reduction then norm
            out = nn.Dense(2 * c, use_bias=False, kernel_init=torch_kaiming_uniform(),
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="reduction")(img)
            return LayerNorm(dtype=self.dtype, name="norm")(out)
        img = LayerNorm(dtype=self.dtype, name="norm")(img)
        return nn.Dense(2 * c, use_bias=False, kernel_init=torch_kaiming_uniform(),
                        dtype=self.dtype, param_dtype=jnp.float32, name="reduction")(img)


class SwinTransformer(nn.Module):
    cfg: SwinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(images.astype(self.dtype))
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        res = h
        dim = cfg.embed_dim
        for stage, depth in enumerate(cfg.depths):
            for blk in range(depth):
                x, _ = SwinBlock(
                    dim=dim, heads=cfg.num_heads[stage], resolution=res,
                    window_size=cfg.window_size,
                    shift=0 if blk % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, v2=cfg.v2, dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(dim=dim, resolution=res, v2=cfg.v2,
                                 dtype=self.dtype, name=f"merge{stage}")(x)
                res //= 2
                dim *= 2

        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        patches = x  # [B, res^2, C_final] dense tokens for FDT
        pooled = x.mean(axis=1)
        proj = self.param("proj", scaled_normal(dim ** -0.5), (dim, cfg.output_dim))
        embed = pooled @ proj.astype(self.dtype)
        return {"embed": embed, "patches": patches, "pooled_raw": pooled}


# factories matching the reference swin configs
def swin_b_v2(embed_dim=512, **kw) -> SwinConfig:
    return SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                      v2=True, output_dim=embed_dim)


def swin_l(embed_dim=768, **kw) -> SwinConfig:
    return SwinConfig(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                      v2=False, output_dim=embed_dim)


def swin_l_v2(embed_dim=768, **kw) -> SwinConfig:
    return SwinConfig(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                      v2=True, output_dim=embed_dim)
