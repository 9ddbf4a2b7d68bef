"""ModifiedResNet image tower (CLIP RN50/RN101).

Parity target: reference ``prototype/model/image_encoder/modified_resnet.py``:
- 3-conv stem (each conv->BN->ReLU) followed by avgpool,
- anti-aliased Bottlenecks: stride-2 is an avgpool BEFORE the 1x1 conv3 and
  in the downsample branch (``Bottleneck``, lines 18-62),
- final ``AttentionPool2d``: mean-token query attention over the spatial grid
  with separate q/k/v projections and learned positional embedding
  (lines 64-100).

BatchNorm: flax ``nn.BatchNorm`` with a ``batch_stats`` collection.  Training
this tower requires threading ``mutable=["batch_stats"]`` through
``model.apply`` (the ViT flagship path is stateless); the eval/encode paths
use running averages.  The reference's Sync-BN is a stub
(``prototype/linklink/nn.py:1-9`` aliases BatchNorm1d!), so plain per-host BN
matches shipped behavior.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import scaled_normal, torch_kaiming_uniform
from .layers import Dtype


def _avg_pool(x, window: int, stride: int):
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k, k), use_bias=False, kernel_init=torch_kaiming_uniform(),
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )

        out = nn.relu(bn("bn1")(conv(self.features, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.features, 3, "conv2")(out)))
        if self.stride > 1:  # anti-aliased downsample: avgpool then 1x1
            out = _avg_pool(out, self.stride, self.stride)
        out = bn("bn3")(conv(self.features * 4, 1, "conv3")(out))

        identity = x
        if self.stride > 1 or x.shape[-1] != self.features * 4:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride, self.stride)
            identity = conv(self.features * 4, 1, "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding", scaled_normal(c ** -0.5), (h * w + 1, c)
        )
        tokens = tokens + pos.astype(self.dtype)

        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        q = dense(c, "q_proj")(tokens[:, :1])
        k = dense(c, "k_proj")(tokens)
        v = dense(c, "v_proj")(tokens)

        head_dim = c // self.num_heads
        qh = q.reshape(b, 1, self.num_heads, head_dim)
        kh = k.reshape(b, -1, self.num_heads, head_dim)
        vh = v.reshape(b, -1, self.num_heads, head_dim)
        logits = jnp.einsum("bqhc,bkhc->bhqk", qh, kh) * head_dim ** -0.5
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        pooled = jnp.einsum("bhqk,bkhc->bqhc", p, vh).reshape(b, c)
        return dense(self.output_dim, "c_proj")(pooled)


@dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    input_resolution: int = 224
    embed_dim: int = 1024
    heads: int = 32
    # present to satisfy the shared model interface
    patch_size: int = 32


class ModifiedResNet(nn.Module):
    cfg: ResNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.cfg
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), use_bias=False,
            kernel_init=torch_kaiming_uniform(), dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        x = images.astype(self.dtype)
        x = nn.relu(bn("bn1")(conv(cfg.width // 2, 3, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(cfg.width // 2, 3, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(cfg.width, 3, 1, "conv3")(x)))
        x = _avg_pool(x, 2, 2)

        features = cfg.width
        for stage, blocks in enumerate(cfg.layers):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(features, stride=stride, dtype=self.dtype,
                           name=f"layer{stage + 1}_0")(x, train=train)
            for i in range(1, blocks):
                x = Bottleneck(features, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x, train=train)
            features *= 2

        b, h, w, c = x.shape
        patches = x.reshape(b, h * w, c)
        embed = AttentionPool2d(
            embed_dim=c, num_heads=cfg.heads, output_dim=cfg.embed_dim,
            dtype=self.dtype, name="attnpool",
        )(x)
        return {"embed": embed, "patches": patches, "pooled_raw": embed}


def resnet_r50(embed_dim=1024, **kw) -> ResNetConfig:
    return ResNetConfig(layers=(3, 4, 6, 3), width=64, embed_dim=embed_dim)


def resnet_r101(embed_dim=512, **kw) -> ResNetConfig:
    return ResNetConfig(layers=(3, 4, 23, 3), width=64, embed_dim=embed_dim)
