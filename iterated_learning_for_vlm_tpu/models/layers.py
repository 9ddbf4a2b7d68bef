"""Transformer primitives (TPU-first redesign of the reference towers).

Behavioral parity targets (reference ``prototype/model/image_encoder/
base_transformer.py`` and ``text_encoder/base_transformer.py``):

- ``QuickGELU``: ``x * sigmoid(1.702 x)``.
- ``ResidualAttentionBlock``: pre-LN multi-head attention with a *packed* QKV
  projection (torch ``nn.MultiheadAttention`` layout) + pre-LN 4x MLP.
- ``Transformer``: a stack of identical blocks; here implemented with
  ``flax.linen.scan`` so XLA compiles ONE block and loops it (fast compiles,
  layer-stacked parameters), with optional rematerialisation replacing the
  reference's unused ``checkpoint_sequential`` flag.

TPU-first differences from the reference:
- batch-first ``[B, S, D]`` layout (no LND permutes),
- attention softmax accumulated in fp32, activations in a configurable
  compute dtype (bf16 for MXU throughput),
- the causal mask is folded into the attention logits via a static bias, and
- an optional fused Pallas attention path (``ops.flash_attention``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import scaled_normal, torch_bias_uniform, torch_kaiming_uniform

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return y.astype(self.dtype)


class PackedInProj(nn.Module):
    """The packed ``[D, 3D]`` QKV projection with a detachable bias add.

    Param tree (``kernel``/``bias``, fp32) is identical to the ``nn.Dense``
    it replaces, so checkpoints and the torch converter are unaffected.  With
    ``add_bias=False`` it returns the PRE-bias product — the fused attention
    kernel absorbs the bias into its VMEM stack stores instead (the separate
    [B, S, 3D] bias-add pass was measured unfused at ~2 ms/step on v5e).
    The fp32 bias param is returned either way.
    """

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, add_bias: bool = True):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xd, kd, bd = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(xd, kd, (((xd.ndim - 1,), (0,)), ((), ())))
        if add_bias:
            y = y + bd
        return y, bias


class MultiheadAttention(nn.Module):
    """Packed-QKV multi-head self-attention (torch ``nn.MultiheadAttention`` layout).

    Keeping q/k/v packed in one ``[D, 3D]`` kernel preserves checkpoint
    compatibility with the reference's ``attn.in_proj_weight`` and feeds the
    MXU one large matmul instead of three small ones.
    """

    num_heads: int
    attn_std: float = 0.02
    proj_std: float = 0.02
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    # Fused tiny-seq attention (ops/fused_attention.py): consumes the packed
    # QKV directly, no head-split transposes, block-diagonal grouped dots.
    # Wins over XLA attention at the CLIP shapes S=50/77, hd=64 (bench).
    fused_attn: bool = False
    fused_attn_group: int = 2
    # samples fused into the same block-diagonal matmul (kernel body is
    # overhead-bound at tiny S; swept on-chip: vision g=2 x sg=2 beats the
    # round-2 g=4 x sg=1 by ~14% per layer fwd+bwd)
    fused_attn_sample_group: int = 2
    # 3-dot backward body (round 5, ops/fused_attention.py:_bwd_kernel_fused3)
    # + optional backward-only (head_group, sample_group) override — the bwd
    # body runs more dots than fwd, so its optimum tiling can differ
    fused_attn_bwd_fuse3: bool = False
    fused_attn_group_bwd: Optional[int] = None
    fused_attn_sample_group_bwd: Optional[int] = None
    # XLA-path score-tensor layout: "bhqk" (canonical) or "bqhk" (head-minor
    # scores — skips the [B,S,H,hd]<->[B,H,S,hd] canonicalization transposes;
    # measured 2.084 -> 1.970 ms/layer fwd+bwd at the text S=77 shape,
    # same-process, tools/attn_microbench.py xla77).  Identical math; the
    # reduction order inside softmax/dots differs by layout only.
    attn_layout: str = "bhqk"

    @nn.compact
    def __call__(self, x, bias: Optional[jnp.ndarray] = None, return_weights: bool = False):
        b, s, d = x.shape
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads

        # The fused kernel is a TINY-seq specialization: whole [bb, S, 3D]
        # blocks + the [g*Sp, g*Sp] group mask live in VMEM.  Past S ~128
        # (ViT-B/16 S=197, L/14 S=257) the blocks outgrow VMEM, so larger
        # towers silently stay on the XLA path even with fused_attn=true.
        use_fused = (self.fused_attn and not return_weights
                     and not self.use_flash and s <= 128)

        qkv, in_bias = PackedInProj(
            3 * d,
            kernel_init=scaled_normal(self.attn_std),
            dtype=self.dtype,
            name="in_proj",
        )(x, add_bias=not use_fused)

        if use_fused:
            from ..ops.fused_attention import fused_tiny_attention

            group = max(1, min(self.fused_attn_group, self.num_heads))
            while self.num_heads % group:
                group -= 1  # largest divisor <= requested, never silently 1
            out = fused_tiny_attention(qkv, self.num_heads, bias=bias,
                                       head_group=group,
                                       sample_group=self.fused_attn_sample_group,
                                       head_group_bwd=self.fused_attn_group_bwd,
                                       sample_group_bwd=self.fused_attn_sample_group_bwd,
                                       bwd_fuse3=self.fused_attn_bwd_fuse3,
                                       qkv_bias=in_bias.astype(qkv.dtype))
            return self._project_out(out, d), None

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)

        if self.use_flash and not return_weights:
            from ..ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, bias=bias)
            weights = None
        elif self.attn_layout == "bqhk" and not return_weights:
            scale = head_dim ** -0.5
            logits = jnp.einsum("bqhc,bkhc->bqhk", q, k,
                                preferred_element_type=jnp.float32) * scale
            if bias is not None:
                logits = logits + bias.astype(jnp.float32)[:, None, :]
            weights = None
            out = jnp.einsum("bqhk,bkhc->bqhc",
                             jax.nn.softmax(logits, axis=-1).astype(self.dtype), v)
        else:
            scale = head_dim ** -0.5
            logits = jnp.einsum("bqhc,bkhc->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits * scale
            if bias is not None:
                logits = logits + bias.astype(jnp.float32)
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhc->bqhc", weights.astype(self.dtype), v)

        out = self._project_out(out.reshape(b, s, d), d)
        if return_weights:
            # torch MHA returns weights averaged over heads by default.
            return out, weights.mean(axis=1)
        return out, None

    def _project_out(self, out, d):
        return nn.Dense(
            d,
            kernel_init=scaled_normal(self.proj_std),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out_proj",
        )(out)


class MLP(nn.Module):
    """The 4x QuickGELU MLP (reference ``base_transformer.py:35-41``)."""

    width: int
    fc_std: float
    proj_std: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            4 * self.width,
            kernel_init=scaled_normal(self.fc_std),
            bias_init=torch_bias_uniform(self.width),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="c_fc",
        )(x)
        h = quick_gelu(h)
        return nn.Dense(
            self.width,
            kernel_init=scaled_normal(self.proj_std),
            bias_init=torch_bias_uniform(4 * self.width),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="c_proj",
        )(h)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    attn_std: float
    proj_std: float
    fc_std: float
    causal: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    fused_attn: bool = False
    fused_attn_group: int = 2
    fused_attn_sample_group: int = 2
    fused_attn_bwd_fuse3: bool = False
    fused_attn_group_bwd: Optional[int] = None
    fused_attn_sample_group_bwd: Optional[int] = None
    attn_layout: str = "bhqk"
    collect_hidden: bool = False
    collect_attn: bool = False

    @nn.compact
    def __call__(self, x, _=None):
        bias = None
        if self.causal:
            s = x.shape[1]
            bias = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        attn_out, w = MultiheadAttention(
            num_heads=self.heads,
            attn_std=self.attn_std,
            proj_std=self.proj_std,
            dtype=self.dtype,
            use_flash=self.use_flash,
            fused_attn=self.fused_attn,
            fused_attn_group=self.fused_attn_group,
            fused_attn_sample_group=self.fused_attn_sample_group,
            fused_attn_bwd_fuse3=self.fused_attn_bwd_fuse3,
            fused_attn_group_bwd=self.fused_attn_group_bwd,
            fused_attn_sample_group_bwd=self.fused_attn_sample_group_bwd,
            attn_layout=self.attn_layout,
            name="attn",
        )(LayerNorm(dtype=self.dtype, name="ln_1")(x), bias=bias,
          return_weights=self.collect_attn)
        x = x + attn_out
        x = x + MLP(
            width=self.width,
            fc_std=self.fc_std,
            proj_std=self.proj_std,
            dtype=self.dtype,
            name="mlp",
        )(LayerNorm(dtype=self.dtype, name="ln_2")(x))
        return x, (x if self.collect_hidden else None,
                   w if self.collect_attn else None)


class Transformer(nn.Module):
    """Scanned stack of residual attention blocks.

    CLIP init schedule (reference ``visual_transformer.py:28-38``):
      ``attn_std = width**-0.5``; ``proj_std = width**-0.5 * (2*layers)**-0.5``;
      ``fc_std = (2*width)**-0.5``.
    """

    width: int
    layers: int
    heads: int
    causal: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    fused_attn: bool = False
    fused_attn_group: int = 2
    fused_attn_sample_group: int = 2
    fused_attn_bwd_fuse3: bool = False
    fused_attn_group_bwd: Optional[int] = None
    fused_attn_sample_group_bwd: Optional[int] = None
    attn_layout: str = "bhqk"
    # Unroll the layer loop at trace time (params stay stacked [L, ...], so
    # checkpoints are unchanged).  Costs compile time; lets the XLA scheduler
    # specialize/pipeline across layers instead of a while-loop body.
    unroll: bool = False

    @nn.compact
    def __call__(self, x, return_hidden_states: bool = False,
                 return_attn_weights: bool = False):
        """``return_hidden_states`` also returns the per-layer outputs
        stacked as [L, B, S, D] (reference ``Transformer_module_list`` /
        the ``*_inter`` encoder variants, SURVEY §2.1).

        ``return_attn_weights`` also returns per-layer head-averaged attention
        probabilities stacked as [L, B, S, S] — the capability behind the
        reference's ``*_auxilary`` encoder variants, whose vendored MHA
        exposes attention probs via forward hooks for interpretability
        tooling (``image_encoder/auxilary.py``; the committed aux forward's
        ``att`` return is stale — it yields the hidden state, so true probs
        were only reachable through the hooks).  When set, the call returns
        the triple ``(x, hidden_or_None, attn)``."""
        attn_std = self.width ** -0.5
        proj_std = (self.width ** -0.5) * ((2 * self.layers) ** -0.5)
        fc_std = (2 * self.width) ** -0.5

        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False, static_argnums=())

        ScannedBlock = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.layers,
            unroll=self.layers if self.unroll else 1,
            metadata_params={nn.PARTITION_NAME: None},
        )
        x, (hidden, attn) = ScannedBlock(
            width=self.width,
            heads=self.heads,
            attn_std=attn_std,
            proj_std=proj_std,
            fc_std=fc_std,
            causal=self.causal,
            dtype=self.dtype,
            use_flash=self.use_flash,
            fused_attn=self.fused_attn,
            fused_attn_group=self.fused_attn_group,
            fused_attn_sample_group=self.fused_attn_sample_group,
            fused_attn_bwd_fuse3=self.fused_attn_bwd_fuse3,
            fused_attn_group_bwd=self.fused_attn_group_bwd,
            fused_attn_sample_group_bwd=self.fused_attn_sample_group_bwd,
            attn_layout=self.attn_layout,
            collect_hidden=return_hidden_states,
            collect_attn=return_attn_weights,
            name="resblocks",
        )(x, None)
        if return_attn_weights:
            return x, hidden, attn
        if return_hidden_states:
            return x, hidden
        return x
