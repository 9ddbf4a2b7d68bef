"""Text transformer tower (CLIP-style).

Parity target: reference ``prototype/model/text_encoder/text_transformer.py``
(`Transformer` backend only; the Bert/GPT2/Roberta branches are dead code
behind hardcoded cluster paths, see SURVEY.md §2.1): 77-token causal-masked
transformer, token embedding N(0,.02), positional embedding N(0,.01), EOT
pooling via ``argmax`` over token ids (``text_transformer.py:248``), linear
``text_projection`` (a Linear *with bias*, unlike OpenAI CLIP's matrix).

Tokenization happens in the data pipeline (``data/tokenizer.py``), NOT inside
``__call__`` — the reference tokenizes inside ``forward`` which cannot be
traced.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .initializers import scaled_normal, torch_bias_uniform
from .layers import LayerNorm, Transformer


@dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49409
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    positional_embedding: bool = True
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


class TextTransformer(nn.Module):
    cfg: TextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, pad_mask: jnp.ndarray | None = None,
                 return_attn: bool = False):
        """tokens: int32 [B, ctx]; pad_mask: float32 [B, ctx] (0 real / -inf pad).

        Returns dict with ``embed`` [B, E] (projected EOT feature), ``words``
        [B, ctx, W] (post-ln_final token features, the reference's
        ``words_feat``), ``pooled_raw`` [B, W] (EOT feature before projection)
        and ``pad_mask`` passed through.  ``return_attn`` adds
        ``attn_weights`` [L, B, ctx, ctx] — per-layer head-averaged attention
        probs (the reference ``text_transformer_auxilary`` hook surface).
        """
        cfg = self.cfg
        emb = nn.Embed(
            num_embeddings=cfg.vocab_size,
            features=cfg.width,
            embedding_init=scaled_normal(0.02),
            param_dtype=jnp.float32,
            name="token_embedding",
        )(tokens).astype(self.dtype)

        if cfg.positional_embedding:
            pos = self.param(
                "positional_embedding", scaled_normal(0.01), (cfg.context_length, cfg.width)
            )
            # Tokens may arrive at a shorter static context than the param
            # table (context-length bucketing, data/pipeline.py): causal
            # masking + EOT/pad-masked pooling make the first-S slice
            # mathematically exact vs the full-77 run for captions that fit
            # (fp-equal up to XLA reduction-order reassociation).
            emb = emb + pos[: emb.shape[1]].astype(self.dtype)

        x = Transformer(
            width=cfg.width,
            layers=cfg.layers,
            heads=cfg.heads,
            causal=True,
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
        )(emb, return_attn_weights=return_attn)
        attn = None
        if return_attn:
            x, _, attn = x
        words = LayerNorm(dtype=self.dtype, name="ln_final")(x)

        # EOT pooling: eot is the highest token id in each row.
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled_raw = jnp.take_along_axis(words, eot_idx[:, None, None], axis=1)[:, 0, :]

        projection = nn.Dense(
            cfg.embed_dim,
            kernel_init=scaled_normal(cfg.width ** -0.5),
            bias_init=torch_bias_uniform(cfg.width),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="text_projection",
        )
        embed = projection(pooled_raw)
        # projected word tokens for FILIP (reference CLIP.extract_word_ft,
        # clip.py:107-115) — same projection params, per-token
        words_proj = projection(words)

        out = {
            "embed": embed,
            "words": words,
            "words_proj": words_proj,
            "pooled_raw": pooled_raw,
            "pad_mask": pad_mask,
        }
        if return_attn:
            out["attn_weights"] = attn
        return out


# Factories mirroring reference dims (``text_transformer.py:341-368``).
def text_base(embed_dim=512, **kw) -> TextConfig:
    d = dict(width=512, heads=8, layers=12, embed_dim=embed_dim)
    d.update(kw)  # explicit config kwargs override the factory dims
    return TextConfig(**d)


def text_large(embed_dim=768, **kw) -> TextConfig:
    d = dict(width=768, heads=12, layers=12, embed_dim=embed_dim)
    d.update(kw)
    return TextConfig(**d)
