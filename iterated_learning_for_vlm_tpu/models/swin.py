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
from typing import Any, Optional, Tuple

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
    # Swin-MoE (reference ``swin_transformer_moe.py``, Tutel-backed there):
    # odd blocks of the listed stages swap their MLP for a top-k gated
    # mixture of experts (the alternate-block placement the Swin-MoE
    # configs use).  0 experts = dense everywhere.
    num_experts: int = 0
    moe_stages: Tuple[int, ...] = (2, 3)
    moe_top_k: int = 1
    capacity_factor: float = 1.25
    # Swin-MLP (reference ``swin_mlp.py``): attention-free variant where the
    # window token-mix is a per-head linear map over window positions and the
    # shifted blocks zero-pad instead of roll+mask.
    mlp_mix: bool = False
    # Explicit per-stage MoE block indices (reference MOE_BLOCKS, e.g.
    # ((-1,), (-1,), (1, 3, 5), (1,)) — -1 / absent = dense).  When set it
    # overrides the moe_stages odd-block rule; used by the YAML translator.
    moe_blocks: Optional[Tuple[Tuple[int, ...], ...]] = None


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


class SpatialMLP(nn.Module):
    """Per-head linear token mix over window positions (Swin-MLP).

    Reference ``prototype/model/swin/models/swin_mlp.py:104-141``: a grouped
    Conv1d (kernel 1, groups=num_heads) over ``[nH * ws^2]`` channels — i.e.
    for each head an independent ``[ws^2, ws^2]`` mixing matrix + bias over
    the window's positions, applied to every ``C/nH`` feature lane.  On TPU
    this is one batched einsum per block (maps straight onto the MXU),
    replacing the transpose/reshape/Conv1d dance.
    """
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wins):  # [nW*B, N, C]
        nw, n, c = wins.shape
        h = self.heads
        w = self.param("mix_kernel", torch_kaiming_uniform(),
                       (h, n, n), jnp.float32)
        bias = self.param("mix_bias", nn.initializers.zeros, (h, n), jnp.float32)
        x = wins.reshape(nw, n, h, c // h)
        out = jnp.einsum("hnm,wmhc->wnhc", w.astype(self.dtype), x)
        out = out + bias.T[None, :, :, None].astype(self.dtype)
        return out.reshape(nw, n, c)


class MoEMlp(nn.Module):
    """Top-k gated mixture-of-experts MLP (GShard/Switch formulation).

    TPU-native stand-in for the reference's Tutel-backed ``MoEMlp``
    (``swin_transformer_moe.py:43-93``): fp32 gate, top-k dispatch with a
    static capacity ``ceil(cf * tokens * k / E)`` (XLA needs fixed shapes —
    overflow tokens are dropped, exactly Tutel's capacity semantics), and the
    GShard load-balancing aux loss ``E * sum(me * ce)``.  Dispatch/combine are
    one-hot einsums; expert kernels are stacked ``[E, d, h]`` so an
    expert-parallel mesh axis can shard dim 0 (``parallel/sharding_rules``).

    Memory note: the one-hot formulation materializes ``[T, E, capacity]``
    combine/dispatch tensors — O(cf * T^2 / 1) per MoE block.  Fine for the
    late stages this config places MoE in (T = B * 49/196 tokens); placing
    MoE in stage 0/1 at large batch would want a sort/segment dispatch
    instead (the standard trade — Tutel makes the same one at its
    ``capacity`` path before its custom kernels kick in).
    """
    dim: int
    hidden: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        e, k = self.num_experts, self.top_k
        tokens = x.reshape(b * l, d)
        t = tokens.shape[0]
        capacity = max(k, int(np.ceil(self.capacity_factor * t * k / e)))

        gate_logits = nn.Dense(
            e, use_bias=False, kernel_init=scaled_normal(0.02),
            dtype=jnp.float32, param_dtype=jnp.float32, name="gate",
        )(tokens.astype(jnp.float32))
        probs = jax.nn.softmax(gate_logits, axis=-1)  # [T, E] fp32

        # GShard aux loss on top-1 routing fractions.
        top1 = jnp.argmax(probs, axis=-1)
        ce = jnp.mean(jax.nn.one_hot(top1, e, dtype=jnp.float32), axis=0)
        me = jnp.mean(probs, axis=0)
        aux = e * jnp.sum(me * ce)

        combine = jnp.zeros((t, e, capacity), jnp.float32)
        remaining = probs
        fill = jnp.zeros((e,), jnp.int32)  # slots already used per expert
        for _ in range(k):
            idx = jnp.argmax(remaining, axis=-1)                   # [T]
            gate = jnp.take_along_axis(remaining, idx[:, None], 1)[:, 0]
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)     # [T, E]
            pos = (jnp.cumsum(onehot, axis=0) - 1.0 + fill) * onehot   # [T, E]
            in_cap = (pos < capacity).astype(jnp.float32) * onehot
            pos_oh = jax.nn.one_hot(pos.sum(-1).astype(jnp.int32), capacity,
                                    dtype=jnp.float32)             # [T, C]
            combine = combine + gate[:, None, None] * in_cap[:, :, None] * pos_oh[:, None, :]
            fill = fill + jnp.sum(in_cap, axis=0).astype(jnp.int32)
            remaining = remaining * (1.0 - onehot)

        dispatch = (combine > 0).astype(self.dtype)                # [T, E, C]
        w1 = self.param("w1", torch_kaiming_uniform(), (e, d, self.hidden), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, 1, self.hidden), jnp.float32)
        w2 = self.param("w2", torch_kaiming_uniform(), (e, self.hidden, d), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, 1, d), jnp.float32)

        expert_in = jnp.einsum("tec,td->ecd", dispatch, tokens.astype(self.dtype))
        h = jnp.einsum("ecd,edh->ech", expert_in, w1.astype(self.dtype)) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=False)
        out = jnp.einsum("ech,ehd->ecd", h, w2.astype(self.dtype)) + b2.astype(self.dtype)
        y = jnp.einsum("tec,ecd->td", combine.astype(self.dtype), out)
        return y.reshape(b, l, d), aux


class SwinBlock(nn.Module):
    dim: int
    heads: int
    resolution: int
    window_size: int
    shift: int
    mlp_ratio: float
    v2: bool
    dtype: Any = jnp.float32
    num_experts: int = 0  # >0: MoE MLP (Swin-MoE block)
    moe_top_k: int = 1
    capacity_factor: float = 1.25
    mlp_mix: bool = False  # Swin-MLP token mix instead of window attention

    @nn.compact
    def __call__(self, x, _=None):
        b, l, c = x.shape
        hw = self.resolution
        ws = min(self.window_size, hw)
        shift = self.shift if ws < hw else 0

        def mix_part(x):
            # Swin-MLP: shifted blocks zero-pad by (ws-shift, shift) on both
            # spatial dims instead of roll+mask (swin_mlp.py:122-152).
            img = x.reshape(b, hw, hw, c)
            lead, trail = ws - shift, shift
            if shift > 0:
                img = jnp.pad(img, ((0, 0), (lead, trail), (lead, trail), (0, 0)))
            ph = img.shape[1]
            wins = _window_partition(img, ws)
            wins = SpatialMLP(heads=self.heads, dtype=self.dtype,
                              name="spatial_mlp")(wins)
            img = _window_reverse(wins, ws, ph, ph)
            if shift > 0:
                img = img[:, lead:ph - trail, lead:ph - trail, :]
            return img.reshape(b, l, c)

        def attn_part(x):
            if self.mlp_mix:
                return mix_part(x)
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

        aux = jnp.zeros((), jnp.float32)

        def mlp_part(x):
            nonlocal aux
            hdim = int(self.dim * self.mlp_ratio)
            if self.num_experts > 0:
                y, aux = MoEMlp(dim=self.dim, hidden=hdim,
                                num_experts=self.num_experts,
                                top_k=self.moe_top_k,
                                capacity_factor=self.capacity_factor,
                                dtype=self.dtype, name="moe_mlp")(x)
                return y
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
        return x, aux

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
        moe_aux = jnp.zeros((), jnp.float32)
        for stage, depth in enumerate(cfg.depths):
            for blk in range(depth):
                if cfg.moe_blocks is not None:
                    is_moe = (cfg.num_experts > 0
                              and blk in cfg.moe_blocks[stage])
                else:
                    is_moe = (cfg.num_experts > 0 and stage in cfg.moe_stages
                              and blk % 2 == 1)
                x, aux = SwinBlock(
                    dim=dim, heads=cfg.num_heads[stage], resolution=res,
                    window_size=cfg.window_size,
                    shift=0 if blk % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, v2=cfg.v2, dtype=self.dtype,
                    num_experts=cfg.num_experts if is_moe else 0,
                    moe_top_k=cfg.moe_top_k,
                    capacity_factor=cfg.capacity_factor,
                    mlp_mix=cfg.mlp_mix,
                    name=f"stage{stage}_block{blk}",
                )(x)
                if aux is not None:
                    moe_aux = moe_aux + aux
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
        out = {"embed": embed, "patches": patches, "pooled_raw": pooled}
        if cfg.num_experts > 0:
            out["moe_aux"] = moe_aux  # add to the training loss, GShard-style
        return out


def _override(cfg: SwinConfig, kw) -> SwinConfig:
    """Structural overrides from config kwargs — the reference's Swin YAMLs
    drive the same fields (DEPTHS, NUM_HEADS, WINDOW_SIZE, IMG_SIZE, ...).
    ``embed_dim``/``output_dim`` keep their factory meaning (CLIP embed dim)."""
    from dataclasses import fields, replace

    valid = {f.name for f in fields(SwinConfig)} - {"embed_dim", "output_dim"}
    over = {k: (tuple(v) if isinstance(v, list) else v)
            for k, v in kw.items() if k in valid}
    return replace(cfg, **over) if over else cfg


# factories matching the reference swin configs
def swin_b_v2(embed_dim=512, **kw) -> SwinConfig:
    return _override(SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                                num_heads=(4, 8, 16, 32),
                                v2=True, output_dim=embed_dim), kw)


def swin_l(embed_dim=768, **kw) -> SwinConfig:
    return _override(SwinConfig(embed_dim=192, depths=(2, 2, 18, 2),
                                num_heads=(6, 12, 24, 48),
                                v2=False, output_dim=embed_dim), kw)


def swin_l_v2(embed_dim=768, **kw) -> SwinConfig:
    return _override(SwinConfig(embed_dim=192, depths=(2, 2, 18, 2),
                                num_heads=(6, 12, 24, 48),
                                v2=True, output_dim=embed_dim), kw)


def swin_mlp_b(embed_dim=512, **kw) -> SwinConfig:
    """Swin-MLP base (reference ``swin_mlp.py`` +
    ``configs/swinmlp/swin_mlp_base_patch4_window7_224.yaml``: embed 128,
    depths (2,2,18,2), heads (4,8,16,32), pre-norm, zero-pad shift)."""
    return _override(SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                                num_heads=(4, 8, 16, 32),
                                v2=False, output_dim=embed_dim, mlp_mix=True), kw)


_YAML_VARIANTS = {
    # MODEL.TYPE -> (variant section key, config flags)
    "swin": ("SWIN", {"v2": False}),
    "swinv2": ("SWINV2", {"v2": True}),
    "swin_moe": ("SWIN_MOE", {"v2": False}),
    "swin_mlp": ("SWIN_MLP", {"v2": False, "mlp_mix": True}),
}


def swin_config_from_yaml(source, embed_dim: int = 512,
                          moe_devices: Optional[int] = None,
                          **kw) -> SwinConfig:
    """Translate a Microsoft-Swin-schema YAML into a :class:`SwinConfig`.

    Covers the reference's vendored config surface —
    ``prototype/model/swin/configs/{swin,swinv2,swinmoe,swinmlp}/*.yaml``
    (40 files), consumed there by ``build.py:14`` + the yacs defaults in
    ``swin/config.py``.  ``source`` is a YAML path or an already-parsed
    mapping.  Architecture fields map 1:1:

    - ``DATA.IMG_SIZE`` -> ``input_resolution``
    - ``MODEL.TYPE`` -> v1/v2/MoE/MLP variant
    - ``MODEL.<VARIANT>.{PATCH_SIZE, EMBED_DIM, DEPTHS, NUM_HEADS,
      WINDOW_SIZE, MLP_RATIO}`` -> same-named fields
    - ``MOE_BLOCKS`` -> ``moe_blocks`` (explicit per-stage expert placement)
    - ``TOP_VALUE`` -> ``moe_top_k``; ``CAPACITY_FACTOR`` -> same
    - ``NUM_LOCAL_EXPERTS``: Tutel semantics — positive = experts per
      device, negative ``-k`` = one expert shared by k devices; total
      experts = ``moe_devices * v`` or ``moe_devices // k`` (defaults to
      ``jax.device_count()``, the SPMD stand-in for the configs' hardcoded
      32-GPU clusters)

    Training-regularization knobs with no architecture effect are accepted
    and ignored: DROP_PATH_RATE / DROP_RATE (stochastic-depth/dropout —
    train-time only), INIT_STD, MOE_DROP, MLP_FC2_BIAS, IS_GSHARD_LOSS,
    COSINE_ROUTER*, NORM_IN_MOE, AUX_LOSS_WEIGHT (ours is a loss-side
    scale), and PRETRAINED_WINDOW_SIZES (finetune-time CPB re-interpolation
    of torch checkpoints).  ``**kw`` applies final SwinConfig overrides.
    """
    if isinstance(source, (str, bytes)) or hasattr(source, "read"):
        import yaml

        with open(source) as f:  # type: ignore[arg-type]
            raw = yaml.safe_load(f)
    else:
        raw = dict(source)
    model = raw.get("MODEL", {})
    mtype = str(model.get("TYPE", "swin")).lower()
    if mtype not in _YAML_VARIANTS:
        raise ValueError(f"unknown Swin MODEL.TYPE {mtype!r} "
                         f"(expected one of {sorted(_YAML_VARIANTS)})")
    section_key, flags = _YAML_VARIANTS[mtype]
    sec = model.get(section_key, {})

    fields: dict = dict(flags, output_dim=embed_dim)
    fields["input_resolution"] = int(raw.get("DATA", {}).get("IMG_SIZE", 224))
    fields["patch_size"] = int(sec.get("PATCH_SIZE", 4))
    fields["embed_dim"] = int(sec.get("EMBED_DIM", 96))
    fields["depths"] = tuple(sec.get("DEPTHS", (2, 2, 6, 2)))
    fields["num_heads"] = tuple(sec.get("NUM_HEADS", (3, 6, 12, 24)))
    fields["window_size"] = int(sec.get("WINDOW_SIZE", 7))
    fields["mlp_ratio"] = float(sec.get("MLP_RATIO", 4.0))

    if mtype == "swin_moe":
        # NUM_LOCAL_EXPERTS is per-device (Tutel semantics), so the resolved
        # expert count depends on the device count: checkpoints are only
        # portable across hosts when ``moe_devices`` is pinned explicitly.
        # The resolved count lands in SwinConfig.num_experts (and therefore
        # in any dumped config); warn when we silently used this host's
        # device count (ADVICE r3: cross-host shape mismatch hazard).
        n_dev = moe_devices
        if n_dev is None:
            n_dev = jax.device_count()
            import logging

            logging.getLogger("ilvlm.swin").warning(
                "swin_moe: resolving NUM_LOCAL_EXPERTS against this host's "
                "%d device(s); pin moe_devices= for checkpoints that must "
                "load on other hardware", n_dev)
        local = int(sec.get("NUM_LOCAL_EXPERTS", 1))
        fields["num_experts"] = max(
            1, n_dev * local if local > 0 else n_dev // -local)
        fields["moe_top_k"] = int(sec.get("TOP_VALUE", 1))
        fields["capacity_factor"] = float(sec.get("CAPACITY_FACTOR", 1.25))
        blocks = sec.get("MOE_BLOCKS")
        if blocks is not None:
            fields["moe_blocks"] = tuple(
                tuple(b for b in stage if b >= 0) for stage in blocks)
    fields.update(kw)
    return SwinConfig(**fields)


def swin_moe_b(embed_dim=512, num_experts=8, moe_top_k=1, capacity_factor=1.25,
               moe_stages=(2, 3), **kw) -> SwinConfig:
    """Swin-MoE base (reference ``swin_transformer_moe.py`` capability; its
    vendored configs are Tutel-backed and unconsumed by any CLIP factory —
    provided here as a first-class tower with expert-parallel headroom)."""
    return _override(
        SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                   v2=False, output_dim=embed_dim, num_experts=num_experts,
                   moe_top_k=moe_top_k, capacity_factor=capacity_factor,
                   moe_stages=tuple(moe_stages)), kw)
