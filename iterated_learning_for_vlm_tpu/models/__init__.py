"""Model zoo + registry.

Mirrors the reference dispatch ``model_entry(config)`` keyed on
``config.type`` (``prototype/model/__init__.py:5-6``) and accepts the same
nested YAML kwargs (``image_encode`` / ``text_encode`` / ``clip`` / ``fdt``
blocks from ``example/*/config_cc3m.yaml``).  Returns a flax Module; params
are created by the caller with an explicit RNG (functional-by-construction).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

from .clip import CLIP
from .fdt import CLIPFDT, FDTConfig, QueryModel
from .sparsemax import sparsemax, sparsemax_bisect
from .text import TextConfig, TextTransformer, text_base, text_large
from .vit import VisionConfig, VisionTransformer, vit_b16, vit_b32, vit_l14, vit_l16

__all__ = [
    "CLIP", "CLIPFDT", "FDTConfig", "QueryModel", "TextConfig", "TextTransformer",
    "VisionConfig", "VisionTransformer", "model_entry", "sparsemax", "sparsemax_bisect",
]

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
           "fp32": jnp.float32}


def _common(kwargs: Mapping[str, Any]):
    img_kw = dict(kwargs.get("image_encode", {}))
    txt_kw = dict(kwargs.get("text_encode", {}))
    # reference text_encode keys that do not apply to the JAX build
    for dead in ("bpe_path", "text_encode_type", "text_model_utils"):
        txt_kw.pop(dead, None)
    dtype = _DTYPES[str(kwargs.get("dtype", "float32"))]
    remat = bool(kwargs.get("remat", False))
    use_flash = bool(kwargs.get("use_flash", False))
    fused_attn = bool(kwargs.get("fused_attn", False))
    fused_attn_group = int(kwargs.get("fused_attn_group", 2))
    fused_attn_sample_group = int(kwargs.get("fused_attn_sample_group", 2))
    fused_attn_bwd_fuse3 = bool(kwargs.get("fused_attn_bwd_fuse3", False))
    fused_attn_group_bwd = kwargs.get("fused_attn_group_bwd")
    fused_attn_sample_group_bwd = kwargs.get("fused_attn_sample_group_bwd")
    unroll = bool(kwargs.get("unroll", False))
    attn_layout = str(kwargs.get("attn_layout", "bhqk"))
    for kw in (img_kw, txt_kw):
        kw.setdefault("remat", remat)
        kw.setdefault("use_flash", use_flash)
        kw.setdefault("fused_attn", fused_attn)
        kw.setdefault("fused_attn_group", fused_attn_group)
        kw.setdefault("fused_attn_sample_group", fused_attn_sample_group)
        kw.setdefault("fused_attn_bwd_fuse3", fused_attn_bwd_fuse3)
        kw.setdefault("fused_attn_group_bwd", fused_attn_group_bwd)
        kw.setdefault("fused_attn_sample_group_bwd", fused_attn_sample_group_bwd)
        kw.setdefault("unroll", unroll)
        kw.setdefault("attn_layout", attn_layout)
    return img_kw, txt_kw, dtype


def _clip(vision_factory, text_factory, kwargs):
    img_kw, txt_kw, dtype = _common(kwargs)
    clip_kw = dict(kwargs.get("clip", {}))
    clip_kw.pop("use_allgather", None)  # gathering is implicit under SPMD
    return CLIP(vision_cfg=vision_factory(**img_kw), text_cfg=text_factory(**txt_kw),
                dtype=dtype)


def _clip_fdt(vision_factory, text_factory, kwargs):
    img_kw, txt_kw, dtype = _common(kwargs)
    fdt_kw = dict(kwargs.get("fdt", {}))
    fdt_kw.pop("use_allgather", None)
    fdt_cfg = FDTConfig(**fdt_kw)
    return CLIPFDT(
        vision_cfg=vision_factory(**img_kw),
        text_cfg=text_factory(**txt_kw),
        fdt_cfg=fdt_cfg,
        dtype=dtype,
    )


# -- factories (names match the reference factory functions) ----------------
def clip_vitb32(**kw):
    return _clip(vit_b32, text_base, kw)


def clip_vitb16(**kw):
    return _clip(vit_b16, text_base, kw)


def clip_vitL14(**kw):
    return _clip(vit_l14, text_large, kw)


def clip_vitL16(**kw):
    return _clip(vit_l16, text_large, kw)


def clip_res50(**kw):
    from .resnet import resnet_r50

    return _clip(resnet_r50, text_base, kw)


def clip_res101(**kw):
    from .resnet import resnet_r101

    return _clip(resnet_r101, text_base, kw)


def clip_fdt_vitb32(**kw):
    return _clip_fdt(vit_b32, text_base, kw)


def clip_fdt_vitb16(**kw):
    return _clip_fdt(vit_b16, text_base, kw)


def clip_swinB_v2(**kw):
    from .swin import swin_b_v2

    return _clip(swin_b_v2, text_base, kw)


def clip_swinL(**kw):
    from .swin import swin_l

    return _clip(swin_l, text_large, kw)


def clip_swinL_v2(**kw):
    from .swin import swin_l_v2

    return _clip(swin_l_v2, text_large, kw)


def clip_swinMoE_B(**kw):
    from .swin import swin_moe_b

    return _clip(swin_moe_b, text_base, kw)


def clip_swinMLP_B(**kw):
    from .swin import swin_mlp_b

    return _clip(swin_mlp_b, text_base, kw)


def clip_fdt_swinB_v2(**kw):
    from .swin import swin_b_v2

    kw.setdefault("fdt", {})
    kw["fdt"].setdefault("raw_img_ft_dim", 1024)  # swin-B final channels
    return _clip_fdt(swin_b_v2, text_base, kw)


def clip_swin_yaml(**kw):
    """CLIP with a Swin tower described by a Microsoft-Swin-schema YAML —
    the whole vendored config surface (reference
    ``prototype/model/swin/configs/**``, 40 files, built there by
    ``swin/build.py:14``) becomes reachable without a per-file factory:

    .. code-block:: yaml

        model:
          type: clip_swin_yaml
          kwargs:
            image_encode:
              config_file: path/to/swinv2_base_patch4_window8_256.yaml
              embed_dim: 512
    """
    from .swin import _override, swin_config_from_yaml

    def factory(config_file, embed_dim=512, **img_kw):
        # _override filters to SwinConfig fields (drops the tower-generic
        # knobs _common injects, e.g. use_flash), same as the other factories
        return _override(swin_config_from_yaml(config_file, embed_dim=embed_dim),
                         img_kw)

    return _clip(factory, text_base, kw)


# Spectral-norm variants (reference CLIP_sp / Clip_FDT_SP): same module graph;
# the spectral reparameterisation is applied in the train step
# (train/step.py spectral_norm=True) / at load time for eval
# (eval/model_loader.py), mirroring torch's wrapper semantics.
def clip_vitb32_sp(**kw):
    return _clip(vit_b32, text_base, kw)


def clip_fdt_sp_vitb32(**kw):
    return _clip_fdt(vit_b32, text_base, kw)


def clip_vitb32_auxilary(**kw):
    """Reference ``clip_vitb32_auxilary`` (prototype/model/clip.py:209-216):
    CLIP B/32 built from the "auxilary" towers — a vendored copy of torch's
    multi-head attention with attention-probs forward/backward hooks
    (image_encoder/auxilary.py:26-51) so attention maps can be harvested for
    visualization.  Here the same module graph already surfaces per-layer
    head-averaged attention as a *call-time* output (``return_attn=True`` on
    both towers, models/vit.py / models/text.py) — no separate parameter
    layout, so checkpoints are interchangeable with ``clip_vitb32``."""
    return _clip(vit_b32, text_base, kw)


def declip_fdt_vitb32(**kw):
    from .declip_fdt import declip_fdt_vitb32 as factory

    return factory(**kw)


def defilip_fdt_vitb32(**kw):
    from .declip_fdt import defilip_fdt_vitb32 as factory

    return factory(**kw)


def is_spectral_norm_type(model_type: str) -> bool:
    return "_sp" in model_type or model_type.startswith("sp_")


_REGISTRY = {
    "clip_vitb32": clip_vitb32,
    "clip_vitb16": clip_vitb16,
    "clip_vitL14": clip_vitL14,
    "clip_vitL16": clip_vitL16,
    "clip_res50": clip_res50,
    "clip_res101": clip_res101,
    "clip_swinB_v2": clip_swinB_v2,
    "clip_swinL": clip_swinL,
    "clip_swinL_v2": clip_swinL_v2,
    "clip_swinMoE_B": clip_swinMoE_B,
    "clip_swinMLP_B": clip_swinMLP_B,
    "clip_swin_yaml": clip_swin_yaml,
    "clip_fdt_vitb32": clip_fdt_vitb32,
    "clip_fdt_vitb16": clip_fdt_vitb16,
    "clip_fdt_swinB_v2": clip_fdt_swinB_v2,
    "clip_vitb32_sp": clip_vitb32_sp,
    "clip_vitb32_auxilary": clip_vitb32_auxilary,
    "clip_fdt_sp_vitb32": clip_fdt_sp_vitb32,
    "declip_fdt_vitb32": declip_fdt_vitb32,
    "defilip_fdt_vitb32": defilip_fdt_vitb32,
}


def register_model(name: str, factory):
    _REGISTRY[name] = factory


def model_entry(config) -> Any:
    """``config`` is a mapping with ``type`` and ``kwargs`` (reference schema)."""
    mtype = config["type"] if isinstance(config, Mapping) else config.type
    kwargs = dict(config.get("kwargs", {}))
    if mtype not in _REGISTRY:
        raise KeyError(f"unknown model type {mtype!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[mtype](**kwargs)
