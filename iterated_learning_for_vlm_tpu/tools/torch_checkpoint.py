"""Reference PyTorch checkpoint -> flax params converter.

The reference releases checkpoints as torch ``state = {model: state_dict,
optimizer, last_iter}`` (``train_solver.py:521-540``) with ``module.``
prefixes from DDP.  This converter maps those tensors into this framework's
param tree so reference checkpoints can be evaluated here (the BASELINE.json
SugarCREPE-parity protocol).

Key layout mappings (torch -> flax):
- ``Linear.weight [out, in]``            -> ``kernel [in, out]`` (transpose)
- ``Conv2d.weight [out, in, kh, kw]``    -> ``kernel [kh, kw, in, out]``
- ``MultiheadAttention.in_proj_weight [3D, D]`` -> packed ``in_proj/kernel
  [D, 3D]`` (q|k|v column blocks match our axis -1 split)
- per-layer ``resblocks.{i}.*``          -> scan-stacked leading L axis
- ``Embedding.weight``                   -> ``embedding`` (no transpose)
- LayerNorm weight/bias                  -> ``norm/{scale,bias}``
- bare params (class/positional embedding, proj, logit_scale, space_dict)
  copied verbatim.

Loading the ``.pth.tar`` requires torch (cpu wheel is fine); conversion
itself is pure numpy.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np
from flax import traverse_util


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("model", state)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


_BLOCK_RE = re.compile(r"^(visual|encode_text)\.transformer\.resblocks\.(\d+)\.(.*)$")

# within-block torch suffix -> flax path under .../resblocks/
_BLOCK_MAP = {
    "attn.in_proj_weight": ("attn", "in_proj", "kernel"),
    "attn.in_proj_bias": ("attn", "in_proj", "bias"),
    "attn.out_proj.weight": ("attn", "out_proj", "kernel"),
    "attn.out_proj.bias": ("attn", "out_proj", "bias"),
    "ln_1.weight": ("ln_1", "norm", "scale"),
    "ln_1.bias": ("ln_1", "norm", "bias"),
    "ln_2.weight": ("ln_2", "norm", "scale"),
    "ln_2.bias": ("ln_2", "norm", "bias"),
    "mlp.c_fc.weight": ("mlp", "c_fc", "kernel"),
    "mlp.c_fc.bias": ("mlp", "c_fc", "bias"),
    "mlp.c_proj.weight": ("mlp", "c_proj", "kernel"),
    "mlp.c_proj.bias": ("mlp", "c_proj", "bias"),
}

_TOP_MAP = {
    "visual.conv1.weight": ("visual", "conv1", "kernel"),
    "visual.class_embedding": ("visual", "class_embedding"),
    "visual.positional_embedding": ("visual", "positional_embedding"),
    "visual.ln_pre.weight": ("visual", "ln_pre", "norm", "scale"),
    "visual.ln_pre.bias": ("visual", "ln_pre", "norm", "bias"),
    "visual.ln_post.weight": ("visual", "ln_post", "norm", "scale"),
    "visual.ln_post.bias": ("visual", "ln_post", "norm", "bias"),
    "visual.proj": ("visual", "proj"),
    "encode_text.token_embedding.weight": ("text", "token_embedding", "embedding"),
    "encode_text.positional_embedding": ("text", "positional_embedding"),
    "encode_text.ln_final.weight": ("text", "ln_final", "norm", "scale"),
    "encode_text.ln_final.bias": ("text", "ln_final", "norm", "bias"),
    "encode_text.text_projection.weight": ("text", "text_projection", "kernel"),
    "encode_text.text_projection.bias": ("text", "text_projection", "bias"),
    "logit_scale": ("logit_scale",),
    "logit_scale_sd": ("logit_scale_sd",),
    "space_dict": ("space_dict",),
}

# FDT query heads: q_map is Sequential(LN, Linear, GELU, LN, Linear)
for _side, _root in (("img_query_model", "img_query"), ("txt_query_model", "txt_query")):
    _TOP_MAP.update({
        f"{_side}.q_map.0.weight": (_root, "ln_1", "norm", "scale"),
        f"{_side}.q_map.0.bias": (_root, "ln_1", "norm", "bias"),
        f"{_side}.q_map.1.weight": (_root, "fc_1", "kernel"),
        f"{_side}.q_map.1.bias": (_root, "fc_1", "bias"),
        f"{_side}.q_map.3.weight": (_root, "ln_2", "norm", "scale"),
        f"{_side}.q_map.3.bias": (_root, "ln_2", "norm", "bias"),
        f"{_side}.q_map.4.weight": (_root, "fc_2", "kernel"),
        f"{_side}.q_map.4.bias": (_root, "fc_2", "bias"),
    })

_TRANSPOSE_LINEAR = {"kernel"}


def _convert_leaf(torch_key: str, flax_path, value: np.ndarray) -> np.ndarray:
    leaf = flax_path[-1]
    if torch_key.endswith("conv1.weight"):
        return value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if leaf == "kernel" and value.ndim == 2:
        return value.T  # torch [out, in] -> flax [in, out]
    return value


def convert_reference_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Return a flax-style nested params dict (CLIP or CLIP-FDT trees)."""
    flat: Dict[tuple, np.ndarray] = {}
    blocks: Dict[tuple, Dict[int, np.ndarray]] = {}

    for key, value in sd.items():
        m = _BLOCK_RE.match(key)
        if m:
            tower, idx, suffix = m.group(1), int(m.group(2)), m.group(3)
            if suffix not in _BLOCK_MAP:
                continue
            root = "visual" if tower == "visual" else "text"
            fpath = (root, "transformer", "resblocks") + _BLOCK_MAP[suffix]
            blocks.setdefault(fpath, {})[idx] = _convert_leaf(key, fpath, value)
        elif key in _TOP_MAP:
            fpath = _TOP_MAP[key]
            flat[fpath] = _convert_leaf(key, fpath, value)
        # silently skip keys outside the known tree (BN buffers etc.)

    for fpath, per_layer in blocks.items():
        layers = [per_layer[i] for i in sorted(per_layer)]
        flat[fpath] = np.stack(layers, axis=0)  # scan-stacked [L, ...]

    return traverse_util.unflatten_dict({k: np.asarray(v, np.float32)
                                         for k, v in flat.items()})


def _openai_to_reference_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename an OpenAI/open_clip CLIP state dict to the reference layout.

    Official CLIP (and open_clip "quickgelu" models — the family the
    reference's ``models/open_clip.py`` loader serves) keep the text tower's
    keys UNPREFIXED (``transformer.resblocks...``, ``token_embedding.weight``,
    ``ln_final.*``) and ``text_projection`` is a bare ``[width, embed]``
    parameter (``x @ text_projection``, no bias) — vs the reference's
    ``encode_text.`` prefix and Linear text_projection.
    """
    out: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        if key.startswith(("visual.", "encode_text.")) or key in (
                "logit_scale", "logit_scale_sd", "space_dict"):
            out[key] = value
        elif key == "text_projection":
            # bare [width, embed]: becomes the Linear kernel WITHOUT the
            # torch [out, in] transpose; bias is zero.
            out["encode_text.text_projection.weight"] = value.T
            out["encode_text.text_projection.bias"] = np.zeros(
                value.shape[1], value.dtype)
        elif key.startswith(("transformer.", "token_embedding.",
                             "ln_final.")) or key == "positional_embedding":
            out["encode_text." + key] = value
        else:  # BN buffers, attn_mask buffers, etc. — converter skips them
            out[key] = value
    return out


def _looks_like_openai_layout(sd: Dict[str, np.ndarray]) -> bool:
    return ("token_embedding.weight" in sd
            and not any(k.startswith("encode_text.") for k in sd))


def load_reference_checkpoint(path: str, layout: str = "auto") -> Dict[str, Any]:
    """Load + convert a torch checkpoint.

    ``layout``: ``auto`` detects the reference (``encode_text.``-prefixed)
    vs OpenAI/open_clip (unprefixed text tower) layout; ``openai`` forces
    the OpenAI/open_clip rename (``--model_type open_clip``); ``reference``
    skips it — so a checkpoint that fools the heuristic can be forced
    either way."""
    sd = load_torch_state_dict(path)
    if layout == "openai" or (layout == "auto" and _looks_like_openai_layout(sd)):
        sd = _openai_to_reference_keys(sd)
    return convert_reference_state_dict(sd)
