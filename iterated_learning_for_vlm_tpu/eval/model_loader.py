"""Eval-side model loading (training checkpoints -> JitEncoder).

Parity target: reference ``CLIP_benchmark/clip_benchmark/models/fdt.py``
(``load_fdt``/``MyModelZoo``): build the training-side model from its YAML
config, load a checkpoint (or a LIST of checkpoints averaged into a weight
soup, fdt.py:28-40), and expose ``encode_image``/``encode_text``.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax

from ..models import model_entry
from ..train.checkpoint import restore_checkpoint, restore_params_soup
from ..train.optim import adamw_init, trainable_mask_tree
from ..train.train_state import TrainState
from ..utils.config import Config, load_config
from .encode import JitEncoder


def build_model_from_config(config: Union[str, Config]):
    cfg = load_config(config) if isinstance(config, str) else config
    model = model_entry(cfg.model)
    return model, "fdt" in cfg.model.type


def init_template_state(model) -> TrainState:
    import jax.numpy as jnp

    res = model.vision_cfg.input_resolution
    ctx = model.text_cfg.context_length
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, res, res, 3)), jnp.zeros((1, ctx), jnp.int32),
        jnp.zeros((1, ctx)),
    )["params"]
    is_fdt = hasattr(model, "fdt_cfg")
    stored = params.get("space_dict") if is_fdt else None
    return TrainState.create(
        params, adamw_init(params), trainable_mask_tree(params, frozenset()), stored
    )


def load_eval_encoder(
    config: Union[str, Config],
    checkpoint: Optional[Union[str, Sequence[str]]] = None,
    batch_size: int = 64,
    transform: str = "ONECROP",
    sd_temperature: Optional[float] = None,
    model_type: str = "cust_clip",
    amp: bool = True,
    normalize: bool = True,
    num_workers: int = 4,
    data_parallel: bool = False,
    language: str = "en",
    encoder: Optional[JitEncoder] = None,
) -> JitEncoder:
    """checkpoint may be a path, a list of paths (averaged soup), or None
    (random init, for smoke tests).

    ``sd_temperature`` overrides the FDT codebook temperature for eval: like
    the reference, eval rebuilds the model from the config YAML, so a
    checkpoint trained with T-decay would otherwise be scored at the config's
    initial T (1000) instead of the final decayed value.

    ``encoder``: pass a JitEncoder from a previous call (same config) to
    REUSE its jitted programs — the new checkpoint's params and the decayed
    temperature are both traced arguments, so sweeping many checkpoints
    (tools/il_effectiveness_ab.py: 10 arms x 4 checkpoints) costs one
    compile total instead of one per checkpoint."""
    import copy as _copy

    if model_type in ("ja_clip", "nllb_clip"):
        # third-party HF dual-encoders from a LOCAL weights dir (reference
        # TYPE2FUNC ja_clip/nllb_clip, network-free) — the model config is
        # the HF directory itself, so ``config`` is unused here
        from .hf_adapter import HFClipEncoder

        if not checkpoint or isinstance(checkpoint, (list, tuple)):
            raise ValueError(
                f"--model_type {model_type} needs --pretrained pointing at "
                "ONE local HF save_pretrained directory")
        return HFClipEncoder(str(checkpoint), model_type=model_type,
                             batch_size=batch_size, normalize=normalize,
                             language=language)

    if encoder is not None:
        model, is_fdt = encoder.model, encoder.is_fdt
        template = encoder._ckpt_template
        cfg_type = getattr(encoder, "_cfg_type", None)
    else:
        # deep-copy Config inputs: the amp/sd_temperature overrides below
        # mutate model kwargs, and a caller-held Config must not change
        cfg = load_config(config) if isinstance(config, str) else _copy.deepcopy(config)
        if not amp:
            # reference --no_amp disables torch autocast; the TPU analogue is
            # forcing fp32 compute in the towers instead of the config's dtype
            # (bf16 in the shipping configs)
            cfg.model["kwargs"] = {**cfg.model.get("kwargs", {}), "dtype": "float32"}
        if sd_temperature is not None:
            kwargs = cfg.model.get("kwargs", {})
            if "fdt" in kwargs:
                kwargs["fdt"]["sd_temperature"] = float(sd_temperature)
        model, is_fdt = build_model_from_config(cfg)
        template = init_template_state(model)
        cfg_type = str(cfg.model.type)
    # --model_type open_clip forces the OpenAI/open_clip layout rename;
    # cust_clip keeps auto-detection (reference TYPE2FUNC dispatch)
    layout = "openai" if model_type == "open_clip" else "auto"

    def _load_one(path: str):
        if str(path).endswith((".pth", ".pth.tar", ".pt")):
            # reference torch checkpoint: convert layouts on the fly
            from ..tools.torch_checkpoint import load_reference_checkpoint

            return load_reference_checkpoint(str(path), layout=layout)
        return restore_checkpoint(path, template).params

    if checkpoint is None:
        params = template.params
    elif isinstance(checkpoint, (list, tuple)) and len(checkpoint) > 1:
        if any(str(p).endswith((".pth", ".pth.tar", ".pt")) for p in checkpoint):
            import jax as _jax
            import numpy as _np

            loaded = [_load_one(p) for p in checkpoint]
            params = _jax.tree.map(
                lambda *xs: _np.mean(_np.stack(xs), axis=0), *loaded
            )
        else:
            params = restore_params_soup(list(checkpoint), template)
    else:
        path = checkpoint[0] if isinstance(checkpoint, (list, tuple)) else checkpoint
        params = _load_one(path)

    from ..models import is_spectral_norm_type

    if cfg_type and is_spectral_norm_type(cfg_type):
        # _sp variants store the raw parametrisation; eval uses the
        # spectrally-normalised effective weights (torch wrapper semantics).
        from ..train.lipreg import spectral_normalize_tree

        params = spectral_normalize_tree(params)
    if encoder is not None:
        encoder.params = params
        if sd_temperature is not None and is_fdt:
            encoder.sd_temperature = float(sd_temperature)
        return encoder
    enc = JitEncoder(model, params, is_fdt=is_fdt, batch_size=batch_size,
                     transform=transform, normalize=normalize,
                     num_workers=num_workers, data_parallel=data_parallel,
                     sd_temperature=sd_temperature)
    enc._ckpt_template = template
    enc._cfg_type = cfg_type
    return enc
