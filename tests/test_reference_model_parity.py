"""FULL-MODEL numerical parity against the actual reference implementation.

Imports the genuine ``prototype.model.clip_fdt.Clip_FDT`` from the read-only
reference checkout (torch CPU), builds it at tiny dims, converts its
``state_dict()`` with ``tools/torch_checkpoint.py``, and checks that our
``CLIPFDT``'s ``extract_img_sd_ft`` / ``extract_txt_sd_ft`` reproduce the
reference outputs (codebook embeddings AND sparsemax attention weights) to
~1e-4.  This is the strongest checkpoint-fidelity pin available without the
externally-hosted released checkpoints: any layout/semantics drift in the
converter or the model breaks it.

The reference import needs three inert shims (ftfy / timm.models.layers /
easydict — none touch the math) and a ``.cuda()`` no-op (its forward
hard-codes device moves).
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


def _import_reference():
    if "prototype.model.clip_fdt" in sys.modules:
        from prototype.model.clip_fdt import Clip_FDT  # type: ignore
        from prototype.model.image_encoder.visual_transformer import (  # type: ignore
            VisualTransformer,
        )
        from prototype.model.text_encoder.text_transformer import (  # type: ignore
            TextTransformer,
        )
        return Clip_FDT, VisualTransformer, TextTransformer
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    sys.modules.setdefault("ftfy", ftfy)
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")
    tl.DropPath = torch.nn.Identity
    tl.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    tl.trunc_normal_ = lambda *a, **k: None
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", tm)
    sys.modules.setdefault("timm.models.layers", tl)
    ed = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in dict(d or {}, **kw).items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setitem__(k, v)
            object.__setattr__(self, k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    ed.EasyDict = EasyDict
    sys.modules.setdefault("easydict", ed)
    sys.path.insert(0, REF)
    # the reference forward hard-codes .cuda(); make it a no-op on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    from prototype.model.clip_fdt import Clip_FDT  # type: ignore
    from prototype.model.image_encoder.visual_transformer import (  # type: ignore
        VisualTransformer,
    )
    from prototype.model.text_encoder.text_transformer import (  # type: ignore
        TextTransformer,
    )
    return Clip_FDT, VisualTransformer, TextTransformer


W, HEADS, LAYERS, CTX, RES, PATCH, EMBED, SD_NUM, SD_DIM = 32, 2, 2, 12, 16, 8, 16, 64, 16
BPE = os.path.join(REF, "prototype/model/text_encoder/bpe_simple_vocab_16e6.txt.gz")


@pytest.fixture(scope="module")
def models():
    Clip_FDT, VisualTransformer, TextTransformer = _import_reference()
    torch.manual_seed(0)
    visual = VisualTransformer(input_resolution=RES, patch_size=PATCH, width=W,
                               layers=LAYERS, heads=HEADS, embed_dim=EMBED,
                               checkpoint=False)
    text = TextTransformer(embed_dim=EMBED, context_length=CTX,
                           transformer_width=W, transformer_heads=HEADS,
                           transformer_layers=LAYERS,
                           positional_embedding_flag=True, checkpoint=False,
                           bpe_path=BPE, text_encode_type="Transformer",
                           text_model_utils={"freeze": False})
    ref = Clip_FDT(visual, text, use_allgather=False, sd_num=SD_NUM,
                   sd_dim=SD_DIM, raw_img_ft_dim=W, raw_txt_ft_dim=W,
                   att_func_type="sparsemax", pool_type="max",
                   sd_temperature=10.0)
    ref.eval()

    import jax

    from iterated_learning_for_vlm_tpu.models import (
        CLIPFDT, FDTConfig, TextConfig, VisionConfig,
    )
    from iterated_learning_for_vlm_tpu.tools.torch_checkpoint import (
        convert_reference_state_dict,
    )

    model = CLIPFDT(
        vision_cfg=VisionConfig(input_resolution=RES, patch_size=PATCH, width=W,
                                layers=LAYERS, heads=HEADS, embed_dim=EMBED),
        text_cfg=TextConfig(context_length=CTX, width=W, heads=HEADS,
                            layers=LAYERS, embed_dim=EMBED),
        fdt_cfg=FDTConfig(sd_num=SD_NUM, sd_dim=SD_DIM, raw_img_ft_dim=W,
                          raw_txt_ft_dim=W, sd_temperature=10.0,
                          att_func_type="sparsemax", pool_type="max"),
    )
    params = convert_reference_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    return ref, model, {"params": params}


def test_image_codebook_path_matches_reference(models):
    ref, model, variables = models
    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, RES, RES).astype(np.float32)
    with torch.no_grad():
        # reference Query_model returns (att_weight, att_ft, sd) —
        # clip_fdt.py:335's variable names are stale
        ref_att, ref_sd_ft, _ = ref.extract_img_sd_ft(torch.from_numpy(images))
    import jax.numpy as jnp

    att, sd_ft = model.apply(variables, jnp.asarray(images.transpose(0, 2, 3, 1)),
                             method="extract_img_sd_ft")
    np.testing.assert_allclose(np.asarray(sd_ft), ref_sd_ft.detach().numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(att), ref_att.detach().numpy(), atol=2e-4)
    # sparsemax support (set of active codes) agrees exactly
    assert ((np.asarray(att) > 0) == (ref_att.detach().numpy() > 0)).mean() > 0.999


def test_text_codebook_path_matches_reference(models):
    ref, model, variables = models
    rng = np.random.RandomState(1)
    tokens = np.zeros((2, CTX), np.int64)
    pad = np.full((2, CTX), -np.inf, np.float32)
    for i, n in enumerate((6, 9)):
        tokens[i, :n] = rng.randint(1, 40000, n)
        tokens[i, n - 1] = 49407  # eot = argmax id
        pad[i, :n] = 0.0
    with torch.no_grad():
        ref_att, ref_sd_ft, _ = ref.extract_txt_sd_ft(
            (torch.from_numpy(tokens), torch.from_numpy(pad)), raw_text=False
        )
    import jax.numpy as jnp

    att, sd_ft = model.apply(
        variables, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(pad),
        method="extract_txt_sd_ft",
    )
    np.testing.assert_allclose(np.asarray(sd_ft), ref_sd_ft.detach().numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(att), ref_att.detach().numpy(), atol=2e-4)
