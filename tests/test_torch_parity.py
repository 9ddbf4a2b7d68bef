"""Numerical parity: torch-architecture forward vs converted flax forward.

Builds a tiny torch model with the reference's exact module structure/naming
(packed-QKV MultiheadAttention blocks, QuickGELU MLPs, pre/post LN, EOT
argmax pooling — the public CLIP architecture), converts its state_dict with
``tools/torch_checkpoint.py``, and checks the flax forward matches torch to
~1e-4.  This pins the cross-framework semantics needed to evaluate reference
checkpoints (BASELINE.json parity protocol).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterated_learning_for_vlm_tpu.models import CLIP, TextConfig, VisionConfig  # noqa: E402
from iterated_learning_for_vlm_tpu.tools.torch_checkpoint import (  # noqa: E402
    convert_reference_state_dict,
)

WIDTH, HEADS, LAYERS, CTX, RES, PATCH, EMBED, VOCAB = 32, 2, 2, 12, 16, 8, 16, 128


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class Block(nn.Module):
    def __init__(self, width, heads, attn_mask=None):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))
        self.ln_2 = nn.LayerNorm(width)
        self.attn_mask = attn_mask

    def forward(self, x):
        a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                         need_weights=False, attn_mask=self.attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class Tower(nn.Module):
    def __init__(self, width, heads, layers, attn_mask=None):
        super().__init__()
        self.resblocks = nn.Sequential(
            *[Block(width, heads, attn_mask) for _ in range(layers)]
        )

    def forward(self, x):
        return self.resblocks(x)


class TorchVisual(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, WIDTH, PATCH, PATCH, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(WIDTH) * 0.1)
        grid = (RES // PATCH) ** 2
        self.positional_embedding = nn.Parameter(torch.randn(grid + 1, WIDTH) * 0.01)
        self.ln_pre = nn.LayerNorm(WIDTH)
        self.transformer = Tower(WIDTH, HEADS, LAYERS)
        self.ln_post = nn.LayerNorm(WIDTH)
        self.proj = nn.Parameter(torch.randn(WIDTH, EMBED) * WIDTH ** -0.5)

    def forward(self, x):  # NCHW
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        x = self.transformer(x).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


class TorchText(nn.Module):
    def __init__(self):
        super().__init__()
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.token_embedding = nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = nn.Parameter(torch.randn(CTX, WIDTH) * 0.01)
        self.transformer = Tower(WIDTH, HEADS, LAYERS, attn_mask=mask)
        self.ln_final = nn.LayerNorm(WIDTH)
        self.text_projection = nn.Linear(WIDTH, EMBED)

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        eot = x[torch.arange(x.shape[0]), tokens.argmax(-1)]
        return self.text_projection(eot)


class TorchCLIP(nn.Module):
    def __init__(self):
        super().__init__()
        self.visual = TorchVisual()
        self.encode_text = TorchText()
        self.logit_scale = nn.Parameter(torch.ones(1) * np.log(1 / 0.07))


@pytest.fixture(scope="module")
def parity_setup():
    torch.manual_seed(0)
    tmodel = TorchCLIP().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_reference_state_dict(sd)

    fmodel = CLIP(
        vision_cfg=VisionConfig(input_resolution=RES, patch_size=PATCH, width=WIDTH,
                                layers=LAYERS, heads=HEADS, embed_dim=EMBED),
        text_cfg=TextConfig(context_length=CTX, vocab_size=VOCAB, width=WIDTH,
                            heads=HEADS, layers=LAYERS, embed_dim=EMBED),
    )
    return tmodel, fmodel, {"params": params}


def test_image_tower_parity(parity_setup):
    tmodel, fmodel, variables = parity_setup
    rng = np.random.RandomState(0)
    imgs = rng.randn(3, RES, RES, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.visual(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fmodel.apply(variables, jnp.asarray(imgs), method="encode_image"))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_text_tower_parity(parity_setup):
    tmodel, fmodel, variables = parity_setup
    rng = np.random.RandomState(1)
    tokens = np.zeros((3, CTX), np.int64)
    for i in range(3):
        n = 5 + i
        tokens[i, :n] = rng.randint(1, VOCAB - 1, n)
        tokens[i, n - 1] = VOCAB - 1  # eot = max id
    with torch.no_grad():
        ref = tmodel.encode_text(torch.from_numpy(tokens)).numpy()
    pad = np.zeros((3, CTX), np.float32)
    ours = np.asarray(
        fmodel.apply(variables, jnp.asarray(tokens.astype(np.int32)),
                     jnp.asarray(pad), method="encode_text")
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_openai_layout_autodetect_and_convert(parity_setup, tmp_path):
    """OpenAI/open_clip layout (unprefixed text tower, bare text_projection)
    converts to the same flax tree as the reference layout (--model_type
    open_clip path)."""
    from flax import traverse_util

    from iterated_learning_for_vlm_tpu.tools.torch_checkpoint import (
        _looks_like_openai_layout, _openai_to_reference_keys,
    )

    tmodel, _, variables = parity_setup
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    oa = {}
    for k, v in sd.items():
        if k == "encode_text.text_projection.weight":
            oa["text_projection"] = v.T  # bare [width, embed], x @ W
        elif k == "encode_text.text_projection.bias":
            continue  # openai has no bias
        elif k.startswith("encode_text."):
            oa[k[len("encode_text."):]] = v
        else:
            oa[k] = v
    assert _looks_like_openai_layout(oa) and not _looks_like_openai_layout(sd)

    converted = convert_reference_state_dict(_openai_to_reference_keys(oa))
    # --model_type open_clip forces the rename even if the heuristic is
    # fooled; 'reference' skips it (load_reference_checkpoint layout arg)
    import numpy as _np
    import torch as _torch

    from iterated_learning_for_vlm_tpu.tools.torch_checkpoint import (
        load_reference_checkpoint,
    )

    ckpt_path = str(tmp_path / "oa_parity_ckpt.pth")
    _torch.save({"model": {k: _torch.from_numpy(_np.asarray(v))
                           for k, v in oa.items()}}, ckpt_path)
    forced = load_reference_checkpoint(ckpt_path, layout="openai")
    assert "text" in forced and "text_projection" in forced["text"]
    skipped = load_reference_checkpoint(ckpt_path, layout="reference")
    assert "text" not in skipped  # unprefixed keys don't map without rename
    flat_c = traverse_util.flatten_dict(converted)
    flat_r = traverse_util.flatten_dict(variables["params"])
    assert set(flat_c) == set(flat_r)
    for k in flat_r:
        if k == ("text", "text_projection", "bias"):
            assert (flat_c[k] == 0).all()
        else:
            np.testing.assert_allclose(flat_c[k], flat_r[k], atol=1e-6)


def test_logit_scale_roundtrip(parity_setup):
    tmodel, fmodel, variables = parity_setup
    np.testing.assert_allclose(
        np.asarray(variables["params"]["logit_scale"]),
        tmodel.logit_scale.detach().numpy(), atol=1e-6,
    )
