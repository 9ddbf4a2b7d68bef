"""JitEncoder over a DeCLIP-FDT model (ADVICE r4 #1 regression).

The encoder passes the codebook temperature as a TRACED kwarg named
``temperature`` to ``extract_img_sd_ft`` / ``extract_txt_sd_ft``; DeCLIPFDT
(models/declip_fdt.py) must expose the same kwarg name as CLIPFDT
(models/fdt.py:181,189) or every DeCLIP-FDT eval — the in-training
``solver.evaluate()`` hook and ``load_eval_encoder`` — dies with a TypeError
at trace time.  CLIPFDT-only tests masked this; this test pins the shared
eval surface on the DeCLIP flavor.
"""
import jax
import numpy as np

from iterated_learning_for_vlm_tpu.eval.encode import JitEncoder
from iterated_learning_for_vlm_tpu.models import FDTConfig, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.models.declip_fdt import DeCLIPConfig, DeCLIPFDT

V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=12, vocab_size=49409, width=32, heads=2, layers=1,
               embed_dim=16)
F = FDTConfig(sd_num=32, sd_dim=64, raw_img_ft_dim=32, raw_txt_ft_dim=32,
              sd_temperature=10.0)


def test_jit_encoder_drives_declip_fdt():
    model = DeCLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F,
                      declip_cfg=DeCLIPConfig())
    rng = np.random.RandomState(0)
    v = np.asarray(rng.randn(2, 16, 16, 3), np.float32)
    tokens = np.asarray(rng.randint(1, 1000, (2, 12)), np.int32)
    pm = np.zeros((2, 12), np.float32)
    variables = model.init(jax.random.PRNGKey(0), v, v, tokens, pm, train=False)

    enc = JitEncoder(model, variables["params"], is_fdt=True, batch_size=2,
                     text_buckets=())
    img_emb = enc.encode_images(np.asarray(rng.randn(3, 16, 16, 3), np.float32))
    assert img_emb.shape == (3, 64)
    txt_emb = enc.encode_texts(["a red square", "a blue circle", "a dog"])
    assert txt_emb.shape == (3, 64)
    # embeddings are L2-normalized by default
    np.testing.assert_allclose(np.linalg.norm(img_emb, axis=-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(txt_emb, axis=-1), 1.0, atol=1e-3)
    # the traced temperature kwarg is live: a much sharper temperature must
    # change the codebook attention, hence the embeddings
    enc2 = JitEncoder(model, variables["params"], is_fdt=True, batch_size=2,
                      text_buckets=(), sd_temperature=1000.0)
    img_emb2 = enc2.encode_images(np.asarray(rng.randn(3, 16, 16, 3), np.float32))
    assert img_emb2.shape == (3, 64)
