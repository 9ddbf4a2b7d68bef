import pytest
"""DeCLIP-FDT multi-task model forward test (tiny dims)."""
import jax
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.models import FDTConfig, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.models.declip_fdt import DeCLIPConfig, DeCLIPFDT
from iterated_learning_for_vlm_tpu.train.contrastive_extras import nt_xent, nt_xent_convirt
from iterated_learning_for_vlm_tpu.train.loss import simsiam_loss

V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=1, heads=2,
                 embed_dim=16)
T = TextConfig(context_length=12, vocab_size=128, width=32, heads=2, layers=1,
               embed_dim=16)
F = FDTConfig(sd_num=32, sd_dim=64, raw_img_ft_dim=32, raw_txt_ft_dim=32,
              sd_temperature=10.0)


@pytest.mark.slow  # re-tiered r4 (~25s); test_declip_step keeps the recipe fast-lane
def test_declip_fdt_forward_and_losses():
    model = DeCLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F,
                      declip_cfg=DeCLIPConfig(return_simsiam_text=True,
                                              text_mask_type="MLM"))
    rng = np.random.RandomState(0)
    v1 = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    v2 = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    tokens = jnp.asarray(rng.randint(1, 127, (4, 12)), jnp.int32)
    pm = jnp.zeros((4, 12), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), v1, v2, tokens, pm, train=True)
    out, mutated = model.apply(variables, v1, v2, tokens, pm, train=True,
                               mutable=["batch_stats"])
    assert out["image_embed"].shape == (4, 64)
    assert out["text_embed"].shape == (4, 64)
    p1, z1, p2, z2 = out["simsiam"]
    assert p1.shape == (4, 1024) and z2.shape == (4, 1024)  # SimSiam heads are fixed 1024 (reference dims)
    assert out["mlm_logits"].shape == (4, 12, 128)
    assert "batch_stats" in mutated

    loss = simsiam_loss(p1, z1, p2, z2)
    assert np.isfinite(float(loss)) and -1.0 <= float(loss) <= 1.0
    ntx = nt_xent(z1, z2, temperature=0.5)
    assert np.isfinite(float(ntx)) and float(ntx) > 0
    cvt = nt_xent_convirt(out["image_embed"], out["text_embed"])
    assert np.isfinite(float(cvt))
