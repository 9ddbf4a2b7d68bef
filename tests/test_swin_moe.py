"""Swin-MoE: top-k gated expert MLP (reference ``swin_transformer_moe.py``
capability, Tutel-backed there — GShard einsum dispatch here)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.models.swin import (
    MoEMlp, SwinConfig, SwinTransformer,
)

TINY_MOE = SwinConfig(
    input_resolution=16, patch_size=4, window_size=2, embed_dim=16,
    depths=(1, 2), num_heads=(2, 2), v2=False, output_dim=16,
    num_experts=4, moe_stages=(1,), moe_top_k=1,
)


def test_moe_mlp_matches_dense_expert_selection():
    """With ample capacity, top-1 MoE == per-token argmax expert's MLP
    scaled by its gate probability."""
    d, h, e, tokens = 8, 16, 2, 6
    x = jnp.asarray(np.random.RandomState(0).randn(1, tokens, d), jnp.float32)
    moe = MoEMlp(dim=d, hidden=h, num_experts=e, top_k=1, capacity_factor=8.0)
    params = moe.init(jax.random.PRNGKey(0), x)
    y, aux = moe.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(float(aux))

    p = params["params"]
    gate_logits = np.asarray(x[0] @ p["gate"]["kernel"])
    probs = np.asarray(jax.nn.softmax(gate_logits, axis=-1))
    chosen = probs.argmax(-1)
    w1, b1 = np.asarray(p["w1"]), np.asarray(p["b1"])
    w2, b2 = np.asarray(p["w2"]), np.asarray(p["b2"])
    ref = np.zeros((tokens, d), np.float32)
    for t in range(tokens):
        ei = chosen[t]
        hmid = np.asarray(jax.nn.gelu(x[0, t] @ w1[ei] + b1[ei, 0], approximate=False))
        ref[t] = probs[t, ei] * (hmid @ w2[ei] + b2[ei, 0])
    np.testing.assert_allclose(np.asarray(y[0]), ref, atol=2e-5)


def test_moe_capacity_drops_overflow_tokens():
    """capacity < tokens-per-expert: overflow tokens produce zero output
    (Tutel capacity semantics), never garbage."""
    d, e = 4, 2
    # all tokens route identically (identical inputs -> same gate)
    x = jnp.ones((1, 8, d), jnp.float32)
    moe = MoEMlp(dim=d, hidden=8, num_experts=e, top_k=1, capacity_factor=0.25)
    params = moe.init(jax.random.PRNGKey(1), x)
    y, _ = moe.apply(params, x)
    # capacity = ceil(0.25 * 8 / 2) = 1 -> exactly one token served
    nonzero_rows = int(np.sum(np.abs(np.asarray(y[0])).sum(-1) > 1e-9))
    assert nonzero_rows == 1


def test_moe_top2_uses_two_experts():
    d, e, tokens = 8, 4, 5
    x = jnp.asarray(np.random.RandomState(2).randn(1, tokens, d), jnp.float32)
    moe1 = MoEMlp(dim=d, hidden=8, num_experts=e, top_k=1, capacity_factor=8.0)
    moe2 = MoEMlp(dim=d, hidden=8, num_experts=e, top_k=2, capacity_factor=8.0)
    params = moe1.init(jax.random.PRNGKey(3), x)
    y1, _ = moe1.apply(params, x)
    y2, _ = moe2.apply(params, x)
    # top-2 adds the second expert's (gate-weighted) contribution
    assert float(np.abs(np.asarray(y2 - y1)).max()) > 1e-6


def test_swin_moe_tower_forward_and_registry():
    from iterated_learning_for_vlm_tpu.models import model_entry

    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    tower = SwinTransformer(TINY_MOE)
    params = tower.init(jax.random.PRNGKey(0), imgs)
    out = tower.apply(params, imgs)
    assert out["embed"].shape == (2, 16)
    assert "moe_aux" in out and np.isfinite(float(out["moe_aux"]))
    # aux ~ 1 for near-uniform routing, bounded by E
    assert 0.0 < float(out["moe_aux"]) <= TINY_MOE.num_experts

    model = model_entry({"type": "clip_swinMoE_B", "kwargs": {
        "image_encode": {"embed_dim": 32, "num_experts": 2},
        "text_encode": {"embed_dim": 32},
    }})
    assert model.vision_cfg.num_experts == 2


def test_moe_expert_parallel_sharding_rule():
    from jax.sharding import PartitionSpec as P

    from iterated_learning_for_vlm_tpu.parallel.sharding_rules import param_spec

    leaf = jnp.zeros((4, 8, 16))
    spec = param_spec(("visual", "stage1_block1", "moe_mlp", "w1"), leaf)
    assert spec == P("model", None, None)
    spec_b = param_spec(("visual", "stage1_block1", "moe_mlp", "b1"),
                        jnp.zeros((4, 1, 16)))
    assert spec_b == P("model", None, None)
    # gate stays replicated
    assert param_spec(("visual", "stage1_block1", "moe_mlp", "gate", "kernel"),
                      jnp.zeros((8, 4))) == P()


@pytest.mark.slow  # heavy 8-device compile; covered by make test-all + TPU smokes
def test_swin_moe_trains_one_step():
    """moe_aux flows into the jitted train step's loss."""
    from iterated_learning_for_vlm_tpu.models import CLIP
    from iterated_learning_for_vlm_tpu.models.text import TextConfig
    from iterated_learning_for_vlm_tpu.train.optim import (
        adamw_init, build_wd_tree, trainable_mask_tree,
    )
    from iterated_learning_for_vlm_tpu.train.schedule import cosine
    from iterated_learning_for_vlm_tpu.train.step import make_train_step
    from iterated_learning_for_vlm_tpu.train.train_state import TrainState

    tcfg = TextConfig(context_length=8, vocab_size=100, width=16, heads=2,
                      layers=1, embed_dim=16)
    model = CLIP(vision_cfg=TINY_MOE, text_cfg=tcfg)
    b = 4
    batch = {
        "image": jnp.asarray(np.random.RandomState(0).randn(b, 16, 16, 3), jnp.float32),
        "tokens": jnp.asarray(np.random.RandomState(1).randint(1, 99, (b, 8)), jnp.int32),
        "pad_mask": jnp.zeros((b, 8), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"], batch["tokens"],
                        batch["pad_mask"])["params"]
    wd = build_wd_tree(params, 0.1, {"bias": {"weight_decay": 0}})
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()),
                              jnp.zeros((1, 1)))
    step = make_train_step(model, cosine(1e-4, 1e-4, 0.0, 2, 10), wd,
                           is_fdt=False, grad_clip_type="norm",
                           grad_clip_value=1.0, donate=False)
    new_state, metrics = step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow  # re-tiered r4 (~16s); tower forward + expert-selection stay fast
def test_moe_expert_parallel_forward_matches_replicated():
    """Forward with expert params sharded over the mesh model axis ==
    replicated forward (GSPMD inserts the dispatch collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iterated_learning_for_vlm_tpu.parallel.mesh import create_mesh
    from iterated_learning_for_vlm_tpu.parallel.sharding_rules import (
        param_shardings,
    )

    mesh = create_mesh(8, model_parallel=2)
    imgs = jnp.asarray(np.random.RandomState(0).randn(8, 16, 16, 3), jnp.float32)
    tower = SwinTransformer(TINY_MOE)
    variables = tower.init(jax.random.PRNGKey(0), imgs)
    ref = tower.apply(variables, imgs)

    shardings = param_shardings(variables["params"], mesh)
    sharded = jax.tree.map(jax.device_put, variables["params"], shardings)
    data_sh = NamedSharding(mesh, P("data"))
    imgs_sh = jax.device_put(imgs, data_sh)
    with mesh:
        out = jax.jit(lambda p, x: tower.apply({"params": p}, x))(sharded, imgs_sh)
    np.testing.assert_allclose(np.asarray(out["embed"]), np.asarray(ref["embed"]),
                               atol=2e-4)
    np.testing.assert_allclose(float(out["moe_aux"]), float(ref["moe_aux"]),
                               rtol=1e-4)
