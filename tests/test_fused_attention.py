"""Parity of the fused tiny-seq attention kernel against the XLA path.

The kernel (``ops/fused_attention.py``) restructures per-head attention into
grouped block-diagonal matmuls on the packed QKV layout; these tests pin that
its forward AND backward match the reference einsum formulation at the CLIP
tower shapes (image S=50 H=12, text S=77 H=8 causal), for several head-group
sizes and batch blocks (interpret mode on the CPU mesh).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models.layers import MultiheadAttention
from iterated_learning_for_vlm_tpu.ops.fused_attention import (
    fused_tiny_attention, xla_attention_reference,
)




def _causal(s):
    return jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)


@pytest.mark.parametrize("shape,causal,group", [
    ((6, 50, 12, 64), False, 4),   # image tower shape
    pytest.param((6, 50, 12, 64), False, 12,
                 marks=pytest.mark.slow),  # one dot for all heads
    ((4, 77, 8, 64), True, 4),     # text tower shape, causal
    pytest.param((4, 77, 8, 64), True, 1,
                 marks=pytest.mark.slow),  # per-head dots
    ((5, 13, 4, 8), False, 2),     # odd batch -> bb fallback
])
def test_fused_matches_xla_fwd_and_grad(shape, causal, group):
    b, s, h, hd = shape
    d = h * hd
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, s, 3 * d), jnp.float32)
    bias = _causal(s) if causal else None

    ref = xla_attention_reference(qkv, h, bias)
    got = fused_tiny_attention(qkv, h, bias=bias, head_group=group, batch_block=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def loss_fused(x):
        return jnp.sum(jnp.sin(fused_tiny_attention(
            x, h, bias=bias, head_group=group, batch_block=4)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(xla_attention_reference(x, h, bias)))

    g_got = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)


def test_mha_module_fused_flag_same_params_same_output():
    """fused_attn only changes scheduling: identical param tree, same output."""
    kw = dict(num_heads=8, attn_std=0.02, proj_std=0.02)
    m_ref = MultiheadAttention(**kw)
    m_fused = MultiheadAttention(**kw, fused_attn=True, fused_attn_group=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 77, 512), jnp.float32)
    bias = _causal(77)
    p = m_ref.init(jax.random.PRNGKey(2), x, bias=bias)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(
        m_fused.init(jax.random.PRNGKey(2), x, bias=bias)["params"])
    a, _ = m_ref.apply({"params": p}, x, bias=bias)
    b_, _ = m_fused.apply({"params": p}, x, bias=bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=2e-5)


def test_mha_fused_bf16_close_to_fp32_reference():
    """bf16 compute under the fused kernel stays within bf16 tolerance."""
    m32 = MultiheadAttention(num_heads=12, dtype=jnp.float32)
    mbf = MultiheadAttention(num_heads=12, dtype=jnp.bfloat16,
                             fused_attn=True, fused_attn_group=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 50, 768), jnp.float32)
    p = m32.init(jax.random.PRNGKey(4), x)["params"]
    a, _ = m32.apply({"params": p}, x)
    b_, _ = mbf.apply({"params": p}, x.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_, dtype=np.float32),
                               atol=5e-2, rtol=5e-2)


def test_model_entry_per_tower_fused_attn_plumbing():
    """Configs can enable the kernel per tower (vision-only is the shipped
    perf configuration — text S=77 ties XLA, bench.py --fused-attn)."""
    from iterated_learning_for_vlm_tpu.models import model_entry

    m = model_entry({"type": "clip_vitb32", "kwargs": {
        "image_encode": {"fused_attn": True, "fused_attn_group": 4},
        "fused_attn": False,
    }})
    assert m.vision_cfg.fused_attn is True
    assert m.vision_cfg.fused_attn_group == 4
    assert m.text_cfg.fused_attn is False
    # global key reaches both towers when no per-tower override is given
    m2 = model_entry({"type": "clip_fdt_vitb32", "kwargs": {"fused_attn": True}})
    assert m2.vision_cfg.fused_attn is True and m2.text_cfg.fused_attn is True


def test_fused_attention_under_dp_sharded_jit():
    """The kernel must run inside a jit whose inputs are batch-sharded over
    the data mesh (the solver's step layout): values AND grads must match
    the unsharded XLA reference."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    h, s, d = 4, 13, 32 * 4
    qkv = jax.random.normal(jax.random.PRNGKey(0), (16, s, 3 * d), jnp.float32)
    shardings = NamedSharding(mesh, P("data"))
    qkv_sharded = jax.device_put(qkv, shardings)

    def loss(x):
        return jnp.sum(jnp.sin(fused_tiny_attention(x, h, head_group=2,
                                                    batch_block=2)))

    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(xla_attention_reference(x, h, None))))(qkv)
    with mesh:
        g = jax.jit(jax.grad(loss), in_shardings=shardings)(qkv_sharded)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("shape,causal,group,sg", [
    pytest.param((8, 50, 12, 64), False, 4, 2,
                 marks=pytest.mark.slow),  # image tower + sample fusion
    pytest.param((8, 77, 8, 64), True, 2, 2,
                 marks=pytest.mark.slow),  # text tower, causal + sample fusion
    ((8, 13, 4, 8), False, 2, 4),     # small padded seq, deep sample fusion
    ((6, 10, 2, 8), True, 2, 3),      # sg falls back to a divisor of bb
])
def test_sample_group_matches_xla_fwd_and_grad(shape, causal, group, sg):
    """``sample_group`` fuses several samples into one block-diagonal matmul
    (the kernel body is overhead-bound at tiny S); values and grads must be
    unchanged for every (head_group, sample_group) tiling."""
    b, s, h, hd = shape
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(5), (b, s, 3 * d), jnp.float32)
    bias = _causal(s) if causal else None

    ref = xla_attention_reference(qkv, h, bias)
    got = jax.jit(lambda x: fused_tiny_attention(
        x, h, bias=bias, head_group=group, batch_block=8, sample_group=sg))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(xla_attention_reference(x, h, bias))))(qkv)
    g_got = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(fused_tiny_attention(
        x, h, bias=bias, head_group=group, batch_block=8, sample_group=sg)))))(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("gb,sgb", [
    (4, 1),
    pytest.param(6, 2, marks=pytest.mark.slow),
    pytest.param(2, 4, marks=pytest.mark.slow),
])
def test_separate_bwd_tiling_matches_xla_grad(gb, sgb):
    """The backward kernel's (head_group_bwd, sample_group_bwd) may differ
    from the forward tiling (its body runs 6 dots vs fwd's 2); gradients must
    be identical at every combination."""
    b, s, h, hd = 8, 50, 12, 8
    d = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(7), (b, s, 3 * d), jnp.float32)

    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(xla_attention_reference(x, h, None))))(qkv)
    g_got = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(fused_tiny_attention(
        x, h, head_group=2, batch_block=8, sample_group=2,
        head_group_bwd=gb, sample_group_bwd=sgb)))))(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("shape,causal,group,sg", [
    ((4, 50, 12, 64), False, 2, 2),   # image tower shape (shipped tiling)
    pytest.param((4, 77, 8, 64), True, 2, 2,
                 marks=pytest.mark.slow),  # text tower shape, causal
])
def test_absorbed_qkv_bias_matches_xla_fwd_and_grad(shape, causal, group, sg):
    """``qkv_bias`` absorbs the packed in_proj bias into the kernel's VMEM
    stack stores: given the PRE-bias product, values and all grads (including
    d(bias)) must match the XLA reference run on ``qkv + bias``."""
    b, s, h, hd = shape
    d = h * hd
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    qkv = jax.random.normal(k1, (b, s, 3 * d), jnp.float32)
    b3 = jax.random.normal(k2, (3 * d,), jnp.float32)
    bias = _causal(s) if causal else None

    ref = xla_attention_reference(qkv + b3, h, bias)
    got = jax.jit(lambda x, bb_: fused_tiny_attention(
        x, h, bias=bias, head_group=group, batch_block=4, sample_group=sg,
        qkv_bias=bb_))(qkv, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def loss_fused(x, bb_):
        return jnp.sum(jnp.sin(fused_tiny_attention(
            x, h, bias=bias, head_group=group, batch_block=4, sample_group=sg,
            qkv_bias=bb_)))

    def loss_ref(x, bb_):
        return jnp.sum(jnp.sin(xla_attention_reference(x + bb_, h, bias)))

    g_got = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(qkv, b3)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, b3)
    for gg, gr in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4)


def test_group_mask_jit_matches_eager_small_padded_seq():
    """Regression: XLA:CPU miscompiled the original gather-based
    ``build_group_mask`` under jit at small padded sequences (seq=16,
    valid=10): jit and eager disagreed on which causal entries were masked,
    silently corrupting grouped attention.  The tile-based build must produce
    identical masks jitted and eager, and the kernel must match XLA at
    exactly the shape that exposed the bug."""
    from iterated_learning_for_vlm_tpu.ops.fused_attention import build_group_mask

    bias = _causal(10)
    eager = build_group_mask(16, 2, bias, valid=10)
    jitted = jax.jit(lambda b: build_group_mask(16, 2, b, valid=10))(bias)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(jitted))

    qkv = jax.random.normal(jax.random.PRNGKey(6), (4, 10, 3 * 2 * 8), jnp.float32)
    ref = xla_attention_reference(qkv, 2, bias)
    got = jax.jit(lambda x: fused_tiny_attention(x, 2, bias=bias, head_group=2))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape,causal,group,sg,qb", [
    ((4, 50, 12, 8), False, 2, 2, False),
    ((4, 16, 4, 8), True, 2, 1, True),
    pytest.param((4, 77, 8, 8), True, 2, 2, True, marks=pytest.mark.slow),
])
def test_bwd_fuse3_matches_5dot_backward(shape, causal, group, sg, qb):
    """The 3-dot backward body (``bwd_fuse3``: [q|do] @ blockdiag(k,v)^T then
    [ds|p]^T @ [q|do]) computes the same math as the 5-dot body in the same
    precisions; only the contraction widths differ (zero blocks fold into
    the accumulations), so values agree to fp32 reassociation roundoff."""
    b, s, h, hd = shape
    d = h * hd
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    qkv = jax.random.normal(k1, (b, s, 3 * d), jnp.float32)
    b3 = jax.random.normal(k2, (3 * d,), jnp.float32) if qb else None
    bias = _causal(s) if causal else None

    def loss(x, bb_, fuse3):
        return jnp.sum(jnp.sin(fused_tiny_attention(
            x, h, bias=bias, head_group=group, batch_block=4,
            sample_group=sg, qkv_bias=bb_, bwd_fuse3=fuse3)))

    argnums = (0, 1) if qb else (0,)
    g_old = jax.jit(jax.grad(lambda x, bb_: loss(x, bb_, False),
                             argnums=argnums))(qkv, b3)
    g_new = jax.jit(jax.grad(lambda x, bb_: loss(x, bb_, True),
                             argnums=argnums))(qkv, b3)
    for go, gn in zip(g_old, g_new):
        np.testing.assert_allclose(np.asarray(go), np.asarray(gn),
                                   atol=1e-5, rtol=1e-5)
    g_ref = jax.grad(lambda x, bb_: jnp.sum(jnp.sin(xla_attention_reference(
        x + (bb_ if qb else 0.0), h, bias))), argnums=argnums)(qkv, b3)
    for gn, gr in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4)
