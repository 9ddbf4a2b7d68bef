"""SPMD partitioning rules for the Pallas kernels (ops/partitioning.py).

Without a rule, a Mosaic custom call under a sharded jit is replicated by
the SPMD partitioner (all-gathering the global batch onto every chip).
These tests pin, on the 8-device CPU mesh:

- numerical equality of the dp-sharded and unsharded paths (fwd + grads),
- that the lowered fwd program contains NO all-gather (the kernel really
  runs shard-local; the codebook bwd legitimately psums its dsd output),
- that a dp x tp layout (extra model-axis sharding on the operands) still
  produces correct values (the rule replicates non-batch dims).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iterated_learning_for_vlm_tpu.ops.codebook_attention import (
    pooled_codebook_logits,
)
from iterated_learning_for_vlm_tpu.ops.fused_attention import (
    fused_tiny_attention,
)


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def test_fused_attention_dp_sharded_matches_unsharded():
    b, s, heads, hd = 16, 10, 4, 8
    d = heads * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.float32)
    bias = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)

    def f(x):
        return fused_tiny_attention(x, heads, bias=bias, head_group=2)

    ref = jax.jit(f)(qkv)
    mesh = _mesh((8,), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    out = jax.jit(f, in_shardings=sh)(jax.device_put(qkv, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients flow through the partitioned bwd kernel identically
    g = jax.grad(lambda x: jnp.sum(jnp.tanh(f(x))))
    ref_g = jax.jit(g)(qkv)
    out_g = jax.jit(g, in_shardings=sh)(jax.device_put(qkv, sh))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-4)


def test_fused_attention_fwd_lowering_has_no_all_gather():
    b, s, heads, hd = 16, 10, 4, 8
    d = heads * hd
    qkv = jnp.ones((b, s, 3 * d), jnp.float32)
    mesh = _mesh((8,), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    txt = (
        jax.jit(lambda x: fused_tiny_attention(x, heads, head_group=2),
                in_shardings=sh)
        .lower(jax.device_put(qkv, sh))
        .compile()
        .as_text()
    )
    assert "all-gather" not in txt and "all-reduce" not in txt, (
        "batch-pointwise kernel should run shard-local"
    )


def test_flash_attention_dp_sharded_matches_unsharded():
    """The (ablation-only) flash kernel carries the same batch-dp rule as
    the shipping kernels: without it a dp-sharded jit would all-gather the
    global [B,S,H,D] q/k/v onto every chip."""
    from iterated_learning_for_vlm_tpu.ops.flash_attention import flash_attention

    b, s, heads, hd = 16, 8, 2, 8
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, heads, hd)), jnp.float32)
               for _ in range(3))
    bias = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)

    def f(q, k, v):
        return flash_attention(q, k, v, bias=bias)

    ref = jax.jit(f)(q, k, v)
    mesh = _mesh((8,), ("data",))
    sh = NamedSharding(mesh, P("data", None, None, None))
    args = [jax.device_put(t, sh) for t in (q, k, v)]
    out = jax.jit(f, in_shardings=(sh, sh, sh))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    txt = (jax.jit(f, in_shardings=(sh, sh, sh))
           .lower(*args).compile().as_text())
    assert "all-gather" not in txt and "all-reduce" not in txt

    g = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(f(q, k, v))), argnums=(0, 1, 2))
    ref_g = jax.jit(g)(q, k, v)
    out_g = jax.jit(g, in_shardings=(sh, sh, sh))(*args)
    for a, r in zip(out_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


@pytest.mark.parametrize("with_keep", [True, False])
def test_codebook_kernel_dp_sharded_matches_unsharded(with_keep):
    b, t, dd, n = 16, 6, 32, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, dd)), jnp.float32)
    sd = jnp.asarray(rng.standard_normal((n, dd)), jnp.float32)
    keep = (
        jnp.asarray(rng.integers(0, 2, (b, t)), jnp.float32) if with_keep else None
    )
    temp = 7.0

    def loss(q_, sd_):
        pooled = pooled_codebook_logits(q_, sd_, keep, temp)
        return jnp.sum(jnp.tanh(pooled)), pooled

    grad_fn = jax.grad(loss, argnums=(0, 1), has_aux=True)
    (dq_ref, dsd_ref), pooled_ref = jax.jit(grad_fn)(q, sd)

    mesh = _mesh((8,), ("data",))
    qs = NamedSharding(mesh, P("data", None, None))
    sds = NamedSharding(mesh, P())
    (dq, dsd), pooled = jax.jit(grad_fn, in_shardings=(qs, sds))(
        jax.device_put(q, qs), jax.device_put(sd, sds)
    )
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-5)
    # dsd is the cross-batch reduction the rule psums
    np.testing.assert_allclose(np.asarray(dsd), np.asarray(dsd_ref), atol=1e-4)


def test_fused_attention_dp_tp_mesh_correct():
    """Operands additionally sharded on the feature dim (tp axis): the rule
    replicates non-batch dims (a reshard, not a failure) and values match."""
    b, s, heads, hd = 16, 10, 4, 8
    d = heads * hd
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.float32)
    ref = jax.jit(lambda x: fused_tiny_attention(x, heads, head_group=2))(qkv)

    mesh = _mesh((4, 2), ("data", "model"))
    sh = NamedSharding(mesh, P("data", None, "model"))
    out = jax.jit(
        lambda x: fused_tiny_attention(x, heads, head_group=2), in_shardings=sh
    )(jax.device_put(qkv, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("b,n_dev,batch_block,sg", [
    (8, 8, 8, 2),    # local b=1: shard must re-derive (bb=1, sg=1) AND its mask
    pytest.param(12, 2, 12, 4, marks=pytest.mark.slow),
    # local bb=6 not divisible by requested sg=4 -> sg=3 locally
])
def test_fused_attention_sample_group_sharded_matches_unsharded(b, n_dev, batch_block, sg):
    """Regression (round-2.1 review): the SPMD rule re-runs the shard-local
    lowering on each device's batch, which re-derives (bb, sg); the group
    mask must be rebuilt at THAT tiling.  The original code passed a
    globally-sized mask across the boundary — local b=1 with the shipping
    sample_group=2 crashed with a mask-shape mismatch, and a local bb
    not divisible by sg silently skipped tail samples (garbage output)."""
    s, heads, hd = 10, 4, 8
    d = heads * hd
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.float32)
    bias = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)

    def f(x):
        return fused_tiny_attention(x, heads, bias=bias, head_group=2,
                                    batch_block=batch_block, sample_group=sg)

    ref = jax.jit(f)(qkv)
    mesh = _mesh((n_dev,), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    out = jax.jit(f, in_shardings=sh)(jax.device_put(qkv, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g = jax.grad(lambda x: jnp.sum(jnp.tanh(f(x))))
    ref_g = jax.jit(g)(qkv)
    out_g = jax.jit(g, in_shardings=sh)(jax.device_put(qkv, sh))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-4)


def test_put_global_and_host_local_single_process_equivalence():
    """Single-process: put_global == device_put; host_local_to_global ==
    shard_batch (the multi-process forms are pinned by
    tests/test_multiprocess.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iterated_learning_for_vlm_tpu.parallel.mesh import (
        create_mesh, host_local_to_global, put_global, shard_batch,
    )

    mesh = create_mesh(8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sh = NamedSharding(mesh, P("data"))
    a = put_global(jnp.asarray(x), sh)
    b = jax.device_put(jnp.asarray(x), sh)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding == b.sharding

    batch = {"image": x, "tokens": np.arange(8, dtype=np.int32)[:, None]}
    g1 = host_local_to_global(batch, mesh)
    g2 = shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g2[k]))
        assert g1[k].sharding.spec == g2[k].sharding.spec
