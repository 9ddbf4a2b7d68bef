"""Same-process sweep of the fused codebook kernel's (bb, nn) tiles on TPU.

Times the pooled-logits forward and backward pallas kernels
(``ops/codebook_attention.py``) at the bench shapes (bs256, sd 4096x512)
across batch-tile (bb) and codebook-tile (nn) sizes, against the XLA einsum
chain.  Same-process only: TPU timings drift +-20% between processes.

The shipping defaults are bb=8, nn=512 (round-1 sweep at bs64).

Usage: python tools/codebook_tile_sweep.py [vision|text]
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from iterated_learning_for_vlm_tpu.ops.codebook_attention import (  # noqa: E402
    _pooled_bwd, _pooled_fwd,
)


def timeit(fn, *args, steps=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # host fence (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def xla_pooled(q, sd, keep, temperature):
    inner = jnp.einsum("btd,nd->btn", q, sd,
                       preferred_element_type=jnp.float32)
    inner = inner * (q.shape[-1] ** -0.5)
    if keep is not None:
        inner = inner * keep[..., None]
    inner = inner / temperature
    return jnp.max(inner, axis=1)


def sweep(name, b, t, masked, configs):
    d, n = 512, 4096
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    sd = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    keep = (jnp.asarray(rng.random((b, t)) < 0.6, jnp.float32)
            if masked else None)
    temp = 125.0

    xf = jax.jit(lambda q_, s_: xla_pooled(q_, s_, keep, temp))
    pooled = xf(q, sd)
    amax = jnp.argmax(
        jnp.einsum("btd,nd->btn", q, sd, preferred_element_type=jnp.float32),
        axis=1).astype(jnp.int32)
    dp = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)

    def xb(q_, s_, g_):
        _, vjp = jax.vjp(lambda qq, ss: xla_pooled(qq, ss, keep, temp), q_, s_)
        return vjp(g_)

    print(f"-- {name}: B={b} T={t} N={n} D={d} masked={masked}")
    print(f"   xla          : fwd {timeit(xf, q, sd):7.3f} ms   "
          f"bwd {timeit(jax.jit(xb), q, sd, dp):7.3f} ms", flush=True)
    for bb, nn in configs:
        try:
            f = jax.jit(functools.partial(
                lambda q_, s_, bb=bb, nn=nn: _pooled_fwd(q_, s_, keep, temp, bb=bb, nn=nn)))
            tf = timeit(f, q, sd)
        except Exception as e:  # VMEM OOM / Mosaic reject
            print(f"   bb={bb:<3} nn={nn:<5}: fwd FAIL ({type(e).__name__})",
                  flush=True)
            continue
        try:
            fb = jax.jit(functools.partial(
                lambda q_, s_, a_, g_, bb=bb, nn=nn: _pooled_bwd(
                    q_, s_, keep, temp, a_, g_, bb=bb, nn=nn)))
            tb = timeit(fb, q, sd, amax, dp)
            msg = f"bwd {tb:7.3f} ms"
        except Exception as e:
            msg = f"bwd FAIL ({type(e).__name__})"
        print(f"   bb={bb:<3} nn={nn:<5}: fwd {tf:7.3f} ms   {msg}", flush=True)
        # correctness spot check at this tiling
        np.testing.assert_allclose(np.asarray(f(q, sd)[0], np.float32),
                                   np.asarray(pooled, np.float32),
                                   atol=2e-2, rtol=2e-2)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "vision"
    cfgs = [(8, 512), (16, 512), (32, 512), (8, 1024), (16, 1024),
            (32, 1024), (64, 1024), (16, 2048), (32, 2048), (8, 4096),
            (16, 4096), (4, 512)]
    if which == "vision":
        sweep("vision", 256, 50, False, cfgs)
    elif which == "text32":
        # the ctx-32 shipping bucket (data.train.context_buckets)
        sweep("text32", 256, 32, True, cfgs)
    else:
        sweep("text", 256, 77, True, cfgs)
