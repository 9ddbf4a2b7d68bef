"""Parameter sharding rules for tensor-parallel headroom.

The reference is pure data-parallel (SURVEY §2.6: no TP/PP/SP anywhere), so
DP-only is parity. These rules add the natural Megatron-style tensor split
over the mesh's ``model`` axis for when models outgrow one chip:

- attention in_proj / mlp c_fc kernels: shard the output dim (column split),
- attention out_proj / mlp c_proj kernels: shard the input dim (row split),
- the FDT codebook: shard codebook rows (each chip scores a codebook slice;
  XLA all-gathers the pooled logits for the sparsemax),
- everything else replicated.

Under ``jit`` with these as input shardings, GSPMD inserts the
all-reduce after row-split matmuls automatically — no manual collectives.
"""
from __future__ import annotations

from typing import Any

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path-suffix match, partition spec builder given kernel ndim)
_COLUMN_SPLIT = {"c_fc", "fc_1"}  # [in, out] -> split out
_ROW_SPLIT = {"c_proj", "out_proj", "fc_2"}  # [in, out] -> split in
# Packed [q|k|v] in_proj: column split over the PACKED dim.  NOT a Megatron
# head split — tp-rank boundaries cut through the q/k/v sections (rank0 of
# tp=2 at D=768 holds all of q + half of k), so no rank owns complete
# (q,k,v) heads and GSPMD must regather the qkv activation before attention
# (the fused kernel's batch rule replicates non-batch dims anyway).  The
# split still balances the in_proj matmul FLOPs/param memory across ranks;
# a true head split needs a head-major param layout, which would break the
# torch-checkpoint interchange (tools/torch_checkpoint.py packed mapping).
_QKV = {"in_proj"}


def param_spec(path, leaf) -> P:
    p = tuple(str(x) for x in path)
    ndim = getattr(leaf, "ndim", 0)
    # Swin-MoE stacked expert params [E, ...]: shard the expert dim over the
    # model axis (expert parallelism — each chip hosts E/tp experts; the
    # one-hot dispatch einsum becomes an all-to-all under GSPMD).
    if len(p) >= 2 and p[-2] == "moe_mlp" and p[-1] in ("w1", "w2", "b1", "b2"):
        return P(MODEL_AXIS, *((None,) * (ndim - 1)))
    if len(p) >= 2 and p[-1] == "kernel" and ndim >= 2:
        parent = p[-2]
        lead = (None,) * (ndim - 2)  # scanned layer dim etc. unsharded
        if parent in _COLUMN_SPLIT or parent in _QKV:
            return P(*lead, None, MODEL_AXIS)
        if parent in _ROW_SPLIT:
            return P(*lead, MODEL_AXIS, None)
    if p[-1] == "space_dict" or (p and p[0] == "space_dict"):
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for params (and, by fmap, adam moments)."""
    flat = traverse_util.flatten_dict(params)
    out = {
        path: NamedSharding(mesh, param_spec(path, leaf)) for path, leaf in flat.items()
    }
    return traverse_util.unflatten_dict(out)


def shard_params(params: Any, mesh: Mesh) -> Any:
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        from .mesh import replicate_tree

        return replicate_tree(params, mesh)
    from .mesh import put_global

    shardings = param_shardings(params, mesh)
    return jax.tree.map(put_global, params, shardings)


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: params + adam moments follow the param rules;
    masks/scalars/codebook snapshot replicated except stored_codebook which
    mirrors space_dict."""
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        from .mesh import replicate_tree

        return replicate_tree(state, mesh)
    from .mesh import put_global

    p_sh = param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())

    def put_like(tree, shardings):
        return jax.tree.map(put_global, tree, shardings)

    new_opt = dict(state.opt_state)
    new_opt["mu"] = put_like(state.opt_state["mu"], p_sh)
    new_opt["nu"] = put_like(state.opt_state["nu"], p_sh)
    new_opt["count"] = jax.tree.map(lambda x: put_global(x, repl),
                                    state.opt_state["count"])
    sd_sharding = NamedSharding(mesh, P(MODEL_AXIS, None))
    return state.replace(
        params=put_like(state.params, p_sh),
        opt_state=new_opt,
        trainable=jax.tree.map(lambda x: put_global(x, repl), state.trainable),
        stored_codebook=put_global(state.stored_codebook, sd_sharding)
        if state.stored_codebook.ndim == 2 and state.stored_codebook.shape[0] > 1
        else put_global(state.stored_codebook, repl),
        step=put_global(state.step, repl),
        hold_codebook=put_global(state.hold_codebook, repl),
        ema_buffer=put_global(state.ema_buffer, repl),
        ema_clip_count=put_global(state.ema_clip_count, repl),
        spectral_u=jax.tree.map(lambda x: put_global(x, repl), state.spectral_u)
        if state.spectral_u is not None else None,
        batch_stats=jax.tree.map(lambda x: put_global(x, repl), state.batch_stats)
        if state.batch_stats is not None else None,
    )
