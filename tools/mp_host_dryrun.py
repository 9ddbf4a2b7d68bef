#!/usr/bin/env python
"""Multi-HOST SPMD dryrun worker: one OS process per simulated host.

The in-process 8-device CPU mesh (tests, ``make dryrun``) validates
multi-CHIP semantics but runs a single process — it cannot catch bugs in
the true multi-host path: ``jax.distributed`` init, per-process data
ingestion (`host_local_to_global`), cross-process collectives (Gloo on
CPU; ICI/DCN on pods) and replicated-state construction without a rank-0
broadcast.  This worker runs ONE real train step on a tiny CLIP-FDT as one
process of an N-process cluster; ``tests/test_multiprocess.py`` spawns two
of them and pins the loss/updated params to a single-process run of the
same global batch.  Reference counterpart: torchrun's process-per-GPU DDP
(``run.sh`` + ``torch_ddp_dist.py``).

Usage (each simulated host):
    python tools/mp_host_dryrun.py --process-id I --num-processes N \
        --port 12399 [--devices-per-process 2] [--global-batch 8]
Prints ``MP_LOSS <float>`` and ``MP_CHECKSUM <float>`` for the harness.
"""
import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--devices-per-process", type=int, default=2)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tp ways (Megatron splits + row-sharded codebook "
                        "across the cluster's devices)")
    p.add_argument("--fused-kernels", action="store_true",
                   help="enable both Pallas kernels (interpret mode on CPU) "
                        "so their custom_partitioning SPMD rules run the "
                        "shard-local lowering in every process")
    p.add_argument("--checkpoint-dir", default=None,
                   help="also exercise the multi-host Orbax path: save the "
                        "stepped state from ALL processes (the checkpointer "
                        "coordinates the write), restore it, and print "
                        "MP_RESTORED_STEP")
    args = p.parse_args()

    # platform + virtual device forcing must precede first jax device use
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    import __graft_entry__ as graft
    from iterated_learning_for_vlm_tpu.parallel.mesh import (
        create_mesh, host_local_to_global,
    )
    from iterated_learning_for_vlm_tpu.parallel.sharding_rules import shard_state
    from iterated_learning_for_vlm_tpu.train.optim import (
        adamw_init, build_wd_tree, trainable_mask_tree,
    )
    from iterated_learning_for_vlm_tpu.train.schedule import cosine
    from iterated_learning_for_vlm_tpu.train.step import make_train_step
    from iterated_learning_for_vlm_tpu.train.train_state import TrainState

    assert jax.process_count() == args.num_processes
    # dp (and optionally tp) over ALL processes' devices
    mesh = create_mesh(model_parallel=args.model_parallel)
    from iterated_learning_for_vlm_tpu.parallel.mesh import warm_collectives

    warm_collectives(mesh)  # pin Gloo contexts before the compile skew

    if args.fused_kernels:
        from iterated_learning_for_vlm_tpu.models import (
            CLIPFDT, FDTConfig, TextConfig, VisionConfig,
        )

        model = CLIPFDT(
            vision_cfg=VisionConfig(input_resolution=32, patch_size=16,
                                    width=64, layers=2, heads=2, embed_dim=32,
                                    fused_attn=True),
            text_cfg=TextConfig(context_length=16, width=64, heads=2,
                                layers=2, embed_dim=32),
            fdt_cfg=FDTConfig(sd_num=128, sd_dim=32, raw_img_ft_dim=64,
                              raw_txt_ft_dim=64, sd_temperature=1000.0,
                              sparsemax_method="bisect",
                              use_fused_kernel=True),
        )
    else:
        model = graft._flagship_model(tiny=True)
    b = args.global_batch
    res = model.vision_cfg.input_resolution
    ctx = model.text_cfg.context_length
    rng = np.random.default_rng(0)  # same GLOBAL batch on every process
    gbatch = {
        "image": rng.standard_normal((b, res, res, 3), dtype=np.float32),
        "tokens": rng.integers(1, 49407, (b, ctx)).astype(np.int32),
        "pad_mask": np.zeros((b, ctx), np.float32),
    }
    # each process contributes its DATA-RANK's rows (the multi-host loader
    # contract, parallel/mesh.py:data_rank_world): when tp spans processes,
    # same-dp-row processes contribute IDENTICAL rows, matching the
    # solver's loader split
    from iterated_learning_for_vlm_tpu.parallel.mesh import data_rank_world

    dr, dw = data_rank_world(mesh)
    assert b % dw == 0, (
        f"--global-batch {b} must divide by the {dw} loader streams")
    lo = dr * (b // dw)
    hi = lo + b // dw
    local = {k: v[lo:hi] for k, v in gbatch.items()}
    batch = host_local_to_global(local, mesh)

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(gbatch["image"][:1]), jnp.asarray(gbatch["tokens"][:1]),
        jnp.asarray(gbatch["pad_mask"][:1]),
    )["params"]
    wd_tree = build_wd_tree(params, 0.1, {"bias": {"weight_decay": 0}})
    state = TrainState.create(
        params, adamw_init(params), trainable_mask_tree(params, frozenset()),
        params["space_dict"],
    )
    state = shard_state(state, mesh)  # replicated (dp) / tp-sharded, via put_global

    step_fn = make_train_step(
        model, cosine(5e-5, 5e-4, 0.0, 10, 100), wd_tree, is_fdt=True,
        grad_clip_type="logit_scale_param_value", grad_clip_value=3.0,
        grad_clip_max_value=6.0, donate=False,
    )
    with mesh:
        new_state, metrics = step_fn(state, batch, jnp.asarray(1000.0))
    loss = float(metrics["loss"])
    checksum = float(sum(
        jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
        for leaf in jax.tree.leaves(new_state.params)))
    print(f"MP_LOSS {loss:.6f}", flush=True)
    print(f"MP_CHECKSUM {checksum:.4f}", flush=True)

    if args.checkpoint_dir:
        # multi-host checkpointing contract (README runbook): save_checkpoint
        # is called on EVERY process; Orbax coordinates the distributed write
        from iterated_learning_for_vlm_tpu.train.checkpoint import (
            restore_checkpoint, save_checkpoint, wait_for_saves,
        )

        save_checkpoint(args.checkpoint_dir, new_state, 1)
        wait_for_saves()
        restored = restore_checkpoint(
            os.path.join(args.checkpoint_dir, "ckpt_1"), new_state)
        r_checksum = float(sum(
            jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
            for leaf in jax.tree.leaves(restored.params)))
        assert abs(r_checksum - checksum) < 1e-2, (r_checksum, checksum)
        print(f"MP_RESTORED_STEP {int(restored.step)}", flush=True)


if __name__ == "__main__":
    main()
