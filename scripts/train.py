#!/usr/bin/env python
"""Training launcher (reference ``run.sh`` + ``train_solver.py main()``).

torchrun's 4-process spawn is replaced by SPMD: one process drives the whole
mesh (``jax.distributed.initialize()`` handles multi-host when present).

  python scripts/train.py --config configs/clip_fdt_cc3m.yaml \
      --output_path out --batch_size 256 --exp_name fdt_run
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="CLIP / CLIP-FDT trainer")
    parser.add_argument("--config", required=True, type=str)
    parser.add_argument("--output_path", required=True, type=str)
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--debug", default=False, action="store_true")
    parser.add_argument("--exp_name", default="run")
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for multi-host pods")
    parser.add_argument("--coordinator", default=None,
                        help="with --multihost: explicit coordinator "
                             "'host:port' for clusters without platform "
                             "auto-discovery (e.g. the simulated "
                             "multi-process CPU cluster; TPU pods need none)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform via the config API (the "
                             "TPU plugin can override the env var); e.g. "
                             "--platform cpu for the simulated cluster")
    parser.add_argument("--cpu_devices", type=int, default=None,
                        help="with --platform cpu: virtual device count")
    args = parser.parse_args()

    if args.coordinator and (args.num_processes is None or args.process_id is None):
        parser.error("--coordinator requires --num_processes and --process_id")
    if args.cpu_devices and not args.platform:
        parser.error("--cpu_devices only applies with --platform cpu")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    if args.multihost:
        import jax

        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()

    from iterated_learning_for_vlm_tpu import enable_compilation_cache
    from iterated_learning_for_vlm_tpu.train.solver import Solver
    from iterated_learning_for_vlm_tpu.utils.config import load_config

    enable_compilation_cache()

    config = load_config(args.config)
    solver = Solver(
        config,
        output_path=args.output_path,
        exp_name=args.exp_name,
        batch_size=args.batch_size,
        ckpt_path=args.ckpt_path,
        debug=args.debug,
        seed=args.seed,
    )
    max_iter = int(config.lr_scheduler.kwargs.get("max_iter", 0))
    if solver._last_iter >= max_iter > 0:
        solver.logger.info("Training has been completed to max_iter!")
        return
    solver.train()


if __name__ == "__main__":
    main()
