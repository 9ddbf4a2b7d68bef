"""Console entry points (mirrors scripts/train.py for installed usage)."""
from __future__ import annotations


def train_main():
    import runpy
    import os
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scripts", "train.py")
    if os.path.exists(script):
        sys.argv[0] = script
        runpy.run_path(script, run_name="__main__")
    else:  # installed package: inline the launcher
        import argparse

        from .train.solver import Solver
        from .utils.config import load_config

        p = argparse.ArgumentParser()
        p.add_argument("--config", required=True)
        p.add_argument("--output_path", required=True)
        p.add_argument("--batch_size", type=int, default=None)
        p.add_argument("--exp_name", default="run")
        p.add_argument("--ckpt_path", default=None)
        p.add_argument("--debug", action="store_true")
        args = p.parse_args()
        Solver(load_config(args.config), output_path=args.output_path,
               exp_name=args.exp_name, batch_size=args.batch_size,
               ckpt_path=args.ckpt_path, debug=args.debug).train()
