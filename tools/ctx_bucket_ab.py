#!/usr/bin/env python
"""Same-process A/B: full-77 vs bucketed-32 text context on the real chip.

TPU timing drifts +-20% between python processes, so the pair must run in
one process (bench.py pairs convention).  Prints two bench JSON lines.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    # Pin the text-attention path IDENTICAL across both runs (bench.main's
    # shape-aware default would flip fused_attn_text between 77 and 32,
    # conflating the bucketing win with the kernel win — which
    # tools/text_attn_ctx32_ab.py measures separately).
    fixed = dict(batch_size=256, steps=steps,
                 fused_attn_text=False, fused_attn_text_sample_group=2)
    print("ctx=77 (reference full context):", flush=True)
    bench.main(ctx=77, **fixed)
    print("ctx=32 (CC3M bucket):", flush=True)
    bench.main(ctx=32, **fixed)


if __name__ == "__main__":
    main()
