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
    # Pin the text-attention path IDENTICAL across both runs (bench's
    # shape-aware default would flip fused_attn_text between 77 and 32,
    # conflating the bucketing win with the kernel win — which
    # tools/text_attn_ctx32_ab.py measures separately).
    fixed = dict(batch_size=256, steps=steps,
                 fused_attn_text=False, fused_attn_text_sample_group=2)
    import json
    print("ctx=77 (reference full context):", flush=True)
    print(json.dumps({"pairs_per_sec": round(bench.measure(ctx=77, **fixed), 2)}), flush=True)
    print("ctx=32 (CC3M bucket):", flush=True)
    print(json.dumps({"pairs_per_sec": round(bench.measure(ctx=32, **fixed), 2)}), flush=True)


if __name__ == "__main__":
    main()
