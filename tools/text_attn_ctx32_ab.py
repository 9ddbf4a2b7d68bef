#!/usr/bin/env python
"""Same-process A/B: fused TEXT attention at the ctx-32 shipping bucket.

At the reference's full 77-token context the fused tiny-seq attention kernel
ties XLA on the text tower and ships vision-only (README perf table).  The
context-bucketed pipeline runs the text tower at S=32, where per-program
dots are smaller and XLA's layout transposes proportionally costlier — this
re-measures the ablation at the shipping shape.  Prints one bench JSON line
per config (bench.py pairs convention: TPU timing drifts +-20% between
python processes, so the whole sweep runs in one process).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    configs = [
        ("text=XLA (shipping)", dict(fused_attn_text=False)),
        ("text=fused g=2 sg=2", dict(fused_attn_text=True,
                                     fused_attn_text_group=2,
                                     fused_attn_text_sample_group=2)),
        ("text=fused g=2 sg=4", dict(fused_attn_text=True,
                                     fused_attn_text_group=2,
                                     fused_attn_text_sample_group=4)),
        ("text=fused g=4 sg=2", dict(fused_attn_text=True,
                                     fused_attn_text_group=4,
                                     fused_attn_text_sample_group=2)),
    ]
    for label, kw in configs:
        print(f"ctx=32, {label}:", flush=True)
        import json
        pps = bench.measure(batch_size=256, steps=steps, ctx=32, **kw)
        print(json.dumps({"pairs_per_sec": round(pps, 2)}), flush=True)


if __name__ == "__main__":
    main()
