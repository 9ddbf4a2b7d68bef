#!/usr/bin/env python
"""Host ingestion throughput microbench: tar -> JPEG decode -> augment -> tokenize.

The device step is ~2000 pairs/s/chip (bench.py); real-shard training is
input-bound on hosts with few cores, so this tool measures the host side of
the pipeline in isolation (reference equivalent: the torch DataLoader worker
path, ``prototype/data/datasets/clip_dataset_wsd.py``) — per augment recipe
and worker count.  Pure host code, no accelerator needed.

Usage:
    python tools/bench_ingest.py [--shard-dir /tmp/ilvlm_ingest_shards]
        [--batches 8] [--batch-size 64] [--workers 1 4]
Prints one JSON line per configuration.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from iterated_learning_for_vlm_tpu.data.pipeline import get_wds_dataset
from iterated_learning_for_vlm_tpu.data.tokenizer import get_tokenizer


def ensure_shards(shard_dir: str, shards: int = 2, per_shard: int = 500) -> str:
    pattern = os.path.join(shard_dir, f"{{00000..{shards - 1:05d}}}.tar")
    if not os.path.isdir(shard_dir) or len(
            [f for f in os.listdir(shard_dir) if f.endswith(".tar")]) < shards:
        subprocess.check_call([
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "make_train_shards.py"),
            shard_dir, "--shards", str(shards), "--per-shard", str(per_shard),
        ])
    return pattern


def run_one(pattern: str, transforms: str, workers: int, batch_size: int,
            batches: int, tokenizer) -> dict:
    # _sizing floors the batch count to a workers multiple — oversize so at
    # least warmup + `batches` batches survive the rounding
    cfg = {"data_path": pattern, "transforms": transforms,
           "batch_size": batch_size, "workers": workers,
           "num_samples": batch_size * (batches + 1 + workers)}
    info = get_wds_dataset(cfg, tokenizer=tokenizer)
    it = info.loader_fn(0)
    next(it)  # warmup: opens tars, fills the decode pool
    t0 = time.perf_counter()
    n = 0
    for _ in range(batches):
        batch = next(it)
        n += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    return {
        "metric": f"ingest_{transforms}_w{workers}",
        "value": round(n / dt, 1),
        "unit": "samples/sec/host",
        "batch_size": batch_size,
        "batches": batches,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shard-dir", default="/tmp/ilvlm_ingest_shards")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 4])
    p.add_argument("--transforms", nargs="+",
                   default=["MOCOV2_single", "ONECROP"])
    p.add_argument("--no-native", action="store_true",
                   help="force the PIL augment path (ablation; the fused C "
                        "path data/native/fused_augment.c is the default "
                        "when it builds)")
    args = p.parse_args()

    if args.no_native:
        os.environ["ILVLM_NATIVE_AUGMENT"] = "0"
    from iterated_learning_for_vlm_tpu.data import native

    pattern = ensure_shards(args.shard_dir)
    tokenizer = get_tokenizer()
    for transforms in args.transforms:
        for workers in args.workers:
            rec = run_one(pattern, transforms, workers, args.batch_size,
                          args.batches, tokenizer)
            rec["native_augment"] = native.available()
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
