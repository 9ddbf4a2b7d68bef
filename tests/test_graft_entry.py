"""The driver's actual capture paths must stay green (VERDICT r2 weak #1).

Round 2 shipped a default ``dryrun_multichip(8)`` that aborted (rc=134,
all-gather rendezvous starvation from interpret-mode Pallas at flagship
dims) because nothing in CI invoked the DEFAULT path — only tiny-dims
variants.  This test runs the exact command the driver runs, in a fresh
subprocess with the driver's env, and requires BOTH passes to print ok.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_default_dryrun_multichip_8_is_green():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("GRAFT_DRYRUN_TINY", None)  # the DEFAULT (flagship) path
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    # pass 1: flagship dims on XLA paths; pass 2: Pallas SPMD rules
    assert "ViT-B/32+4096-codebook, XLA paths, dp4 x tp2" in proc.stdout
    assert "Pallas fused-attn + codebook kernels, dp4 x tp2" in proc.stdout
    assert proc.stdout.count("ok, loss=") == 2, proc.stdout
