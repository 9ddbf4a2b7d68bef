"""TRUE multi-host validation: separate OS processes + jax.distributed.

The in-process 8-device mesh covers multi-chip semantics; these tests cover
what it cannot — the actual multi-host path: ``jax.distributed.initialize``,
per-process batch contribution (``host_local_to_global``), replicated state
built WITHOUT a rank-0 broadcast, and cross-process collectives (Gloo on
CPU — the stand-in for ICI/DCN).  Reference counterpart: torchrun's
process-per-GPU DDP (``run.sh``, ``torch_ddp_dist.py:29-67``).
"""
import os
import re
import socket
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "mp_host_dryrun.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the workers force their own platform/device flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _parse(out: str):
    loss = float(re.search(r"MP_LOSS ([\d.eE+-]+)", out).group(1))
    csum = float(re.search(r"MP_CHECKSUM ([\d.eE+-]+)", out).group(1))
    return loss, csum


def _run_cluster(num_processes: int, devices_per_process: int, port: int,
                 model_parallel: int = 1, checkpoint_dir: str = None,
                 fused_kernels: bool = False):
    extra = ["--checkpoint-dir", checkpoint_dir] if checkpoint_dir else []
    if fused_kernels:
        extra.append("--fused-kernels")
    procs = [
        subprocess.Popen(
            [sys.executable, TOOL, "--process-id", str(i),
             "--num-processes", str(num_processes), "--port", str(port),
             "--devices-per-process", str(devices_per_process),
             "--model-parallel", str(model_parallel)] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_clean_env(), cwd=os.path.dirname(TOOL),
        )
        for i in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=1200)  # 1-core: concurrent compiles
            assert p.returncode == 0, err[-2000:]
            if checkpoint_dir:
                assert "MP_RESTORED_STEP 1" in out, out
            outs.append(_parse(out))
    finally:
        # one worker failing must not leak siblings blocked in Gloo waits
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return outs


@pytest.mark.slow  # spawns 5 fresh python processes, each compiles the step
def test_two_process_step_matches_single_process():
    two = _run_cluster(2, 2, _free_port())
    (ref_loss, ref_csum), = _run_cluster(1, 4, _free_port())
    for loss, csum in two:
        assert loss == pytest.approx(ref_loss, abs=1e-4)
        assert csum == pytest.approx(ref_csum, rel=1e-5)
    # dp2 x tp2 across the SAME two processes: Megatron kernel splits +
    # row-sharded codebook placed via put_global, collectives cross Gloo.
    # (The multi-host Orbax save/restore contract is exercised by the
    # worker's --checkpoint-dir flag — run manually; under pytest the two
    # concurrent cold compiles + the Orbax barrier flake on this 1-core
    # box, see verify notes.)
    two_tp = _run_cluster(2, 2, _free_port(), model_parallel=2)
    for loss, csum in two_tp:
        assert loss == pytest.approx(ref_loss, abs=1e-3)
        assert csum == pytest.approx(ref_csum, rel=1e-4)


@pytest.mark.slow  # spawns 4 fresh python processes on the shared CPU cluster
def test_four_process_tp_across_processes_matches():
    """dp2 x tp2 with the tp axis ACROSS processes (4 procs x 1 device):
    the dp-row loader split (``data_rank_world``) + per-device global-slice
    assembly must reproduce the same step as tp-inside-process (round 5;
    the full-solver version is tools/mh4_drill.py)."""
    four = _run_cluster(4, 1, _free_port(), model_parallel=2)
    (ref_loss, ref_csum), = _run_cluster(1, 4, _free_port(),
                                         model_parallel=2)
    for loss, csum in four:
        assert loss == pytest.approx(ref_loss, abs=1e-3)
        assert csum == pytest.approx(ref_csum, rel=1e-4)


@pytest.mark.slow  # interpret-mode Pallas compiles in 3 fresh processes
def test_pallas_kernels_cross_process():
    """Both Pallas kernels' custom_partitioning SPMD rules run the
    shard-local lowering in every process of a 2-process cluster and match
    the single-process result."""
    two = _run_cluster(2, 2, _free_port(), fused_kernels=True)
    (ref_loss, ref_csum), = _run_cluster(1, 4, _free_port(),
                                         fused_kernels=True)
    for loss, csum in two:
        assert loss == pytest.approx(ref_loss, abs=1e-3)
        assert csum == pytest.approx(ref_csum, rel=1e-4)
