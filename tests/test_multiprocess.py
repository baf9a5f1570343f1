"""Localhost multi-process bring-up (SURVEY.md §4: "multi-host logic
testable with jax's multiprocess runtime on localhost").

Spawns two OS processes, each with 2 virtual CPU devices, that
``jax.distributed.initialize`` against each other and run a dp=4-sharded
llama decode step over the cross-process mesh
(tpu_llm.parallel.distributed --selftest). Each rank asserts the sharded
logits match its locally computed single-device reference bit-for-bit.
Runs in subprocesses so this file's in-process JAX config is irrelevant.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_decode_parity():
    # (no pytest-timeout in the image: the communicate(timeout=150) below
    # bounds the test on its own)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)          # selftest sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tpu_llm.parallel.distributed",
             "--selftest", "--rank", str(rank), "--nprocs", "2",
             "--port", str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "SELFTEST OK" in out, f"rank {rank} no OK line:\n{out[-3000:]}"


def test_init_distributed_single_process_noop():
    """init_distributed with no configuration must be a safe no-op (the
    single-host path every CLI run takes)."""
    from tpu_llm.parallel.distributed import init_distributed

    pid, n = init_distributed()
    assert (pid, n) == (0, 1)
