"""2-process jax.distributed smoke test over localhost DCN (VERDICT r1 #7).

Spawns two CPU-backend subprocesses that call the real
`initialize_multihost(num_processes=2, ...)` path and run a cross-process
reduction over the global BA mesh — the multi-host bootstrap that single-
process tests cannot reach.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_init():
    repo = Path(__file__).resolve().parent.parent
    worker = Path(__file__).resolve().parent / "_mp_worker.py"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), "2"],
            cwd=str(repo), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            pytest.fail(f"worker hung; out={out[-500:]} err={err[-2000:]}")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nout={out}\nerr={err[-3000:]}"
        assert "OK process" in out
