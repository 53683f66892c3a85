"""Multi-host bootstrap test: jax.distributed across two REAL processes.

Round-1 review flagged parallel/mesh.py's jax.distributed init path as dead
code ("never exercised").  This test spawns two local worker processes with
a coordinator, initializes the multi-controller runtime through
maybe_distributed_init (env-driven, exactly as a pod launcher would), and
asserts cross-process psum correctness on both workers — the SURVEY §4(d)
pattern for testing pod code without a pod.
"""
import os
import socket
import subprocess
import sys

import pytest

_TIMEOUT_S = 300


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow  # spawns 2 coordinated jax.distributed processes (~45 s)
class TestMultiHostBootstrap:
    def test_two_process_psum(self):
        port = _free_port()
        worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update(
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
            )
            # The workers force the CPU backend themselves; they must not
            # inherit this test process's virtual-device XLA flags.
            env.pop("XLA_FLAGS", None)
            procs.append(
                subprocess.Popen(
                    [sys.executable, worker],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=_TIMEOUT_S)
                outs.append(out)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.fail(f"distributed workers hung; partial output: {outs}")
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out}"
            assert f"DISTOK {pid}" in out, f"worker {pid} output:\n{out}"
