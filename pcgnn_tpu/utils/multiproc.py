"""Local multi-process launch harness, shared by the multi-host tests and
benchmarks (``tests/test_multihost.py``, ``benchmarks/multihost_scaling.py``).

Workers coordinate through ``jax.distributed`` collectives, so they are
*interdependent*: one worker blocking makes every other worker block.  Two
consequences shape this harness:

  * stdout/stderr go to temp FILES, never ``subprocess.PIPE`` — a worker
    that logs more than the pipe buffer before reaching its first
    collective would stall, deadlocking the whole gang until timeout.
  * on timeout or failure every worker is killed, not just reaped — an
    orphaned survivor would hold the coordinator port (and, on real pods,
    the TPU grant) indefinitely.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile
from typing import List, Sequence


def free_port() -> int:
    """Pick a currently-free localhost port.

    TOCTOU caveat: the port is released before the coordinator worker binds
    it, so a concurrent process can steal it in between and the gang fails
    with a coordinator-bind error.  Call sites that can rebuild their worker
    args should go through :func:`gang_with_fresh_port`, which retries once
    with a new port on exactly that failure signature.
    """
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# failure substrings that identify a coordinator-bind loss of the free_port
# race (jax distributed service / gRPC wording)
_BIND_ERROR_MARKERS = ("Address already in use", "Failed to bind",
                       "bind failed", "errno: 98")


def gang_with_fresh_port(launch, attempts: int = 2):
    """Run ``launch(port)`` with a fresh free port, retrying on bind races.

    ``launch`` builds the per-worker args around the port and calls
    :func:`run_workers`; any RuntimeError whose text matches a
    coordinator-bind failure triggers one retry with a new port (other
    failures propagate immediately).
    """
    for attempt in range(attempts):
        port = free_port()
        try:
            return launch(port)
        except RuntimeError as e:
            if (attempt + 1 < attempts
                    and any(m in str(e) for m in _BIND_ERROR_MARKERS)):
                continue
            raise


def cpu_worker_env() -> dict:
    """Environment for CPU-mesh workers: pin the CPU platform and disarm
    TPU-plugin sitecustomize hooks that would initialize a backend before
    the worker can call ``jax.distributed.initialize``."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def run_workers(worker_path: str, per_worker_args: Sequence[Sequence[str]],
                *, env: dict, timeout: float = 600.0) -> List[str]:
    """Launch one process per args row, wait for ALL, return their logs.

    Raises RuntimeError (with the tail of every log) if any worker exits
    nonzero or the gang times out; all workers are killed on the way out.
    """
    procs, logs = [], []
    for args in per_worker_args:
        log = tempfile.NamedTemporaryFile(
            mode="w+", suffix=".log", delete=False)
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker_path, *map(str, args)],
            env=env, stdout=log, stderr=subprocess.STDOUT))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait()
        raise RuntimeError(
            "worker gang timed out:\n" + _tails(logs)) from None
    texts = _read_all(logs)
    if any(p.returncode != 0 for p in procs):
        raise RuntimeError(
            "worker failed:\n" + "\n---\n".join(t[-3000:] for t in texts))
    return texts


def _read_all(logs) -> List[str]:
    out = []
    for log in logs:
        log.flush()
        log.seek(0)
        out.append(log.read())
        log.close()
        os.unlink(log.name)
    return out


def _tails(logs) -> str:
    return "\n---\n".join(t[-2000:] for t in _read_all(logs))
