"""Shared scaffolding for the multi-host example harnesses.

Both harnesses launch N worker subprocesses standing in for N hosts; the
helpers here are the launch-side plumbing they have in common (keeping it in
one place so fixes to the port-race/env handling apply everywhere).
"""

from __future__ import annotations

import os
import socket

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker_env(cpu: bool, cpu_devices: int | None = None) -> dict:
    """Environment for a worker subprocess: the repo replaces PYTHONPATH (any
    site customization that pins a device platform must not leak into CPU
    workers), and `cpu` pins the JAX platform (with an optional virtual CPU
    device count) before the worker process starts."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = REPO
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        if cpu_devices:
            env.setdefault(
                "XLA_FLAGS",
                f"--xla_force_host_platform_device_count={cpu_devices}",
            )
    return env
