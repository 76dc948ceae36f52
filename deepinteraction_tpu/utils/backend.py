"""Backend liveness guard.

The axon TPU plugin's backend init has no connect timeout: with the tunnel
down, the first jax.devices() (or any implicit backend init) hangs the
process indefinitely. Every entry point that intends to run on the device
calls require_live_backend() first so a dead tunnel becomes a one-line
diagnosis in bounded time instead of a silent hang/timeout.
"""

from __future__ import annotations

import os
import subprocess
import sys


def require_live_backend(timeout_s: float = 180.0) -> None:
    """Raise RuntimeError if the default jax backend can't be reached.

    Probes ``jax.devices()`` in a subprocess with a bounded wait. CPU envs
    (JAX_PLATFORMS=cpu...) skip the probe — local backends can't hang.
    """
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
        return
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"device backend unreachable (init exceeded {timeout_s:.0f}s "
            "— axon tunnel down?); aborting instead of hanging"
        )
