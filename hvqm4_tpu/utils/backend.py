"""Backend pre-flight probe for measurement scripts.

When the dev-tunnel relay behind the 'axon' PJRT plugin dies,
`jax.devices()` hangs FOREVER in every fresh process (observed
2026-08-17; see BASELINE.md). Scripts that are about to spend minutes of
wall-clock on the device should probe first in a disposable subprocess —
the hang cannot be timed out from within the same process once jax starts
initializing the backend.
"""

from __future__ import annotations

import subprocess
import sys


def probe_backend(timeout_s: float = 300.0) -> None:
    """Raise SystemExit with a clear message if the JAX backend is dead.

    A healthy backend (TPU via the dev tunnel, or CPU) answers in
    ~10-20 s cold; a dead relay hangs, which this converts into a bounded
    failure. Runs in a subprocess so the parent never touches a wedged
    PJRT client."""
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s, check=True)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            "backend probe: jax.devices() hung for "
            f"{timeout_s:.0f}s — the TPU tunnel relay is likely dead "
            "(ps aux | grep tpu_init); aborting instead of hanging")
    except subprocess.CalledProcessError as e:
        raise SystemExit(
            "backend probe: jax failed to initialize: "
            + (e.stderr or b"").decode("utf-8", "replace")[-500:])
