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


def _probe_once(timeout_s: float) -> tuple[bool, str]:
    """One probe attempt in a disposable subprocess.

    Returns (ok, detail) — detail describes the failure kind and carries
    the subprocess stderr tail so artifacts can record the actual cause.
    """
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s, check=True)
        return True, ""
    except subprocess.TimeoutExpired:
        return False, (f"jax.devices() hung for {timeout_s:.0f}s "
                       "(dead tunnel relay?)")
    except subprocess.CalledProcessError as e:
        return False, ("jax failed to initialize: "
                       + (e.stderr or b"").decode("utf-8", "replace")[-300:])
    except Exception as e:  # noqa: BLE001 - any failure means "not usable"
        return False, repr(e)[:300]


def cpu_cache_dir() -> str:
    """Host-fingerprint-keyed persistent JAX compilation-cache dir for
    pinned-CPU runs (tests and driver dry-runs share it so neither pays
    the other's cold compiles). Keyed by host fingerprint because XLA:CPU
    AOT artifacts bind to the compiling machine's ISA features — loading
    another host's entries warns and risks SIGILL (hvqm4_tpu.native uses
    the same key for its .so cache). Never imports jax."""
    import os

    from hvqm4_tpu.native import _fingerprint

    cache = os.path.expanduser(f"~/.cache/jax-tests-cpu-{_fingerprint()}")
    os.makedirs(cache, exist_ok=True)
    return cache


def probe_backend_ok(timeout_s: float = 300.0) -> bool:
    """One probe attempt; True if the backend answered within the timeout.

    The default allows for a live-but-loaded tunnel: a healthy backend
    answers in ~10-20 s cold, but round-trips stretch to minutes under
    recent transfer load (BASELINE.md variance note), and a too-short
    attempt would misclassify a working TPU as dead."""
    return _probe_once(timeout_s)[0]


def probe_backend_retry(total_budget_s: float = 900.0,
                        attempt_timeout_s: float = 300.0,
                        interval_s: float = 60.0) -> tuple[bool, str]:
    """Probe in a bounded retry loop: a relay restored minutes later is
    caught instead of missed (VERDICT r3 weak #3). Returns (True, "") as
    soon as one attempt answers, else (False, last failure detail) when
    the budget is exhausted. Fast non-hang failures (e.g. the plugin
    register step failing while the relay is mid-restart) are retried
    too — they heal when the relay returns — but their error text is
    preserved for the caller's artifact."""
    import time

    deadline = time.monotonic() + total_budget_s
    detail = "no probe attempt ran"
    while True:
        t0 = time.monotonic()
        ok, detail = _probe_once(min(attempt_timeout_s,
                                     max(10.0, deadline - t0)))
        if ok:
            return True, ""
        if time.monotonic() + interval_s >= deadline:
            return False, detail
        time.sleep(interval_s)


def probe_backend(timeout_s: float = 300.0) -> None:
    """Raise SystemExit with a clear message if the JAX backend is dead.

    Runs in a subprocess so the parent never touches a wedged PJRT
    client."""
    ok, detail = _probe_once(timeout_s)
    if not ok:
        raise SystemExit(
            f"backend probe: {detail} — aborting instead of hanging "
            "(check: ps aux | grep tpu_init)")
