"""Sustained-throughput soak for the serving story (VERDICT r1 #6).

Decodes the benchmark clip through the production pipeline repeatedly and
logs fps + host RSS per pass, in two modes:

  --no-recycle   one process runs the whole soak: measures WHERE the axon
                 tunnel's per-byte PJRT leak degrades throughput (fps-over-
                 time curve, RSS growth, cumulative upload bytes)
  (default)      each window runs in a fresh subprocess — the documented
                 mitigation (serve.py's model: bounded client lifetime):
                 demonstrates stable fps over many minutes

On a direct-attached TPU-VM the leak does not exist and the default mode is
merely a periodic re-init; the curve should be flat either way.

Usage:
    python scripts/soak_throughput.py --minutes 5            # recycle mode
    python scripts/soak_throughput.py --minutes 3 --no-recycle
    python scripts/soak_throughput.py --child 4              # internal

Prints one JSON line per pass: {"pass": i, "fps": ..., "rss_mb": ...}
and a final {"soak": ...} summary line (recycle mode).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def run_passes(n_passes: int, n_streams: int, deadline: float | None = None):
    """Decode the clip n_passes times in THIS process; one JSON line each."""
    import jax

    from bench import _setup

    _cfg, _cp, make_ms, _pn = _setup(n_streams)

    # warm pass (compiles/persistent-cache loads must not pollute pass 0)
    ms = make_ms()
    for _ in ms.run_pipelined():
        pass
    del ms

    for i in range(n_passes):
        if deadline is not None and time.monotonic() > deadline:
            break
        ms = make_ms()
        t0 = time.perf_counter()
        frames_done, last = 0, None
        for frames, _metas, valid in ms.run_pipelined():
            frames_done += sum(valid)
            last = frames
        jax.block_until_ready(last)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "pass": i, "fps": round(frames_done / dt, 1),
            "frames": frames_done, "rss_mb": round(_rss_mb(), 1),
        }), flush=True)
        del ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--streams", type=int,
                    default=int(os.environ.get("HVQM4_BENCH_STREAMS", "8")))
    ap.add_argument("--no-recycle", action="store_true",
                    help="one process for the whole soak (leak exposure run)")
    ap.add_argument("--passes-per-window", type=int, default=2,
                    help="clip decodes per subprocess window (recycle mode)")
    ap.add_argument("--child", type=int, default=0,
                    help="internal: run N passes in this process and exit")
    args = ap.parse_args()

    if not args.child:
        from hvqm4_tpu.utils.backend import probe_backend
        probe_backend()
    if args.child:
        run_passes(args.child, args.streams)
        return

    t_end = time.monotonic() + args.minutes * 60
    if args.no_recycle:
        run_passes(10_000, args.streams, deadline=t_end)
        return

    window = 0
    results = []
    while time.monotonic() < t_end:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--child",
                 str(args.passes_per_window), "--streams", str(args.streams)],
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired:
            # a hung window (e.g. wedged tunnel) is a RESULT: record it and
            # still emit the summary over the passes that did complete
            print(json.dumps({"window": window, "error": "window timed out"}),
                  flush=True)
            break
        if r.returncode != 0:
            print(json.dumps({"window": window, "error": r.stderr[-500:]}),
                  flush=True)
            break
        for line in r.stdout.strip().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            rec["window"] = window
            results.append(rec)
            print(json.dumps(rec), flush=True)
        window += 1
        time.sleep(10)  # let the tunnel remote side settle between clients
    if results:
        fps = [r["fps"] for r in results if "fps" in r]
        med = sorted(fps)[len(fps) // 2]
        head = sorted(fps[:3])[len(fps[:3]) // 2]
        tail = sorted(fps[-3:])[len(fps[-3:]) // 2]
        print(json.dumps({
            "soak": "recycle", "windows": window, "passes": len(fps),
            "fps_median": med, "fps_head3": head, "fps_tail3": tail,
            "fps_min": min(fps), "fps_max": max(fps),
            # stable = no downward trend (head vs tail medians; min/max on a
            # shared 1-vCPU box is dominated by scheduler noise, not decay)
            "stable": bool(tail > 0.85 * head),
        }), flush=True)


if __name__ == "__main__":
    main()
