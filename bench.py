"""Benchmark harness (driver contract: prints ONE JSON line).

Measures, on the real chip:
  - oracle_fps:  C reference decoder, single core -O2 (the baseline denominator)
  - value:       full-pipeline frames/sec/chip at 640×480 — host planning +
                 plan upload + batched device decode over N parallel streams
                 (the honest end-to-end number; BASELINE.json metric)
  - device_fps:  device-side decode throughput with plans pre-built (isolates
                 the TPU core from the host entropy bound)
  - bitexact:    decoded frames hash-identical to the C oracle on this backend

Env knobs: HVQM4_BENCH_STREAMS (default 4), HVQM4_BENCH_CLIP (default
testdata/ref640.h4m, generated if missing).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent


def ensure_oracle() -> pathlib.Path:
    subprocess.run(["make", "-s", "-C", str(REPO / "oracle")], check=True)
    return REPO / "oracle" / "hvqm4_oracle"


def ensure_clip(path: pathlib.Path):
    from hvqm4_tpu.config import SeqConfig
    from tools.encoder import make_clip

    cfg = SeqConfig(640, 480)
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(make_clip(
            cfg, ["IBBPBP" + "BP" * 8, "IPPPPP"], seed=7, audio_channels=2))
    return cfg, path.read_bytes()


def oracle_fps(oracle: pathlib.Path, clip_path: pathlib.Path) -> float:
    out = subprocess.run([str(oracle), "--bench", "5", str(clip_path)],
                         check=True, capture_output=True, text=True)
    return float(json.loads(out.stdout)["fps"])


def oracle_hashes(oracle: pathlib.Path, clip_path: pathlib.Path) -> list[str]:
    out = subprocess.run([str(oracle), "--hash", str(clip_path), "/dev/null"],
                         check=True, capture_output=True, text=True)
    return [line.split("hash=")[1] for line in out.stdout.splitlines()
            if "hash=" in line]


def _fnv1a(data: bytes) -> str:
    h = 2166136261
    for b in data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return f"{h:08x}"


def main() -> None:
    n_streams = int(os.environ.get("HVQM4_BENCH_STREAMS", "4"))
    clip_path = pathlib.Path(os.environ.get(
        "HVQM4_BENCH_CLIP", str(REPO / "testdata" / "ref640.h4m")))

    oracle = ensure_oracle()
    cfg, clip = ensure_clip(clip_path)
    base_fps = oracle_fps(oracle, clip_path)

    import jax

    from hvqm4_tpu.parallel.multistream import MultiStreamDecoder
    from hvqm4_tpu.planner import Planner

    planner_name = "python"
    planner_factory = Planner
    try:
        from hvqm4_tpu.native import NativePlanner

        planner_factory = NativePlanner
        planner_name = "native"
    except Exception as e:  # native module optional
        print(f"bench: native planner unavailable ({e}); using python",
              file=sys.stderr)

    clips = [clip] * n_streams

    def full_pass(collect_hashes: bool):
        ms = MultiStreamDecoder(cfg, clips, planner_factory=planner_factory)
        hashes, frames_done, last = [], 0, None
        while True:
            out = ms.step()
            if out is None:
                break
            frames, _plans, valid = out
            frames_done += sum(valid)
            last = frames
            if collect_hashes:
                fnp = [np.asarray(p) for p in frames]
                hashes.append(_fnv1a(b"".join(
                    fnp[pi][0].tobytes() for pi in range(3))))
        jax.block_until_ready(last)
        return frames_done, hashes

    # warmup (compiles) + bit-exactness vs oracle on stream 0
    _, hashes = full_pass(collect_hashes=True)
    bitexact = hashes == oracle_hashes(oracle, clip_path)

    t0 = time.perf_counter()
    frames_done, _ = full_pass(collect_hashes=False)
    pipeline_fps = frames_done / (time.perf_counter() - t0)

    # device-only: pre-plan every step (deep-copied out of the ping-pong
    # buffers), then replay on device
    import copy

    ms = MultiStreamDecoder(cfg, clips, planner_factory=planner_factory)
    all_bufs = []
    while any(ms.active):
        buf, _metas, _valid = ms.plan_step()
        all_bufs.append(copy.deepcopy(buf))
    ms2 = MultiStreamDecoder(cfg, clips, planner_factory=planner_factory)
    jax.block_until_ready(ms2.device_step(all_bufs[0]))  # warm
    reps = 3
    t0 = time.perf_counter()
    last = None
    for _ in range(reps):
        ms3 = MultiStreamDecoder(cfg, clips, planner_factory=planner_factory)
        for buf in all_bufs:
            last = ms3.device_step(buf)
    jax.block_until_ready(last)
    device_fps = reps * len(all_bufs) * n_streams / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "fps_per_chip_640x480_full_pipeline",
        "value": round(pipeline_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(pipeline_fps / base_fps, 3),
        "device_fps": round(device_fps, 2),
        "device_vs_baseline": round(device_fps / base_fps, 3),
        "oracle_fps": round(base_fps, 2),
        "streams": n_streams,
        "planner": planner_name,
        "bitexact": bool(bitexact),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
