"""FNV-1a frame hashing — the ONE implementation of the oracle-compatible
per-frame hash format (`oracle --hash` prints `hash=%08x` of the same
function), shared by the CLI `hash` subcommand, `bench.py`'s bit-exactness
phase, and `__graft_entry__.dryrun_multichip`."""

from __future__ import annotations


def fnv1a(data: bytes) -> int:
    h = 2166136261
    for b in data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def fnv1a_hex(data: bytes) -> str:
    return f"{fnv1a(data):08x}"
