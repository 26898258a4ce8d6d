"""Multi-stream decode: N independent `.h4m` streams per chip (BASELINE config 4).

Single-stream decode underutilizes a v5e chip (a 640×480 frame is small); the
production configuration batches N streams with `vmap` so every kernel works
on (N, ...) tensors, and reference/nest state lives on device as stacked
arrays updated functionally inside one jitted step — the decode analogue of a
training step:

    (plans, nest, ref_prev, ref_last) → (frames, nest', ref_prev', ref_last')

Streams advance in lock-step by *decode index*; per-stream frame types may
differ (the step is type-agnostic: I-frames are all-intra plans whose nest
slot is refreshed, reference rotation is masked per stream). Finished streams
are masked inactive and decode a trivial plan (SURVEY.md §5 "fail per-stream
without killing the batch").

Sharding: `shard_streams` lays the N axis over a mesh's 'dp' axis; state and
plans follow, so each chip owns N/n_chips streams and no cross-chip
communication exists on the decode path (the correct answer for this
workload — SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SeqConfig
from ..container import Demuxer
from ..ops import device_core
from ..planner import Planner, PlannerError
from ..plans import FramePlan, PlanePlan


def stack_plane_plans(plans: list[PlanePlan]) -> dict[str, np.ndarray]:
    """N same-shape PlanePlans → dict of (N, ...) arrays."""
    arrs = [device_core.plane_plan_arrays(p) for p in plans]
    return {k: np.stack([a[k] for a in arrs]) for k in arrs[0]}


def _decode_plane_batched(plans, nest, ref0, ref1):
    return jax.vmap(device_core.decode_plane_inter)(plans, nest, ref0, ref1)


@jax.jit
def multi_frame_step(plane_plans: list, nest, new_nest, is_i, is_ref,
                     ref_prev: list, ref_last: list):
    """One lock-step decode of N streams.

    plane_plans: [plan_dict(N,...)] for Y,U,V     is_i/is_ref: (N,) bool
    nest/new_nest: (N, nh, nw) u8                 ref_*: [(N, ph, pw) u8] x3
    Returns (frames [3], nest', ref_prev', ref_last').
    """
    nest = jnp.where(is_i[:, None, None], new_nest, nest)
    frames = []
    for pi, plans in enumerate(plane_plans):
        frames.append(_decode_plane_batched(plans, nest,
                                            ref_prev[pi], ref_last[pi]))
    m = is_ref
    new_prev = [jnp.where(m[:, None, None], ref_last[pi], ref_prev[pi])
                for pi in range(3)]
    new_last = [jnp.where(m[:, None, None], frames[pi], ref_last[pi])
                for pi in range(3)]
    return frames, nest, new_prev, new_last


def _trivial_plan(cfg: SeqConfig) -> FramePlan:
    """Inactive-stream filler: all-intra weight blocks at DC 128."""
    planes = [PlanePlan.zeros(bh, bw) for bh, bw in cfg.block_grids]
    nh, nw = cfg.nest_shape
    return FramePlan(ftype="I", display_id=0, dc_shift=0, nest_x=0, nest_y=0,
                     planes=planes, nest=np.zeros((nh, nw), np.uint8))


@dataclasses.dataclass
class _Stream:
    records: list
    pos: int = 0
    block: int = -1
    failed: bool = False


class MultiStreamDecoder:
    """Host orchestration for N parallel streams of one SeqConfig."""

    def __init__(self, cfg: SeqConfig, clips: list[bytes],
                 planner_factory=Planner, sharding=None):
        self.cfg = cfg
        self.n = len(clips)
        self.planner = planner_factory(cfg)
        self.sharding = sharding
        self.streams = []
        for clip in clips:
            d = Demuxer(clip)
            if d.info.cfg != cfg:
                raise ValueError("all streams must share one SeqConfig")
            recs = [(r.block_index, r.frame_char, r.payload)
                    for r in d.video_records()]
            self.streams.append(_Stream(records=recs))
        nh, nw = cfg.nest_shape
        dev = lambda x: (jax.device_put(x, self.sharding)  # noqa: E731
                         if self.sharding is not None else jnp.asarray(x))
        self.nest = dev(np.zeros((self.n, nh, nw), np.uint8))
        self.ref_prev = [dev(np.zeros((self.n, h, w), np.uint8))
                         for h, w in cfg.plane_shapes]
        self.ref_last = [dev(np.zeros((self.n, h, w), np.uint8))
                         for h, w in cfg.plane_shapes]
        self._trivial = _trivial_plan(cfg)

    @property
    def active(self) -> list[bool]:
        return [s.pos < len(s.records) and not s.failed for s in self.streams]

    def plan_step(self):
        """Host side of one step: plan the next frame of every stream."""
        plans, valid = [], []
        for s in self.streams:
            if s.failed or s.pos >= len(s.records):
                plans.append(self._trivial)
                valid.append(False)
                continue
            block, fchar, payload = s.records[s.pos]
            if block != s.block:
                s.block = block  # GOP boundary: refs are stale; I-frame
                                 # ignores them, planner needs no reset
            try:
                plans.append(self.planner.plan_frame(fchar, payload))
                valid.append(True)
            except PlannerError:
                s.failed = True  # poison one stream, not the batch
                plans.append(self._trivial)
                valid.append(False)
            s.pos += 1
        return plans, valid

    def device_step(self, plans: list[FramePlan]):
        """Device side of one step: batched decode + state rotation."""
        nh, nw = self.cfg.nest_shape
        plane_plans = [stack_plane_plans([p.planes[pi] for p in plans])
                       for pi in range(3)]
        new_nest = np.stack([
            p.nest if p.nest is not None else np.zeros((nh, nw), np.uint8)
            for p in plans])
        is_i = np.array([p.ftype == "I" for p in plans])
        is_ref = np.array([p.ftype in ("I", "P") for p in plans])
        if self.sharding is not None:
            put = lambda x: jax.device_put(x, self.sharding)  # noqa: E731
            plane_plans = [{k: put(v) for k, v in pp.items()}
                           for pp in plane_plans]
            new_nest = put(new_nest)
            is_i, is_ref = put(is_i), put(is_ref)
        frames, self.nest, self.ref_prev, self.ref_last = multi_frame_step(
            plane_plans, self.nest, new_nest, is_i, is_ref,
            self.ref_prev, self.ref_last)
        return frames

    def step(self):
        """plan + decode; returns ((frames, plans, valid)) or None when done."""
        if not any(self.active):
            return None
        plans, valid = self.plan_step()
        frames = self.device_step(plans)
        return frames, plans, valid


def shard_streams(mesh, axis: str = "dp"):
    """NamedSharding placing the stream axis over a mesh axis (others replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))
