"""Multi-stream decode: N independent `.h4m` streams per chip (BASELINE config 4).

Single-stream decode underutilizes a v5e chip (a 640×480 frame is small); the
production configuration batches N streams with `vmap` so every kernel works
on (N, ...) tensors, and reference/nest state lives on device as stacked
arrays updated functionally inside one jitted step — the decode analogue of a
training step:

    (plans, nest, ref_prev, ref_last) → (frames, nest', ref_prev', ref_last')

Streams advance in lock-step by *decode index*; per-stream frame types may
differ (the step is type-agnostic: I-frames are all-intra plans whose nest
slot is refreshed, reference rotation is masked per stream). Finished or
corrupt streams are masked inactive and decode a trivial plan (SURVEY.md §5
"fail per-stream without killing the batch").

Host-side cost engineering:
- the batch plan tensors live in typed host **arenas** per ping-pong slot;
  the native planner writes every stream's field slices and sparse pools in
  place via one batch C call per step — no per-frame allocation or copies;
- each step uploads the arena as a single u8 transfer (one host→device
  round-trip instead of ~20 — interconnect latency, not bandwidth, dominated
  the per-field path) and the jitted step bitcasts field views out of it;
- device state buffers are donated to the step so XLA updates them in place;
- `run_pipelined` plans step k+1 on a worker thread (the C++ planner releases
  the GIL) while the device executes step k.

Sharding: `shard_streams` lays the N axis over a mesh's 'dp' axis; in mesh
mode plans upload per-field (each field is N-major and shardable), so each
chip owns N/n_chips streams and no cross-chip communication exists on the
decode path (the correct answer for this workload — SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_BASES, SeqConfig
from ..container import Demuxer
from ..ops import device_core
from ..planner import Planner, PlannerError
from ..plans import FramePlan, PlanePlan

# Per-plane packed fields handed to the C planner (ABI order). `slot` is the
# unified sparse-payload index: a raw-pool slot for raw blocks, a desc-pool
# start otherwise (mutually exclusive per block; meta disambiguates). The
# planner allocates slots in canonical order (plane-major, row-major block
# scan), which makes every slot value an exclusive cumsum over meta-derived
# counts — so slot arrays are host-side scratch and are NEVER uploaded: the
# jitted step recomputes them from meta (see `_derive_slots`).
_PLANE_KEYS = ("meta", "dc", "slot")

_FIELD_SPECS = (
    ("meta", np.uint8, ()),
    ("dc", np.uint8, ()),
)


# ---------------------------------------------------------------------------
# Arena layout: one contiguous u8 buffer holding every plan field + step flags
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _arena_entries(cfg: SeqConfig, n: int):
    """Two dtype-homogeneous arenas (u8 / u32): one upload each.

    A single mixed-dtype u8 arena would be ideal (one transfer), but
    reinterpreting it on device — whether via bitcast_convert_type or
    byte-lane shifts — reliably hangs the TPU compiler at this size, so
    fields are grouped by dtype instead: plain slices, no reinterpretation,
    still only 3 h2d round-trips per step.

    Sparse payload pools (raw bytes, basis descriptors) sit at the *end* of
    their arenas in stream-minor layout (slot, stream, ...), so a step can
    upload just the used prefix: the host tracks per-step pool usage and
    picks a capacity tier (see `_POOL_TIERS`), shrinking transfers ~2x on
    typical content while any spec-valid all-raw frame still fits the full
    tier.

    Returns ({dtype_name: [(field_name, plane|-1, shape, elem_off, elems)]},
             {dtype_name: total_fixed_elems}, pool_info).
    """
    groups: dict[str, list] = {"u8": [], "u32": []}
    totals = {"u8": 0, "u32": 0}
    keymap = {np.dtype(np.uint8): "u8", np.dtype(np.uint32): "u32"}

    def add(name, pi, dtype, shape):
        g = keymap[np.dtype(dtype)]
        elems = int(np.prod(shape))
        groups[g].append((name, pi, shape, totals[g], elems))
        totals[g] += elems

    for pi, (bh, bw) in enumerate(cfg.block_grids):
        for name, dtype, tail in _FIELD_SPECS:
            add(name, pi, dtype, (n, bh, bw, *tail))
    nh, nw = cfg.nest_shape
    add("new_nest", -1, np.uint8, (n, nh, nw))
    add("is_i", -1, np.uint8, (n,))
    add("is_ref", -1, np.uint8, (n,))
    # motion vectors are per-MACROBLOCK (all blocks of an MB share them) and
    # pack as ONE u32 per MB (y16 << 16 | x16): they ride the u32 arena, so
    # a step needs only two h2d transfers (u8 + u32), and the jitted step
    # unpacks with two shifts
    mh, mw = cfg.mb_grid
    add("mv", -1, np.uint32, (n, mh, mw))
    add("mv2", -1, np.uint32, (n, mh, mw))
    total_blocks = sum(bh * bw for bh, bw in cfg.block_grids)
    pool_info = {
        "raw_off": totals["u8"],          # u8 elems; pool (cap, n, 16)
        "raw_cap": total_blocks,
        "desc_off": totals["u32"],        # u32 elems; pool (cap, n)
        "desc_cap": MAX_BASES * total_blocks,
    }
    return ({k: tuple(v) for k, v in groups.items()}, totals, pool_info)


def _pool_tiers(cap: int):
    """Capacity ladder: compact tiers for typical content, full for the
    worst case. Each tier used by a run costs one (persistently cached)
    compilation of the step. Tiers never exceed cap (tiny frames have
    pools smaller than the 64-slot floor)."""
    return tuple(sorted({min(max(cap // d, 64), cap)
                         for d in (32, 16, 8, 4, 2, 1)}))


def _pick_tier(used: int, cap: int) -> int:
    for t in _pool_tiers(cap):
        if used <= t:
            return t
    return cap


_ARENA_DTYPES = {"u8": np.uint8, "u32": np.uint32}


def _arena_views(cfg: SeqConfig, n: int, arenas: dict):
    """Writable numpy views into the arenas: (planes, extras, pools).

    Also allocates the per-plane `slot` scratch arrays the C planner writes
    through — plain host memory, not part of any upload arena (the device
    recomputes slots from meta)."""
    groups, _totals, pinfo = _arena_entries(cfg, n)
    planes = [dict() for _ in cfg.block_grids]
    extras = {}
    for g, entries in groups.items():
        for name, pi, shape, off, elems in entries:
            view = arenas[g][off:off + elems].reshape(shape)
            if pi >= 0:
                planes[pi][name] = view
            else:
                extras[name] = view
    for pi, (bh, bw) in enumerate(cfg.block_grids):
        planes[pi]["slot"] = np.zeros((n, bh, bw), np.uint32)
    rc, dcp = pinfo["raw_cap"], pinfo["desc_cap"]
    pools = {
        "raw": arenas["u8"][pinfo["raw_off"]:
                            pinfo["raw_off"] + rc * n * 16
                            ].reshape(rc, n, 16),
        "desc": arenas["u32"][pinfo["desc_off"]:
                              pinfo["desc_off"] + dcp * n].reshape(dcp, n),
    }
    return planes, extras, pools


def _unpack_arena(cfg: SeqConfig, n: int, arenas: dict,
                  raw_cap: int, desc_cap: int):
    """In-jit: typed arenas → (plane plan dicts, new_nest, is_i, is_ref).

    `raw_cap`/`desc_cap` are the upload tier's pool capacities (static).
    Pool payloads are materialized in the device core's plane-layout
    contract (raw as (n, H, W) pixels, desc component-major (n, 4, bh, bw))
    by gathers straight from the flat pool regions — no intermediate ever
    carries a trailing dim of 4/16 (TPU tiling would pad it to 128).
    """
    groups, _totals, pinfo = _arena_entries(cfg, n)
    planes = [dict() for _ in cfg.block_grids]
    extras = {}
    for g, entries in groups.items():
        for name, pi, shape, off, elems in entries:
            arr = jax.lax.slice(arenas[g], (off,), (off + elems,)).reshape(shape)
            if pi >= 0:
                planes[pi][name] = arr
            else:
                extras[name] = arr
    ro, do = pinfo["raw_off"], pinfo["desc_off"]
    # flat pool regions; element layouts (slot, stream, 16) and (slot, stream)
    raw_flat = jax.lax.slice(arenas["u8"], (ro,), (ro + raw_cap * n * 16,))
    desc_flat = jax.lax.slice(arenas["u32"], (do,), (do + desc_cap * n,))
    sidx = jnp.arange(n, dtype=jnp.int32)

    slots = _derive_slots(cfg, n, [pp["meta"] for pp in planes])
    for pi, pp in enumerate(planes):
        bh, bw = cfg.block_grids[pi]
        H, W = bh * 4, bw * 4
        y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        blk = (y >> 2) * bw + (x >> 2)
        slot = jnp.clip(slots[pi].astype(jnp.int32), 0, raw_cap - 1)
        # raw: one gather lands the pixels directly in plane layout
        slot_up = jax.vmap(lambda s: jnp.take(s.reshape(-1), blk))(slot)
        k = (y & 3) * 4 + (x & 3)
        ridx = (slot_up * n + sidx[:, None, None]) * 16 + k[None]
        pp["raw"] = jnp.take(raw_flat, ridx)
        # desc: (n, 4, bh, bw) component-major
        start = jnp.clip(slots[pi].astype(jnp.int32), 0, desc_cap - 1)
        didx = jnp.clip(start[:, None] + jnp.arange(
            4, dtype=jnp.int32)[None, :, None, None], 0, desc_cap - 1)
        pp["desc"] = jnp.take(desc_flat,
                              didx * n + sidx[:, None, None, None])
        # motion vectors stay at MB resolution: unpack the per-MB u32
        # (y16 << 16 | x16) into component-major (n, 2, mh, mw) i32 and
        # apply the chroma half-pel value shift (tiny grids — cheap)
        chroma_mb = pi > 0 and cfg.h_samp == 2
        sra = device_core._sra
        for key in ("mv", "mv2"):
            v = extras[key].astype(jnp.int32)
            mvx = sra(v << 16, 16)
            mvy = sra(v, 16)
            if chroma_mb:
                mvx, mvy = sra(mvx, 1), sra(mvy, 1)
            pp[key] = jnp.stack([mvx, mvy], axis=1)
    return planes, extras["new_nest"], extras["is_i"] != 0, extras["is_ref"] != 0


def _derive_slots(cfg: SeqConfig, n: int, metas: list):
    """Recompute each block's pool slot from meta alone (in-jit).

    The planner allocates raw/desc pool slots in canonical order — plane
    major, row-major block scan — so a block's raw index is the exclusive
    cumsum of `is_raw` and its desc start the exclusive cumsum of the
    per-block descriptor count, both over the concatenated planes. A block
    is never both raw and descriptor-carrying, so the two cumsums share one
    output field (the inapplicable gather is masked by meta downstream).
    This replaces a dense u32 upload per block with ~µs of device work.
    """
    flat = jnp.concatenate(
        [m.reshape(n, -1).astype(jnp.int32) for m in metas], axis=1)
    cls_ = (flat >> 5) & 1
    mode = flat & 7
    counts = jnp.where((cls_ == 1) | ((mode >= 1) & (mode <= 4)), mode, 0)
    is_raw = ((cls_ == 0) & (mode == 6)).astype(jnp.int32)
    slot_flat = jnp.where(
        is_raw != 0,
        jnp.cumsum(is_raw, axis=1) - is_raw,
        jnp.cumsum(counts, axis=1) - counts).astype(jnp.uint32)
    out, off = [], 0
    for bh, bw in cfg.block_grids:
        out.append(jax.lax.slice_in_dim(slot_flat, off, off + bh * bw, axis=1)
                   .reshape(n, bh, bw))
        off += bh * bw
    return out


# ---------------------------------------------------------------------------
# The decode step
# ---------------------------------------------------------------------------

def _step_body(plane_plans: list, nest, new_nest, is_i, is_ref,
               ref_prev: list, ref_last: list):
    nest = jnp.where(is_i[:, None, None], new_nest, nest)
    frames = []
    for pi, plans in enumerate(plane_plans):
        frames.append(jax.vmap(device_core.decode_plane_inter)(
            plans, nest, ref_prev[pi], ref_last[pi]))
    m = is_ref
    new_prev = [jnp.where(m[:, None, None], ref_last[pi], ref_prev[pi])
                for pi in range(3)]
    new_last = [jnp.where(m[:, None, None], frames[pi], ref_last[pi])
                for pi in range(3)]
    return frames, nest, new_prev, new_last


@functools.partial(jax.jit, donate_argnums=(1, 5, 6))
def multi_frame_step(plane_plans: list, nest, new_nest, is_i, is_ref,
                     ref_prev: list, ref_last: list):
    """One lock-step decode of N streams (reference form; per-field inputs).

    plane_plans: [plan_dict(N,...)] for Y,U,V     is_i/is_ref: (N,) bool
    nest/new_nest: (N, nh, nw) u8                 ref_*: [(N, ph, pw) u8] x3
    Returns (frames [3], nest', ref_prev', ref_last'). State args are donated.
    """
    return _step_body(plane_plans, nest, new_nest, is_i, is_ref,
                      ref_prev, ref_last)


@functools.lru_cache(maxsize=None)
def _arena_step(cfg: SeqConfig, n: int, raw_cap: int, desc_cap: int):
    """Jitted production step for one pool tier: (arenas, nest, refs) → ..."""

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def step(arenas, nest, ref_prev, ref_last):
        plane_plans, new_nest, is_i, is_ref = _unpack_arena(
            cfg, n, arenas, raw_cap, desc_cap)
        return _step_body(plane_plans, nest, new_nest, is_i, is_ref,
                          ref_prev, ref_last)

    return step


@functools.lru_cache(maxsize=None)
def _arena_superstep(cfg: SeqConfig, n: int, k_steps: int,
                     raw_cap: int, desc_cap: int):
    """Jitted K-step fused dispatch: one upload + one executable run K
    sequential lock-step decodes via `lax.scan` (donated state carry).

    The arena holds n*K *virtual streams*: step k occupies slots
    [k*n, (k+1)*n), so the host planner and the slot-derivation logic are
    exactly the n*K-stream ones. Fusing K steps amortizes the per-dispatch
    and per-transfer fixed costs K-fold — on tunnel- or PCIe-latency-bound
    hosts that fixed cost, not bandwidth, dominates the device phase.

    Returns (frames [3 x (K, n, H, W)], nest', ref_prev', ref_last').
    """
    nv = n * k_steps

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def step(arenas, nest, ref_prev, ref_last):
        plane_plans, new_nest, is_i, is_ref = _unpack_arena(
            cfg, nv, arenas, raw_cap, desc_cap)

        def resh(a):
            return a.reshape((k_steps, n) + a.shape[1:])

        xs = jax.tree.map(resh, (plane_plans, new_nest, is_i, is_ref))

        def body(carry, x):
            nest_c, rp, rl = carry
            plans_k, nn_k, ii_k, ir_k = x
            frames, nest_c, rp, rl = _step_body(
                plans_k, nest_c, nn_k, ii_k, ir_k, rp, rl)
            return (nest_c, rp, rl), frames

        (nest, ref_prev, ref_last), frames = jax.lax.scan(
            body, (nest, ref_prev, ref_last), xs)
        return frames, nest, ref_prev, ref_last

    return step


@dataclasses.dataclass
class _Stream:
    records: list
    pos: int = 0
    failed: bool = False


@dataclasses.dataclass
class FrameMeta:
    ftype: str
    display_id: int


class MultiStreamDecoder:
    """Host orchestration for N parallel streams of one SeqConfig."""

    def __init__(self, cfg: SeqConfig, clips: list[bytes],
                 planner_factory=Planner, sharding=None,
                 record_lists: list | None = None,
                 steps_per_dispatch: int = 1):
        self.cfg = cfg
        self.planner = planner_factory(cfg)
        self.sharding = sharding
        self._k = max(int(steps_per_dispatch), 1)
        if self._k > 1 and sharding is not None:
            raise ValueError("fused multi-step dispatch is single-chip only")
        self.streams = []
        if record_lists is not None:
            for recs in record_lists:
                self.streams.append(_Stream(records=list(recs)))
        else:
            for clip in clips:
                d = Demuxer(clip)
                if d.info.cfg != cfg:
                    raise ValueError("all streams must share one SeqConfig")
                recs = [(r.block_index, r.frame_char, r.payload)
                        for r in d.video_records()]
                self.streams.append(_Stream(records=recs))
        self.n = len(self.streams)
        nh, nw = cfg.nest_shape
        dev = self._put
        self.nest = dev(np.zeros((self.n, nh, nw), np.uint8))
        self.ref_prev = [dev(np.zeros((self.n, h, w), np.uint8))
                         for h, w in cfg.plane_shapes]
        self.ref_last = [dev(np.zeros((self.n, h, w), np.uint8))
                         for h, w in cfg.plane_shapes]
        # ping-pong host arenas (avoid racing an in-flight transfer).
        # Arenas are sized for n * K VIRTUAL streams: with fused K-step
        # dispatch, step k's plans occupy virtual slots [k*n, (k+1)*n)
        nv = self.n * self._k
        self._nv = nv
        _groups, totals, pinfo = _arena_entries(cfg, nv)
        self._pinfo = pinfo
        arena_totals = {
            "u8": totals["u8"] + pinfo["raw_cap"] * nv * 16,
            "u32": totals["u32"] + pinfo["desc_cap"] * nv,
        }
        self._fixed = totals
        self._bufs = []
        for _ in range(2):
            arenas = {g: np.zeros(t, _ARENA_DTYPES[g])
                      for g, t in arena_totals.items()}
            planes, extras, pools = _arena_views(cfg, nv, arenas)
            buf = {"arenas": arenas, "planes": planes, "pools": pools,
                   **extras}
            # per-slot view dicts are stable: precompute once so the
            # planning hot loop is a bare ctypes call (GIL-released C++)
            buf["stream_views"] = [
                ([{k: pp[k][si] for k in _PLANE_KEYS} for pp in planes],
                 extras["new_nest"][si], extras["mv"][si], extras["mv2"][si])
                for si in range(nv)]
            buf["raw_used"] = 0
            buf["desc_used"] = 0
            if hasattr(self.planner, "prepare"):
                from ..native import StepPlanner, make_pool_struct

                pool_structs = [
                    make_pool_struct(
                        pools["raw"][:, si, :], pools["desc"][:, si],
                        raw_stride=nv * 16, desc_stride=nv,
                        raw_cap=pinfo["raw_cap"], desc_cap=pinfo["desc_cap"])
                    for si in range(nv)]
                buf["step_planner"] = StepPlanner(
                    self.planner, nv, buf["stream_views"], pool_structs)
            self._bufs.append(buf)
        self._cur = 0

    def _put(self, x):
        return (jax.device_put(x, self.sharding)
                if self.sharding is not None else jnp.asarray(x))

    @property
    def active(self) -> list[bool]:
        return [s.pos < len(s.records) and not s.failed for s in self.streams]

    # -- host half -------------------------------------------------------------

    def _fill_trivial(self, buf, si: int) -> None:
        """Inactive-stream filler: all-intra weight blocks at DC 128 (the
        other fields are masked out by meta on device)."""
        for pp in buf["planes"]:
            pp["meta"][si] = 0
            pp["dc"][si] = 128
        buf["is_i"][si] = 0
        buf["is_ref"][si] = 0

    @staticmethod
    def _pack_sparse(buf, si: int, plan: FramePlan) -> tuple[int, int]:
        """Dense FramePlan → sparse batch views (python-planner fallback)."""
        raw_slot = desc_slot = 0
        for pp, p in zip(buf["planes"], plan.planes):
            src = device_core.plane_plan_arrays(p)
            desc_blk = src["desc"].transpose(1, 2, 0)  # (bh, bw, 4) wire u32
            pp["meta"][si] = src["meta"]
            pp["dc"][si] = src["dc"]
            is_raw = (p.cls == 0) & (p.mode == 6)
            slot = np.zeros(p.mode.shape, np.uint32)
            for (by, bx) in zip(*np.nonzero(is_raw)):
                buf["pools"]["raw"][raw_slot, si] = p.raw[by, bx]
                slot[by, bx] = raw_slot
                raw_slot += 1
            counts = np.where(((p.cls == 0) & (p.mode >= 1) & (p.mode <= 4))
                              | (p.cls == 1), p.mode, 0)
            for (by, bx) in zip(*np.nonzero(counts)):
                k = int(counts[by, bx])
                slot[by, bx] = desc_slot
                buf["pools"]["desc"][desc_slot:desc_slot + k, si] = \
                    desc_blk[by, bx, :k]
                desc_slot += k
            pp["slot"][si] = slot
        # per-MB vectors: the luma plan carries them unshifted, one MB = a
        # 2x2 luma block group, so its top-left block is the MB's vector;
        # packed (y16 << 16 | x16) into the u32 arena
        for key, mvs in (("mv", plan.planes[0].mv),
                         ("mv2", plan.planes[0].mv2)):
            mb = mvs[::2, ::2]
            buf[key][si] = (((mb[..., 1].astype(np.uint32) & 0xFFFF) << 16)
                            | (mb[..., 0].astype(np.uint32) & 0xFFFF))
        return raw_slot, desc_slot

    def plan_step(self):
        """Plan the next frame of every stream into the current batch buffers.

        Returns (buf, metas, valid). With fused dispatch (K > 1) a call
        plans the next K lock-step frames of every stream and metas/valid
        are nested per step: metas[k][si]."""
        buf = self._bufs[self._cur]
        buf["raw_used"] = 0
        buf["desc_used"] = 0
        if self._k > 1:
            return self._plan_super(buf)
        if "step_planner" in buf:
            return self._plan_step_batch(buf)
        metas: list[FrameMeta | None] = []
        valid: list[bool] = []
        for si, s in enumerate(self.streams):
            if s.failed or s.pos >= len(s.records):
                self._fill_trivial(buf, si)
                metas.append(None)
                valid.append(False)
                continue
            _block, fchar, payload = s.records[s.pos]
            s.pos += 1
            try:
                meta = self._plan_into(buf, si, fchar, payload)
            except PlannerError:
                s.failed = True  # poison one stream, not the batch
                self._fill_trivial(buf, si)
                metas.append(None)
                valid.append(False)
                continue
            buf["is_i"][si] = 1 if fchar == "I" else 0
            buf["is_ref"][si] = 1 if fchar in ("I", "P") else 0
            metas.append(meta)
            valid.append(True)
        return buf, metas, valid

    def _plan_super(self, buf):
        """Plan the next K lock-step steps of every stream into one fused
        arena (virtual slot k*n + si = stream si's k-th frame ahead).

        Returns (buf, metas[k][si], valid[k][si])."""
        n, K = self.n, self._k
        slot_jobs: list = [None] * (K * n)
        for si, s in enumerate(self.streams):
            for k in range(K):
                if s.failed or s.pos >= len(s.records):
                    break
                slot_jobs[k * n + si] = s.records[s.pos]
                s.pos += 1
        metas = [[None] * n for _ in range(K)]
        valid = [[False] * n for _ in range(K)]
        if "step_planner" in buf:
            sp = buf["step_planner"]
            jobs = [(j[1], j[2]) if j is not None else None
                    for j in slot_jobs]
            while True:
                rc = sp.plan(jobs)
                if rc == 0:
                    break
                si = (rc - 1) % n  # poison the failed stream, keep the rest
                self.streams[si].failed = True
                for k in range(K):
                    jobs[k * n + si] = None
            for v, job in enumerate(jobs):
                k, si = divmod(v, n)
                if job is None:
                    self._fill_trivial(buf, v)
                    continue
                fchar = job[0]
                fout = sp.fouts[v]
                buf["is_i"][v] = 1 if fchar == "I" else 0
                buf["is_ref"][v] = 1 if fchar in ("I", "P") else 0
                buf["raw_used"] = max(buf["raw_used"], int(fout.raw_used))
                buf["desc_used"] = max(buf["desc_used"], int(fout.desc_used))
                metas[k][si] = FrameMeta(fchar, int(fout.display_id))
                valid[k][si] = True
            return buf, metas, valid
        for v, job in enumerate(slot_jobs):
            k, si = divmod(v, n)
            if job is None or self.streams[si].failed:
                self._fill_trivial(buf, v)
                continue
            _block, fchar, payload = job
            try:
                meta = self._plan_into(buf, v, fchar, payload)
            except PlannerError:
                # poison from this slot on; earlier slots stay valid
                self.streams[si].failed = True
                self._fill_trivial(buf, v)
                continue
            buf["is_i"][v] = 1 if fchar == "I" else 0
            buf["is_ref"][v] = 1 if fchar in ("I", "P") else 0
            metas[k][si] = meta
            valid[k][si] = True
        return buf, metas, valid

    def _plan_step_batch(self, buf):
        """One GIL-released C call plans the whole step (all active streams,
        optionally threaded). A failing stream is poisoned and the step is
        replanned without it (rare; replanning is deterministic)."""
        sp = buf["step_planner"]
        jobs: list = []
        for s in self.streams:
            if s.failed or s.pos >= len(s.records):
                jobs.append(None)
                continue
            _block, fchar, payload = s.records[s.pos]
            s.pos += 1
            jobs.append((fchar, payload))
        while True:
            rc = sp.plan(jobs)
            if rc == 0:
                break
            si = rc - 1  # poison the failed stream, keep the rest
            self.streams[si].failed = True
            jobs[si] = None
        metas: list[FrameMeta | None] = []
        valid: list[bool] = []
        for si, job in enumerate(jobs):
            if job is None:
                self._fill_trivial(buf, si)
                metas.append(None)
                valid.append(False)
                continue
            fchar = job[0]
            fout = sp.fouts[si]
            buf["is_i"][si] = 1 if fchar == "I" else 0
            buf["is_ref"][si] = 1 if fchar in ("I", "P") else 0
            buf["raw_used"] = max(buf["raw_used"], int(fout.raw_used))
            buf["desc_used"] = max(buf["desc_used"], int(fout.desc_used))
            metas.append(FrameMeta(fchar, int(fout.display_id)))
            valid.append(True)
        return buf, metas, valid

    def _plan_into(self, buf, si: int, fchar: str, payload: bytes) -> FrameMeta:
        if "prepared" in buf:
            disp, raw_used, desc_used = self.planner.plan_frame_prepared(
                fchar, payload, buf["prepared"][si])
            buf["raw_used"] = max(buf["raw_used"], raw_used)
            buf["desc_used"] = max(buf["desc_used"], desc_used)
            return FrameMeta(fchar, disp)
        plan: FramePlan = self.planner.plan_frame(fchar, payload)
        raw_used, desc_used = self._pack_sparse(buf, si, plan)
        buf["raw_used"] = max(buf["raw_used"], raw_used)
        buf["desc_used"] = max(buf["desc_used"], desc_used)
        if plan.nest is not None:
            buf["new_nest"][si] = plan.nest
        return FrameMeta(fchar, plan.display_id)

    # -- device half -----------------------------------------------------------

    def device_step(self, buf):
        """Batched decode of one planned step + state rotation.

        With fused dispatch (K > 1) the returned frames are stacked
        per step: [3 x (K, n, H, W)]."""
        if self.sharding is None:
            # production path: 2 typed-arena uploads (vs ~20 per-field ones),
            # with the sparse pool regions truncated to the used tier
            raw_cap = _pick_tier(buf["raw_used"], self._pinfo["raw_cap"])
            desc_cap = _pick_tier(buf["desc_used"], self._pinfo["desc_cap"])
            cut8 = self._fixed["u8"] + raw_cap * self._nv * 16
            cut32 = self._fixed["u32"] + desc_cap * self._nv
            arenas = {
                "u8": jnp.asarray(buf["arenas"]["u8"][:cut8]),
                "u32": jnp.asarray(buf["arenas"]["u32"][:cut32]),
            }
            if self._k > 1:
                step_fn = _arena_superstep(self.cfg, self.n, self._k,
                                           raw_cap, desc_cap)
            else:
                step_fn = _arena_step(self.cfg, self.n, raw_cap, desc_cap)
            frames, self.nest, self.ref_prev, self.ref_last = step_fn(
                arenas, self.nest, self.ref_prev, self.ref_last)
            return frames
        # mesh path: per-field uploads (each field is N-major and shardable);
        # dense raw/desc/mv are materialized on host from the pools/MB grid
        put = self._put
        plane_plans = []
        pools = buf["pools"]
        rc, dcp = self._pinfo["raw_cap"], self._pinfo["desc_cap"]
        for pi, pp in enumerate(buf["planes"]):
            bh, bw = self.cfg.block_grids[pi]
            d = {k: put(np.ascontiguousarray(pp[k])) for k in ("meta", "dc")}
            chroma_mb = pi > 0 and self.cfg.h_samp == 2
            for key in ("mv", "mv2"):
                v = buf[key].astype(np.int32)
                mvx = (v << 16) >> 16
                mvy = v >> 16
                if chroma_mb:
                    mvx, mvy = mvx >> 1, mvy >> 1
                d[key] = put(np.ascontiguousarray(
                    np.stack([mvx, mvy], axis=1).astype(np.int16)))
            slot = pp["slot"].astype(np.int64)
            idx = np.clip(slot, 0, rc - 1)
            raw_dense = np.stack([
                pools["raw"][idx[si], si].reshape(bh, bw, 4, 4)
                .transpose(0, 2, 1, 3).reshape(bh * 4, bw * 4)
                for si in range(self.n)])
            didx = np.clip(slot[..., None] + np.arange(4), 0, dcp - 1)
            desc_dense = np.stack([
                pools["desc"][didx[si], si].transpose(2, 0, 1)
                for si in range(self.n)])
            d["raw"] = put(np.ascontiguousarray(raw_dense))
            d["desc"] = put(np.ascontiguousarray(desc_dense))
            plane_plans.append(d)
        frames, self.nest, self.ref_prev, self.ref_last = multi_frame_step(
            plane_plans, self.nest, put(np.ascontiguousarray(buf["new_nest"])),
            put(buf["is_i"] != 0), put(buf["is_ref"] != 0),
            self.ref_prev, self.ref_last)
        return frames

    def step(self):
        """plan + decode; returns (frames, metas, valid) or None when done.

        With fused dispatch (K > 1): frames [3 x (K, n, H, W)], metas and
        valid nested per step (metas[k][si])."""
        if not any(self.active):
            return None
        buf, metas, valid = self.plan_step()
        frames = self.device_step(buf)
        self._cur ^= 1
        return frames, metas, valid

    def run_pipelined(self):
        """Generator over steps with host/device overlap (SURVEY.md §2.6).

        While the device executes step k from one ping-pong arena, a worker
        thread plans step k+1 into the other (the native planner releases the
        GIL inside ctypes, so entropy decode genuinely overlaps device
        dispatch/transfer). Yields (frames, metas, valid) per SINGLE step
        regardless of the fused-dispatch factor (stacked frames are sliced
        lazily — device-side views, no transfer)."""
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=1) as ex:
            if not any(self.active):
                return
            fut = ex.submit(self.plan_step)
            while fut is not None:
                buf, metas, valid = fut.result()
                self._cur ^= 1
                fut = ex.submit(self.plan_step) if any(self.active) else None
                frames = self.device_step(buf)
                if self._k == 1:
                    yield frames, metas, valid
                else:
                    for k in range(self._k):
                        if not any(valid[k]) and k > 0:
                            continue  # trailing filler slots of a short clip
                        yield ([frames[pi][k] for pi in range(3)],
                               metas[k], valid[k])


def shard_streams(mesh, axis: str = "dp"):
    """NamedSharding placing the stream axis over a mesh axis (others replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis))


def decode_clip_gop_parallel(clip: bytes, max_streams: int = 8,
                             planner_factory=None):
    """Decode ONE `.h4m` clip with its GOP blocks batched as parallel streams.

    GOP blocks are independent seek points (reference state resets at each,
    FORMAT.md §2), so a single long clip decodes at multi-stream throughput:
    blocks are dealt round-robin onto up to `max_streams` lanes and each
    lane's frames are re-assembled into decode order at the end.

    Yields (block_index, yuv_bytes) per frame, in the clip's decode order.
    Frames round-trip to the host here (this is the export/CLI path — the
    training/serving paths keep frames on device).
    """
    d = Demuxer(clip)
    cfg = d.info.cfg
    blocks: list[list] = [[] for _ in d.block_offsets]
    for r in d.video_records():
        blocks[r.block_index].append((r.block_index, r.frame_char, r.payload))
    n = min(max_streams, len(blocks)) or 1
    lanes: list[list] = [[] for _ in range(n)]
    lane_of_block = {}
    for bi, recs in enumerate(blocks):
        lanes[bi % n].extend(recs)
        lane_of_block[bi] = bi % n
    if planner_factory is None:
        try:
            from ..native import NativePlanner as planner_factory
        except Exception:
            planner_factory = Planner
    ms = MultiStreamDecoder(cfg, [], planner_factory=planner_factory,
                            record_lists=lanes)
    per_lane: list[list] = [[] for _ in range(n)]
    for frames, metas, valid in ms.run_pipelined():
        fnp = [np.asarray(p) for p in frames]
        for si, ok in enumerate(valid):
            if ok:
                per_lane[si].append(b"".join(
                    fnp[pi][si].tobytes() for pi in range(3)))
    cursors = [0] * n
    for bi, recs in enumerate(blocks):
        lane = lane_of_block[bi]
        for _ in recs:
            yield bi, per_lane[lane][cursors[lane]]
            cursors[lane] += 1