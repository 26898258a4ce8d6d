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
- each step uploads the arenas as two dtype-homogeneous transfers (one
  host→device round-trip each instead of ~20 — interconnect latency, not
  bandwidth, dominated the per-field path) and the jitted step slices field
  views out of them;
- device state buffers are donated to the step so XLA updates them in place;
- `run_pipelined` plans step k+1 on a worker thread (the C++ planner releases
  the GIL) while the device executes step k.

Sharding (ONE code path with single-chip): the arenas are allocated as
(S, arena_len) — one row per shard of the mesh axis carrying the stream
dimension, each row laid out exactly like the single-chip arena for the
shard's n/S streams. The jitted mesh step is `jax.shard_map` of the *same*
step body over that axis, so every chip runs the identical arena unpack +
decode the single-chip benchmark runs, and no cross-chip communication
exists on the decode path (the correct answer for this workload —
SURVEY.md §2.6: streams are independent; collectives only appear downstream,
e.g. tensor-parallel ViT).
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
from ..plans import FramePlan

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
    still only 2 h2d round-trips per step.

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
    """Writable numpy views into one shard's 1-D arenas:
    (planes, extras, pools).

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
    counts = device_core.basis_count(cls_, mode)
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


def _run_steps(cfg: SeqConfig, n: int, k_steps: int,
               raw_cap: int, desc_cap: int,
               arenas, nest, ref_prev, ref_last):
    """The shared step body (single-chip jit AND per-shard under shard_map):
    1-D typed arenas for n*k_steps virtual streams → K sequential lock-step
    decodes of n streams.

    With k_steps == 1 frames are [3 x (n, H, W)]; with fused dispatch they
    are stacked per step [3 x (K, n, H, W)] (one upload + one executable
    amortizes the per-dispatch and per-transfer fixed costs K-fold — on
    tunnel- or PCIe-latency-bound hosts that fixed cost, not bandwidth,
    dominates the device phase). Virtual slot k*n+j is stream j's k-th
    frame ahead, so the host planner and the slot-derivation logic are
    exactly the (n*K)-stream ones.
    """
    nv = n * k_steps
    plane_plans, new_nest, is_i, is_ref = _unpack_arena(
        cfg, nv, arenas, raw_cap, desc_cap)
    if k_steps == 1:
        return _step_body(plane_plans, nest, new_nest, is_i, is_ref,
                          ref_prev, ref_last)

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


@functools.lru_cache(maxsize=None)
def _arena_step(cfg: SeqConfig, n: int, k_steps: int,
                raw_cap: int, desc_cap: int):
    """Jitted production step for one (pool tier, fused-K) shape."""

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def step(arenas, nest, ref_prev, ref_last):
        return _run_steps(cfg, n, k_steps, raw_cap, desc_cap,
                          arenas, nest, ref_prev, ref_last)

    return step


@functools.lru_cache(maxsize=None)
def _arena_step_sharded(cfg: SeqConfig, n_local: int, k_steps: int,
                        raw_cap: int, desc_cap: int, mesh, axis: str):
    """Jitted mesh step: `jax.shard_map` of the SAME `_run_steps` body over
    the stream-carrying mesh axis. Each shard sees one (1, arena_len) row —
    its own single-chip-layout arenas for n_local streams — plus its
    (n_local, ...) state blocks; there are no collectives (streams are
    independent), so scaling rides pure ICI-free SPMD."""
    from jax.sharding import PartitionSpec as P

    def local_fn(arenas, nest, ref_prev, ref_last):
        arenas = {g: a.reshape(-1) for g, a in arenas.items()}
        return _run_steps(cfg, n_local, k_steps, raw_cap, desc_cap,
                          arenas, nest, ref_prev, ref_last)

    st = P(axis)
    frames_spec = st if k_steps == 1 else P(None, axis)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=({"u8": P(axis, None), "u32": P(axis, None)}, st, st, st),
        out_specs=(frames_spec, st, st, st))
    return jax.jit(fn, donate_argnums=(1, 2, 3))


@dataclasses.dataclass
class _Stream:
    records: list
    pos: int = 0
    failed: bool = False
    anchors: int = 0       # I/P frames decoded in the current GOP block
    cur_block: int = -1


@dataclasses.dataclass
class FrameMeta:
    ftype: str
    display_id: int


class MultiStreamDecoder:
    """Host orchestration for N parallel streams of one SeqConfig.

    With `sharding` (a NamedSharding whose spec leads with a mesh axis) the
    stream axis is laid over that axis: shard s owns the contiguous streams
    [s*n/S, (s+1)*n/S) and its own arena row, and `device_step` runs the
    identical arena step under `shard_map` — one code path for single-chip
    and mesh.
    """

    def __init__(self, cfg: SeqConfig, clips: list[bytes],
                 planner_factory=Planner, sharding=None,
                 record_lists: list | None = None,
                 steps_per_dispatch: int = 1):
        self.cfg = cfg
        self.planner = planner_factory(cfg)
        self.sharding = sharding
        self._k = max(int(steps_per_dispatch), 1)
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
        if sharding is not None:
            self._mesh = sharding.mesh
            self._axis = sharding.spec[0]
            self._shards = int(self._mesh.shape[self._axis])
            if self.n % self._shards:
                raise ValueError(
                    f"{self.n} streams not divisible by mesh axis "
                    f"{self._axis!r} size {self._shards}")
        else:
            self._mesh = self._axis = None
            self._shards = 1
        self._n_local = self.n // self._shards
        nh, nw = cfg.nest_shape
        dev = self._put
        self.nest = dev(np.zeros((self.n, nh, nw), np.uint8))
        self.ref_prev = [dev(np.zeros((self.n, h, w), np.uint8))
                         for h, w in cfg.plane_shapes]
        self.ref_last = [dev(np.zeros((self.n, h, w), np.uint8))
                         for h, w in cfg.plane_shapes]
        # ping-pong host arenas (avoid racing an in-flight transfer), one row
        # per shard. Each row is sized for n_local * K VIRTUAL streams: with
        # fused K-step dispatch, step k's plans occupy a shard's virtual
        # slots [k*n_local, (k+1)*n_local) (see `_slot`)
        nvl = self._n_local * self._k
        self._nvl = nvl
        _groups, totals, pinfo = _arena_entries(cfg, nvl)
        self._pinfo = pinfo
        arena_totals = {
            "u8": totals["u8"] + pinfo["raw_cap"] * nvl * 16,
            "u32": totals["u32"] + pinfo["desc_cap"] * nvl,
        }
        self._fixed = totals
        native = hasattr(self.planner, "prepare")
        if native:
            from ..native import StepPlanner, make_pool_struct
        self._bufs = []
        for _ in range(2):
            arenas = {g: np.zeros((self._shards, t), _ARENA_DTYPES[g])
                      for g, t in arena_totals.items()}
            shards = []
            stream_views = []
            pool_structs = []
            for s in range(self._shards):
                planes, extras, pools = _arena_views(
                    cfg, nvl, {g: a[s] for g, a in arenas.items()})
                shards.append({"planes": planes, "pools": pools, **extras})
                # per-slot view dicts are stable: precompute once so the
                # planning hot loop is a bare ctypes call (GIL-released C++)
                stream_views.extend(
                    ([{k: pp[k][lv] for k in _PLANE_KEYS} for pp in planes],
                     extras["new_nest"][lv], extras["mv"][lv],
                     extras["mv2"][lv])
                    for lv in range(nvl))
                if native:
                    pool_structs.extend(
                        make_pool_struct(
                            pools["raw"][:, lv, :], pools["desc"][:, lv],
                            raw_stride=nvl * 16, desc_stride=nvl,
                            raw_cap=pinfo["raw_cap"],
                            desc_cap=pinfo["desc_cap"])
                        for lv in range(nvl))
            buf = {"arenas": arenas, "shards": shards,
                   "stream_views": stream_views,
                   "raw_used": 0, "desc_used": 0}
            if native:
                buf["step_planner"] = StepPlanner(
                    self.planner, self._shards * nvl, stream_views,
                    pool_structs)
            self._bufs.append(buf)
        self._cur = 0

    def _put(self, x):
        return (jax.device_put(x, self.sharding)
                if self.sharding is not None else jnp.asarray(x))

    # -- (stream, step) ↔ virtual arena slot ----------------------------------

    def _slot(self, si: int, k: int = 0) -> int:
        """Global virtual slot of stream si's k-th frame in this dispatch:
        shard-major, then step-major within the shard (matches the
        `stream_views` build order and `_run_steps`'s (K, n) reshape)."""
        s, j = divmod(si, self._n_local)
        return s * self._nvl + k * self._n_local + j

    def _slot_inv(self, v: int) -> tuple[int, int]:
        s, r = divmod(v, self._nvl)
        k, j = divmod(r, self._n_local)
        return s * self._n_local + j, k

    def _shard_of(self, buf, v: int):
        s, lv = divmod(v, self._nvl)
        return buf["shards"][s], lv

    @property
    def active(self) -> list[bool]:
        return [s.pos < len(s.records) and not s.failed for s in self.streams]

    # -- host half -------------------------------------------------------------

    def _fill_trivial(self, buf, v: int) -> None:
        """Inactive-slot filler: all-intra weight blocks at DC 128 (the
        other fields are masked out by meta on device)."""
        sh, lv = self._shard_of(buf, v)
        for pp in sh["planes"]:
            pp["meta"][lv] = 0
            pp["dc"][lv] = 128
        sh["is_i"][lv] = 0
        sh["is_ref"][lv] = 0

    def _set_flags(self, buf, v: int, fchar: str) -> None:
        sh, lv = self._shard_of(buf, v)
        sh["is_i"][lv] = 1 if fchar == "I" else 0
        sh["is_ref"][lv] = 1 if fchar in ("I", "P") else 0

    def _pack_sparse(self, buf, v: int, plan: FramePlan) -> tuple[int, int]:
        """Dense FramePlan → sparse batch views (python-planner fallback)."""
        sh, lv = self._shard_of(buf, v)
        raw_slot = desc_slot = 0
        for pp, p in zip(sh["planes"], plan.planes):
            desc_blk = device_core.pack_desc(p)        # (bh, bw, 4) wire u32
            pp["meta"][lv] = device_core.pack_meta(p)
            pp["dc"][lv] = p.dc
            is_raw = (p.cls == 0) & (p.mode == 6)
            slot = np.zeros(p.mode.shape, np.uint32)
            for (by, bx) in zip(*np.nonzero(is_raw)):
                sh["pools"]["raw"][raw_slot, lv] = p.raw[by, bx]
                slot[by, bx] = raw_slot
                raw_slot += 1
            counts = np.where(((p.cls == 0) & (p.mode >= 1) & (p.mode <= 4))
                              | (p.cls == 1), p.mode, 0)
            for (by, bx) in zip(*np.nonzero(counts)):
                k = int(counts[by, bx])
                slot[by, bx] = desc_slot
                sh["pools"]["desc"][desc_slot:desc_slot + k, lv] = \
                    desc_blk[by, bx, :k]
                desc_slot += k
            pp["slot"][lv] = slot
        # per-MB vectors: the luma plan carries them unshifted, one MB = a
        # 2x2 luma block group, so its top-left block is the MB's vector;
        # packed (y16 << 16 | x16) into the u32 arena
        for key, mvs in (("mv", plan.planes[0].mv),
                         ("mv2", plan.planes[0].mv2)):
            mb = mvs[::2, ::2]
            sh[key][lv] = (((mb[..., 1].astype(np.uint32) & 0xFFFF) << 16)
                           | (mb[..., 0].astype(np.uint32) & 0xFFFF))
        return raw_slot, desc_slot

    def plan_step(self):
        """Plan the next frame of every stream into the current batch buffers.

        Returns (buf, metas, valid). With fused dispatch (K > 1) a call
        plans the next K lock-step frames of every stream and metas/valid
        are nested per step: metas[k][si]. K == 1 is the same machinery
        with the step axis flattened away."""
        buf = self._bufs[self._cur]
        buf["raw_used"] = 0
        buf["desc_used"] = 0
        buf, metas, valid = self._plan_super(buf)
        if self._k == 1:
            return buf, metas[0], valid[0]
        return buf, metas, valid

    def _plan_super(self, buf):
        """Plan the next K lock-step steps of every stream into one fused
        arena (virtual slot `_slot(si, k)` = stream si's k-th frame ahead).

        With the native planner, one GIL-released C call plans every slot
        (threaded); a failing slot poisons its stream FROM THAT FRAME ON —
        frames planned before the failure stay valid — and the step is
        replanned without the dropped slots (rare; replanning is
        deterministic). Returns (buf, metas[k][si], valid[k][si])."""
        n, K = self.n, self._k
        slot_jobs: list = [None] * (K * n)
        for si, s in enumerate(self.streams):
            for k in range(K):
                if s.failed or s.pos >= len(s.records):
                    break
                bi, fchar, _payload = s.records[s.pos]
                if bi != s.cur_block:      # GOP block boundary: refs reset
                    s.cur_block = bi
                    s.anchors = 0
                if fchar == "B" and s.anchors < 2:
                    # invalid stream (FORMAT.md §10: B without two
                    # references) — poison it, keep the batch
                    s.failed = True
                    break
                if fchar in ("I", "P"):
                    s.anchors += 1
                slot_jobs[self._slot(si, k)] = s.records[s.pos]
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
                si, kf = self._slot_inv(rc - 1)
                self.streams[si].failed = True
                for k in range(kf, K):  # earlier frames stay valid
                    jobs[self._slot(si, k)] = None
            for v, job in enumerate(jobs):
                si, k = self._slot_inv(v)
                if job is None:
                    self._fill_trivial(buf, v)
                    continue
                fchar = job[0]
                fout = sp.fouts[v]
                self._set_flags(buf, v, fchar)
                buf["raw_used"] = max(buf["raw_used"], int(fout.raw_used))
                buf["desc_used"] = max(buf["desc_used"], int(fout.desc_used))
                metas[k][si] = FrameMeta(fchar, int(fout.display_id))
                valid[k][si] = True
            return buf, metas, valid
        poisoned_at = [K] * n  # first dropped step per stream
        for v, job in enumerate(slot_jobs):
            si, k = self._slot_inv(v)
            if job is None or k >= poisoned_at[si]:
                self._fill_trivial(buf, v)
                continue
            _block, fchar, payload = job
            try:
                meta = self._plan_into(buf, v, fchar, payload)
            except PlannerError:
                # poison from this slot on; earlier slots stay valid
                self.streams[si].failed = True
                poisoned_at[si] = k
                self._fill_trivial(buf, v)
                continue
            self._set_flags(buf, v, fchar)
            metas[k][si] = meta
            valid[k][si] = True
        return buf, metas, valid

    def _plan_into(self, buf, v: int, fchar: str, payload: bytes) -> FrameMeta:
        plan: FramePlan = self.planner.plan_frame(fchar, payload)
        raw_used, desc_used = self._pack_sparse(buf, v, plan)
        buf["raw_used"] = max(buf["raw_used"], raw_used)
        buf["desc_used"] = max(buf["desc_used"], desc_used)
        if plan.nest is not None:
            sh, lv = self._shard_of(buf, v)
            sh["new_nest"][lv] = plan.nest
        return FrameMeta(fchar, plan.display_id)

    # -- device half -----------------------------------------------------------

    def arena_cuts(self, buf):
        """(raw_cap, desc_cap, cut8, cut32) for a planned step: the pool
        upload tier and the arena-row element prefixes `device_step`
        transfers. The ONE definition of the prefix formula (measurement
        scripts use it too — keep them honest when the layout changes)."""
        raw_cap = _pick_tier(buf["raw_used"], self._pinfo["raw_cap"])
        desc_cap = _pick_tier(buf["desc_used"], self._pinfo["desc_cap"])
        cut8 = self._fixed["u8"] + raw_cap * self._nvl * 16
        cut32 = self._fixed["u32"] + desc_cap * self._nvl
        return raw_cap, desc_cap, cut8, cut32

    def device_step(self, buf):
        """Batched decode of one planned step + state rotation — ONE code
        path: two typed-arena uploads (vs ~20 per-field ones) with the
        sparse pool regions truncated to the used tier, then the jitted
        arena step (wrapped in shard_map when a mesh sharding is set).

        With fused dispatch (K > 1) the returned frames are stacked
        per step: [3 x (K, n, H, W)]."""
        raw_cap, desc_cap, cut8, cut32 = self.arena_cuts(buf)
        h8 = buf["arenas"]["u8"][:, :cut8]
        h32 = buf["arenas"]["u32"][:, :cut32]
        if self.sharding is None:
            # single shard: rows are contiguous, upload 1-D views
            h8r, h32r = h8[0], h32[0]
            if jax.default_backend() == "cpu":
                # the CPU backend may zero-copy-alias aligned numpy buffers;
                # the ping-pong arena is rewritten two steps later, so hand
                # the device a private copy (TPU always transfers)
                h8r, h32r = h8r.copy(), h32r.copy()
            arenas = {"u8": jnp.asarray(h8r), "u32": jnp.asarray(h32r)}
            step_fn = _arena_step(self.cfg, self.n, self._k,
                                  raw_cap, desc_cap)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if jax.default_backend() == "cpu":
                # same zero-copy-aliasing hazard as the single-shard branch:
                # the CPU PJRT client may alias aligned host buffers, and the
                # ping-pong arena is rewritten two steps later while an async
                # sharded step can still be reading it
                h8, h32 = h8.copy(), h32.copy()
            ash = NamedSharding(self._mesh, P(self._axis, None))
            arenas = {"u8": jax.device_put(h8, ash),
                      "u32": jax.device_put(h32, ash)}
            step_fn = _arena_step_sharded(
                self.cfg, self._n_local, self._k, raw_cap, desc_cap,
                self._mesh, self._axis)
        frames, self.nest, self.ref_prev, self.ref_last = step_fn(
            arenas, self.nest, self.ref_prev, self.ref_last)
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

    Yields (block_index, yuv_bytes) per frame, in the clip's decode order,
    STREAMING: a frame is yielded as soon as every earlier frame of the
    clip has been (memory is bounded by cross-lane skew, not clip length).
    A corrupt GOP block poisons only its lane; its frames (and that lane's
    later blocks) are skipped while every other lane's frames still arrive.
    Frames round-trip to the host here (this is the export/CLI path — the
    training/serving paths keep frames on device).
    """
    import collections

    d = Demuxer(clip)
    cfg = d.info.cfg
    blocks: list[list] = [[] for _ in d.block_offsets]
    for r in d.video_records():
        blocks[r.block_index].append((r.block_index, r.frame_char, r.payload))
    n = min(max_streams, len(blocks)) or 1
    lanes: list[list] = [[] for _ in range(n)]
    order: list[tuple[int, int]] = []   # decode order: (block, lane)
    for bi, recs in enumerate(blocks):
        lanes[bi % n].extend(recs)
        order.extend((bi, bi % n) for _ in recs)
    if planner_factory is None:
        from ..planner import default_planner_factory

        planner_factory = default_planner_factory()
    ms = MultiStreamDecoder(cfg, [], planner_factory=planner_factory,
                            record_lists=lanes)
    per_lane = [collections.deque() for _ in range(n)]
    pos = 0
    done = False

    def drain():
        nonlocal pos
        while pos < len(order):
            bi, lane = order[pos]
            if per_lane[lane]:
                yield bi, per_lane[lane].popleft()
                pos += 1
            elif done or ms.streams[lane].failed:
                pos += 1    # lost to poisoning/end: skip, keep lanes flowing
            else:
                return      # wait for the lane to catch up

    for frames, _metas, valid in ms.run_pipelined():
        fnp = None
        for si, ok in enumerate(valid):
            if ok:
                if fnp is None:
                    fnp = [np.asarray(p) for p in frames]
                per_lane[si].append(b"".join(
                    fnp[pi][si].tobytes() for pi in range(3)))
        yield from drain()
    done = True
    yield from drain()
