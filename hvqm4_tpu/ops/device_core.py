"""JAX device core: plan tensors → pixels, batched over the whole frame.

The TPU-native replacement for the reference's per-block scalar loops
(SURVEY.md §2.3: `WeightImBlock`, `IntraAotBlock`, `OrgBlock`,
`PrediAotBlock`, `_MotionComp*`, B blending). Every 4×4 block of a plane is
computed simultaneously: block modes become masked selects over the block
grid, nest lookups and motion compensation become gathers, and all arithmetic
is exact int32 with arithmetic shifts so the output is bit-identical to the C
oracle on any XLA backend.

Two entry points per plane shape, each jit-compiled once per `SeqConfig`:
- `decode_plane_intra(plan, nest)`            — I frames
- `decode_plane_inter(plan, nest, ref0, ref1)`— P/B frames

`kernels/` provides Pallas implementations of the hot inner pieces; this
module is the always-correct XLA reference path and the default.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_BASES
from ..plans import PlanePlan

_W = np.array([4, 1, 0, 0], np.int32)


def plane_plan_arrays(p: PlanePlan) -> dict[str, np.ndarray]:
    """PlanePlan → the dense per-block device plan arrays.

    Host→device bandwidth is a first-order cost (and, through the test
    tunnel, a leak multiplier), so the upload format is minimal:

    - ``meta`` u8: mode in bits 0-2, refsel in bits 3-4, cls in bit 5
    - ``desc`` u32[4]: basis descriptors in wire format (FORMAT.md §6.5)
    - ``dc`` u8, ``raw`` u8[16], ``mv``/``mv2`` i16[2]

    This is the *expanded* form the device core consumes. The production
    multi-stream arena uploads an even tighter encoding (unified sparse
    payload slot, per-MACROBLOCK motion vectors — see
    `parallel.multistream`) and expands to this form inside the jitted
    step. The device core unpacks meta with shifts (free — it fuses into
    the consuming ops).
    """
    meta = (p.mode | (p.refsel << 3) | (p.cls << 5)).astype(np.uint8)
    desc = ((p.basis_nx.astype(np.uint32) << 25)
            | (p.basis_ny.astype(np.uint32) << 18)
            | ((np.maximum(p.basis_sx.astype(np.uint32), 1) - 1) << 17)
            | ((np.maximum(p.basis_sy.astype(np.uint32), 1) - 1) << 16)
            | ((p.basis_off.astype(np.int64) & 0xFF).astype(np.uint32) << 8)
            | (p.basis_scale.astype(np.int64) & 0xFF).astype(np.uint32))
    return {
        "meta": meta,
        "dc": p.dc,
        "raw": p.raw,
        "desc": desc,
        "mv": p.mv,
        "mv2": p.mv2,
    }


def unpack_meta(meta):
    """meta u8 → (cls, refsel, mode) i32."""
    m = _i32(meta)
    return _sra(m, 5) & 1, _sra(m, 3) & 3, m & 7


def _sra(x, n):
    """Arithmetic shift right (sign-propagating), explicit for clarity."""
    return jax.lax.shift_right_arithmetic(x, jnp.int32(n))


def _i32(x):
    return x.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Intra pieces
# ---------------------------------------------------------------------------

def weight_blocks(dc_grid):
    """Mode-0 smoothing for all blocks at once (FORMAT.md §6.3) → (bh,bw,4,4).

    Neighbor DCs via edge-replicating shifts of the DC grid: replication
    makes out-of-frame neighbors equal the center DC, exactly the border rule.
    """
    dc = _i32(dc_grid)
    dcU = jnp.concatenate([dc[:1], dc[:-1]], axis=0)
    dcD = jnp.concatenate([dc[1:], dc[-1:]], axis=0)
    dcL = jnp.concatenate([dc[:, :1], dc[:, :-1]], axis=1)
    dcR = jnp.concatenate([dc[:, 1:], dc[:, -1:]], axis=1)
    c = dc[:, :, None, None]
    wi = jnp.asarray(_W)[None, None, :, None]
    wj = jnp.asarray(_W)[None, None, None, :]
    acc = ((dcU[:, :, None, None] - c) * wi
           + (dcD[:, :, None, None] - c) * wi[:, :, ::-1, :]
           + (dcL[:, :, None, None] - c) * wj
           + (dcR[:, :, None, None] - c) * wj[:, :, :, ::-1])
    return c + _sra(acc + 8, 4)


def unpack_desc(desc):
    """Wire-format u32 basis descriptors (FORMAT.md §6.5) → i32 fields."""
    d = _i32(desc.astype(jnp.uint32))  # logical ops below mask sign bits away
    nx = _sra(d, 25) & 0x7F
    ny = _sra(d, 18) & 0x7F
    sx = (_sra(d, 17) & 1) + 1
    sy = (_sra(d, 16) & 1) + 1
    off = _sra(d, 8) & 0xFF
    scale8 = d & 0xFF
    scale = scale8 - ((scale8 & 0x80) << 1)  # sign-extend 8-bit
    return nx, ny, sx, sy, off, scale


def aot_acc(plan, nest, count):
    """AOT accumulator for all blocks (FORMAT.md §6.2) → (bh,bw,4,4) i32.

    One flat gather from the VMEM-resident nest (≤ 2660 entries) — the
    device-side `GetAotBasis`/`GetMCAotBasis`.
    """
    nh, nw = nest.shape
    bnx, bny, bsx, bsy, boff, bscale = unpack_desc(plan["desc"])
    i = jnp.arange(4, dtype=jnp.int32)
    ny = bny[:, :, :, None] + i[None, None, None, :] * bsy[:, :, :, None]
    nx = bnx[:, :, :, None] + i[None, None, None, :] * bsx[:, :, :, None]
    idx = (ny % nh)[:, :, :, :, None] * nw + (nx % nw)[:, :, :, None, :]
    samples = jnp.take(_i32(nest.reshape(-1)), idx)                 # (bh,bw,B,4,4)
    terms = (samples - boff[:, :, :, None, None]) \
        * bscale[:, :, :, None, None]
    mask = (jnp.arange(MAX_BASES)[None, None, :] < count[:, :, None])
    return jnp.sum(terms * mask[:, :, :, None, None], axis=2)


# Pallas kernel routing, fixed at import: "off" (XLA, default), "on"
# (compiled Pallas kernels), or "interpret" (Pallas interpreter — CI /
# non-TPU backends). Import-time because the choice must be stable across
# jit traces. NOTE: this environment's TPU tunnel cannot compile Mosaic
# kernels (see .claude/skills/verify), so "on" is for real TPU-VMs.
_PALLAS_MODE = os.environ.get("HVQM4_PALLAS", "off")


def _intra_pixels(plan, nest):
    if _PALLAS_MODE != "off":
        from ..kernels.intra import intra_synth_pallas

        return intra_synth_pallas(plan, nest,
                                  interpret=_PALLAS_MODE == "interpret")
    bh, bw = plan["meta"].shape
    cls_, _refsel, mode = unpack_meta(plan["meta"])
    count = jnp.where((cls_ == 0) & (mode >= 1) & (mode <= 4), mode, 0)
    inter_count = jnp.where(cls_ != 0, mode, 0)
    acc = aot_acc(plan, nest, count + inter_count)
    dc = _i32(plan["dc"])[:, :, None, None]
    wpx = weight_blocks(plan["dc"])
    apx = dc + _sra(acc, 4)
    rpx = _i32(plan["raw"]).reshape(bh, bw, 4, 4)
    m = mode[:, :, None, None]
    intra = jnp.where(m == 0, wpx, jnp.where(m == 6, rpx, apx))
    return intra, acc


def _blocks_to_plane(px):
    bh, bw = px.shape[:2]
    return jnp.clip(px, 0, 255).astype(jnp.uint8).transpose(0, 2, 1, 3).reshape(bh * 4, bw * 4)


# ---------------------------------------------------------------------------
# Motion compensation (FORMAT.md §7.4) — the device-side `_MotionComp{00,01,10,11}`
# ---------------------------------------------------------------------------

def mc_predict(ref, mv):
    """Half-pel MC for every block → (bh,bw,4,4) i32; clamped addressing."""
    ph, pw = ref.shape
    bh, bw = mv.shape[:2]
    r = _i32(ref).reshape(-1)
    j = jnp.arange(4, dtype=jnp.int32)
    gx = (jnp.arange(bw, dtype=jnp.int32) * 4)[None, :, None, None] + j[None, None, None, :]
    gy = (jnp.arange(bh, dtype=jnp.int32) * 4)[:, None, None, None] + j[None, None, :, None]
    sx = 2 * gx + _i32(mv[:, :, 0])[:, :, None, None]
    sy = 2 * gy + _i32(mv[:, :, 1])[:, :, None, None]
    ix, hx = _sra(sx, 1), sx & 1
    iy, hy = _sra(sy, 1), sy & 1

    def at(y, x):
        yy = jnp.clip(y, 0, ph - 1)
        xx = jnp.clip(x, 0, pw - 1)
        return jnp.take(r, yy * pw + xx)

    a = at(iy, ix)
    b = at(iy, ix + 1)
    c = at(iy + 1, ix)
    d = at(iy + 1, ix + 1)
    return jnp.where(
        (hx == 0) & (hy == 0), a,
        jnp.where((hx == 1) & (hy == 0), _sra(a + b + 1, 1),
                  jnp.where((hx == 0) & (hy == 1), _sra(a + c + 1, 1),
                            _sra(a + b + c + d + 2, 2))))


# ---------------------------------------------------------------------------
# Plane entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=())
def decode_plane_intra(plan, nest):
    """I-frame plane: all blocks intra."""
    intra, _ = _intra_pixels(plan, nest)
    return _blocks_to_plane(intra)


@functools.partial(jax.jit, donate_argnums=())
def decode_plane_inter(plan, nest, ref0, ref1):
    """P/B plane: masked mix of intra blocks and MC(+residual) blocks.

    ref0 = past (ref_prev for B; ref_last for P), ref1 = ref_last. The
    bidirectional blend is (fwd + bwd + 1) >> 1 before the residual
    (FORMAT.md §7.5).
    """
    if _PALLAS_MODE != "off":
        from ..kernels.inter import decode_plane_inter_pallas

        return decode_plane_inter_pallas(
            plan, nest, ref0, ref1, interpret=_PALLAS_MODE == "interpret")
    intra, acc = _intra_pixels(plan, nest)
    cls_, refsel, _mode = unpack_meta(plan["meta"])
    pf = mc_predict(ref0, plan["mv"])
    pl_ = mc_predict(ref1, plan["mv"])
    pb = mc_predict(ref1, plan["mv2"])
    sel = refsel[:, :, None, None]
    pred = jnp.where(sel == 0, pf,
                     jnp.where(sel == 1, pl_, _sra(pf + pb + 1, 1)))
    inter = pred + _sra(acc, 4)
    px = jnp.where((cls_ == 0)[:, :, None, None], intra, inter)
    return _blocks_to_plane(px)


def build_nest_device(dc_grid_y, nest_x, nest_y, nest_shape):
    """Device-side nest rebuild from the luma DC grid (FORMAT.md §6.1).

    Used when the DC grid is already on device (multi-stream path); the
    single-stream session uses the host-built nest from the plan.
    """
    nh, nw = nest_shape
    bh, bw = dc_grid_y.shape
    ys = (nest_y + jnp.arange(nh)) % bh
    xs = (nest_x + jnp.arange(nw)) % bw
    return dc_grid_y[ys][:, xs].astype(jnp.uint8)
