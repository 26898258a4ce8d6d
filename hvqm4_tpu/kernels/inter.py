"""Pallas inter-path combine kernel (reference L7 tail, SURVEY.md §2.3).

The MC *gathers* stay in XLA (per-pixel reads from HBM-resident reference
planes — XLA's gather is the right tool); everything after them fuses here:
half-pel phase selection for the three candidate predictions, the reference
select (past / future / bidirectional blend), the residual add, the
intra/inter merge and the final clip — one VMEM-resident pass, lane-major
like `kernels.intra`.

Inputs per 4x4 block, flattened blocks on lanes (pixel index on sublanes):
    corners  (3*4*16, N)  a,b,c,d corner samples for fwd/last/bwd predictions
    intra    (16, N)      clipped intra pixels (from kernels.intra)
    acc      (16, N)      AOT residual accumulator
    meta     (6, N)       cls, refsel, hx, hy, hx2, hy2 — the half-pel
                          phases of mv (rows 2-3) and of mv2 for the
                          backward prediction (rows 4-5); per block = mv & 1

Bit-exact vs `ops.device_core.decode_plane_inter`'s XLA tail
(tests/test_kernels.py); routed by HVQM4_PALLAS like the intra kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.device_core import _i32, _sra
from .intra import TILE_N, _lane_pad_to, _pad_lanes


def _phase_combine(cref, base, hx, hy):
    a = cref[base:base + 16, :]
    b = cref[base + 16:base + 32, :]
    c = cref[base + 32:base + 48, :]
    d = cref[base + 48:base + 64, :]
    return jnp.where(
        (hx == 0) & (hy == 0), a,
        jnp.where((hx == 1) & (hy == 0), _sra(a + b + 1, 1),
                  jnp.where((hx == 0) & (hy == 1), _sra(a + c + 1, 1),
                            _sra(a + b + c + d + 2, 2))))


def _kernel(corners_ref, intra_ref, acc_ref, meta_ref, out_ref):
    cls_ = meta_ref[0:1, :]
    sel = meta_ref[1:2, :]
    hx = meta_ref[2:3, :]
    hy = meta_ref[3:4, :]
    pf = _phase_combine(corners_ref, 0, hx, hy)
    plast = _phase_combine(corners_ref, 64, hx, hy)
    # the backward prediction uses mv2's phases (meta rows 4-5)
    pbwd = _phase_combine(corners_ref, 128, meta_ref[4:5, :], meta_ref[5:6, :])
    pred = jnp.where(sel == 0, pf,
                     jnp.where(sel == 1, plast, _sra(pf + pbwd + 1, 1)))
    inter = pred + _sra(acc_ref[:], 4)
    px = jnp.where(cls_ == 0, intra_ref[:], jnp.clip(inter, 0, 255))
    out_ref[:] = px


def _mv_blocks(mv, bh, bw):
    """(2, gh, gw) vector grid (per-block or per-MB, values plane-resolved)
    → per-block (2, bh, bw)."""
    _, gh, gw = mv.shape
    if (gh, gw) != (bh, bw):
        mv = jnp.repeat(jnp.repeat(mv, bh // gh, axis=1), bw // gw, axis=2)
    return mv


def _corner_gathers(ref, mv):
    """XLA prologue: the 4 corner gathers of FORMAT.md §7.4 → (4*16, n) i32.

    `mv` is per-block component-major (2, bh, bw)."""
    ph, pw = ref.shape
    bh, bw = mv.shape[1:]
    r = _i32(ref).reshape(-1)
    j = jnp.arange(4, dtype=jnp.int32)
    gx = (jnp.arange(bw, dtype=jnp.int32) * 4)[None, :, None, None] + j[None, None, None, :]
    gy = (jnp.arange(bh, dtype=jnp.int32) * 4)[:, None, None, None] + j[None, None, :, None]
    sx = 2 * gx + _i32(mv[0])[:, :, None, None]
    sy = 2 * gy + _i32(mv[1])[:, :, None, None]
    ix, iy = _sra(sx, 1), _sra(sy, 1)

    def at(y, x):
        yy = jnp.clip(y, 0, ph - 1)
        xx = jnp.clip(x, 0, pw - 1)
        return jnp.take(r, yy * pw + xx)

    n = bh * bw
    corners = [at(iy, ix), at(iy, ix + 1), at(iy + 1, ix), at(iy + 1, ix + 1)]
    return jnp.concatenate([c.reshape(n, 16).T for c in corners], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_plane_inter_pallas(plan, nest, ref0, ref1, interpret: bool = False):
    """Full P/B plane with Pallas intra + Pallas inter-combine."""
    from ..ops.device_core import _blocks_to_plane, unpack_meta
    from .intra import intra_synth_pallas

    # lane-major: the intra kernel's (16, n_pad) outputs feed this kernel
    # directly (no block-layout round-trip per plane)
    intra_t, acc_t = intra_synth_pallas(plan, nest, interpret=interpret,
                                        lane_major=True)
    cls_, refsel, _mode = unpack_meta(plan["meta"])
    bh, bw = plan["meta"].shape
    n = bh * bw
    n_pad = _lane_pad_to(n)

    mv = _mv_blocks(plan["mv"], bh, bw)
    mv2 = _mv_blocks(plan["mv2"], bh, bw)
    corners = jnp.concatenate([
        _corner_gathers(ref0, mv),
        _corner_gathers(ref1, mv),
        _corner_gathers(ref1, mv2),
    ], axis=0)                                            # (192, n)
    meta = jnp.stack([
        cls_.reshape(-1), refsel.reshape(-1),
        _i32(mv[0]).reshape(-1) & 1,
        _i32(mv[1]).reshape(-1) & 1,
        _i32(mv2[0]).reshape(-1) & 1,
        _i32(mv2[1]).reshape(-1) & 1,
    ])                                                    # (6, n)
    args = [_pad_lanes(a, n_pad) for a in (corners, intra_t, acc_t, meta)]
    tile = min(TILE_N, n_pad)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda j: (0, j),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((16, n_pad), jnp.int32),
        grid=(n_pad // tile,),
        in_specs=[spec(192), spec(16), spec(16), spec(6)],
        out_specs=spec(16),
        interpret=interpret,
    )(*args)
    return _blocks_to_plane(out[:, :n].T.reshape(bh, bw, 4, 4))
