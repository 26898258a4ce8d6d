"""Fused intra-block synthesis as a Pallas TPU kernel (SURVEY.md §2.3 L6).

Fuses the per-block arithmetic of `WeightImBlock` + `IntraAotBlock` +
`OrgBlock` + mode select + clip into one VMEM-resident pass over the plane.

Layout: blocks are flattened to the *lane* dimension (pixel position 0..15 on
the sublane axis), so every op is a full-width VPU op:

    samples (64, N)  4 bases x 16 pixels of pre-gathered nest samples
    raw     (16, N)  raw-block bytes
    dcn     (5, N)   dc, dcU, dcD, dcL, dcR (neighbor grids precomputed by
                     cheap XLA shifts — keeps the kernel halo-free)
    meta    (3, N)   mode, basis count, (reserved)
    boff/bscale (4, N)

The data-dependent nest *gather* stays in XLA (`jnp.take` from the ≤2.7 KB
nest — gathers are the one thing XLA already schedules well here and Mosaic
does not support arbitrary 2D gathers); everything after it is fused. The
kernel tiles the lane dimension with a 1-D grid, so arbitrarily large planes
stream through VMEM.

Bit-exact vs `ops.device_core._intra_pixels_plane` (tests/test_kernels.py);
used on TPU backends, interpreter mode elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_BASES
from ..ops.device_core import _i32, _sra, basis_count

TILE_N = 2048


def _compute(samples_ref, raw_ref, dcn_ref, meta_ref, boff_ref, bscale_ref):
    """Shared body: (clipped intra pixels, unshifted AOT accumulator)."""
    mode = meta_ref[0:1, :]
    count = meta_ref[1:2, :]
    dc = dcn_ref[0:1, :]

    # AOT accumulator: sum over 4 bases, masked by basis count
    acc = jnp.zeros_like(raw_ref[:])
    for b in range(MAX_BASES):
        scale = jnp.where(count > b, bscale_ref[b:b + 1, :], 0)
        acc += (samples_ref[16 * b:16 * (b + 1), :] - boff_ref[b:b + 1, :]) * scale
    apx = dc + _sra(acc, 4)

    # WeightImBlock: per-pixel constant weights against neighbor DC deltas.
    # Weights W = [4,1,0,0] over row index i = p>>2 and col index j = p&3,
    # built with iota (Pallas kernels cannot capture array constants).
    p_idx = jax.lax.broadcasted_iota(jnp.int32, raw_ref.shape, 0)

    def w_of(idx):
        return jnp.where(idx == 0, 4, jnp.where(idx == 1, 1, 0))

    i_idx = _sra(p_idx, 2)
    j_idx = p_idx & 3
    wu = w_of(i_idx)
    wd = w_of(3 - i_idx)
    wl = w_of(j_idx)
    wr = w_of(3 - j_idx)
    wacc = (wu * (dcn_ref[1:2, :] - dc) + wd * (dcn_ref[2:3, :] - dc)
            + wl * (dcn_ref[3:4, :] - dc) + wr * (dcn_ref[4:5, :] - dc))
    wpx = dc + _sra(wacc + 8, 4)

    px = jnp.where(mode == 0, wpx, jnp.where(mode == 6, raw_ref[:], apx))
    return jnp.clip(px, 0, 255), acc


def _kernel(samples_ref, raw_ref, dcn_ref, meta_ref, boff_ref, bscale_ref,
            out_ref, acc_ref):
    px, acc = _compute(samples_ref, raw_ref, dcn_ref, meta_ref,
                       boff_ref, bscale_ref)
    out_ref[:] = px
    acc_ref[:] = acc  # inter blocks reuse the residual accumulator


def _kernel_noacc(samples_ref, raw_ref, dcn_ref, meta_ref, boff_ref,
                  bscale_ref, out_ref):
    px, _acc = _compute(samples_ref, raw_ref, dcn_ref, meta_ref,
                        boff_ref, bscale_ref)
    out_ref[:] = px  # I-frames don't need the accumulator: skip its store


def _pad_lanes(x, n_pad):
    n = x.shape[-1]
    if n == n_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)])


def _lane_pad_to(n: int) -> int:
    """Padded lane count: a multiple of TILE_N for multi-tile planes, else
    the next multiple of the 128-lane register width."""
    return -(-n // TILE_N) * TILE_N if n > TILE_N else -(-n // 128) * 128


@functools.partial(jax.jit,
                   static_argnames=("interpret", "want_acc", "lane_major"))
def intra_synth_pallas(plan, nest, interpret: bool = False,
                       want_acc: bool = True, lane_major: bool = False):
    """Intra pixels for a whole plane → (bh, bw, 4, 4) i32 (pre-merge),
    plus the unshifted AOT accumulator (or None with want_acc=False — the
    I-frame path, which saves the accumulator's HBM store).

    With lane_major=True both outputs stay in the kernels' native
    (16, n_pad) layout — the inter-combine kernel consumes them directly,
    skipping a block-layout round-trip per P/B plane.

    Drop-in replacement for the XLA `_intra_pixels_plane` intra half; the
    caller merges with inter blocks and packs to the plane.
    """
    from ..ops.device_core import unpack_desc, unpack_meta

    bh, bw = plan["meta"].shape
    n = bh * bw
    n_pad = _lane_pad_to(n)

    # --- XLA prologue: nest gather + neighbor grids + lane-major layout ---
    # (plan["desc"] is component-major (4, bh, bw) per the device-core
    # contract; this prologue works block-major)
    nh, nw = nest.shape
    bnx, bny, bsx, bsy, boff, bscale = unpack_desc(
        plan["desc"].transpose(1, 2, 0))
    cls_, _refsel, mode = unpack_meta(plan["meta"])
    i = jnp.arange(4, dtype=jnp.int32)
    ny = bny[:, :, :, None] + i[None, None, None, :] * bsy[:, :, :, None]
    nx = bnx[:, :, :, None] + i[None, None, None, :] * bsx[:, :, :, None]
    idx = (ny % nh)[:, :, :, :, None] * nw + (nx % nw)[:, :, :, None, :]
    samples = jnp.take(_i32(nest.reshape(-1)), idx)          # (bh,bw,B,4,4)
    samples_t = samples.reshape(n, MAX_BASES * 16).T          # (64, n)

    dc = _i32(plan["dc"])
    dcU = jnp.concatenate([dc[:1], dc[:-1]], axis=0)
    dcD = jnp.concatenate([dc[1:], dc[-1:]], axis=0)
    dcL = jnp.concatenate([dc[:, :1], dc[:, :-1]], axis=1)
    dcR = jnp.concatenate([dc[:, 1:], dc[:, -1:]], axis=1)
    dcn = jnp.stack([dc, dcU, dcD, dcL, dcR]).reshape(5, n)

    count = basis_count(cls_, mode)
    meta = jnp.stack([mode.reshape(-1), count.reshape(-1),
                      jnp.zeros((n,), jnp.int32)])
    # raw arrives in plane layout (H, W); regroup to (blocks, 16) lanes
    raw_t = (_i32(plan["raw"]).reshape(bh, 4, bw, 4)
             .transpose(0, 2, 1, 3).reshape(n, 16).T)
    boff_t = boff.reshape(n, MAX_BASES).T
    bscale_t = bscale.reshape(n, MAX_BASES).T

    args = [_pad_lanes(a, n_pad) for a in
            (samples_t, raw_t, dcn, meta, boff_t, bscale_t)]

    tile = min(TILE_N, n_pad)
    grid = (n_pad // tile,)

    def spec(rows):
        return pl.BlockSpec((rows, tile), lambda j: (0, j),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(64), spec(16), spec(5), spec(3), spec(4), spec(4)]

    def unlane(a):
        return a if lane_major else a[:, :n].T.reshape(bh, bw, 4, 4)

    if not want_acc:
        out = pl.pallas_call(
            _kernel_noacc,
            out_shape=jax.ShapeDtypeStruct((16, n_pad), jnp.int32),
            grid=grid, in_specs=in_specs, out_specs=spec(16),
            interpret=interpret,
        )(*args)
        return unlane(out), None
    out, acc = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((16, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((16, n_pad), jnp.int32)),
        grid=grid, in_specs=in_specs, out_specs=(spec(16), spec(16)),
        interpret=interpret,
    )(*args)

    return unlane(out), unlane(acc)

