"""Pallas YUV→RGB kernel (the device-side frame dump tail, SURVEY.md §2.3).

Pure elementwise fixed-point BT.601 (ops/csc.py defines the normative
integer formula); fused into one VMEM pass over row tiles. Chroma is
upsampled by the XLA prologue (repeat — a layout change, not math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.device_core import _sra

TILE_H = 64


def _kernel(y_ref, u_ref, v_ref, r_ref, g_ref, b_ref):
    yi = y_ref[:].astype(jnp.int32)
    ui = u_ref[:].astype(jnp.int32) - 128
    vi = v_ref[:].astype(jnp.int32) - 128
    r = yi + _sra(91881 * vi + 32768, 16)
    g = yi - _sra(22554 * ui + 46802 * vi + 32768, 16)
    b = yi + _sra(116130 * ui + 32768, 16)
    r_ref[:] = jnp.clip(r, 0, 255).astype(jnp.uint8)
    g_ref[:] = jnp.clip(g, 0, 255).astype(jnp.uint8)
    b_ref[:] = jnp.clip(b, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def yuv_to_rgb_pallas(y, u, v, interpret: bool = False):
    """Full-resolution planes → (H, W, 3) u8 (bit-identical to ops.csc)."""
    h, w = y.shape
    h_pad = -(-h // TILE_H) * TILE_H

    def padp(x):
        return jnp.pad(x, ((0, h_pad - h), (0, 0)))

    tile = min(TILE_H, h_pad)

    def spec():
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    r, g, b = pl.pallas_call(
        _kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((h_pad, w), jnp.uint8)
                        for _ in range(3)),
        grid=(h_pad // tile,),
        in_specs=[spec(), spec(), spec()],
        out_specs=(spec(), spec(), spec()),
        interpret=interpret,
    )(padp(y), padp(u), padp(v))
    return jnp.stack([r[:h], g[:h], b[:h]], axis=-1)
