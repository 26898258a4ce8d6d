"""Pallas kernels vs the XLA device core (interpreter mode on CPU).

The same kernels compile natively on TPU; bit-exactness there is covered by
bench.py's hash verification (kernels share the integer ops under test here).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hvqm4_tpu.ops import device_core as dc


def _plan(rng, bh, bw):
    from __graft_entry__ import _random_plane_plan

    plan_np = _random_plane_plan(rng, bh, bw, 1)
    plan = {k: jnp.asarray(v[0]) for k, v in plan_np.items()}
    m = np.asarray(plan_np["meta"][0]).copy()
    m[::7] = (m[::7] & 0xD8) | 6  # sprinkle intra raw blocks (cls=0, mode=6)
    plan["meta"] = jnp.asarray(m)
    return plan


def _to_plane(blocks):
    """(bh, bw, 4, 4) block-granular values → (H, W) plane layout."""
    bh, bw = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(bh * 4, bw * 4)


def _check_intra(plan, nest):
    """Pallas intra kernel vs the plane-layout XLA reference."""
    from hvqm4_tpu.kernels.intra import intra_synth_pallas

    ref_px, ref_acc, _meta = dc._intra_pixels_plane(plan, nest)
    got_px, got_acc = intra_synth_pallas(plan, nest, interpret=True)
    assert jnp.array_equal(jnp.clip(ref_px, 0, 255), _to_plane(got_px))
    assert jnp.array_equal(ref_acc, _to_plane(got_acc))


@pytest.mark.parametrize("bh,bw", [(12, 16), (30, 40), (60, 80)])
def test_intra_synth_pallas_matches_xla(bh, bw):
    rng = np.random.default_rng(3)
    plan = _plan(rng, bh, bw)
    nest = jnp.asarray(rng.integers(0, 256, (38, 70), dtype=np.uint8))
    _check_intra(plan, nest)


def test_intra_synth_pallas_portrait_nest():
    rng = np.random.default_rng(4)
    plan = _plan(rng, 16, 12)
    nest = jnp.asarray(rng.integers(0, 256, (70, 38), dtype=np.uint8))
    _check_intra(plan, nest)


def test_inter_combine_pallas_matches_xla():
    from hvqm4_tpu.kernels.inter import decode_plane_inter_pallas

    rng = np.random.default_rng(9)
    plan = _plan(rng, 12, 16)
    nest = jnp.asarray(rng.integers(0, 256, (38, 70), dtype=np.uint8))
    ref0 = jnp.asarray(rng.integers(0, 256, (48, 64), dtype=np.uint8))
    ref1 = jnp.asarray(rng.integers(0, 256, (48, 64), dtype=np.uint8))
    want = dc.decode_plane_inter(plan, nest, ref0, ref1)
    got = decode_plane_inter_pallas(plan, nest, ref0, ref1, interpret=True)
    assert jnp.array_equal(want, got)
