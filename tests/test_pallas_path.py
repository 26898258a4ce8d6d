"""Full decode through the Pallas kernel path (HVQM4_PALLAS=interpret).

Runs in a subprocess because the kernel routing is fixed at import (it must
be stable across jit traces). Verifies clip-level bit-exactness vs the C
oracle with the Pallas intra kernel in the loop.
"""

import os
import subprocess
import sys

from hvqm4_tpu.config import SeqConfig
from tools.encoder import make_clip

from .conftest import REPO, run_oracle

_SCRIPT = r"""
import sys
from hvqm4_tpu.config import SeqConfig
from hvqm4_tpu.session import DecoderSession

clip_path, out_path = sys.argv[1], sys.argv[2]
data = open(clip_path, "rb").read()
from hvqm4_tpu.container import Demuxer
cfg = Demuxer(data).info.cfg
sess = DecoderSession(cfg, backend="jax")
with open(out_path, "wb") as f:
    for frame in sess.decode_clip(data):
        f.write(frame.yuv_bytes())
"""


_MULTI_SCRIPT = r"""
import sys
import numpy as np
from hvqm4_tpu.container import Demuxer
from hvqm4_tpu.parallel.multistream import MultiStreamDecoder

clip_path, out_path = sys.argv[1], sys.argv[2]
data = open(clip_path, "rb").read()
cfg = Demuxer(data).info.cfg
ms = MultiStreamDecoder(cfg, [data])
with open(out_path, "wb") as f:
    for frames, _metas, valid in ms.run_pipelined():
        if valid[0]:
            fnp = [np.asarray(p) for p in frames]
            f.write(b"".join(fnp[pi][0].tobytes() for pi in range(3)))
"""


def _run_pallas_subprocess(script, clip, tmp_path):
    clip_path = tmp_path / "c.h4m"
    out_path = tmp_path / "pallas.yuv"
    clip_path.write_bytes(clip)
    env = dict(os.environ)
    # PYTHONPATH deliberately excludes the axon site dir: its sitecustomize
    # would register the TPU plugin and stall minutes on tunnel handshakes;
    # this test is a pure-CPU interpret-mode run.
    env.update({"HVQM4_PALLAS": "interpret", "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": str(REPO)})
    res = subprocess.run(
        [sys.executable, "-c", script, str(clip_path), str(out_path)],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    return out_path.read_bytes()


def test_pallas_interpret_decode_matches_oracle(oracle_bin, tmp_path):
    cfg = SeqConfig(32, 16)
    clip = make_clip(cfg, ["IPB"], seed=77)  # all frame types through all kernels
    got = _run_pallas_subprocess(_SCRIPT, clip, tmp_path)
    assert got == run_oracle(oracle_bin, clip, tmp_path)


def test_pallas_interpret_multistream_per_mb_mv(oracle_bin, tmp_path):
    """The production arena path through the Pallas kernels: per-MACROBLOCK
    motion-vector grids exercise `kernels.inter._mv_blocks`' repeat
    upsampling, which the session (per-block grid) path never does."""
    cfg = SeqConfig(32, 16)
    clip = make_clip(cfg, ["IPB"], seed=78)
    got = _run_pallas_subprocess(_MULTI_SCRIPT, clip, tmp_path)
    assert got == run_oracle(oracle_bin, clip, tmp_path)


def test_pallas_interpret_multitile_plane(oracle_bin, tmp_path):
    """A luma plane with > TILE_N (2048) blocks runs the kernels' 1-D grid
    over more than one tile (256x192 -> 3072 luma blocks)."""
    cfg = SeqConfig(256, 192)
    clip = make_clip(cfg, ["IP"], seed=79)
    got = _run_pallas_subprocess(_SCRIPT, clip, tmp_path)
    assert got == run_oracle(oracle_bin, clip, tmp_path)
