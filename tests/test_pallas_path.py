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


def test_pallas_interpret_decode_matches_oracle(oracle_bin, tmp_path):
    cfg = SeqConfig(32, 16)
    clip = make_clip(cfg, ["IPB"], seed=77)  # all frame types through all kernels
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
        [sys.executable, "-c", _SCRIPT, str(clip_path), str(out_path)],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    oracle_yuv = run_oracle(oracle_bin, clip, tmp_path)
    assert out_path.read_bytes() == oracle_yuv
