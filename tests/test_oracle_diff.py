"""Differential tests: C oracle vs Python planner+golden (SURVEY.md §4.3).

The central conformance check of the repo: two independent implementations of
docs/FORMAT.md (C scalar decoder vs Python planner + vectorized NumPy core)
must agree byte-for-byte on synthetic corpus clips covering every decode path.
"""

import pytest

from hvqm4_tpu.config import SeqConfig
from tools.encoder import make_clip

from .conftest import golden_decode, run_oracle

CASES = [
    # (w, h, samp, version, gops, audio_ch, dc_shift, seed)
    (64, 48, 2, "1.3", ["IPBPB", "IPP"], 2, None, 1),
    (48, 64, 1, "1.5", ["IPBPB"], 0, None, 2),          # portrait nest, 4:4:4
    (320, 240, 2, "1.3", ["IBBPBP", "IPPP"], 1, None, 3),
    (64, 64, 2, "1.3", ["I"], 0, 0, 4),                 # I-only
    (128, 48, 2, "1.3", ["IPBPBPBPB"], 0, 2, 5),        # deep B chains
    (96, 96, 1, "1.3", ["IPB", "IB" + "P" * 6], 0, 7, 6),  # max dc_shift
]


@pytest.mark.parametrize("w,h,samp,ver,gops,ach,shift,seed", CASES)
def test_oracle_matches_golden(oracle_bin, tmp_path, w, h, samp, ver, gops,
                               ach, shift, seed):
    cfg = SeqConfig(w, h, samp, samp, ver)
    clip = make_clip(cfg, gops, seed=seed, audio_channels=ach, dc_shift=shift)
    oracle_yuv = run_oracle(oracle_bin, clip, tmp_path)
    frames = golden_decode(cfg, clip)
    got = b"".join(f.tobytes() for f in frames)
    assert len(oracle_yuv) == len(got)
    if oracle_yuv != got:
        fb = cfg.frame_bytes
        for i in range(len(frames)):
            a = oracle_yuv[i * fb:(i + 1) * fb]
            b = got[i * fb:(i + 1) * fb]
            assert a == b, f"first mismatching frame: {i}"
    assert oracle_yuv == got


def test_many_seeds(oracle_bin, tmp_path):
    """Seed sweep on a small clip shape — broad random path coverage."""
    cfg = SeqConfig(64, 48)
    for seed in range(20):
        clip = make_clip(cfg, ["IPBPB"], seed=100 + seed)
        oracle_yuv = run_oracle(oracle_bin, clip, tmp_path)
        got = b"".join(f.tobytes() for f in golden_decode(cfg, clip))
        assert oracle_yuv == got, f"seed {seed}"
