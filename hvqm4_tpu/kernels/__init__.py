"""Pallas TPU kernels for the pixel-reconstruction hot path (SURVEY.md §7 M4).

The XLA path in `ops.device_core` is the always-available reference; these
kernels fuse its hot pieces into single VMEM-resident passes. Selection is
runtime-checked: `intra_synth` falls back to XLA automatically off-TPU (the
CPU test mesh runs kernels in interpreter mode instead).
"""

from .csc import yuv_to_rgb_pallas  # noqa: F401
from .inter import decode_plane_inter_pallas  # noqa: F401
from .intra import intra_synth_pallas  # noqa: F401
