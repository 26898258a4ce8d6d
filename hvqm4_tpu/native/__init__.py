"""Native host planner: ctypes bindings over `_entropy.cc` (SURVEY.md §7).

Python's readable planner is the reference; this module is the production
path (~100-300× faster on the serial entropy loop). The shared library is
built on demand with g++ (no pybind11 in the image — plain `extern "C"` +
ctypes per the environment constraints) and cached next to the source.

`NativePlanner` is a drop-in replacement for `planner.Planner` (same
`plan_frame` → `FramePlan` contract, differential-tested in
tests/test_native.py); errors raise `PlannerError` carrying the C++ message.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from ..config import SeqConfig
from ..planner import PlannerError
from ..plans import FramePlan, PlanePlan

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "_entropy.cc"
_LIB = _DIR / "_entropy.so"

_FTYPE_CODE = {"I": 0, "P": 1, "B": 2}


class _PlaneOut(ctypes.Structure):
    _fields_ = [(n, ctypes.c_void_p) for n in (
        "cls", "mode", "dc", "raw", "bnx", "bny", "bsx", "bsy",
        "boff", "bscale", "mv", "mv2", "refsel")]


class _FrameOut(ctypes.Structure):
    _fields_ = [("display_id", ctypes.c_uint32),
                ("dc_shift", ctypes.c_uint32),
                ("nest_x", ctypes.c_uint32),
                ("nest_y", ctypes.c_uint32),
                ("nest", ctypes.c_void_p)]


def _build() -> pathlib.Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    subprocess.run(
        ["g++", "-std=c++17", "-O3", "-fPIC", "-shared", "-Wall", "-Wextra",
         "-o", str(_LIB), str(_SRC)],
        check=True, capture_output=True, text=True)
    return _LIB


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        lib.hvqm4_plan_frame.restype = ctypes.c_int
        lib.hvqm4_plan_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_PlaneOut), ctypes.POINTER(_FrameOut),
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        _lib = lib
    return _lib


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


# order must match _PlaneOut fields / plane_plan_arrays keys
_PLANE_KEYS = ("cls", "mode", "dc", "raw", "bnx", "bny", "bsx", "bsy",
               "boff", "bscale", "mv", "mv2", "refsel")


class NativePlanner:
    """Drop-in `Planner` backed by the C++ entropy loop.

    Two call styles:
    - `plan_frame(ftype, payload)` → fresh `FramePlan` (Planner-compatible)
    - `plan_frame_into(ftype, payload, plane_views, nest_view)` → zero-copy:
      writes straight into caller buffers (e.g. one stream's slice of the
      multi-stream batch tensors), returning only frame metadata. The C++
      side writes every field the device core reads unmasked, so buffers may
      be reused across frames without clearing.
    """

    def __init__(self, cfg: SeqConfig):
        self.cfg = cfg
        self._lib = _load()

    def _call(self, ftype: str, payload: bytes, plane_dicts, nest: np.ndarray):
        cfg = self.cfg
        if ftype not in _FTYPE_CODE:
            raise PlannerError(f"bad frame type {ftype!r}")
        pouts = (_PlaneOut * 3)()
        for i, d in enumerate(plane_dicts):
            pouts[i] = _PlaneOut(**{k: _ptr(d[k]) for k in _PLANE_KEYS})
        fout = _FrameOut(nest=_ptr(nest))
        err = ctypes.create_string_buffer(256)
        rc = self._lib.hvqm4_plan_frame(
            payload, len(payload), _FTYPE_CODE[ftype],
            cfg.width, cfg.height, cfg.h_samp, cfg.v_samp,
            pouts, ctypes.byref(fout), err, len(err))
        if rc != 0:
            raise PlannerError(err.value.decode(errors="replace"))
        return fout

    def plan_frame(self, ftype: str, payload: bytes) -> FramePlan:
        cfg = self.cfg
        planes = [PlanePlan.zeros(bh, bw) for bh, bw in cfg.block_grids]
        dicts = [{
            "cls": p.cls, "mode": p.mode, "dc": p.dc, "raw": p.raw,
            "bnx": p.basis_nx, "bny": p.basis_ny, "bsx": p.basis_sx,
            "bsy": p.basis_sy, "boff": p.basis_off, "bscale": p.basis_scale,
            "mv": p.mv, "mv2": p.mv2, "refsel": p.refsel,
        } for p in planes]
        nh, nw = cfg.nest_shape
        nest = np.zeros((nh, nw), np.uint8)
        fout = self._call(ftype, payload, dicts, nest)
        return FramePlan(
            ftype=ftype, display_id=int(fout.display_id),
            dc_shift=int(fout.dc_shift), nest_x=int(fout.nest_x),
            nest_y=int(fout.nest_y), planes=planes,
            nest=nest if ftype == "I" else None)

    def plan_frame_into(self, ftype: str, payload: bytes,
                        plane_views: list[dict], nest_view: np.ndarray) -> dict:
        for d in plane_views:
            for k in _PLANE_KEYS:
                assert d[k].flags.c_contiguous, f"{k} view must be contiguous"
        fout = self._call(ftype, payload, plane_views, nest_view)
        return {"display_id": int(fout.display_id),
                "dc_shift": int(fout.dc_shift)}
