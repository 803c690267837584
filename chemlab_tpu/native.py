"""ctypes bindings for the native host library (native/libchemlab_host.so).

Accelerates the host-side data pipeline (large .gro parsing, exclusion BFS).
Every entry point has a pure-Python fallback, so the framework works without
the native build; ``available()`` reports which path is active.

Build with ``make -C native`` (plain g++, no external dependencies).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libchemlab_host.so")
    if not os.path.exists(path):
        # lazy one-shot build (plain g++, no deps); stays silent on failure
        import subprocess

        src_dir = os.path.join(here, "native")
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            try:
                subprocess.run(["make", "-C", src_dir], capture_output=True,
                               timeout=120, check=False)
            except Exception:
                pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    c64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.parse_gro.restype = ctypes.c_int
    lib.parse_gro.argtypes = [ctypes.c_char_p, ctypes.c_int64, c64p, f64p,
                              f64p, i32p, c64p, c64p, ctypes.c_char_p,
                              ctypes.c_char_p, f64p]
    lib.generate_exclusions.restype = ctypes.c_void_p
    lib.generate_exclusions.argtypes = [c64p, ctypes.c_int64, ctypes.c_int32,
                                        c64p]
    lib.fetch_exclusions.restype = None
    lib.fetch_exclusions.argtypes = [ctypes.c_void_p, c64p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_gro(text: bytes):
    """Parse .gro file bytes -> dict of arrays, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    # upper bound on atom count from the count line; malformed/truncated
    # input returns None so callers fall back to the Python parser's errors
    try:
        nl1 = text.index(b"\n")
        nl2 = text.index(b"\n", nl1 + 1)
        cap = int(text[nl1:nl2].split()[0])
    except (ValueError, IndexError):
        return None
    n = ctypes.c_int64(cap)
    pos = np.zeros((cap, 3), np.float64)
    vel = np.zeros((cap, 3), np.float64)
    has_vel = ctypes.c_int32(0)
    atom_ids = np.zeros(cap, np.int64)
    res_idx = np.zeros(cap, np.int64)
    res_names = ctypes.create_string_buffer(cap * 8)
    atom_names = ctypes.create_string_buffer(cap * 8)
    box = np.zeros(3, np.float64)
    rc = lib.parse_gro(
        text, len(text), ctypes.byref(n),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(has_vel),
        atom_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        res_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        res_names, atom_names,
        box.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    nn = n.value
    rn = np.frombuffer(res_names.raw, dtype="S8", count=nn).astype("U8").tolist()
    an = np.frombuffer(atom_names.raw, dtype="S8", count=nn).astype("U8").tolist()
    return {
        "n_atoms": nn,
        "pos": pos[:nn],
        "vel": vel[:nn] if has_vel.value else None,
        "atom_ids": atom_ids[:nn],
        "res_idx": res_idx[:nn],
        "res_names": rn,
        "atom_names": an,
        "box": box,
    }


def generate_exclusions(bonds, nrexcl: int):
    """Exclusion pairs within nrexcl hops; returns a set of (lo, hi) tuples
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.asarray(list(bonds), np.int64).reshape(-1, 2)
    n_out = ctypes.c_int64(0)
    handle = lib.generate_exclusions(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        arr.shape[0], nrexcl, ctypes.byref(n_out))
    out = np.zeros((n_out.value, 2), np.int64)
    lib.fetch_exclusions(handle,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return set(map(tuple, out.tolist()))
