"""Shared native-library build/load helper for the C components
(csrc/ldpc_oracle.c, csrc/as_enum.c).

One place for the compile policy (OpenMP with serial fallback) and the
robust load path: build when missing/outdated by mtime, and rebuild from
source once when ctypes.CDLL raises OSError (a stale or foreign-ABI
binary on a fresh checkout — mtime cannot catch that)."""
from __future__ import annotations

import ctypes
import os
import subprocess


def _compile(src: str, so: str) -> None:
    cc = os.environ.get("CC", "cc")
    try:
        subprocess.run([cc, "-O3", "-shared", "-fPIC", "-fopenmp", src,
                        "-o", so], check=True, capture_output=True,
                       text=True)
    except subprocess.CalledProcessError:
        # no OpenMP toolchain: the pragmas degrade to serial
        subprocess.run([cc, "-O3", "-shared", "-fPIC", src, "-o", so],
                       check=True, capture_output=True, text=True)


def load_native(src: str, so: str) -> ctypes.CDLL:
    """Build (if needed) and load a shared library from one C source."""
    os.makedirs(os.path.dirname(so), exist_ok=True)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        _compile(src, so)
    try:
        return ctypes.CDLL(so)
    except OSError:
        os.remove(so)
        _compile(src, so)
        return ctypes.CDLL(so)
