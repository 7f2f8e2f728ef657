"""Lazy builder for the native ingest library.

Compiles src/ingest.cc to _ingest.so next to this file with the system g++
(no pybind11/Python.h — the binding is ctypes on extern "C" symbols, see
native/ingest.py). Rebuilds only when the source is newer than the binary;
any failure is cached for the process and the callers fall back to their
numpy implementations, so the package works on toolchain-less hosts.
"""
from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "src", "ingest.cc")
LIB = os.path.join(_DIR, "_ingest.so")

_failed: str | None = None


def build(force: bool = False) -> str | None:
    """Returns the path to the built library, or None when unbuildable."""
    global _failed
    if _failed is not None and not force:
        return None
    if not os.path.exists(SRC):
        # shipped without sources: use a prebuilt .so if present
        return LIB if os.path.exists(LIB) else None
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    # build to a per-pid temp path + atomic rename so concurrent first-time
    # builders never load a half-written library
    tmp = f"{LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-march=native", "-shared", "-fPIC",
           "-pthread", SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            # -march=native can be unsupported in emulated/cross environments
            cmd.remove("-march=native")
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
        if proc.returncode != 0:
            _failed = proc.stderr[-500:]
            return None
        os.replace(tmp, LIB)
    except (OSError, subprocess.TimeoutExpired) as ex:
        _failed = str(ex)
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return LIB


if __name__ == "__main__":
    path = build(force=True)
    print(path or f"BUILD FAILED: {_failed}")
