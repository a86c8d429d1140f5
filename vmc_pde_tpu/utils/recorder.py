"""Python bindings for the native asynchronous metrics recorder
(vmc_pde_tpu/native/recorder.cpp, built on demand with g++ and loaded via
ctypes).

Gives the driver a non-blocking diagnostics sink: each record is copied
into a bounded native queue and written to a compact binary log by a C++
background thread -- the step loop never waits on file IO. The binary log
converts losslessly to the reference-compatible infos dict / HDF5
(``read_log`` / ``log_to_infos``).

Falls back transparently (AsyncRecorder.available == False) when no C++
toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "recorder.cpp")


def _lib_dir(src_dir: str) -> str:
    """Directory to build librecorder.so into: next to the source when the
    install is writable (dev tree), else a per-user cache dir (wheel
    installs into read-only site-packages)."""
    if os.access(src_dir, os.W_OK):
        return src_dir
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "vmc_pde_tpu")
    os.makedirs(cache, exist_ok=True)
    return cache


def _build_lib() -> str:
    src = os.path.abspath(_SRC)
    lib = os.path.join(_lib_dir(os.path.dirname(src)), "librecorder.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", lib, src,
         "-lpthread"],
        check=True, capture_output=True,
    )
    return lib


_dll = None


def _load():
    global _dll
    if _dll is None:
        lib = _build_lib()
        dll = ctypes.CDLL(lib)
        dll.rec_open.restype = ctypes.c_void_p
        dll.rec_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        dll.rec_register.restype = ctypes.c_int
        dll.rec_register.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        dll.rec_write.restype = ctypes.c_int
        dll.rec_write.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_uint64,
        ]
        dll.rec_close.restype = None
        dll.rec_close.argtypes = [ctypes.c_void_p]
        _dll = dll
    return _dll


class AsyncRecorder:
    """Non-blocking per-step metrics sink backed by the native writer."""

    def __init__(self, path: str, ring_bytes: int = 64 << 20):
        self.path = path
        self.available = True
        try:
            self._dll = _load()
        except Exception:
            self.available = False
            self._handle = None
            return
        self._handle = self._dll.rec_open(path.encode(), ring_bytes)
        if not self._handle:
            raise OSError(f"cannot open recorder log {path!r}")
        self._tags = {}

    def _tag(self, name: str) -> int:
        t = self._tags.get(name)
        if t is None:
            t = self._dll.rec_register(self._handle, name.encode())
            self._tags[name] = t
        return t

    def record(self, name: str, step: int, value) -> None:
        if not self._handle:
            return
        arr = np.ascontiguousarray(np.asarray(value), dtype=np.float64)
        ptr = arr.ravel().ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        self._dll.rec_write(self._handle, self._tag(name), step, ptr,
                            arr.size)

    def record_dict(self, step: int, d: dict) -> None:
        for k, v in d.items():
            if k.startswith("_"):
                continue
            self.record(k, step, v)

    def close(self) -> None:
        if self._handle:
            self._dll.rec_close(self._handle)
            self._handle = None

    def __del__(self):
        # abnormal exits (e.g. a NaN abort raising out of the driver loop)
        # still flush the native queue and join the writer thread
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_log(path: str):
    """Parse a binary recorder log -> list of (name, step, time, array)."""
    out = []
    tags = {}
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"VPDR1\x00":
            raise ValueError(f"{path!r} is not a recorder log")
        f.read(2)  # version
        while True:
            kind = f.read(1)
            if not kind:
                break
            if kind[0] == 0:
                tag, nlen = struct.unpack("<II", f.read(8))
                tags[tag] = f.read(nlen).decode()
            elif kind[0] == 1:
                tag, step, t, n = struct.unpack("<IQdQ", f.read(28))
                data = np.frombuffer(f.read(8 * n), dtype="<f8")
                out.append((tags[tag], step, t, data))
            else:
                raise ValueError(f"corrupt record kind {kind[0]}")
    return out


def log_to_infos(path: str):
    """Binary log -> reference-style infos dict (one array list per tag)."""
    infos = {}
    for name, step, t, data in read_log(path):
        infos.setdefault(name, []).append(
            data if data.size != 1 else data[0])
    return infos
