"""ctypes binding to the native (C++) BVH builder in csrc/bvh_builder.cpp.

The reference keeps its builder host-side in numpy+numba (bvh.py); here the
hot SAH sweep runs in C++ (the host in this deployment has a single CPU
core, so the numpy per-node argsort loop is the scene-build bottleneck on
large meshes).  Falls back cleanly when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
_LIB_CANDIDATES = (
    os.path.join(_CSRC, "libclive2.so"),
    os.path.join(os.path.dirname(__file__), "libclive2.so"),
)


def _host_fingerprint() -> str:
    """CPU feature hash: the .so is built -march=native, and this
    deployment migrates between machine types mid-round (stale
    AVX512-tuned XLA caches already SIGILLed once — see ROADMAP round-3
    environment note), so a library built on the previous host is a
    latent SIGILL, not a cache hit."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:16]
    except OSError:
        pass
    return "unknown"


def _maybe_rebuild():
    """Rebuild csrc/libclive2.so when it was built on a different CPU
    (or the source is newer), recording the build host in a stamp file.
    Failures are silent — callers fall back to the numpy builder."""
    if os.environ.get("CLIVE2_NATIVE_REBUILD", "1") == "0":
        return
    so = os.path.join(_CSRC, "libclive2.so")
    src = os.path.join(_CSRC, "bvh_builder.cpp")
    stamp = os.path.join(_CSRC, ".build_host")
    if not os.path.exists(src):
        return
    want = _host_fingerprint()
    try:
        with open(stamp) as f:
            have = f.read().strip()
    except OSError:
        have = ""
    fresh = (os.path.exists(so)
             and os.path.getmtime(so) >= os.path.getmtime(src))
    if fresh and have == want:
        return
    try:
        subprocess.run(["make", "-C", _CSRC, "-B"], timeout=120,
                       capture_output=True, check=True)
        with open(stamp, "w") as f:
            f.write(want)
    except (OSError, subprocess.SubprocessError):
        pass


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    _maybe_rebuild()
    for path in _LIB_CANDIDATES:
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.clive2_build_bvh.restype = ctypes.c_int64
            lib.clive2_build_bvh.argtypes = [
                ctypes.c_int64,                  # n_tris
                np.ctypeslib.ndpointer(np.float32),  # mins [T,3]
                np.ctypeslib.ndpointer(np.float32),  # maxes [T,3]
                ctypes.c_int64,                  # max_members
                # outputs (preallocated worst-case 2T-1 nodes)
                np.ctypeslib.ndpointer(np.float32),  # node_mins
                np.ctypeslib.ndpointer(np.float32),  # node_maxes
                np.ctypeslib.ndpointer(np.int32),    # miss
                np.ctypeslib.ndpointer(np.int32),    # right_child
                np.ctypeslib.ndpointer(np.int32),    # tri_start
                np.ctypeslib.ndpointer(np.int32),    # tri_count
                np.ctypeslib.ndpointer(np.int32),    # leaf_id
                np.ctypeslib.ndpointer(np.int32),    # permutation [T]
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh_native(soup, max_members: int):
    from .build import FlatBVH

    lib = _load()
    assert lib is not None
    n = len(soup)
    mins = np.ascontiguousarray(soup.mins, dtype=np.float32)
    maxes = np.ascontiguousarray(soup.maxes, dtype=np.float32)
    cap = max(2 * n, 8)
    node_mins = np.zeros((cap, 3), np.float32)
    node_maxes = np.zeros((cap, 3), np.float32)
    miss = np.zeros(cap, np.int32)
    right_child = np.zeros(cap, np.int32)
    tri_start = np.zeros(cap, np.int32)
    tri_count = np.zeros(cap, np.int32)
    leaf_id = np.zeros(cap, np.int32)
    permutation = np.zeros(max(n, 1), np.int32)

    n_nodes = lib.clive2_build_bvh(
        n, mins, maxes, max_members,
        node_mins, node_maxes, miss, right_child,
        tri_start, tri_count, leaf_id, permutation,
    )
    if n_nodes <= 0:
        raise RuntimeError("native BVH build failed")
    n_nodes = int(n_nodes)
    # native writes miss == n_nodes for terminate already
    return FlatBVH(
        node_mins=node_mins[:n_nodes].copy(),
        node_maxes=node_maxes[:n_nodes].copy(),
        miss=miss[:n_nodes].copy(),
        right_child=right_child[:n_nodes].copy(),
        tri_start=tri_start[:n_nodes].copy(),
        tri_count=tri_count[:n_nodes].copy(),
        leaf_id=leaf_id[:n_nodes].copy(),
        permutation=permutation.copy(),
        n_leaves=int((leaf_id[:n_nodes] >= 0).sum()),
        max_leaf_size=max_members,
    )
