"""AOT executable cache: skip the multi-minute Mosaic recompile for seen
configurations (ROADMAP engineering item; VERDICT r1 #9).

On this class of deployment a Pallas-bearing render program costs
40 s - 6 min to compile and the jax persistent compilation cache only
covers the XLA portion (measured: 121 s cold -> 77 s "warm").  Serializing
the COMPILED executable (`jax.experimental.serialize_executable`) skips
compilation entirely: measured load+first-call ~5 s for the same program
(57 MiB on disk).

The cache key fingerprints everything that shapes the executable: jax
version, backend platform + device kind, the full (shape, dtype) tree of
the example arguments (which encodes the scene pytree structure — e.g.
which traversal path the scene selected), a caller salt for function
identity, every CLIVE2_* environment knob (several change the traced
program's semantics — estimator selection, any-hit policy, sort policy,
packet geometry — without changing any argument shape) EXCEPT the
``_ORCHESTRATION`` exclusion list in ``_env_fingerprint`` (vars there
must never reach a traced program — they exist so the unattended
session's warm keys match the driver's), and a fingerprint of the
package sources (code edits must not keep serving old binaries).
Any miss or failure falls back to a normal compile, and serialization
failures are non-fatal (the compiled executable is used directly).
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle

import jax


_SCHEMA = "aot-v2"


@functools.lru_cache(maxsize=1)
def _source_fingerprint() -> str:
    """Hash of every .py source in the clive2_tpu package (mtime-free:
    content only, so reinstalls with identical code still hit)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            p = os.path.join(dirpath, name)
            h.update(os.path.relpath(p, pkg_root).encode())
            try:
                with open(p, "rb") as f:
                    h.update(f.read())
            except OSError:
                pass
    return h.hexdigest()[:16]


def _env_fingerprint() -> str:
    """All CLIVE2_* knobs, sorted, plus the tuned-defaults file content
    (a tuning flip changes compiled-kernel semantics — e.g. wide_gate —
    without changing any env var or argument shape).  Cheap and
    future-proof vs keeping a hand-maintained list in sync with the ops
    modules."""
    from .tuned import tuned_fingerprint

    # CLIVE2_SESSION_OWNER is pure orchestration (chip-ownership handshake
    # between tpu_session.sh and bench._takeover_chip) — it never reaches
    # the traced program.  Folding it would give the unattended session's
    # bench steps a different key than the driver's own bench run, so the
    # session's warmed executables would never be hit where they matter.
    _ORCHESTRATION = {"CLIVE2_SESSION_OWNER"}
    knobs = sorted(
        (k, v) for k, v in os.environ.items()
        if k.startswith("CLIVE2_") and k not in _ORCHESTRATION
    )
    return repr(knobs) + tuned_fingerprint()


def _signature(example_args) -> str:
    def leaf_sig(a):
        shape = tuple(getattr(a, "shape", ()))
        dtype = str(getattr(a, "dtype", type(a).__name__))
        return (shape, dtype)

    sig = jax.tree.map(leaf_sig, example_args)
    return repr(sig)


@functools.lru_cache(maxsize=1)
def _host_fingerprint() -> str:
    """Host CPU identity.  CPU-backend executables embed host ISA
    features (avx512/amx/...); deserializing one on a different machine
    type can SIGILL (observed: this VM's machine type changed between
    sessions and the stale caches started segfaulting XLA).  TPU
    executables are covered by device_kind, but the key must rotate when
    the HOST changes too.

    The fingerprint must include family/model/stepping, not just the
    flags line: XLA:CPU derives pseudo-features (prefer-no-gather /
    prefer-no-scatter) from the CPU *model*, so two machine types with
    identical cpuinfo flags still produce incompatible AOT objects
    (observed 2026-08-19: cpu_aot_loader "+prefer-no-scatter ... doesn't
    match" SIGILL warnings inside a flags-only namespace)."""
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "cpu family", "model", "stepping",
                           "model name"):
                    parts.append(line.strip())
                if len(parts) == 5:
                    break
        if parts:
            return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() + platform.processor()


def cache_key(example_args, salt: str = "") -> str:
    dev = jax.devices()[0]
    h = hashlib.sha256()
    for part in (_SCHEMA, salt, jax.__version__, dev.platform,
                 getattr(dev, "device_kind", ""), _host_fingerprint(),
                 _signature(example_args),
                 _env_fingerprint(), _source_fingerprint()):
        h.update(str(part).encode())
    return h.hexdigest()[:20]


_inproc: dict = {}   # path -> loaded executable (one deserialize/process)


def cached_compile(jitted, example_args, cache_dir: str, salt: str = ""):
    """Compile ``jitted`` for ``example_args`` with a disk executable cache.

    Returns (callable, status) with status in {"loaded", "compiled",
    "cached"}.  The callable takes the same positional arguments as
    ``jitted``.  Within one process, each cache file deserializes once
    (movie frames construct a Renderer per frame).
    """
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    path = os.path.join(cache_dir, f"{cache_key(example_args, salt)}.pkl")
    if path in _inproc:
        return _inproc[path], "cached"
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = deserialize_and_load(payload, in_tree, out_tree)
            _inproc[path] = exe
            return exe, "loaded"
        except Exception:
            pass  # stale/incompatible entry -> recompile below

    compiled = jitted.lower(*example_args).compile()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        payload, in_tree, out_tree = serialize(compiled)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception:
        pass  # cache write is best-effort
    _inproc[path] = compiled
    return compiled, "compiled"
