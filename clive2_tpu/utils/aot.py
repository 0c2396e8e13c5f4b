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
which traversal path the scene selected), and a caller salt for function
identity.  Any miss or failure falls back to a normal compile, and
serialization failures are non-fatal (the compiled executable is used
directly).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


_SCHEMA = "aot-v1"


def _signature(example_args) -> str:
    def leaf_sig(a):
        shape = tuple(getattr(a, "shape", ()))
        dtype = str(getattr(a, "dtype", type(a).__name__))
        return (shape, dtype)

    sig = jax.tree.map(leaf_sig, example_args)
    return repr(sig)


def cache_key(example_args, salt: str = "") -> str:
    dev = jax.devices()[0]
    h = hashlib.sha256()
    for part in (_SCHEMA, salt, jax.__version__, dev.platform,
                 getattr(dev, "device_kind", ""), _signature(example_args)):
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
