"""clive2-tpu: a TPU-native bidirectional path tracer.

Ground-up JAX/XLA rebuild of pmclaugh/Clive2 (a Metal BDPT renderer):
Veach-style bidirectional path tracing with balance-heuristic MIS, GGX
microfacet reflection + transmission, SAH BVH with threaded stackless
traversal, physical camera-plane model, 3x3 Gaussian reconstruction and
Reinhard tone mapping — expressed as batched SoA wavefront ops under one
jitted program per sample, sharded over device meshes for multi-chip.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: first-compile of the fused render program
# costs minutes on this deployment (remote Mosaic compile); the cache makes
# every later process start warm.  Opt out with CLIVE2_JAX_CACHE=0.
_cache = _os.environ.get(
    "CLIVE2_JAX_CACHE",
    _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
)
if _cache not in ("0", ""):
    # CPU-platform entries are XLA:CPU AOT objects compiled for THIS
    # host's CPU features; the deployment migrates the VM between machine
    # types, and loading another machine's entries warns (cpu_aot_loader
    # "machine features ... doesn't match") and has SIGILL'd mid-suite.
    # Key the CPU cache by a /proc/cpuinfo-flags fingerprint so each
    # machine type gets its own namespace.  TPU entries are device code —
    # host-independent — so the shared dir keeps its warm Mosaic compiles.
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            from .utils.aot import _host_fingerprint

            _cache = _os.path.join(_cache, "cpu-" + _host_fingerprint()[:12])
        except Exception:
            pass
    try:
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from .camera import Camera, tone_map  # noqa: F401
from .materials import MaterialTable, default_materials  # noqa: F401
from .renderer import Renderer  # noqa: F401
from .scene import (  # noqa: F401
    Scene,
    create_scene,
    create_scene_from_preset,
    create_scene_from_preset_with_params,
    scene_presets,
)

__version__ = "0.1.0"
