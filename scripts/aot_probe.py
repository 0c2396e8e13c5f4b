"""Probe compile-avoidance options for the CLI apps (ROADMAP #10).

Measures, for a small Pallas-bearing render program:
  1. cold jit compile time;
  2. second-process warm start with jax_compilation_cache_dir set;
  3. serialize_executable round-trip (AOT pickle) load time.

Usage:
  python scripts/aot_probe.py cold     # compile with persistent cache on
  python scripts/aot_probe.py warm     # same program, fresh process
  python scripts/aot_probe.py save     # AOT-compile + pickle executable
  python scripts/aot_probe.py load     # unpickle + run without compile
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

import clive2_tpu as c2
from clive2_tpu.integrator.render import render_sample

W = H = 128
PKL = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "output", "aot_render.pkl")


def build():
    scene = c2.create_scene_from_preset("teapots", pixel_width=W,
                                        pixel_height=H)
    fn = jax.jit(lambda key, data: render_sample(key, data, W, H))
    return scene, fn


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cold"
    scene, fn = build()
    key = jax.random.key(0)

    if mode in ("cold", "warm"):
        t0 = time.perf_counter()
        out = fn(key, scene.data)
        jax.block_until_ready(out)
        print(f"{mode}: first call {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        out = fn(key, scene.data)
        jax.block_until_ready(out)
        print(f"{mode}: steady state {time.perf_counter() - t0:.3f}s")
    elif mode == "save":
        from jax.experimental.serialize_executable import serialize
        t0 = time.perf_counter()
        compiled = fn.lower(key, scene.data).compile()
        print(f"save: lower+compile {time.perf_counter() - t0:.1f}s")
        payload, in_tree, out_tree = serialize(compiled)
        os.makedirs(os.path.dirname(PKL), exist_ok=True)
        import pickle
        with open(PKL, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        print(f"save: {os.path.getsize(PKL)/2**20:.1f} MiB -> {PKL}")
    elif mode == "load":
        from jax.experimental.serialize_executable import deserialize_and_load
        import pickle
        t0 = time.perf_counter()
        with open(PKL, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        print(f"load: deserialize {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        out = compiled(key, scene.data)
        jax.block_until_ready(out)
        print(f"load: first call {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
