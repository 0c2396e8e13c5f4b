"""Reproduce + capture the stream2 hardware compile failure (round 4).

The 2026-08-20 kernel matrix showed intersect_stream2 failing to compile
on the real chip: `remote_compile: HTTP 500: tpu_compile_helper
subprocess exit code 1` — the Mosaic pipeline itself is dying, which the
CPU interpret suite cannot see.  This script compiles the kernel at a
small scene size with full tracebacks, trying knobs in order, to find
(a) the exact error text and (b) whether any knob (rows / nbuf / agg)
avoids it.

Usage: python scripts/repro_stream2_compile.py [n_tris]
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp

from clive2_tpu.bvh.build import build_bvh
from val_tpu_round3 import cluster_scene

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000


def try_compile(tag, **kw):
    from clive2_tpu.ops import traverse_stream2 as ts2

    soup = cluster_scene(N_TRIS)
    bvh = build_bvh(soup)
    packed = {k: jnp.asarray(v) for k, v in ts2.pack_stream2(bvh, soup).items()}
    o = jnp.zeros((4096, 3), jnp.float32)
    d = jnp.ones((4096, 3), jnp.float32)
    fn = jax.jit(lambda o, d, pk: ts2.intersect_stream2(o, d, pk, **kw))
    print(f"=== {tag}: rows={ts2.RAY_ROWS} nbuf={ts2.NBUF} kw={kw}",
          flush=True)
    try:
        lowered = fn.lower(o, d, packed)
        lowered.compile()
        print(f"=== {tag}: COMPILE OK", flush=True)
        return True
    except Exception:
        tb = traceback.format_exc()
        print(f"=== {tag}: COMPILE FAILED\n{tb[-6000:]}", flush=True)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    try_compile("default")
