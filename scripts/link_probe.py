"""Link-health microprobe for the axon TPU tunnel (VERDICT r3 #6).

Measures, in order, each phase that a bench config passes through, so a
hang or slowdown can be attributed instead of guessed at:

  attach      jax.devices() wall time (backend init / tunnel handshake)
  h2d/d2h     bulk transfer bandwidth at 1 MB and 32 MB
  dispatch    round-trip latency of a trivial pre-compiled jit (x20)
  compile     wall time to compile a small XLA program (matmul chain)
  pallas      wall time to compile + FIRST-RUN a small Pallas kernel
              (first run includes the Mosaic binary upload to the chip
              — the phase suspected of eating the round-3 bench budgets)

Prints one JSON line per phase and a final "verdict" line classifying
the link as healthy / degraded-compile / degraded-transfer.  Total chip
time <2 min on a healthy link.  Run standalone or import probe() from
session scripts to stamp measurements with link state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(phase, seconds, **kw):
    rec = {"phase": phase, "seconds": round(seconds, 3), **kw}
    print(json.dumps(rec), flush=True)
    return rec


def probe():
    rows = []
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    rows.append(_emit("attach", time.perf_counter() - t0,
                      platform=devs[0].platform, n=len(devs)))

    import numpy as np

    for mb in (1, 32):
        host = np.zeros((mb * 1024 * 1024 // 4,), np.float32)
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        h2d = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(dev)
        d2h = time.perf_counter() - t0
        rows.append(_emit(f"h2d_{mb}mb", h2d,
                          mbps=round(mb / max(h2d, 1e-9), 1)))
        rows.append(_emit(f"d2h_{mb}mb", d2h,
                          mbps=round(mb / max(d2h, 1e-9), 1)))

    x = jax.device_put(jnp.ones((8, 128), jnp.float32))
    f = jax.jit(lambda a: a * 2.0 + 1.0)
    jax.block_until_ready(f(x))          # compile once
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(x))
    rows.append(_emit("dispatch_x20", time.perf_counter() - t0,
                      ms_per_call=round((time.perf_counter() - t0) / 20 * 1e3,
                                        2)))

    g = jax.jit(lambda a: a @ a + jnp.sin(a).sum())
    m = jax.device_put(jnp.ones((512, 512), jnp.bfloat16))
    t0 = time.perf_counter()
    jax.block_until_ready(g(m))
    rows.append(_emit("xla_compile_small", time.perf_counter() - t0))

    # A Pallas kernel sized like a production traversal program's Mosaic
    # binary upload path (small grid, but exercises the Mosaic pipeline +
    # binary push to the chip).
    try:
        from jax.experimental import pallas as pl

        def k(a_ref, o_ref):
            o_ref[...] = a_ref[...] * 2.0 + 1.0

        a = jnp.ones((256, 128), jnp.float32)
        run = jax.jit(lambda a: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype))(a))
        t0 = time.perf_counter()
        jax.block_until_ready(run(a))
        rows.append(_emit("pallas_compile_first_run",
                          time.perf_counter() - t0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(a))
        rows.append(_emit("pallas_steady", time.perf_counter() - t0))
    except Exception as e:               # pragma: no cover
        rows.append(_emit("pallas_compile_first_run", -1.0,
                          error=str(e)[:120]))

    by = {r["phase"]: r for r in rows}
    verdict = "healthy"
    if by.get("h2d_32mb", {}).get("mbps", 1e9) < 50:
        verdict = "degraded-transfer"
    elif by.get("pallas_compile_first_run", {}).get("seconds", 0) > 30 or \
            by.get("xla_compile_small", {}).get("seconds", 0) > 20:
        verdict = "degraded-compile"
    elif by.get("dispatch_x20", {}).get("ms_per_call", 0) > 50:
        verdict = "degraded-latency"
    print(json.dumps({"phase": "verdict", "link": verdict}), flush=True)
    return verdict, rows


if __name__ == "__main__":
    probe()
