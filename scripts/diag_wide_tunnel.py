"""Attribute the round-3 wide-kernel microbench slowness (0.38 Mrays/s).

Hypotheses: (a) real kernel time, (b) per-dispatch fixed tunnel cost,
(c) per-call argument re-upload.  Measures the same wide47k workload as
val_tpu_round3 three ways:

  loop1   val-style: dispatch, sync a 1-elem slice, repeat  (x3 best)
  pipeN   N back-to-back dispatches, ONE block at the end   (amortizes
          per-call fixed costs; if >> loop1 throughput, overhead-bound)
  small   same, on a 65k-ray wavefront (production wavefronts are
          256x256=65k) — fixed costs weigh 16x more per ray here

Prints Mrays/s per mode.  ~2 min chip time warm.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from clive2_tpu.bvh.build import build_bvh
from clive2_tpu.ops import traverse_wide as tw
from val_tpu_round3 import cluster_scene, rays  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    soup = cluster_scene(47_000, seed=3)
    bvh = build_bvh(soup)
    packed = {k: jnp.asarray(v) for k, v in tw.pack_bvh8(bvh, soup).items()}
    jax.block_until_ready(packed)

    fn = jax.jit(lambda o, d, pk: tw.intersect_wide(o, d, pk))

    for n in (1_000_000, 65_536):
        for cname, coh in (("coherent", True), ("incoherent", False)):
            o, d = rays(n, coh)
            ov = jax.device_put(jnp.asarray(o))
            dv = jax.device_put(jnp.asarray(d))
            jax.block_until_ready((ov, dv))
            t0 = time.perf_counter()
            r = fn(ov, dv, packed)
            jax.block_until_ready(r)
            print(f"n={n} {cname}: first call {time.perf_counter()-t0:.1f}s",
                  flush=True)

            # loop1: val-style
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(ov, dv, packed)
                float(np.asarray(r[1][:1])[0])
                best = min(best, time.perf_counter() - t0)
            print(f"n={n} {cname} loop1: {best*1e3:8.1f} ms "
                  f"{n/best/1e6:7.2f} Mrays/s", flush=True)

            # pipeN: amortize fixed per-call cost
            N = 5
            t0 = time.perf_counter()
            outs = [fn(ov, dv, packed) for _ in range(N)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / N
            print(f"n={n} {cname} pipe{N}: {dt*1e3:8.1f} ms "
                  f"{n/dt/1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
