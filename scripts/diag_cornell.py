"""cornell_256 regression bisect (VERDICT r4 weak #4 / round-5 #4).

Round 2 measured ~121 Mrays/s on the 20-tri empty Cornell at 256x256;
round 4 measured 80.6-90.6 with the same kernels while the 1080p
headline HELD (102) — so the suspect is not the dense-MT path but
something specific to ~33 ms samples.  Prime candidate: dispatch
latency exposure.  One axon dispatch costs ~25 ms RTT (link_probe);
bench.py's flight-of-2 keeps only ONE sample queued behind the running
one, so whenever compute_time < RTT the chip idles between samples.
This script measures the same workload at flight depths 1/2/4/8 and
sample counts 16/64: if throughput climbs with depth and saturates,
the round-4 "regression" is measurement pipelining, not kernels.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import clive2_tpu as c2
from clive2_tpu.integrator.render import render_sample


def main():
    w = h = int(os.environ.get("DIAG_SIZE", 256))
    scene = c2.create_scene_from_preset("empty", pixel_width=w,
                                        pixel_height=h)
    key = jax.random.key(0)

    @jax.jit
    def step(key, i, scene_data):
        return render_sample(jax.random.fold_in(key, jnp.uint32(i)),
                             scene_data, w, h)

    out = step(key, 0, scene.data)
    jax.block_until_ready(out)
    rays = int(out["n_rays"])
    print(json.dumps({"row": "warm", "rays_per_sample": rays}), flush=True)

    for depth in (1, 2, 4, 8):
        for n in (16, 64):
            # keep `depth` samples in flight: block on the (i-depth)-th
            # while later dispatches queue
            t0 = time.perf_counter()
            pending = []
            for i in range(1, n + 1):
                pending.append(step(key, i, scene.data))
                if len(pending) >= depth:
                    jax.block_until_ready(pending.pop(0))
            for o in pending:
                jax.block_until_ready(o)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "row": f"flight{depth}_n{n}",
                "mrays": round(rays * n / dt / 1e6, 2),
                "ms_per_sample": round(dt / n * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
