"""Benchmark: sustained BDPT ray throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/sec at 1080p on the Cornell preset — every BVH traversal
actually performed (subpath extension casts for camera+light wavefronts plus
BDPT visibility/projection casts), divided by wall-clock steady-state sample
time.  Baseline: the driver-set north star of 100 Mrays/s/chip
(BASELINE.md; the reference publishes no numbers).

Env overrides: BENCH_WIDTH/BENCH_HEIGHT/BENCH_SAMPLES/BENCH_SCENE.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    import clive2_tpu as c2
    from clive2_tpu import constants
    from clive2_tpu.integrator.render import render_sample

    constants.TIMED_ENABLED = False

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    samples = int(os.environ.get("BENCH_SAMPLES", 8))
    preset = os.environ.get("BENCH_SCENE", "empty")

    scene = c2.create_scene_from_preset(preset, pixel_width=width,
                                        pixel_height=height)
    key = jax.random.key(0)

    @jax.jit
    def step(key, i, scene_data):
        return render_sample(
            jax.random.fold_in(key, i), scene_data, width, height
        )

    # compile + warmup (first sample includes jit)
    out = step(key, jnp.uint32(0), scene.data)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    n_rays_handles = []
    for i in range(1, samples + 1):
        out = step(key, jnp.uint32(i), scene.data)
        n_rays_handles.append(out["n_rays"])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    total_rays = int(sum(int(h) for h in n_rays_handles))

    mrays = total_rays / dt / 1e6
    baseline = 100.0  # north-star Mrays/s/chip
    print(json.dumps({
        "metric": f"bdpt_ray_throughput_{width}x{height}_{preset}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3),
    }))


if __name__ == "__main__":
    main()
