"""Benchmark: sustained BDPT throughput on one chip, per BASELINE config.

Prints one JSON line per config: {"metric", "value", "unit", "vs_baseline",
"spp_per_s", "resolution", "samples"}.  The FIRST line is the headline
metric (1080p Cornell Mrays/s vs the driver-set 100 Mrays/s/chip north
star); the remaining lines cover BASELINE.json's eval configs:

  cornell_256    Cornell-box diffuse, 256x256, 8 spp (config #1)
  teapots_512    teapot OBJs with GGX glass/glossy, 512x512 (config #2)
  dragon_512     glass dragon PLY, specular transmission (config #3)
  sponza_1080p   ~1.3M-triangle scene at 1080p (config #4)
  movie_720p     per-frame orbit animation steady-state s/frame (config #5)

Mrays/s counts every BVH traversal actually performed (subpath extension
casts + BDPT visibility/projection casts).  The reference publishes no
numbers (BASELINE.md); vs_baseline is against the north star for the
headline and against round-1 measured values (BASELINE.md table) for the
configs where one exists.

Env overrides: BENCH_CONFIGS (comma list of names above, or "headline"),
BENCH_WIDTH/BENCH_HEIGHT/BENCH_SAMPLES/BENCH_SCENE for the headline.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_assets():
    res = os.environ.get(
        "CLIVE2_RESOURCES",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "resources"),
    )
    needed = ["teapot.obj", "dragon_vrip_res3.ply", "sponza_scale.ply"]
    if not all(os.path.exists(os.path.join(res, n)) for n in needed):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "make_assets.py")],
            check=True,
        )


def bench_render(preset, width, height, samples, metric, baseline=None,
                 chunk_rows=None):
    import jax
    import jax.numpy as jnp

    import clive2_tpu as c2
    from clive2_tpu.integrator.render import render_sample

    scene = c2.create_scene_from_preset(preset, pixel_width=width,
                                        pixel_height=height)
    key = jax.random.key(0)

    if chunk_rows:
        @jax.jit
        def stripe(key, i, row0, scene_data):
            k = jax.random.fold_in(jax.random.fold_in(key, i), row0)
            return render_sample(k, scene_data, width, height,
                                 row0=row0, rows=chunk_rows)

        def step(key, i, scene_data):
            outs = None
            for r in range(0, height, chunk_rows):
                o = stripe(key, jnp.uint32(i), jnp.int32(r), scene_data)
                outs = o if outs is None else jax.tree.map(
                    lambda a, b: a + b, outs, o)
            return outs
    else:
        @jax.jit
        def step(key, i, scene_data):
            return render_sample(
                jax.random.fold_in(key, jnp.uint32(i)), scene_data,
                width, height
            )

    out = step(key, 0, scene.data)               # compile + warmup
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    n_rays_handles = []
    for i in range(1, samples + 1):
        out = step(key, i, scene.data)
        n_rays_handles.append(out["n_rays"])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    total_rays = int(sum(int(h) for h in n_rays_handles))

    mrays = total_rays / dt / 1e6
    rec = {
        "metric": metric,
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3) if baseline else None,
        "spp_per_s": round(samples / dt, 3),
        "resolution": f"{width}x{height}",
        "samples": samples,
    }
    print(json.dumps(rec), flush=True)


def bench_movie(width=1280, height=720, frames=3, spp=2):
    """Steady-state seconds/frame for the orbit animation (config #5):
    camera-only scene update + cached jit across frames."""
    import jax
    import jax.numpy as jnp

    import clive2_tpu as c2
    from clive2_tpu.integrator.render import render_sample
    from clive2_tpu.scene import orbit_camera

    scene = c2.create_scene_from_preset_with_params(
        "empty", pixel_width=width, pixel_height=height,
        frame_idx=0, total_frames=120,
    )
    key = jax.random.key(0)

    @jax.jit
    def step(key, i, scene_data):
        return render_sample(jax.random.fold_in(key, i), scene_data,
                             width, height)

    def frame(f):
        sc = scene.with_camera(
            orbit_camera(f, 120, width, height)
        ) if f else scene
        out = None
        for i in range(spp):
            out = step(key, jnp.uint32(f * spp + i), sc.data)
        jax.block_until_ready(out)

    frame(0)                                     # compile + warmup
    t0 = time.perf_counter()
    for f in range(1, frames + 1):
        frame(f)
    dt = (time.perf_counter() - t0) / frames

    # round-1 measured 0.16 s/frame setup + render at these settings;
    # baseline here = the reference's per-frame full rebuild (BVH +
    # kernel recompile) which it pays every frame (movie.py:31-38)
    rec = {
        "metric": f"movie_s_per_frame_{width}x{height}_{spp}spp",
        "value": round(dt, 3),
        "unit": "s/frame",
        "vs_baseline": None,
        "spp_per_s": round(spp / dt, 3),
        "resolution": f"{width}x{height}",
        "samples": spp,
    }
    print(json.dumps(rec), flush=True)


def main():
    configs = os.environ.get(
        "BENCH_CONFIGS",
        "headline,cornell_256,teapots_512,dragon_512,sponza_1080p,"
        "movie_720p",
    ).split(",")

    if len(configs) > 1 and not os.environ.get("BENCH_NO_FORK"):
        # run each config in its own subprocess: a TPU fault in one config
        # (device errors poison the client for the rest of the process)
        # must not take down the remaining rows
        _ensure_assets()
        for cfg in configs:
            env = dict(os.environ, BENCH_CONFIGS=cfg.strip())
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env)
            if r.returncode != 0:
                print(json.dumps({
                    "metric": cfg.strip(), "value": None, "unit": "error",
                    "vs_baseline": None,
                    "error": f"bench subprocess exited {r.returncode}",
                }), flush=True)
        return

    from clive2_tpu import constants

    constants.TIMED_ENABLED = False
    _ensure_assets()

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    samples = int(os.environ.get("BENCH_SAMPLES", 8))
    preset = os.environ.get("BENCH_SCENE", "empty")

    for cfg in configs:
        cfg = cfg.strip()
        try:
            if cfg == "headline":
                bench_render(
                    preset, width, height, samples,
                    f"bdpt_ray_throughput_{width}x{height}_{preset}",
                    baseline=100.0,              # north star Mrays/s/chip
                )
            elif cfg == "cornell_256":
                bench_render("empty", 256, 256, 16,
                             "cornell_256x256", baseline=None)
            elif cfg == "teapots_512":
                bench_render("teapots", 512, 512, 4,
                             "teapots_ggx_512x512", baseline=7.5)
            elif cfg == "dragon_512":
                bench_render("dragon", 512, 512, 4,
                             "glass_dragon_512x512", baseline=4.1)
            elif cfg == "sponza_1080p":
                # 54-row stripes: each stripe is one short device program.
                # The axon TPU worker dies when a single program (or launch)
                # runs for tens of seconds — 270-row stripes at this scene
                # size ran ~40 s/program and crashed the worker (see
                # traverse_stream.MAX_BLOCKS_PER_CALL); 54-row stripes
                # measured green end-to-end at 1080p.
                bench_render("sponza", 1920, 1080, 1,
                             "sponza_1.3Mtris_1920x1080", baseline=None,
                             chunk_rows=54)
            elif cfg == "movie_720p":
                bench_movie()
        except Exception as e:  # one config failing must not kill the rest
            print(json.dumps({
                "metric": cfg, "value": None, "unit": "error",
                "vs_baseline": None, "error": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
