"""Micro-A/B of packet-kernel variants on one ray population (dev tool).

Variants (same traversal, pieces ablated) timed on connection-cast-like
rays for a preset, to locate where the ~550 cycles/iteration go:

  full         — the production kernel behavior
  noleaf       — leaf lax.conds removed (node phase only; fewer results,
                 NOT correct — timing only)
  nogroupskip  — leaf MT without the per-group cond (all 8 groups always)
  noorder      — no near-first ordering (a pushed last always)
  noreduce     — min-reductions replaced with jnp.any (ordering arbitrary)

Usage: python scripts/kernel_microbench.py [preset] [size] [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import clive2_tpu as c2
from clive2_tpu.constants import DELTA
from clive2_tpu.ops.traverse_pallas2 import (
    BLOCK_RAYS, LANES, MAX_LEAF, STACK_DEPTH, SUBLANES, _morton_key,
)

INF = float("inf")


def make_kernel(leaf_mode, order_mode):
    """leaf_mode: 'skip' | 'always' | 'none'; order_mode: 'tmin' | 'fixed'
    | 'any'."""

    def kern(nodebox, childs, leaff, ox, oy, oz, dx, dy, dz, act, tm,
             out_t, out_i, stack):
        tiny = jnp.float32(1e-30)

        def inv(d):
            return 1.0 / jnp.where(jnp.abs(d) < tiny,
                                   jnp.where(d < 0, -tiny, tiny), d)

        invx, invy, invz = inv(dx[:]), inv(dy[:]), inv(dz[:])
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        active = act[:] > 0.0

        def box_test(node, base, bt):
            off = node * 12 + base
            t0x = (nodebox[off + 0] - o_x) * invx
            t1x = (nodebox[off + 3] - o_x) * invx
            t0y = (nodebox[off + 1] - o_y) * invy
            t1y = (nodebox[off + 4] - o_y) * invy
            t0z = (nodebox[off + 2] - o_z) * invz
            t1z = (nodebox[off + 5] - o_z) * invz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            hit = (tmin <= tmax) & active
            return hit, jnp.where(hit, tmin, INF)

        def leaf_tests(lid, box_hit, bt, bi):
            group = pl.multiple_of((lid // 16) * LANES, LANES)
            wide = leaff[:, pl.ds(group, LANES)]
            rolled = pltpu.roll(wide, shift=-(lid % 16) * MAX_LEAF, axis=1)
            tile = rolled[:, 0:MAX_LEAF].T

            def col(k):
                return jnp.broadcast_to(tile[:, k:k + 1], (SUBLANES, LANES))

            v0x, v0y, v0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)
            tri_f = col(9)

            rows_t, rows_i = [], []
            for g in range(SUBLANES):
                def compute(rows, g=g):
                    bt_g, bi_g = rows
                    row = lambda a: jnp.broadcast_to(
                        a[g:g + 1, :], (SUBLANES, LANES))
                    rox, roy, roz = row(o_x), row(o_y), row(o_z)
                    rdx, rdy, rdz = row(d_x), row(d_y), row(d_z)
                    rhit = row(box_hit.astype(jnp.float32)) > 0.0
                    rbt = row(bt)
                    hx = rdy * e2z - rdz * e2y
                    hy = rdz * e2x - rdx * e2z
                    hz = rdx * e2y - rdy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / a
                    sx = rox - v0x
                    sy = roy - v0y
                    sz = roz - v0z
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (rdx * qx + rdy * qy + rdz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                          & (u + v <= 1.0)
                          & (t > DELTA) & (t < rbt) & rhit & (tri_f >= 0.0))
                    t = jnp.where(ok, t, INF)
                    tmin = jnp.min(t, axis=0, keepdims=True)
                    found = tmin < rbt[0:1, :]
                    is_best = (t == jnp.broadcast_to(tmin, t.shape)) & ok
                    sel_i = jnp.max(
                        jnp.where(is_best, tri_f, -jnp.float32(INF)),
                        axis=0, keepdims=True)
                    return (jnp.where(found, tmin, bt_g),
                            jnp.where(found, sel_i.astype(jnp.int32), bi_g))

                rows = (bt[g:g + 1, :], bi[g:g + 1, :])
                if leaf_mode == "skip":
                    nt, ni = jax.lax.cond(
                        jnp.any(box_hit[g:g + 1, :]), compute,
                        lambda r: r, rows)
                else:
                    nt, ni = compute(rows)
                rows_t.append(nt)
                rows_i.append(ni)
            return (jnp.concatenate(rows_t, axis=0),
                    jnp.concatenate(rows_i, axis=0))

        stack[0] = 0

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, bt, bi = c
            node = stack[sp - 1]
            sp = sp - 1

            hit_a, tmin_a = box_test(node, 0, bt)
            hit_b, tmin_b = box_test(node, 6, bt)
            if order_mode == "any":
                any_a = jnp.any(hit_a)
                any_b = jnp.any(hit_b)
                a_near = True
            else:
                near_a = jnp.min(tmin_a)
                near_b = jnp.min(tmin_b)
                any_a = near_a < INF
                any_b = near_b < INF
                a_near = (near_a <= near_b) if order_mode == "tmin" else True

            ca = childs[node * 2]
            cb = childs[node * 2 + 1]
            a_leaf = ca < 0
            b_leaf = cb < 0

            push_b = any_b & (~b_leaf)
            push_a = any_a & (~a_leaf)
            both = push_a & push_b
            if order_mode == "tmin":
                first = jnp.where(a_near, cb, ca)
                second = jnp.where(a_near, ca, cb)
            else:
                first, second = cb, ca

            @pl.when(both)
            def _():
                stack[sp] = first
                stack[sp + 1] = second

            @pl.when(push_b & ~both)
            def _():
                stack[sp] = cb

            @pl.when(push_a & ~both)
            def _():
                stack[sp] = ca

            sp = sp + push_a.astype(jnp.int32) + push_b.astype(jnp.int32)

            if leaf_mode != "none":
                bt, bi = jax.lax.cond(
                    any_a & a_leaf,
                    lambda args: leaf_tests(-(ca + 1), hit_a, *args),
                    lambda args: args,
                    (bt, bi),
                )
                bt, bi = jax.lax.cond(
                    any_b & b_leaf,
                    lambda args: leaf_tests(-(cb + 1), hit_b, *args),
                    lambda args: args,
                    (bt, bi),
                )
            return sp, bt, bi

        init = (jnp.int32(1), tm[:],
                jnp.full((SUBLANES, LANES), -1, dtype=jnp.int32))
        _, bt, bi = jax.lax.while_loop(cond, body, init)
        out_t[:] = bt
        out_i[:] = bi

    return kern


@functools.partial(jax.jit, static_argnames=("n_blocks", "leaf_mode",
                                             "order_mode"))
def run_variant(nodebox, childs, leaff, rays, n_blocks, leaf_mode,
                order_mode):
    plane = lambda: pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = (n_blocks * SUBLANES, LANES)
    return pl.pallas_call(
        make_kernel(leaf_mode, order_mode),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [plane()] * 8,
        out_specs=[plane()] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )(nodebox, childs, leaff,
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"], rays["tm"])


VARIANTS = {
    "full": ("skip", "tmin"),
    "noleaf": ("none", "tmin"),
    "nogroupskip": ("always", "tmin"),
    "noorder": ("skip", "fixed"),
    "noreduce": ("skip", "any"),
}


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "teapots"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    names = sys.argv[3:] or list(VARIANTS)
    width = height = size
    scene = c2.create_scene_from_preset(preset, pixel_width=width,
                                        pixel_height=height)
    packed = scene.data["pallas"]
    key = jax.random.key(0)

    # cast-like rays: light depth-1 vertex -> camera depth-1 vertex
    from clive2_tpu.integrator import trace as T
    cam = scene.data["camera"]
    k1, k2, k3 = jax.random.split(key, 3)
    cam_rays, _ = T.generate_camera_rays(k1, cam, width, height)
    light_rays = T.generate_light_rays(k2, scene.data["lights"],
                                       scene.data["mat"], width * height)
    n = width * height
    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), cam_rays,
                          light_rays)
    fc = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((n,), bool)])
    path = T.trace_subpaths(k3, merged, scene.data, from_camera=fc)
    v = path["vertices"]
    lv_o = v["origin"][1][n:]
    cv_o = v["origin"][1][:n]
    act = path["valid"][1][n:] & path["valid"][1][:n]
    delta = cv_o - lv_o
    dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-30))
    dirs = delta / dist[:, None]
    tmax = dist * 1.001 + 1e-4

    key_m = _morton_key(lv_o, dirs, packed["lo"], packed["hi"], active=act)
    order = jnp.argsort(key_m)
    origin, direction = lv_o[order], dirs[order]
    act_s, tmax_s = act[order], tmax[order]

    n_pad = ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS
    n_blocks = n_pad // BLOCK_RAYS

    def plane_arr(x, fill):
        flat = jnp.full((n_pad,), fill, jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * SUBLANES, LANES)

    rays = dict(
        ox=plane_arr(origin[:, 0], 0.0), oy=plane_arr(origin[:, 1], 0.0),
        oz=plane_arr(origin[:, 2], 0.0),
        dx=plane_arr(direction[:, 0], 1.0), dy=plane_arr(direction[:, 1], 0.0),
        dz=plane_arr(direction[:, 2], 0.0),
        act=plane_arr(act_s.astype(jnp.float32), 0.0),
        tm=plane_arr(tmax_s, 0.0),
    )
    rays = jax.tree.map(jax.block_until_ready, rays)
    n_act = int(np.asarray(jnp.sum(act_s.astype(jnp.int32))))
    print(f"{preset} {size}x{size}: {n_blocks} packets, "
          f"{n_act/1e6:.2f}M active cast rays")

    for name in names:
        leaf_mode, order_mode = VARIANTS[name]
        out = run_variant(packed["nodebox"], packed["childs"],
                          packed["leaff"], rays, n_blocks, leaf_mode,
                          order_mode)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = run_variant(packed["nodebox"], packed["childs"],
                              packed["leaff"], rays, n_blocks, leaf_mode,
                              order_mode)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"  {name:12s} {dt*1e3:8.2f} ms  "
              f"{n_act/dt/1e6:7.2f} Mrays/s  "
              f"{dt*1e6/n_blocks:6.1f} us/packet")


if __name__ == "__main__":
    main()
