"""Packet-kernel traversal statistics (dev tool).

Runs a counting copy of the traverse_pallas2 kernel over the ACTUAL ray
populations of a preset (camera rays, bounce rays, connection casts) and
reports per-packet node pops, leaf visits, and ray-group MT activations —
the numbers that decide where kernel time goes.

Usage: python scripts/kernel_stats.py [preset] [size]
"""

import os
import sys

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


def _count_kernel(nodebox, childs, leaff, ox, oy, oz, dx, dy, dz, act, tm,
                  out_t, out_stats, stack):
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
        return (tmin <= tmax) & active

    def leaf_tests(lid, box_hit, bt, groups_done):
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

        new_rows = []
        for g in range(SUBLANES):
            def compute(row_bt, g=g):
                row = lambda a: jnp.broadcast_to(a[g:g + 1, :],
                                                 (SUBLANES, LANES))
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
                ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t > DELTA) & (t < rbt) & rhit & (tri_f >= 0.0))
                t = jnp.where(ok, t, INF)
                tmin = jnp.min(t, axis=0, keepdims=True)
                found = tmin < rbt[0:1, :]
                return jnp.where(found, tmin, row_bt), jnp.int32(1)

            g_any = jnp.any(box_hit[g:g + 1, :])
            nt, did = jax.lax.cond(
                g_any, compute,
                lambda r: (r, jnp.int32(0)), bt[g:g + 1, :]
            )
            groups_done = groups_done + did
            new_rows.append(nt)
        return jnp.concatenate(new_rows, axis=0), groups_done

    stack[0] = 0

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, bt, pops, leafs, groups = c
        node = stack[sp - 1]
        sp = sp - 1
        pops = pops + 1

        hit_a = box_test(node, 0, bt)
        hit_b = box_test(node, 6, bt)
        any_a = jnp.any(hit_a)
        any_b = jnp.any(hit_b)

        ca = childs[node * 2]
        cb = childs[node * 2 + 1]
        a_leaf = ca < 0
        b_leaf = cb < 0

        push_b = any_b & (~b_leaf)
        push_a = any_a & (~a_leaf)

        both = push_a & push_b

        @pl.when(both)
        def _():
            stack[sp] = cb
            stack[sp + 1] = ca

        @pl.when(push_b & ~both)
        def _():
            stack[sp] = cb

        @pl.when(push_a & ~both)
        def _():
            stack[sp] = ca

        sp = sp + push_a.astype(jnp.int32) + push_b.astype(jnp.int32)

        def do_leaf(args):
            bt, leafs, groups, lid, hit = args
            nt, groups = leaf_tests(lid, hit, bt, groups)
            return nt, leafs + 1, groups

        bt, leafs, groups = jax.lax.cond(
            any_a & a_leaf,
            lambda args: do_leaf((args[0], args[1], args[2], -(ca + 1), hit_a)),
            lambda args: args[:3],
            (bt, leafs, groups, jnp.int32(0), hit_a),
        )
        bt, leafs, groups = jax.lax.cond(
            any_b & b_leaf,
            lambda args: do_leaf((args[0], args[1], args[2], -(cb + 1), hit_b)),
            lambda args: args[:3],
            (bt, leafs, groups, jnp.int32(0), hit_b),
        )
        return sp, bt, pops, leafs, groups

    init = (jnp.int32(1), tm[:], jnp.int32(0), jnp.int32(0), jnp.int32(0))
    _, bt, pops, leafs, groups = jax.lax.while_loop(cond, body, init)
    out_t[:] = bt
    out_stats[0] = pops
    out_stats[1] = leafs
    out_stats[2] = groups


def packet_stats(origin, direction, packed, active=None, t_max=None,
                 sort=True):
    if sort:
        key = _morton_key(origin, direction, packed["lo"], packed["hi"],
                          active=active)
        order = jnp.argsort(key)
        origin, direction = origin[order], direction[order]
        active = None if active is None else active[order]
        t_max = None if t_max is None else t_max[order]

    n = origin.shape[0]
    n_pad = max(BLOCK_RAYS, ((n + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS)
    n_blocks = n_pad // BLOCK_RAYS

    def plane(x, fill):
        flat = jnp.full((n_pad,), fill, dtype=jnp.float32).at[:n].set(x)
        return flat.reshape(n_blocks * SUBLANES, LANES)

    act = (jnp.ones((n,), jnp.float32) if active is None
           else active.astype(jnp.float32))
    tm = jnp.full((n,), INF) if t_max is None else t_max
    rays = dict(
        ox=plane(origin[:, 0], 0.0), oy=plane(origin[:, 1], 0.0),
        oz=plane(origin[:, 2], 0.0),
        dx=plane(direction[:, 0], 1.0), dy=plane(direction[:, 1], 0.0),
        dz=plane(direction[:, 2], 0.0),
        act=plane(act, 0.0), tm=plane(tm, 0.0),
    )
    vplane = lambda: pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    _, stats = pl.pallas_call(
        _count_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [vplane()] * 8,
        out_specs=[
            vplane(),
            pl.BlockSpec((1024,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 1024,), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )(packed["nodebox"], packed["childs"], packed["leaff"],
      rays["ox"], rays["oy"], rays["oz"],
      rays["dx"], rays["dy"], rays["dz"], rays["act"], rays["tm"])
    return np.asarray(stats).reshape(n_blocks, 1024)[:, :3], n_blocks


def report(name, stats, n_blocks, n_active):
    pops, leafs, groups = stats.sum(axis=0)
    print(f"{name}: {n_blocks} packets, {n_active/1e6:.2f}M active rays")
    print(f"  node pops / packet: {pops / n_blocks:8.1f}")
    print(f"  leaf visits/packet: {leafs / n_blocks:8.1f}   "
          f"groups-MT/visit: {groups / max(leafs, 1):5.2f} of 8")
    print(f"  leaf visits/ray:    {leafs * 1024 / max(n_active, 1):8.2f} "
          f"(packet-amortized)")


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "teapots"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    width = height = size
    scene = c2.create_scene_from_preset(preset, pixel_width=width,
                                        pixel_height=height)
    assert "pallas" in scene.data, "preset not on the pallas2 path"
    packed = scene.data["pallas"]
    key = jax.random.key(0)

    from clive2_tpu.integrator import trace as T
    cam = scene.data["camera"]
    k1, k2, k3 = jax.random.split(key, 3)
    cam_rays, _ = T.generate_camera_rays(k1, cam, width, height)

    # camera rays
    stats, n_blocks = packet_stats(cam_rays["origin"], cam_rays["direction"],
                                   packed)
    report("camera rays", stats, n_blocks, size * size)

    # bounce rays at depth 2 (trace the paths on-device, pull depth-2 dirs)
    light_rays = T.generate_light_rays(k2, scene.data["lights"],
                                       scene.data["mat"], width * height)
    n = width * height
    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), cam_rays,
                          light_rays)
    fc = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((n,), bool)])
    path = T.trace_subpaths(k3, merged, scene.data, from_camera=fc)
    v = path["vertices"]
    d2_o = v["origin"][2]
    d2_d = v["direction"][2]
    d2_act = path["valid"][2]
    stats, n_blocks = packet_stats(d2_o, d2_d, packed, active=d2_act)
    report("depth-2 bounce rays", stats, n_blocks,
           int(np.asarray(jnp.sum(d2_act))))

    # connection-like rays: light depth-1 vertex -> camera depth-1 vertex
    lv_o = v["origin"][1][n:]
    cv_o = v["origin"][1][:n]
    act = path["valid"][1][n:] & path["valid"][1][:n]
    delta = cv_o - lv_o
    dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-30))
    dirs = delta / dist[:, None]
    tmax = dist * 1.001 + 1e-4
    stats, n_blocks = packet_stats(lv_o, dirs, packed, active=act,
                                   t_max=tmax)
    report("connection casts (t=2,s=2)", stats, n_blocks,
           int(np.asarray(jnp.sum(act))))


if __name__ == "__main__":
    main()
