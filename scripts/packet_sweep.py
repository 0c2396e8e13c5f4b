"""Host-side packet-size sweep: union-waste vs packet size (dev tool).

Walks the binary BVH in numpy with packet-ANY semantics for several packet
sizes over the actual Morton-sorted connection-cast rays of a preset, and
reports pops + leaf visits per RAY — the divergence curve that decides
whether smaller packets (with their higher per-iteration overhead share)
are worth pursuing.

Usage: python scripts/packet_sweep.py [preset] [size] [n_rays_cap]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
import jax.numpy as jnp

import clive2_tpu as c2
from clive2_tpu.ops.traverse_pallas2 import _morton_key


def walk_stats(origin, direction, t_max, nodebox, childs, packet):
    """Packet-ANY BVH walk, counting pops and leaf visits.

    nodebox: [n_inner, 12] (both children's boxes); childs: [n_inner, 2]
    (>=0 inner id, <0 leaf).  best-t updating is skipped (conservative —
    counts are an upper bound, like-for-like across packet sizes)."""
    n = origin.shape[0]
    inv = 1.0 / np.where(np.abs(direction) < 1e-30,
                         np.where(direction < 0, -1e-30, 1e-30), direction)
    tot_pops = 0
    tot_leafs = 0
    n_packets = 0
    for p0 in range(0, n, packet):
        o = origin[p0:p0 + packet]
        iv = inv[p0:p0 + packet]
        bt = t_max[p0:p0 + packet]
        stack = [0]
        pops = 0
        leafs = 0
        while stack:
            node = stack.pop()
            pops += 1
            row = nodebox[node]
            for base, child in ((0, childs[node, 0]), (6, childs[node, 1])):
                t0 = (row[base:base + 3][None, :] - o) * iv
                t1 = (row[base + 3:base + 6][None, :] - o) * iv
                tmin = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
                tmax = np.minimum(np.maximum(t0, t1).min(axis=1), bt)
                if (tmin <= tmax).any():
                    if child < 0:
                        leafs += 1
                    else:
                        stack.append(child)
        tot_pops += pops
        tot_leafs += leafs
        n_packets += 1
    return tot_pops, tot_leafs, n_packets


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "teapots"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    width = height = size
    scene = c2.create_scene_from_preset(preset, pixel_width=width,
                                        pixel_height=height)
    # CPU build has no "pallas" entry; repack explicitly
    from clive2_tpu.bvh.build import build_bvh, leaf_tables
    from clive2_tpu.geometry import TriangleSoup

    # reproduce the scene build's world split
    from clive2_tpu.ops.traverse_pallas2 import pack_bvh2
    # (cheap path: rebuild from the preset's soup)
    import clive2_tpu.scene as S
    soup = S.camera_geometry(scene.camera) + S.box_geometry()
    for spec in S.scene_presets[preset].get("file_specs", []):
        from clive2_tpu.load import load_mesh_file
        soup = soup + load_mesh_file(spec["file_path"],
                                     material=spec.get("material", 0),
                                     scale=spec.get("scale", 1.0),
                                     offset=spec.get("offset",
                                                     np.zeros(3)))
    sel = np.nonzero(~soup.is_camera)[0]
    world = soup.select(sel)
    bvh = build_bvh(world)
    packed = pack_bvh2(bvh, world)
    nodebox = np.asarray(packed["nodebox"]).reshape(-1, 12)
    childs = np.asarray(packed["childs"]).reshape(-1, 2)

    # cast-like rays (depth-1 light vertex -> depth-1 camera vertex)
    from clive2_tpu.integrator import trace as T
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    cam_rays, _ = T.generate_camera_rays(k1, scene.data["camera"], width,
                                         height)
    light_rays = T.generate_light_rays(k2, scene.data["lights"],
                                       scene.data["mat"], width * height)
    n = width * height
    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), cam_rays,
                          light_rays)
    fc = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((n,), bool)])
    path = T.trace_subpaths(k3, merged, scene.data, from_camera=fc)
    v = path["vertices"]
    lv_o = np.asarray(v["origin"][1][n:])
    cv_o = np.asarray(v["origin"][1][:n])
    act = np.asarray(path["valid"][1][n:] & path["valid"][1][:n])
    delta = cv_o - lv_o
    dist = np.sqrt(np.maximum((delta * delta).sum(-1), 1e-30))
    dirs = delta / dist[:, None]
    tmax = dist * 1.001 + 1e-4

    keym = np.asarray(_morton_key(jnp.asarray(lv_o), jnp.asarray(dirs),
                                  packed["lo"], packed["hi"],
                                  active=jnp.asarray(act)))
    order = np.argsort(keym, kind="stable")
    sel = order[act[order]][:cap]
    o, d, tm = lv_o[sel], dirs[sel], tmax[sel]
    print(f"{preset}: {len(sel)} sorted active cast rays, "
          f"{len(childs)} inner nodes")

    for packet in (1024, 512, 256, 128, 64, 1):
        if packet == 1 and len(sel) > 4096:
            o1, d1, tm1 = o[:4096], d[:4096], tm[:4096]
        else:
            o1, d1, tm1 = o, d, tm
        pops, leafs, np_ = walk_stats(o1, d1, tm1, nodebox, childs, packet)
        nr = len(o1)
        print(f"  packet {packet:5d}: pops/ray {pops * packet / nr:7.2f}  "
              f"leaf visits/ray {leafs * packet / nr:7.2f}  "
              f"(per packet: {pops / np_:6.1f} pops, {leafs / np_:5.1f} leafs)")


if __name__ == "__main__":
    main()
