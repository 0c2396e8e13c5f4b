"""Generate procedural stand-in assets for the scene presets.

The reference presets expect ../resources/teapot.obj and the Stanford
dragon PLYs (scene.py:159-200 in the reference); those files are not in
this image, so this script writes procedural substitutes with comparable
triangle counts into resources/.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from clive2_tpu.load import write_obj, write_ply
from clive2_tpu.models import displaced_blob, teapot_like

RES = os.environ.get(
    "CLIVE2_RESOURCES",
    os.path.join(os.path.dirname(__file__), "..", "resources"),
)


def main():
    os.makedirs(RES, exist_ok=True)

    v, f = teapot_like(segments=40)
    write_obj(os.path.join(RES, "teapot.obj"), v, f)
    print(f"teapot.obj: {len(f)} tris")

    # dragon stand-ins scaled to the preset's expectations: the presets
    # apply scale=50 and offset (0,-4,0); the real dragon spans ~0.15 units.
    for name, subdiv in [
        ("dragon_vrip_res3.ply", 4),   # ~5k tris  (real res3: ~47k)
        ("dragon_vrip_res2.ply", 6),   # ~82k tris (real res2: ~202k)
        ("dragon_vrip.ply", 7),        # ~327k tris (real: ~871k)
        ("sponza_scale.ply", 8),       # ~1.3M tris (BASELINE config #4
                                       #  "Sponza-scale ~1M tris" stand-in)
    ]:
        v, f = displaced_blob(subdivisions=subdiv)
        v = v * 0.06 + np.array([0.0, 0.085, 0.0])  # dragon-ish footprint
        write_ply(os.path.join(RES, name), v, f, binary=True)
        print(f"{name}: {len(f)} tris")


if __name__ == "__main__":
    main()
