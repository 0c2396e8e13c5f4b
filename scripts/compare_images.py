"""RMSE comparison tool for render outputs.

Usage: python scripts/compare_images.py a.png b.png
       python scripts/compare_images.py a.npz b.npz  (raw accumulators)

Used for the parity criterion vs reference renders (BASELINE.md: <1e-3
RMSE at equal spp on [0,1]-normalized images).
"""

import sys

import numpy as np


def load(path):
    if path.endswith(".npz"):
        z = np.load(path)
        img = z["summed_image"] / np.maximum(z["summed_weight"][..., None], 1e-9)
        return np.nan_to_num(img, posinf=0, neginf=0)
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.float64) / 255.0


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        sys.exit(2)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    mae = float(np.mean(np.abs(a - b)))
    print(f"rmse={rmse:.6f} mae={mae:.6f} max={float(np.abs(a - b).max()):.6f}")
    sys.exit(0 if rmse < 1e-3 else 1)


if __name__ == "__main__":
    main()
