"""Deployment-tuned kernel defaults, written by the hardware validation
session and consumed when the corresponding CLIVE2_* env knob is unset.

Rationale: the axon TPU backend can be unreachable for many hours, so
hardware validation runs as an unattended queued session
(scripts/tpu_queue.sh -> tpu_session.sh -> tune_from_session.py).  When
a kernel variant *wins its A/B on this deployment* the session records
the decision here, and later renders — including ones launched with no
human in the loop, like the driver's bench run — pick it up without a
code edit.  Env knobs always override; CLIVE2_TUNED=0 disables the file
entirely (the test suite does this for hermeticity).

Keys currently understood:
  stream_impl: "1" (VPU fat-leaf drain) | "2" (MXU bilinear-MT drain)
  wide_gate:   "0" | "1" (per-group leaf-MT gating in the BVH8 kernel)
  wide_compact: "0" | "1" (12-slot pad-free BVH8 leaf pages; always used
               as the VMEM-budget fallback regardless of this default)
  wide_pop2:   "0" | "1" (retire two stack nodes per BVH8 while
               iteration, overlapping the box-phase scalar windows)
  pallas_vmem: VMEM budget in bytes for the resident packet kernels
               (default 9 MB; 14 MB once hardware proves the compact
               202k-tri pack compiles and wins its bench A/B)
  stream_agg:  "0" | "1" | "4" (stream2 drain aggregation depth:
               single / dual / quad ring slots per MXU pass; quad
               self-clamps to dual when the ring is shallower than 8)
  stream2_rows / stream2_nbuf / stream2_occ: the MXU streaming kernel's
               packet rows / DMA-ring depth / occlusion-culling knobs
               (defaults 32 / 4 / 1; the same CLIVE2_STREAM_* env vars
               always override, and the VPU stream kernel keeps its own
               env-only defaults)
  wave_order:  "morton" | "raster" (static wavefront order on streaming
               scenes — integrator/render.py _wave_order)
  wave_order_mid: same, for the VMEM-resident packet-kernel scenes
               (pallas/wide paths; default raster)

The AOT executable cache folds this file's content into its key
(utils/aot.py), so a tuning flip can never serve a stale binary.
"""

from __future__ import annotations

import json
import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_PATH = os.path.join(_REPO_ROOT, "output", "tuned.json")


def tuned_path() -> str:
    return os.environ.get("CLIVE2_TUNED_PATH", DEFAULT_PATH)


def _enabled() -> bool:
    return os.environ.get("CLIVE2_TUNED", "1") != "0"


def read_tuned() -> dict:
    if not _enabled():
        return {}
    try:
        with open(tuned_path()) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def tuned_default(key: str, fallback: str) -> str:
    """The tuned value for ``key``, or ``fallback`` — callers pass the
    env knob's value first and only consult this when it is unset."""
    return str(read_tuned().get(key, fallback))


def tuned_fingerprint() -> str:
    """Raw file content (or absence marker) for cache keys."""
    if not _enabled():
        return "<tuned-disabled>"
    try:
        with open(tuned_path()) as f:
            return f.read()
    except OSError:
        return "<no-tuned-file>"


def write_tuned(updates: dict) -> str:
    """Merge ``updates`` into the tuned file (validation session only)."""
    path = tuned_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        pass
    data.update(updates)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path
