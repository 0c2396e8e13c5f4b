"""Multi-process / multi-host movie orchestration (ROADMAP feature #8).

Animation frames are embarrassingly parallel (zero inter-frame
communication — reference movie.py renders them strictly serially, with a
full scene+BVH+kernel rebuild per frame).  This launcher shards frames
across K local worker processes via the movie CLI's --frame-stride /
--frame-offset flags; across HOSTS, run one launcher per host with
--hosts/--host-index and the stride factors compose.

Usage:
  python scripts/movie_launcher.py --workers 4 -- --scene dragon \
      --movie-frames 120 --samples 8
  # host 1 of 2, 4 workers each:
  python scripts/movie_launcher.py --workers 4 --hosts 2 --host-index 1 \
      -- --scene dragon --movie-frames 120
"""

import argparse
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workers", type=int, default=1,
                        help="local worker processes")
    parser.add_argument("--hosts", type=int, default=1,
                        help="total hosts sharding this movie")
    parser.add_argument("--host-index", type=int, default=0)
    parser.add_argument("movie_args", nargs=argparse.REMAINDER,
                        help="arguments forwarded to clive2_tpu.apps.movie "
                        "(prefix with --)")
    args = parser.parse_args()
    fwd = [a for a in args.movie_args if a != "--"]

    stride = args.workers * args.hosts
    procs = []
    for w in range(args.workers):
        offset = args.host_index * args.workers + w
        cmd = [
            sys.executable, "-m", "clive2_tpu.apps.movie",
            "--frame-stride", str(stride),
            "--frame-offset", str(offset),
        ] + fwd
        print("launch:", " ".join(cmd), flush=True)
        procs.append(subprocess.Popen(cmd))

    rc = 0
    for p in procs:
        rc = max(rc, p.wait())
    sys.exit(rc)


if __name__ == "__main__":
    main()
