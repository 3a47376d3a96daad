"""Pre-render the quality-matrix GT caches in ONE warm process.

A fresh VM has an empty /tmp: every quality_matrix unit would re-render
its scene's 24 GT views on chip (~1-2 min each through the tunnel)
INSIDE its own unit deadline.  This script renders every requested
(scene, seed) cache up front in a single process — one compile of the
GT render HLO, reused across all scenes — so the qm units just load.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/tpu_gt_prep.py --scenes textured,humanoid,tangle:101
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo/scripts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="textured",
                    help="comma list; 'tangle' takes a ':seed' suffix")
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--views", type=int, default=20)
    args = ap.parse_args()

    import jax

    from quality_matrix import load_or_render_gt

    print("devices:", jax.devices(), flush=True)
    for item in args.scenes.split(","):
        scene, _, seed = item.partition(":")
        t0 = time.time()
        load_or_render_gt(args.height, args.height, args.views,
                          scene=scene, seed=int(seed or 0))
        print(f"[gtprep] {item}: ready in {time.time() - t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
