#!/usr/bin/env python
"""Stress/maze config breakdown probe (TPU): where do the 30 ms go?

Reuses the exact bench_stress / bench_maze scene construction
(benchmarks/configs.py) but sweeps the two structural knobs — DoF blur
on/off and reflection depth — so the 720p stress budget splits into
blur + bounce waves + primary wave.  The flagship probe ladder prices
per-step op classes; this prices the CONFIG-level stages the stress
gates (>= 45 fps, r3 VERDICT) depend on.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/stress_probe.py \
           [--scene stress|maze] [--frames N] [--reflects 2 1 0] [--blur 1 0]
Prints one JSON line per (reflect, blur) cell.  Not a driver contract.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="stress", choices=["stress", "maze"])
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--reflects", type=int, nargs="+", default=[2, 1, 0])
    ap.add_argument("--blur", type=int, nargs="+", default=[1, 0])
    args = ap.parse_args()

    from benchmarks.configs import _std_render, _time_frames

    if args.scene == "stress":
        from pwnfps_tpu.world.procgen import make_portal_chain
        lv = make_portal_chain(10)
        mk = lambda refl, blur: _std_render(
            lv, 1280, 720, None, reflect=refl, blur=blur,
            cam_at=(1.5, 0.5, 1.5), look=1.5707964)
    else:
        # the paged maze rides render_frame_paged via its own bench fn;
        # reuse bench_maze wholesale at its default knobs only
        from benchmarks.configs import bench_maze
        print(json.dumps({"scene": "maze", **bench_maze()}))
        return 0

    # Interleave the cells round-robin across reps: the relay's
    # multi-ms dispatch drift (docs/PERFORMANCE.md header) confounds
    # sequentially-timed cells (a first attempt measured blur=0 SLOWER
    # than blur=1 on the same scene), but it moves slowly, so sampling
    # the cells in rotation puts the same drift in every cell.
    import time

    import numpy as np

    cells = [(refl, blur) for blur in args.blur for refl in args.reflects]
    renders = {c: mk(*c) for c in cells}
    for c in cells:  # compile + warm
        np.asarray(renders[c](0)[0, 0])
    ts = {c: [] for c in cells}
    for k in range(args.frames):
        for c in cells:
            t0 = time.perf_counter()
            fb = renders[c](k + 1)
            np.asarray(fb[0, 0])
            ts[c].append(time.perf_counter() - t0)
    for c in cells:
        a = np.array(ts[c]) * 1e3
        out = dict(scene=args.scene, reflect=c[0], blur=c[1],
                   ms_mean=float(a.mean()), ms_p50=float(np.percentile(a, 50)),
                   ms_min=float(a.min()), fps=float(1e3 / a.mean()))
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
