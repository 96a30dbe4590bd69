"""Rebuild .bench_cache for the scale bench entirely on the host.

The driver environment can start with an empty .bench_cache (it is
gitignored and the VM may be reset between sessions).  A cold bench then
pays the worst possible path: plan build AND a device->host geometry
readback through the axon tunnel (~1 MB/s — hundreds of seconds at
north-star scale, PERFORMANCE.md "tunnel readback").  This script
prebuilds mesh + PackedPlan + geometry (Jinv/W, f32, dense fuse layout)
on the CPU backend — no TPU, no readback — and writes exactly the cache
layout + fingerprint bench.py expects, so the driver's bench runs warm.

Usage: python scripts/warm_cache.py [ns ...]   (default: 95 119)
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _SCALE_FP  # the cache fingerprint bench.py validates


def warm(ns: int) -> None:
    from tpufem.ops.packed import PackedPlan, PackedPartialOperator
    from tpufem.utils import meshgen

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    cdir = os.path.join(root, f"tet10_n{ns}")
    meta_p = os.path.join(cdir, "meta.json")
    want = dict(_SCALE_FP, n=ns)
    if os.path.isdir(os.path.join(cdir, "plan")) and os.path.exists(meta_p):
        try:
            with open(meta_p) as f:
                have = json.load(f)
        except Exception:
            have = None
        if have == want and os.path.exists(os.path.join(cdir, "geomJ.npy")):
            print(f"warm_cache: n={ns} already warm", flush=True)
            return
    os.makedirs(cdir, exist_ok=True)
    t0 = time.time()
    sc, scn = meshgen.box_tet10(ns, ns, ns)
    print(f"warm_cache: n={ns} mesh {sc.shape[0]} nodes / {scn.shape[0]} "
          f"elements in {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    plan = PackedPlan.build(sc, scn, sc.shape[0])
    print(f"warm_cache: plan build {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    op = PackedPartialOperator.build(sc, scn, "c3d10", 200e9, 0.3,
                                     n_nodes=sc.shape[0], plan=plan)
    print(f"warm_cache: geometry {time.time() - t0:.1f} s "
          f"(Jinv {op.Jinv.shape}, W {op.W.shape})", flush=True)
    t0 = time.time()
    np.save(os.path.join(cdir, "coords.npy"), sc)
    np.save(os.path.join(cdir, "conn.npy"), scn)
    plan.save(os.path.join(cdir, "plan"))
    np.save(os.path.join(cdir, "geomJ.npy"), np.asarray(op.Jinv))
    np.save(os.path.join(cdir, "geomW.npy"), np.asarray(op.W))
    with open(meta_p, "w") as f:
        json.dump(want, f)
    print(f"warm_cache: n={ns} saved in {time.time() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [95, 119]
    for ns in sizes:
        warm(ns)
