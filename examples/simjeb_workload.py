"""The reference's end-to-end SimJEB workload (solver_example.ipynb 3-11).

Load mesh (.vtu/.vtk) + h5 sample -> RBE2-constrained packed PCG ->
residual-sum acceptance -> nodal von Mises -> shared-face equilibrium.

    python examples/simjeb_workload.py                 # synthetic bundle
    python examples/simjeb_workload.py mesh.vtu sample_0.h5

With no arguments a SimJEB-shaped bundle (XML .vtu mesh + h5 sample with
forces/rbe2/rbe3/outputs datasets) is synthesized first, so the whole
pipeline — including the io layer — runs self-contained.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpufem.workloads import run_simjeb_workload, synthesize_simjeb_bundle


def main():
    if len(sys.argv) >= 3:
        mesh_path, h5_path = sys.argv[1], sys.argv[2]
    else:
        out_dir = os.path.join(tempfile.gettempdir(), "tpufem_simjeb")
        print("no data paths given - synthesizing a SimJEB-shaped bundle")
        t0 = time.time()
        paths = synthesize_simjeb_bundle(out_dir, n=8)
        print(f"bundle at {out_dir} ({time.time() - t0:.1f} s)")
        mesh_path, h5_path = paths["mesh"], paths["h5"]

    t0 = time.time()
    metrics = run_simjeb_workload(
        mesh_path, h5_path,
        out_path=os.path.join(tempfile.gettempdir(), "simjeb_result.vtu"))
    print(f"workload wall time: {time.time() - t0:.1f} s")
    ok = metrics["residual_solve"] <= 1.05 * metrics["residual_truth"] + \
        1e-6 * metrics["residual_zero"]
    print("ACCEPTED" if ok else "NOT CONVERGED")


if __name__ == "__main__":
    main()
