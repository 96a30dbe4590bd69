"""End-to-end SimJEB-shaped workload (solver_example.ipynb cells 3-11).

VERDICT r3 item 7: the full chain — .vtu load, h5 sample load, RBE2
constraints, packed PCG, nodal von Mises, shared-face equilibrium check,
and the notebook's residual-sum acceptance metric — as one runnable
artifact, on a tiny bundled mesh, CPU-only.
"""
import numpy as np

from tpufem.workloads import run_simjeb_workload, synthesize_simjeb_bundle


def test_simjeb_workload_end_to_end(tmp_path):
    paths = synthesize_simjeb_bundle(str(tmp_path), n=3, interpret=True)
    # cold start so the PCG actually iterates (the notebook warm-starts at
    # the stored outputs, which on this synthetic bundle IS the solution)
    m = run_simjeb_workload(paths["mesh"], paths["h5"], interpret=True,
                            warm_start=False, tol=1e-8,
                            out_path=str(tmp_path / "result.vtu"),
                            verbose=False)
    assert m["status"] in (1, 2)
    assert m["iterations"] > 0
    # the acceptance metric: our solve must reproduce the target forces at
    # least as well as the stored ground truth, and be far below the
    # zero-displacement anchor
    assert m["residual_solve"] <= 1.5 * m["residual_truth"] + \
        1e-6 * m["residual_zero"]
    assert m["residual_solve"] < 1e-3 * m["residual_zero"]
    # equilibrium: a stress-jump indicator — vanishes only with
    # refinement (measured: mean 0.299 at n=3 -> 0.210 at n=5 for c3d4);
    # the max sits at the load-introduction corners
    assert m["equilibrium"] < 1.0
    assert m["equilibrium_mean"] < 0.35
    assert m["vm_max"] > 0
    # the result file is itself a readable .vtu
    from tpufem.io import vtk
    pts, blocks = vtk.read_vtu(str(tmp_path / "result.vtu"))
    assert pts.shape[0] > 0 and "c3d4" in blocks


def test_simjeb_workload_second_order(tmp_path):
    paths = synthesize_simjeb_bundle(str(tmp_path), n=2, interpret=True,
                                     etype="c3d10")
    m = run_simjeb_workload(paths["mesh"], paths["h5"], interpret=True,
                            verbose=False)
    assert m["status"] in (1, 2)
    assert m["residual_solve"] < 1e-3 * m["residual_zero"]
