"""Profiling + checkpoint utilities."""
import numpy as np
import jax.numpy as jnp

from tpufem.utils import checkpoint as ckpt
from tpufem.utils.profiling import Roofline, timed


def test_roofline_report():
    r = Roofline(seconds=0.001, flops=2e9, bytes_moved=1e9, items=1e6)
    assert abs(r.gflops - 2000) < 1e-6
    assert abs(r.gbps - 1000) < 1e-6
    assert "GFLOP/s" in r.report("x")


def test_timed_runs():
    f = lambda x: jnp.sum(x * 2)
    t = timed(f, jnp.ones(1000), reps=2)
    assert t >= 0


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "state")
    ckpt.save_state(p, {"u": jnp.ones((4, 3)), "iterations": np.asarray(7)})
    s = ckpt.load_state(p)
    assert s is not None
    np.testing.assert_allclose(np.asarray(s["u"]), 1.0)
    assert int(np.asarray(s["iterations"])) == 7
    assert ckpt.load_state(str(tmp_path / "missing")) is None


def test_checkpointed_cg_resumes(tmp_path):
    from tpufem.elements import solid
    from tpufem.ops.operator import MatrixFreeOperator
    from tpufem.ops.scatter import ScatterPlan
    from tpufem.solvers.constraints import Constraints
    from tpufem.utils import meshgen

    coords, conn = meshgen.box_tet(2, 2, 2)
    N = coords.shape[0]
    K = solid.stiffness(jnp.asarray(coords), jnp.asarray(conn), "c3d4",
                        200.0, 0.3)
    op = MatrixFreeOperator(K=K, plan=ScatterPlan.build(conn, N, 3))
    cons = Constraints.fixed(N, meshgen.boundary_nodes(coords, 2, 0.0), 3)
    b = np.zeros((N, 3))
    b[meshgen.boundary_nodes(coords, 2, 1.0), 0] = 0.01
    path = str(tmp_path / "cgstate")
    u1, info1, done1 = ckpt.checkpointed_cg(
        op, jnp.asarray(b), path, every=10, total_iter=20,
        constraints=cons, tol=1e-14)
    assert done1 <= 20
    # resume continues from saved state
    u2, info2, done2 = ckpt.checkpointed_cg(
        op, jnp.asarray(b), path, every=50, total_iter=500,
        constraints=cons, tol=1e-12)
    assert done2 > done1 or int(info1.status) == 1
    from tpufem.solvers.cg import cg
    u_ref, _ = cg(op, jnp.asarray(b), constraints=cons, tol=1e-12,
                  max_iter=600)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref), rtol=1e-5,
                               atol=1e-10)
