"""Benchmark: matrix-free SpMV / assembly / PCG throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Primary metric: matrix-free SpMV throughput in element-nnz/s on the
flagship c3d10 workload (nnz = M * d^2 multiply-adds actually performed —
the reference's hottest path, solver/element.py:429-464), through the
packed-layout clustered operator (ops/packed.py — dense [rows, 384] tiles,
Pallas lane-gather kernels).  vs_baseline is measured against a torch-CPU
implementation of the reference's own gather/bmm/index_add pipeline (the
reference publishes no numbers, BASELINE.md); extras.roofline_fraction is
the honesty metric: achieved bytes/s over the measured 897 GB/s HBM bound
for the minimal traffic the operator must move.

Timing notes for the axon-tunneled TPU backend:
* ``block_until_ready`` does NOT synchronize — every timed program returns
  a scalar that is read back to host (forces completion).
* There is a constant multi-ms tunnel round-trip per call; loop kernels are
  timed at two iteration counts and differenced (slope method) so the
  constant cancels.
* The slope is SELF-CHECKING (BENCH_r02 regression: one jittery run made
  t_hi <= t_lo and reported a nonsense 7.5e16 nnz/s): a measurement is
  accepted only when the long-loop time clearly exceeds the short-loop
  time; otherwise the separation is widened and remeasured, with a
  conservative t_hi/hi upper-bound fallback.
* The SpMV loop renormalizes the vector every iteration (rsqrt of the
  mean square) so iterates stay finite for any K scaling.
* Operators/plans are passed as pytree ARGUMENTS, never closed over.

BENCH_SCALE=1 adds the north-star configuration (>=5M-element c3d10 PCG on
one chip; ~8 min of host plan build + compile) to extras.scale.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _min_time(fn, args, reps: int = 5) -> float:
    """Min wall time — tunnel jitter is one-sided (hiccups only add)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(min(ts))


def _slope(make, args, lo: int = 5, hi: int = 105, reps: int = 5,
           tries: int = 3) -> float:
    """Per-iteration seconds from a guarded two-point loop-length slope.

    make(iters) must return a jitted callable whose wall time is
    (constant overhead) + iters * t.  Accepts the slope only when the
    signal is well above jitter (t_hi >= 1.25 * t_lo); otherwise widens
    the separation.  Falls back to t_hi / hi — an upper bound on t (it
    still contains the constant), never a silent zero.
    """
    f_lo = make(lo)
    float(f_lo(*args))          # compile + warm
    t_lo = _min_time(f_lo, args, reps)
    for _ in range(tries):
        f_hi = make(hi)
        float(f_hi(*args))
        t_hi = _min_time(f_hi, args, reps)
        if t_hi >= 1.25 * t_lo:
            return (t_hi - t_lo) / (hi - lo)
        print(f"bench: weak slope signal (lo={lo}:{t_lo * 1e3:.2f} ms, "
              f"hi={hi}:{t_hi * 1e3:.2f} ms); widening", file=sys.stderr)
        hi *= 3
    return max(t_hi / (hi // 3), 1e-12)


def _spmv_loop(_d):
    import jax
    import jax.numpy as jnp

    def make(iters):
        @jax.jit
        def f(opx, u):
            def body(i, v):
                y = opx(v)
                return y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-30)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, u))
        return f
    return make


def _cinc_bytes(meta) -> int:
    """HBM bytes of the per-bucket byte-packed incidence tables."""
    return sum(n * -(-sum(meta.cv_widths[gi]) // 4) * 128 * 4
               for gi, (_, n, _) in enumerate(meta.c_groups))


def _min_bytes(op) -> int:
    """Minimal HBM bytes one packed-operator apply must move (geometry
    stream + window-gathered X rows + Yc twice + F out + int streams) —
    the denominator of the roofline honesty metric."""
    m = op.plan.meta
    if op.flags.fuse:      # cluster-major geometry [B, qJ*9, E_c]/[B, q, E_c]
        qJ, q = op.Jinv.shape[1] // 9, op.W.shape[1]
    else:
        qJ, q = op.Jinv.shape[0], op.W.shape[0]
    cw = sum(nn * wk for (_, nn, wk) in m.c_groups)  # bucketed window rows
    bw = sum(nn * wk for (_, nn, wk) in m.b_groups)
    return (m.n_clusters * m.elems_per_cluster * (qJ * 9 + q) * 4
            + (cw + 2 * m.n_clusters) * 1536
            + (bw + m.n_blocks) * 1536
            + sum(nn * -(-wk // 4) for (_, nn, wk) in m.b_groups)
            * 512                     # slotidx byte-packed int32 stream
            + _cinc_bytes(m))                  # packed incidence stream


# fingerprint of every build default the cached plan/geometry depend on —
# a default change invalidates the cache instead of silently benchmarking
# a stale configuration (ADVICE r4)
_SCALE_FP = {"version": 1, "etype": "c3d10", "elems_per_cluster": 32,
             "window_buckets": 8, "fuse": "dense", "dtype": "float32"}


def _scale_block(ns: int, full: bool) -> dict:
    """North-star scale measurements on box_tet10(ns): SpMV slope, a
    CONVERGED block-Jacobi PCG solve (tol 1e-6 relative), and (full=True)
    the fixed-iteration PCG throughput slope."""
    import jax
    import jax.numpy as jnp
    from tpufem.ops.packed import (PackedPlan, PackedPartialOperator,
                                   PackedSystem)
    from tpufem.utils import meshgen

    cache_root = os.environ.get(
        "TPUFEM_BENCH_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache"))
    cdir = os.path.join(cache_root, f"tet10_n{ns}")
    want = dict(_SCALE_FP, n=ns)
    plan, geom, plan_cached = None, None, False
    t0 = time.time()
    if os.path.isdir(os.path.join(cdir, "plan")):
        try:
            with open(os.path.join(cdir, "meta.json")) as f:
                have = json.load(f)
        except Exception:
            have = None
        if have != want:
            print(f"bench: cache fingerprint mismatch ({have} != {want}); "
                  "rebuilding", file=sys.stderr)
        else:
            try:
                sc = np.load(os.path.join(cdir, "coords.npy"))
                scn = np.load(os.path.join(cdir, "conn.npy"))
                plan = PackedPlan.load(os.path.join(cdir, "plan"))
                gJ = os.path.join(cdir, "geomJ.npy")
                gW = os.path.join(cdir, "geomW.npy")
                if os.path.exists(gJ) and os.path.exists(gW):
                    geom = (np.load(gJ), np.load(gW))
                plan_cached = True
            except Exception as e:
                print(f"bench: plan cache load failed ({e}); rebuilding",
                      file=sys.stderr)
                plan, geom = None, None
    t_load = time.time() - t0
    t_mesh = t_plan = 0.0
    if plan is None:
        t0 = time.time()
        sc, scn = meshgen.box_tet10(ns, ns, ns)
        t_mesh = time.time() - t0
        t0 = time.time()
        plan = PackedPlan.build(sc, scn, sc.shape[0])
        t_plan = time.time() - t0
        try:
            os.makedirs(cdir, exist_ok=True)
            np.save(os.path.join(cdir, "coords.npy"), sc)
            np.save(os.path.join(cdir, "conn.npy"), scn)
            plan.save(os.path.join(cdir, "plan"))
            with open(os.path.join(cdir, "meta.json"), "w") as f:
                json.dump(want, f)
        except Exception as e:
            print(f"bench: plan cache save failed ({e})", file=sys.stderr)
    sN = sc.shape[0]
    sM, sk = scn.shape
    t0 = time.time()
    try:
        sop = PackedPartialOperator.build(sc, scn, "c3d10", 200e9, 0.3,
                                          n_nodes=sN, plan=plan,
                                          geometry=geom)
    except ValueError as e:
        # e.g. cache written under another fuse layout: rebuild geometry
        print(f"bench: cached geometry rejected ({e}); rebuilding",
              file=sys.stderr)
        geom = None
        sop = PackedPartialOperator.build(sc, scn, "c3d10", 200e9, 0.3,
                                          n_nodes=sN, plan=plan)
    t_op = time.time() - t0
    if geom is None:
        try:    # cold path only: device->host readback of the geometry
            np.save(os.path.join(cdir, "geomJ.npy"), np.asarray(sop.Jinv))
            np.save(os.path.join(cdir, "geomW.npy"), np.asarray(sop.W))
        except Exception as e:
            print(f"bench: geometry cache save failed ({e})", file=sys.stderr)

    sX = jnp.asarray(sop.plan.pack_np(
        np.random.default_rng(0).standard_normal((sN, 3)).astype(np.float32)))
    st = _slope(_spmv_loop(3 * sk), (sop, sX), lo=2, hi=6, reps=2)

    out = {
        "elements": sM, "nodes": sN,
        "spmv_nnz_per_s": sM * (3 * sk) ** 2 / st,
        "spmv_seconds": st,
        "roofline_fraction": (_min_bytes(sop) / st) / 897e9,
        "mesh_seconds": t_mesh,
        "cache_load_seconds": t_load,
        "plan_build_seconds": t_plan,
        "op_build_seconds": t_op,
        "plan_cached": plan_cached,
    }

    # ---- PCG throughput + the converged north-star solve --------------
    fixed = meshgen.boundary_nodes(sc, 2, 0.0)
    sb_f = np.zeros((sN, 3), np.float32)
    sb_f[meshgen.boundary_nodes(sc, 2, 1.0), 2] = -1e3
    precond = os.environ.get("BENCH_SOLVE_PRECOND", "jacobi")
    ssys = PackedSystem(sop, fixed_nodes=fixed, precondition=precond)

    if full:
        def make_s_pcg(iters):
            def run(_marker):
                _, info = ssys.solve(sb_f, tol=0.0, max_iter=iters)
                assert int(info.iterations) == iters, "PCG exited early"
                return info.residual_norm
            return run

        s_cg = _slope(make_s_pcg, ((),), lo=3, hi=13, reps=2)
        out["cg_iters_per_s"] = 1.0 / s_cg

    # CONVERGED solve (BASELINE.md acceptance bar) in a SUBPROCESS:
    # the refinement's f64 outer loop needs x64, which must not leak
    # into this process's f32 throughput programs; isolation also
    # keeps a worker hiccup in the long solve from killing the bench.
    # Measured at 5.14M (PERFORMANCE.md round 5): plain f32 PCG breaks
    # down at the ~2e-3 kappa*eps_f32 envelope, so the converged solve
    # IS the mixed-precision refined solve with an f64 TRUE residual.
    if os.environ.get("BENCH_SOLVE", "1") != "0":
        import subprocess
        tol_rel = os.environ.get("BENCH_SOLVE_TOL", "1e-6")
        script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "solve_scale.py")
        try:
            pr = subprocess.run(
                [sys.executable, script, str(ns), precond, tol_rel],
                capture_output=True, text=True,
                timeout=int(os.environ.get("BENCH_SOLVE_TIMEOUT", "3600")))
            line = [ln for ln in pr.stdout.splitlines()
                    if ln.startswith("{")][-1]
            sj = json.loads(line)
            for key in ("solve_seconds", "iterations", "cycles",
                        "rel_residual", "converged", "tip_uz_mean",
                        "iters_per_s", "outer_history_rel"):
                out[key] = sj.get(key)
            out["solve_tol_rel"] = float(tol_rel)
            out["solve_precondition"] = precond
            out["solve_mode"] = "mixed-precision refinement (f64 true residual)"
        except Exception as e:
            print(f"bench: converged-solve subprocess failed ({e})",
                  file=sys.stderr)
            out["converged"] = False
            out["solve_error"] = str(e)
    return out


def main():
    import jax
    import jax.numpy as jnp

    import tpufem
    from tpufem.ops.assembly import assemble_bsr, build_bsr_structure
    from tpufem.ops.clustered import ClusteredOperator
    from tpufem.ops.packed import PackedPartialOperator, PackedSystem
    from tpufem.utils import meshgen

    n = int(os.environ.get("BENCH_N", "24"))  # 6*n^3 c3d10 elements
    coords, conn = meshgen.box_tet10(n, n, n)
    N, (M, k) = coords.shape[0], conn.shape
    d = 3 * k
    coords_j = jnp.asarray(coords, jnp.float32)
    conn_j = jnp.asarray(conn)
    nnz = M * d * d
    make_spmv = _spmv_loop(d)

    # --- assembly throughput (slope over repeat count) ------------------
    def make_assemble(reps):
        @jax.jit
        def f(c, cj):
            def body(i, acc):
                K = tpufem.solid.stiffness(c * (1.0 + 1e-7 * i), cj, "c3d10",
                                           200e9, 0.3)
                return acc + jnp.sum(K[:, 0, 0])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return f

    t_asm = _slope(make_assemble, (coords_j, conn_j), lo=1, hi=4)
    elems_per_s = M / t_asm

    # --- headline: packed-layout partial-assembly operator --------------
    op = PackedPartialOperator.build(coords_j, conn, "c3d10", 200e9, 0.3,
                                     n_nodes=N)
    u0 = np.random.default_rng(0).standard_normal((N, 3)).astype(np.float32)
    X0 = jnp.asarray(op.plan.pack_np(u0))
    t_spmv = _slope(make_spmv, (op, X0), lo=5, hi=105)
    nnz_per_s = nnz / t_spmv
    roofline_fraction = (_min_bytes(op) / t_spmv) / 897e9

    # --- packed PCG iterations/s ----------------------------------------
    fixed = meshgen.boundary_nodes(coords, 2, 0.0)
    sys_ = PackedSystem(op, fixed_nodes=fixed)
    b = np.zeros((N, 3), np.float32)
    b[meshgen.boundary_nodes(coords, 2, 1.0), 2] = -1e3

    def make_pcg(iters):
        def run(_marker):
            _, info = sys_.solve(b, tol=0.0, max_iter=iters)
            assert int(info.iterations) == iters, "PCG exited early"
            return info.residual_norm
        return run

    t_cg = _slope(make_pcg, ((),), lo=10, hi=110, reps=3)
    cg_iters_per_s = 1.0 / t_cg

    # --- round-1 clustered operator (continuity) + BSR SpMV -------------
    K = jax.jit(lambda c, cj: tpufem.solid.stiffness(
        c, cj, "c3d10", 200e9, 0.3))(coords_j, conn_j)
    opc = ClusteredOperator.build(K, conn, N, 3, elems_per_cluster=32)
    uc = jnp.asarray(u0)
    clustered_nnz_per_s = nnz / _slope(make_spmv, (opc, uc), lo=5, hi=35)

    struct = build_bsr_structure(conn, N, 3)
    A = assemble_bsr(K, k, struct)
    t_bsr = _slope(make_spmv, (A, uc), lo=5, hi=35)
    bsr_nnz_per_s = struct.nnz / t_bsr

    # --- torch-CPU baseline (reference pipeline, small workload) -------
    vs_baseline = None
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 1)
        Ms = min(M, 20000)
        Kt = torch.from_numpy(np.asarray(K[:Ms], np.float32).copy())
        conn_t = torch.from_numpy(conn[:Ms].astype(np.int64))
        ut = torch.randn(N, 3)
        dofs = (conn_t.unsqueeze(-1) * 3 +
                torch.arange(3).view(1, 1, 3)).view(Ms, -1)

        def torch_spmv():
            u_local = ut.reshape(-1)[dofs]
            F_local = torch.bmm(Kt, u_local.unsqueeze(-1)).squeeze(-1)
            F = torch.zeros(N * 3)
            F.index_add_(0, dofs.reshape(-1), F_local.reshape(-1))
            return F

        torch_spmv()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            torch_spmv()
        t_torch = (time.perf_counter() - t0) / reps
        vs_baseline = nnz_per_s / (Ms * d * d / t_torch)
    except Exception:
        vs_baseline = None

    extras = {
        "elements": M,
        "nodes": N,
        "element_type": "c3d10",
        "operator": "packed(E_c=32, lane-gather Pallas, bucketed cinc)",
        "assembly_elements_per_s": elems_per_s,
        "cg_iters_per_s": cg_iters_per_s,
        "spmv_seconds": t_spmv,
        "roofline_fraction": roofline_fraction,
        "clustered_nnz_per_s": clustered_nnz_per_s,
        "bsr_assembled_nnz_per_s": bsr_nnz_per_s,
        "bsr_nnz": struct.nnz,
        "backend": jax.default_backend(),
        "baseline": "torch-cpu reference gather/bmm/index_add pipeline",
    }

    # --- north-star scale configurations (default ON; BENCH_SCALE=0 to
    # skip).  The host-side PackedPlan + geometry are cached on disk
    # (fingerprinted by the build parameters) so the scale numbers land
    # in every driver-captured bench run.  Timer scopes are split
    # honestly (the BENCH_r04 "plan_build_seconds=188.9 with cached=true"
    # was a device->host coords readback inside the operator build, since
    # removed — see PERFORMANCE.md "tunnel readback"):
    #   cache_load_seconds = disk -> host arrays
    #   op_build_seconds   = host arrays -> operator pytree (lazy device
    #                        transfers NOT included; they complete inside
    #                        the first timed apply's warmup)
    if os.environ.get("BENCH_SCALE", "1") != "0":
        ns = int(os.environ.get("BENCH_SCALE_N", "95"))
        extras["scale"] = _scale_block(ns, full=True)
        if os.environ.get("BENCH_SCALE10", "1") != "0":
            ns10 = int(os.environ.get("BENCH_SCALE10_N", "119"))
            extras["scale10"] = _scale_block(ns10, full=False)

    result = {
        "metric": "spmv_element_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s/chip",
        "vs_baseline": vs_baseline,
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
