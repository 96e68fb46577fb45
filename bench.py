"""Benchmark: per-V-cycle latency of the flagship 8x8 p=5 Poisson multigrid.

Prints ONE JSON line:
    {"metric": "v_cycle_ms", "value": ..., "unit": "ms", "vs_baseline": ...}

``vs_baseline`` is measured against the BASELINE.json north-star target of
1 ms per V-cycle on one TPU chip (>1.0 means faster than target).  The run
first verifies correctness (the f64 reference solve converges to the 1e-6
paramfile tolerance and the benchmarked configuration reaches the same
solution), then times the fast path: float32 operators, red-black colored
block-GS smoothers, the whole V-cycle as one jitted graph, amortized over a
lax.scan of cycles so the number is pure device time.
"""

import argparse
import atexit
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _stage(msg):
    """Progress marker on stderr: the JSON artifact is a single stdout
    line printed at the very end, so long runs (remote Mosaic compiles
    are minutes each) are otherwise unobservable."""
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


class Budget:
    """Wall-clock budget + indestructible JSON emission.

    Round 3 lost every measured number because the bench printed its ONLY
    JSON line at the very end and the driver's timeout killed it
    mid-scaling-sweep (BENCH_r03.json rc=124, parsed=null).  Three layers
    of defense, so a kill at ANY point still leaves a parseable artifact:

    1. ``emit()`` prints the full accumulated result as a complete JSON
       line on stdout after EVERY stage — the driver parses the last line,
       which is always the most complete snapshot.
    2. ``fits(est_s, stage)`` checks the remaining wall-clock budget
       between stages; stages that don't fit are recorded in
       ``result["skipped"]`` instead of running into the driver's timeout.
    3. A SIGTERM/SIGINT handler + atexit hook dump the current result
       before dying, covering kills that land inside a stage.

    Mirrors the reference's always-logged per-solve timing
    (/root/reference/dgfem/solver.py:29-53): a measurement must never be
    lost to a later failure.
    """

    def __init__(self, budget_s):
        self.t0 = time.monotonic()
        self.budget_s = float(budget_s)
        self.result = {"skipped": []}
        # parent-orchestrator hook: terminate the running child stage
        # before dying, so a driver SIGTERM doesn't orphan a subprocess
        self.on_terminate = None
        # Measured stage times from earlier runs on this machine (sidecar
        # next to the compile cache, which also persists between runs):
        # the hardcoded per-stage estimates are sized for cold Mosaic
        # compiles and starve later stages once the cache is warm — a
        # recorded measurement replaces the guess.
        self._times_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".jax_cache", "bench_stage_times.json")
        try:
            with open(self._times_path) as f:
                self._stage_times = json.load(f)
        except Exception:
            self._stage_times = {}
        self._open_stage = None
        self._install()

    def _close_stage(self):
        """Record the wall time of the stage approved by the last
        ``fits`` call (stages run sequentially between ``fits`` calls)."""
        if self._open_stage is None:
            return
        stage, t0 = self._open_stage
        self._open_stage = None
        self._stage_times[stage] = round(time.monotonic() - t0, 1)
        try:
            # merge-on-write: the parent orchestrator and its stage
            # subprocesses share this sidecar, so a blind dump here would
            # clobber the fine-grained keys a child just recorded
            disk = {}
            try:
                with open(self._times_path) as f:
                    disk = json.load(f)
            except Exception:
                pass
            disk.update(self._stage_times)
            tmp = self._times_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(disk, f)
            os.replace(tmp, self._times_path)
        except Exception:  # pragma: no cover — cache dir unwritable
            pass

    def cancel_stage(self):
        """Drop the open stage without recording its wall time — used when
        a stage is killed at its hard cap, where the elapsed time reflects
        the bound rather than the stage's real cost (recording it would
        inflate the next run's estimate and force a skip)."""
        self._open_stage = None

    def elapsed(self):
        return time.monotonic() - self.t0

    def remaining(self):
        return self.budget_s - self.elapsed()

    def fits(self, est_s, stage):
        """True if ``stage`` (estimated ``est_s`` seconds) fits the budget;
        records the skip otherwise.  A wall time measured for this stage
        on a previous run (warm compile cache) overrides the estimate."""
        self._close_stage()
        prior = self._stage_times.get(stage)
        if prior is not None:
            est_s = round(prior * 1.25 + 10, 1)
        if self.remaining() >= est_s:
            self._open_stage = (stage, time.monotonic())
            return True
        self.result["skipped"].append(
            {"stage": stage, "est_s": est_s,
             "remaining_s": round(self.remaining(), 1)})
        print(f"# budget: skipping {stage} (est {est_s}s, "
              f"{self.remaining():.0f}s left)", file=sys.stderr, flush=True)
        return False

    def emit(self):
        self.result["bench_wall_s"] = round(self.elapsed(), 1)
        print(json.dumps(self.result), flush=True)

    def _install(self):
        def dump(signum, frame):  # pragma: no cover — driver-kill path
            self.result["terminated_by"] = signal.Signals(signum).name
            self.emit()
            sys.stdout.flush()
            if self.on_terminate is not None:
                try:
                    self.on_terminate()
                except Exception:
                    pass
            os._exit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, dump)
            except (ValueError, OSError):  # pragma: no cover — non-main
                pass
        atexit.register(self._atexit)

    def _atexit(self):  # pragma: no cover — exceptional-exit path
        # A normal run already printed this exact line; re-printing the
        # same snapshot is harmless.  An exception-exit run gets its
        # accumulated numbers onto stdout here.
        try:
            self._close_stage()
            self.emit()
            sys.stdout.flush()
        except Exception:
            pass


def _enable_compile_cache():
    """Persistent compilation cache: the fused Pallas kernels take minutes
    to compile through the remote-TPU tunnel; cached binaries make reruns
    start in seconds.  The JAX_COMPILATION_CACHE_DIR env var is not plumbed
    in this jax build — only jax.config.update works (verified on both the
    axon TPU plugin and the CPU backend)."""
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# TPU v5e peak HBM bandwidth (for the achieved-bandwidth figure)
PEAK_HBM_GBPS = 819.0


_TPU_PROBE = None   # process-wide memo: the tunnel state won't flip mid-run


def _probe_tpu(timeout_s=420):
    """Check that the TPU backend actually comes up, in a subprocess.

    The experimental axon remote-TPU plugin blocks inside C++ backend
    initialization for ~5 minutes and then aborts when the tunnel is down
    (measured in round 3), which would take the whole bench process with
    it before any JSON is printed.  A subprocess is killable where the
    in-process wait is not; on timeout or failure the caller falls back
    to the CPU backend so the driver always gets its artifact.

    The subprocess (a full extra backend bring-up) is paid only when the
    remote plugin is actually first in the platform order; plain-CPU and
    local-TPU machines initialize safely in-process, so they skip it.
    The result is memoized so entry()/bench can both call this freely.
    """
    global _TPU_PROBE
    if _TPU_PROBE is None:
        import jax
        platforms = str(jax.config.jax_platforms or "")
        if platforms.startswith("axon"):
            from dgtpu.utils.device import backend_reachable
            _TPU_PROBE = backend_reachable(timeout_s, require="tpu")
        else:
            _TPU_PROBE = any(d.platform == "tpu" for d in jax.devices())
    return _TPU_PROBE


def _stencil_bytes_per_cycle(mg, dims):
    """Analytic HBM-traffic model for one V-cycle of the XLA packed path.

    Per level: each red-black HALF-sweep reads one color's packed
    off-diagonal blocks (4 slots) + diag inverses (~2.5 N B^2 values);
    one symmetric iteration = 4 half-sweeps (forward red+black, backward
    black+red — ops/smoothers.py _gs_sweep_colored with n_pass=2), the
    residual matvec reads the full 5-slot stencil (5 N B^2), transfers
    are negligible.  Round-4's model counted only 2 half-sweeps per
    iteration, understating streamed-path traffic (and so utilization)
    2x.  Fused kernels get their exact per-launch operand read from the
    builder instead (hbm_bytes_per_invocation) — for them the hierarchy
    is VMEM-resident and HBM sees each operand once per cycle.
    """
    total = 0.0
    for k, op in enumerate(mg.ops):
        n, _, br, bc = op.blocks.shape
        itemsize = op.blocks.dtype.itemsize
        if k == 0 and mg.coarse_inv is not None:
            total += mg.coarse_inv.size * mg.coarse_inv.dtype.itemsize
            continue
        t = mg.types[k - 1]
        pre, post = mg._smoother_cfg[t]
        half_sweeps = 4 * (pre.iterations + post.iterations)
        total += half_sweeps * 2.5 * n * br * bc * itemsize
        total += 5 * n * br * bc * itemsize                # residual matvec
    return total


def time_per_iter(many, rhs, u0, reps, scale=8):
    """Marginal per-iteration device time via a two-point slope fit.

    ``many(rhs, u, k)`` runs k iterations under one dispatch.  Through the
    remote-TPU tunnel a single dispatch carries a large FIXED overhead
    (~30 ms measured: RPC round-trip + remote dispatch), so total/k
    overstates small kernels by fixed/k — the round-1 flagship read
    0.19 ms/cycle when the true device time is 0.04 ms.  Timing k and
    scale*k iterations and taking the slope cancels the fixed term.
    Completion is forced with a device-to-host scalar read
    (block_until_ready alone proved unreliable through the tunnel), and
    each timed call perturbs u0 so no two calls carry identical buffers.

    Returns (per_iter_ms, fixed_ms).
    """
    import jax.numpy as jnp

    k1, k2 = reps, reps * scale

    def run(k, i):
        u = u0 + jnp.asarray(i * 1e-30, u0.dtype)
        t0 = time.perf_counter()
        float(many(rhs, u, k)[(0,) * many_out_ndim])
        return time.perf_counter() - t0

    many_out_ndim = jnp.ndim(many(rhs, u0, 1))
    for k in (k1, k2):   # compile + warm both shapes
        run(k, 0)
    t1 = min(run(k1, i) for i in (1, 2, 3))
    t2 = min(run(k2, i) for i in (4, 5, 6))
    per = (t2 - t1) / (k2 - k1) * 1e3
    fixed = t1 * 1e3 - k1 * per
    return max(per, 1e-6), fixed


def _timed_dgfem(settings_fn, **kwargs):
    """Build + solve a DGFEM case twice; returns (dg, cold_s, warm_s).

    The first solve is dominated by tracing + (remote) compilation; the
    second hits the persistent compile cache, so ``warm_s`` approximates
    the steady-state solver time and ``cold_s - warm_s`` the compile cost.
    """
    from dgtpu.api import DGFEM
    dg = DGFEM(settings=settings_fn(), **kwargs)
    t0 = time.perf_counter()
    dg.solve()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    dg.solve()
    t_warm = time.perf_counter() - t0
    return dg, t_cold, t_warm


def run_baseline_configs(skip=(), budget=None, est_s=90):
    """Time all five BASELINE.md benchmark configs end to end.

    Reference behavior: solver.py:29-53 logs a wall time for every method.
    Each entry: config name, cold (compile-inclusive) and warm (steady-
    state) solve wall seconds, normalized residual, an explicit
    ``converged`` flag against the 1e-6 criterion, L2 error(s).

    ``budget`` (a Budget): each config is gated on ``est_s`` seconds of
    remaining wall clock and the accumulated artifact is re-emitted after
    every config, so a driver kill mid-config loses at most one entry.
    """
    from dgtpu.settings import Settings, load_params

    def base(filename, p_grid, p_sol, **extra):
        params = load_params()
        params["grid"]["filename"] = filename
        params["grid"]["polynomial degree"] = p_grid
        params["solution"]["u"]["polynomial degree"] = p_sol
        params["visualization"]["export"] = False
        params["visualization"]["automatically open paraview"] = False
        params["logging"]["loglevel"] = "ERROR"
        for k, v in extra.items():
            node = params
            *path, leaf = k.split("/")
            for kk in path:
                node = node[kk]
            node[leaf] = v
        return Settings(params)

    out = []

    def record(name, fn):
        if name in skip:
            return
        if budget is not None and not budget.fits(est_s, f"config:{name}"):
            return
        _stage(f"config {name}")
        try:
            dg, cold, warm = fn()
            from dgtpu.utils.norms import lp_norm
            res_n = (dg.residuals[-1] if dg.residuals
                     else dg.residual / float(lp_norm(dg.levels[-1].rhs, 2)))
            entry = {"config": name,
                     "solve_s": round(warm, 4),
                     "solve_cold_s": round(cold, 4),
                     "compile_s": round(max(cold - warm, 0.0), 4),
                     "residual_normalized": res_n,
                     "converged": bool(res_n < 1e-6),
                     "L2_error_u": dg.L2_error_u}
            for k in ("L2_error_v", "L2_error_p"):
                if hasattr(dg, k):
                    entry[k] = getattr(dg, k)
            out.append(entry)
        except Exception as e:  # pragma: no cover — report, keep benching
            print(f"# config {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out.append({"config": name, "error": f"{type(e).__name__}: {e}"})
        if budget is not None:
            budget.result["configs"] = out
            budget.emit()

    from dgtpu.geometry import generate_rectangle_grid, write_plot3d
    repo = os.path.dirname(os.path.abspath(__file__))
    for n, p in ((4, 1), (8, 2), (8, 5)):
        path = os.path.join(repo, "input", f"Rectangle_{n}X{n}_nPoly{p}.xyz")
        if not os.path.exists(path):
            write_plot3d(path, *generate_rectangle_grid(n, n, p))

    # 1. direct SIP-DG on Rectangle_4X4_nPoly1
    record("1_direct_4x4_p1", lambda: _timed_dgfem(
        lambda: base("Rectangle_4X4_nPoly1.xyz", 1, 1),
        solve_direct=True))

    # 2. element-block GS smoother solve on Rectangle_8X8_nPoly2
    def cfg2():
        s = base("Rectangle_8X8_nPoly2.xyz", 2, 2)
        s.update_setting("solver.smoother", "block_gauss_seidel")
        return s
    record("2_smoother_8x8_p2", lambda: _timed_dgfem(cfg2,
                                                     solve_smoother=True))

    # 3. p-multigrid V-cycle Poisson p=5->1 on Rectangle_8X8_nPoly5 — the
    #    flagship workload (the headline stage measures its kernel-level
    #    latency; this entry records the same end-to-end wall time as the
    #    other configs, reference solver.py:29-53 style)
    record("3_pmg_8x8_p5", lambda: _timed_dgfem(
        lambda: base("Rectangle_8X8_nPoly5.xyz", 5, 5),
        solve_multigrid=True))

    # 4. curvilinear CircleInCircle_8X8_nPoly5 multigrid (O-grid metric
    #    terms; sigma multiplier 2 — multiplier 1 leaves the curved-grid
    #    operator indefinite, the reference's own warning)
    def cfg4():
        s = base("CircleInCircle_8X8_nPoly5.xyz", 5, 5,
                 **{"grid/O grid": True, "grid/circular": True,
                    "problem/SIP penalty parameter multiplier": 2})
        return s
    record("4_curvilinear_8x8_p5_mg", lambda: _timed_dgfem(
        cfg4, solve_multigrid=True))

    # 5. Stokes MMS: distributive-GS smoother path + Schur-preconditioned
    #    GMRES (the reference's Krylov path is marked broken; re-derived)
    def stokes(method):
        def make():
            s = base("Rectangle_4X4_nPoly2.xyz", 2, 2,
                     **{"problem/type": "Stokes"})
            s.update_setting("solution.ordering", "global")
            s.update_setting("solution.p.polynomial_degree", 1)
            if method == "smoother":
                s.update_setting("solver.smoother",
                                 "distributive_gauss_seidel")
            return s
        return make
    record("5a_stokes_dgs_4x4", lambda: _timed_dgfem(
        stokes("smoother"), solve_smoother=True))
    record("5b_stokes_krylov_4x4", lambda: _timed_dgfem(
        stokes("krylov"), solve_krylov=True))

    return out


def _stokes_settings(n=8):
    """Settings for the Stokes flagship: n x n p_u=2/p_p=1 global order,
    p-coarsening (u 2->1) + geometric (n -> ... -> 2), distributive GS."""
    from dgtpu.settings import Settings, load_params
    params = load_params()
    params["problem"]["type"] = "Stokes"
    params["grid"]["filename"] = f"Rectangle_{n}X{n}_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["solution"]["u"]["polynomial degree"] = 2
    params["solution"]["p"]["polynomial degree"] = 1
    params["solution"]["ordering"] = "global"
    mgp = params["solver"]["multigrid"]
    mgp["penalty parameter coarsening"]["enabled"] = False
    mgp["polynomial coarsening"]["enabled"] = True
    mgp["polynomial coarsening"]["levels"]["u"] = "1,2"
    mgp["geometric coarsening"]["enabled"] = True
    cfs, cf = [], 2
    while n // cf >= 2:
        cfs.append(cf)
        cf *= 2
    mgp["geometric coarsening"]["coarsening factors"] = ",".join(map(str, cfs))
    for c in ("polynomial coarsening", "geometric coarsening"):
        for w in ("pre smoother", "post smoother"):
            mgp[c][w]["smoother"] = "distributive_gauss_seidel"
            mgp[c][w]["iterations"] = 2
    # W-cycles + symmetric 2/2 DGS sweeps: measured asymptotic contraction
    # 0.188/cycle vs 0.41 for the V(2 pre/1 post) baseline at 8x8 — the
    # coarse p1 subtree is under-resolved by a single visit, and its
    # revisit is cheap (p1 block ops are ~5x cheaper than the p2 level's)
    mgp["cycle type"] = "W"
    mgp["coarse grid solver"] = "direct"
    params["performance"]["dgs_splitting"] = "lsq"
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "multigrid"
    s.update_setting("solver.discretization", "dg")
    return s


def stokes_vcycle_metric(reps=100, n=8, use_pallas=True, budget=None,
                         n_inner=6):
    """Per-V-cycle latency + time-to-1e-10 of the Stokes DGS multigrid.

    n x n p_u=2/p_p=1 global-order Stokes, p-coarsening (u 2->1) + geometric
    multigrid, distributive-GS smoothing, direct coarse solve — the Stokes
    analog of the flagship Poisson metric.  Times the SoA fused Pallas
    kernel (TPU) and its identical-algorithm XLA build, then measures the
    mixed-precision (f32 cycles + emulated-f64 defect) time to a 1e-10
    normalized residual — the BASELINE parity metric.
    """
    import jax
    import jax.numpy as jnp
    from dgtpu.utils.jitting import const_jit
    from dgtpu.api import DGFEM
    from dgtpu.geometry import generate_rectangle_grid, write_plot3d
    from dgtpu.ops.pallas_stokes import SoAStokesVCycle
    from dgtpu.utils.device import setup_scope

    repo = os.path.dirname(os.path.abspath(__file__))
    gridfile = os.path.join(repo, "input", f"Rectangle_{n}X{n}_nPoly2.xyz")
    if not os.path.exists(gridfile):
        write_plot3d(gridfile, *generate_rectangle_grid(n, n, 2))
    dg = DGFEM(settings=_stokes_settings(n), solve_multigrid=True)
    _stage("stokes: hierarchy assembled")

    with setup_scope():
        sv = SoAStokesVCycle(dg.levels, dg.transfers, dg.transfer_types,
                             dg.settings, dtype=jnp.float32)
    _stage("stokes: SoA builder constructed")
    target = jax.devices()[0]
    sv.to_device(target)
    rhs64 = jax.device_put(dg.levels[-1].rhs, target)
    rhs = rhs64.astype(jnp.float32)
    u0 = jnp.zeros_like(rhs)
    op = jax.device_put(dg.levels[-1].op, target)
    out = {"grid": f"{n}x{n}_pu2_pp1",
           "n_dof": int(rhs.shape[0]),
           "levels": [list(map(int, d)) for d in sv.dims]}

    def _sync():
        if budget is not None:
            budget.result["stokes"] = out
            budget.emit()

    def time_one(one):
        u = u0
        for _ in range(5):
            u = one(rhs, u)
        r5 = float(jnp.linalg.norm(rhs - op.matvec(u))
                   / jnp.linalg.norm(rhs))
        assert r5 < 1e-2, f"Stokes fused cycle not contracting: {r5}"

        @const_jit
        def many(rhs, u, k):
            def body(_, u):
                return one(rhs, u)
            return jax.lax.fori_loop(0, k, body, u)
        ms, _ = time_per_iter(many, rhs, u0, reps)
        return ms, r5

    best_cycle = sv.build_xla()
    ms, r5 = time_one(best_cycle)
    _stage("stokes: XLA cycle timed")
    out["xla_ms"] = round(ms, 4)
    out["v_cycle_ms"] = out["xla_ms"]
    out["residual_after_5_cycles"] = r5
    out["contraction_per_cycle"] = round(r5 ** 0.2, 4)
    _sync()
    if jax.default_backend() == "tpu" and use_pallas:
        try:
            fused = sv.build()
            ms, _ = time_one(fused)
            _stage("stokes: fused kernel timed")
            out["soa_fused_ms"] = round(ms, 4)
            best_cycle = fused
        except Exception as e:  # pragma: no cover — report and fall back
            print(f"# stokes fused path failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    out["v_cycle_ms"] = min(out["xla_ms"], out.get("soa_fused_ms",
                                                   out["xla_ms"]))
    _sync()

    # time-to-1e-10 via mixed-precision refinement (BASELINE parity metric),
    # FMG-seeded (build_fmg on the fused builder)
    try:
        from dgtpu.solvers.refinement import make_refined_solver
        with setup_scope():
            # finest FMG cycle through the same cycle the refinement uses
            # (fused when available — ~6x cheaper than the XLA graph)
            fmg = sv.build_fmg(finest_cycle=best_cycle)
        refined = make_refined_solver(op, best_cycle, n_inner=n_inner,
                                      tol=1e-10, normalize="rhs")
        out["refined_n_inner"] = n_inner
        import jax as _j

        def solve_once():
            u0 = fmg(rhs).astype(rhs64.dtype)
            return _j.block_until_ready(refined(rhs64, u0))

        u_r, res_r, n_r, _ = solve_once()
        _stage("stokes: refinement compiled")
        t0 = time.perf_counter()
        u_r, res_r, n_r, _ = solve_once()
        out["time_to_1e-10_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
        out["refined_outer_iters"] = int(n_r)
        out["refined_residual"] = float(res_r)
        _sync()
        assert float(res_r) < 1e-10, float(res_r)

        # marginal per-solve device time (slope fit): cancels the fixed
        # tunnel RTT that dominates the single-dispatch number.  Its
        # chained-solve graph is the stage's largest compile (>150 s cold
        # — it ate the stage cap in the r5 shakedown run), so it is gated
        # on the child budget rather than risking everything above.
        if budget is not None and not budget.fits(240, "stokes:marginal"):
            return out
        try:
            @const_jit
            def solve_k(rhs32, u, k):
                def body(_, u):
                    u0 = fmg(rhs32).astype(rhs64.dtype) \
                        + u * jnp.asarray(1e-30, rhs64.dtype)
                    unew, _res, _n, _h = refined(rhs64, u0)
                    return unew
                return jax.lax.fori_loop(0, k, body, u)
            # reps=6 (k=6 vs 48 chained solves): at reps=2 the tunnel's
            # ~5 ms dispatch jitter mapped to a +-0.35 ms slope-noise band
            # on a ~1-3 ms signal (measured n_inner sweep spread)
            t_marg, _ = time_per_iter(solve_k, rhs,
                                      jnp.zeros_like(rhs64), 6)
            out["time_to_1e-10_marginal_ms"] = round(t_marg, 3)
            _sync()
        except Exception as e:  # pragma: no cover
            print(f"# stokes marginal refine timing failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    except AssertionError:
        raise
    except Exception as e:  # pragma: no cover
        print(f"# stokes refinement failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    return out


def stokes_streamed_metric(reps=50, n=32, budget=None):
    """Large-grid Stokes: the streamed hybrid V-cycle past fused-kernel
    VMEM residency (``ops/pallas_stokes_stream.py``) + mixed-precision
    refinement to 1e-10 — the regime where round 2 silently fell back to
    emulated-f64 full precision (VERDICT r2 item 1).

    Records the per-cycle latency of the streamed hybrid, its fused-
    subtree cut, and the measured time to a 1e-10 normalized residual.
    """
    import jax
    import jax.numpy as jnp
    from dgtpu.utils.jitting import const_jit
    from dgtpu.api import DGFEM
    from dgtpu.geometry import generate_rectangle_grid, write_plot3d
    from dgtpu.ops.pallas_stokes_stream import StreamedStokesVCycle
    from dgtpu.solvers.refinement import make_refined_solver
    from dgtpu.utils.device import setup_scope

    repo = os.path.dirname(os.path.abspath(__file__))
    gridfile = os.path.join(repo, "input", f"Rectangle_{n}X{n}_nPoly2.xyz")
    if not os.path.exists(gridfile):
        write_plot3d(gridfile, *generate_rectangle_grid(n, n, 2))
    dg = DGFEM(settings=_stokes_settings(n), solve_multigrid=True)
    with setup_scope():
        hv = StreamedStokesVCycle(dg.levels, dg.transfers,
                                  dg.transfer_types, dg.settings,
                                  dtype=jnp.float32)
    target = jax.devices()[0]
    hv.to_device(target)
    one = hv.build()
    rhs64 = jax.device_put(dg.levels[-1].rhs, target)
    rhs = rhs64.astype(jnp.float32)
    u0 = jnp.zeros_like(rhs)
    op = jax.device_put(dg.levels[-1].op, target)
    out = {"grid": f"{n}x{n}_pu2_pp1", "n_dof": int(rhs.shape[0]),
           "impl": "streamed_hybrid", "fused_subtree_levels": int(hv.cut),
           "n_levels": int(hv.n_lev)}

    def _sync():
        if budget is not None:
            budget.result["stokes_large"] = out
            budget.emit()

    u = u0
    for _ in range(5):
        u = one(rhs, u)
    r5 = float(jnp.linalg.norm(rhs - op.matvec(u)) / jnp.linalg.norm(rhs))
    out["residual_after_5_cycles"] = r5
    out["contraction_per_cycle"] = round(r5 ** 0.2, 4)
    # a diverging cycle is a bug — fail loudly; a merely slow contraction
    # (r04: rho ~0.7/cycle at 32x32, under investigation) still converges,
    # so record the measured contraction and latency instead of losing the
    # whole stage to an assert (the r04 builder run lost stokes_large this
    # way)
    assert r5 < 1.0, f"streamed Stokes cycle diverging: {r5}"

    @const_jit
    def many(rhs, u, k):
        def body(_, u):
            return one(rhs, u)
        return jax.lax.fori_loop(0, k, body, u)
    ms, _ = time_per_iter(many, rhs, u0, reps)
    out["v_cycle_ms"] = round(ms, 4)
    _sync()

    # bf16 sweep-storage variant of the velocity block-GS (defect form)
    try:
        with setup_scope():
            hv16 = StreamedStokesVCycle(dg.levels, dg.transfers,
                                        dg.transfer_types, dg.settings,
                                        dtype=jnp.float32,
                                        block_storage="bfloat16")
        hv16.to_device(target)
        one16 = hv16.build()
        u = u0
        for _ in range(5):
            u = one16(rhs, u)
        r5b = float(jnp.linalg.norm(rhs - op.matvec(u))
                    / jnp.linalg.norm(rhs))
        out["bf16_residual_after_5_cycles"] = r5b
        if r5b < 1e-2:
            @const_jit
            def many16(rhs, u, k):
                def body(_, u):
                    return one16(rhs, u)
                return jax.lax.fori_loop(0, k, body, u)
            ms16, _ = time_per_iter(many16, rhs, u0, reps)
            out["v_cycle_ms_bf16"] = round(ms16, 4)
        _sync()
    except Exception as e:  # pragma: no cover
        print(f"# stokes streamed bf16 failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # FMG-seeded mixed-precision refinement to the 1e-10 parity target.
    # Deep hierarchies can push the stand-alone cycle's asymptotic
    # contraction past 1 (measured at 32x32: rho 1.34 for V / 1.14 for W,
    # IDENTICAL trace on the generic f64 path — algorithmic, not an
    # implementation artifact), so when the measured 5-cycle contraction
    # is weak the inner solve switches to f32 GMRES preconditioned by the
    # cycle, which converges on isolated rho>1 modes.
    with setup_scope():
        fmg = hv.build_fmg()
    weak_cycle = out["contraction_per_cycle"] > 0.5
    inner_mode = "gmres" if weak_cycle else "cycles"
    out["refined_inner"] = inner_mode
    # GMRES subspace size: restarting at 8 loses the stubborn near-kernel
    # subspace each outer round (measured 32x32 TPU: m=8 -> 18 outers,
    # 458.6 ms warm; m=16 -> 7 outers, 348.1 ms warm), so the weak-cycle
    # path uses the deeper subspace
    refined = make_refined_solver(
        op, one, n_inner=16 if weak_cycle else 6, tol=1e-10,
        normalize="rhs", inner=inner_mode,
        matvec32=hv.build_matvec() if weak_cycle else None)

    def solve_once():
        u0 = fmg(rhs).astype(rhs64.dtype)
        return jax.block_until_ready(refined(rhs64, u0))

    u_r, res_r, n_r, _ = solve_once()
    t0 = time.perf_counter()
    u_r, res_r, n_r, _ = solve_once()
    out["time_to_1e-10_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
    out["refined_outer_iters"] = int(n_r)
    out["refined_residual"] = float(res_r)
    # record the miss instead of dropping the whole stage dict: the driver
    # artifact keeps the measured latency/contraction either way
    out["refined_ok"] = bool(float(res_r) < 1e-10)
    _sync()
    if out["refined_ok"]:
        try:
            @const_jit
            def solve_k(rhs32, u, k):
                def body(_, u):
                    u0 = fmg(rhs32).astype(rhs64.dtype) \
                        + u * jnp.asarray(1e-30, rhs64.dtype)
                    unew, _res, _n, _h = refined(rhs64, u0)
                    return unew
                return jax.lax.fori_loop(0, k, body, u)
            # reps=6 (k=6 vs 48 chained solves): at reps=2 the tunnel's
            # ~5 ms dispatch jitter mapped to a +-0.35 ms slope-noise band
            # on a ~1-3 ms signal (measured n_inner sweep spread)
            t_marg, _ = time_per_iter(solve_k, rhs,
                                      jnp.zeros_like(rhs64), 6)
            out["time_to_1e-10_marginal_ms"] = round(t_marg, 3)
            _sync()
        except Exception as e:  # pragma: no cover
            print(f"# stokes_large marginal refine timing failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    return out


def measure_flagship(args, grid_n, gate=True, refine=True,
                     marginal_refine=True, budget=None):
    """Measure the flagship Poisson V-cycle at one grid size.

    Returns the result dict: marginal per-cycle latency for every
    implementation that applies at this size (XLA packed, rolled fused,
    SoA fused, streamed hybrid), the best one as ``value``/``impl``,
    HBM-model utilization, and (``refine=True``) the mixed-precision
    time-to-1e-10.  ``gate=True`` first proves f64 convergence on the
    same hierarchy (the correctness gate).

    ``budget`` (a Budget): the result dict is merged into
    ``budget.result`` and re-emitted after every milestone — the XLA
    latency, each alternative implementation, the HBM figures, the
    refinement numbers — so a hard kill at ANY point still leaves the
    numbers measured so far on stdout (the refinement stage is the
    largest compile of the run and comes LAST for exactly this reason).
    """
    import jax
    import jax.numpy as jnp
    from dgtpu.utils.jitting import const_jit
    import numpy as np

    from __graft_entry__ import _flagship
    from dgtpu.ops.smoothers import element_colors
    from dgtpu.ops.stencil import StencilOperator
    from dgtpu.solvers.multigrid import MultigridSolver
    from dgtpu.utils.device import setup_scope

    dg = _flagship(n=grid_n, p_grid=args.p, p_sol=args.p)
    # block_dtype: the big stencil arrays; vec_dtype: vectors, diag inverses,
    # transfers, coarse inverse.  bfloat16 mode keeps the solve in f32 and
    # only narrows the HBM-dominant operator blocks.
    block_dtype = {"float32": jnp.float32, "float64": jnp.float64,
                   "bfloat16": jnp.bfloat16}[args.dtype]
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    target = jax.devices()[0]

    with setup_scope():
        colors = [element_colors(l.Ni, l.Nj) for l in dg.levels]
        rhs64 = dg.levels[-1].rhs
        if gate:
            # correctness gate in f64 on the same hierarchy (host)
            mg64 = MultigridSolver([l.op for l in dg.levels], dg.transfers,
                                   dg.transfer_types, dg.settings,
                                   colors=colors)
            u64, res64, n64, _ = mg64.solve(rhs64)
            assert float(res64) < 1e-6, \
                f"correctness gate failed: {float(res64)}"
        else:
            n64 = None

        # fast-path operators (cast on host)
        ops = [StencilOperator(l.op.blocks.astype(block_dtype), l.op.nbr,
                               l.op.mask)
               for l in dg.levels]

        class _T:
            pass

        transfers = []
        for t in dg.transfers:
            t2 = _T()
            t2.__class__ = t.__class__
            t2.__dict__ = dict(t.__dict__)
            t2.R = t.R.astype(dtype)
            t2.P = t.P.astype(dtype)
            transfers.append(t2)

        mg = MultigridSolver(ops, transfers, dg.transfer_types, dg.settings,
                             colors=colors)
        mg.Dinv = [d.astype(dtype) for d in mg.Dinv]
        if mg.coarse_inv is not None:
            mg.coarse_inv = mg.coarse_inv.astype(dtype)
        rhs = rhs64.astype(dtype)

    # move the hot-loop pytrees to the accelerator
    mg.ops = ops = [jax.device_put(o, target) for o in ops]
    for t in transfers:
        t.R = jax.device_put(t.R, target)
        t.P = jax.device_put(t.P, target)
    mg.Dinv = [jax.device_put(d, target) for d in mg.Dinv]
    if mg.coarse_inv is not None:
        mg.coarse_inv = jax.device_put(mg.coarse_inv, target)
    mg.colors = [jax.device_put(c, target) for c in mg.colors]
    mg.packs = [p.to_device(target) if p is not None else None
                for p in mg.packs]
    n_lev = len(ops)
    rhs = jax.device_put(rhs, target)

    @const_jit
    def one_cycle(rhs, u):
        return mg.v_cycle(n_lev, rhs, u)

    @const_jit
    def many_cycles(rhs, u, n):
        def body(_, u):
            return mg.v_cycle(n_lev, rhs, u)
        return jax.lax.fori_loop(0, n, body, u)

    # fused rolled-layout V-cycle: XLA build always, Pallas kernel on TPU
    pallas_fn = None
    rolled_fn = None
    soa_fn = None
    stream_fn = None
    stream_bf16_fn = None
    impl_bytes = {}   # per-impl ACTUAL HBM bytes/cycle (builders know)
    impl_cycles = {}  # tag -> (one_cycle_fn, builder) for refinement reuse
    if args.dtype == "float32":
        try:
            from dgtpu.ops.pallas_vcycle import PallasVCycle
            with setup_scope():
                dims = [(l.Nj, l.Ni) for l in dg.levels]
                pv = PallasVCycle([l.op for l in dg.levels], dg.transfers,
                                  dg.transfer_types, dg.settings, dims,
                                  dtype=dtype)
            pv.to_device(target)
            rolled_one = pv.build_xla()

            @const_jit
            def rolled_many(rhs, u, n):
                def body(_, u):
                    return rolled_one(rhs, u)
                return jax.lax.fori_loop(0, n, body, u)
            rolled_fn = (rolled_one, rolled_many)
            # the fused Pallas kernel keeps the whole hierarchy VMEM-
            # resident; tile padding of the operator blocks caps it at
            # 16x16 on v5e (larger grids use the generic XLA path).
            if (jax.default_backend() == "tpu" and not args.no_pallas
                    and grid_n <= args.pallas_max_n):
                pallas_one = pv.build()

                @const_jit
                def pallas_many(rhs, u, n):
                    def body(_, u):
                        return pallas_one(rhs, u)
                    return jax.lax.fori_loop(0, n, body, u)
                pallas_fn = (pallas_one, pallas_many)
                impl_bytes["pallas_fused"] = pv.hbm_bytes_per_invocation()
                impl_cycles["pallas_fused"] = (pallas_one, pv)
            # structure-of-arrays fused cycle (cells in lanes): ~11% tile
            # padding instead of 3.5x, VMEM-resident through 32x32.
            if (jax.default_backend() == "tpu" and not args.no_pallas
                    and grid_n <= args.soa_max_n):
                from dgtpu.ops.pallas_soa import SoAVCycle
                with setup_scope():
                    sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                                   dg.transfer_types, dg.settings, dims,
                                   dtype=dtype)
                sv.to_device(target)
                soa_one = sv.build()

                @const_jit
                def soa_many(rhs, u, n):
                    def body(_, u):
                        return soa_one(rhs, u)
                    return jax.lax.fori_loop(0, n, body, u)
                soa_fn = (soa_one, soa_many)
                impl_bytes["soa_fused"] = sv.hbm_bytes_per_invocation()
                impl_cycles["soa_fused"] = (soa_one, sv)
            # beyond full VMEM residency: streamed-smoother hybrid (blocks
            # streamed through a sequential pallas grid, vectors resident,
            # coarse subtree as one fused kernel) — plus its bf16
            # sweep-storage variant (defect-form smoothing, ~40% less
            # sweep traffic; see ops/pallas_stream.StreamedLevel)
            if (jax.default_backend() == "tpu" and not args.no_pallas
                    and grid_n > args.soa_max_n):
                from dgtpu.ops.pallas_stream import StreamedVCycle

                def make_stream(tag, block_storage, res_storage=None):
                    with setup_scope():
                        hv = StreamedVCycle([l.op for l in dg.levels],
                                            dg.transfers, dg.transfer_types,
                                            dg.settings, dims, dtype=dtype,
                                            block_storage=block_storage,
                                            res_storage=res_storage)
                    hv.to_device(target)
                    one = hv.build()
                    impl_bytes[tag] = hv.hbm_bytes_per_cycle()
                    impl_cycles[tag] = (one, hv)

                    @const_jit
                    def many(rhs, u, n):
                        def body(_, u):
                            return one(rhs, u)
                        return jax.lax.fori_loop(0, n, body, u)
                    return one, many
                stream_fn = make_stream("streamed", "float32")
                stream_bf16_fn = make_stream("streamed_bf16", "bfloat16")
                # NOT benched: res_storage='bfloat16' (all-bf16 streams).
                # Measured (tests/test_block_storage.py): the bf16
                # residual operand stalls the cycle at ~1.7e-2 relative —
                # as the refined solve's inner preconditioner that costs
                # MORE outer rounds than the ~35% traffic cut saves.
        except Exception as e:  # pragma: no cover - report and fall back
            print(f"# fused path unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)

    u0 = jnp.zeros_like(rhs)
    # fast-path numerical sanity: residual drops like the f64 path early on
    u_check = jax.block_until_ready(many_cycles(rhs, u0, 5))
    r5 = float(jnp.linalg.norm(rhs - ops[-1].matvec(u_check))
               / jnp.linalg.norm(rhs))
    assert r5 < 1e-2, \
        f"fast path not contracting: rel residual {r5} after 5 cycles"

    # marginal per-cycle device time (slope fit — excludes the fixed
    # per-dispatch tunnel overhead, reported separately)
    t_amortized, t_fixed = time_per_iter(many_cycles, rhs, u0, args.reps)

    # dispatch-inclusive single-call latency
    jax.block_until_ready(one_cycle(rhs, u0))
    t0 = time.perf_counter()
    u = u0
    for _ in range(50):
        u = one_cycle(rhs, u)
    jax.block_until_ready(u)
    t_dispatch = (time.perf_counter() - t0) / 50 * 1e3

    result = {
        "metric": "v_cycle_ms",
        "value": round(t_amortized, 4),
        "unit": "ms",
        "vs_baseline": round(1.0 / t_amortized, 3),
        "fixed_dispatch_overhead_ms": round(t_fixed, 2),
        "dispatch_inclusive_ms": round(t_dispatch, 4),
        "dtype": args.dtype,
        "backend": jax.default_backend(),
        "residual_after_5_fast_cycles": r5,
        "impl": "xla",
        "grid": f"{grid_n}x{grid_n}_p{args.p}",
        "n_dof": int(rhs.shape[0]),
    }
    if n64 is not None:
        result["f64_cycles_to_1e-6"] = int(n64)

    def _sync():
        if budget is not None:
            budget.result.update(result)
            budget.emit()

    _sync()

    def try_impl(tag, fns):
        """Time an alternative V-cycle implementation; adopt it if faster."""
        try:
            one, many = fns
            up = u0
            for _ in range(5):
                up = one(rhs, up)
            rp = float(jnp.linalg.norm(rhs - ops[-1].matvec(up))
                       / jnp.linalg.norm(rhs))
            if rp >= 1e-2:
                result[f"{tag}_residual_after_5"] = rp
                return
            t_ms, _ = time_per_iter(many, rhs, u0, args.reps)
            result[f"{tag}_ms"] = round(t_ms, 4)
            if t_ms < result["value"]:
                result["value"] = round(t_ms, 4)
                result["vs_baseline"] = round(1.0 / t_ms, 3)
                result["impl"] = tag
        except Exception as e:
            msg = str(e).splitlines()[0][:300] if str(e) else ""
            print(f"# {tag} failed: {type(e).__name__}: {msg}",
                  file=sys.stderr)
        _sync()

    if rolled_fn is not None:
        try_impl("rolled_fused", rolled_fn)
    if pallas_fn is not None:
        try_impl("pallas_fused", pallas_fn)
    if soa_fn is not None:
        try_impl("soa_fused", soa_fn)
    if stream_fn is not None:
        try_impl("streamed", stream_fn)
    if stream_bf16_fn is not None:
        try_impl("streamed_bf16", stream_bf16_fn)

    # achieved HBM bandwidth vs v5e peak for the best V-cycle.  Fused and
    # streamed impls report their builder's ACTUAL per-cycle DMA bytes;
    # the XLA paths fall back to the corrected stencil-stream model.
    bytes_cycle = impl_bytes.get(result["impl"],
                                 _stencil_bytes_per_cycle(mg, None))
    achieved_gbps = bytes_cycle / (result["value"] * 1e-3) / 1e9
    if impl_bytes:
        result["hbm_bytes_by_impl"] = {k: int(v)
                                       for k, v in impl_bytes.items()}
    result["hbm_bytes_per_cycle"] = int(bytes_cycle)
    result["hbm_achieved_gbps"] = round(achieved_gbps, 1)
    result["hbm_utilization"] = round(achieved_gbps / PEAK_HBM_GBPS, 4)
    _sync()

    # time-to-1e-10 via mixed-precision refinement (f64 defect, f32 cycles),
    # seeded with the f32 FMG nested-iteration guess (starts the outer loop
    # ~2 orders below zero; tolerance normalized by ||rhs|| so the 1e-10
    # criterion keeps its zero-iterate meaning).  LAST: its emulated-f64
    # defect graph is the largest compile of the stage, and every latency
    # number above is already on stdout if this one gets killed.
    if refine and args.dtype != "float64":
        from dgtpu.solvers.refinement import make_refined_solver
        op64 = jax.device_put(dg.levels[-1].op, target)
        rhs64d = jax.device_put(rhs64, target)
        n_inner = int(getattr(args, "n_inner", 6) or 6)

        # inner cycle = the WINNING implementation (round-4 used the XLA
        # cycle here — 5x slower than the fused kernel at 8x8, and the 12
        # inner cycles dominated the 2.91 ms marginal time-to-1e-10);
        # falls back to the XLA cycle if the fused refined graph flakes
        def xla_candidate():
            @const_jit
            def fmg32(r):
                return mg.fmg_guess(r)
            return (lambda r, u: mg.v_cycle(n_lev, r, u)), fmg32

        candidates = []
        best = impl_cycles.get(result["impl"])
        if best is not None:
            cyc_fast, bld = best

            def fused_candidate(cyc_fast=cyc_fast, bld=bld):
                with setup_scope():
                    # finest FMG cycle through the winning kernel too
                    fmg32 = bld.build_fmg(finest_cycle=cyc_fast)
                return getattr(cyc_fast, "__wrapped__", cyc_fast), fmg32
            candidates.append((result["impl"], fused_candidate))
        candidates.append(("xla", xla_candidate))

        for tag, make_parts in candidates:
            try:
                cyc32, fmg32 = make_parts()
                refined = make_refined_solver(op64, cyc32, n_inner=n_inner,
                                              tol=1e-10, normalize="rhs")

                def solve_once():
                    u0 = fmg32(rhs).astype(rhs64d.dtype)
                    return jax.block_until_ready(refined(rhs64d, u0))

                u_r, res_r, n_r, _ = solve_once()
                t0 = time.perf_counter()
                u_r, res_r, n_r, _ = solve_once()
                assert float(res_r) < 1e-10, float(res_r)
                result["time_to_1e-10_ms"] = round(
                    (time.perf_counter() - t0) * 1e3, 3)
                result["refined_outer_iters"] = int(n_r)
                result["refined_residual"] = float(res_r)
                result["refined_inner_impl"] = tag
                result["refined_n_inner"] = n_inner
                _sync()
            except AssertionError:
                raise  # a real accuracy regression must fail the bench
            except Exception as e:
                print(f"# refinement ({tag} inner) failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                continue

            # marginal per-solve device time (slope fit, same methodology
            # as the per-cycle numbers): k chained FMG+refined solves under
            # one dispatch cancel the fixed ~28 ms tunnel RTT that
            # dominates the single-dispatch number at small sizes
            if marginal_refine:
                try:
                    @const_jit
                    def solve_k(rhs32, u, k):
                        def body(_, u):
                            u0 = fmg32(rhs32).astype(rhs64d.dtype) \
                                + u * jnp.asarray(1e-30, rhs64d.dtype)
                            unew, _res, _n, _h = refined(rhs64d, u0)
                            return unew
                        return jax.lax.fori_loop(0, k, body, u)
                    # reps=6: see the stokes-stage comment on slope noise
                    t_marg, _ = time_per_iter(solve_k, rhs,
                                              jnp.zeros_like(rhs64d), 6)
                    result["time_to_1e-10_marginal_ms"] = round(t_marg, 3)
                    _sync()
                except Exception as e:  # pragma: no cover
                    print(f"# marginal refine timing failed: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
            break
    return result


# per-size wall-clock estimates for the scaling sweep (cold, remote TPU,
# measured in round 3's stderr markers: n=16 2m20s, n=32 3m23s with refine;
# n=64 streams + compiles the largest Mosaic kernels and never finished)
_SCALING_EST_S = {8: 90, 16: 180, 32: 260, 64: 600}
# extra cost of the mixed-precision refinement stage (its emulated-f64
# defect graph is the largest compile at each size)
_REFINE_EST_S = {8: 0, 16: 60, 32: 120, 64: 300}


def run_scaling(args, sizes, headline=None, budget=None, gated=True,
                refine_default=True):
    """The flagship metric at every size in ``sizes`` — the driver-visible
    scaling story (VERDICT r2 item 2): one entry per grid size with the
    marginal per-cycle latency, which implementation won, HBM utilization,
    and the mixed-precision time-to-1e-10.

    With a ``budget``: sizes that don't fit are skipped (recorded), the
    refinement stage is dropped first when only the latency fits, and the
    artifact is re-emitted after every size so nothing measured is lost.
    ``gated=False`` (the per-size child-stage path): the parent
    orchestrator already decided this size runs and bounds it with a hard
    subprocess timeout, so the child must not second-guess the start.
    """
    # append to any scaling entries already in the artifact: the sweep is
    # split into a <=32 pass and a trailing >32 pass (compile hogs last)
    out = (budget.result.setdefault("scaling", [])
           if budget is not None else [])
    for n in sizes:
        est = _SCALING_EST_S.get(n, 600)
        if gated and budget is not None \
                and not budget.fits(est, f"scaling:n={n}"):
            continue
        refine = refine_default
        if refine and gated and budget is not None and \
                budget.remaining() < est + _REFINE_EST_S.get(n, 300):
            refine = False  # latency-only: record v_cycle_ms, skip 1e-10
        _stage(f"scaling point n={n} (refine={refine})")
        try:
            if headline is not None and headline.get("grid") == \
                    f"{n}x{n}_p{args.p}":
                r = headline
            else:
                r = measure_flagship(args, n, gate=False, refine=refine,
                                     marginal_refine=False)
            entry = {"grid_n": n, "n_dof": r["n_dof"],
                     "v_cycle_ms": r["value"], "impl": r["impl"],
                     "hbm_utilization": r["hbm_utilization"]}
            for k in ("time_to_1e-10_ms", "refined_outer_iters"):
                if k in r:
                    entry[k] = r[k]
            out.append(entry)
        except Exception as e:  # pragma: no cover — record, keep scaling
            msg = str(e).splitlines()[0][:200] if str(e) else ""
            print(f"# scaling n={n} failed: {type(e).__name__}: {msg}",
                  file=sys.stderr)
            out.append({"grid_n": n, "error": f"{type(e).__name__}: {msg}"})
        if budget is not None:
            budget.emit()
    return out


def run_refine_sweep(args, budget=None, n_values=(3, 4, 5, 6, 7, 8)):
    """time-to-1e-10 marginal vs n_inner (VERDICT r4 item 5): the refined
    solve's schedule knob — fewer inner cycles mean more outer rounds
    (each paying a df32 defect + norm), more mean wasted contraction.
    Run manually via ``python bench.py --stage refine_sweep``; results are
    recorded in PERFORMANCE.md, and the winning value becomes the
    ``--n-inner`` default."""
    out = (budget.result.setdefault("refine_sweep", [])
           if budget is not None else [])
    for n in n_values:
        args.n_inner = n
        if budget is not None and not budget.fits(150, f"refine_sweep:{n}"):
            continue
        _stage(f"refine sweep n_inner={n}")
        try:
            r = measure_flagship(args, args.grid_n, gate=False, refine=True,
                                 marginal_refine=True)
            out.append({"n_inner": n,
                        "time_to_1e-10_marginal_ms":
                            r.get("time_to_1e-10_marginal_ms"),
                        "time_to_1e-10_ms": r.get("time_to_1e-10_ms"),
                        "refined_outer_iters": r.get("refined_outer_iters"),
                        "refined_inner_impl": r.get("refined_inner_impl")})
        except Exception as e:  # pragma: no cover — keep sweeping
            out.append({"n_inner": n, "error": f"{type(e).__name__}: {e}"})
        if budget is not None:
            budget.emit()
    return out


def run_roofline(args, budget=None):
    """Measured practical HBM ceiling (VERDICT r4 stretch item 8): the
    819 GB/s v5e figure is a paper peak; real kernels top out below it.
    Times (a) a fused read-reduce (1x size traffic) and (b) a
    read-modify-write copy (2x size) at sizes far beyond VMEM, via the
    same marginal-slope methodology as every other number, so the
    ``hbm_utilization`` figures can be read against the ceiling the
    hardware actually delivers.  Run via ``--stage roofline``."""
    import jax
    import jax.numpy as jnp
    from dgtpu.utils.jitting import const_jit

    out = {}
    if budget is not None:
        budget.result["roofline"] = out
    target = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    for mb in (256, 512):
        n = mb * 1024 * 1024 // 4
        x = jax.device_put(jax.random.normal(key, (n,), jnp.float32),
                           target)

        @const_jit
        def reduce_many(x, acc, k):
            def body(_, acc):
                # acc-dependent add forces a fresh full read per trip
                # (a loop-invariant sum would be hoisted); XLA fuses the
                # add into the reduction, so traffic = 1x size per trip
                return jnp.sum(x + acc) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, k, body, acc)

        ms, _ = time_per_iter(
            lambda rhs, u, k: reduce_many(x, u, k)[None],
            jnp.zeros((1,), jnp.float32), jnp.float32(0.0), 20)
        out[f"read_reduce_{mb}MB_gbps"] = round(
            mb / 1024 / (ms * 1e-3), 1)

        @const_jit
        def copy_many(x, acc, k):
            def body(_, acc):
                # optimization_barrier forces the product to materialize
                # (else XLA fuses the multiply into the [0] read and the
                # write never happens): traffic = read + write = 2x size
                y = jax.lax.optimization_barrier(
                    x * (jnp.float32(1.0) + acc * jnp.float32(1e-30)))
                return y[0] * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, k, body, acc)

        ms, _ = time_per_iter(
            lambda rhs, u, k: copy_many(x, u, k)[None],
            jnp.zeros((1,), jnp.float32), jnp.float32(0.0), 20)
        out[f"copy_{mb}MB_gbps"] = round(2 * mb / 1024 / (ms * 1e-3), 1)
        if budget is not None:
            budget.emit()
    out["peak_paper_gbps"] = PEAK_HBM_GBPS
    return out


def run_smoke(args, budget=None):
    """TPU Mosaic smoke gate: compile every fused/streamed kernel
    generation at a tiny shape (4x4, p=2) and check one cycle against its
    own XLA build.  The pytest suite runs the Pallas paths interpret-only
    on CPU, so an actual Mosaic lowering regression would otherwise ship
    green — this block surfaces it in the driver artifact in minutes
    (VERDICT r2 weak item 4).  Each kernel's verdict is re-emitted into
    the budget artifact immediately, so a mid-gate kill keeps the kernels
    already checked (round 3 lost all five passing results this way)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship
    from dgtpu.utils.device import setup_scope

    target = jax.devices()[0]
    out = {}
    if budget is not None:
        budget.result["smoke"] = out

    def check(tag, kernel_fn, ref_fn, rhs, tol=1e-5):
        """``tol``: one-cycle Pallas-vs-XLA agreement bound.  The Poisson
        kernels match their XLA builds bit-exactly; the Stokes saddle sweep
        has long dependent f32 chains whose Mosaic vs XLA accumulation
        order diverges at the ~1e-3 level after ONE cycle while both
        builds contract at the identical rate (measured 1.03e-6 vs 1.12e-6
        after 5 cycles), so the Stokes checks pass a looser bound."""
        if budget is not None and not budget.fits(60, f"smoke:{tag}"):
            return
        _stage(f"smoke: {tag}")
        try:
            t0 = time.perf_counter()
            u_k = jax.block_until_ready(kernel_fn(rhs, jnp.zeros_like(rhs)))
            compile_s = time.perf_counter() - t0
            u_r = ref_fn(rhs, jnp.zeros_like(rhs))
            rel = float(jnp.max(jnp.abs(u_k - u_r))
                        / (jnp.max(jnp.abs(u_r)) + 1e-30))
            out[tag] = {"ok": bool(rel < tol), "rel_err": rel,
                        "first_call_s": round(compile_s, 1)}
        except Exception as e:  # pragma: no cover
            out[tag] = {"ok": False,
                        "error": f"{type(e).__name__}: {str(e)[:200]}"}
        if budget is not None:
            out["all_ok"] = all(v.get("ok", False) for k, v in out.items()
                                if isinstance(v, dict))
            budget.emit()

    # Poisson kernels on the tiny flagship hierarchy
    try:
        dg = _flagship(n=4, p_grid=2, p_sol=2)
        dims = [(l.Nj, l.Ni) for l in dg.levels]
        rhs = jax.device_put(dg.levels[-1].rhs.astype(jnp.float32), target)
        from dgtpu.ops.pallas_soa import SoAVCycle
        from dgtpu.ops.pallas_stream import StreamedVCycle
        from dgtpu.ops.pallas_vcycle import PallasVCycle
        with setup_scope():
            pv = PallasVCycle([l.op for l in dg.levels], dg.transfers,
                              dg.transfer_types, dg.settings, dims,
                              dtype=jnp.float32)
            sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                           dg.transfer_types, dg.settings, dims,
                           dtype=jnp.float32)
            hv = StreamedVCycle([l.op for l in dg.levels], dg.transfers,
                                dg.transfer_types, dg.settings, dims,
                                dtype=jnp.float32)
        pv.to_device(target)
        sv.to_device(target)
        hv.to_device(target)
        check("rolled_fused", pv.build(), pv.build_xla(), rhs)
        check("soa_fused", sv.build(), sv.build_xla(), rhs)
        check("streamed", hv.build(), sv.build_xla(), rhs)
    except Exception as e:  # pragma: no cover
        out["poisson"] = {"ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}

    # Stokes kernels
    try:
        from dgtpu.api import DGFEM
        from dgtpu.geometry import generate_rectangle_grid, write_plot3d
        from dgtpu.ops.pallas_stokes import SoAStokesVCycle
        from dgtpu.ops.pallas_stokes_stream import StreamedStokesVCycle
        repo = os.path.dirname(os.path.abspath(__file__))
        gridfile = os.path.join(repo, "input", "Rectangle_4X4_nPoly2.xyz")
        if not os.path.exists(gridfile):
            write_plot3d(gridfile, *generate_rectangle_grid(4, 4, 2))
        dgs = DGFEM(settings=_stokes_settings(4), solve_multigrid=True)
        with setup_scope():
            ssv = SoAStokesVCycle(dgs.levels, dgs.transfers,
                                  dgs.transfer_types, dgs.settings,
                                  dtype=jnp.float32)
            shv = StreamedStokesVCycle(dgs.levels, dgs.transfers,
                                       dgs.transfer_types, dgs.settings,
                                       dtype=jnp.float32)
        ssv.to_device(target)
        shv.to_device(target)
        rhs_s = jax.device_put(dgs.levels[-1].rhs.astype(jnp.float32),
                               target)
        # streamed first: its Mosaic compile is the cheaper of the two
        # (measured 19.8 s vs 32.3 s cold on the builder), so if the
        # parent's hard stage timeout lands mid-gate the artifact keeps
        # more verdicts
        check("stokes_streamed", shv.build(), ssv.build_xla(), rhs_s,
              tol=5e-3)
        check("stokes_fused", ssv.build(), ssv.build_xla(), rhs_s, tol=5e-3)
    except Exception as e:  # pragma: no cover
        out["stokes"] = {"ok": False,
                         "error": f"{type(e).__name__}: {str(e)[:200]}"}
    out["all_ok"] = all(v.get("ok", False) for k, v in out.items()
                        if isinstance(v, dict))
    return out


# ---------------------------------------------------------------------------
# Parent orchestrator: every stage runs as a BOUNDED subprocess.
#
# VERDICT r4: the driver's default run died rc 124 because one un-gated
# Mosaic compile (the Stokes fused smoke kernel, ~26 min cold through the
# tunnel vs a 60 s estimate) ran unbounded — in-process signal handlers
# cannot interrupt a compile blocked in C++.  A subprocess per stage is the
# only reliable bound: on timeout the child gets SIGTERM (its Budget
# handler dumps the accumulated snapshot to stdout), then SIGKILL, and the
# parent merges whatever JSON landed.  The parent itself never imports jax,
# so it can always emit the final artifact and exit 0.
# ---------------------------------------------------------------------------

import subprocess

_RESERVE_S = 60          # parent overhead + final-emission headroom
_TERM_GRACE_S = 25       # child SIGTERM-dump window before SIGKILL

# (optimistic start-estimate, hard cap) per stage, in cold remote-TPU
# seconds.  Estimates gate only whether a stage STARTS and are biased LOW:
# children emit incrementally, so a stage that half-finishes under its hard
# cap still banks its partial numbers, while a pessimistic skip loses them
# all.  Caps bound the in-flight stage (the r4 failure mode).
_STAGE_PLAN = {
    "probe":        (30, 400),
    "flagship":     (200, 600),
    # stokes needs headroom for its marginal substage (core ~430 s +
    # marginal ~330 s warm) — at a 600 cap the child budget always
    # squeezed the marginal out and the headline Stokes number never
    # reached the driver artifact
    "stokes":       (240, 900),
    "configs":      (200, 650),
    "smoke":        (60, 450),
    "stokes_large": (360, 520),
}


def _plan_for(stage):
    if stage in _STAGE_PLAN:
        return _STAGE_PLAN[stage]
    if stage.startswith("scaling:"):
        n = int(stage.split(":", 1)[1])
        est = _SCALING_EST_S.get(n, 600)
        return (est, min(est * 2 + 150, 700))
    return (120, 600)  # pragma: no cover — unknown stage


def _last_json_dict(text):
    """Last stdout line that parses as a JSON object.  Children re-emit a
    complete snapshot after every substage, so the last one wins."""
    parsed = None
    for line in (text or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict):
            parsed = obj
    return parsed


def _merge_child(result, parsed):
    """Shallow-merge a child stage's snapshot into the parent artifact.

    Parent-owned bookkeeping keys are preserved, child-side skip records
    are appended (so the artifact shows every gate decision at any level),
    and ``scaling`` entries accumulate across per-size children."""
    if not parsed:
        return
    parsed = dict(parsed)
    child_skipped = parsed.pop("skipped", None) or []
    for k in ("bench_wall_s", "terminated_by", "stage_walls", "budget_s"):
        parsed.pop(k, None)
    scaling = parsed.pop("scaling", None)
    if scaling:
        result.setdefault("scaling", []).extend(scaling)
    result.update(parsed)
    result["skipped"].extend(child_skipped)


_STALL_S = 240           # no child stdout within this window => wedged tunnel


def _spawn_child(budget, cmd, cap_s, stall_s):
    """Spawn one child attempt.  Returns (out_text, timed_out, stalled, rc,
    wall_s).  ``stalled``: the child produced NO stdout within ``stall_s``
    — the signature of a wedged remote-tunnel session (children emit a
    first-device-op heartbeat within seconds when the tunnel works), as
    opposed to a slow-but-alive stage, which the hard cap handles."""
    import threading
    t0 = time.monotonic()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                            cwd=os.path.dirname(os.path.abspath(__file__)))
    budget.on_terminate = proc.kill
    lines = []
    saw_output = threading.Event()

    def _reader():
        for line in proc.stdout:
            lines.append(line)
            saw_output.set()
        proc.stdout.close()

    th = threading.Thread(target=_reader, daemon=True)
    th.start()
    timed_out = stalled = False
    while proc.poll() is None:
        el = time.monotonic() - t0
        if el >= cap_s:
            timed_out = True
        elif not saw_output.is_set() and el >= stall_s:
            stalled = True
        else:
            time.sleep(min(1.0, max(cap_s - el, 0.05)))
            continue
        proc.terminate()    # child Budget dumps its snapshot on SIGTERM
        try:
            proc.wait(timeout=_TERM_GRACE_S)
        except subprocess.TimeoutExpired:  # pragma: no cover — wedged child
            proc.kill()
            proc.wait()
        break
    th.join(timeout=5)
    budget.on_terminate = None
    return "".join(lines), timed_out, stalled, proc.returncode, \
        time.monotonic() - t0


def _run_child_stage(budget, stage, cap_s, argv_extra, passthrough):
    """Run one bench stage as ``python bench.py --stage <stage>`` under a
    hard wall-clock cap; returns (parsed_last_json, timed_out, rc).

    A child that never prints (wedged tunnel session) is killed after
    ``_STALL_S`` and retried once — a fresh session almost always comes up
    healthy, and the retry costs minutes where waiting out the cap costs
    the rest of the budget.  The probe stage is exempt: its only stdout is
    its final emit and a slow-but-reachable backend bring-up legitimately
    stays silent for up to its whole cap (misclassifying it would silently
    demote the entire bench to CPU)."""
    def _cmd(cap):
        # the child plans its own substages against --budget-s, so it must
        # be recomputed whenever the cap shrinks (a stale larger budget
        # makes the child start substages the parent will kill mid-flight)
        return [sys.executable, os.path.abspath(__file__), "--stage", stage,
                "--budget-s", str(max(cap - 15.0, 30.0))] \
            + passthrough + argv_extra
    stall_s = cap_s if stage == "probe" else min(_STALL_S, cap_s)
    wall, stall_attempts = 0.0, 0
    for attempt in (0, 1):
        out_text, timed_out, stalled, rc, w = _spawn_child(
            budget, _cmd(cap_s), cap_s, stall_s)
        wall += w
        if not stalled:
            break
        stall_attempts += 1
        will_retry = (attempt == 0
                      and budget.remaining() >= stall_s + _RESERVE_S)
        print(f"# stage {stage}: no output in {stall_s:.0f}s (wedged "
              f"tunnel session?) — "
              f"{'retrying' if will_retry else 'giving up'}",
              file=sys.stderr, flush=True)
        if not will_retry:
            break
        cap_s = max(min(cap_s, budget.remaining() - _RESERVE_S), 30)
    parsed = _last_json_dict(out_text)
    budget.result.setdefault("stage_walls", {})[stage] = {
        "wall_s": round(wall, 1), "rc": rc, "timed_out": timed_out}
    if stall_attempts:
        budget.result["stage_walls"][stage]["stall_attempts"] = \
            stall_attempts
        # even on a successful retry the total wall includes the wasted
        # stall window — recording it as this stage's measured cost would
        # inflate the next run's estimate into a spurious skip (same
        # prior-poisoning rule as the timeout path)
        budget.cancel_stage()
    if stalled:
        budget.cancel_stage()
        budget.result["skipped"].append(
            {"stage": stage, "reason": "stage_stalled",
             "stall_s": round(stall_s, 1),
             "partial_recovered": parsed is not None})
    elif timed_out:
        budget.cancel_stage()   # the wall reflects the cap, not the cost
        budget.result["skipped"].append(
            {"stage": stage, "reason": "stage_timeout",
             "timeout_s": round(cap_s, 1),
             "partial_recovered": parsed is not None})
        print(f"# stage {stage}: hard timeout at {cap_s:.0f}s (partial "
              f"{'recovered' if parsed else 'lost'})",
              file=sys.stderr, flush=True)
    elif rc != 0:
        budget.result["skipped"].append(
            {"stage": stage, "reason": f"stage_rc_{rc}",
             "partial_recovered": parsed is not None})
        print(f"# stage {stage}: exited rc {rc}",
              file=sys.stderr, flush=True)
    return parsed, timed_out, rc


def orchestrate(args):
    budget = Budget(args.budget_s)
    result = budget.result
    result.update({"metric": "v_cycle_ms", "value": None, "unit": "ms",
                   "vs_baseline": None, "backend": None,
                   "orchestrator": "subprocess_stages"})
    budget.emit()

    passthrough = ["--dtype", args.dtype, "--reps", str(args.reps),
                   "--p", str(args.p),
                   "--pallas-max-n", str(args.pallas_max_n),
                   "--soa-max-n", str(args.soa_max_n)]
    if args.no_pallas:
        passthrough.append("--no-pallas")

    # backend resolution, ONCE (children skip their own probe): the axon
    # remote-TPU plugin blocks ~5 min in C++ backend init when the tunnel
    # is down, so the probe is itself a bounded child stage
    if args.backend:
        backend = args.backend
        passthrough += ["--backend", args.backend]
    else:
        backend = "cpu"
        est, cap = _plan_for("probe")
        if budget.fits(est, "probe"):
            parsed, _, _ = _run_child_stage(
                budget, "probe",
                max(min(cap, budget.remaining() - _RESERVE_S), 30),
                [], passthrough)
            if parsed and parsed.get("backend"):
                backend = parsed["backend"]
        if backend == "cpu":
            print("# TPU backend unreachable; children run on CPU",
                  file=sys.stderr)
        passthrough += ["--assume-backend", backend]
    result["backend"] = backend
    budget.emit()

    def run_stage(stage, extra=()):
        _stage(f"stage {stage}")
        est, cap = _plan_for(stage)
        if not budget.fits(est, stage):
            return None
        cap_eff = max(min(cap, budget.remaining() - _RESERVE_S), 30)
        parsed, timed_out, rc = _run_child_stage(budget, stage, cap_eff,
                                                 list(extra), passthrough)
        _merge_child(result, parsed)
        if result.get("value"):
            result["vs_baseline"] = round(1.0 / result["value"], 3)
        budget.emit()
        return parsed

    # 1. flagship — the headline metric; one retry if no headline landed
    # (transient tunnel abort, or a timeout whose compile progress is now
    # in the persistent cache and makes the retry fast)
    parsed = run_stage("flagship", ["--grid-n", str(args.grid_n)])
    if result.get("value") is None and budget.remaining() > 300:
        parsed = run_stage("flagship:retry", ["--grid-n", str(args.grid_n)])
    if parsed and parsed.get("backend"):
        result["backend"] = backend = parsed["backend"]
    on_tpu = backend == "tpu"
    scaling_on = on_tpu and not args.skip_scaling and args.dtype == "float32"

    # synthesize the flagship-size scaling entry from the headline numbers
    # (identical workload — no reason to pay for it twice)
    sizes = sorted(map(int, str(args.scaling_sizes).split(",")))
    if scaling_on and args.grid_n in sizes \
            and result.get("value") is not None:
        entry = {"grid_n": args.grid_n, "n_dof": result.get("n_dof"),
                 "v_cycle_ms": result.get("value"),
                 "impl": result.get("impl"),
                 "hbm_utilization": result.get("hbm_utilization")}
        for k in ("time_to_1e-10_ms", "refined_outer_iters"):
            if k in result:
                entry[k] = result[k]
        result.setdefault("scaling", []).append(entry)
        budget.emit()

    def scaling_extra(n):
        extra = ["--scaling-sizes", str(n)]
        est, _cap = _plan_for(f"scaling:{n}")
        if budget.remaining() - _RESERVE_S < est + _REFINE_EST_S.get(n, 300):
            extra.append("--no-refine")  # latency fits, 1e-10 wouldn't
        return extra

    # 2. metric stages, cheap to expensive (they smoke the kernels
    # implicitly); explicit tiny-shape smoke gate and the known compile
    # hogs (64x64 streamed Poisson, 32x32 streamed Stokes) dead last.
    # configs run BEFORE the scaling sweep: the five end-to-end BASELINE
    # timings are a parity deliverable, the larger scaling rows also live
    # in committed builder artifacts — under a tight driver budget the
    # deliverables must win
    if not args.skip_configs:
        run_stage("stokes")
        run_stage("configs")
    if scaling_on:
        for n in [s for s in sizes if s != args.grid_n and s <= 32]:
            run_stage(f"scaling:{n}", scaling_extra(n))
    if on_tpu and not args.skip_smoke:
        run_stage("smoke")
    if scaling_on:
        for n in [s for s in sizes if s > 32]:
            run_stage(f"scaling:{n}", scaling_extra(n))
    if on_tpu and not args.skip_configs and not args.no_pallas:
        run_stage("stokes_large")

    budget.emit()


def run_child(args):
    """One bench stage, in-process (invoked by the parent orchestrator as
    a bounded subprocess; also handy for running a single stage by hand)."""
    budget = Budget(args.budget_s)
    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    elif args.assume_backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.assume_backend != "tpu" and not _probe_tpu():
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    stage = args.stage
    if stage == "probe":
        budget.result["backend"] = "tpu" if _probe_tpu() else "cpu"
        budget.emit()
        return
    if stage not in ("_sleep_test", "_stall_test"):
        # first-device-op heartbeat: the axon tunnel occasionally wedges
        # while establishing the remote session — the child then blocks
        # forever inside its first eager op with zero output (observed
        # repeatedly: futex-wait main thread, tokio loop in ep_poll, tunnel
        # healthy for NEW clients).  Running one tiny op up front and
        # printing a marker gives the parent a cheap liveness signal: no
        # stdout within its stall window => wedged => kill + retry, instead
        # of burning the stage's full 600-900 s cap on silence.
        import jax.numpy as _jnp
        _t0 = time.monotonic()
        jax.block_until_ready(_jnp.zeros(8) + 1)
        _stage(f"device up ({jax.default_backend()}) "
               f"in {time.monotonic() - _t0:.1f}s")
        budget.emit()   # first stdout line = the parent's liveness signal
    if stage == "_stall_test":
        # test-only: print nothing and block — exercises the parent's
        # no-output stall detector deterministically
        time.sleep(600)
        return  # pragma: no cover
    if stage == "_sleep_test":
        # test-only: emit one snapshot, then block forever — exercises the
        # parent's hard-timeout SIGTERM-dump salvage path deterministically
        budget.result["sleep_marker"] = 1
        budget.emit()
        time.sleep(600)
        return  # pragma: no cover
    if stage.startswith("flagship"):
        res = measure_flagship(args, args.grid_n, budget=budget)
        budget.result.update(res)
        budget.result["backend"] = jax.default_backend()
    elif stage == "stokes":
        stokes_vcycle_metric(use_pallas=not args.no_pallas, budget=budget,
                             n_inner=int(args.n_inner or 6))
    elif stage == "stokes_large":
        stokes_streamed_metric(n=32, budget=budget)
    elif stage.startswith("scaling"):
        sizes = sorted(map(int, str(args.scaling_sizes).split(",")))
        run_scaling(args, sizes, budget=budget, gated=False,
                    refine_default=not args.no_refine)
    elif stage == "configs":
        run_baseline_configs(budget=budget)
    elif stage == "refine_sweep":
        run_refine_sweep(args, budget=budget)
    elif stage == "roofline":
        run_roofline(args, budget=budget)
    elif stage == "smoke":
        run_smoke(args, budget=budget)
    else:
        raise SystemExit(f"unknown stage: {stage}")
    budget.emit()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64", "bfloat16"],
                    help="bfloat16 = bf16 stencil blocks with f32 vectors/"
                         "diag-inverses (halves the HBM-bound operator "
                         "traffic; accuracy recovered by refinement)")
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--pallas-max-n", type=int, default=16,
                    help="largest grid-n for the fused Pallas kernel; beyond "
                         "16 the padded operator hierarchy exceeds v5e VMEM "
                         "(the (B,B) blocks tile-pad to (8k,128) lanes)")
    ap.add_argument("--soa-max-n", type=int, default=32,
                    help="largest grid-n for the SoA (cells-in-lanes) fused "
                         "kernel; its ~11%% padding keeps the hierarchy "
                         "VMEM-resident through 32x32 on v5e")
    ap.add_argument("--grid-n", type=int, default=8,
                    help="elements per direction (8 = BASELINE flagship)")
    ap.add_argument("--n-inner", type=int, default=6,
                    help="f32 inner cycles per outer refinement round "
                         "(see --stage refine_sweep)")
    ap.add_argument("--p", type=int, default=5, help="solution degree")
    ap.add_argument("--skip-configs", action="store_true",
                    help="skip the five BASELINE config timings (flagship "
                         "latency only)")
    ap.add_argument("--skip-scaling", action="store_true",
                    help="skip the 8/16/32/64 scaling sweep")
    ap.add_argument("--skip-smoke", action="store_true",
                    help="skip the Mosaic kernel smoke gate")
    ap.add_argument("--scaling-sizes", default="8,16,32,64",
                    help="comma list of grid sizes for the scaling sweep")
    ap.add_argument("--budget-s", type=float, default=1500,
                    help="wall-clock budget (s); sized against the "
                         "driver's ~30 min cap with headroom.  Stages that "
                         "don't fit are skipped and recorded; running "
                         "stages are bounded by hard subprocess timeouts, "
                         "so the budget covers in-flight work too")
    ap.add_argument("--stage", default=None,
                    help="internal: run ONE stage in-process (the parent "
                         "orchestrator spawns these as bounded "
                         "subprocesses).  One of: probe, flagship, stokes, "
                         "scaling:<n> (with --scaling-sizes), configs, "
                         "smoke, stokes_large")
    ap.add_argument("--assume-backend", default=None,
                    choices=["tpu", "cpu"],
                    help="internal: trust the parent's probe instead of "
                         "re-probing (cpu pins jax_platforms; tpu leaves "
                         "the default platform order)")
    ap.add_argument("--no-refine", action="store_true",
                    help="internal: skip the mixed-precision time-to-1e-10 "
                         "stage in a scaling child (latency only)")
    args = ap.parse_args()

    if args.stage:
        run_child(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
