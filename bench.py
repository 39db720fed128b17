#!/usr/bin/env python
"""Benchmark: the BASELINE.json north star — driven-cavity Jacobian
(Re=1000) setup + solve wall-clock at reference iteration/accuracy
targets (cavity.xml: tol 1e-12, <= 250 GMRES iterations, reference
testSuite/cavity.xml:18-26,50-55).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline semantics: `vs_baseline` is a WALL-CLOCK RATIO —
baseline_seconds / our_seconds (>1 = we are faster) — where the
baseline is a live-measured serial CPU sparse-direct factor+solve
(scipy SuperLU) of the *same matrix* on the bench host.  That is the
same work a reference Newton step does per subdomain with KLU, done
globally: the strongest single-core CPU alternative available here
(Trilinos itself is not installed; scipy ILU is structurally singular
on these saddle-point matrices).  The reference's *achieved* iteration
parity is reported per case in extra.cases[*].iters_f64 against the
reference target cap — parity is a gate (ok flag), not the baseline.

Cases:
  * cavity64_Re1000       — 64^2 driven-cavity Jacobian, Cartesian L=1
                            structured path (the north-star config)
  * stokesB_64            — B-grid Stokes 64^2 (generic path by design)
  * cavity128_Re0         — 128^2 driven cavity (n=49k), skew L=3: the
                            stokes2 flagship on the reference dataset
                            (Jacobian reconstructed + verified at 1e-16
                            against the shipped rhs/sol pair)
  * stokes128_L2          — 128^2 Stokes-C, Cartesian L=2 multilevel
  * stokes32cube_skew_L2  — 32^3 Stokes-C (n=131k), skew, L=2
  * structured_vs_generic — V-cycle apply: structured gather-free vs
                            generic gather path on the cavity64 matrix
                            (vs_baseline = generic/structured)

The 1-core bench host cannot run a real 8-rank CPU baseline (the
north star names 8-rank Trilinos); each case therefore also reports
`vs_8rank_cpu_ideal` = measured-serial-seconds / 8 / ours — the ideal
linear-scaling bound, an upper bound on any real 8-rank run.

Each case runs the TPU-native production path: f32 factorization +
Krylov inside an f64 iterative-refinement loop, fused into a single
XLA program per Newton step (factor + repack + solve, one dispatch).

Measurement notes:
  * The primary `value` is DEVICE time per Newton step, measured by
    fusing the steps into one XLA program (`lax.fori_loop` over the
    step) and delta-timing niter=1 vs niter=REPS+1 — each program
    launch through the remote-TPU tunnel costs ~20-30 ms of fixed
    overhead (an environment artifact, not framework cost), which
    the delta cancels.  The per-dispatch wall-clock (REPS async
    launches, one sync) is reported as extra.per_dispatch_s.
  * All fences go through hymls_tpu.utils.timings.sync();
    block_until_ready resolves at enqueue on this backend.
  * Every case runs in its OWN SUBPROCESS: a TPU worker crash in one
    case (observed once on the 32^3 f64 full-basis solve) must not
    poison the remaining cases.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

_T0 = time.time()


def _progress(msg):
    """Timestamped progress on stderr (the JSON contract is stdout)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

import jax
import jax.numpy as jnp

from hymls_tpu.utils.timings import sync

# persistent compilation cache: TPU AOT compiles are expensive through
# the remote tunnel; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DATA = "/root/reference/testSuite/data/DrivenCavity/64x64/Re1000"
DATA128 = "/root/reference/testSuite/data/DrivenCavity/128x128/Re0"
TARGET_ITERS = 250      # testSuite/cavity.xml "Maximum Iterations"
TOL = 1e-12             # testSuite/cavity.xml "Convergence Tolerance"

# roofline assumptions for the achieved-rate report (TPU v5e / v5
# lite): 819 GB/s HBM; f32 matmul ~ bf16 peak (197 TFLOP/s) / 4
PEAK_HBM_GBPS = 819.0
PEAK_F32_GFLOPS = 49_200.0


def _cavity64():
    """Reference DrivenCavity dataset if present, else the self-
    contained synthetic cavity Jacobian at the same Re."""
    if os.path.isdir(DATA):
        from hymls_tpu.utils.io import read_linear_system
        K, b, x_ex, ns, mass = read_linear_system(DATA)
        return K.tocsr(), np.asarray(b), "reference-data"
    from hymls_tpu.stencils.navier_stokes import cavity_jacobian
    K = cavity_jacobian(64, 64, re=1000.0).tocsr()
    rng = np.random.default_rng(0)
    b = K @ rng.standard_normal(K.shape[0])
    return K, b, "synthetic"


def _cavity128():
    """128^2 DrivenCavity Re0 (the stokes2 flagship problem, n=49k).
    The dataset ships only rhs/sol; the Re0 Jacobian is linear and
    exactly reconstructible — verified against the shipped pair
    (||K sol - rhs||/||rhs|| = 1.4e-16)."""
    from hymls_tpu.stencils.navier_stokes import cavity_jacobian
    K = cavity_jacobian(128, 128, re=0.0).tocsr()
    if os.path.isdir(DATA128):
        from hymls_tpu.utils.io import read_vector
        b = np.asarray(read_vector(os.path.join(DATA128, "rhs.mtx")))
        sol = np.asarray(read_vector(os.path.join(DATA128, "sol.mtx")))
        resid = np.linalg.norm(K @ sol - b) / np.linalg.norm(b)
        assert resid < 1e-12, f"dataset mismatch {resid:.2e}"
        return K, b, "reference-data (reconstructed+verified Jacobian)"
    rng = np.random.default_rng(4)
    b = K @ rng.standard_normal(K.shape[0])
    return K, b, "synthetic"


def _splu_worker(K, b, reps, q):
    import scipy.sparse.linalg as spla
    Kc = K.tocsc()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        lu = spla.splu(Kc)
        x = lu.solve(b)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # min over reps: the CPU's best case — stable under host-load
    # spikes and conservative for the vs_baseline ratio
    relres = float(np.linalg.norm(K @ x - b) / np.linalg.norm(b))
    q.put((best, relres))


# Tracked location: the serial-CPU SuperLU baseline for a given case
# is a property of the (fixed) host class, not of one boot.  Caching
# it in artifacts/ lets a cold machine skip the re-measurement, which
# otherwise contends with the TPU-program compile for CPU time
# (observed on a 1-vCPU host: the overlapped baseline thread starved
# the compile past the case cap).  Delete the file to force a live
# re-measurement; each artifact still records the seconds it used.
_BASELINE_CACHE = os.environ.get(
    "BENCH_BASELINE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "artifacts", "bench_baselines.json"))
# new measurements land in an UNTRACKED sibling overlay so a running
# bench never dirties the tracked seed; reads merge seed <- overlay
_BASELINE_LOCAL = _BASELINE_CACHE.replace(".json", ".local.json")


def _host_id():
    """Coarse host identity for baseline-cache validity: the serial
    SuperLU seconds are a property of the CPU class, not the repo — a
    clone on different hardware must re-measure, not reuse this
    host's numbers (ADVICE r4)."""
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            model = next((l.split(":", 1)[1].strip() for l in f
                          if l.startswith("model name")), "")
    except OSError:
        model = platform.processor()
    return f"{model}/nproc={os.cpu_count()}"


def _cache_get(key):
    merged = {}
    for path in (_BASELINE_CACHE, _BASELINE_LOCAL):
        try:
            with open(path) as f:
                merged.update(json.load(f))
        except (OSError, ValueError):
            pass
    hit = merged.get(key)
    if hit is None:
        return None
    # entries recorded before the host field existed, or on another
    # host class, are not valid for this host
    if hit.get("host") != _host_id():
        return None
    return hit


def _cache_put(key, val):
    val = dict(val, host=_host_id())
    try:
        cache = {}
        if os.path.exists(_BASELINE_LOCAL):
            with open(_BASELINE_LOCAL) as f:
                cache = json.load(f)
        cache[key] = val
        with open(_BASELINE_LOCAL, "w") as f:
            json.dump(cache, f)
    except (OSError, ValueError):
        pass


class _SpluHandle:
    """In-flight SuperLU baseline; .result() joins (deadline-aware)."""

    def __init__(self, key, proc, queue, t0, timebox_total):
        self._key, self._p, self._q = key, proc, queue
        self._t0, self._box = t0, timebox_total
        self._done = None

    def result(self):
        if self._done is not None:
            return self._done
        remaining = max(self._box - (time.perf_counter() - self._t0), 0.0)
        self._p.join(timeout=remaining)
        if self._p.is_alive():
            self._p.terminate()
            self._p.join()
            _progress(f"  splu baseline exceeded {self._box:.0f}s box "
                      "-> reporting lower bound")
            secs, relres, timed_out = self._box, None, True
        else:
            secs, relres = self._q.get()
            timed_out = False
        # timed-out lower bounds are cached WITH their timebox: a rerun
        # with the same (or smaller) box would only reproduce the same
        # lower bound, so reuse it; a larger box re-measures (ADVICE r4:
        # never silently pin a lower bound a bigger budget could beat)
        _cache_put(self._key, {"secs": secs, "relres": relres,
                               "timed_out": timed_out,
                               "timebox": self._box})
        self._done = (secs, relres, timed_out)
        return self._done


class _SpluHit:
    def __init__(self, hit):
        self._done = (hit["secs"], hit["relres"], hit["timed_out"])

    def result(self):
        return self._done


def _splu_baseline_start(K, b, reps=3, timebox=300.0):
    """Start the serial CPU SuperLU factor+solve baseline of the same
    system in a subprocess and return a handle; call .result() for
    (seconds_per_factor_plus_solve, relres, timed_out).

    Started EARLY (before the device setup/compile) so the baseline's
    CPU time hides behind the remote-TPU compiles; callers must join
    BEFORE any device timing so the host stays idle during
    measurement (this box has one CPU core).

    Time-boxed: one 3D factorization at n>100k runs for tens of
    minutes serially — if the box is exceeded the baseline is reported
    as a LOWER BOUND (timed_out=True) and vs_baseline becomes '>='.

    Measurements are cached on disk keyed by (n, nnz) — a same-host
    rerun (e.g. after warming the TPU compile cache) reuses them
    instead of burning the case budget re-factoring."""
    key = f"splu_n{K.shape[0]}_nnz{K.nnz}"
    if K.shape[0] > 100_000:
        reps = 1
    hit = _cache_get(key)
    if hit is not None and not (hit["timed_out"] and
                                timebox * reps > hit.get("timebox", 0)):
        _progress(f"  splu baseline cache hit: {hit['secs']:.4f}s"
                  f"{' (lower bound)' if hit['timed_out'] else ''}")
        return _SpluHit(hit)
    import multiprocessing as mp
    # spawn, not fork: forking the multithreaded JAX process can
    # deadlock; the worker only needs scipy + the pickled matrix
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_splu_worker, args=(K, b, reps, q))
    t0 = time.perf_counter()
    p.start()
    return _SpluHandle(key, p, q, t0, timebox * reps)


def _stokes_params(nx, dim, levels, partitioner, sx=4,
                   maxiter=TARGET_ITERS, tol=TOL):
    from hymls_tpu.config import Params
    prob = {"Equations": "Stokes-C", "Dimension": dim, "nx": nx, "ny": nx}
    if dim == 3:
        prob["nz"] = nx
    return Params({
        "Problem": prob,
        "Solver": {"Krylov Method": "GMRES",
                   "Left or Right Preconditioning": "Right",
                   "Initial Vector": "Zero",
                   "Iterative Solver": {"Maximum Iterations": maxiter,
                                        "Convergence Tolerance": tol}},
        "Preconditioner": {"Partitioner": partitioner,
                           "Separator Length": sx,
                           "Number of Levels": levels},
    })


def _bench_newton(params, K, b, reps, target_iters=TARGET_ITERS,
                  relres_ok=1e-11, extra_fields=None,
                  measure_warm=False):
    """Time REPS fused Newton steps (f32 refactor + repack + IR solve,
    one dispatch each) and the CPU splu baseline on the same matrix.

    Fault tolerance: the separate f64 iteration-parity solve has twice
    crashed the remote TPU worker on the largest (32^3 f64) program
    ("kernel fault", a runtime defect, not a numerics failure).  The
    parity solve therefore runs LAST, after a partial result line has
    already been printed — a worker crash costs the parity count, never
    the timing."""
    from hymls_tpu.stencils import create_testvector
    from hymls_tpu import Solver
    from hymls_tpu.solvers.mixed import IterativeRefinementSolver

    # start the CPU baseline NOW — it hides behind the device
    # setup/compiles below and is joined before any timing
    baseline_h = _splu_baseline_start(K, b)

    tv = create_testvector(params, K)
    S = IterativeRefinementSolver(K, params, testvector=tv)
    _progress(f"  setup n={K.shape[0]}: compute() ...")
    S.compute()
    # NOTE: no S.solve(b) warm-up here — it compiles a SEPARATE fused
    # program (solvers/mixed.py:_fused_jit) that the newton-step timing
    # below never reuses; through the remote-compile tunnel that wasted
    # 60-120 s per case and starved the last (32^3) case's budget
    _progress("  compute() done; timing-program compile ...")

    vals64 = S.op64.vals
    vals32 = S.solver.op.vals
    bj = jnp.asarray(b, jnp.float64)
    newton_fn, dplans, extra, aplans = S.newton_step_fn()
    from jax import lax

    # the fori_loop-fused program exceeds the remote-compile tunnel's
    # request-size limit on the largest cases (observed: HTTP 413 on
    # 32^3 skew L=2, n=131072, after ~15 min of host-side program
    # serialization) — use the standalone newton program there
    big = K.shape[0] > 100_000

    def fused_steps(niter, s0):
        # ONE compile covers compile-warm, delta timing AND the
        # per-dispatch loop (niter is traced; s0 varies the matrix
        # values per dispatch like a Newton sequence would)
        def fbody(i, carry):
            s64 = s0 + 1e-6 * i.astype(jnp.float64)
            rr = newton_fn(vals64 * s64, vals32 * s64.astype(jnp.float32),
                           dplans, extra, aplans, bj)
            return rr.x, jnp.asarray(rr.iters, jnp.int64)
        return lax.fori_loop(0, niter, fbody,
                             (jnp.zeros_like(bj),
                              jnp.zeros((), jnp.int64)))

    elapsed = None
    one = jnp.float64(1.0)
    if big:
        timing = ("per-dispatch minus measured launch overhead "
                  "(fused program too large for the remote-compile "
                  "tunnel at this size)")
        r = newton_fn(vals64, vals32, dplans, extra, aplans, bj)
        sync(r.x)                                     # compile
        baseline = baseline_h.result()  # join BEFORE timing: 1-core host
        _progress(f"  newton compiled; per-dispatch timing {reps} reps ...")
        # MIN over sync-separated dispatches, not the mean of a chained
        # batch: a single tunnel stall inside the chain inflates the
        # mean unboundedly (observed: 3.8 s and 27 s for the SAME
        # program across runs); the min of individually-fenced steps is
        # the honest device time plus one launch overhead
        times = []
        last = None
        for i in range(reps):
            scale32 = jnp.asarray(1.0 + 1e-6 * i, jnp.float32)
            t0 = time.perf_counter()
            r = newton_fn(vals64 * (1.0 + 1e-6 * i), vals32 * scale32,
                          dplans, extra, aplans, bj)
            last = r.x
            sync(last)
            times.append(time.perf_counter() - t0)
        per_dispatch = min(times)
        # measure the fixed per-launch tunnel overhead with a trivial
        # dispatch and subtract it from the per-dispatch wall-clock
        tiny = jax.jit(lambda s: s + 1.0)
        z = jnp.float32(0.0)
        sync(tiny(z))
        ovh = []
        for _ in range(10):
            t0 = time.perf_counter()
            sync(tiny(z))
            ovh.append(time.perf_counter() - t0)
        overhead = min(ovh)
        elapsed = max(per_dispatch - overhead, 1e-9)
        _progress(f"  per-dispatch {per_dispatch:.4f}s - launch "
                  f"overhead {overhead:.4f}s -> {elapsed:.4f} s/step")
        xh = np.asarray(jax.device_get(last))
        final_scale = 1.0 + 1e-6 * (reps - 1)
        inner_iters = int(jax.device_get(r.iters))
    else:
        timing = "fused fori_loop delta (niter=1 vs niter=reps+1)"
        fjit = jax.jit(fused_steps)
        sync(fjit(1, one))                            # the ONE compile
        baseline = baseline_h.result()  # join BEFORE timing: 1-core host
        _progress(f"  compiled; timing {reps} fused reps ...")
        # measure each endpoint TWICE and keep the per-key MIN: the
        # remote tunnel's per-launch latency swings by hundreds of ms,
        # and an inflated t[1] biases the delta LOW (observed: a
        # one-shot delta reported 0.0098 s/step for a program three
        # prior runs measured at 0.039)
        t = {}
        out = {}
        for nit in (1, reps + 1, 1, reps + 1):
            t0 = time.perf_counter()
            res = fjit(nit, one)
            sync(res)
            dt = time.perf_counter() - t0
            t[nit] = min(t.get(nit, float("inf")), dt)
            out[nit] = res
        elapsed = max((t[reps + 1] - t[1]) / reps, 1e-9)
        _progress(f"  fused: {elapsed:.4f} s/step; dispatch timing ...")
        # secondary: per-dispatch wall-clock (includes tunnel launches)
        t0 = time.perf_counter()
        rs = [fjit(1, jnp.float64(1.0 + 1e-6 * i)) for i in range(reps)]
        sync(rs[-1])
        per_dispatch = (time.perf_counter() - t0) / reps
        x_last, it_last = out[reps + 1]
        xh = np.asarray(jax.device_get(x_last))
        final_scale = 1.0 + 1e-6 * reps   # last fori index i = reps
        inner_iters = int(jax.device_get(it_last))

    Kp = K.copy()
    Kp.data = Kp.data * final_scale
    relres = float(np.linalg.norm(Kp @ xh - b) / np.linalg.norm(b))

    # parity has PRIORITY over the secondary timings (VERDICT r4 #1c):
    # reserve its budget up front unless a cached count exists — the
    # factor-only and warm timings are dropped first when tight
    pkey = f"parity_n{K.shape[0]}_nnz{K.nnz}_t{target_iters}"
    parity_reserve = 0.0 if _cache_get(pkey) is not None else 210.0
    budget_left = float(os.environ.get("BENCH_CASE_BUDGET_S", "1e9"))

    def _remaining():
        return budget_left - (time.time() - _T0) - parity_reserve

    base_secs, base_relres, base_timed_out = baseline
    baseline = {"method": "scipy SuperLU factor+solve (serial CPU)",
                "seconds": round(base_secs, 5),
                "relres": base_relres}
    if base_timed_out:
        baseline["note"] = ("time-boxed: seconds is a LOWER BOUND (the "
                            "factorization was still running); "
                            "vs_baseline is therefore '>='")

    # analytic cost model + achieved rates (reference flop counters,
    # src/HYMLS_Preconditioner.cpp:612-680); model flops per Newton
    # step = one factorization + inner_iters * (V-cycle apply + SpMV)
    from hymls_tpu.utils.flops import preconditioner_flops
    fm = preconditioner_flops(S.precond)
    step_flops = fm["compute_flops"] + max(inner_iters, 0) * (
        fm["apply_flops"] + 2.0 * K.nnz)
    achieved_gflops = step_flops / elapsed / 1e9
    cost_model = {
        "compute_gflop": round(fm["compute_flops"] / 1e9, 3),
        "apply_mflop": round(fm["apply_flops"] / 1e6, 3),
        "apply_mb": round(fm["apply_bytes"] / 1e6, 3),
        "model_step_gflop": round(step_flops / 1e9, 3),
        "achieved_gflops": round(achieved_gflops, 2),
        "pct_f32_peak": round(100 * achieved_gflops / PEAK_F32_GFLOPS, 2),
        "peak_assumption": "v5e: 49.2 f32 TFLOP/s (bf16 197/4), "
                           "819 GB/s HBM",
    }
    result = {
        "value": round(elapsed, 5),
        "unit": "seconds/factor+solve",
        "vs_baseline": round(base_secs / elapsed, 3),
        # the north star compares against 8-rank CPU Trilinos; this
        # 1-core host cannot run one (nproc=1), so report the IDEAL
        # linear-scaling bound of the measured serial baseline — an
        # upper bound on any real 8-rank run
        "vs_8rank_cpu_ideal": round(base_secs / 8.0 / elapsed, 3),
        "ok": relres <= relres_ok,
        "baseline": baseline,
        "per_dispatch_s": round(per_dispatch, 5),
        "timing": timing,
        "iters_f64": -1,
        "target_iters": target_iters,
        "ir_inner_iters": inner_iters,
        "relres": relres,
        "cost_model": cost_model,
    }
    if extra_fields:
        result.update(extra_fields)

    def _emit_partial():
        # partial result (everything measured so far, no parity): the
        # line the parent falls back to if a later phase crashes the
        # TPU worker OR the per-case cap kills the child.  Emitted
        # IMMEDIATELY after the primary timing — before the optional
        # factor-only/warm timings — so a cap kill during those can
        # never lose the case (r05: cavity128's secondary compiles
        # overran a 240 s cap; the old ordering would have dropped the
        # whole case)
        partial = dict(result)
        partial["parity"] = ("unavailable (killed/crashed before the "
                             "f64 parity solve)")
        if not partial["ok"]:
            partial["vs_baseline"] = 0.0
        print(json.dumps(partial), flush=True)

    _emit_partial()

    # factor-vs-solve decomposition (VERDICT r3 task 1: "decompose the
    # step"): delta-time the factor-only program when the case budget
    # allows the extra compile; solve_s = step - factor
    factor_s = None
    if not big and _remaining() > 260:
        try:
            P = S.precond
            compute = P._compute_pure
            dpl, ext, apl = P._dplans, P._extra_plan, P._aplans
            afac0 = P.apply_factors_from_pure(
                compute(vals64, dpl, ext), apl)

            def factor_steps(niter, s0, afac):
                def fbody(i, carry):
                    s64 = s0 + 1e-6 * i.astype(jnp.float64)
                    fac = compute(vals64 * s64, dpl, ext)
                    return P.apply_factors_from_pure(fac, apl)
                return lax.fori_loop(0, niter, fbody, afac)

            ffjit = jax.jit(factor_steps)
            sync(ffjit(1, one, afac0))
            tf = {}
            for nit in (1, reps + 1, 1, reps + 1):   # min-of-2: tunnel noise
                t0 = time.perf_counter()
                sync(ffjit(nit, one, afac0))
                tf[nit] = min(tf.get(nit, float("inf")),
                              time.perf_counter() - t0)
            factor_s = max((tf[reps + 1] - tf[1]) / reps, 1e-9)
            _progress(f"  factor-only: {factor_s:.4f} s/step")
        except Exception as e:   # pragma: no cover - bench resilience
            _progress(f"  factor-only timing failed: {e!r}")

    # warm-recompute Newton step (the production continuation path:
    # the reference reuses its analysis via SetMatrix-then-Compute,
    # src/HYMLS_Preconditioner.hpp:246-254; here the dense inverses are
    # Newton-Schulz-polished from the previous step's factors, with a
    # residual-gated cold fallback compiled into the same program) —
    # reported SEPARATELY from the cold step; both are honest: cold =
    # first factorization, warm = every subsequent Newton step
    warm = {}
    if measure_warm and not big and _remaining() > 220:
        try:
            wfn, wdpl, wex, wapl = S.newton_step_warm_fn()
            fac0 = S.precond.factors

            def warm_steps(niter, s0, fac0):
                def wbody(i, carry):
                    _x, _it, fac = carry
                    s64 = s0 + 1e-6 * (i + 1).astype(jnp.float64)
                    rr, fac = wfn(vals64 * s64,
                                  vals32 * s64.astype(jnp.float32),
                                  wdpl, wex, wapl, bj, fac)
                    return rr.x, jnp.asarray(rr.iters, jnp.int64), fac
                return lax.fori_loop(
                    0, niter, wbody,
                    (jnp.zeros_like(bj), jnp.zeros((), jnp.int64), fac0))

            wjit = jax.jit(warm_steps)
            sync(wjit(1, one, fac0))
            tw = {}
            outw = {}
            for nit in (1, reps + 1, 1, reps + 1):   # min-of-2: tunnel noise
                t0 = time.perf_counter()
                res = wjit(nit, one, fac0)
                sync(res)
                tw[nit] = min(tw.get(nit, float("inf")),
                              time.perf_counter() - t0)
                outw[nit] = res
            warm_s = max((tw[reps + 1] - tw[1]) / reps, 1e-9)
            xw, itw, _ = outw[reps + 1]
            xw = np.asarray(jax.device_get(xw))
            Kw = K.copy()
            Kw.data = Kw.data * (1.0 + 1e-6 * (reps + 1))
            wrel = float(np.linalg.norm(Kw @ xw - b) /
                         np.linalg.norm(b))
            warm = {"warm_step_s": round(warm_s, 5),
                    "warm_inner_iters": int(jax.device_get(itw)),
                    "warm_relres": wrel,
                    "warm_ok": wrel <= relres_ok}
            _progress(f"  warm-recompute step: {warm_s:.4f} s/step "
                      f"(relres {wrel:.2e})")
        except Exception as e:   # pragma: no cover - bench resilience
            _progress(f"  warm timing failed: {e!r}")

    if factor_s is not None:
        solve_s = max(elapsed - factor_s, 1e-9)
        # solve-phase HBM traffic model: per inner iteration one f32
        # V-cycle apply (apply_bytes/2) + one f32 SpMV (vals+idx+vec)
        spmv_bytes = 8.0 * K.nnz + 8.0 * K.shape[0]
        solve_gb = max(inner_iters, 1) * (fm["apply_bytes"] / 2 +
                                          spmv_bytes) / 1e9
        gbps = solve_gb / solve_s
        cost_model.update({
            "factor_s": round(factor_s, 5),
            "solve_s": round(solve_s, 5),
            "solve_est_gbps": round(gbps, 1),
            "solve_pct_hbm_roofline": round(100 * gbps / PEAK_HBM_GBPS,
                                            1),
        })
        _emit_partial()

    if warm.get("warm_step_s"):
        result.update(warm)
        result["vs_8rank_cpu_ideal_warm"] = round(
            base_secs / 8.0 / warm["warm_step_s"], 3)
        _emit_partial()

    # parity count cache: the f64 parity solve is deterministic for a
    # fixed matrix + config (Zero start) — a same-host rerun reuses the
    # count instead of re-burning its budget (210 s on the cavity case)
    hit = _cache_get(pkey)
    if hit is not None:
        _progress(f"  f64 parity cache hit: {hit['iters']} iters")
        result["iters_f64"] = hit["iters"]
        result["parity"] = "cached (deterministic Zero-start solve)"
        result["ok"] = bool(relres <= relres_ok and
                            hit["iters"] <= target_iters)
        if not result["ok"]:
            result["vs_baseline"] = 0.0
        return result

    # attempt the parity solve whenever any budget remains: the
    # partial (pre-parity) line is already printed, so a cap kill
    # mid-parity costs nothing beyond the count itself (the secondary
    # timings above were dropped first to protect this slot)
    if budget_left - (time.time() - _T0) < 45:
        result["iters_f64"] = -1
        result["parity"] = "skipped (bench budget)"
        _progress("  budget low: skipping f64 parity solve")
        return result
    _progress("  timing done; f64 iteration-parity solve ...")

    # iteration parity vs the reference target: a mixed f64-GMRES solve
    # has the same count as the all-f64 method
    S64 = Solver(K, S.precond, params, dtype=jnp.float64)
    _, res64 = S64.apply_inverse(b)
    niter = int(res64.iters)
    _progress(f"  f64 parity solve done ({niter} iters)")
    _cache_put(pkey, {"iters": niter})
    result["iters_f64"] = niter
    result["ok"] = bool(relres <= relres_ok and niter <= target_iters)
    if not result["ok"]:
        result["vs_baseline"] = 0.0
    return result


def _bench_apply_modes(params, K, b, reps=400):
    """Structured gather-free apply vs generic gather apply — one
    V-cycle application each (the per-Krylov-iteration cost).

    Device time via the fused fori_loop delta, same as _bench_newton:
    the earlier chained-dispatch version timed ~75 ms of device work
    against per-launch tunnel enqueue costs and swung 2x between runs
    (measured 1.70x then 0.84x on identical code)."""
    from jax import lax
    from hymls_tpu.core.preconditioner import Preconditioner
    from hymls_tpu.stencils import create_testvector

    tv = create_testvector(params, K)
    times = {}
    for mode in ("generic", "structured"):
        p = params.copy()
        p.sublist("Preconditioner")["Structured Apply"] = \
            (mode == "structured")
        P = Preconditioner(K, p, testvector=tv, dtype=jnp.float32)
        P.compute()
        r = jnp.asarray(b, jnp.float32)

        def loop(niter, y, P=P):
            return lax.fori_loop(0, niter,
                                 lambda i, z: P.apply_inverse(z), y)

        fjit = jax.jit(loop)
        sync(fjit(1, r))                 # compile + warm
        t = {}
        for nit in (1, reps + 1, 1, reps + 1):   # min-of-2: tunnel noise
            t0 = time.perf_counter()
            sync(fjit(nit, r))
            t[nit] = min(t.get(nit, float("inf")),
                         time.perf_counter() - t0)
        times[mode] = max((t[reps + 1] - t[1]) / reps, 1e-9)
        _progress(f"  {mode}: {times[mode] * 1e3:.3f} ms/apply")
        if mode == "structured":
            P_struct = P
    # HBM roofline of the V-cycle apply (bandwidth-bound: factor reads
    # + vector traffic, analytic byte count with f32 factors)
    from hymls_tpu.utils.flops import preconditioner_flops
    fm = preconditioner_flops(P_struct)
    gbps = fm["apply_bytes"] / 2 / times["structured"] / 1e9  # f32: /2
    return {
        "value": round(times["structured"], 6),
        "unit": "seconds/apply",
        "vs_baseline": round(times["generic"] / times["structured"], 3),
        "baseline": {"method": "generic gather-path apply (same device)",
                     "seconds": round(times["generic"], 6)},
        "cost_model": {
            "apply_mflop": round(fm["apply_flops"] / 1e6, 3),
            "apply_mb_f32": round(fm["apply_bytes"] / 2 / 1e6, 3),
            "achieved_gbps": round(gbps, 1),
            "pct_hbm_roofline": round(100 * gbps / PEAK_HBM_GBPS, 1),
            "peak_assumption": "v5e: 819 GB/s HBM",
        },
    }


def _run_pallas_case():
    # the Pallas-vs-XLA DIA SpMV decision artifact (VERDICT r2 #9 /
    # r3 #8): one production-scale stencil, recorded speedup +
    # parity error; the 'Use Pallas SpMV' flag default follows this
    from jax import lax
    from hymls_tpu.ops.spmv import DiaOperator
    from hymls_tpu.ops.pallas_spmv import PallasDiaMatvec
    from hymls_tpu.stencils import stokes2d

    K = stokes2d(128, 128)
    op = DiaOperator(K.tocsr(), dtype=jnp.float32)
    bands = op.prepare(op.vals)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(op.n), jnp.float32)

    def time_loop(step, reps=400):
        def loop(niter, y):
            return lax.fori_loop(
                0, niter, lambda i, z: step(z) + 1e-30 * i, y)

        fjit = jax.jit(loop)
        sync(fjit(1, x0))
        t = {}
        for nit in (1, reps + 1, 1, reps + 1):   # min-of-2: tunnel noise
            t0 = time.perf_counter()
            sync(fjit(nit, x0))
            t[nit] = min(t.get(nit, float("inf")),
                         time.perf_counter() - t0)
        return max((t[reps + 1] - t[1]) / reps, 1e-9)

    t_xla = time_loop(lambda x: op.matvec_prepared(bands, x))
    if not PallasDiaMatvec.fits(op.offsets, op.n):
        return {"error": "pallas kernel does not fit vmem",
                "xla_us": round(t_xla * 1e6, 2)}
    try:
        pk = PallasDiaMatvec(op.offsets, op.n)
        t_pal = time_loop(lambda x: pk(bands, x))
    except Exception as e:
        # the decision still gets RECORDED when the kernel cannot
        # compile on this runtime (r05: the remote AOT helper fails
        # to legalize Mosaic output — libtpu version skew; the
        # kernel passes interpret-mode parity tests)
        return {"value": round(t_xla * 1e6, 2), "unit": "us/spmv",
                "vs_baseline": 1.0,
                "baseline": {"method": "XLA shifted-slice DIA SpMV "
                                       "(same device)",
                             "us": round(t_xla * 1e6, 2)},
                "n": op.n, "bands": len(op.offsets),
                "pallas_error": f"{type(e).__name__}: {e}"[:300],
                "decision": "keep opt-in, default OFF: kernel does "
                            "not compile on this runtime (Mosaic/"
                            "libtpu skew in the remote AOT helper); "
                            "production path has a compiled-parity "
                            "self-check + loud fallback either way "
                            "(ops/spmv.py:_pick_pallas)"}
    y0 = np.asarray(op.matvec_prepared(bands, x0))
    y1 = np.asarray(pk(bands, x0))
    err = float(np.abs(y1 - y0).max() / max(np.abs(y0).max(), 1e-30))
    win = t_xla / t_pal
    return {
        "value": round(t_pal * 1e6, 2),
        "unit": "us/spmv",
        "vs_baseline": round(win, 3),
        "baseline": {"method": "XLA shifted-slice DIA SpMV "
                               "(same device)",
                     "us": round(t_xla * 1e6, 2)},
        "n": op.n, "bands": len(op.offsets),
        "max_rel_err": err,
        "decision": ("default ON (wins >=1.1x at parity)"
                     if win >= 1.1 and err < 1e-6 else
                     "keep opt-in (no material win)"),
    }


def _run_case(name):
    """Run ONE case in this process; returns its result dict."""
    if name == "cavity64_Re1000":
        K, b, source = _cavity64()
        params = _stokes_params(64, 2, 1, "Cartesian")
        return _bench_newton(params, K, b, reps=10,
                             extra_fields={"source": source},
                             measure_warm=True)

    if name == "cavity128_Re0":
        # the stokes2 flagship at scale: 128^2 driven cavity (n=49k),
        # skew partitioner, 3 levels, reference targets <=48 iters at
        # 5e-6 (testSuite/integration_tests/stokes2.xml)
        K, b, source = _cavity128()
        p = _stokes_params(128, 2, 3, "Skew Cartesian",
                           maxiter=100, tol=1e-6)
        return _bench_newton(p, K, b, reps=5, target_iters=48,
                             relres_ok=5e-6,
                             extra_fields={"source": source},
                             measure_warm=True)

    if name == "stokes128_L2":
        from hymls_tpu.stencils import create_matrix
        p128 = _stokes_params(128, 2, 2, "Cartesian")
        K128 = create_matrix(p128)
        rng = np.random.default_rng(1)
        b128 = K128 @ rng.standard_normal(K128.shape[0])
        return _bench_newton(p128, K128, b128, reps=5)

    if name == "stokes32cube_skew_L2":
        from hymls_tpu.stencils import create_matrix
        # 3D convergence targets follow the reference's own 3D cases,
        # which are far looser than the 2D ones (stokes1_3D.xml: 130
        # iters at 1.5e-5 on a 16^3 grid): tol 1e-8, cap 500.
        # Num Blocks 60 keeps the f64 parity solve on a short restarted
        # basis: larger f64 bases at n=131k have crashed the TPU worker
        # ("kernel fault") on this runtime — and if it still crashes,
        # the partial-line fallback in _bench_newton keeps the timing
        p3d = _stokes_params(32, 3, 2, "Skew Cartesian",
                             maxiter=500, tol=1e-8)
        p3d.sublist("Solver").sublist("Iterative Solver")[
            "Num Blocks"] = 60
        K3d = create_matrix(p3d)
        rng = np.random.default_rng(2)
        b3d = K3d @ rng.standard_normal(K3d.shape[0])
        return _bench_newton(p3d, K3d, b3d, reps=3,
                             target_iters=500, relres_ok=1e-7)

    if name == "structured_vs_generic_apply":
        K, b, _source = _cavity64()
        params = _stokes_params(64, 2, 1, "Cartesian")
        return _bench_apply_modes(params, K, b)

    if name == "pallas_spmv":
        # the decision is deterministic per runtime: once recorded
        # (speedup or compile failure), reuse it instead of burning
        # ~45 s of the bench budget re-deriving it every run; delete
        # the cache entry to force a re-measure after a runtime change
        hit = _cache_get("pallas_decision_v1")
        if hit is not None:
            return dict(hit["result"], cached=True)
        res = _run_pallas_case()
        if "error" not in res:
            _cache_put("pallas_decision_v1", {"result": res})
        return res

    if name == "stokesB_64":
        # the B-grid flagship runs Apply Dropping=false through the
        # generic gather path (no structured fast path by design —
        # different math); this records its own wall-clock story.
        # 64^2 (n=12k): at the config's native 32^2 (n=3k) the whole
        # device program is launch-bound and a 20 ms CPU SuperLU
        # trivially wins — not a meaningful comparison
        from hymls_tpu.config import load_xml
        from hymls_tpu.stencils import create_matrix
        pb = load_xml(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "configs", "stokes_B.xml"))
        pb.sublist("Problem")["nx"] = 64
        pb.sublist("Problem")["ny"] = 64
        pb.sublist("Solver").sublist("Iterative Solver")[
            "Maximum Iterations"] = TARGET_ITERS
        pb.sublist("Solver").sublist("Iterative Solver")[
            "Convergence Tolerance"] = TOL
        Kb = create_matrix(pb)
        rngb = np.random.default_rng(3)
        bb = Kb @ rngb.standard_normal(Kb.shape[0])
        return _bench_newton(pb, Kb, bb, reps=5)

    raise ValueError(f"unknown case {name!r}")


# headline first; then the two cases that were budget-starved in
# BENCH_r01..r03 get RESERVED slices (VERDICT r3 task 3): the 32^3 case
# second while the budget is fresh, the apply-mode + pallas-decision
# micro-cases third (cheap, device-internal); the remaining ratio cases
# run inside per-case caps so no one case can starve the rest
CASE_ORDER = ["cavity64_Re1000", "stokes32cube_skew_L2",
              "structured_vs_generic_apply", "pallas_spmv",
              "cavity128_Re0", "stokes128_L2", "stokesB_64"]

# per-case wall-clock caps (seconds): bound each child so later cases
# always get a slot.  Calibrated against the measured r05 warm-cache
# runs: cavity64 ~90 s, 32^3 ~380 s (setup ~240 s of it: matrix
# assembly + 262 MB plan-cache unpickle on a 1-vCPU host), the small
# cases 40-120 s; the early-partial emit above means a cap kill during
# the optional secondary timings still keeps the case's primary result
CASE_CAP_S = {"cavity64_Re1000": 240, "stokes32cube_skew_L2": 420,
              "structured_vs_generic_apply": 100, "pallas_spmv": 80,
              "cavity128_Re0": 200, "stokes128_L2": 200,
              "stokesB_64": 150}


_ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH.json")


def _assemble_result(cases, t_all, device):
    head = cases.get("cavity64_Re1000", {})
    return {
        "metric": "cavity64_Re1000_factor_plus_solve",
        "value": head.get("value", -1.0),
        "unit": "seconds",
        "vs_baseline": head.get("vs_baseline", 0.0),
        "extra": {
            "vs_baseline_semantics":
                "baseline_seconds / our_seconds (>1 = faster than the "
                "live-measured serial-CPU SuperLU direct factor+solve "
                "of the same system on this host); value = device "
                "seconds per fused Newton step (factor+repack+solve), "
                "extra.cases[*].per_dispatch_s = wall-clock including "
                "the remote-tunnel launch overhead",
            "device": device,
            "path": "structured f32 factor + fused f32-Krylov/f64-IR",
            "bench_wall_s": round(time.time() - t_all, 1),
            "cases": cases,
        },
    }


def _write_artifact(cases, t_all, device, final):
    """Persist the full result to BENCH.json after every case: the
    stdout tail can truncate (BENCH_r03 lost the headline value to the
    driver's 2000-char capture), the disk artifact cannot."""
    try:
        result = _assemble_result(cases, t_all, device)
        # honest self-describing status (ADVICE r4): driver_finished
        # means the case loop ran to its end, nothing more; the ok /
        # error counts say how many cases actually produced numbers
        result["extra"]["driver_finished"] = final
        result["extra"]["cases_ok"] = sum(
            1 for c in cases.values() if "error" not in c)
        result["extra"]["cases_error"] = sum(
            1 for c in cases.values() if "error" in c)
        with open(_ARTIFACT, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:     # pragma: no cover - bench resilience
        pass


def _tunnel_alive(timeout_s=75):
    """Probe the remote-TPU tunnel with a tiny jit IN A SUBPROCESS (a
    wedged tunnel hangs the calling thread unrecoverably).  The axon
    service wedges intermittently for minutes at a time — observed
    twice on 2026-08-21, once turning a 6/7-case run into 0/7 — and
    recovers on its own; callers should wait, not burn case budgets."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda a:(a@a).sum())"
            "(jnp.ones((128,128)))))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL,
                           timeout=timeout_s)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:       # pragma: no cover - bench resilience
        return False


def _await_tunnel(deadline, t_all):
    """Block until the tunnel answers or ~deadline; returns alive."""
    while True:
        if _tunnel_alive():
            return True
        left = deadline - (time.time() - t_all)
        _progress(f"  TPU tunnel unresponsive; waiting "
                  f"({left:.0f}s of budget left) ...")
        if left < 150:
            return False
        time.sleep(20)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        # child mode: one case, one JSON line on stdout
        name = sys.argv[2]
        _progress(f"case {name} ...")
        print(json.dumps(_run_case(name)))
        return

    t_all = time.time()
    # later cases are skipped once the elapsed wall-clock passes this
    # budget so the headline JSON line is ALWAYS printed well inside
    # the driver's timeout (cold TPU compiles through the remote
    # tunnel can take minutes per program); default leaves ~60s margin
    # under the driver's 900s
    budget = float(os.environ.get("BENCH_BUDGET_S", "840"))
    # probe (and if needed wait out, up to ~6 min) the tunnel BEFORE
    # spending any case budget: an outage at start otherwise eats
    # every cap; if it stays dead we still attempt the first case —
    # the per-case timeout + post-timeout wait handle the rest
    _await_tunnel(min(budget, 500.0), time.time())
    device = str(jax.devices()[0])
    _progress(f"device {device}; budget {budget:.0f}s")
    cases = {}
    here = os.path.abspath(__file__)

    tunnel_dead = False
    # one retry per failed case, budget permitting: the remote runtime
    # throws transient errors (observed: FAILED_PRECONDITION on a case
    # that passed twice before and after with identical code)
    queue = list(CASE_ORDER)
    retried = set()
    while queue:
        name = queue.pop(0)
        remaining = budget - (time.time() - t_all)
        if cases.get(name, {}).get("error") is None and name in cases:
            continue
        if cases and remaining < 60:
            cases[name] = {"error": "bench budget exhausted"}
            continue
        if tunnel_dead:
            # an earlier case found the tunnel wedged and the wait-out
            # failed; don't burn the remaining caps on a dead service
            cases[name] = {"error": "TPU tunnel unresponsive"}
            continue
        # each case in its own subprocess: a TPU worker crash must not
        # poison the remaining cases (observed once: 32^3 f64
        # full-basis solve "kernel fault").  Per-case caps (CASE_CAP_S)
        # bound every child so a slow early case can never starve the
        # later ones (BENCH_r01..r03 lost the 32^3 and apply-mode cases
        # to exactly that); the cap never exceeds the remaining budget
        # (+grace) so the total stays bounded by budget + grace.
        case_budget = min(max(remaining, 120),
                          CASE_CAP_S.get(name, 240))
        try:
            env = dict(os.environ,
                       BENCH_CASE_BUDGET_S=str(case_budget))
            proc = subprocess.run(
                [sys.executable, here, "--case", name],
                stdout=subprocess.PIPE, stderr=None, env=env,
                timeout=case_budget + 30)
            lines = [l for l in proc.stdout.decode().splitlines()
                     if l.startswith("{")]
            if lines:
                # last parseable line: the full result, or the partial
                # (pre-parity) line if the f64 parity solve crashed the
                # TPU worker after timing completed
                cases[name] = json.loads(lines[-1])
                if proc.returncode != 0:
                    cases[name]["subprocess_rc"] = proc.returncode
            else:
                cases[name] = {"error":
                               f"case subprocess rc={proc.returncode}"}
        except subprocess.TimeoutExpired as e:
            # the child may have printed its partial (pre-parity)
            # result line before hanging — use it
            out = (e.stdout or b"").decode(errors="replace")
            lines = [l for l in out.splitlines() if l.startswith("{")]
            if lines:
                cases[name] = json.loads(lines[-1])
                cases[name]["subprocess_rc"] = "timeout"
            else:
                cases[name] = {"error": "case subprocess timeout"}
                # a silent timeout (no progress at all) is the wedged-
                # tunnel signature: probe, and WAIT it out rather than
                # feeding the remaining cases to a dead service
                # (observed 2026-08-21: an outage turned a 6/7 run
                # into 0/7 by consuming every cap)
                if not _await_tunnel(budget, t_all):
                    tunnel_dead = True
                    cases[name]["error"] += " (TPU tunnel unresponsive)"
        except Exception as e:      # pragma: no cover - bench resilience
            cases[name] = {"error": repr(e)}
        if "error" in cases.get(name, {}) and name not in retried \
                and not tunnel_dead \
                and budget - (time.time() - t_all) > 90:
            retried.add(name)
            _progress(f"  case {name} failed "
                      f"({cases[name]['error'][:60]}); retrying once")
            queue.append(name)
        _write_artifact(cases, t_all, device, final=False)

    _write_artifact(cases, t_all, device, final=True)
    result = _assemble_result(cases, t_all, device)
    result["extra"]["artifact"] = _ARTIFACT
    print(json.dumps(result))


if __name__ == "__main__":
    main()
