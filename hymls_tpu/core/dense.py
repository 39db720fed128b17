"""Backend-aware dense factorization of a single (large) matrix.

The coarsest-level system (reference CoarseSolver, Amesos KLU —
src/HYMLS_CoarseSolver.cpp:131-248) is the one place a *single* large
dense factorization appears; everything else is batched small blocks.
The right factorization differs per backend:

  * accelerator (TPU): explicit inverse.  XLA:TPU has no f64 LU and
    triangular solves serialize badly, while an inverse-matmul apply
    rides the MXU; `_inv`-style f32 factor + f64 Newton polish is used
    upstream.
  * CPU (tests, comparison runs): LAPACK f64 getrf is native; an
    explicit inverse + Newton polish of an n~10^4 coarse system costs
    ~9x more flops than keeping the LU factors (measured: 500 s vs
    tens of s for the stokes1 128^2 L=2 coarse system, n=12320).

`dense_factor` returns a pytree (dict) and `dense_solve` dispatches on
its static structure, so the choice is baked in at trace time.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

# below this size the explicit inverse is cheap on any backend; keeping
# it avoids pytree-structure churn in the common (small-coarse) case
_LU_THRESHOLD = 2048


def on_accelerator() -> bool:
    return jax.default_backend() not in ("cpu",)


# TRUE-dtype products: a default-precision f32 matmul on TPU is one
# bf16 pass; every residual/refinement product here must be exact-f32
# class (see gj_inverse note and hymls_tpu/__init__).
_HI = jax.lax.Precision.HIGHEST


def gj_inverse(A):
    """Batched Gauss-Jordan inverse with partial pivoting as pure
    elementwise/one-hot VPU ops (no custom calls, no chunking, no
    per-batch dynamic indexing: pivot row selection and swap are
    one-hot masked reductions under a lax.fori_loop over columns).

    XLA's jnp.linalg.inv lowers to LU + triangular-inverse custom
    calls that run column-serial and need lax.map chunking against a
    scoped-vmem cap — ~42 ms of the 161 ms cavity128 factor step for
    a few hundred MFLOP of work.  This formulation keeps the whole
    batch resident and vector-parallel.  Numerics: standard partial
    pivoting (the one-hot argmax picks the largest |pivot| row), same
    error class as LU+solve; exact-singular pivots pass through as
    1.0 to keep NaNs out (callers mask empty/padded blocks)."""
    B, n, _ = A.shape
    dtype = A.dtype
    W = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))], axis=2)
    iota = jnp.arange(n)
    iota2 = jnp.arange(2 * n)

    # one-hot picks MUST be value-exact: a default-precision f32
    # einsum on TPU runs as ONE bf16 pass, rounding every extracted
    # row/column to 2^-8 — which silently degraded every GJ inverse to
    # bf16 quality (round 4: stokes128 L=2 inner iterations blew up
    # 150 -> 558 through exactly this).  HIGHEST splits the operands
    # into bf16 triples whose one-hot products reconstruct the f32
    # values exactly.
    HI = jax.lax.Precision.HIGHEST

    def step(k, W):
        selk = (iota2 == k).astype(dtype)                 # col-k pick
        colk = jnp.einsum("bij,j->bi", W, selk, precision=HI)
        cand = jnp.where(iota[None, :] >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(cand, axis=1)                      # (B,)
        onep = (iota[None, :] == p[:, None]).astype(dtype)
        onek = (iota[None, :] == k).astype(dtype)
        rowp = jnp.einsum("bij,bi->bj", W, onep, precision=HI)  # (B, 2n)
        rowk = jnp.einsum("bij,bi->bj", W, onek, precision=HI)
        W = W + onek[:, :, None] * (rowp - rowk)[:, None, :] \
              + onep[:, :, None] * (rowk - rowp)[:, None, :]
        piv = jnp.einsum("bj,j->b", rowp, selk, precision=HI)
        piv = jnp.where(piv == 0, jnp.ones_like(piv), piv)
        rowk_s = rowp / piv[:, None]
        colk2 = jnp.einsum("bij,j->bi", W, selk, precision=HI)
        factor = jnp.where(iota[None, :] == k,
                           jnp.zeros_like(colk2), colk2)
        W = W - factor[:, :, None] * rowk_s[:, None, :]
        W = W * (1.0 - onek[:, :, None]) + onek[:, :, None] * \
            rowk_s[:, None, :]
        return W

    W = jax.lax.fori_loop(0, n, step, W)
    return W[:, :, n:]


def _batched_inv(A):
    """Batched inverse, chunked when the batch is too large for one
    XLA InvertDiagBlocksUpperTriangular call: TPU scoped vmem caps the
    batched triangular-inverse at ~16 MiB (observed: f32[1296,82,82]
    fails), so big batches run as lax.map over fixed-size chunks —
    sequential chunks, full MXU parallelism within each."""
    # ACCURACY requires more than XLA's stock inverse on TPU:
    # XLA:TPU's LU + triangular-inverse lowering runs its internal
    # matmuls at default (single-bf16-pass) precision, producing
    # forward-inaccurate explicit inverses — measured on the stokes128
    # L=2 coarse Schur matrix f32[435,435]: the jnp.linalg.inv result
    # differs from the CPU LAPACK inverse by 76x relative and spreads
    # the preconditioned spectrum until the f32 inner GMRES burns 558
    # iterations (CPU: 150).  For the non-batched (2-D) case — the
    # coarse factor, the largest single dense op in the factor chain —
    # the fix is the XLA inverse as a SEED plus residual-adaptive
    # Newton-Schulz polish with precision=HIGHEST products: the polish
    # contracts quadratically, scrubbing the bf16 taint in <=3 steps of
    # two MXU matmuls each.  Measured on the cavity64 coarse system
    # f32[1891,1891] (v5e): GJ 93.6 ms / relerr 1.3e-3 vs seed+NS3
    # 10.9 ms / relerr 1.0e-6 — 8.6x faster AND ~1000x more accurate
    # (GJ's one-hot rank-1 fori_loop is n sequential full-matrix
    # sweeps: pure HBM latency).  HYMLS_COARSE_INV_2D=gj restores the
    # old path for A/B.
    if A.ndim < 3:
        if (on_accelerator() and A.dtype == jnp.float32
                and A.shape[-1] > 1):
            if os.environ.get("HYMLS_COARSE_INV_2D", "ns") == "gj":
                gj_2d_max = int(os.environ.get("HYMLS_GJ_2D_MAX_N",
                                               "4096"))
                if A.shape[-1] <= gj_2d_max:
                    return gj_inverse(A[None])[0]
            X = jnp.linalg.inv(A)
            return _newton_refine(A, X, max_steps=3)
        return jnp.linalg.inv(A)
    n = A.shape[-1]
    batch = int(np.prod(A.shape[:-2]))
    # Gauss-Jordan beats the XLA LU+triangular-inverse custom-call chain
    # in the many-small-blocks regime (measured v5e: 9.3x at
    # f32[2112,17,17], 1.3x at f32[101,72,72]); its column-serial
    # fori_loop is latency-bound for large n or tiny batches, so gate on
    # both.  f32-only: the f64 callers refine an f32 seed anyway.
    # Above the speed knee the accuracy argument still applies, so the
    # batched path also prefers GJ up to HYMLS_GJ_MAX_N (default raised
    # 96 -> 256 after the coarse-inverse finding above).
    gj_max_n = int(os.environ.get("HYMLS_GJ_MAX_N", "256"))
    if (on_accelerator() and A.dtype == jnp.float32
            and 1 < n <= gj_max_n and batch >= 2):
        return gj_inverse(A.reshape(batch, n, n)).reshape(A.shape)
    bytes_per = n * n * A.dtype.itemsize
    # TPU scoped vmem for the batched triangular-inverse custom call is
    # ~4.2x the chunk's input bytes against a 16 MiB limit (measured:
    # f32[155,82,82] = 4.2 MiB input wants 17.66 MiB scoped).  Default
    # chunks target 2 MiB (scoped ~8.4 MiB, half the limit): fewer
    # lax.map trips than the earlier 1 MiB — the loop plumbing (chunk
    # copies + dynamic-update-slices) showed up at ~1/3 of the
    # factor-path inverse cost in the stokes128 xplane trace.
    chunk_mib = float(os.environ.get("HYMLS_INV_CHUNK_MIB", "2"))
    chunk = max(1, int(chunk_mib * (1 << 20)) // max(bytes_per, 1))
    if batch <= chunk or not on_accelerator():
        return jnp.linalg.inv(A)
    flat = A.reshape(batch, n, n)
    nb = -(-batch // chunk)
    pad = nb * chunk - batch
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        flat = jnp.concatenate([flat, eye])
    out = jax.lax.map(jnp.linalg.inv, flat.reshape(nb, chunk, n, n))
    return out.reshape(nb * chunk, n, n)[:batch].reshape(A.shape)


def _newton_refine(A, X, max_steps: int, tol: float = 1e-13):
    """Residual-adaptive Newton iteration X <- X(2I - AX) = X + X(I-AX).

    Runs until max(|I - AX|) <= tol or max_steps, whichever first; the
    contraction is quadratic (rho_{k+1} = rho_k^2), so a f32-accurate
    seed (rho ~ cond*6e-8) reaches f64 residual level in 1 step for
    cond <~ 1e4 and in 2-3 steps for cond up to ~1e7; beyond that
    (rho0 >= 1) Newton cannot recover a f32 seed and the loop exits on
    the step cap without diverging further (the body is skipped once
    the residual stops improving)."""
    if A.size == 0:            # empty batch/level: nothing to refine
        return X
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)

    def resid(X):
        return jnp.max(jnp.abs(eye - jnp.matmul(A, X, precision=_HI)))

    def cond_fn(state):
        X, r, it = state
        return (r > tol) & (it < max_steps)

    def body_fn(state):
        X, r, it = state
        R = eye - jnp.matmul(A, X, precision=_HI)
        Xn = X + jnp.matmul(X, R, precision=_HI)
        rn = resid(Xn)
        # guard against divergence (rho0 >= 1): keep the better iterate
        keep = rn <= r
        Xn = jnp.where(keep, Xn, X)
        rn = jnp.where(keep, rn, r)
        return Xn, rn, it + 1

    X, r, _ = jax.lax.while_loop(
        cond_fn, body_fn, (X, resid(X), jnp.asarray(0, jnp.int32)))
    return X


def inv_newton(A, refine: int = 6, force_mixed: bool = False):
    """(Batched) dense inverse.

    TPU has no f64 LU (XLA LuDecomposition supports F32/C64 only), so in
    f64 on an accelerator we factor in f32 and Newton-refine the inverse
    in f64 — X <- X(2I - AX) — which needs only matmuls and converges
    quadratically (1e-7 -> ~1e-13 in one step; iteration counts are
    insensitive to factor precision, verified in tests).  The refinement
    is residual-adaptive (VERDICT r1 item 7): up to `refine` steps, early
    exit at residual 1e-13, so well-conditioned blocks pay one step and
    ill-conditioned ones (periodic Schur complements, cond ~1e7) get the
    extra steps they need.  On CPU (and in f32) this is a plain
    LAPACK/XLA inverse.  `force_mixed` exercises the accelerator path on
    CPU for testing."""
    if A.dtype == jnp.float64 and (on_accelerator() or force_mixed):
        X = _batched_inv(A.astype(jnp.float32)).astype(jnp.float64)
        return _newton_refine(A, X, max_steps=refine)
    X = _batched_inv(A)
    if A.dtype == jnp.float64 and refine:
        # Newton polish: explicit inverses of ill-conditioned blocks
        # (e.g. periodic Schur complements) lose ~cond*eps; this
        # recovers residual-level accuracy at one matmul pair per step
        X = _newton_refine(A, X, max_steps=refine)
    return X


def inv_chain(A, force_hybrid: bool = False):
    """(Batched) dense inverse for the FACTOR-UPCAST values chain:
    accurate to ~cond^2*eps32^2 (1e-9-class for the subdomain interior
    blocks), not to f64 residual level.

    Rationale: in factor-upcast mode the factors are cast to f32 (6e-8)
    at the end — chain accuracy beyond ~1e-9 buys nothing.  The f64
    arithmetic exists to stop the multilevel Schur cancellation from
    amplifying f32 rounding (kappa ~1e5-1e6 at the coarse level), and
    kappa * 1e-9 is already below the f32 apply noise floor.  So:
    f32 seed inverse + ONE fixed Newton step with a hybrid precision
    split — the residual R = I - A X must be f64 (it IS a cancellation),
    but the correction X @ R can be f32 since |R| ~ 1e-5 makes its
    rounding O(1e-12).  Costs one f32 batched inverse + one emulated-f64
    matmul + one f32 matmul; measured 9x faster than the adaptive
    `inv_newton` refinement on (1024,47,47) f64 (262 ms -> ~30 ms on
    v5e).  Falls back to inv_newton for f32 inputs / CPU."""
    if A.dtype != jnp.float64 or \
            (not on_accelerator() and not force_hybrid):
        # f32 input: plain inverse; CPU: native f64 LU beats the hybrid
        return inv_newton(A)
    X32 = _batched_inv(A.astype(jnp.float32))
    X = X32.astype(jnp.float64)
    R = jnp.eye(A.shape[-1], dtype=A.dtype) - jnp.matmul(A, X, precision=_HI)
    dX = jnp.matmul(X32, R.astype(jnp.float32),
                    precision=_HI).astype(jnp.float64)
    return X + dX


def warm_inv(A, X0, fresh_fn=None, accept=0.25, max_steps=4, tol=None):
    """Warm-started (batched) dense inverse for value-only recomputes
    (Newton / continuation sequences, the reference's SetMatrix-then-
    Compute pattern, src/HYMLS_Preconditioner.cpp:400-517 re-run).

    When the previous step's inverse X0 still contracts
    (max|I - A X0| < accept), polish it with residual-adaptive
    Newton-Schulz — 2 batched matmuls per step riding the MXU — instead
    of re-running the serialized LU + triangular-inverse; quadratic
    convergence reaches the dtype residual floor in 1-3 steps for the
    modest per-step matrix changes of a Newton loop.  Otherwise fall
    back to `fresh_fn(A)` (both lax.cond branches compile, one
    executes).  Costs one extra matmul (the seed residual) relative to
    a cold factorization."""
    if fresh_fn is None:
        fresh_fn = inv_newton
    if A.size == 0:
        return fresh_fn(A)
    X0 = X0.astype(A.dtype)
    if tol is None:
        tol = 1e-13 if A.dtype == jnp.float64 else 1e-6
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    r0 = jnp.max(jnp.abs(eye - jnp.matmul(A, X0, precision=_HI)))
    return jax.lax.cond(
        r0 < accept,
        lambda: _newton_refine(A, X0, max_steps=max_steps, tol=tol),
        lambda: fresh_fn(A))


def warm_inv_chain(A, X0):
    """`inv_chain` with the f32 seed factorization replaced by a
    Newton-Schulz polish of the previous step's (store-dtype) inverse;
    the hybrid f64 residual step is unchanged, so the result has the
    same ~cond^2*eps32^2 accuracy class as the cold chain.  Falls back
    to the cold path inside the lax.cond when the seed doesn't
    contract."""
    if A.dtype != jnp.float64 or not on_accelerator():
        return warm_inv(A, X0, fresh_fn=inv_newton)
    A32 = A.astype(jnp.float32)
    X0 = X0.astype(jnp.float32)
    if A.size == 0:
        return inv_chain(A)
    eye32 = jnp.eye(A.shape[-1], dtype=jnp.float32)
    r0 = jnp.max(jnp.abs(eye32 - jnp.matmul(A32, X0, precision=_HI)))
    X32 = jax.lax.cond(
        r0 < 0.25,
        lambda: _newton_refine(A32, X0, max_steps=4, tol=1e-6),
        lambda: _batched_inv(A32))
    X = X32.astype(jnp.float64)
    R = jnp.eye(A.shape[-1], dtype=A.dtype) - jnp.matmul(A, X, precision=_HI)
    dX = jnp.matmul(X32, R.astype(jnp.float32),
                    precision=_HI).astype(jnp.float64)
    return X + dX


def dense_factor(A) -> dict:
    """Factor one (unbatched) dense system for repeated solves."""
    n = A.shape[-1]
    if on_accelerator() or n <= _LU_THRESHOLD or A.ndim != 2:
        return {"inv": inv_newton(A)}
    lu, piv = jax.scipy.linalg.lu_factor(A)
    return {"lu": lu, "piv": piv}


def dense_solve(fac: dict, rhs):
    """Solve against a `dense_factor` result; rhs (n,) or (n, k)."""
    if "inv" in fac:
        return jnp.matmul(fac["inv"], rhs, precision=_HI)
    return jax.scipy.linalg.lu_solve((fac["lu"], fac["piv"]), rhs)
