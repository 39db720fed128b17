"""Pallas TPU kernel: fused offset-diagonal (DIA) SpMV.

The stencil matvec y = sum_k band_k * shift(x, off_k) is the
per-Krylov-iteration hot op outside the preconditioner apply
(reference Epetra_CrsMatrix::Multiply, HYMLS_BaseSolver.cpp solve
loop).  The XLA lowering of `DiaOperator.matvec_prepared` fuses the k
shifted multiply-adds into one loop, but each output element still
issues k independent HBM reads of x (one per band) on top of the k
band reads — ~2k*n*4 bytes per matvec.

This kernel keeps the (padded) x vector resident in VMEM for the
whole sweep and streams only the bands, cutting HBM traffic to
(k+1)*n*4 bytes — asymptotically 2x on the bandwidth-bound op.  The
band offsets are static (Python-unrolled), so each tile is k VPU
fused multiply-adds over unaligned-but-contiguous VMEM slices.

f32-only: Mosaic has no f64 vector path; the f64 operators keep the
XLA lowering (the production mixed-precision solve runs its Krylov
inner loop in f32, which is exactly where the matvec count is).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic specific; keep import-safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover - environment without pallas
    HAVE_PALLAS = False

# whole-x VMEM residency cap: v5e has ~16 MB VMEM/core; leave room
# for the band tile + accumulator + double buffering
_VMEM_X_BYTES = 6 * 1024 * 1024


def _imap(t):
    # block index map: must stage as i32 — under jax_enable_x64 a bare
    # (0, t) returns i64 and Mosaic fails legalizing the i64
    # func.return on the current libtpu
    import jax.lax as lax
    return (np.int32(0), lax.convert_element_type(t, np.int32))


def _kernel(x_ref, bands_ref, y_ref, *, offsets, block, pad_al):
    # Mosaic requires lane-dimension slice starts to be provable
    # 128-multiples: split each offset into an aligned window load
    # plus a static sub-128 lane roll (off = 128*q + r, 0 <= r < 128)
    t = pl.program_id(0)
    acc = None
    for j, off in enumerate(offsets):
        q, r = divmod(off, 128)
        start = pl.multiple_of(t * block + pad_al + 128 * q, 128)
        w = x_ref[0:1, pl.ds(start, block + 128)]
        if r:
            # want out[i] = w[i + r]; pltpu.roll requires shift >= 0,
            # so roll by width - r (cyclic equivalence).  The shift
            # must stage as i32: under jax_enable_x64 a bare Python int
            # becomes i64 and Mosaic's tpu.dynamic_rotate rejects it
            w = pltpu.roll(w, shift=np.int32(block + 128 - r), axis=1)
        term = bands_ref[j:j + 1, :] * w[:, :block]
        acc = term if acc is None else acc + term
    y_ref[...] = acc


class PallasDiaMatvec:
    """Compiled fused DIA matvec for a fixed offset set.

    __call__(bands, x): bands (k, n) f32, x (n,) f32 -> y (n,) f32,
    identical (up to f32 rounding order) to
    ``DiaOperator.matvec_prepared``.
    """

    def __init__(self, offsets, n: int, block: int = 2048,
                 interpret: bool = False):
        if not HAVE_PALLAS:
            raise RuntimeError("pallas unavailable")
        offsets = [int(o) for o in np.asarray(offsets).tolist()]
        if not offsets:
            raise ValueError("empty offset set")
        self.offsets = tuple(offsets)
        self.n = int(n)
        pad = max(max(abs(o) for o in offsets), 1)
        # aligned halo: covers the largest |offset| rounded up to the
        # 128-lane boundary, plus one extra 128 so every window load
        # (block + 128 wide) stays inside x_pad
        self.pad_al = 128 * (pad // 128 + 2)
        # lane-aligned tile; a tiny problem gets one whole-array tile.
        # block MUST stay a 128-multiple: the kernel's
        # pl.multiple_of(start, 128) hint would otherwise be false —
        # a silent miscompile on real TPU (interpret mode can't catch
        # it), so round up and assert
        block = -(-block // 256) * 256
        block = min(block, -(-self.n // 256) * 256)
        assert block % 128 == 0, f"block {block} not a 128-multiple"
        self.block = block
        self.grid = -(-self.n // block)
        self.n_r = self.grid * block
        self._call = pl.pallas_call(
            functools.partial(_kernel, offsets=self.offsets,
                              block=block, pad_al=self.pad_al),
            out_shape=jax.ShapeDtypeStruct((1, self.n_r), jnp.float32),
            grid=(self.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),      # full x_pad
                pl.BlockSpec((len(offsets), block), _imap,
                             memory_space=pltpu.VMEM),      # band tile
            ],
            out_specs=pl.BlockSpec((1, block), _imap,
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    @staticmethod
    def fits(offsets, n: int) -> bool:
        """Whole padded x must be VMEM-resident for the fused sweep."""
        pad = int(max((abs(int(o)) for o in np.asarray(offsets).tolist()),
                      default=1))
        pad_al = 128 * (pad // 128 + 2)
        return HAVE_PALLAS and (n + 2 * pad_al + 2048) * 4 <= _VMEM_X_BYTES

    def pad_bands(self, bands):
        """(k, n) -> (k, n_r), done ONCE at prepare() time so the
        per-matvec path doesn't re-copy the bands (a k*n HBM copy per
        call outside jit loops)."""
        bands = jnp.asarray(bands, jnp.float32)
        if bands.shape[1] == self.n_r:
            return bands
        return jnp.pad(bands, ((0, 0), (0, self.n_r - self.n)))

    def __call__(self, bands, x):
        x = jnp.asarray(x, jnp.float32)
        bands_r = self.pad_bands(bands)
        x_pad = jnp.pad(x, (self.pad_al, self.pad_al + self.n_r - self.n))
        y = self._call(x_pad[None, :], bands_r)
        return y[0, :self.n]
