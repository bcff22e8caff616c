"""Fused elementwise Pallas kernels for the RLGC iteration body (TPU).

Between the three FFT convolutions, each RLGC iteration runs two
elementwise+reduction chains (reference `utils/rlgc.py:616-700`: the
split-KLD evaluation + update ratios, and the consensus-gated update +
convergence statistics + safe-mode restore). XLA lowers each chain to
3-4 separate fusions because the reductions (KLD normalizers, max
statistics) split the elementwise work — ~11 full HBM sweeps per chain
at the padded volume size. Each kernel here is ONE pass: every input is
read once, every output written once, and the reductions come out as
tiny per-block partial rows the caller folds with O(grid) XLA work.

KLD decomposition: `_kl_div` normalizes p and q before the log, which
needs global sums. With P = p/Σp, Q = q/Σq:

    Σ' P (log P − log Q)
      = (1/Σp) Σ' p·log(p/q)  −  log(Σp/Σq) · (Σ'p / Σp)

where Σ' ranges over the entries the reference keeps (mask > 0 AND
p > 0 — its NaN→0 zeroing drops exactly the p ≤ 0 entries). The kernel
emits the six partials (Σp, Σq₁, Σq₂, Σ'p, Σ't₁, Σ't₂); the caller
assembles both KLDs from scalars.

The observed-region mask is rebuilt in-kernel from iota comparisons and
the static pad bounds — same trick as
`fftutils.observed_region_mask_device`, zero HBM cost.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_EPS_KLD = 1e-4


def fused_elementwise_supported(shape) -> bool:
    """Shape gate for the flat (rows, nx) view both kernels use."""
    if len(shape) != 3:
        return False
    nz, ny, nx = (int(v) for v in shape)
    return nx % _LANE == 0 and (nz * ny) % 8 == 0


def _rows_block(rows: int, nx: int, n_bufs: int) -> int:
    """Largest row block dividing ``rows`` with n_bufs live+double-buffered
    copies inside a conservative VMEM budget."""
    cap = max((8 * 1024 * 1024) // (nx * 4 * n_bufs), 8)
    for cand in (512, 384, 256, 128, 64, 32, 16, 8):
        if cand <= cap and rows % cand == 0:
            return cand
    return rows


def _mask2d(j, blk, shape, bounds):
    """Observed-region mask for rows [j·blk, (j+1)·blk) of the flattened
    (nz·ny, nx) view, from iotas + static pad bounds."""
    nz, ny, nx = shape
    (zb, za), (yb, ya), (xb, xa) = bounds
    ridx = jax.lax.broadcasted_iota(jnp.int32, (blk, nx), 0) + j * blk
    z = ridx // ny
    y = ridx - z * ny
    x = jax.lax.broadcasted_iota(jnp.int32, (blk, nx), 1)
    return (
        (z >= zb) & (z < nz - za)
        & (y >= yb) & (y < ny - ya)
        & (x >= xb) & (x < nx - xa)
    )


def _stat_tile(stats):
    """Pack scalar (1,1) stats into lanes [0..k) of row 0 of an
    (8, 128) tile (8 sublanes is the minimum f32 tile height Mosaic
    accepts for an output block; rows 1-7 stay zero)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0)
    tile = jnp.zeros((8, _LANE), jnp.float32)
    for k, s in enumerate(stats):
        tile = tile + jnp.where((row == 0) & (lane == k), s, 0.0)
    return tile


def _ratio_kld_kernel(hu_ref, s1_ref, s2_ref, r1_ref, r2_ref, st_ref, *,
                      shape, bounds, blk):
    j = pl.program_id(0)
    hu = hu_ref[:]
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    m = _mask2d(j, blk, shape, bounds)
    mf = m.astype(jnp.float32)
    denom = 0.5 * (hu + 1e-12)
    r1_ref[:] = mf * (s1 / denom)
    r2_ref[:] = mf * (s2 / denom)
    p = (hu + _EPS_KLD) * mf
    q1 = (s1 + _EPS_KLD) * mf
    q2 = (s2 + _EPS_KLD) * mf
    keep = m & (hu + _EPS_KLD > 0.0)
    lg = jnp.log(hu + _EPS_KLD)
    t1 = jnp.where(keep, p * (lg - jnp.log(s1 + _EPS_KLD)), 0.0)
    t2 = jnp.where(keep, p * (lg - jnp.log(s2 + _EPS_KLD)), 0.0)
    pk = jnp.where(keep, p, 0.0)
    ssum = lambda a: jnp.sum(a, axis=(0, 1), keepdims=True)
    tile = _stat_tile(
        [ssum(p), ssum(q1), ssum(q2), ssum(pk), ssum(t1), ssum(t2)]
    )
    # persistent accumulator: the output block's index map is constant, so
    # the same (8, 128) VMEM tile is revisited by every grid step and only
    # flushed to HBM at the end (the Pallas TPU reduction idiom)
    @pl.when(j == 0)
    def _init():
        st_ref[:] = jnp.zeros_like(st_ref)

    st_ref[:] += tile


def ratio_kld(hu, split1, split2, pad_width):
    """One-pass ratios + KLD partials on the padded volume.

    Returns (ratio1, ratio2, (kld1, kld2)) matching
    ``mask*(split/denom)`` and `rlgc._kl_div`(Hu, split, mask) exactly
    (up to reduction order); one HBM read per input, one write per
    ratio, KLD folded from per-block partials.
    """
    nz, ny, nx = hu.shape
    shape = (nz, ny, nx)
    rows = nz * ny
    blk = _rows_block(rows, nx, 12)
    grid = (rows // blk,)
    spec = pl.BlockSpec((blk, nx), lambda j: (j, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((8, _LANE), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    bounds = tuple((int(b), int(a)) for b, a in pad_width)
    kern = partial(_ratio_kld_kernel, shape=shape, bounds=bounds, blk=blk)
    flat = lambda a: a.reshape(rows, nx)
    r1, r2, st = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, nx), jnp.float32),
            jax.ShapeDtypeStruct((rows, nx), jnp.float32),
            jax.ShapeDtypeStruct((8, _LANE), jnp.float32),
        ),
    )(flat(hu), flat(split1), flat(split2))
    sums = st[0]
    sp, sq1, sq2, spp, st1, st2 = (sums[k] for k in range(6))
    frac = spp / sp
    kld1 = st1 / sp - jnp.log(sp / sq1) * frac
    kld2 = st2 / sp - jnp.log(sp / sq2) * frac
    unflat = lambda a: a.reshape(nz, ny, nx)
    return unflat(r1), unflat(r2), (kld1, kld2)


def _update_select_kernel(c_ref, rec_ref, prev_ref, ht_ref, flag_ref,
                          nr_ref, np_ref, st_ref, *, shape, bounds, blk):
    j = pl.program_id(0)
    c = c_ref[:]
    rec = rec_ref[:]
    prev = prev_ref[:]
    ht = ht_ref[:]
    restore = flag_ref[0] > 0.5
    m = _mask2d(j, blk, shape, bounds)
    mf = m.astype(jnp.float32)
    upd = jnp.where(c < 0.0, rec, rec * ht)
    nr_ref[:] = jnp.where(restore, prev, upd)
    np_ref[:] = jnp.where(restore, prev, rec)
    ssum = lambda a: jnp.sum(a, axis=(0, 1), keepdims=True)
    smax = lambda a: jnp.max(a, axis=(0, 1), keepdims=True)
    tile = _stat_tile([
        ssum((c >= 0.0).astype(jnp.float32) * mf),
        smax(upd * mf),
        smax(jnp.abs(upd - rec) * mf),
    ])
    # persistent (8, 128) accumulator block (constant index map): lane 0
    # folds by sum, lanes 1-2 by max (all stats are >= 0, so a zero init
    # is the identity for both folds)
    @pl.when(j == 0)
    def _init():
        st_ref[:] = jnp.zeros_like(st_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)
    acc = st_ref[:]
    st_ref[:] = jnp.where(lane == 0, acc + tile, jnp.maximum(acc, tile))


def update_select(consensus, recon, prev_recon, ht, should_restore,
                  pad_width):
    """One-pass consensus-gated update + safe-mode restore select +
    convergence statistics.

    Returns (new_recon_pre_boundary, new_prev, num_updated, max_new,
    max_abs_delta). The caller re-enforces the symmetric boundary on
    new_recon (prev_recon already satisfies it, and the elementwise
    select commutes with the pad-region rewrite).
    """
    nz, ny, nx = consensus.shape
    shape = (nz, ny, nx)
    rows = nz * ny
    blk = _rows_block(rows, nx, 14)
    grid = (rows // blk,)
    spec = pl.BlockSpec((blk, nx), lambda j: (j, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((8, _LANE), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    bounds = tuple((int(b), int(a)) for b, a in pad_width)
    kern = partial(_update_select_kernel, shape=shape, bounds=bounds,
                   blk=blk)
    flat = lambda a: a.reshape(rows, nx)
    flag = should_restore.astype(jnp.float32).reshape(1)
    nr, np_, st = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, spec, spec, flag_spec],
        out_specs=(spec, spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, nx), jnp.float32),
            jax.ShapeDtypeStruct((rows, nx), jnp.float32),
            jax.ShapeDtypeStruct((8, _LANE), jnp.float32),
        ),
    )(flat(consensus), flat(recon), flat(prev_recon), flat(ht), flag)
    num_updated = st[0, 0]
    max_new = st[0, 1]
    max_abs_delta = st[0, 2]
    unflat = lambda a: a.reshape(nz, ny, nx)
    return unflat(nr), unflat(np_), num_updated, max_new, max_abs_delta
