"""Fused Pallas decode pipeline: separable Gaussian lowpass + MERFISH
nearest-codeword decode in three explicit HBM passes.

XLA's conv lowering keeps materializing bits-minor relayout copies (8x
HBM padding) for the (bits, Z, Y, X) lowpass, so the hot path owns its
layout explicitly with bits in sublanes and X in lanes throughout:

1. one XLA symmetric pad for Y and X only — the Z symmetric pad is a
   linear map on z and is FOLDED into the banded conv matrix (measured:
   XLA's symmetric pad costs ~20 ms/axis on a 2 GB volume vs ~10 ms for
   a single constant pad),
2. ``_zconv_kernel``  — z conv as an MXU banded matmul ``Wz' (nz_t, nz)``
   (boundary reflection included in the weights) producing the z-major
   intermediate layout; grid over (bits, Y blocks),
3. ``_yconv_kernel``  — the y halo is covered by passing the input twice
   with block index maps ``j`` and ``j+1`` (requires ``tile_y >= 2*ry``),
   so all BlockSpecs stay non-overlapping,
4. ``_xconv_decode_kernel`` — grid (Z, Y) tiles, fusing the x-conv with
   scale → clip → L2-normalize → MXU codebook matmul → argmax + threshold
   assignment; similarities never leave VMEM.

Every block spans the full padded X (x-tiled blocks measured DMA-bound at
512 B strided runs). Numerics match ``gaussian_lowpass`` +
``decode_planes`` (tested in interpret mode on CPU; ``bench.py`` runs this
on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import _gaussian_kernel1d


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel_or_identity(sigma: float) -> np.ndarray:
    if sigma and sigma > 0:
        return _gaussian_kernel1d(float(sigma))
    return np.ones(1, np.float32)


def _zconv_kernel(vol_ref, wz_ref, out_ref):
    """z conv as an MXU banded matmul: Wz' (nz_t, nz) — symmetric boundary
    folded into the weights — contracts the UNPADDED z axis of the
    (bits, nz, ty, xp) block → z-major (nz_t, bits, ty, xp) output."""
    out_ref[:] = jax.lax.dot_general(
        wz_ref[:],
        vol_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )



def _yconv_kernel(v0_ref, v1_ref, kern_ref, out_ref, *, taps: int, tile_y: int):
    # z-major blocks: (tz, bits, 2*ty, tx)
    vol = jnp.concatenate([v0_ref[:], v1_ref[:]], axis=2)
    acc = kern_ref[0, 0] * vol[:, :, 0:tile_y]
    for k in range(1, taps):
        acc += kern_ref[0, k] * vol[:, :, k : k + tile_y]
    out_ref[:] = acc


def _xconv_decode_kernel(
    vol_ref, kern_ref, exch_ref, cb_ref, bg_ref, norm_ref, thr_ref,
    decoded_ref, dist_ref, mag_ref, scaled_ref,
    *, taps: int, nx: int, rx: int,
):
    # z-major block: (tz, bits, ty, nx_t); actual data in lanes [0, nx).
    # The symmetric x halo is built in VMEM: flip == matmul with the
    # (rx, rx) exchange matrix (lane-axis flips lower poorly on TPU).
    vol = vol_ref[:, :, :, 0:nx]
    if rx > 0:
        left = jax.lax.dot_general(
            vol_ref[:, :, :, 0:rx], exch_ref[:],
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        right = jax.lax.dot_general(
            vol_ref[:, :, :, nx - rx : nx], exch_ref[:],
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        xped = jnp.concatenate([left, vol, right], axis=-1)
    else:
        xped = vol
    acc = kern_ref[0, 0] * xped[:, :, :, 0:nx]
    for k in range(1, taps):
        acc += kern_ref[0, k] * xped[:, :, :, k : k + nx]
    tz, bits_p, ty, _ = acc.shape
    # leading-dim transpose (tile relabeling, no intra-tile shuffle)
    traces = acc.transpose(1, 0, 2, 3).reshape(bits_p, tz * ty * nx)
    scaled = jnp.clip((traces - bg_ref[:]) / norm_ref[:], 0.0, 1.0)
    mag = jnp.sqrt(jnp.sum(scaled * scaled, axis=0, keepdims=True))
    unit = scaled / jnp.maximum(mag, 1e-12)
    # f32 codebook matmul: a split-bf16 formulation (3 bf16 passes) was
    # measured SLOWER end-to-end (703 vs 932 Mvox/s) — the K=16 f32
    # contraction overlaps with the pass's memory traffic, and the split
    # temporaries forced a smaller tile_z
    sims = jnp.dot(cb_ref[:], unit, preferred_element_type=jnp.float32)
    best = jnp.argmax(sims, axis=0).astype(jnp.int32)
    max_sim = jnp.max(sims, axis=0)
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * max_sim, 0.0))
    lo = thr_ref[0, 0]
    hi = thr_ref[0, 1]
    dthr = thr_ref[0, 2]
    assigned = (dist <= dthr) & (mag[0] >= lo) & (mag[0] <= hi)
    # partial-lane stores: block lanes beyond nx are alignment junk, cropped
    # by the caller
    decoded_ref[:, :, 0:nx] = jnp.where(assigned, best, -1).reshape(tz, ty, nx)
    dist_ref[:, :, 0:nx] = dist.reshape(tz, ty, nx)
    mag_ref[:, :, 0:nx] = mag.reshape(tz, ty, nx)
    # scaled is already bits-major out of the normalize step
    scaled_ref[:, :, :, 0:nx] = scaled.reshape(bits_p, tz, ty, nx)


def _pad_const(x, size, axis, value):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(
    jax.jit,
    static_argnames=(
        "sigma", "magnitude_threshold", "distance_threshold",
        "tile_z", "tile_y", "tile_b", "tile_y1", "stages",
    ),
)
def fused_lowpass_decode(
    volume: jnp.ndarray,  # (bits, Z, Y, X) float32
    codebook_t: jnp.ndarray,  # (bits, words) L2-normalized
    background: jnp.ndarray,
    normalization: jnp.ndarray,
    *,
    sigma=(3.0, 1.0, 1.0),
    magnitude_threshold=(1.5, 10.0),
    distance_threshold: float = 0.5176,
    tile_z: int = 2,
    tile_y: int = 8,
    tile_b: int = 1,
    tile_y1: int = 8,  # pass-1 y block (pass 1 has no y halo)
    stages: int = 3,  # profiling: stop after pass N (0=pad, 1, 2) returning it raw
):
    """Returns (decoded int16, magnitude f16, distance f16, scaled f16)."""
    bits, nz, ny, nx = volume.shape
    kz_np = _kernel_or_identity(sigma[0])
    kz = jnp.asarray(kz_np)
    ky = jnp.asarray(_kernel_or_identity(sigma[1]))
    kx = jnp.asarray(_kernel_or_identity(sigma[2]))
    rz, ry, rx = (int(k.shape[0] - 1) // 2 for k in (kz, ky, kx))
    if 2 * ry > tile_y:
        tile_y = _round_up(2 * ry, 8)

    words = codebook_t.shape[1]
    bits_p = max(8, _round_up(bits, 8))
    words_p = max(8, _round_up(words, 8))

    nz_t = _round_up(nz, tile_z)
    ny_t = _round_up(ny, tile_y)
    nx_t = _round_up(nx, 128)  # lane alignment
    zp = nz_t + 2 * rz
    # one extra tile_y block row covers the 2*ry halo for pass 2's dual
    # blocks; rounded up so pass 1's (larger) y blocks also tile it
    yp = _round_up(ny_t + tile_y, tile_y1)
    # every block spans the full (alignment-padded) X: contiguous DMA runs
    # (x-tiled blocks gave 512 B strided runs — DMA-bound). The symmetric x
    # HALO is built inside pass 3 (exchange-matrix flip), so X needs only
    # lane alignment here.
    xp = nx_t

    # Host pad covers only Y (+ X lane alignment): the Z symmetric pad is a
    # LINEAR map on z folded into the banded conv matrix below; the X halo
    # is built in-kernel in pass 3.
    padded = jnp.pad(
        volume,
        ((0, 0), (0, 0), (ry, yp - ny - ry), (0, xp - nx)),
        mode="symmetric",
    )
    if bits_p > bits:
        padded = _pad_const(padded, bits_p, 0, 0.0)
    if stages == 0:
        return padded

    # banded z weights with the symmetric pad folded in:
    # padded_z = S @ vol_z with S[p, i] = [idx[p] == i] where idx is the
    # np.pad symmetric index map; Wz' = Wz_banded @ S has shape (nz_t, nz)
    taps_z = int(kz_np.shape[0])
    pad_idx = np.pad(np.arange(nz), (rz, zp - nz - rz), mode="symmetric")
    wz_np = np.zeros((nz_t, nz), np.float32)
    for o in range(nz_t):
        for k in range(taps_z):
            wz_np[o, pad_idx[o + k]] += kz_np[k]
    wz = jnp.asarray(wz_np)

    # ---- pass 1: z conv → z-major (nz, bits, y, x)
    z_out = pl.pallas_call(
        _zconv_kernel,
        grid=(bits_p // tile_b, yp // tile_y1),
        in_specs=[
            pl.BlockSpec((tile_b, nz, tile_y1, xp), lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nz_t, nz), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nz_t, tile_b, tile_y1, xp), lambda b, j: (0, b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nz_t, bits_p, yp, xp), jnp.float32),
    )(padded, wz)
    if stages == 1:
        return z_out

    # ---- pass 2: y conv via dual shifted blocks (y halo <= tile_y)
    y_out = pl.pallas_call(
        partial(_yconv_kernel, taps=int(ky.shape[0]), tile_y=tile_y),
        grid=(nz_t // tile_z, ny_t // tile_y),
        in_specs=[
            pl.BlockSpec((tile_z, bits_p, tile_y, xp),
                         lambda z, j: (z, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_z, bits_p, tile_y, xp),
                         lambda z, j: (z, 0, j + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, int(ky.shape[0])), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_z, bits_p, tile_y, xp), lambda z, j: (z, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nz_t, bits_p, ny_t, xp), jnp.float32),
    )(z_out, z_out, ky[None, :])
    if stages == 2:
        return y_out

    # ---- pass 3: x conv + decode, full padded X per block
    cb_p = _pad_const(_pad_const(codebook_t.T, bits_p, 1, 0.0), words_p, 0, -1.0)
    bg_p = _pad_const(background[:, None], bits_p, 0, 0.0)
    norm_p = _pad_const(normalization[:, None], bits_p, 0, 1.0)
    thr = jnp.asarray(
        [[magnitude_threshold[0], magnitude_threshold[1], distance_threshold, 0.0]],
        jnp.float32,
    )
    exch = jnp.asarray(np.eye(max(rx, 1), dtype=np.float32)[::-1].copy())
    decoded, dist, mag, scaled = pl.pallas_call(
        partial(_xconv_decode_kernel, taps=int(kx.shape[0]), nx=nx, rx=rx),
        grid=(nz_t // tile_z, ny_t // tile_y),
        in_specs=[
            pl.BlockSpec((tile_z, bits_p, tile_y, xp),
                         lambda z, j: (z, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, int(kx.shape[0])), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(rx, 1), max(rx, 1)), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((words_p, bits_p), lambda z, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bits_p, 1), lambda z, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bits_p, 1), lambda z, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda z, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_z, tile_y, nx_t), lambda z, j: (z, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_z, tile_y, nx_t), lambda z, j: (z, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_z, tile_y, nx_t), lambda z, j: (z, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bits_p, tile_z, tile_y, nx_t), lambda z, j: (0, z, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nz_t, ny_t, nx_t), jnp.int32),
            jax.ShapeDtypeStruct((nz_t, ny_t, nx_t), jnp.float32),
            jax.ShapeDtypeStruct((nz_t, ny_t, nx_t), jnp.float32),
            jax.ShapeDtypeStruct((bits_p, nz_t, ny_t, nx_t), jnp.float32),
        ),
    )(y_out, kx[None, :], exch, cb_p, bg_p, norm_p, thr)

    return (
        decoded[:nz, :ny, :nx].astype(jnp.int16),
        mag[:nz, :ny, :nx].astype(jnp.float16),
        dist[:nz, :ny, :nx].astype(jnp.float16),
        scaled[:bits, :nz, :ny, :nx].astype(jnp.float16),
    )


def fused_decode_volume(
    bit_volume: np.ndarray,  # (bits, Z, Y, X) host array
    codebook_matrix: np.ndarray,  # (words, bits) raw 0/1
    background: np.ndarray,
    normalization: np.ndarray,
    *,
    sigma=(3.0, 1.0, 1.0),
    magnitude_threshold=(1.5, 10.0),
    distance_threshold: float,
    y_slab: int = 512,
    hbm_budget_bytes: int = 12 << 30,
):
    """Host wrapper: run the fused pipeline on the whole volume when it
    fits the HBM budget, else stream y-slabs with symmetric-halo overlap
    (the TPU analog of the reference per-z-plane loop, keeping full-z
    context for the σ_z lowpass)."""
    from .decode import normalize_codebook

    vol = np.asarray(bit_volume, np.float32)
    bits, nz, ny, nx = vol.shape
    cb_t = jnp.asarray(normalize_codebook(codebook_matrix).T)
    bg = jnp.asarray(background, jnp.float32)
    norm = jnp.asarray(normalization, jnp.float32)
    kw = dict(
        sigma=tuple(sigma),
        magnitude_threshold=tuple(magnitude_threshold),
        distance_threshold=float(distance_threshold),
    )
    # working set ≈ input + 2 intermediates + outputs ≈ 4x volume
    if 4 * vol.nbytes <= hbm_budget_bytes:
        d, m, di, s = fused_lowpass_decode(jnp.asarray(vol), cb_t, bg, norm, **kw)
        return (np.asarray(d), np.asarray(m), np.asarray(di), np.asarray(s))

    ry = int(4.0 * sigma[1] + 0.5) if sigma[1] > 0 else 0
    decoded = np.empty((nz, ny, nx), np.int16)
    mag = np.empty((nz, ny, nx), np.float16)
    dist = np.empty((nz, ny, nx), np.float16)
    scaled = np.empty((bits, nz, ny, nx), np.float16)
    for y0 in range(0, ny, y_slab):
        y1 = min(y0 + y_slab, ny)
        ys, ye = max(0, y0 - ry), min(ny, y1 + ry)
        block = vol[:, :, ys:ye]
        pad_y = (y_slab + 2 * ry) - block.shape[2]
        if pad_y > 0:  # static shape across slabs → one compile; symmetric
            # so the bottom-slab context matches the whole-volume reflection
            block = np.pad(
                block, ((0, 0), (0, 0), (0, pad_y), (0, 0)), mode="symmetric"
            )
        d, m, di, s = fused_lowpass_decode(jnp.asarray(block), cb_t, bg, norm, **kw)
        lo = y0 - ys
        hi = lo + (y1 - y0)
        decoded[:, y0:y1] = np.asarray(d)[:, lo:hi]
        mag[:, y0:y1] = np.asarray(m)[:, lo:hi]
        dist[:, y0:y1] = np.asarray(di)[:, lo:hi]
        scaled[:, :, y0:y1] = np.asarray(s)[:, :, lo:hi]
    return decoded, mag, dist, scaled
