"""Lane-packed 2D convolution kernel for small-channel CNNs (TPU).

XLA's TPU convolution runs the U-FISH c32 U-Net's 3x3 C=32 layers at
~6% of the chip's measured MXU peak: with NHWC channels in the lane
dimension, the implicit GEMM uses 32/128 of the systolic array's rows
AND columns. This kernel reformulates stride-1 SAME convolution so
every matmul is (M, 128) @ (128, g*Co) with the full 128-lane
contraction busy:

- activations stay in their natural NHWC bytes but are VIEWED as
  (N, H*W*C/128, 128): each 128-lane row packs g = 128/C consecutive
  x-positions (C must divide 128),
- a KhxKw kernel becomes Kh*S shifted matmuls (S = #distinct x-group
  shifts, <=3): out_group[m] += X_rows[m + (dy-pad)*W/g + s] @ W[dy, s]
  where W[dy, s] is a host-built (128, g_in*Co) matrix holding
  K[dy, dx, ci, co] at block (p*C+ci, q*Co+co) for every tap whose
  x-offset maps group-local position p to output position q with
  group shift s,
- all shifts are whole VMEM row offsets into a halo-extended window
  (no gathers, no lane shuffles, no relayouts); x-edge zero padding is
  a per-row iota mask on the wrapped rows, y-edge zeroing masks the
  halo rows of the first/last output block.

The y halo rides the `_zyconv_scan_kernel` pattern (`ops/fused_decode`):
a sequential scan over y blocks carries the previous block + its top
halo in VMEM scratch and emits output block j-1 at step j, so each
input element is read from HBM exactly once (three clamped input
streams of the same array measured a >2x compile-time blow-up and a
~40x runtime collapse on this toolchain).

Weights/activations run bf16 with f32 accumulation (CNN inference —
the U-FISH predictor's established compute dtype); bias and the
activation (relu / sigmoid) are fused into the accumulator epilogue.

Replaces `nn.Conv` in the U-FISH fast path (`models/ufish.py`);
reference parity: the CNN itself mirrors
`DataRegistration.py:886-899`'s ONNX U-Net inference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def supported(shape, kernel_shape) -> bool:
    """Can this (N, H, W, Cin) x (kh, kw, Cin, Co) pair run here?"""
    if len(shape) != 4 or len(kernel_shape) != 4:
        return False
    n, h, w, cin = (int(v) for v in shape)
    kh, kw, kcin, co = (int(v) for v in kernel_shape)
    if kcin != cin or kh < 1 or kw < 1 or kh > 3 or kw > 3:
        return False
    if cin < 8 or _LANE % cin != 0:
        return False
    if (w * cin) % _LANE != 0:
        return False
    g = _LANE // cin
    if w % g != 0:
        return False
    if h % 8 != 0:
        return False
    # out lanes: g*Co >= 8 keeps a legal minor dim
    return g * co >= 8


def _tap_matrices(w, g: int) -> dict:
    """(dy, s) -> (128, g*Co) f32 shift matrices for SAME conv.

    out px (g*m + q) pulls in px (g*m + q + dx - pad_lo) = g*(m+s) + p;
    accumulate K[dy, dx, ci, co] into W[dy,s][p*C+ci, q*Co+co].

    Built with jnp so ``w`` may be a tracer (weights are jit ARGUMENTS,
    not baked constants — see `_FastUNet.tree_flatten`); the matrices are
    a few hundred KB total, so the per-call scatter is noise next to the
    convolution itself."""
    kh, kw, cin, co = w.shape
    pad_lo = (kw - 1) // 2
    w = jnp.asarray(w, jnp.float32)
    mats: dict = {}
    for dy in range(kh):
        for dx in range(kw):
            for q in range(g):
                t = q + dx - pad_lo
                s, p = divmod(t, g)
                m = mats.get((dy, s))
                if m is None:
                    m = jnp.zeros((_LANE, g * co), jnp.float32)
                mats[(dy, s)] = m.at[
                    p * cin:(p + 1) * cin, q * co:(q + 1) * co
                ].add(w[dy, dx])
    return mats


def _conv_scan_kernel(x_ref, b_ref, *refs, tap_keys, wg, pad_lo_y,
                      n_blocks, act, out_dtype):
    """Step j emits output block j-1 from (tail, prev, cur-head).

    Scratch invariant entering step j >= 1: ``prev`` holds input block
    j-1, ``tail`` its top halo (the last ``halo`` rows of block j-2,
    zero-masked at the image top). The input index map clamps at the
    last block; the bottom halo is zero-masked at the image bottom."""
    taps_refs = refs[:-3]
    out_ref, prev_ref, tail_ref = refs[-3], refs[-2], refs[-1]
    j = pl.program_id(1)
    m_rows = prev_ref.shape[0]
    halo = wg + 8  # one y line + slack so every slice offset stays >= 0
    cur = x_ref[0]

    @pl.when(j > 0)
    def _emit():
        top = tail_ref[:] * (j > 1).astype(tail_ref.dtype)
        bot = cur[:halo, :] * (j < n_blocks).astype(cur.dtype)
        window = jnp.concatenate([top, prev_ref[:], bot], axis=0)
        gi = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0) % wg
        acc = None
        for (dy, s), ref in zip(tap_keys, taps_refs):
            off = halo + (dy - pad_lo_y) * wg + s
            opnd = jax.lax.slice_in_dim(window, off, off + m_rows, axis=0)
            if s > 0:
                opnd = jnp.where(gi == wg - 1, jnp.zeros_like(opnd), opnd)
            elif s < 0:
                opnd = jnp.where(gi == 0, jnp.zeros_like(opnd), opnd)
            d = jax.lax.dot_general(
                opnd, ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        acc = acc + b_ref[:]
        if act == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif act == "sigmoid":
            acc = jax.nn.sigmoid(acc)
        out_ref[0] = acc.astype(out_dtype)

    @pl.when(j < n_blocks)
    def _carry():
        tail_ref[:] = prev_ref[m_rows - halo:, :]
        prev_ref[:] = cur

    @pl.when(j == 0)
    def _seed():
        prev_ref[:] = cur
        # scratch starts uninitialized; a NaN bit pattern would survive
        # the (j > 1) zero-multiply at the first emit
        tail_ref[:] = jnp.zeros_like(tail_ref)


def conv2d_lanepack(x, w, b, *, act: str = "none", out_dtype=None):
    """Stride-1 SAME 2D convolution, (N, H, W, Cin) x (kh, kw, Cin, Co)
    -> (N, H, W, Co); caller checked :func:`supported`. ``w``/``b`` are
    numpy (host) arrays — tap matrices are built at trace time.

    NOTE the NHWC boundary cost: XLA materializes custom-call operands
    and results in the default layout of their STATED shape, and a
    C<128-minor NHWC shape pads the lane dimension (measured 25.7 vs
    11.6 ms per (4,2048,2048,32) conv — the packed carry wins 2.2x).
    Chains of convolutions should stay in the packed view between
    layers via :func:`conv2d_lanepack_packed` (`_FastUNet` does)."""
    n, h, wd, cin = x.shape
    co = w.shape[-1]
    out = conv2d_lanepack_packed(
        x.reshape(n, h * wd * cin // _LANE, _LANE), (h, wd, cin), w, b,
        act=act, out_dtype=out_dtype,
    )
    return out.reshape(n, h, wd, co)


def conv2d_lanepack_packed(xp, hwc, w, b, *, act: str = "none",
                           out_dtype=None):
    """Packed-I/O lane-packed conv: ``xp`` is the (N, H*W*Cin/128, 128)
    byte view of an NHWC activation (a pure reshape of contiguous NHWC),
    ``hwc`` its logical (H, W, Cin). Returns the packed view of the
    (N, H, W, Co) output, ``(N, H*W*Co/128, 128)``. Keeping the custom
    call's operands/results at 128-lane-minor shapes avoids the padded
    NHWC layout materialization entirely. Requires (W*Co) % 128 == 0 in
    addition to :func:`supported` on the logical shapes."""
    h, wd, cin = (int(v) for v in hwc)
    n = xp.shape[0]
    kh, kw, _, co = w.shape
    if (wd * co) % _LANE != 0:
        raise ValueError(f"packed output needs W*Co % 128 == 0, got {wd}x{co}")
    g = _LANE // cin
    wg = wd // g
    pad_lo_y = (kh - 1) // 2
    mats = _tap_matrices(w, g)
    tap_keys = sorted(mats.keys())
    nl = g * co  # output lanes per row

    # rows per block = ty*wg; ty % 8 == 0
    ty = h
    for cand in (64, 32, 16, 8):
        if h % cand == 0 and cand * wg <= 4096:
            ty = cand
            break
    m_rows = ty * wg
    n_blocks = h // ty
    grid = (n, n_blocks + 1)  # one step past the end (output lag)

    xv = xp
    in_spec = pl.BlockSpec(
        (1, m_rows, _LANE),
        lambda b_, j: (b_, jnp.minimum(j, n_blocks - 1), 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, m_rows, nl),
        lambda b_, j: (b_, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    tap_specs = [
        pl.BlockSpec((_LANE, nl), lambda b_, j: (0, 0),
                     memory_space=pltpu.VMEM)
        for _ in tap_keys
    ]
    bias_tiled = jnp.tile(jnp.asarray(b, jnp.float32), g)[None, :]
    b_spec = pl.BlockSpec((1, nl), lambda b_, j: (0, 0),
                          memory_space=pltpu.VMEM)
    dtype = out_dtype or xp.dtype
    kern = partial(
        _conv_scan_kernel, tap_keys=tap_keys, wg=wg, pad_lo_y=pad_lo_y,
        n_blocks=n_blocks, act=act, out_dtype=dtype,
    )
    tap_args = [jnp.asarray(mats[k], xp.dtype) for k in tap_keys]
    halo = wg + 8
    out = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_compiler_params(),
        in_specs=[in_spec, b_spec] + tap_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h * wg, nl), dtype),
        scratch_shapes=[
            pltpu.VMEM((m_rows, _LANE), xp.dtype),
            pltpu.VMEM((halo, _LANE), xp.dtype),
        ],
    )(xv, bias_tiled, *tap_args)
    # (n, h*wg, g*co) row-major == NHWC bytes: re-view as packed lanes
    return out.reshape(n, h * wd * co // _LANE, _LANE)
