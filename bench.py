"""Benchmark: MERFISH decode throughput on one TPU chip.

Measures the flagship hot path — Gaussian lowpass + fused Pallas
nearest-codeword decode (scale → clip → L2-normalize → MXU matmul →
argmax + thresholds) — on a production-shaped tile slab
(16 bits × 8 z × 2048 × 2048, the reference camera frame size).

Metric: decoded output voxels per second per chip. vs_baseline compares
against the reference CUDA pipeline's effective decode rate (~1e8
voxels/s on an RTX 3090-class GPU, derived from the published "decode ≈
0.5 week" for the 42-tile × 20-sample-tile × 5-iteration MOp experiment,
`examples/zhuang_lab/00_readme.txt`; no voxels/sec is published —
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_VOXELS_PER_SEC = 1.0e8  # RTX 3090-class reference estimate


def main() -> None:
    import jax

    # persistent compile cache: first bench run pays the (tunnel) compile,
    # subsequent runs start timing immediately
    jax.config.update("jax_compilation_cache_dir", "/tmp/merfish3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from merfish3d_tpu.ops import decode as dec
    from merfish3d_tpu.ops.filters import gaussian_lowpass
    from merfish3d_tpu.ops.fused_decode import fused_lowpass_decode

    platform = jax.devices()[0].platform
    use_pallas = platform == "tpu"
    n_bits, n_words = 16, 120
    nz, ny, nx = 32, 1024, 1024

    rng = np.random.default_rng(0)
    cb = np.zeros((n_words, n_bits), np.float32)
    for i in range(n_words):
        cb[i, rng.choice(n_bits, 4, replace=False)] = 1.0
    codebook_t = jnp.asarray(dec.normalize_codebook(cb).T)
    background = jnp.zeros(n_bits, jnp.float32)
    normalization = jnp.full(n_bits, 50.0, jnp.float32)
    # generate the slab on-device (a host->device copy of 2 GB would time
    # the PCIe/tunnel, not the kernel)
    tile = (
        jax.random.uniform(jax.random.PRNGKey(0), (n_bits, nz, ny, nx), jnp.float32)
        * 120.0
    )
    tile.block_until_ready()

    if use_pallas:
        # 3-pass fused Pallas pipeline (lowpass + decode, bits-major layout)
        def step(tile):
            return fused_lowpass_decode(
                tile,
                codebook_t,
                background,
                normalization,
                sigma=(3.0, 1.0, 1.0),
                magnitude_threshold=(0.9, 10.0),
                distance_threshold=0.5176,
            )

    else:

        def step(tile):
            lp = gaussian_lowpass(tile, sigma=(3.0, 1.0, 1.0))
            return dec.decode_planes(
                lp,
                codebook_t,
                background,
                normalization,
                magnitude_threshold=(0.9, 10.0),
                distance_threshold=0.5176,
                use_pallas=False,
            )

    step_jit = jax.jit(step)

    # block_until_ready can be a no-op through remote-device tunnels, so
    # force completion with a scalar readback and chain iterations through
    # a data dependency.
    def sync(x):
        return float(jnp.sum(x))

    out = step_jit(tile)
    sync(out[1][0, 0, :8])  # compile + warm-up

    t0 = time.perf_counter()
    for _ in range(10):
        sync(tile[0, 0, 0, :8])
    readback_rtt = (time.perf_counter() - t0) / 10

    # single-device execution is in-order: the readback of the final output
    # cannot complete before all prior dispatched steps have executed
    n_iters = 5
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iters):
        del out
        out = step_jit(tile)
    sync(out[1][0, 0, :8])
    elapsed = time.perf_counter() - t0 - readback_rtt

    voxels = nz * ny * nx * n_iters
    vps = voxels / elapsed
    print(
        json.dumps(
            {
                "metric": "decode_voxels_per_sec_per_chip",
                "value": round(vps, 1),
                "unit": "voxel/s",
                "vs_baseline": round(vps / REFERENCE_VOXELS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
