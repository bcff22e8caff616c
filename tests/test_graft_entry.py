"""Driver contract: entry() compiles single-chip; dryrun_multichip shards
the full decode step over a virtual mesh."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    decoded, dist, mag, stats = out
    assert decoded.shape == (1, 8, 128, 128)
    assert stats.shape == (16,)
    assert np.all(np.isfinite(np.asarray(stats)))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
