"""Multi-chip sharding (parallel/mesh.py) on the virtual 8-device mesh.

Validates the full multichip step — hash-sharded L1 join with a psum
over "shard" plus data-parallel WFA advance over "data" — compiles,
runs, and produces the same numbers as an unsharded single-device run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfmash_tpu.align.wfa_np import Penalties
from wfmash_tpu.parallel.mesh import (
    make_mesh, multichip_step, sharded_hit_counts)

PATCH = Penalties(5, 8, 2, 24, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_multichip_step_runs_2x4():
    mesh = make_mesh(2, 4)
    fn, args = multichip_step(mesh, PATCH, n_steps=8)
    counts, off = fn(*args)
    counts = np.asarray(counts)
    off = np.asarray(off)
    assert counts.shape[0] == args[5].shape[0]
    # seeded hits: problem 0 shares S//2 hashes with the index
    assert counts[0] >= args[5].shape[1] // 2
    assert off.shape == args[0].shape
    # wavefronts advanced: the first mismatch step (s = x = 5) wrote a
    # valid M row beyond the score-0 seed
    assert (off != np.asarray(args[0])).any()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_hit_counts_match_unsharded():
    rng = np.random.default_rng(1)
    B, S, H = 8, 32, 512
    qhash = rng.integers(0, 1 << 30, (B, S), dtype=np.uint32)
    ihash = np.sort(rng.integers(0, 1 << 30, (H,), dtype=np.uint32))
    for b in range(B):
        ihash[b * 16: b * 16 + b] = np.sort(qhash[b, :b])
    ihash = np.sort(ihash)

    mesh = make_mesh(4, 2)
    counts = np.asarray(sharded_hit_counts(
        jnp.asarray(qhash), jnp.asarray(ihash), mesh))

    # unsharded oracle
    idx = np.clip(np.searchsorted(ihash, qhash), 0, H - 1)
    expect = (ihash[idx] == qhash).sum(axis=1)
    np.testing.assert_array_equal(counts, expect)
