"""Multi-chip sharding for mapping and alignment.

The reference scales out via file-based job splitting (target subsets `-b`,
PAF chunking — SURVEY.md §2.7). The TPU-native equivalent expresses the
same decomposition on a `jax.sharding.Mesh`:

* axis "shard": the target minmer index is SHARDED by hash range — the
  spatial version of the reference's serial `-b` subset loop. Each device
  joins the (replicated) query sketches against its local posting slice;
  per-shard hit counts combine with a `psum` over ICI.
* axis "data": query fragments and WFA alignment problems are
  DATA-PARALLEL — each device advances its own batch of wavefronts in
  lockstep; no cross-chip communication is needed inside WFA (the
  blockwise anti-diagonal split for single giant alignments is the
  sequence-parallel extension, later work).

`multichip_step` is the canonical full step (fragment hash join + WFA
wavefront advance) used by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_shard: int, n_data: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_shard * n_data
    dev = np.asarray(devices[: n_shard * n_data]).reshape(n_shard, n_data)
    return Mesh(dev, axis_names=("shard", "data"))


def sharded_hit_counts(query_hashes, index_hashes, mesh: Mesh):
    """Count query sketch hashes present in the (hash-sharded) index.

    query_hashes: (B, S) uint32-pair packed as int64-free 2x uint32? Here
    we use uint32 surrogate keys (the low word) for the join structure;
    exactness of the full 64-bit join lives in the host index (the device
    L1 join uses both words in the production path).

    index_hashes: (H,) sorted uint32, sharded by range across "shard".
    Returns (B,) counts summed over shards.
    """

    def local_count(qh, ih):
        # ih: this device's slice (sorted); count membership
        idx = jnp.searchsorted(ih, qh)
        idx = jnp.clip(idx, 0, ih.shape[0] - 1)
        found = ih[idx] == qh
        counts = found.sum(axis=1).astype(jnp.int32)
        return jax.lax.psum(counts, "shard")

    from jax.experimental.shard_map import shard_map

    return shard_map(
        local_count,
        mesh=mesh,
        in_specs=(P(None, None), P("shard")),
        out_specs=P(None),
    )(query_hashes, index_hashes)


def data_parallel_wfa_steps(off, query_w, target_w, qlen, tlen, mesh: Mesh,
                            n_steps: int, penalties):
    """Advance a data-sharded batch of wavefront rings n_steps scores."""
    from ..align.wfa_jax import _advance, make_blocks

    B, R, _, K = off.shape

    def local_steps(off, query_w, target_w, qlen, tlen):
        axis_q = qlen < 0  # all-False, derived from sharded input (vma-safe)
        mid = tlen // 2
        query_b = make_blocks(query_w)
        target_b = make_blocks(target_w)
        # derive from `off` so the carry is uniformly device-varying
        anc_v = jnp.full_like(off, -1)
        anc_h = jnp.full_like(off, -1)
        open_a = jnp.full_like(off[:, :, :4, :], -1)

        def body(s, carry):
            off, anc_v, anc_h, open_a = carry
            off, anc_v, anc_h, open_a, _, _, _ = _advance(
                off, anc_v, anc_h, open_a, s, query_b, target_b,
                qlen, tlen, axis_q, mid, K, R, penalties,
            )
            return (off, anc_v, anc_h, open_a)

        off, *_ = jax.lax.fori_loop(1, n_steps + 1, body,
                                    (off, anc_v, anc_h, open_a))
        return off

    from jax.experimental.shard_map import shard_map

    return shard_map(
        local_steps,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )(off, query_w, target_w, qlen, tlen)


def multichip_step(mesh: Mesh, penalties, n_steps: int = 8):
    """Build a jitted full step: L1 hash-join over the sharded index +
    data-parallel WFA advance. Returns (fn, example_args)."""
    n_shard = mesh.shape["shard"]
    n_data = mesh.shape["data"]
    from ..align.wfa_jax import ring_size, NEG_I, _pack_words

    R = ring_size(penalties)
    B = 2 * n_data
    K = 129
    L = 256
    S = 16
    H = 64 * n_shard

    rng = np.random.default_rng(0)
    q = rng.integers(65, 69, (B, L), dtype=np.uint8)
    t = q.copy()
    t[:, ::17] = 65  # a few mismatches
    query_w = _pack_words(q)
    target_w = _pack_words(t)
    qlen = np.full(B, L - 8, np.int32)
    tlen = np.full(B, L - 8, np.int32)
    off = np.full((B, R, 5, K), NEG_I, np.int32)
    off[:, 0, 0, K // 2] = 0

    qhash = rng.integers(0, 1 << 30, (B, S), dtype=np.uint32)
    ihash = rng.integers(0, 1 << 30, (H,), dtype=np.uint32)
    ihash[: S // 2] = qhash[0, : S // 2]  # guarantee some hits
    ihash = np.sort(ihash)

    def step(off, query_w, target_w, qlen, tlen, qhash, ihash):
        counts = sharded_hit_counts(qhash, ihash, mesh)
        out = data_parallel_wfa_steps(
            off, query_w, target_w, qlen, tlen, mesh, n_steps, penalties
        )
        return counts, out

    args = (
        jnp.asarray(off), jnp.asarray(query_w), jnp.asarray(target_w),
        jnp.asarray(qlen), jnp.asarray(tlen), jnp.asarray(qhash),
        jnp.asarray(ihash),
    )
    return jax.jit(step), args
