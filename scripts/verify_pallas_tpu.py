"""On-hardware verification: the compiled Pallas sweep must be
bit-identical to the XLA sweep (scores + crossing anchors) on random
mutated pairs, both penalty sets. Run on a machine with a real TPU:

    python scripts/verify_pallas_tpu.py

(tests/ run the same comparison in interpret mode on CPU.)"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from wfmash_tpu.align.wfa_np import Penalties
from wfmash_tpu.align import wfa_jax as WJ
from wfmash_tpu.align import wfa_pallas as WP


def mutate(q, rng, sub=0.05, ind=0.01):
    t = []
    for ch in q:
        r = rng.random()
        if r < sub:
            t.append(int(b"ACGT"[rng.integers(0, 4)]))
        elif r < sub + ind:
            if rng.random() < 0.5:
                t.append(ch); t.append(int(b"ACGT"[rng.integers(0, 4)]))
            # else deletion
        else:
            t.append(ch)
    return np.array(t, np.uint8)


def run_case(rng, B, L, K, p, seed_mode="auto"):
    ms, ns, qs, ts = [], [], [], []
    for i in range(B):
        m = int(rng.integers(L // 2, L))
        q = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
        t = mutate(q, rng)
        ms.append(len(q)); ns.append(len(t)); qs.append(q); ts.append(t)

    def pow2(x):
        return 1 << max(3, (int(x) - 1).bit_length())

    Lq = pow2(max(ms) + WJ.EXT_BYTES + 8)
    Lt = pow2(max(ns) + WJ.EXT_BYTES + 8)
    Lq = max(Lq, 1024)
    Lt = max(Lt, 1024)
    query = np.full((B, Lq), 0x01, np.uint8)
    target = np.full((B, Lt), 0x02, np.uint8)
    for i in range(B):
        query[i, :ms[i]] = qs[i]
        target[i, :ns[i]] = ts[i]
    qlen = np.array(ms, np.int32)
    tlen = np.array(ns, np.int32)
    axis_q = qlen > tlen
    mid = np.where(axis_q, qlen // 2, tlen // 2).astype(np.int32)

    # --- XLA reference (odd K' = K+1) ---
    Kx = K + 1
    R = WJ.ring_size(p)
    off = np.full((B, R, 5, Kx), WJ.NEG_I, np.int32)
    anc_v = np.full((B, R, 5, Kx), -1, np.int32)
    anc_h = np.full((B, R, 5, Kx), -1, np.int32)
    open_a = np.full((B, R, 4, Kx), -1, np.int32)
    done0 = np.zeros(B, bool)
    seed_off_p = np.full((B, K), WJ.NEG_I, np.int32)
    seed_anc_p = np.full((B, K), WP.UNSET32, np.uint32)
    for i in range(B):
        l = WJ._lcp_np(qs[i], ts[i])
        off[i, 0, WJ.M_, Kx // 2] = l
        seed_off_p[i, K // 2] = l
        if l >= ms[i] and l >= ns[i]:
            done0[i] = True
        elif l > mid[i]:
            anc_v[i, 0, WJ.M_, Kx // 2] = mid[i]
            anc_h[i, 0, WJ.M_, Kx // 2] = mid[i]
            seed_anc_p[i, K // 2] = (np.uint32(mid[i]) << 16) | np.uint32(mid[i])
    max_s = int(p.mismatch * (max(ms) + max(ns)) + 64)
    f_score_x, f_pv_x, f_ph_x, fin_x = WJ._sweep(
        jnp.asarray(off), jnp.asarray(anc_v), jnp.asarray(anc_h),
        jnp.asarray(open_a), jnp.asarray(WJ._pack_words(query)),
        jnp.asarray(WJ._pack_words(target)),
        jnp.asarray(qlen), jnp.asarray(tlen), jnp.asarray(axis_q),
        jnp.asarray(mid), jnp.asarray(done0), jnp.int32(max_s),
        K=Kx, R=R, penalties=p)
    f_score_x = np.where(done0, 0, np.asarray(f_score_x))

    # --- Pallas ---
    eng = WP.PallasSweeps(p, interpret=False, chunk_steps=64)
    f_score_p, f_pv_p, f_ph_p, fin_p, _clip = eng.sweep(
        query, target, qlen, tlen, axis_q, mid,
        seed_off_p, seed_anc_p, done0, max_s, K)

    ok = True
    for i in range(B):
        if done0[i]:
            continue
        if (f_score_p[i] != f_score_x[i] or f_pv_p[i] != int(f_pv_x[i])
                or f_ph_p[i] != int(f_ph_x[i])):
            ok = False
            print(f"  MISMATCH i={i} m={ms[i]} n={ns[i]} "
                  f"score {f_score_p[i]} vs {int(f_score_x[i])}, "
                  f"pv {f_pv_p[i]} vs {int(f_pv_x[i])}, "
                  f"ph {f_ph_p[i]} vs {int(f_ph_x[i])}")
    return ok


def main():
    rng = np.random.default_rng(7)
    cases = [
        (4, 300, 256, Penalties(5, 8, 2, 24, 1)),
        (4, 600, 256, Penalties(2, 3, 1, 3, 1)),
        (8, 900, 512, Penalties(5, 8, 2, 24, 1)),
    ]
    for B, L, K, p in cases:
        ok = run_case(rng, B, L, K, p)
        print(f"case B={B} L={L} K={K} p={p}: {'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
