"""Pallas TPU kernel: small-problem WFA with full history + device backtrace.

This is the round-2 flagship: thousands of SMALL alignment problems
(<= 511 bp per side, score <= SMAX) solved to a complete CIGAR in ONE
kernel launch. It is the TPU-native answer to the reference's wflambda
segment machinery (reference: wflign.cpp:1061-1175 aligns 256-base
segments lazily under a guide wavefront; here segments run in lockstep
with no guide needed because the anchor chain already fixed the cuts)
and it replaces the host leaf solver of the exact recursion
(VERDICT round-1 items #1 and #3).

Design:

* **Full history in VMEM.** Each problem's five wavefront states are
  stored for every score: hist (5, SMAX, PB, K) int16. At PB=16, K=256,
  SMAX=256 that is 10.5 MB — VMEM-resident, and exactly tiled for int16
  ((16, 128) native tiles; PB=16 avoids sublane padding).

* **Precomputed eq bits.** Sequences are tiny, so the per-diagonal
  match bitstreams (eq[k] bit h = (q[h] == t[h-k])) for the WHOLE
  problem are computed by XLA outside the kernel (a K-step shift-compare
  scan) and passed in: extension needs no refills, gathers, or window
  anchoring — a 16-row select + branchless ctz per step.

* **Score-synchronous backtrace ON DEVICE.** Backtrace transitions
  strictly decrease the score (a gap state entered from M resolves in
  the same score level), so one backward loop over score levels
  advances ALL PB problems in lockstep: at level s, a problem whose
  cursor sits at s resolves its M cell (priority X > I1 > I2 > D1 > D2,
  matching wfa_np) and then its gap cell (open-before-extend). Per-lane
  reads use one-hot max-extracts; runs are emitted RLE-merged into a
  per-problem buffer written backwards, so the host reads the CIGAR
  front-to-back with zero post-processing.

Exactness: same recurrences and tie-breaks as wfa_np.wfa_align (the
executable spec, itself DP-oracle-verified); bit-identical CIGARs are
enforced by tests. Problems that hit the score cap or touch the
diagonal band edge without a certificate (score < 2*margin*min(e1,e2))
are flagged and re-run by the caller on the exact engine.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wfa_np import Penalties

NEG_I = -(1 << 28)
NEG16 = -2048          # int16 history sentinel for "unreachable"

OP_EQ, OP_X, OP_I, OP_D = 0, 1, 2, 3
OP_SENTINEL = 15
OP_CHARS = "=XID"

M_, I1_, I2_, D1_, D2_ = 0, 1, 2, 3, 4


def _ctz32(x):
    """Branchless count-trailing-zeros of a uint32 vector (32 if zero)."""
    c = jnp.zeros(x.shape, jnp.int32)
    for sh, msk in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        z = (x & jnp.uint32(msk)) == 0
        c = c + jnp.where(z, sh, 0)
        x = jnp.where(z, x >> jnp.uint32(sh), x)
    return jnp.where(x == 0, 32, c)


# ---------------------------------------------------------------------------
# eq-bit precomputation (XLA, outside the kernel)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("K",))
def _eq_bits(q, t, *, K):
    """(B, L) u8 query/target -> (B, L//32, K) uint32 eq bitstreams.

    Word w of diagonal lane l has bit j set iff
    q[32w+j] == t[32w+j - (l - K//2)]. Out-of-range target positions
    compare against pad byte 0 (mismatching every real base and both
    sentinels)."""
    B, L = q.shape
    C = K // 2
    tp = jnp.pad(t, ((0, 0), (K, K)))
    shifts = (1 << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)

    def body(carry, lane):
        start = K + C - lane
        tsl = jax.lax.dynamic_slice_in_dim(tp, start, L, axis=1)
        eq = (q == tsl).reshape(B, L // 32, 32).astype(jnp.uint32)
        words = jnp.sum(eq * shifts[None, None, :], axis=2, dtype=jnp.uint32)
        return carry, words

    _, stacked = jax.lax.scan(body, 0, jnp.arange(K))   # (K, B, L//32)
    return stacked.transpose(1, 2, 0)                    # (B, EQW, K)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_seg_kernel(p: Penalties, PB: int, K: int, smax: int, eqw: int,
                     maxr: int):
    x, o1, e1, o2, e2 = (p.mismatch, p.gap_opening1, p.gap_extension1,
                         p.gap_opening2, p.gap_extension2)

    def kernel(par_ref, eq_ref, runs_ref, term_ref, hist_ref, cur_ref):
        NEG = jnp.int32(NEG_I)
        qlen = jnp.broadcast_to(par_ref[0, :, 0:1], (PB, K))
        tlen = jnp.broadcast_to(par_ref[0, :, 1:2], (PB, K))
        lane = jax.lax.broadcasted_iota(jnp.int32, (PB, K), 1)
        kvec = lane - K // 2
        d_end = jnp.clip(qlen - tlen + K // 2, 0, K - 1)
        is_end = lane == d_end

        runs_ref[0] = jnp.full((PB, maxr), OP_SENTINEL << 24, jnp.int32)
        term_ref[0] = jnp.zeros((PB, 128), jnp.int32)

        def to16(v):
            return jnp.where(v <= NEG_I // 2, NEG16, v).astype(jnp.int16)

        def hread(state, s):
            """hist[state][s] as (PB, K) int32; NEG where s < 0."""
            ok = s >= 0
            row = hist_ref[state, pl.ds(jnp.maximum(s, 0), 1)][0]
            row = row.astype(jnp.int32)
            row = jnp.where(row == NEG16, NEG, row)
            return jnp.where(ok, row, NEG)

        def sr(a, fill):  # value at k-1
            out = pltpu.roll(a, 1, 1)
            return jnp.where(lane == 0, fill, out)

        def sl(a, fill):  # value at k+1
            out = pltpu.roll(a, K - 1, 1)
            return jnp.where(lane == K - 1, fill, out)

        # ---- extension: h += run of eq bits starting at bit h ------------
        def extend(m_off):
            def cond(c):
                _, more_i = c
                return jnp.any(more_i != 0)

            def body(c):
                h, more_i = c
                more = more_i != 0
                idx = jnp.where(more, h, 0)
                wi = idx >> 5
                bo = (idx & 31).astype(jnp.uint32)
                a0 = jnp.zeros((PB, K), jnp.uint32)
                a1 = jnp.zeros((PB, K), jnp.uint32)
                for m in range(eqw):
                    row = eq_ref[0, m]
                    a0 = jnp.where(wi == m, row, a0)
                    a1 = jnp.where(wi + 1 == m, row, a1)
                al = jnp.where(bo == 0, a0,
                               (a0 >> bo) | (a1 << (jnp.uint32(32) - bo)))
                run = _ctz32(~al)
                h2 = jnp.where(more, h + run, h)
                more2 = more & (run == 32) & (h2 < qlen)
                return h2, more2.astype(jnp.int32)

            h, _ = jax.lax.while_loop(
                cond, body, (m_off, (m_off > NEG).astype(jnp.int32)))
            v = h - kvec
            over = jnp.maximum(jnp.maximum(h - qlen, v - tlen), 0)
            return jnp.where(h > NEG, h - over, h)

        # ---- forward sweep, storing every wavefront ----------------------
        seed = jnp.where(lane == K // 2, 0, NEG)
        m0 = extend(seed)
        hist_ref[M_, pl.ds(0, 1)] = to16(m0)[None]
        for g in (I1_, I2_, D1_, D2_):
            hist_ref[g, pl.ds(0, 1)] = jnp.full((1, PB, K), NEG16, jnp.int16)

        fin0 = jnp.max(jnp.where(is_end, m0, NEG), axis=1, keepdims=True)
        done0 = fin0 >= par_ref[0, :, 0:1]
        term_ref[0, :, 0:1] = done0.astype(jnp.int32)

        # NOTE: the termination flag must ride in the while carry — ref
        # reads inside a while_loop *cond* are not re-evaluated per
        # iteration (observed in interpret mode: the loop ran to smax,
        # poisoning the edge flag with post-finish gap-ladder contact).
        def fcond(c):
            s, alive = c
            return (s < smax) & (alive != 0)

        def fbody(c):
            s, _ = c
            m_x = hread(M_, s - x)
            m_o1 = hread(M_, s - o1 - e1)
            m_o2 = hread(M_, s - o2 - e2)
            i1e = hread(I1_, s - e1)
            i2e = hread(I2_, s - e2)
            d1e = hread(D1_, s - e1)
            d2e = hread(D2_, s - e2)

            i1b = jnp.maximum(sr(m_o1, NEG), sr(i1e, NEG))
            i1 = jnp.where(i1b > NEG, i1b + 1, NEG)
            i2b = jnp.maximum(sr(m_o2, NEG), sr(i2e, NEG))
            i2 = jnp.where(i2b > NEG, i2b + 1, NEG)
            d1 = jnp.maximum(sl(m_o1, NEG), sl(d1e, NEG))
            d2 = jnp.maximum(sl(m_o2, NEG), sl(d2e, NEG))

            mm = jnp.where(m_x > NEG, m_x + 1, NEG)
            m_off = jnp.maximum(
                jnp.maximum(jnp.maximum(mm, i1), jnp.maximum(i2, d1)), d2)
            v = m_off - kvec
            okb = (m_off >= 0) & (m_off <= qlen) & (v >= 0) & (v <= tlen)
            m_off = jnp.where(okb, m_off, NEG)
            m_ext = extend(m_off)

            # band-edge contact only matters while a problem is still
            # searching: after its finish score the group keeps sweeping
            # for lockstep peers and the dead problem's gap ladders march
            # to the band edge — that contact must not flag it
            edge_act = (((lane == 0) | (lane == K - 1))
                        & (m_ext > NEG)).astype(jnp.int32)
            not_fin = (term_ref[0, :, 0:1] == 0).astype(jnp.int32)
            term_ref[0, :, 3:4] = jnp.maximum(
                term_ref[0, :, 3:4],
                jnp.max(edge_act, axis=1, keepdims=True) * not_fin)

            hist_ref[M_, pl.ds(s, 1)] = to16(m_ext)[None]
            hist_ref[I1_, pl.ds(s, 1)] = to16(i1)[None]
            hist_ref[I2_, pl.ds(s, 1)] = to16(i2)[None]
            hist_ref[D1_, pl.ds(s, 1)] = to16(d1)[None]
            hist_ref[D2_, pl.ds(s, 1)] = to16(d2)[None]

            fin = jnp.max(jnp.where(is_end, m_ext, NEG), axis=1,
                          keepdims=True)
            done = fin >= par_ref[0, :, 0:1]
            finished = term_ref[0, :, 0:1] != 0
            newly = done & ~finished
            all_done = finished | done
            term_ref[0, :, 0:1] = all_done.astype(jnp.int32)
            term_ref[0, :, 1:2] = jnp.where(newly, s, term_ref[0, :, 1:2])
            return s + 1, 1 - jnp.min(all_done.astype(jnp.int32))

        jax.lax.while_loop(
            fcond, fbody,
            (jnp.int32(1), 1 - jnp.min(done0.astype(jnp.int32))))
        term_ref[0, :, 2:3] = 1 - term_ref[0, :, 0:1]   # fail flag

        # ---- backtrace: lockstep over descending score levels ------------
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (PB, maxr), 1)

        def pick(row, kq):
            """Value of (PB, K) row at per-problem lane kq (PB, 1)."""
            sel = jnp.where(lane == kq, row, NEG)
            return jnp.max(sel, axis=1, keepdims=True)

        def emit(mask, op, n):
            """Append run (op, n) for problems in `mask`, RLE-merged with
            the previously written entry."""
            m2 = mask & (n > 0)
            cur = cur_ref[:, 0:1]
            prev_val = jnp.max(
                jnp.where(lane_r == cur + 1, runs_ref[0],
                          jnp.int32(-(1 << 30))),
                axis=1, keepdims=True)
            same = m2 & ((prev_val >> 24) == op)
            new = m2 & ~same
            upd_prev = jnp.broadcast_to(same, (PB, maxr)) & (lane_r == cur + 1)
            runs_ref[0] = jnp.where(upd_prev, runs_ref[0] + n, runs_ref[0])
            upd_new = jnp.broadcast_to(new, (PB, maxr)) & (lane_r == cur)
            runs_ref[0] = jnp.where(upd_new, (op << 24) | n, runs_ref[0])
            cur_ref[:, 0:1] = cur - new.astype(jnp.int32)

        done_f = term_ref[0, :, 0:1] != 0
        s_final = term_ref[0, :, 1:2]
        srev0 = jnp.max(jnp.where(done_f, s_final, 0))
        cur_ref[:, 0:1] = jnp.full((PB, 1), maxr - 1, jnp.int32)

        bt_s0 = jnp.where(done_f, s_final, -1)
        bt_k0 = jnp.where(
            done_f,
            jnp.clip(par_ref[0, :, 0:1] - par_ref[0, :, 1:2],
                     -(K // 2), K // 2 - 1) + K // 2,
            jnp.int32(0))
        bt_h0 = par_ref[0, :, 0:1]
        bt_st0 = jnp.zeros((PB, 1), jnp.int32)
        bt_act0 = done_f.astype(jnp.int32)
        bt_ok0 = jnp.ones((PB, 1), jnp.int32)

        def bcond(c):
            srev = c[0]
            bact = c[5]
            return (srev >= 0) & jnp.any(bact != 0)

        def bbody(c):
            srev, bts, btk, bth, btst, bact, btok = c
            at = (bact != 0) & (bts == srev)

            # -- M resolution ------------------------------------------
            mM = at & (btst == M_)
            cx = pick(hread(M_, srev - x), btk)
            cx = jnp.where(cx > NEG, cx + 1, NEG)
            ci1 = pick(hread(I1_, srev), btk)
            ci2 = pick(hread(I2_, srev), btk)
            cd1 = pick(hread(D1_, srev), btk)
            cd2 = pick(hread(D2_, srev), btk)
            pre = jnp.maximum(jnp.maximum(jnp.maximum(cx, ci1),
                                          jnp.maximum(ci2, cd1)), cd2)
            seed_lvl = srev == 0
            mM_seed = mM & seed_lvl
            mM_in = mM & ~seed_lvl
            bad_m = mM_in & (pre <= NEG)
            mM_in = mM_in & ~bad_m
            emit(mM_in, OP_EQ, bth - pre)                # extension run
            wx = mM_in & (cx == pre)
            wi1 = mM_in & ~wx & (ci1 == pre)
            wi2 = mM_in & ~wx & ~wi1 & (ci2 == pre)
            wd1 = mM_in & ~wx & ~wi1 & ~wi2 & (cd1 == pre)
            wd2 = mM_in & ~wx & ~wi1 & ~wi2 & ~wd1 & (cd2 == pre)
            emit(wx, OP_X, jnp.ones((PB, 1), jnp.int32))
            bts = jnp.where(wx, srev - x, bts)           # stay in M
            bth = jnp.where(wx, pre - 1, bth)
            bth = jnp.where(wi1 | wi2 | wd1 | wd2, pre, bth)
            btst = jnp.where(wi1, I1_, btst)
            btst = jnp.where(wi2, I2_, btst)
            btst = jnp.where(wd1, D1_, btst)
            btst = jnp.where(wd2, D2_, btst)
            emit(mM_seed, OP_EQ, bth)                    # leading run
            bact = jnp.where(mM_seed | bad_m, 0, bact)
            btok = jnp.where(bad_m, 0, btok)

            # -- gap resolution (state may have just been set above) ---
            atg = (bact != 0) & (bts == srev)
            m_o1r = hread(M_, srev - o1 - e1)
            m_o2r = hread(M_, srev - o2 - e2)

            for st_id, is_ins, o_, e_, mrow, grow in (
                    (I1_, True, o1, e1, m_o1r, hread(I1_, srev - e1)),
                    (I2_, True, o2, e2, m_o2r, hread(I2_, srev - e2)),
                    (D1_, False, o1, e1, m_o1r, hread(D1_, srev - e1)),
                    (D2_, False, o2, e2, m_o2r, hread(D2_, srev - e2))):
                mG = atg & (btst == st_id)
                kd = btk + (-1 if is_ins else 1)
                open_ = pick(mrow, kd)
                ext = pick(grow, kd)
                if is_ins:
                    use_open = (open_ > NEG) & (open_ + 1 == bth)
                    use_ext = (ext > NEG) & (ext + 1 == bth)
                else:
                    use_open = (open_ > NEG) & (open_ == bth)
                    use_ext = (ext > NEG) & (ext == bth)
                emit(mG, OP_I if is_ins else OP_D,
                     jnp.ones((PB, 1), jnp.int32))
                g_open = mG & use_open
                g_ext = mG & ~use_open & use_ext
                g_bad = mG & ~use_open & ~use_ext
                bts = jnp.where(g_open, srev - o_ - e_, bts)
                bts = jnp.where(g_ext, srev - e_, bts)
                if is_ins:
                    bth = jnp.where(g_open | g_ext, bth - 1, bth)
                btk = jnp.where(g_open | g_ext, kd, btk)
                btst = jnp.where(g_open, M_, btst)
                bact = jnp.where(g_bad, 0, bact)
                btok = jnp.where(g_bad, 0, btok)

            return srev - 1, bts, btk, bth, btst, bact, btok

        out = jax.lax.while_loop(
            bcond, bbody,
            (srev0, bt_s0, bt_k0, bt_h0, bt_st0, bt_act0, bt_ok0))
        bact_f, btok_f = out[5], out[6]
        term_ref[0, :, 4:5] = cur_ref[:, 0:1]
        term_ref[0, :, 5:6] = btok_f & (1 - bact_f)   # clean backtrace

    return kernel


@partial(jax.jit,
         static_argnames=("penalties", "PB", "K", "smax", "maxr",
                          "interpret"))
def _run_seg(qarr, tarr, par, *, penalties, PB, K, smax, maxr, interpret):
    """(G*PB, L) u8 sequences + (G, PB, 128) params -> (runs, term)."""
    B, L = qarr.shape
    G = B // PB
    eqw = L // 32
    eq = _eq_bits(qarr, tarr, K=K)                  # (B, EQW, K)
    eq = eq.reshape(G, PB, eqw, K).transpose(0, 2, 1, 3)
    kern = _make_seg_kernel(penalties, PB, K, smax, eqw, maxr)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(G,),
        out_shape=(
            jax.ShapeDtypeStruct((G, PB, maxr), jnp.int32),
            jax.ShapeDtypeStruct((G, PB, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, PB, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, eqw, PB, K), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, PB, maxr), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((5, smax, PB, K), jnp.int16),
            pltpu.VMEM((PB, 128), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(par, eq)


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


class SegmentSolver:
    """Batched device solver for small end-to-end WFA problems.

    solve(jobs) -> list of RLE CIGARs [(n, op)] (op in '=XID'), or None
    for problems the kernel cannot certify (too long, |len diff| too
    big, score cap hit, band-edge contact above the certificate bound,
    or an inconsistent backtrace — the caller escalates those to the
    exact engine).
    """

    def __init__(self, penalties: Penalties, interpret: bool = False,
                 PB: int = 16, K: int = 256, smax: int = 256,
                 lseg: int = 512):
        self.p = penalties
        self.interpret = interpret
        self.PB = PB
        self.K = K
        self.smax = smax
        self.lseg = lseg
        self.maxr = 2 * smax + 128
        self.max_call = self.G_LADDER[-1] * PB
        self.e_min = min(penalties.gap_extension1, penalties.gap_extension2)

    def accepts(self, qlen: int, tlen: int) -> bool:
        return (qlen < self.lseg and tlen < self.lseg
                and abs(qlen - tlen) < self.K // 2 - 1)

    def solve(self, jobs):
        results: list = [None] * len(jobs)
        todo = []
        for i, (q, t) in enumerate(jobs):
            m, n = len(q), len(t)
            if m == 0 or n == 0:
                ops = []
                if n:
                    ops.append((n, "D"))
                if m:
                    ops.append((m, "I"))
                results[i] = ops
            elif self.accepts(m, n):
                todo.append(i)
        for c0 in range(0, len(todo), self.max_call):
            chunk = todo[c0:c0 + self.max_call]
            self._solve_chunk(chunk, jobs, results)
        return results

    # ONE call shape: every distinct group count is a separate Mosaic
    # compile, and through the axon tunnel that compile happens
    # server-side at first execution (~30-200 s; the client-side
    # persistent cache cannot capture it — compile() returns in <1 s and
    # the server's executable cache is LRU). Padding problems terminate
    # at score 0, so an underfilled grid step costs microseconds; one
    # fixed shape keeps the server cache warm across processes.
    G_LADDER = (64,)

    def _solve_chunk(self, idxs, jobs, results):
        PB, K, L = self.PB, self.K, self.lseg
        g_need = -(-len(idxs) // PB)
        G = next((g for g in self.G_LADDER if g >= g_need),
                 self.G_LADDER[-1])
        B = G * PB
        qarr = np.full((B, L), 0x01, np.uint8)
        tarr = np.full((B, L), 0x02, np.uint8)
        par = np.zeros((B, 128), np.int32)
        for j, i in enumerate(idxs):
            q, t = jobs[i]
            qarr[j, :len(q)] = np.frombuffer(bytes(q), np.uint8)
            tarr[j, :len(t)] = np.frombuffer(bytes(t), np.uint8)
            par[j, 0] = len(q)
            par[j, 1] = len(t)
        runs, term = _run_seg(
            jnp.asarray(qarr), jnp.asarray(tarr),
            jnp.asarray(par.reshape(G, PB, 128)),
            penalties=self.p, PB=PB, K=K, smax=self.smax, maxr=self.maxr,
            interpret=self.interpret)
        runs = np.asarray(runs).reshape(B, self.maxr)
        term = np.asarray(term).reshape(B, 128)
        for j, i in enumerate(idxs):
            if not term[j, 0] or not term[j, 5]:
                continue                       # fail / bad backtrace
            score = int(term[j, 1])
            if term[j, 3]:
                # band-edge contact: only accept if the score certifies
                # the band (any escaping path pays >= 2*margin*e_min)
                q, t = jobs[i]
                margin = K // 2 - abs(len(q) - len(t))
                if score >= 2 * self.e_min * margin:
                    continue
            c = int(term[j, 4])
            vals = runs[j, c + 1:self.maxr]
            ops = [(int(v) & 0xFFFFFF, OP_CHARS[int(v) >> 24]) for v in vals]
            results[i] = ops


class TieredSegmentSolver:
    """Two kernel configurations behind one solve():

    * tier 1 — PB=64, K=128, smax=128: four times the problems per
      grid step at half the diagonal band; covers the bulk of anchored
      segments (~256 bp, near-diagonal, low divergence);
    * tier 2 — PB=16, K=256, smax=256: wider band and score budget for
      tier-1 rejections (clipped, score cap, bigger |m-n|).

    Both are single-shape compiles; a job failing both returns None for
    the caller's exact-engine escalation.
    """

    def __init__(self, penalties: Penalties, interpret: bool = False):
        self.p = penalties
        self.t1 = SegmentSolver(penalties, interpret, PB=64, K=128,
                                smax=128)
        self.t2 = SegmentSolver(penalties, interpret, PB=16, K=256,
                                smax=256)
        self.lseg = self.t2.lseg
        self.K = self.t2.K
        self.smax = self.t2.smax

    def accepts(self, qlen: int, tlen: int) -> bool:
        return self.t2.accepts(qlen, tlen)

    def solve(self, jobs):
        res: list = [None] * len(jobs)
        t1_idx = [i for i, (q, t) in enumerate(jobs)
                  if self.t1.accepts(len(q), len(t))
                  or not q or not t]
        if t1_idx:
            got = self.t1.solve([jobs[i] for i in t1_idx])
            for i, o in zip(t1_idx, got):
                res[i] = o
        t2_idx = [i for i in range(len(jobs)) if res[i] is None
                  and self.t2.accepts(len(jobs[i][0]), len(jobs[i][1]))]
        if t2_idx:
            got = self.t2.solve([jobs[i] for i in t2_idx])
            for i, o in zip(t2_idx, got):
                res[i] = o
        return res
