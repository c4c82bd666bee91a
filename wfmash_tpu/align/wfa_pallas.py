"""Pallas TPU kernel for the batched WFA wavefront sweep.

This is the flagship compute kernel: the whole score loop of the exact
2-piece-affine wavefront recursion (the hot loop of WFA2-lib biWFA,
reference call surface: wflign.cpp:136-148) runs inside one pallas_call
with all state resident in VMEM. Design (ARCHITECTURE.md "wavefront
sweep" roadmap item):

* **Split rings.** Only M is read at deep lags (x, o1+e1, o2+e2); the
  gap states are read at lag e1/e2. M keeps Rm = max(x,o1+e1,o2+e2)+1
  ring slots, the gap states Rg = max(e1,e2)+1 — ~4x less VMEM than a
  uniform ring, which is what lets a (PB=8, K=1024) block stay on-chip.

* **Packed anchors.** The crossing payload (v, h) is always selected as
  a pair in the recursion (see wfa_jax._advance), so it lives in one
  uint32 (v<<16)|h with 0xFFFFFFFF = unset. Requires lengths < 65535
  (guarded); semantics identical to wfa_jax._advance.

* **Cached eq-bit windows.** Match extension consumes, per diagonal k,
  the bit stream eq[i] = (q[h0+i] == t[h0-k+i]). We cache EQB=512 bits
  per diagonal anchored at 256-aligned h0, so the per-step extension is
  pure VPU (a 16-row select + branchless ctz). Refills re-anchor all
  diagonals at their current offset and re-fetch via one-hot matmuls on
  the MXU (the TPU's only fast gather). Because h0 is 256-aligned the
  query window needs no realignment, and the target window's word/byte
  shift is ((-k) mod 256) — constant per lane — so the two-stage
  alignment selects use loop-invariant masks.

Bit-identical to wfa_jax._sweep (same tie-breaks, same crossing rules);
tested against it and, through the engine, against the O(nm) oracle.
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
UNSET32 = 0xFFFFFFFF

# eq-bit cache geometry (units are SYMBOLS; sequences are 4-bit packed:
# 8 symbols per u32 word, halving the refill fetch/align/upload work)
WB = 256          # anchor alignment / table stride (symbols)
EQB = 1024        # cached eq bits per diagonal
EQW = EQB // 32   # u32 rows in the eq cache
BSLACK = 512     # backward anchor slack: offsets swing hundreds
                 # below their recent max (gap-ladder arrivals);
                 # 512/1024 splits the window evenly (576+ starves
                 # the forward room and churns instead)
TWQ = EQB         # query window symbols (h0 is WB-aligned: no realignment)
TWT = 1536        # target window symbols (WB phase + EQB + spill)
SPW = 8           # symbols per packed u32 word

# 4-bit symbol codes: the engine only sweeps normalized DNA (the aligner
# uppercases and maps non-ACGT to N first); the alphabet guard in
# wfa_jax routes anything else away from this kernel. Code 0 is the
# table out-of-range fill, 6/7 the query/target length sentinels — all
# mutually distinct so boundary symbols never compare equal.
ENCODE_LUT = np.zeros(256, np.uint8)
for _b, _c in ((ord("A"), 1), (ord("C"), 2), (ord("G"), 3), (ord("T"), 4),
               (ord("N"), 5), (0x01, 6), (0x02, 7)):
    ENCODE_LUT[_b] = _c
ALPHABET = frozenset(b"ACGTN\x01\x02\x00")


def is_encodable(seq: np.ndarray) -> bool:
    """True iff every byte has a 4-bit code (0x00 fill included)."""
    if len(seq) == 0:
        return True
    u = np.unique(seq)
    return bool(np.all((ENCODE_LUT[u] != 0) | (u == 0)))


def ring_sizes(p: Penalties) -> tuple[int, int]:
    rm = max(p.mismatch, p.gap_opening1 + p.gap_extension1,
             p.gap_opening2 + p.gap_extension2) + 1
    rg = max(p.gap_extension1, p.gap_extension2) + 1
    return rm, rg


def _ctz32(x):
    """Branchless count-trailing-zeros of a uint32 vector (32 if zero)."""
    c = jnp.zeros(x.shape, jnp.int32)
    for sh, msk in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        z = (x & jnp.uint32(msk)) == 0
        c = c + jnp.where(z, sh, 0)
        x = jnp.where(z, x >> jnp.uint32(sh), x)
    return jnp.where(x == 0, 32, c)


def _pack(v, h):
    """(v, h) int32 -> packed uint32 (v<<16)|h; lengths < 65535 guarded."""
    return (v.astype(jnp.uint32) << 16) | (h.astype(jnp.uint32) & 0xFFFF)


def _build_window_table(seq: np.ndarray, n_rows: int, tw: int,
                        pad_rows: int) -> np.ndarray:
    """(B, L) u8 sequence bytes -> (B, n_rows, tw//2) packed 4-bit
    windows of stride WB symbols, row r covering symbols
    [(r - pad_rows)*WB, +tw); out-of-range symbols encode to 0."""
    B, L = seq.shape
    codes = ENCODE_LUT[seq]
    lo = -pad_rows * WB
    hi = (n_rows - 1 - pad_rows) * WB + tw
    buf = np.zeros((B, hi - lo), np.uint8)
    buf[:, -lo:-lo + L] = codes
    idx = np.arange(n_rows)[:, None] * WB + np.arange(tw)[None, :]
    win = buf[:, idx.reshape(-1)].reshape(B, n_rows, tw)
    packed = win[:, :, 0::2] | (win[:, :, 1::2] << 4)
    return np.ascontiguousarray(packed)


@jax.jit
def _unpack_channel_major(words):
    """(..., W//4) uint32 sequence words -> (..., W) bf16 channel-major.

    Produces channel-major cols [c0|c1|c2|c3] of the little-endian u32
    sequence words, so static column slices recover byte channels inside
    the kernel. Runs on device: uploading raw u8 windows and unpacking
    with integer shifts is ~200x faster than uploading/casting a bf16
    table through the device tunnel."""
    chans = [((words >> (8 * c)) & 0xFF).astype(jnp.int32)
             .astype(jnp.bfloat16) for c in range(4)]
    return jnp.concatenate(chans, axis=-1)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(PB: int, K: int, nbq: int, nbt: int, padb: int,
                 n_steps: int, p: Penalties, CH: int):
    Rm, Rg = ring_sizes(p)
    PBC = min(PB, 8)   # problems per refill fetch block (transient bound)
    x, o1, e1, o2, e2 = (p.mismatch, p.gap_opening1, p.gap_extension1,
                         p.gap_opening2, p.gap_extension2)
    def kernel(s0_ref, par_ref, qtab_ref, ttab_ref,
               i_off_m, i_anc_m, i_off_g, i_anc_g, i_open_g,
               i_eq, i_h0, i_term,
               off_m_ref, anc_m_ref, off_g_ref, anc_g_ref, open_g_ref,
               eq_ref, h0_ref, term_ref, dma_sem, stale_ref):
        # state inputs stay in HBM (ANY) and are DMA'd into the VMEM
        # output refs once; the working state then lives in the outputs
        # (halves VMEM vs mapping both in- and out-blocks there)
        for src, dst in ((i_off_m, off_m_ref), (i_anc_m, anc_m_ref),
                         (i_off_g, off_g_ref), (i_anc_g, anc_g_ref),
                         (i_open_g, open_g_ref), (i_eq, eq_ref),
                         (i_h0, h0_ref), (i_term, term_ref)):
            cp = pltpu.make_async_copy(src, dst, dma_sem)
            cp.start()
            cp.wait()
        NEG = jnp.int32(NEG_I)
        UNS = jnp.uint32(UNSET32)
        s0 = s0_ref[0]
        # hoist the per-problem params to materialized (PB, K) arrays once:
        # (PB,1)->(PB,K) broadcasts inside the loop are lane-replication
        # relayouts that Mosaic would otherwise re-emit per use per step
        qlen = jnp.broadcast_to(par_ref[:, 0:1], (PB, K))
        tlen = jnp.broadcast_to(par_ref[:, 1:2], (PB, K))
        axis_q = jnp.broadcast_to(par_ref[:, 2:3], (PB, K)) != 0
        mid = jnp.broadcast_to(par_ref[:, 3:4], (PB, K))

        lane = jax.lax.broadcasted_iota(jnp.int32, (PB, K), 1)
        kvec = lane - K // 2
        # constant-per-lane target-window alignment (module docstring)
        d_end = jnp.clip(qlen - tlen + K // 2, 0, K - 1)
        is_end = lane == d_end

        def land_m(s):
            ok = s >= 0
            slot = jnp.maximum(s, 0) % Rm
            w = off_m_ref[pl.ds(slot, 1)][0]
            a = anc_m_ref[pl.ds(slot, 1)][0]
            return jnp.where(ok, w, NEG), jnp.where(ok, a, UNS)

        def land_g(g, s):
            ok = s >= 0
            slot = jnp.maximum(s, 0) % Rg
            w = off_g_ref[g, pl.ds(slot, 1)][0]
            a = anc_g_ref[g, pl.ds(slot, 1)][0]
            o = open_g_ref[g, pl.ds(slot, 1)][0]
            return (jnp.where(ok, w, NEG), jnp.where(ok, a, UNS),
                    jnp.where(ok, o, -1))

        def sr(a, fill):  # value at k-1
            out = pltpu.roll(a, 1, 1)
            return jnp.where(lane == 0, fill, out)

        def sl(a, fill):  # value at k+1
            out = pltpu.roll(a, K - 1, 1)
            return jnp.where(lane == K - 1, fill, out)

        # ---- refill: re-anchor eq caches at current offsets --------------
        def refill(h):
            # Inactive lanes get a warm anchor predicting their activation
            # offset: the wavefront expands to higher k via I steps (h grows
            # +1 per lane) and to lower k via D steps (h constant), so
            # propagate (h - lane) rightward and h leftward and take the
            # max. A cold anchor would force a refill storm as the front
            # widens (new-lane misses every step).
            act = h > NEG
            f = jnp.where(act, h - lane, NEG)    # slope-1, from lower k
            g = jnp.where(act, h, NEG)           # slope-0, from higher k
            d = 1
            while d < K:
                f = jnp.maximum(f, pltpu.roll(f, d, 1))
                g = jnp.maximum(g, pltpu.roll(g, K - d, 1))
                d *= 2
            pred = jnp.maximum(f + lane, g)
            hv = jnp.where(act, h, jnp.maximum(pred, 0))
            hv = jnp.maximum(hv - BSLACK, 0)
            h0 = hv & ~(WB - 1)
            # Selective refresh — eq bits stay valid for whatever h0 they
            # were fetched at, so a lane only needs a refresh when its
            # anchor must move: active lanes outside (or near the end of)
            # their window, and front-adjacent inactive lanes whose
            # predicted anchor landed in a new block. Everything else
            # keeps its window, and whole 128-lane chunks with no stale
            # lane are skipped below.
            idx_old = h - h0_ref[:, :]
            act_keep = act & (idx_old >= 0) & (idx_old < EQB - 256)
            near_i = act.astype(jnp.int32)
            for d in (1, 2, 4, 8, 16):
                near_i = jnp.maximum(
                    near_i, jnp.maximum(pltpu.roll(near_i, d, 1),
                                        pltpu.roll(near_i, K - d, 1)))
            # a prediction that drifted less than two blocks still warms
            # the activation well; refreshing on every one-block move kept
            # the front-adjacent chunks permanently stale
            drift = jnp.abs(h0 - h0_ref[:, :])
            inact_keep = (~act) & ((near_i == 0) | (drift <= 3 * WB))
            keep = act_keep | inact_keep
            stale_ref[:, :] = 1 - keep.astype(jnp.int32)
            h0_ref[:, :] = jnp.where(keep, h0_ref[:, :], h0)
            term_ref[:, 8:9] = term_ref[:, 8:9] + 1  # refill counter

            def chunk(ci, _):
                c0 = pl.multiple_of(ci * CH, 128)
                any_stale = jnp.any(stale_ref[:, pl.ds(c0, CH)] != 0)

                @pl.when(any_stale)
                def _():
                    # sub-loop over problem blocks so fetch transients stay
                    # bounded when PB > PBC (PB up to 32 at small K); each
                    # block re-checks staleness so clean problems skip
                    for p0 in range(0, PB, PBC):
                        blk_stale = jnp.any(
                            stale_ref[p0:p0 + PBC, pl.ds(c0, CH)] != 0)

                        @pl.when(blk_stale)
                        def _(p0=p0):
                            _chunk_body(c0, p0)
                return 0

            def _chunk_body(c0, p0):
                # per-chunk lane constants (values can't be dynamically
                # sliced in Mosaic; h0 is re-read from its ref instead)
                lane_c = (jax.lax.broadcasted_iota(jnp.int32, (PBC, CH), 1)
                          + c0)
                kvec_c = lane_c - K // 2
                r_t_c = (-kvec_c) % WB
                wr_c = r_t_c >> 3            # packed word = 8 symbols
                st_a_c = jnp.expand_dims(wr_c >> 2, 2)
                st_b_c = jnp.expand_dims(wr_c & 3, 2)
                rbc = jnp.expand_dims(
                    ((r_t_c & 7) << 2).astype(jnp.uint32), 2)  # nibbles
                h0c = h0_ref[p0:p0 + PBC, pl.ds(c0, CH)]
                v0c = h0c - kvec_c
                qblk_c = jnp.expand_dims(
                    jnp.clip(h0c // WB, 0, nbq - 1), 2)
                tblk_c = jnp.expand_dims(
                    jnp.clip((v0c >> 8) + padb, 0, nbt - 1), 2)  # WB == 256
                ohq = (qblk_c == jax.lax.broadcasted_iota(
                    jnp.int32, (PBC, CH, nbq), 2)).astype(jnp.bfloat16)
                oht = (tblk_c == jax.lax.broadcasted_iota(
                    jnp.int32, (PBC, CH, nbt), 2)).astype(jnp.bfloat16)
                winq = jax.lax.dot_general(
                    ohq, qtab_ref[p0:p0 + PBC],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (PBC, CH, TWQ) exact u8 values
                wint = jax.lax.dot_general(
                    oht, ttab_ref[p0:p0 + PBC],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (PBC, CH, TWT)

                def words(win, nw):
                    c = [win[:, :, i * nw:(i + 1) * nw]
                         .astype(jnp.float32).astype(jnp.int32)
                         .astype(jnp.uint32) for i in range(4)]
                    return c[0] | (c[1] << 8) | (c[2] << 16) | (c[3] << 24)

                qw = words(winq, TWQ // SPW)        # (PBC, CH, 128)
                tw = words(wint, TWT // SPW)        # (PBC, CH, 192)
                # two-stage constant-mask alignment to word offset wr
                NWA = EQB // SPW + 1        # aligned words needed (+spill)
                ta = jnp.zeros((PBC, CH, NWA + 4), jnp.uint32)
                for a in range(8):
                    ta = jnp.where(st_a_c == a,
                                   tw[:, :, 4 * a:4 * a + NWA + 4], ta)
                tb = jnp.zeros((PBC, CH, NWA + 1), jnp.uint32)
                for b in range(4):
                    tb = jnp.where(st_b_c == b, ta[:, :, b:b + NWA + 1], tb)
                nwq = EQB // SPW
                tfin = jnp.where(
                    rbc == 0, tb[:, :, :nwq],
                    (tb[:, :, :nwq] >> rbc)
                    | (tb[:, :, 1:nwq + 1] << (jnp.uint32(32) - rbc)))
                xw = qw ^ tfin                      # (PBC, CH, 128)
                # per-symbol equality, SWAR: nibble j of xw is zero.
                # Codes are <= 7 so (n & 7) + 7 never carries across
                # nibbles and bit 4j+3 of t is set iff nibble j != 0;
                # the multiply then compresses the 4-spaced flag bits
                # (4j -> 28+j) into one byte per 16-bit half.
                t7 = ((xw & 0x77777777) + jnp.uint32(0x77777777)) | xw
                zf = (~t7 & jnp.uint32(0x88888888)) >> 3
                MC = jnp.uint32((1 << 28) | (1 << 25) | (1 << 22) | (1 << 19))
                b_lo = ((zf & 0xFFFF) * MC) >> 28
                b_hi = ((zf >> 16) * MC) >> 28
                bits8 = (b_lo & 0xF) | ((b_hi & 0xF) << 4)
                # pre-shift + log-step roll-fold: Mosaic miscompiles the
                # extract-single-lane-then-shift-or form of this fold
                nw = bits8.shape[2]
                ln = jax.lax.broadcasted_iota(jnp.int32, bits8.shape, 2)
                xf = bits8 << ((ln & 3) << 3).astype(jnp.uint32)
                for d in (1, 2):
                    xf = xf | pltpu.roll(xf, nw - d, 2)
                st_c = stale_ref[p0:p0 + PBC, pl.ds(c0, CH)] != 0
                for m in range(EQW):
                    eq_ref[m, p0:p0 + PBC, pl.ds(c0, CH)] = jnp.where(
                        st_c, xf[:, :, 4 * m],
                        eq_ref[m, p0:p0 + PBC, pl.ds(c0, CH)])
                return 0

            jax.lax.fori_loop(0, K // CH, chunk, 0)

        # ---- extension: advance h while cached eq bits run ---------------
        def extend(m_off):
            # `more` is carried as int32: Mosaic cannot yield i1 vectors
            def cond(c):
                _, more_i = c
                return jnp.any(more_i != 0)

            def body(c):
                h, more_i = c
                more = more_i != 0
                idx0 = h - h0_ref[:, :]
                miss = more & ((idx0 < 0) | (idx0 >= EQB))

                @pl.when(jnp.any(miss))
                def _():
                    refill(h)

                idx = jnp.where(more, h - h0_ref[:, :], 0)
                wi = idx >> 5
                bo = (idx & 31).astype(jnp.uint32)
                a0 = jnp.zeros((PB, K), jnp.uint32)
                a1 = jnp.zeros((PB, K), jnp.uint32)
                for m in range(EQW):
                    row = eq_ref[m]
                    a0 = jnp.where(wi == m, row, a0)
                    a1 = jnp.where(wi + 1 == m, row, a1)
                al = jnp.where(bo == 0, a0,
                               (a0 >> bo) | (a1 << (jnp.uint32(32) - bo)))
                run = _ctz32(~al)
                h2 = jnp.where(more, h + run, h)
                more2 = more & ((run == 32) | (idx + run >= EQB))
                return h2, more2.astype(jnp.int32)

            h, _ = jax.lax.while_loop(
                cond, body, (m_off, (m_off > NEG).astype(jnp.int32)))
            # safety clamp (sentinel bytes already stop runs at boundaries)
            v = h - kvec
            over = jnp.maximum(jnp.maximum(h - qlen, v - tlen), 0)
            return jnp.where(h > NEG, h - over, h)

        # ---- one score step ----------------------------------------------
        def step(i, _):
            s = s0 + i
            alive = jnp.min(term_ref[:, 0:1]) == 0

            @pl.when(alive)
            def _():
                m_x, a_mx = land_m(s - x)
                m_o1, a_mo1 = land_m(s - o1 - e1)
                m_o2, a_mo2 = land_m(s - o2 - e2)
                i1e, a_i1, op_i1 = land_g(0, s - e1)
                i2e, a_i2, op_i2 = land_g(1, s - e2)
                d1e, a_d1, op_d1 = land_g(2, s - e1)
                d2e, a_d2, op_d2 = land_g(3, s - e2)

                def gap_wave(m_src, a_m, g_src, a_g, g_open, is_ins):
                    if is_ins:
                        m_s, g_s = sr(m_src, NEG), sr(g_src, NEG)
                        am_s, ag_s = sr(a_m, UNS), sr(a_g, UNS)
                        go_s = sr(g_open, -1)
                    else:
                        m_s, g_s = sl(m_src, NEG), sl(g_src, NEG)
                        am_s, ag_s = sl(a_m, UNS), sl(a_g, UNS)
                        go_s = sl(g_open, -1)
                    use_open = m_s >= g_s   # tie -> open (documented)
                    base = jnp.maximum(m_s, g_s)
                    valid = base > NEG
                    new_off = jnp.where(valid,
                                        base + (1 if is_ins else 0), NEG)
                    new_anc = jnp.where(use_open, am_s, ag_s)
                    if is_ins:
                        new_open = jnp.where(use_open, m_s, go_s)
                    else:
                        new_open = jnp.where(use_open, m_s - (kvec + 1), go_s)
                    new_open = jnp.where(valid, new_open, -1)
                    if is_ins:
                        crossed = (axis_q & (new_anc == UNS) & valid
                                   & (new_off == mid + 1))
                        new_anc = jnp.where(
                            crossed, _pack(new_off - kvec, new_open), new_anc)
                    else:
                        crossed = ((~axis_q) & (new_anc == UNS) & valid
                                   & (new_off - kvec == mid + 1))
                        new_anc = jnp.where(
                            crossed, _pack(new_open, new_off), new_anc)
                    return new_off, new_anc, new_open

                i1, i1a, i1o = gap_wave(m_o1, a_mo1, i1e, a_i1, op_i1, True)
                i2, i2a, i2o = gap_wave(m_o2, a_mo2, i2e, a_i2, op_i2, True)
                d1, d1a, d1o = gap_wave(m_o1, a_mo1, d1e, a_d1, op_d1, False)
                d2, d2a, d2o = gap_wave(m_o2, a_mo2, d2e, a_d2, op_d2, False)

                mm = jnp.where(m_x > NEG, m_x + 1, NEG)
                crossed = ((mm > NEG) & (a_mx == UNS)
                           & ((axis_q & (mm == mid + 1))
                              | (~axis_q & (mm - kvec == mid + 1))))
                mxa = jnp.where(crossed, _pack(mm - kvec - 1, mm - 1), a_mx)

                m_off, m_anc = mm, mxa
                for c_off, c_anc in ((i1, i1a), (i2, i2a), (d1, d1a),
                                     (d2, d2a)):
                    better = c_off > m_off
                    m_off = jnp.where(better, c_off, m_off)
                    m_anc = jnp.where(better, c_anc, m_anc)

                v = m_off - kvec
                okb = (m_off >= 0) & (m_off <= qlen) & (v >= 0) & (v <= tlen)
                m_off = jnp.where(okb, m_off, NEG)
                m_anc = jnp.where(okb, m_anc, UNS)

                m_pre = m_off
                m_ext = extend(m_off)
                # span-clip detection: an active edge lane means a path
                # reached the diagonal band boundary; the caller escalates
                # to a wider span ladder step (term col 3)
                edge_act = (((lane == 0) | (lane == K - 1))
                            & (m_ext > NEG)).astype(jnp.int32)
                term_ref[:, 3:4] = jnp.maximum(
                    term_ref[:, 3:4],
                    jnp.max(edge_act, axis=1, keepdims=True))
                cr_t = ((~axis_q) & (m_anc == UNS) & (m_pre > NEG)
                        & (m_pre - kvec <= mid) & (m_ext - kvec > mid))
                m_anc = jnp.where(cr_t, _pack(mid, mid + kvec), m_anc)
                cr_q = (axis_q & (m_anc == UNS) & (m_pre > NEG)
                        & (m_pre <= mid) & (m_ext > mid))
                m_anc = jnp.where(cr_q, _pack(mid - kvec, mid), m_anc)

                off_m_ref[pl.ds(s % Rm, 1)] = m_ext[None]
                anc_m_ref[pl.ds(s % Rm, 1)] = m_anc[None]
                sg = s % Rg
                for g, (o, a, op) in enumerate(
                        ((i1, i1a, i1o), (i2, i2a, i2o),
                         (d1, d1a, d1o), (d2, d2a, d2o))):
                    off_g_ref[g, pl.ds(sg, 1)] = o[None]
                    anc_g_ref[g, pl.ds(sg, 1)] = a[None]
                    open_g_ref[g, pl.ds(sg, 1)] = op[None]

                # termination info: M offset on the final diagonal
                fin_off = jnp.max(jnp.where(is_end, m_ext, NEG), axis=1,
                                  keepdims=True)
                anc_i = pltpu.bitcast(m_anc, jnp.int32)
                fin_anc = jnp.max(
                    jnp.where(is_end, anc_i, jnp.int32(-(1 << 31))),
                    axis=1, keepdims=True)
                done = fin_off >= par_ref[:, 0:1]
                finished = term_ref[:, 0:1] != 0
                newly = done & ~finished
                term_ref[:, 0:1] = (finished | done).astype(jnp.int32)
                term_ref[:, 1:2] = jnp.where(newly, s, term_ref[:, 1:2])
                term_ref[:, 2:3] = jnp.where(newly, fin_anc, term_ref[:, 2:3])

            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    return kernel


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

N_STATE = 8  # off_m, anc_m, off_g, anc_g, open_g, eq, h0, term


@partial(jax.jit,
         static_argnames=("PB", "K", "n_steps", "penalties", "interpret"))
def _run_chunk(s0, par, qtab, ttab, state, *, PB, K, n_steps, penalties,
               interpret):
    nbq, nbt = qtab.shape[1], ttab.shape[1]
    padb = K // 512 + 2
    CH = 128  # lane-dim dynamic slices must be 128-aligned
    kern = _make_kernel(PB, K, nbq, nbt, padb, n_steps, penalties, CH)
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in state)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        out_shape=shapes,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)]
                  + [pl.BlockSpec(memory_space=pltpu.ANY)] * N_STATE),
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * N_STATE),
        input_output_aliases={4 + i: i for i in range(N_STATE)},
        scratch_shapes=[pltpu.SemaphoreType.DMA,
                        pltpu.VMEM((PB, K), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(s0, par, qtab, ttab, *state)


class PallasSweeps:
    """Batched sweep driver: drop-in for wfa_jax._sweep semantics.

    Problems run in groups of PB; each group advances `chunk_steps`
    scores per kernel launch until every problem converges."""

    def __init__(self, penalties: Penalties, interpret: bool = False,
                 chunk_steps: int = 4096):
        self.p = penalties
        self.interpret = interpret
        self.chunk_steps = chunk_steps
        self._blocks: dict = {}   # device-cached constant state templates

    def _const_blocks(self, Rm, Rg, PB, K):
        key = (Rm, Rg, PB, K)
        blk = self._blocks.get(key)
        if blk is None:
            blk = (
                jnp.full((Rm, PB, K), NEG_I, jnp.int32),
                jnp.full((Rm, PB, K), UNSET32, jnp.uint32),
                jnp.full((4, Rg, PB, K), NEG_I, jnp.int32),
                jnp.full((4, Rg, PB, K), UNSET32, jnp.uint32),
                jnp.full((4, Rg, PB, K), -1, jnp.int32),
                jnp.zeros((EQW, PB, K), jnp.uint32),
                jnp.full((PB, K), NEG_I, jnp.int32),   # h0 -> first miss
            )
            self._blocks[key] = blk
        return blk

    def sweep(self, query: np.ndarray, target: np.ndarray,
              qlen: np.ndarray, tlen: np.ndarray,
              axis_is_query: np.ndarray, mid: np.ndarray,
              seed_off: np.ndarray, seed_anc: np.ndarray,
              done0: np.ndarray, max_s: int, K: int):
        """query/target: (B, L) u8, padded with sentinel bytes 0x01/0x02.
        seed_off/seed_anc: (B, K) score-0 M wavefront (+packed anchors).
        Returns (f_score, f_pv, f_ph, finished, clipped) as numpy
        arrays; ``clipped`` marks problems whose paths touched the
        diagonal band edge (span-escalation signal)."""
        p = self.p
        Rm, Rg = ring_sizes(p)
        B = query.shape[0]
        if np.any(qlen >= 65535) or np.any(tlen >= 65535):
            raise ValueError("pallas sweep requires lengths < 65535")
        padb = K // 512 + 2
        nbq = query.shape[1] // WB + 1
        nbt = target.shape[1] // WB + padb + K // 256 + 4
        # sentinel discipline: q pads 0x01 (code 6), t pads 0x02 (code 7),
        # table out-of-range fills code 0 — mutually distinct and distinct
        # from the ACGTN codes, so runs stop at every boundary.
        qtab_np = _build_window_table(query, nbq, TWQ, 0).view(np.uint32)
        ttab_np = _build_window_table(target, nbt, TWT, padb).view(np.uint32)

        PB = max(1, min(32, 8192 // K))
        f_score = np.zeros(B, np.int32)
        f_anc = np.full(B, UNSET32, np.uint32)
        finished = done0.copy()
        clipped = np.zeros(B, bool)

        # batch every host->device transfer across groups: the tunnel to a
        # remote chip makes per-group uploads the dominant cost otherwise
        groups = []
        for g0 in range(0, B, PB):
            hi = min(g0 + PB, B)
            idx = list(range(g0, hi)) + [g0] * (PB - hi + g0)
            if not all(done0[j] for j in idx):
                groups.append((g0, hi, idx))
        if not groups:
            return (f_score, np.full(B, -1, np.int32),
                    np.full(B, -1, np.int32), finished, clipped)
        G = len(groups)
        all_idx = np.array([g[2] for g in groups])          # (G, PB)
        par = np.zeros((G, PB, 128), np.int32)
        par[:, :, 0] = qlen[all_idx]
        par[:, :, 1] = tlen[all_idx]
        par[:, :, 2] = axis_is_query[all_idx].astype(np.int32)
        par[:, :, 3] = mid[all_idx]
        term0 = np.zeros((G, PB, 128), np.int32)
        term0[:, :, 0] = done0[all_idx].astype(np.int32)
        qtab_all = _unpack_channel_major(jnp.asarray(qtab_np[all_idx]))
        ttab_all = _unpack_channel_major(jnp.asarray(ttab_np[all_idx]))
        seed_off_d = jnp.asarray(seed_off[all_idx])
        seed_anc_d = jnp.asarray(seed_anc[all_idx].astype(np.uint32))
        par_d = jnp.asarray(par)
        term_d = jnp.asarray(term0)
        c_off_m, c_anc_m, c_og, c_ag, c_opg, c_eq, c_h0 = self._const_blocks(
            Rm, Rg, PB, K)

        # Speculative round-robin chunks across groups. Two levers keep a
        # tunnel-grade link (RTT >> chunk compute) off the critical path:
        # * every LIVE group gets up to R consecutive chunks enqueued
        #   back-to-back before ANY term flag is read (a finished
        #   problem's steps are skipped by the kernel's `alive` guard, so
        #   overshoot costs ~nothing on device; R doubles per batch, so
        #   deep problems converge in O(log) readbacks);
        # * the term arrays of all live groups are stacked ON DEVICE and
        #   fetched in ONE transfer instead of G round trips.
        # Chunks past max_s are never enqueued (same dispatch set as the
        # non-speculative loop -> bit-identical results and cap
        # semantics).
        states = {}
        s0s = {}
        for gi in range(G):
            states[gi] = (
                c_off_m.at[0].set(seed_off_d[gi]),
                c_anc_m.at[0].set(seed_anc_d[gi]),
                c_og, c_ag, c_opg, c_eq, c_h0, term_d[gi],
            )
            s0s[gi] = 1
        live = set(range(G))
        terms = {}
        spec_r = 2
        while live:
            for _ in range(spec_r):
                for gi in sorted(live):
                    if s0s[gi] > max_s:
                        continue
                    states[gi] = _run_chunk(
                        jnp.asarray([s0s[gi]], jnp.int32), par_d[gi],
                        qtab_all[gi], ttab_all[gi], states[gi],
                        PB=PB, K=K, n_steps=self.chunk_steps, penalties=p,
                        interpret=self.interpret)
                    s0s[gi] += self.chunk_steps
            order = sorted(live)
            if len(order) == 1:
                terms_h = np.asarray(states[order[0]][-1])[None]
            else:
                terms_h = np.asarray(
                    jnp.stack([states[gi][-1] for gi in order]))
            for pos, gi in enumerate(order):
                terms[gi] = terms_h[pos]
                if terms_h[pos][:, 0].all() or s0s[gi] > max_s:
                    live.discard(gi)
            spec_r = min(spec_r * 2, 8)

        for gi, (g0, hi, idx) in enumerate(groups):
            term_h = terms[gi]
            for j in range(hi - g0):
                clipped[idx[j]] = bool(term_h[j, 3])
                if done0[idx[j]] or not term_h[j, 0]:
                    continue
                finished[idx[j]] = True
                f_score[idx[j]] = term_h[j, 1]
                f_anc[idx[j]] = np.uint32(term_h[j, 2])

        unset = f_anc == np.uint32(UNSET32)
        f_pv = np.where(unset, -1, (f_anc >> 16).astype(np.int64))
        f_ph = np.where(unset, -1, (f_anc & 0xFFFF).astype(np.int64))
        return (f_score, f_pv.astype(np.int32), f_ph.astype(np.int32),
                finished, clipped)
