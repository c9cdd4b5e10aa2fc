"""Pallas TPU CABAC engine with a DEVICE-SIDE residual request generator.

The replay engine (ops.pallas_cabac) executes a host-traced request tape
for every bin — which made "TPU-native entropy" circular: the tape came
from a prior host decode (round-4 verdict). This kernel breaks that
circularity for residual coding, which is ~80% of all bins on real
content (H.265 §7.3.8.11): lanes consume an ENVELOPE tape that carries
only the non-residual bins plus one KIND_TU marker per transform block,
and at each marker the lane switches into an in-kernel syntax state
machine that derives every request itself —

    last_sig_coeff_{x,y} prefix (ctx) / suffix (bypass)
    coded_sub_block_flag (ctx, right/below-neighbor context)
    sig_coeff_flag (ctx, §9.3.4.2.5 derivation incl. the 4x4 map,
        csbf-pattern contexts and the luma/chroma offsets)
    coeff_abs_level_greater1/2 (ctx sets with cross-subblock history)
    sign bypass bins (incl. sign-data-hiding parity)
    coeff_abs_level_remaining (TR prefix + EGk suffix, Rice adaptation)

— and emits decoded coefficients as per-step EVENTS. The host receives
(level, position) events and merely scatters them into planes: no host
arithmetic decode of residual bins is shipped to the device in any form.

Lockstep model: every lane decodes at most one bin per step (idle lanes
freeze, flush steps emit one coefficient each and consume no bin), so
the event/bin planes stay dense [steps, 128] like the replay engine's.
All control flow is branchless selects over per-lane registers; per-TU
constants (scan tables) are masked lookups over broadcast constants.

Semantics are a 1:1 port of heif_tpu.cabac.syntax._residual_coding (the
spec reference, itself validated bit-exact vs libde265); equivalence is
asserted by final context state AND coefficient equality on encoded
fixtures (tests/test_pallas_cabac_gen.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heif_tpu.cabac import engine as E
from heif_tpu.cabac.envelope import KIND_TU
from heif_tpu.cabac.trace import (
    KIND_BYPASS,
    KIND_CTX,
    KIND_PAD,
    KIND_TERMINATE,
)
from heif_tpu.hevc.scans import scan_order, scan_pos_of

LANES = 128
N_CTX = E.N_CTX

# ctx slot bases (dense layout of cabac.engine)
_B_LASTX = E.CTX_OFFSET["last_x"]
_B_LASTY = E.CTX_OFFSET["last_y"]
_B_CSBF = E.CTX_OFFSET["csbf"]
_B_SIG = E.CTX_OFFSET["sig"]
_B_G1 = E.CTX_OFFSET["g1"]
_B_G2 = E.CTX_OFFSET["g2"]

# phases
P_TAPE, P_LXP, P_LYP, P_LXS, P_LYS, P_CSBF, P_SIG, P_G1, P_G2, \
    P_SIGN, P_REMP, P_REMS, P_FLUSH = range(13)

# lane register count (engine 0..5 + state machine 6..38; see the
# register-file map inside _kernel)
NREG = 39

# §9.3.4.2.5 4x4 sig ctx map, packed 4 bits per entry into two words
# (values wrap through int32 — the kernel reads them with logical shifts)
_SIG4 = (0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8)
_SIG4_LO = int(
    np.int32(np.uint32(sum(v << (4 * i) for i, v in enumerate(_SIG4[:8]))))
)
_SIG4_HI = int(
    np.int32(np.uint32(sum(v << (4 * i) for i, v in enumerate(_SIG4[8:]))))
)


def _sb_tables() -> tuple[np.ndarray, np.ndarray]:
    """Subblock scan constants, indexed scan*256 + log2m2*64 + key.

    fwd[.. + i]        = xs | ys<<8          (i = subblock scan index)
    inv[.. + sy*8+sx]  = scan index of subblock (sx, sy)
    """
    fwd = np.zeros(3 * 4 * 64, np.int32)
    inv = np.zeros(3 * 4 * 64, np.int32)
    for scan in range(3):
        for lg in range(4):  # log2 size 2..5 -> sb side 1,2,4,8
            sb = 1 << lg  # subblocks per side for log2 size lg+2
            so = scan_order(sb, scan)
            po = scan_pos_of(sb, scan)
            base = scan * 256 + lg * 64
            for i in range(sb * sb):
                x, y = int(so[i, 0]), int(so[i, 1])
                fwd[base + i] = x | (y << 8)
            for sy in range(sb):
                for sx in range(sb):
                    inv[base + sy * 8 + sx] = int(po[sy, sx])
    return fwd, inv


def _coef_tables() -> tuple[np.ndarray, np.ndarray]:
    """4x4 coefficient scan constants, indexed scan*16 + key.

    fwd[.. + n]       = xp | yp<<8
    inv[.. + yp*4+xp] = n
    """
    fwd = np.zeros(3 * 16, np.int32)
    inv = np.zeros(3 * 16, np.int32)
    for scan in range(3):
        so = scan_order(4, scan)
        po = scan_pos_of(4, scan)
        for n in range(16):
            fwd[scan * 16 + n] = int(so[n, 0]) | (int(so[n, 1]) << 8)
        for yp in range(4):
            for xp in range(4):
                inv[scan * 16 + yp * 4 + xp] = int(po[yp, xp])
    return fwd, inv


_SB_FWD, _SB_INV = _sb_tables()
_CO_FWD, _CO_INV = _coef_tables()


def _packed_tables() -> np.ndarray:
    out = np.zeros(256, dtype=np.int32)
    for p in range(64):
        for q in range(4):
            out[p * 4 + q] = (
                E.TRANS_IDX_MPS[p]
                | (E.TRANS_IDX_LPS[p] << 8)
                | (E.RANGE_TAB_LPS[p * 4 + q] << 16)
            )
    return out


_TBL = _packed_tables()


def _srl(x, n):
    return lax.shift_right_logical(x, n)


def _msb16(x):
    """Index of highest set bit of x (16-bit values); -1 when x == 0."""
    r = jnp.zeros_like(x)
    cur = x
    for b in (8, 4, 2, 1):
        hi = _srl(cur, b)
        take = hi > 0
        r = r + jnp.where(take, b, 0)
        cur = jnp.where(take, hi, cur)
    return jnp.where(x > 0, r, -1)


def _popcount16(x):
    x = x - (_srl(x, 1) & 0x5555)
    x = (x & 0x3333) + (_srl(x, 2) & 0x3333)
    x = (x + _srl(x, 4)) & 0x0F0F
    return (x + _srl(x, 8)) & 0x1F


def _kernel(tbl_ref, sbtab_ref, cotab_ref, words_ref, tape_ref, c0_ref,
            events_ref, dbg_ref, state_out_ref,
            ctx, regs, levels, *, blk: int, n_words: int, s_env: int):
    """One grid step: `blk` lockstep engine steps for 128 streams."""
    k = pl.program_id(1)

    iota_ctx = lax.broadcasted_iota(jnp.int32, (N_CTX, LANES), 0)
    iota_w = lax.broadcasted_iota(jnp.int32, (n_words, LANES), 0)
    iota_tbl = lax.broadcasted_iota(jnp.int32, (256, LANES), 0)
    iota_tape = lax.broadcasted_iota(jnp.int32, (s_env, LANES), 0)
    iota_sb = lax.broadcasted_iota(jnp.int32, (768, LANES), 0)
    iota_co = lax.broadcasted_iota(jnp.int32, (48, LANES), 0)
    iota_lv = lax.broadcasted_iota(jnp.int32, (16, LANES), 0)
    words = words_ref[0]
    tape = tape_ref[0]
    tblcol = tbl_ref[...]

    sb_fwd = sbtab_ref[0:768]
    sb_inv = sbtab_ref[768:1536]
    co_fwd = cotab_ref[0:48]
    co_inv = cotab_ref[48:96]

    def lut(tab, iota, idx):
        m = (iota == idx).astype(jnp.int32)
        return jnp.sum(tab * m, axis=0, keepdims=True)

    def fetch_word(idx):
        return lut(words, iota_w, idx)

    def fetch_tape(idx):
        return lut(tape, iota_tape, idx)

    def read_bits(cur, nxt, wi, biw, L):
        top = lax.shift_left(cur, biw) | jnp.where(
            biw > 0, _srl(nxt, jnp.where(biw > 0, 32 - biw, 0)), 0
        )
        v = jnp.where(L > 0, _srl(top, jnp.where(L > 0, 32 - L, 0)), 0)
        biw = biw + L
        crossed = (biw >= 32).astype(jnp.int32)
        biw = biw - 32 * crossed
        wi = wi + crossed
        nxt_f = fetch_word(wi + 1)
        cur = jnp.where(crossed > 0, nxt, cur)
        nxt = jnp.where(crossed > 0, nxt_f, nxt)
        return v, cur, nxt, wi, biw

    # ---------------- register file ----------------
    # 0..5 engine: rng off wi biw cur nxt
    # 6 tptr  7 phase  8 desc  9 cnt  10 acc  11 lastx  12 lasty
    # 13 sbi  14 lastsb  15 csl  16 csh  17 sbxy  18 posn  19 sig
    # 20 infer  21 lastpos  22 ctxset  23 g1ctx  24 ng1  25 lastg1
    # 26 prevg1  27 g2  28 g1bits  29 g1cov  30 signbits  31 hidden
    # 32 firstsig  33 rice  34 sumabs  35 rembase  36 remmask
    # 37 rempfx  38 tuseq

    @pl.when(k == 0)
    def _init():
        ctx[...] = c0_ref[0]
        zero = jnp.zeros((1, LANES), jnp.int32)
        cur = fetch_word(zero)
        nxt = fetch_word(zero + 1)
        off, cur, nxt, wi, biw = read_bits(cur, nxt, zero, zero, zero + 9)
        for j in range(NREG):
            regs[j : j + 1] = zero
        regs[0:1] = zero + 510
        regs[1:2] = off
        regs[2:3] = wi
        regs[3:4] = biw
        regs[4:5] = cur
        regs[5:6] = nxt
        regs[7:8] = zero + P_TAPE

    def bin_step(kind, slot, eng_carry):
        rng, off, wi, biw, cur, nxt = eng_carry
        cmask = (iota_ctx == slot).astype(jnp.int32)
        c = jnp.sum(ctx[...] * cmask, axis=0, keepdims=True)
        p = c & 63
        mps = _srl(c, 6)
        q = _srl(rng, 6) & 3
        packed = lut(tblcol, iota_tbl, p * 4 + q)
        lps = _srl(packed, 16) & 255
        rng2 = rng - lps
        is_lps = (off >= rng2).astype(jnp.int32)
        bin_ctx = jnp.where(is_lps > 0, 1 - mps, mps)
        off_ctx = jnp.where(is_lps > 0, off - rng2, off)
        rng_ctx = jnp.where(is_lps > 0, lps, rng2)
        new_mps = jnp.where((is_lps > 0) & (p == 0), 1 - mps, mps)
        new_p = jnp.where(is_lps > 0, _srl(packed, 8) & 255, packed & 255)
        c_new = new_p | lax.shift_left(new_mps, 6)
        rng_t = rng - 2
        bin_t = (off >= rng_t).astype(jnp.int32)
        is_ctx = (kind == KIND_CTX).astype(jnp.int32)
        is_byp = (kind == KIND_BYPASS).astype(jnp.int32)
        is_trm = (kind == KIND_TERMINATE).astype(jnp.int32)
        offb = jnp.where(is_ctx > 0, off_ctx, off)
        rngf = jnp.where(
            is_ctx > 0, rng_ctx, jnp.where(is_trm > 0, rng_t, rng)
        )
        sh = (
            (rngf < 256).astype(jnp.int32) + (rngf < 128) + (rngf < 64)
            + (rngf < 32) + (rngf < 16) + (rngf < 8) + (rngf < 4)
        )
        L = jnp.where(
            is_byp > 0,
            1,
            jnp.where(
                is_trm > 0, jnp.where(bin_t > 0, 0, sh),
                jnp.where(is_ctx > 0, sh, 0)
            ),
        )
        v, cur, nxt, wi, biw = read_bits(cur, nxt, wi, biw, L)
        off_sh = lax.shift_left(offb, L) | v
        bin_b = (off_sh >= rng).astype(jnp.int32)
        off_byp = off_sh - rng * bin_b
        bin_out = jnp.where(
            is_ctx > 0, bin_ctx, jnp.where(is_byp > 0, bin_b, bin_t)
        )
        off_new = jnp.where(is_byp > 0, off_byp, off_sh)
        rng_new = jnp.where(is_byp > 0, rng, lax.shift_left(rngf, L))
        is_pad = (kind == KIND_PAD).astype(jnp.int32)
        off_new = jnp.where(is_pad > 0, off, off_new)
        rng_new = jnp.where(is_pad > 0, rng, rng_new)
        wmask = cmask * is_ctx
        ctx[...] = ctx[...] * (1 - wmask) + c_new * wmask
        return bin_out, (rng_new, off_new, wi, biw, cur, nxt)

    def step(r):
        """One lockstep engine step: request -> bin -> state update.

        r: list of NREG (1,LANES) registers. Returns (event, new regs)."""
        phase = r[7]
        desc = r[8]
        cidx = desc & 3
        log2m2 = _srl(desc, 2) & 3
        scan = _srl(desc, 4) & 3
        shide = _srl(desc, 6) & 1
        is_luma = (cidx == 0).astype(jnp.int32)
        sb_side = lax.shift_left(jnp.ones_like(log2m2), log2m2)  # size>>2
        sb_base = scan * 256 + log2m2 * 64

        sbxy = r[17]
        xs = sbxy & 255
        ys = _srl(sbxy, 8) & 255
        sb_raster = ys * sb_side + xs

        def csbf_bit(idx, valid):
            lo, hi = r[15], r[16]
            w = jnp.where(idx >= 32, hi, lo)
            return jnp.where(valid, _srl(w, idx & 31) & 1, 0)

        right_v = (xs + 1 < sb_side)
        below_v = (ys + 1 < sb_side)
        cs_right = csbf_bit(sb_raster + 1, right_v)
        cs_below = csbf_bit(sb_raster + sb_side, below_v)

        # ---------- request resolution ----------
        # TAPE: fetch the entry; a TU marker is consumed here and the
        # lane's first generated request (last_x bin 0) issues this step
        entry = fetch_tape(r[6])
        e_kind = entry & 7
        e_pay = _srl(entry, 3)
        is_tu = (e_kind == KIND_TU).astype(jnp.int32)
        in_tape = (phase == P_TAPE).astype(jnp.int32)
        tu_now = in_tape * is_tu
        # TU-entry state (applies when tu_now)
        desc_n = jnp.where(tu_now > 0, e_pay & 127, desc)
        cidx_n = desc_n & 3
        log2m2_n = _srl(desc_n, 2) & 3
        phase_rq = jnp.where(tu_now > 0, P_LXP, phase)
        cnt_rq = jnp.where(tu_now > 0, 0, r[9])

        # last_sig prefix ctx params (§9.3.4.2.3)
        ctx_off = jnp.where(
            cidx_n == 0,
            3 * log2m2_n + _srl(log2m2_n + 1, 2),
            15,
        )
        ctx_shift = jnp.where(cidx_n == 0, _srl(log2m2_n + 3, 2), log2m2_n)
        lx_slot = _B_LASTX + ctx_off + _srl(cnt_rq, ctx_shift)
        ly_slot = _B_LASTY + ctx_off + _srl(cnt_rq, ctx_shift)

        # sig ctx derivation (§9.3.4.2.5) for the position r[18]
        n_cur = jnp.maximum(r[18], 0)
        xy = lut(co_fwd, iota_co, scan * 16 + n_cur)
        xp = xy & 255
        yp = _srl(xy, 8) & 255
        xc = lax.shift_left(xs, 2) + xp
        yc = lax.shift_left(ys, 2) + yp
        sig4_idx = lax.shift_left(yp, 2) + xp
        sig4 = jnp.where(
            sig4_idx < 8,
            _srl(jnp.full_like(sig4_idx, _SIG4_LO), 4 * sig4_idx) & 15,
            _srl(
                jnp.full_like(sig4_idx, _SIG4_HI), 4 * (sig4_idx - 8)
            ) & 15,
        )
        prev_csbf = cs_right + 2 * cs_below
        sums = xp + yp
        s0 = jnp.where(sums == 0, 2, jnp.where(sums < 3, 1, 0))
        s1 = jnp.where(yp == 0, 2, jnp.where(yp == 1, 1, 0))
        s2 = jnp.where(xp == 0, 2, jnp.where(xp == 1, 1, 0))
        sig_ctx = jnp.where(
            prev_csbf == 0, s0,
            jnp.where(prev_csbf == 1, s1, jnp.where(prev_csbf == 2, s2, 2)),
        )
        add_l = jnp.where(
            cidx == 0,
            jnp.where(xs + ys > 0, 3, 0)
            + jnp.where(log2m2 == 1, jnp.where(scan == 0, 9, 15), 21),
            jnp.where(log2m2 == 1, 9, 12),
        )
        sig_ctx = sig_ctx + add_l
        sig_ctx = jnp.where(log2m2 == 0, sig4, sig_ctx)
        sig_ctx = jnp.where((xc + yc == 0) & (log2m2 > 0), 0, sig_ctx)
        sig_slot = _B_SIG + sig_ctx + jnp.where(cidx > 0, 27, 0)

        csbf_ctx = jnp.minimum(cs_right + cs_below, 1)
        csbf_slot = _B_CSBF + csbf_ctx + jnp.where(cidx > 0, 2, 0)
        g1_slot = (
            _B_G1 + r[22] * 4 + jnp.minimum(r[23], 3)
            + jnp.where(cidx > 0, 16, 0)
        )
        g2_slot = _B_G2 + r[22] + jnp.where(cidx > 0, 4, 0)

        # per-phase request (kind, slot)
        ph = phase_rq
        kind = jnp.full_like(ph, KIND_PAD)
        slot = jnp.zeros_like(ph)

        def setk(cond, kk, ss, kind, slot):
            c = cond.astype(jnp.int32)
            return (
                jnp.where(c > 0, kk, kind),
                jnp.where(c > 0, ss, slot),
            )

        kind, slot = setk(ph == P_LXP, KIND_CTX, lx_slot, kind, slot)
        kind, slot = setk(ph == P_LYP, KIND_CTX, ly_slot, kind, slot)
        kind, slot = setk(ph == P_LXS, KIND_BYPASS, 0, kind, slot)
        kind, slot = setk(ph == P_LYS, KIND_BYPASS, 0, kind, slot)
        kind, slot = setk(ph == P_CSBF, KIND_CTX, csbf_slot, kind, slot)
        kind, slot = setk(ph == P_SIG, KIND_CTX, sig_slot, kind, slot)
        kind, slot = setk(ph == P_G1, KIND_CTX, g1_slot, kind, slot)
        kind, slot = setk(ph == P_G2, KIND_CTX, g2_slot, kind, slot)
        kind, slot = setk(ph == P_SIGN, KIND_BYPASS, 0, kind, slot)
        kind, slot = setk(ph == P_REMP, KIND_BYPASS, 0, kind, slot)
        kind, slot = setk(ph == P_REMS, KIND_BYPASS, 0, kind, slot)
        tape_bin = in_tape * (1 - is_tu)
        kind = jnp.where(tape_bin > 0, e_kind, kind)
        slot = jnp.where(tape_bin > 0, e_pay, slot)
        # P_FLUSH and exhausted-tape lanes keep KIND_PAD

        eng_carry = tuple(r[j] for j in range(6))
        b, eng_carry = bin_step(kind, slot, eng_carry)

        # ---------- state update ----------
        nr = list(r)
        for j in range(6):
            nr[j] = eng_carry[j]
        # tape pointer: envelope bins and TU markers both consume an entry
        adv = in_tape * (1 - (e_kind == KIND_PAD).astype(jnp.int32))
        nr[6] = jnp.minimum(r[6] + adv, s_env - 1)
        nr[8] = desc_n
        phase_u = phase_rq  # phase after request resolution
        cnt = cnt_rq

        def sel(cond, new, old):
            return jnp.where(cond.astype(jnp.int32) > 0, new, old)

        ev = jnp.zeros_like(b)
        # TU start event (tagged with the low tu_seq bits)
        ev = sel(tu_now, (1 << 30) | (r[38] & 0xFF), ev)
        nr[38] = r[38] + tu_now

        # ---- last_sig phases (§7.3.8.11 syntax ORDER: x-prefix,
        # y-prefix, x-suffix, y-suffix) ----
        cmax = lax.shift_left(log2m2_n + 2, 1) - 1
        in_lxp = (phase_u == P_LXP).astype(jnp.int32)
        in_lyp = (phase_u == P_LYP).astype(jnp.int32)
        in_lpre = in_lxp + in_lyp
        pre_more = (b > 0) & (cnt + 1 < cmax)
        prefix = jnp.where(b > 0, cnt + 1, cnt)
        pre_done = in_lpre * (1 - pre_more.astype(jnp.int32))

        in_lxs = (phase_u == P_LXS).astype(jnp.int32)
        in_lys = (phase_u == P_LYS).astype(jnp.int32)
        acc2 = lax.shift_left(r[10], 1) | b
        suf_done = (in_lxs + in_lys) * (r[9] == 1).astype(jnp.int32)
        pfx_store = r[11] * in_lxs + r[12] * in_lys  # prefix parked there
        suf_val = (
            lax.shift_left(2 + (pfx_store & 1), _srl(pfx_store, 1) - 1)
            + acc2
        )

        # park prefixes; suffix phases overwrite with the resolved value
        nr[11] = sel(in_lxp * pre_done, prefix, r[11])
        nr[12] = sel(in_lyp * pre_done, prefix, r[12])
        nr[11] = sel(in_lxs * suf_done, suf_val, nr[11])
        nr[12] = sel(in_lys * suf_done, suf_val, nr[12])

        sufx = (nr[11] > 3).astype(jnp.int32)  # px parked in nr[11]
        sufy = (nr[12] > 3).astype(jnp.int32)
        nbits_x = _srl(nr[11], 1) - 1
        nbits_y = _srl(nr[12], 1) - 1

        # x-prefix done -> y-prefix (always)
        phase_u = sel(in_lxp * pre_done, P_LYP, phase_u)
        cnt = sel(in_lxp * pre_done, 0, cnt)
        # y-prefix done -> x-suffix / y-suffix / TU body
        yp_done = in_lyp * pre_done
        phase_u = sel(
            yp_done,
            jnp.where(sufx > 0, P_LXS, jnp.where(sufy > 0, P_LYS, phase_u)),
            phase_u,
        )
        cnt = sel(
            yp_done, jnp.where(sufx > 0, nbits_x, nbits_y), cnt
        )
        nr[10] = sel(yp_done, 0, acc2)
        # x-suffix done -> y-suffix / TU body
        xs_done = in_lxs * suf_done
        phase_u = sel(xs_done * sufy, P_LYS, phase_u)
        cnt = sel(xs_done * sufy, nbits_y, cnt)
        nr[10] = sel(xs_done, 0, nr[10])
        # mid-suffix: count down
        cnt = sel((in_lxs + in_lys) * (1 - suf_done), r[9] - 1, cnt)
        # mid-prefix: count up
        in_lpre_stay = in_lpre * pre_more.astype(jnp.int32)
        cnt = sel(in_lpre_stay, cnt_rq + 1, cnt)

        tu_body = (
            yp_done * (1 - sufx) * (1 - sufy)
            + xs_done * (1 - sufy)
            + in_lys * suf_done
        )
        # ---- TU body entry: compute last_sb / last_pos, enter first sb
        lxv = nr[11]
        lyv = nr[12]
        sw = (scan == 2).astype(jnp.int32)
        lx_f = jnp.where(sw > 0, lyv, lxv)
        ly_f = jnp.where(sw > 0, lxv, lyv)
        nr[11] = sel(tu_body, lx_f, nr[11])
        nr[12] = sel(tu_body, ly_f, nr[12])
        last_sb = lut(
            sb_inv, iota_sb,
            sb_base + lax.shift_left(_srl(ly_f, 2), 3) + _srl(lx_f, 2),
        )
        last_pos = lut(
            co_inv, iota_co,
            scan * 16 + lax.shift_left(ly_f & 3, 2) + (lx_f & 3),
        )
        nr[14] = sel(tu_body, last_sb, r[14])
        nr[21] = sel(tu_body, last_pos, r[21])
        nr[15] = sel(tu_body, 0, r[15])
        nr[16] = sel(tu_body, 0, r[16])
        nr[26] = sel(tu_body, -1, r[26])  # prev_g1_ctx = None

        # ============ subblock machinery ============
        # ENTER_SB(i) is combinational: given i (and last_sb/last_pos in
        # nr), produce phase/cnt/sig/infer/posn/sbxy/csbf updates. It is
        # applied for: TU body entry (i = last_sb), csbf==0 / empty-sig /
        # flush-end transitions (i = sbi - 1).
        def enter_sb(i, take, phase_u, cnt, nrs):
            """take: (1,L) 0/1 gate. Mutates nrs (list) via sel."""
            fxy = lut(sb_fwd, iota_sb, sb_base + jnp.maximum(i, 0))
            exs = fxy & 255
            eys = _srl(fxy, 8) & 255
            raster = eys * sb_side + exs
            is_last = (i == nr[14]).astype(jnp.int32)
            is_first = (i == 0).astype(jnp.int32)
            decode_csbf = (1 - is_last) * (1 - is_first)
            # inferred coded: set csbf bit now for last/first
            setbit = take * (is_last + is_first - is_last * is_first)
            lo_add = jnp.where(
                (setbit > 0) & (raster < 32),
                lax.shift_left(jnp.ones_like(raster), raster & 31), 0,
            )
            hi_add = jnp.where(
                (setbit > 0) & (raster >= 32),
                lax.shift_left(jnp.ones_like(raster), raster & 31), 0,
            )
            nrs[15] = sel(take, nrs[15] | lo_add, nrs[15])
            nrs[16] = sel(take, nrs[16] | hi_add, nrs[16])
            nrs[17] = sel(take, exs | lax.shift_left(eys, 8), nrs[17])
            nrs[13] = sel(take, i, nrs[13])
            # sig-loop init for the inferred-coded cases
            sig0 = jnp.where(
                is_last > 0,
                lax.shift_left(jnp.ones_like(i), jnp.maximum(nr[21], 0)),
                0,
            )
            start_n = jnp.where(is_last > 0, nr[21] - 1, 15)
            nrs[19] = sel(take * (1 - decode_csbf), sig0, nrs[19])
            nrs[20] = sel(take, 0, nrs[20])  # infer=0 (inferred-coded sbs)
            nrs[18] = sel(take, start_n, nrs[18])
            # phase: csbf bin, or straight to SIG; last-sb with
            # last_pos==0 has an empty sig loop -> G1 on sig={bit0}
            sig_empty = (is_last > 0) & (nr[21] == 0)
            ph2 = jnp.where(
                decode_csbf > 0, P_CSBF,
                jnp.where(sig_empty, P_G1, P_SIG),
            )
            phase_u = sel(take, ph2, phase_u)
            return phase_u, cnt, sig_empty

        phase_u, cnt, tu_sig_empty = enter_sb(
            nr[14], tu_body, phase_u, cnt, nr
        )

        # ---- CSBF update ----
        in_csbf = (phase == P_CSBF).astype(jnp.int32) * (1 - tu_now)
        raster_c = sb_raster
        lo_add = jnp.where(
            (in_csbf > 0) & (b > 0) & (raster_c < 32),
            lax.shift_left(jnp.ones_like(raster_c), raster_c & 31), 0,
        )
        hi_add = jnp.where(
            (in_csbf > 0) & (b > 0) & (raster_c >= 32),
            lax.shift_left(jnp.ones_like(raster_c), raster_c & 31), 0,
        )
        nr[15] = nr[15] | lo_add
        nr[16] = nr[16] | hi_add
        # coded: sig loop with DC inference armed
        csbf_coded = in_csbf * b
        nr[19] = sel(csbf_coded, 0, nr[19])
        nr[20] = sel(csbf_coded, 1, nr[20])
        nr[18] = sel(csbf_coded, 15, nr[18])
        phase_u = sel(csbf_coded, P_SIG, phase_u)
        csbf_skip = in_csbf * (1 - b)  # -> next subblock below

        # ---- SIG update ----
        in_sig = (phase == P_SIG).astype(jnp.int32) * (1 - tu_now)
        nbit = lax.shift_left(jnp.ones_like(b), jnp.maximum(r[18], 0))
        nr[19] = sel(in_sig * b, nr[19] | nbit, nr[19])
        nr[20] = sel(in_sig * b, 0, nr[20])
        nxt_n = r[18] - 1
        infer_now = nr[20]
        sig_end = in_sig * (
            (r[18] == 0).astype(jnp.int32)
            + ((nxt_n == 0) & (infer_now > 0)).astype(jnp.int32)
        )
        # inferred DC significance
        nr[19] = sel(
            in_sig * ((nxt_n == 0) & (infer_now > 0)).astype(jnp.int32),
            nr[19] | 1, nr[19],
        )
        nr[18] = sel(in_sig * (1 - sig_end), nxt_n, nr[18])

        # ---- G1 entry (from sig_end or empty-loop TU entry) ----
        g1_entry = sig_end + tu_body * tu_sig_empty.astype(jnp.int32)
        sig_now = nr[19]
        sig_empty_now = (sig_now == 0).astype(jnp.int32)
        g1_go = g1_entry * (1 - sig_empty_now)
        cset = jnp.where(
            (nr[13] == 0) | (cidx > 0), 0, 2
        ) + (nr[26] == 0).astype(jnp.int32)
        nr[22] = sel(g1_go, cset, nr[22])
        nr[23] = sel(g1_go, 1, nr[23])
        nr[24] = sel(g1_go, 0, nr[24])
        nr[25] = sel(g1_go, -1, nr[25])
        nr[28] = sel(g1_go, 0, nr[28])
        nr[29] = sel(g1_go, 0, nr[29])
        nr[18] = sel(g1_go, _msb16(sig_now), nr[18])
        phase_u = sel(g1_go, P_G1, phase_u)

        # ---- G1 update ----
        in_g1 = (phase == P_G1).astype(jnp.int32) * (1 - tu_now)
        nmask = lax.shift_left(jnp.ones_like(b), jnp.maximum(r[18], 0))
        nr[29] = sel(in_g1, nr[29] | nmask, nr[29])
        nr[28] = sel(in_g1 * b, nr[28] | nmask, nr[28])
        first_g1 = in_g1 * b * (r[25] < 0).astype(jnp.int32)
        nr[25] = sel(first_g1, r[18], nr[25])
        nr[23] = sel(
            in_g1,
            jnp.where(
                b > 0, 0,
                jnp.where(r[23] > 0, jnp.minimum(r[23] + 1, 15), r[23]),
            ),
            nr[23],
        )
        nr[24] = sel(in_g1, r[24] + 1, nr[24])
        below = _msb16(
            nr[19] & (lax.shift_left(
                jnp.ones_like(b), jnp.maximum(r[18], 0)
            ) - 1)
        )
        g1_more = in_g1 * ((below >= 0) & (nr[24] < 8)).astype(jnp.int32)
        nr[18] = sel(g1_more, below, nr[18])
        g1_end = in_g1 * (1 - g1_more)
        nr[26] = sel(g1_end, nr[23], nr[26])  # prev_g1_ctx for next sb
        phase_u = sel(g1_end * (nr[25] >= 0).astype(jnp.int32), P_G2,
                      phase_u)
        sign_entry = g1_end * (nr[25] < 0).astype(jnp.int32)

        # ---- G2 update ----
        in_g2 = (phase == P_G2).astype(jnp.int32) * (1 - tu_now)
        nr[27] = sel(in_g2, b, nr[27])
        sign_entry = sign_entry + in_g2

        # ---- SIGN entry ----
        fs = _msb16(nr[19] & -nr[19])  # lowest set bit index
        ls = _msb16(nr[19])
        hid = shide * ((ls - fs) > 3).astype(jnp.int32)
        nr[31] = sel(sign_entry, hid, nr[31])
        nr[32] = sel(sign_entry, fs, nr[32])
        nr[30] = sel(sign_entry, 0, nr[30])
        nr[18] = sel(sign_entry, ls, nr[18])
        phase_u = sel(sign_entry, P_SIGN, phase_u)

        # ---- SIGN update ----
        in_sgn = (phase == P_SIGN).astype(jnp.int32) * (1 - tu_now)
        nmask2 = lax.shift_left(jnp.ones_like(b), jnp.maximum(r[18], 0))
        nr[30] = sel(in_sgn * b, nr[30] | nmask2, nr[30])
        below2 = _msb16(nr[19] & (nmask2 - 1))
        skipfs = (below2 == nr[32]) & (nr[31] > 0)
        below2 = jnp.where(skipfs, -1, below2)
        sgn_more = in_sgn * (below2 >= 0).astype(jnp.int32)
        nr[18] = sel(sgn_more, below2, nr[18])
        rem_entry = in_sgn * (1 - sgn_more)

        # ---- REM entry: rem mask, base sum, first rem coeff ----
        lastg1_bit = jnp.where(
            nr[25] >= 0,
            lax.shift_left(jnp.ones_like(b), jnp.maximum(nr[25], 0)),
            0,
        )
        remmask = (
            (nr[19] & ~nr[29])
            | (nr[28] & ~lastg1_bit)
            | (lastg1_bit * nr[27])
        )
        base_sum = _popcount16(nr[19] & ~remmask) + _popcount16(
            nr[28] & ~remmask
        )
        nr[36] = sel(rem_entry, remmask, nr[36])
        nr[34] = sel(rem_entry, base_sum, nr[34])
        nr[33] = sel(rem_entry, 0, nr[33])
        rem_first = _msb16(remmask)
        has_rem = rem_entry * (rem_first >= 0).astype(jnp.int32)

        def coeff_base(n):
            g1b = _srl(nr[28], jnp.maximum(n, 0)) & 1
            isl = (n == nr[25]).astype(jnp.int32) * (nr[25] >= 0)
            return 1 + g1b + isl * nr[27]

        nr[18] = sel(has_rem, rem_first, nr[18])
        nr[35] = sel(has_rem, coeff_base(rem_first), nr[35])
        cnt = jnp.where(has_rem > 0, 0, cnt)  # nr[9] takes cnt below
        phase_u = sel(has_rem, P_REMP, phase_u)
        flush_entry = rem_entry * (rem_first < 0).astype(jnp.int32)

        # ---- REM prefix update ----
        in_rp = (phase == P_REMP).astype(jnp.int32) * (1 - tu_now)
        rp_more = in_rp * b
        cnt = jnp.where(rp_more > 0, r[9] + 1, cnt)
        rp_done = in_rp * (1 - b)
        pfx = r[9]
        rice = nr[33]
        nsuf = jnp.where(pfx < 3, rice, pfx - 3 + rice)
        rem_imm = jnp.where(
            pfx < 3,
            lax.shift_left(pfx, rice),
            lax.shift_left(
                lax.shift_left(jnp.ones_like(pfx), jnp.maximum(pfx - 3, 0))
                + 2,
                rice,
            ),
        )
        goes_suf = rp_done * (nsuf > 0).astype(jnp.int32)
        nr[37] = sel(rp_done, pfx, nr[37])
        phase_u = sel(goes_suf, P_REMS, phase_u)
        cnt = jnp.where(goes_suf > 0, nsuf, cnt)
        nr[10] = sel(goes_suf, 0, nr[10])
        coeff_done_p = rp_done * (nsuf == 0).astype(jnp.int32)
        rem_val_p = rem_imm  # suffix-free value

        # ---- REM suffix update ----
        in_rs = (phase == P_REMS).astype(jnp.int32) * (1 - tu_now)
        acc3 = lax.shift_left(r[10], 1) | b
        nr[10] = sel(in_rs, acc3, nr[10])
        rs_done = in_rs * (r[9] == 1).astype(jnp.int32)
        cnt = jnp.where(in_rs * (1 - rs_done) > 0, r[9] - 1, cnt)
        pfx2 = nr[37]
        rice2 = nr[33]
        rem_val_s = jnp.where(
            pfx2 < 3,
            lax.shift_left(pfx2, rice2) + acc3,
            lax.shift_left(
                lax.shift_left(
                    jnp.ones_like(pfx2), jnp.maximum(pfx2 - 3, 0)
                ) + 2,
                rice2,
            ) + acc3,
        )

        coeff_done = coeff_done_p + rs_done
        rem_val = jnp.where(rs_done > 0, rem_val_s, rem_val_p)
        level = nr[35] + rem_val
        # Rice adaptation
        nr[33] = sel(
            coeff_done,
            jnp.where(
                level > lax.shift_left(3, nr[33]),
                jnp.minimum(nr[33] + 1, 4),
                nr[33],
            ),
            nr[33],
        )
        nr[34] = sel(coeff_done, nr[34] + level, nr[34])
        # store level into the per-subblock plane
        lv_mask = (
            (iota_lv == jnp.maximum(r[18], 0)).astype(jnp.int32)
            * coeff_done
        )
        levels[...] = levels[...] * (1 - lv_mask) + level * lv_mask
        below3 = _msb16(
            nr[36] & (lax.shift_left(
                jnp.ones_like(b), jnp.maximum(r[18], 0)
            ) - 1)
        )
        rem_more = coeff_done * (below3 >= 0).astype(jnp.int32)
        nr[18] = sel(rem_more, below3, nr[18])
        nr[35] = sel(rem_more, coeff_base(below3), nr[35])
        cnt = jnp.where(rem_more > 0, 0, cnt)
        phase_u = sel(rem_more, P_REMP, phase_u)
        flush_entry = flush_entry + coeff_done * (1 - rem_more)

        # ---- FLUSH entry ----
        nr[18] = sel(flush_entry, _msb16(nr[19]), nr[18])
        phase_u = sel(flush_entry, P_FLUSH, phase_u)

        # ---- FLUSH step: emit one coefficient event ----
        in_fl = (phase == P_FLUSH).astype(jnp.int32) * (1 - tu_now)
        n_f = jnp.maximum(r[18], 0)
        is_rem = _srl(nr[36], n_f) & 1
        lvsel = (iota_lv == n_f).astype(jnp.int32)
        lv_stored = jnp.sum(levels[...] * lvsel, axis=0, keepdims=True)
        lv = jnp.where(is_rem > 0, lv_stored, coeff_base(n_f))
        sgn = jnp.where(
            (nr[31] > 0) & (n_f == nr[32]),
            nr[34] & 1,
            _srl(nr[30], n_f) & 1,
        )
        val = jnp.where(sgn > 0, -lv, lv)
        ev = sel(
            in_fl,
            lax.shift_left(jnp.ones_like(n_f), 31)  # int32 sign bit
            | lax.shift_left(n_f, 26)
            | lax.shift_left(nr[13], 20)
            | (val & 0xFFFFF),
            ev,
        )
        below4 = _msb16(
            nr[19] & (lax.shift_left(jnp.ones_like(b), n_f) - 1)
        )
        fl_more = in_fl * (below4 >= 0).astype(jnp.int32)
        nr[18] = sel(fl_more, below4, nr[18])
        sb_end = in_fl * (1 - fl_more)

        # ---- next subblock / TU end ----
        next_sb = csbf_skip + sb_end + g1_entry * sig_empty_now
        nexti = nr[13] - 1
        tu_end = next_sb * (nexti < 0).astype(jnp.int32)
        sb_go = next_sb * (nexti >= 0).astype(jnp.int32)
        phase_u, cnt, _ = enter_sb(nexti, sb_go, phase_u, cnt, nr)
        phase_u = sel(tu_end, P_TAPE, phase_u)

        nr[7] = phase_u
        nr[9] = cnt
        # debug word: request kind | slot<<3 | bin<<12 | phase<<16
        dbg = kind | lax.shift_left(slot, 3) | lax.shift_left(b, 12) \
            | lax.shift_left(phase, 16)
        return ev, dbg, nr

    def group(g, carry):
        evs = []
        dbgs = []
        rr = list(carry)
        for j in range(4):
            ev, dbg, rr = step(rr)
            evs.append(ev)
            dbgs.append(dbg)
        events_ref[0, pl.ds(g * 4, 4), :] = jnp.concatenate(evs, axis=0)
        dbg_ref[0, pl.ds(g * 4, 4), :] = jnp.concatenate(dbgs, axis=0)
        return tuple(rr)

    carry = tuple(regs[j : j + 1] for j in range(NREG))
    carry = lax.fori_loop(0, blk // 4, group, carry)
    for j in range(NREG):
        regs[j : j + 1] = carry[j]
    state_out_ref[0] = ctx[...]


def _gen_call(B, W, S_env, S_steps, blk, interpret):
    # the kernel unrolls steps in groups of 4; a non-multiple blk would
    # silently skip the trailing steps of every block
    assert blk % 4 == 0, f"blk must be a multiple of 4, got {blk}"
    n_blocks = S_steps // blk
    kernel = partial(_kernel, blk=blk, n_words=W, s_env=S_env)
    return pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((256, LANES), lambda b, k: (0, 0)),
            pl.BlockSpec((1536, LANES), lambda b, k: (0, 0)),
            pl.BlockSpec((96, LANES), lambda b, k: (0, 0)),
            pl.BlockSpec((1, W, LANES), lambda b, k: (b, 0, 0)),
            pl.BlockSpec((1, S_env, LANES), lambda b, k: (b, 0, 0)),
            pl.BlockSpec((1, N_CTX, LANES), lambda b, k: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, N_CTX, LANES), lambda b, k: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_steps, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S_steps, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, N_CTX, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_CTX, LANES), jnp.int32),
            pltpu.VMEM((48, LANES), jnp.int32),
            pltpu.VMEM((16, LANES), jnp.int32),
        ],
        interpret=interpret,
    )


from functools import lru_cache


@lru_cache(maxsize=1)
def _tbl_device():
    return jnp.asarray(np.broadcast_to(_TBL[:, None], (256, LANES)).copy())


@lru_cache(maxsize=1)
def _sbtab_device():
    t = np.concatenate([_SB_FWD, _SB_INV])
    return jnp.asarray(np.broadcast_to(t[:, None], (1536, LANES)).copy())


@lru_cache(maxsize=1)
def _cotab_device():
    t = np.concatenate([_CO_FWD, _CO_INV])
    return jnp.asarray(np.broadcast_to(t[:, None], (96, LANES)).copy())


def pack_gen_batch(entries):
    """Pack up to 128 (rbsp, TraceSegment, env_tape, n_steps) lane tuples.

    Returns dict with words/tape/c0 arrays plus S_env/S_steps/W.
    """
    n = len(entries)
    assert n <= LANES
    max_bytes = max(s.byte_end - s.byte_start for _, s, _, _ in entries)
    W = -(-(max_bytes + 8) // 4)
    W = -(-W // 8) * 8
    by = np.zeros((W * 4, LANES), np.uint8)
    S_env = max(t.size for _, _, t, _ in entries) + 1
    S_env = -(-S_env // 8) * 8
    S_steps = max(ns for _, _, _, ns in entries)
    tape = np.full((S_env, LANES), KIND_PAD, np.int32)
    c0 = np.zeros((N_CTX, LANES), np.int32)
    for i, (rbsp, s, t, _) in enumerate(entries):
        chunk = np.frombuffer(rbsp[s.byte_start : s.byte_end], np.uint8)
        by[: chunk.size, i] = chunk
        tape[: t.size, i] = t
        c0[:, i] = s.p0.astype(np.int32) | (s.mps0.astype(np.int32) << 6)
    w32 = by.reshape(W, 4, LANES).astype(np.uint32)
    words = (
        (w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8) | w32[:, 3]
    ).view(np.int32)
    return {
        "words": words, "tape": tape, "c0": c0,
        "W": W, "S_env": S_env, "S_steps": S_steps,
    }


def run_gen_batch(entries, blk: int = 128, interpret: bool = False,
                  debug: bool = False):
    """Run the generator engine on <=128 streams.

    entries: (rbsp, TraceSegment, envelope_tape, n_steps) per lane.
    Returns (events [S_steps, 128], ctx_final [N_CTX, 128]). With
    debug=True the per-step request/bin/phase plane is ALSO fetched and
    kept on run_gen_batch.last_dbg (a [S_steps,128] D2H as large as the
    event plane — off the production path by default)."""
    p = pack_gen_batch(entries)
    S_steps = -(-p["S_steps"] // blk) * blk
    call = _gen_call(1, p["W"], p["S_env"], S_steps, blk, interpret)
    if interpret:
        # interpret-mode pallas dispatches each op eagerly (~0.4ms/op on
        # CPU); under jit the same lowering compiles to one XLA program
        # (disk-cached), ~100x faster for repeated validation runs
        call = jax.jit(call)
    ev, dbg, state = call(
        _tbl_device(),
        _sbtab_device(),
        _cotab_device(),
        jnp.asarray(p["words"][None]),
        jnp.asarray(p["tape"][None]),
        jnp.asarray(p["c0"][None]),
    )
    out = (np.asarray(ev)[0], np.asarray(state)[0])
    if debug:
        run_gen_batch.last_dbg = np.asarray(dbg)[0]
    return out


def scatter_events(events_lane: np.ndarray, spans: list, planes: list):
    """Scatter one lane's event stream into coefficient planes.

    events_lane: [S] int32 event words from the kernel; spans: this
    segment's ResidualSpans in decode order; planes: [y, cb, cr] int32
    arrays (mutated). Pure bookkeeping — no arithmetic decode."""
    ev = events_lane[events_lane != 0]
    si = -1
    sp = None
    sb_cache = co_cache = None
    for w in ev:
        w = int(w)
        if w & (1 << 31):  # coefficient
            n = (w >> 26) & 15
            sbi = (w >> 20) & 63
            val = w & 0xFFFFF
            if val & (1 << 19):
                val -= 1 << 20
            xs, ys = sb_cache[sbi]
            xp, yp = co_cache[n]
            planes[sp.c_idx][
                sp.y0 + (ys << 2) + yp, sp.x0 + (xs << 2) + xp
            ] = val
        elif w & (1 << 30):  # TU start
            si += 1
            assert (w & 0xFF) == (si & 0xFF), "TU sequence desync"
            sp = spans[si]
            sb = (1 << sp.log2) >> 2
            so = scan_order(sb, sp.scan_idx)
            sb_cache = [(int(so[i, 0]), int(so[i, 1])) for i in range(sb * sb)]
            co = scan_order(4, sp.scan_idx)
            co_cache = [(int(co[i, 0]), int(co[i, 1])) for i in range(16)]
    assert si == len(spans) - 1, f"saw {si + 1} TUs, expected {len(spans)}"


# --------------------------------------------------------------------------
# Whole-image runs: sorted lane batches over every (tile, WPP-row) stream
# --------------------------------------------------------------------------


def pack_gen_batches(entries):
    """Sort (rbsp, seg, tape, n_steps, spans) tuples into 128-lane
    batches by step count (keeps per-batch lockstep padding low, same
    doctrine as pallas_cabac.pack_sorted_batches). Returns a list of
    (lane_entries, entry_idx) pairs."""
    order = sorted(range(len(entries)), key=lambda i: entries[i][3])
    return [
        ([entries[i] for i in order[lo : lo + LANES]],
         order[lo : lo + LANES])
        for lo in range(0, len(order), LANES)
    ]


def gen_image(entries, blk: int = 512, interpret: bool = False):
    """Run the generator engine over every stream of an image.

    entries: (rbsp, TraceSegment, envelope_tape, n_steps, spans) per
    stream. Returns per-entry (events_col, p_final, mps_final) in input
    order."""
    results = [None] * len(entries)
    for batch, idx in pack_gen_batches(entries):
        ev, state = run_gen_batch(
            [(rb, s, t, ns) for rb, s, t, ns, _ in batch],
            blk=blk, interpret=interpret,
        )
        for lane, ei in enumerate(idx):
            results[ei] = (
                ev[:, lane],
                (state[:, lane] & 63).astype(np.uint8),
                ((state[:, lane] >> 6) & 1).astype(np.uint8),
            )
    return results


def bench_gen_image(entries, blk: int = 512, reps: int = 3):
    """Execution throughput of the generator over all streams: fresh
    inputs per rep, checksum-forced execution (tunneled runtimes
    content-cache identical launches and block_until_ready alone does
    not await the work). Returns (real_mbins_s, steps_per_s, wall_s)."""
    import time

    packed = []
    for batch, idx in pack_gen_batches(entries):
        p = pack_gen_batch([(rb, s, t, ns) for rb, s, t, ns, _ in batch])
        packed.append(p)
    total_bins = sum(s.n_bins for _, s, _, _, _ in entries)
    total_steps = 0

    fns = []
    for p in packed:
        S_steps = -(-p["S_steps"] // blk) * blk
        total_steps += S_steps
        call = _gen_call(1, p["W"], p["S_env"], S_steps, blk, False)

        def f(tbl, sb, co, w, t, c, _call=call):
            ev, dbg, state = _call(tbl, sb, co, w, t, c)
            return (
                jnp.sum(ev, dtype=jnp.int32),
                jnp.sum(state, dtype=jnp.int32),
            )

        fns.append(jax.jit(f))

    def argset(rep):
        out = []
        for p in packed:
            w = p["words"].copy()
            w[-1, :] ^= rep + 1  # tail word, never consumed
            out.append((
                _tbl_device(), _sbtab_device(), _cotab_device(),
                jnp.asarray(w[None]), jnp.asarray(p["tape"][None]),
                jnp.asarray(p["c0"][None]),
            ))
        return out

    outs = [fn(*a) for fn, a in zip(fns, argset(0))]
    chk0 = [(int(x[0]), int(x[1])) for x in outs]  # compile + warm
    best = float("inf")
    for rep in range(reps):
        a = argset(rep + 1)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        outs = [fn(*arg) for fn, arg in zip(fns, a)]
        chk = [(int(x[0]), int(x[1])) for x in outs]
        dt = time.perf_counter() - t0
        assert chk == chk0, "nondeterministic generation?!"
        best = min(best, dt)
    return total_bins / best / 1e6, total_steps / best, best
