"""Pallas TPU CABAC arithmetic-decoder state machine (H.265 §9.3.4.3).

Device twin of heif_tpu.cabac.engine.CabacEngine (and of the reference's
scalar engine, src/cabac/arithmetic.rs): 128 independent CABAC streams run
in the lane dimension, one bin per step, fully branchless — every lane
carries (ivlCurrRange, ivlOffset, bit cursor) plus the dense 136-slot
context-state vector, and each step executes the decision/bypass/terminate
paths simultaneously and selects by the request kind.

This is the SURVEY.md §7 step-6 component: the entropy engine as a Pallas
kernel over independent substreams (grid tile x WPP row). It executes a
REQUEST TAPE — the (kind, ctx-slot) sequence for each stream — because
request generation (the syntax state machine / binarization layer) is the
staged follow-up; the tape contract lets the engine be validated bit-exact
against real bitstreams today (see cabac/trace.py) and swapped under a
device-side syntax driver later.

Memory/VPU mapping notes:
- streams are packed 4 bytes/word into int32, transposed [words, lane];
  bit reads use a 64-bit funnel over (cur, nxt) registers, refilled by a
  masked sum over the word window (per-lane positions diverge, so the
  refill is a per-lane row select, not a dynamic slice).
- context state is one int32 [136, 128] VMEM plane: slot value packs
  pStateIdx | valMps<<6. Reads/writes are iota==slot masked ops.
- Tables 9-45/9-46 are packed into one [256]-row constant: transIdxMps |
  transIdxLps<<8 | rangeTabLps<<16, so each bin needs ONE table select.

Measured (v5e, ALL 768 real halfmoonbay WPP streams — 48 tiles x 16 rows,
15.36M bins — bit-exact incl. final context state): **~46 Mbins/s real
aggregate** (~56 Mbins/s padded; length-sorted lane batches keep padding
waste at 1.23x), ~2.4us per 128-lane bin step. Measurement discipline
matters on tunneled runtimes: repeated executions with identical inputs
are content-cached and `block_until_ready` alone is not a reliable
completion barrier, so `bench_device_entropy` times launches with fresh
inputs per rep and forces execution with a checksum readback. The
remaining per-bin cost is per-lane dynamic addressing (stream-word fetch
and context read/write are iota-mask reductions over [W,128]/[136,128]
planes — TPU vector memory has no per-lane gather), so throughput rises
as stream windows shrink. The C++ host decoder (heif_tpu/native) remains
the default production entropy path on CPU-rich hosts; this engine makes
device-side entropy a real alternative at ~1.5x a single host core.
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
from heif_tpu.cabac.trace import KIND_BYPASS, KIND_CTX, KIND_PAD, KIND_TERMINATE

LANES = 128
N_CTX = E.N_CTX  # 136 (multiple of 8)
assert N_CTX % 8 == 0

# packed spec tables: row p*4+q -> transMps | transLps<<8 | rangeLps<<16
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


def _kernel(tbl_ref, words_ref, c0_ref, kinds_ref, slots_ref,
            bins_ref, state_out_ref, ctx, regs, *,
            blk: int, n_blocks: int, n_words: int):
    """One grid step: decode `blk` bins for 128 streams of one batch."""
    k = pl.program_id(1)

    iota_ctx = lax.broadcasted_iota(jnp.int32, (N_CTX, LANES), 0)
    iota_w = lax.broadcasted_iota(jnp.int32, (n_words, LANES), 0)
    iota_tbl = lax.broadcasted_iota(jnp.int32, (256, LANES), 0)
    words = words_ref[0]
    tblcol = tbl_ref[...]  # [256, LANES] broadcast constant

    def fetch_word(idx):
        """words[idx[lane], lane] for per-lane idx [1, LANES]."""
        m = (iota_w == idx).astype(jnp.int32)
        return jnp.sum(words * m, axis=0, keepdims=True)

    def read_bits(cur, nxt, wi, biw, L):
        """Consume L[lane] (0..9) bits MSB-first from the (cur,nxt) funnel.

        Returns (value, cur, nxt, wi, biw). One unconditional word fetch
        per call keeps the step branchless.
        """
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

    @pl.when(k == 0)
    def _init():
        ctx[...] = c0_ref[0]
        # engine start (§9.3.4.3.1): range=510, offset = 9 bits
        zero = jnp.zeros((1, LANES), jnp.int32)
        cur = fetch_word(zero)
        nxt = fetch_word(zero + 1)
        off, cur, nxt, wi, biw = read_bits(cur, nxt, zero, zero, zero + 9)
        regs[0:1] = zero + 510  # rng
        regs[1:2] = off
        regs[2:3] = wi
        regs[3:4] = biw
        regs[4:5] = cur
        regs[5:6] = nxt

    def bin_step(kind, slot, carry):
        rng, off, wi, biw, cur, nxt = carry
        # --- context read: c = pState | mps<<6 ---
        cmask = (iota_ctx == slot).astype(jnp.int32)
        c = jnp.sum(ctx[...] * cmask, axis=0, keepdims=True)
        p = c & 63
        mps = _srl(c, 6)

        # --- decision path (§9.3.4.3.2) ---
        q = _srl(rng, 6) & 3
        tmask = (iota_tbl == (p * 4 + q)).astype(jnp.int32)
        packed = jnp.sum(tblcol * tmask, axis=0, keepdims=True)
        lps = _srl(packed, 16) & 255
        rng2 = rng - lps
        is_lps = (off >= rng2).astype(jnp.int32)
        bin_ctx = jnp.where(is_lps > 0, 1 - mps, mps)
        off_ctx = jnp.where(is_lps > 0, off - rng2, off)
        rng_ctx = jnp.where(is_lps > 0, lps, rng2)
        new_mps = jnp.where((is_lps > 0) & (p == 0), 1 - mps, mps)
        new_p = jnp.where(is_lps > 0, _srl(packed, 8) & 255, packed & 255)
        c_new = new_p | lax.shift_left(new_mps, 6)

        # --- terminate path (§9.3.4.3.5) ---
        rng_t = rng - 2
        bin_t = (off >= rng_t).astype(jnp.int32)

        # --- select pre-renorm state by kind ---
        is_ctx = (kind == KIND_CTX).astype(jnp.int32)
        is_byp = (kind == KIND_BYPASS).astype(jnp.int32)
        is_trm = (kind == KIND_TERMINATE).astype(jnp.int32)
        offb = jnp.where(is_ctx > 0, off_ctx, off)
        rngf = jnp.where(
            is_ctx > 0, rng_ctx, jnp.where(is_trm > 0, rng_t, rng)
        )
        # renorm shift (rngf >= 2 always): 0..7; bypass always 1;
        # terminate with bin 1 does not renorm; pad consumes nothing
        sh = (
            (rngf < 256).astype(jnp.int32) + (rngf < 128) + (rngf < 64)
            + (rngf < 32) + (rngf < 16) + (rngf < 8) + (rngf < 4)
        )
        L = jnp.where(
            is_byp > 0,
            1,
            jnp.where(
                is_trm > 0, jnp.where(bin_t > 0, 0, sh), jnp.where(is_ctx > 0, sh, 0)
            ),
        )
        v, cur, nxt, wi, biw = read_bits(cur, nxt, wi, biw, L)

        off_sh = lax.shift_left(offb, L) | v
        # bypass compares after the shift-in
        bin_b = (off_sh >= rng).astype(jnp.int32)
        off_byp = off_sh - rng * bin_b
        bin_out = jnp.where(
            is_ctx > 0, bin_ctx, jnp.where(is_byp > 0, bin_b, bin_t)
        )
        off_new = jnp.where(is_byp > 0, off_byp, off_sh)
        rng_new = jnp.where(is_byp > 0, rng, lax.shift_left(rngf, L))
        # pad lanes: freeze everything
        is_pad = (kind == KIND_PAD).astype(jnp.int32)
        off_new = jnp.where(is_pad > 0, off, off_new)
        rng_new = jnp.where(is_pad > 0, rng, rng_new)

        # --- context write (ctx-coded bins only) ---
        wmask = cmask * is_ctx
        ctx[...] = ctx[...] * (1 - wmask) + c_new * wmask

        return bin_out, (rng_new, off_new, wi, biw, cur, nxt)

    def group(g, carry):
        # one [8, LANES] tape row-group per iteration, statically unrolled:
        # dynamic per-bin sublane slices lower poorly on Mosaic
        kwin = kinds_ref[0, pl.ds(g * 8, 8), :]
        swin = slots_ref[0, pl.ds(g * 8, 8), :]
        outs = []
        for j in range(8):
            kind = kwin[j : j + 1, :]
            slot = swin[j : j + 1, :]
            bin_out, carry = bin_step(kind, slot, carry)
            outs.append(bin_out)
        bins_ref[0, pl.ds(g * 8, 8), :] = jnp.concatenate(outs, axis=0)
        return carry

    carry = tuple(regs[j : j + 1] for j in range(6))
    carry = lax.fori_loop(0, blk // 8, group, carry)
    for j in range(6):
        regs[j : j + 1] = carry[j]
    state_out_ref[0] = ctx[...]


def _replay_call(B, W, S_pad, blk, interpret):
    """Build the pallas_call for B lane-batches x S_pad bins (jit-cached
    per shape by pallas itself; callers may reuse the returned callable
    with device-resident inputs for transfer-free execution)."""
    n_blocks = S_pad // blk
    kernel = partial(_kernel, blk=blk, n_blocks=n_blocks, n_words=W)
    return pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((256, LANES), lambda b, k: (0, 0)),
            pl.BlockSpec((1, W, LANES), lambda b, k: (b, 0, 0)),
            pl.BlockSpec((1, N_CTX, LANES), lambda b, k: (b, 0, 0)),
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, N_CTX, LANES), lambda b, k: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, N_CTX, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_CTX, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )


def _tbl_device():
    return jnp.asarray(np.broadcast_to(_TBL[:, None], (256, LANES)).copy())


def cabac_replay_batches(
    words: np.ndarray,   # [B, W, 128] int32 big-endian packed stream words
    c0: np.ndarray,      # [B, N_CTX, 128] int32 packed p|mps<<6
    kinds: np.ndarray,   # [B, S, 128] int32 (KIND_*)
    slots: np.ndarray,   # [B, S, 128] int32
    blk: int = 2048,
    interpret: bool = False,
):
    """Decode S bins for B x 128 streams in ONE kernel launch (the grid's
    first axis walks lane-batches; per-batch context state re-inits at
    block 0). Returns (bins [B,S,128], ctx_final [B,N_CTX,128])."""
    B, W = words.shape[0], words.shape[1]
    S = kinds.shape[1]
    S_pad = -(-S // blk) * blk
    if S_pad != S:
        pad = np.full((B, S_pad - S, LANES), KIND_PAD, np.int32)
        kinds = np.concatenate([kinds, pad], axis=1)
        slots = np.concatenate([slots, np.zeros_like(pad)], axis=1)
    bins, state = _replay_call(B, W, S_pad, blk, interpret)(
        _tbl_device(),
        jnp.asarray(words),
        jnp.asarray(c0),
        jnp.asarray(kinds),
        jnp.asarray(slots),
    )
    return np.asarray(bins)[:, :S], np.asarray(state)


def cabac_replay_batch(
    words: np.ndarray,   # [W, 128] int32 big-endian packed stream words
    c0: np.ndarray,      # [N_CTX, 128] int32 packed p|mps<<6
    kinds: np.ndarray,   # [S, 128] int32 (KIND_*)
    slots: np.ndarray,   # [S, 128] int32
    blk: int = 2048,
    interpret: bool = False,
):
    """Decode S bins for 128 streams; returns (bins [S,128], ctx_final)."""
    S = kinds.shape[0]
    bins, state = cabac_replay_batches(
        words[None], c0[None], kinds[None], slots[None],
        blk=blk, interpret=interpret,
    )
    return bins[0, :S], state[0]


def bench_replay_device(
    words, c0, kinds, slots, blk: int = 2048, reps: int = 3
):
    """Execution-only throughput of the device engine: inputs are staged
    on device once, the launch is timed with block_until_ready, and the
    result stays on device (the serving model — tapes and bins live next
    to the consuming kernels; see module docstring on measurement).
    Returns (mbins_per_s, us_per_step)."""
    import time

    B, W = words.shape[0], words.shape[1]
    S = kinds.shape[1]
    S_pad = -(-S // blk) * blk
    if S_pad != S:
        pad = np.full((B, S_pad - S, LANES), KIND_PAD, np.int32)
        kinds = np.concatenate([kinds, pad], axis=1)
        slots = np.concatenate([slots, np.zeros_like(pad)], axis=1)
    fn = _replay_call(B, W, S_pad, blk, False)
    # distinct argument sets per rep: the tunneled runtime content-caches
    # repeated executions with identical inputs, which would make
    # repeat timings measure the cache, not the kernel
    argsets = []
    for rep in range(reps + 1):
        w = words.copy()
        w[:, -1, :] ^= rep + 1  # tail word: never reached by real tapes
        argsets.append((
            _tbl_device(), jnp.asarray(w), jnp.asarray(c0),
            jnp.asarray(kinds), jnp.asarray(slots),
        ))
    jax.block_until_ready(argsets)
    out = fn(*argsets[0])
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        out = fn(*argsets[rep + 1])
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    steps = B * S_pad
    us_per_step = best / S_pad * 1e6
    mbins = steps * LANES / best / 1e6
    return mbins, us_per_step


# --------------------------------------------------------------------------
# Windowed engine variant: per-block rebased stream windows
# --------------------------------------------------------------------------
#
# Hypothesis tested: the per-bin stream-word fetch (an iota-mask reduction
# over all W words of the longest lane, W ~ 1184 on halfmoonbay) dominates
# the bin cost. The host trace knows every lane's bit position at every
# bin, so this variant ships, per bin-block, a small REBASED word window
# (w_blk collapses to 16 rows) plus the base bit offset, and the kernel
# re-anchors its bit reader at each block boundary.
#
# MEASURED RESULTS (v5e, all 768 real streams, bit-exact):
# - window shrink alone (W 1184 -> 16): throughput UNCHANGED vs the
#   full-stream kernel (~35-42 Mbins/s real) — the per-bin word fetch
#   was never the bottleneck;
# - adding packed contexts (4 slots/word, 34 rows) and byte-packed
#   tables (one 64-row mask serving both constants): ~42-50 Mbins/s
#   real — a 10-20% gain. The residual floor is the per-bin-step
#   elementwise op count and Mosaic loop overhead, not memory masks.
# Kept as the faster replay variant. (The round-5 request GENERATOR,
# ops/pallas_cabac_gen.py, ended up NOT needing block rebasing: its
# per-lane bit funnel advances with the lane's own requests, so the
# full-stream word fetch serves it directly — the negative result above
# predicted exactly that the fetch width would not matter.)


N_CTXP = N_CTX // 4  # packed context rows (4 slots of p|mps<<6 per word)


def _kernel_windowed(tbl_ref, words_ref, biw0_ref, c0_ref, kinds_ref,
                     slots_ref, bins_ref, state_out_ref, ctx, regs, *,
                     blk: int, w_blk: int):
    k = pl.program_id(1)

    iota_ctx = lax.broadcasted_iota(jnp.int32, (N_CTXP, LANES), 0)
    iota_w = lax.broadcasted_iota(jnp.int32, (w_blk, LANES), 0)
    iota_tbl = lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    words = words_ref[0, 0]
    tblcol = tbl_ref[...]  # [64,LANES]: rangeLps for q=0..3 packed per byte

    def fetch_word(idx):
        m = (iota_w == idx).astype(jnp.int32)
        return jnp.sum(words * m, axis=0, keepdims=True)

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

    @pl.when(k == 0)
    def _init_ctx():
        ctx[...] = c0_ref[0]
        regs[0:1] = jnp.full((1, LANES), 510, jnp.int32)  # rng placeholder

    # rebase the bit reader at EVERY block start: window word 0 holds the
    # lane's current bit position (biw0 = bit offset within it)
    zero = jnp.zeros((1, LANES), jnp.int32)
    biw = biw0_ref[0, 0]
    wi = zero
    cur = fetch_word(zero)
    nxt = fetch_word(zero + 1)

    @pl.when(k == 0)
    def _init_engine():
        # §9.3.4.3.1: range=510, offset = 9 bits
        off, c2, n2, w2, b2 = read_bits(cur, nxt, wi, biw, zero + 9)
        regs[0:1] = zero + 510
        regs[1:2] = off
        regs[2:3] = w2
        regs[3:4] = b2
        regs[4:5] = c2
        regs[5:6] = n2

    @pl.when(k > 0)
    def _rebase():
        regs[2:3] = wi
        regs[3:4] = biw
        regs[4:5] = cur
        regs[5:6] = nxt

    def bin_step(kind, slot, carry):
        rng, off, wi, biw, cur, nxt = carry
        # packed context fetch: 4 slots per word -> one mask over 34 rows
        crow = _srl(slot, 2)
        csh = lax.shift_left(slot & 3, 3)  # byte offset * 8
        cmask = (iota_ctx == crow).astype(jnp.int32)
        cword = jnp.sum(ctx[...] * cmask, axis=0, keepdims=True)
        c = _srl(cword, csh) & 127
        p = c & 63
        mps = _srl(c, 6)

        # packed tables: ONE row mask (on p) serves both constants
        q = _srl(rng, 6) & 3
        tmask = (iota_tbl == p).astype(jnp.int32)
        ta = jnp.sum(tblcol[:64] * tmask, axis=0, keepdims=True)
        tb = jnp.sum(tblcol[64:] * tmask, axis=0, keepdims=True)
        lps = _srl(ta, lax.shift_left(q, 3)) & 255
        rng2 = rng - lps
        is_lps = (off >= rng2).astype(jnp.int32)
        bin_ctx = jnp.where(is_lps > 0, 1 - mps, mps)
        off_ctx = jnp.where(is_lps > 0, off - rng2, off)
        rng_ctx = jnp.where(is_lps > 0, lps, rng2)
        new_mps = jnp.where((is_lps > 0) & (p == 0), 1 - mps, mps)
        new_p = jnp.where(is_lps > 0, _srl(tb, 8) & 255, tb & 255)
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

        # packed RMW: splice the 7-bit field back into its byte lane
        word_new = (cword & ~lax.shift_left(127, csh)) | lax.shift_left(
            c_new, csh
        )
        wmask = cmask * is_ctx
        ctx[...] = ctx[...] + wmask * (word_new - cword)

        return bin_out, (rng_new, off_new, wi, biw, cur, nxt)

    def group(g, carry):
        kwin = kinds_ref[0, pl.ds(g * 8, 8), :]
        swin = slots_ref[0, pl.ds(g * 8, 8), :]
        outs = []
        for j in range(8):
            bin_out, carry = bin_step(kwin[j : j + 1, :], swin[j : j + 1, :],
                                      carry)
            outs.append(bin_out)
        bins_ref[0, pl.ds(g * 8, 8), :] = jnp.concatenate(outs, axis=0)
        return carry

    carry = tuple(regs[j : j + 1] for j in range(6))
    carry = lax.fori_loop(0, blk // 8, group, carry)
    for j in range(6):
        regs[j : j + 1] = carry[j]
    state_out_ref[0] = ctx[...]


def _tbl_device_packed():
    """[128, LANES] constant: rows 0..63 = rangeTabLps q0..q3 packed per
    byte; rows 64..127 = transIdxMps | transIdxLps<<8."""
    a = np.zeros(64, np.int64)
    b = np.zeros(64, np.int64)
    for p in range(64):
        for q in range(4):
            a[p] |= int(E.RANGE_TAB_LPS[p * 4 + q]) << (8 * q)
        b[p] = int(E.TRANS_IDX_MPS[p]) | (int(E.TRANS_IDX_LPS[p]) << 8)
    packed = np.concatenate([a, b]).astype(np.int32)
    return jnp.asarray(np.broadcast_to(packed[:, None], (128, LANES)).copy())


def _pack_ctx4(c0: np.ndarray) -> np.ndarray:
    """[N_CTX, LANES] -> [N_CTX//4, LANES], 4 slots per word (8 bits
    each, p|mps<<6 in the low 7)."""
    c = c0.astype(np.int64).reshape(N_CTXP, 4, -1)
    return (
        c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16) | (c[:, 3] << 24)
    ).astype(np.int32)


def _unpack_ctx4(packed: np.ndarray) -> np.ndarray:
    """[N_CTX//4, LANES] -> [N_CTX, LANES] (row r holds slots 4r..4r+3)."""
    out = np.zeros((N_CTX, packed.shape[-1]), np.int32)
    for j in range(4):
        out[j::4] = (packed >> (8 * j)) & 127
    return out


def _windowed_call(n_blocks, w_blk, blk, interpret):
    kernel = partial(_kernel_windowed, blk=blk, w_blk=w_blk)
    return pl.pallas_call(
        kernel,
        grid=(1, n_blocks),
        in_specs=[
            pl.BlockSpec((128, LANES), lambda b, k: (0, 0)),
            pl.BlockSpec((1, 1, w_blk, LANES), lambda b, k: (b, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, LANES), lambda b, k: (b, k, 0, 0)),
            pl.BlockSpec((1, N_CTXP, LANES), lambda b, k: (b, 0, 0)),
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, LANES), lambda b, k: (b, k, 0)),
            pl.BlockSpec((1, N_CTXP, LANES), lambda b, k: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_blocks * blk, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, N_CTXP, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_CTXP, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )


def pack_windowed_batch(batch, blk: int = 256):
    """Pack up to 128 (rbsp, TraceSegment) pairs into windowed-replay
    arrays. Segments must carry `positions` (bit pos after each bin).

    Returns dict(windows, biw0, c0, kinds, slots, n_blocks, w_blk)."""
    n = len(batch)
    assert n <= LANES
    S = max(s.n_bins for _, s in batch)
    S_pad = -(-S // blk) * blk
    n_blocks = S_pad // blk
    kinds = np.full((S_pad, LANES), KIND_PAD, np.int32)
    slots = np.zeros((S_pad, LANES), np.int32)
    c0 = np.zeros((N_CTX, LANES), np.int32)

    # per-lane word arrays (whole segment, for window gathers)
    lane_words = []
    base_bits = []
    for i, (rbsp, s) in enumerate(batch):
        kinds[: s.n_bins, i] = s.kinds
        slots[: s.n_bins, i] = s.slots
        c0[:, i] = s.p0.astype(np.int32) | (s.mps0.astype(np.int32) << 6)
        chunk = np.frombuffer(rbsp[s.byte_start : s.byte_end], np.uint8)
        nw = -(-(chunk.size + 8) // 4)
        by = np.zeros(nw * 4, np.uint8)
        by[: chunk.size] = chunk
        w32 = by.reshape(nw, 4).astype(np.uint32)
        lane_words.append(
            ((w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8)
             | w32[:, 3]).view(np.int32)
        )
        base_bits.append(s.byte_start * 8)

    # block-start positions per lane (relative to segment start)
    starts = np.zeros((n_blocks, LANES), np.int64)
    ends = np.zeros((n_blocks, LANES), np.int64)
    for i, (_, s) in enumerate(batch):
        pos = np.asarray(s.positions, np.int64) - base_bits[i]
        nb = s.n_bins
        for k in range(n_blocks):
            b0 = k * blk
            starts[k, i] = 0 if b0 == 0 else pos[min(b0, nb) - 1]
            b1 = min((k + 1) * blk, nb)
            ends[k, i] = pos[b1 - 1] if b1 > 0 else 0
    # window size: bits consumed + funnel lookahead (cur,nxt + prefetch)
    need = ((starts & 31) + (ends - starts)) // 32 + 3
    w_blk = int(-(-int(need.max()) // 8) * 8)

    windows = np.zeros((n_blocks, w_blk, LANES), np.int32)
    biw0 = np.zeros((n_blocks, 1, LANES), np.int32)
    for i in range(n):
        lw = lane_words[i]
        for k in range(n_blocks):
            base = int(starts[k, i] >> 5)
            biw0[k, 0, i] = int(starts[k, i] & 31)
            src = lw[base : base + w_blk]
            windows[k, : src.size, i] = src
    return {
        "windows": windows, "biw0": biw0, "c0": c0,
        "kinds": kinds, "slots": slots,
        "n_blocks": n_blocks, "w_blk": w_blk, "S_pad": S_pad,
    }


def replay_windowed_batch(batch, blk: int = 256, interpret: bool = False):
    """Windowed replay of <=128 segments; returns (bins [S_pad,128],
    state [N_CTX,128])."""
    p = pack_windowed_batch(batch, blk=blk)
    bins, state = _windowed_call(
        p["n_blocks"], p["w_blk"], blk, interpret
    )(
        _tbl_device_packed(),
        jnp.asarray(p["windows"][None]),
        jnp.asarray(p["biw0"][None]),
        jnp.asarray(_pack_ctx4(p["c0"])[None]),
        jnp.asarray(p["kinds"][None]),
        jnp.asarray(p["slots"][None]),
    )
    return np.asarray(bins)[0], _unpack_ctx4(np.asarray(state)[0])


# --------------------------------------------------------------------------
# Whole-image replay: sorted lane batches over every (tile, WPP-row) stream
# --------------------------------------------------------------------------


def pack_sorted_batches(entries, blk: int = 1024):
    """Pack (rbsp, TraceSegment) pairs into 128-lane batches grouped by
    tape length (sorting keeps the per-batch pad target close to each
    lane's real length; unsorted packing wastes ~2.2x on halfmoonbay,
    sorted ~1.2x). Returns a list of dicts with the packed arrays and the
    batch's (entry, lane) assignment."""
    order = sorted(range(len(entries)), key=lambda i: entries[i][1].n_bins)
    out = []
    for lo in range(0, len(order), LANES):
        idx = order[lo : lo + LANES]
        batch = [entries[i] for i in idx]
        max_bytes = max(s.byte_end - s.byte_start for _, s in batch)
        W = -(-(max_bytes + 8) // 4)
        W = -(-W // 8) * 8
        by = np.zeros((W * 4, LANES), np.uint8)
        S = max(s.n_bins for _, s in batch)
        S_pad = -(-S // blk) * blk
        kinds = np.full((S_pad, LANES), KIND_PAD, np.int32)
        slots = np.zeros((S_pad, LANES), np.int32)
        c0 = np.zeros((N_CTX, LANES), np.int32)
        for i, (rbsp, s) in enumerate(batch):
            chunk = np.frombuffer(rbsp[s.byte_start : s.byte_end], np.uint8)
            by[: chunk.size, i] = chunk
            kinds[: s.n_bins, i] = s.kinds
            slots[: s.n_bins, i] = s.slots
            c0[:, i] = s.p0.astype(np.int32) | (s.mps0.astype(np.int32) << 6)
        w32 = by.reshape(W, 4, LANES).astype(np.uint32)
        words = (
            (w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8)
            | w32[:, 3]
        ).view(np.int32)
        out.append({
            "words": words, "c0": c0, "kinds": kinds, "slots": slots,
            "W": W, "S_pad": S_pad, "entry_idx": idx,
        })
    return out


def replay_image(entries, blk: int = 1024, interpret: bool = False):
    """Replay every stream of an image (list of (rbsp, TraceSegment));
    returns per-entry (bins, p_final, mps_final) in input order."""
    packed = pack_sorted_batches(entries, blk=blk)
    results = [None] * len(entries)
    for b in packed:
        bins, state = cabac_replay_batch(
            b["words"], b["c0"], b["kinds"], b["slots"],
            blk=blk, interpret=interpret,
        )
        for lane, ei in enumerate(b["entry_idx"]):
            s = entries[ei][1]
            results[ei] = (
                bins[: s.n_bins, lane].astype(np.uint8),
                (state[:, lane] & 63).astype(np.uint8),
                (state[:, lane] >> 6).astype(np.uint8),
            )
    return results


def bench_device_entropy(entries, blk: int = 1024, reps: int = 3):
    """Honest aggregate device-entropy throughput over all streams of an
    image. Fresh inputs per rep (the tunneled runtime content-caches
    identical executions) and a checksum readback per launch (execution
    barrier `block_until_ready` alone does not reliably await the work).
    Returns (real_mbins_per_s, padded_mbins_per_s, wall_s)."""
    import time

    packed = pack_sorted_batches(entries, blk=blk)
    total_bins = sum(s.n_bins for _, s in entries)
    pad_steps = sum(b["S_pad"] for b in packed)

    def make_fn(W, S_pad):
        call = _replay_call(1, W, S_pad, blk, False)

        def f(tbl, w, c0, k, s):
            bins, state = call(tbl, w, c0, k, s)
            return (
                jnp.sum(bins, dtype=jnp.int32),
                jnp.sum(state, dtype=jnp.int32),
            )

        return jax.jit(f)

    fns = [make_fn(b["W"], b["S_pad"]) for b in packed]

    def argset(rep):
        out = []
        for b in packed:
            w = b["words"].copy()
            w[-1, :] ^= rep + 1  # tail word, never consumed by real tapes
            out.append((
                _tbl_device(), jnp.asarray(w[None]),
                jnp.asarray(b["c0"][None]), jnp.asarray(b["kinds"][None]),
                jnp.asarray(b["slots"][None]),
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
        assert chk == chk0, "nondeterministic replay?!"
        best = min(best, dt)
    return (
        total_bins / best / 1e6,
        pad_steps * LANES / best / 1e6,
        best,
    )


# --------------------------------------------------------------------------
# Host-side packing of trace segments into lane batches
# --------------------------------------------------------------------------


def pack_segments(rbsp: bytes, segments, blk: int = 2048):
    """Pack up to 128 TraceSegments into one replay batch.

    Returns (words, c0, kinds, slots, expected_bins_list).
    """
    n = len(segments)
    assert n <= LANES
    max_bytes = max((s.byte_end - s.byte_start for s in segments), default=4)
    W = -(-(max_bytes + 8) // 4)
    W = -(-W // 8) * 8
    by = np.zeros((W * 4, LANES), np.uint8)
    for i, s in enumerate(segments):
        chunk = np.frombuffer(rbsp[s.byte_start : s.byte_end], np.uint8)
        by[: chunk.size, i] = chunk
    w32 = by.reshape(W, 4, LANES).astype(np.uint32)
    # big-endian pack as int32 (bit patterns preserved via view)
    words = (
        (w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8) | w32[:, 3]
    ).view(np.int32)

    S = max((s.n_bins for s in segments), default=1)
    kinds = np.full((S, LANES), KIND_PAD, np.int32)
    slots = np.zeros((S, LANES), np.int32)
    c0 = np.zeros((N_CTX, LANES), np.int32)
    for i, s in enumerate(segments):
        kinds[: s.n_bins, i] = s.kinds
        slots[: s.n_bins, i] = s.slots
        c0[:, i] = s.p0.astype(np.int32) | (s.mps0.astype(np.int32) << 6)
    return words, c0, kinds, slots


def replay_segments(
    rbsp: bytes, segments, interpret: bool = False, blk: int = 2048
):
    """Replay trace segments on the device engine; returns per-segment
    (bins, p_final, mps_final)."""
    words, c0, kinds, slots = pack_segments(rbsp, segments)
    bins, state = cabac_replay_batch(
        words, c0, kinds, slots, blk=blk, interpret=interpret
    )
    out = []
    for i, s in enumerate(segments):
        p_fin = (state[:, i] & 63).astype(np.uint8)
        mps_fin = (state[:, i] >> 6).astype(np.uint8)
        out.append((bins[: s.n_bins, i].astype(np.uint8), p_fin, mps_fin))
    return out
