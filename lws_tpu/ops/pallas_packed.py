"""Sublane-packed Pallas LWS kernels: P utterances per program.

The unpacked kernels process one utterance per grid program, so a
frame-sequential update touches (1, F) rows - 1/8 of the VPU's sublanes. Here
the layout is transposed to (T, B, F) and each program owns a P-utterance
slab stored as (rows, P, F): every frame update is a full (P, F) tile and
every row index is a whole-tile offset on the leading (untiled) dimension -
no sublane alignment constraints - so the exact reference frame order
(micro=1) runs at P/8 of full vector width.

IO arrays live in HBM (memory_space ANY) and are moved with explicit DMA:
with (T, P, F) f32 slabs, pipelined VMEM input blocks would not fit the
16 MB budget, so each program DMAs its slab into scratch once, sweeps, and
DMAs the result back. P=4 keeps two planes + amplitudes within VMEM.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.stencil import Stencil, _parse_colors, freq_extend

__all__ = ["packed_lws_sweeps", "packed_rtisi_la", "packed_supported",
           "online_supported", "tiled_supported", "tiled_lws_sweeps",
           "segmented_lws_sweeps", "online_chunk", "online_chunk_init",
           "MAX_Q"]


def _cdiv(a, b):
    return -(-a // b)


# Largest overlap factor the register-window kernels accept. The sliding
# window holds 2Q-1 frame rows as live vector values and the frame body
# unrolls (2Q-1)x(2L+1) taps, so compile time and register pressure grow
# quadratically with Q; beyond this cap the processor falls back to the XLA
# path. Raisable (module constant) for exotic geometries.
MAX_Q = 16


def packed_supported(T: int, F: int, Q: int, L: int, pack: int = 4,
                     n_sets: int = 1, vmem_budget: int = 14 * 2 ** 20,
                     window_carry: str = "stack") -> bool:
    """Whether a fully-VMEM-resident packed kernel fits. `n_sets` is the
    number of stencil weight sets the kernel loads (1 for batch/no-future,
    2 + look_ahead for online RTISI-LA). `window_carry` must match the mode
    packed_lws_sweeps will run: direct mode stores frequency-pre-extended
    rows, so its two state planes are Spad = ceil((F+2L)/128)*128 lanes wide
    instead of Fpad (the amp plane stays Fpad)."""
    fp = _cdiv(F, 128) * 128
    sp = _cdiv(F + 2 * L, 128) * 128 if window_carry == "direct" else fp
    rows = T + 2 * Q + 8
    planes = rows * pack * (2 * sp + fp) * 4
    weights = 2 * n_sets * (2 * Q - 1) * (2 * L + 1) * fp * 4
    return planes + weights < vmem_budget


def fold_tile_saving(F: int, L: int, fold: int) -> float:
    """Fraction of padded 128-lane tiles a lane fold saves per vector op:
    1 - tiles(fold*(F+2L)-2L) / (fold * tiles(F)). The planner's "auto"
    mode only engages folds whose saving clears a measured profitability
    threshold (narrow F pays — 25% at F=257 fold 4; wide F does not —
    5.6% at F=1025 fold 2 measured as a net loss, PERF.md round-5)."""
    W = fold * (F + 2 * L) - 2 * L
    return 1.0 - _cdiv(W, 128) / (fold * _cdiv(F, 128))


def effective_fold(B: int, pack: int, fold) -> int:
    """Largest usable lane fold for this batch at this sublane pack: the
    tiled kernel folds whole batch groups into the lane axis, so the fold
    must divide the group count (1 = no folding)."""
    if not fold or int(fold) <= 1:
        return 1
    P = min(int(pack), max(8, _cdiv(B, 8) * 8))
    G = _cdiv(B, P)
    f = min(int(fold), G)
    while G % f:
        f -= 1
    return f


def _tiled_tile(F: int, Q: int, L: int, P: int, micro: int = 1,
                itemsize: int = 4, tap_chunks: int = 1,
                window_carry: str = "stack", lane_fold: int = 1):
    """VMEM time-tile sizing for the tiled kernel; None if the geometry does
    not fit (the SINGLE source of truth — tiled_supported and
    tiled_lws_sweeps both use it, so the gate can never pass a geometry the
    kernel refuses). `itemsize` is the state-storage element width: the
    scratch planes hold the evolving state in the storage dtype (bf16
    halves them), while weights and the register window stay float32.

    The model is calibrated against the compiler's own scoped-VMEM demand,
    read off "Scoped allocation with size X" OOM reports on-chip (see
    PERF.md): demand = tile*row + halo + stack, where row/halo are the
    streaming scratch planes (2 state + amp, in the storage dtype) and
    stack is Mosaic's spill for the live register window and the unrolled
    tap temporaries — measured at ~1.04x ntaps*P*fpad*4 bytes worst-case
    (Q=8, L=5, F=1025, P=16), budgeted at 1.1x. The staged weight tensors
    and window blocks do NOT land in the scoped stack (measured: Q=4
    F=2049's fixed cost equals the halo term alone). Budget 15.25 MiB of
    the 16 MiB scoped limit; below an 8-row tile, refuse (the processor
    then downshifts the pack or takes the XLA fallback)."""
    micro = max(1, int(micro))
    if lane_fold > 1:
        # folded interior width (see tiled_lws_sweeps' lane_fold): the
        # VMEM model below sees the folded lane geometry
        F = lane_fold * (F + 2 * L) - 2 * L
    fpad = _cdiv(F, 128) * 128
    epad = _cdiv(F + 2 * L, 128) * 128  # direct mode: pre-extended rows
    spad = epad if window_carry == "direct" else fpad
    # one time-row across the 3 state planes (2 state at spad + amp at fpad);
    # direct mode's measured slope runs ~1.2x this (extra live copies of the
    # wider rows in the same forced-OOM calibration as the stack term below)
    row = (2 * spad + fpad) * P * itemsize
    if window_carry == "direct":
        row = int(1.2 * row)
    halo_bytes = 4 * (Q - 1) * P * spad * itemsize  # window halos, 2 planes
    ntaps = (2 * Q - 1) * (2 * L + 1)
    # tap-chunked accumulation (_chunk_bounds) bounds the spill to one
    # chunk's width of live temporaries instead of the whole row; measured
    # on-chip the reduction is sublinear (Mosaic keeps some cross-chunk
    # values live): Q=8/F=1025/P=16 with 2 chunks demands 17.14M where the
    # 1.1x-of-one-chunk model predicts 7.4M of stack — calibrate chunked
    # spills at 1.45x of one chunk's taps
    chunk_fpad = _cdiv(_cdiv(F, 128), max(1, int(tap_chunks))) * 128
    factor = 1.1 if int(tap_chunks) <= 1 else 1.45
    if lane_fold > 1:
        # folded carried-window launches keep fold x (2L+1) halo slices
        # plus the wider rows live: measured on-chip overshoot vs the 1.1x
        # model is 16-24% (rows + full unroll, F=257 fold 2 and 4 — scoped
        # reports 16.80M/16.48M vs the 16M limit); budget 1.45x
        factor = max(factor, 1.45)
    stack_bytes = int(factor * ntaps * P * chunk_fpad * 4)
    if window_carry == "direct":
        # no carried window, but Mosaic still keeps tap temporaries live
        # across the frame body, SATURATING around ~110 of them (forced-OOM
        # scoped reports, on-chip): at Q=4/L=5/F=2049/P=16 the fixed stack
        # is ~1.00x the full ntaps*P*epad spill (all 77 taps live: demand
        # 16.14M at tile 12, 20.93M at tile 24 -> fixed ~= 11.3M), while at
        # Q=8/L=5/F=1025/P=16 it is only 0.57x of 165 taps (~94 live:
        # demand 16.02M at tile 24, 18.13M at tile 32 -> fixed ~= 7.6M).
        # Budget min(ntaps, 120) at 1.1x: reproduces both measurements with
        # margin (vocoder tile 15 vs 16 verified; F=2049 P=16 correctly
        # refused — tile 8 compiles but at 14.5M/16M, too snug to approve).
        stack_bytes = int(1.1 * min(ntaps, 120) * P * epad * 4)
    budget = 15 * 2 ** 20 + 2 ** 18 - halo_bytes - stack_bytes
    rows = budget // row
    if rows < 8:
        return None
    return min(max(micro, rows), 128)


def tiled_supported(F: int, Q: int, L: int, pack: int = 8, micro: int = 1,
                    B: int | None = None, itemsize: int = 4,
                    tap_chunks: int = 1, window_carry: str = "stack",
                    lane_fold: int = 1) -> bool:
    """Whether the time-tiled kernel can run this geometry at the given pack
    (pass the batch size B to account for the kernel's own pack clamp for
    underfilled batches, and the storage itemsize when using bf16 planes).
    Large Q at large F (e.g. Q=16 with F=2049) fails and must take the XLA
    fallback. `lane_fold` must be the EFFECTIVE fold (effective_fold)."""
    if Q > MAX_Q:
        return False
    P = int(pack) if B is None else min(int(pack), max(8, _cdiv(B, 8) * 8))
    return _tiled_tile(F, Q, L, P, micro, itemsize=itemsize,
                       tap_chunks=tap_chunks,
                       window_carry=window_carry,
                       lane_fold=lane_fold) is not None


def _shift_concat(parts, axis=0):
    """Concatenate window-shift parts, dropping zero-length ones: Mosaic's
    concatenate lowering rejects empty operands ("Invalid type: slice"
    on-chip only — interpret mode accepts them), and small window
    geometries (Q=2 sweep windows, look_ahead=0 amp windows) legitimately
    produce empty edge slices."""
    live = [p for p in parts if p.shape[axis]]
    return live[0] if len(live) == 1 else jnp.concatenate(live, axis=axis)


def _freq_halo(rows_r, rows_i, F, L, fold=1):
    """(..., F) -> (..., F+2L): conjugate-reflected margins via width-1
    static lane slices (Mosaic has no lane reverse).

    With `fold > 1` the row lane-folds `fold` independent spectra (see
    tiled_lws_sweeps' lane_fold): interior g occupies lanes
    [g*(Fi+2L), g*(Fi+2L)+Fi) of the F-wide input (F = fold*(Fi+2L)-2L,
    the 2L-lane straddles between interiors are dead) and the output is the
    concatenation of every group's own (Fi+2L)-wide extension — so the
    extended row's straddle lanes hold exactly the halos each group's edge
    taps must read, and groups can never contaminate each other."""
    Fi = (F + 2 * L) // fold - 2 * L
    parts_r, parts_i = [], []
    for g in range(fold):
        o = g * (Fi + 2 * L)
        gr = rows_r[..., o:o + Fi]
        gi = rows_i[..., o:o + Fi]
        left = [(gr[..., k:k + 1], -gi[..., k:k + 1]) for k in range(L, 0, -1)]
        right = [(gr[..., k:k + 1], -gi[..., k:k + 1])
                 for k in range(Fi - 2, Fi - 2 - L, -1)]
        parts_r += [p[0] for p in left] + [gr] + [p[0] for p in right]
        parts_i += [p[1] for p in left] + [gi] + [p[1] for p in right]
    if len(parts_r) == 1:
        return parts_r[0], parts_i[0]
    return (jnp.concatenate(parts_r, axis=-1),
            jnp.concatenate(parts_i, axis=-1))


def _dma(src, dst, sem):
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    cp.wait()


def _color_rounds(tr, ti, row_er, row_ei, amp_m, thr, scheme,
                  wr_at, wi_at, nz_c, F, L, extra_cond=None):
    """Red-black in-frame update (core/stencil.py update_frame's
    inner_scheme='colorKxR', kernel formulation): `tr/ti` hold the off-centre
    tap sums, `row_er/row_ei` the freq-extended current row (1, P, F+2L).
    Each color pass recomputes the dr=0 taps from the evolving row so later
    colors read already-updated neighbour bins. Returns the updated interior
    row and its extension."""
    k, rounds = _parse_colors(scheme)
    parity = jax.lax.broadcasted_iota(jnp.int32, (1, 1, F), 2) % k
    cur_r = row_er[..., L:L + F]
    cur_i = row_ei[..., L:L + F]
    er, ei = row_er, row_ei
    for _ in range(rounds):
        for color in range(k):
            cr = jnp.zeros_like(tr)
            ci = jnp.zeros_like(tr)
            for dk in range(2 * L + 1):
                if not nz_c[dk]:
                    continue
                wr, wi = wr_at(dk), wi_at(dk)
                br, bi = er[..., dk:dk + F], ei[..., dk:dk + F]
                cr += wr * br - wi * bi
                ci += wr * bi + wi * br
            fr, fi = tr + cr, ti + ci
            a2 = fr * fr + fi * fi
            scale = amp_m * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
            cond = (amp_m > thr) & (a2 > 0) & (parity == color)
            if extra_cond is not None:
                cond = cond & extra_cond
            cur_r = jnp.where(cond, fr * scale, cur_r)
            cur_i = jnp.where(cond, fi * scale, cur_i)
            er, ei = _freq_halo(cur_r, cur_i, F, L)
    return cur_r, cur_i, er, ei


def _lane_chunks(F):
    """Frequency-chunk boundaries for the lane-granular threshold skip:
    128-lane chunks (the VPU register tile), with a short tail (< 64 lanes)
    merged into its neighbour so no chunk wastes a near-empty register."""
    n = _cdiv(F, 128)
    bounds = [i * 128 for i in range(n)] + [F]
    if n >= 2 and bounds[-1] - bounds[-2] < 64:
        del bounds[-2]
    return list(zip(bounds[:-1], bounds[1:]))


def _chunk_bounds(F, n):
    """Split F lanes into n contiguous 128-lane-tile-aligned chunks (the
    tap-accumulation chunking: computing the stencil update one chunk at a
    time divides the live vector temporaries Mosaic must hold — and hence
    its scoped-VMEM stack spill — by ~n, letting wide sublane packs fit
    geometries the whole-row update cannot; arithmetic per lane is
    identical, so outputs are bit-equal)."""
    tiles = _cdiv(F, 128)
    n = max(1, min(int(n), tiles))
    out, start = [], 0
    for i in range(n):
        end = min(F, ((tiles * (i + 1)) // n) * 128)
        out.append((start, end))
        start = end
    return out


def _window_sweep(xr, xi, am, wr_ref, wi_ref, nz, thr, *, Q, L, F, P, T_loop,
                  nxt_cap, inner_scheme, has_centre, valid_fn=None,
                  carry="stack", frame_unroll=1, lane_skip=False,
                  tap_chunks=1, inner_passes=1, fold=1):
    """micro=1 fast path shared by the packed and tiled sweep kernels: a
    sliding register window of the 2Q-1 freq-extended frame rows around the
    update point — one row read + one row write-back per frame instead of
    reloading the whole patch (exact reference frame-GS order,
    lwslib.cpp batch sweep structure).

    `carry` selects the loop-carried representation of the window:
      - "stack": two stacked (2Q-1, P, F+2L) arrays, shifted with a
        concatenate every frame (the round-1 formulation).
      - "rows": two tuples of (1, P, F+2L) rows; the shift is tuple
        re-binding — pure SSA renaming with no data movement in the IR.
        Combined with frame_unroll=2Q-1 the slot assignment is static
        across each unrolled body, so Mosaic never has to copy the window.
      - "direct": NO carried window at all — the scratch slabs hold
        frequency-PRE-EXTENDED rows (lanes [0, F+2L): conjugate-reflected
        halo | interior | halo) and every tap reads its row straight from
        scratch at a dynamic leading-dim offset. No per-frame shift, no
        halo rebuild of shifted-in rows, and no 2Q-1-row live window for
        Mosaic to spill: the scoped stack stays O(one row) at any Q, so
        wide sublane packs fit geometries the carried modes cannot.
        Requires the caller to build extended slabs (see packed/tiled
        wrappers) and is mutually exclusive with lane_skip/tap_chunks
        (there is nothing left to chunk).
    All modes are bit-identical by construction in float32 storage (same
    arithmetic in the same order; "direct" re-reads rows it just wrote,
    which only differs when storage rounds, i.e. bf16).
    """
    Q1 = Q - 1
    cdt = jnp.promote_types(xr.dtype, jnp.float32)
    use_colors_d = inner_scheme != "jacobi" and has_centre
    if fold > 1 and (use_colors_d or lane_skip or tap_chunks > 1):
        # color parity and the chunked paths index lanes in unfolded
        # bin coordinates; lane folding supports only the plain jacobi
        # update (the production default — callers gate on this)
        raise ValueError("lane folding requires inner_scheme='jacobi' "
                         "without lane_skip/tap_chunks")
    # in-frame jacobi re-passes (core/stencil.py update_frame's
    # inner_passes): centre-row taps recomputed against the evolving row
    multi_pass = inner_passes > 1 and has_centre and not use_colors_d

    def passes_update(tr, ti, cen_r, cen_i, amp_m, valid):
        """Multi-pass centre update: each pass recomputes the same-frame
        taps from the previous pass's updated row; the select fallback stays
        the original row (update_frame jacobi semantics)."""
        old_r = cen_r[..., L:L + F]
        old_i = cen_i[..., L:L + F]
        cr_rows, ci_rows = cen_r, cen_i
        new_r = old_r
        new_i = old_i
        for _pass in range(inner_passes):
            # centre taps summed separately, then added to the off-centre
            # total — the exact float order of update_frame's centre_taps
            # (core/stencil.py), so kernel and XLA paths stay bit-equal
            cr = jnp.zeros_like(tr)
            ci = jnp.zeros_like(tr)
            for dk in range(2 * L + 1):
                if not nz[Q1, dk]:
                    continue
                wr = wr_ref[Q1, dk, :]
                wi = wi_ref[Q1, dk, :]
                cr = cr + (wr * cr_rows[..., dk:dk + F] - wi * ci_rows[..., dk:dk + F])
                ci = ci + (wr * ci_rows[..., dk:dk + F] + wi * cr_rows[..., dk:dk + F])
            fr, fi = tr + cr, ti + ci
            a2 = fr * fr + fi * fi
            scale = amp_m * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
            cond = (amp_m > thr) & (a2 > 0)
            if valid is not None:
                cond = cond & valid
            new_r = jnp.where(cond, fr * scale, old_r)
            new_i = jnp.where(cond, fi * scale, old_i)
            if _pass + 1 < inner_passes:
                cr_rows, ci_rows = _freq_halo(new_r, new_i, F, L, fold)
        return new_r, new_i

    if carry == "direct":
        if lane_skip:
            raise ValueError("lane_skip is not supported with carry='direct'")
        if tap_chunks > 1:
            # direct mode has no carried window to spill, so there is
            # nothing for the chunking to bound — reject rather than
            # silently ignore the knob
            raise ValueError("tap_chunks > 1 is not supported with carry='direct'")
        E = F + 2 * L

        def frame_body_d(m, carry_d):
            tr = jnp.zeros((1, P, F), dtype=cdt)
            ti = jnp.zeros_like(tr)
            cen_r = cen_i = None
            for dr in range(2 * Q - 1):
                centre = dr == Q1
                if not centre and not nz[dr].any():
                    continue
                rr = xr[pl.ds(m + dr, 1)][..., :E].astype(cdt)
                ri = xi[pl.ds(m + dr, 1)][..., :E].astype(cdt)
                if centre:
                    cen_r, cen_i = rr, ri
                    if use_colors_d or multi_pass:
                        continue
                for dk in range(2 * L + 1):
                    if not nz[dr, dk]:
                        continue
                    wr = wr_ref[dr, dk, :]
                    wi = wi_ref[dr, dk, :]
                    br = rr[..., dk:dk + F]
                    bi = ri[..., dk:dk + F]
                    tr += wr * br - wi * bi
                    ti += wr * bi + wi * br
            if cen_r is None:  # centre row never touched by taps: still need
                cen_r = xr[pl.ds(m + Q1, 1)][..., :E].astype(cdt)
                cen_i = xi[pl.ds(m + Q1, 1)][..., :E].astype(cdt)
            amp_m = am[pl.ds(m, 1)][..., :F].astype(cdt)
            valid = None if valid_fn is None else valid_fn(m)
            if use_colors_d:
                _, _, er, ei = _color_rounds(
                    tr, ti, cen_r, cen_i, amp_m, thr, inner_scheme,
                    lambda dk: wr_ref[Q1, dk, :],
                    lambda dk: wi_ref[Q1, dk, :],
                    nz[Q1], F, L, extra_cond=valid)
            elif multi_pass:
                new_r, new_i = passes_update(tr, ti, cen_r, cen_i, amp_m,
                                             valid)
                er, ei = _freq_halo(new_r, new_i, F, L, fold)
            else:
                a2 = tr * tr + ti * ti
                scale = amp_m * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
                cond = (amp_m > thr) & (a2 > 0)
                if valid is not None:
                    cond = cond & valid
                new_r = jnp.where(cond, tr * scale, cen_r[..., L:L + F])
                new_i = jnp.where(cond, ti * scale, cen_i[..., L:L + F])
                er, ei = _freq_halo(new_r, new_i, F, L, fold)
            xr[pl.ds(Q1 + m, 1), :, :E] = er.astype(xr.dtype)
            xi[pl.ds(Q1 + m, 1), :, :E] = ei.astype(xi.dtype)
            return carry_d

        unroll_d = True if (frame_unroll < 0 or frame_unroll > 1) else False
        jax.lax.fori_loop(0, T_loop, frame_body_d, 0, unroll=unroll_d)
        return

    def halo1(j):
        rr = xr[pl.ds(j, 1)][..., :F].astype(cdt)
        ri = xi[pl.ds(j, 1)][..., :F].astype(cdt)
        return _freq_halo(rr, ri, F, L, fold)

    rows0 = [halo1(j) for j in range(2 * Q1 + 1)]
    use_colors = inner_scheme != "jacobi" and has_centre

    if carry == "rows":
        init = (tuple(r for r, _ in rows0), tuple(i for _, i in rows0))
        row = lambda w, dr: w[dr]  # noqa: E731
        shift = lambda w, upd, new: w[1:Q1] + (upd,) + w[Q1 + 1:] + (new,)  # noqa: E731
    else:
        init = (jnp.concatenate([r for r, _ in rows0], axis=0),
                jnp.concatenate([i for _, i in rows0], axis=0))
        row = lambda w, dr: w[dr:dr + 1]  # noqa: E731
        # Q=2 makes w[1:Q1] an EMPTY slice (see _shift_concat)
        shift = lambda w, upd, new: _shift_concat(  # noqa: E731
            (w[1:Q1], upd, w[Q1 + 1:], new))

    # lane-granular threshold skip (the reference's per-bin sparsity skip,
    # lwslib.cpp:84-85, at VPU register-tile granularity): amp is constant
    # across sweeps, so a frequency chunk none of whose bins exceeds this
    # sweep's threshold keeps its old values EXACTLY — its ~(2Q-1)(2L+1)
    # taps are skipped behind a scalar branch. Chunk arithmetic is
    # elementwise-identical to the full-row path (bit-equal output). Only
    # the plain (non-color) update is chunked; color rounds keep full rows.
    # `tap_chunks` reuses the same chunked arithmetic WITHOUT the skip
    # branch, purely to bound Mosaic's live-temporary spill (_chunk_bounds).
    chunks = use_cond = None
    if not use_colors and not multi_pass:
        if lane_skip:
            chunks, use_cond = _lane_chunks(F), True
        elif tap_chunks > 1:
            chunks, use_cond = _chunk_bounds(F, tap_chunks), False

    def frame_body(m, c):
        win_r, win_i = c
        if chunks is not None:
            amp_m = am[pl.ds(m, 1)][..., :F].astype(cdt)
            valid = None if valid_fn is None else valid_fn(m)
            cen_r, cen_i = row(win_r, Q1), row(win_i, Q1)
            parts_r, parts_i = [], []
            for f0, f1 in chunks:
                fw = f1 - f0
                a_c = amp_m[..., f0:f1]
                old_r = cen_r[..., L + f0:L + f1]
                old_i = cen_i[..., L + f0:L + f1]
                if use_cond:
                    live = jnp.any(a_c > thr)
                    if valid is not None:
                        live = jnp.logical_and(live, valid)

                def update(f0=f0, f1=f1, fw=fw, a_c=a_c, old_r=old_r,
                           old_i=old_i):
                    tr = jnp.zeros((1, P, fw), dtype=cdt)
                    ti = jnp.zeros_like(tr)
                    for dr in range(2 * Q - 1):
                        rr, ri = row(win_r, dr), row(win_i, dr)
                        for dk in range(2 * L + 1):
                            if not nz[dr, dk]:
                                continue
                            wr = wr_ref[dr, dk, f0:f1]
                            wi = wi_ref[dr, dk, f0:f1]
                            br = rr[..., dk + f0:dk + f0 + fw]
                            bi = ri[..., dk + f0:dk + f0 + fw]
                            tr += wr * br - wi * bi
                            ti += wr * bi + wi * br
                    a2 = tr * tr + ti * ti
                    scale = a_c * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
                    cond = (a_c > thr) & (a2 > 0)
                    if not use_cond and valid is not None:
                        cond = cond & valid
                    return (jnp.where(cond, tr * scale, old_r),
                            jnp.where(cond, ti * scale, old_i))

                if use_cond:
                    nr, ni = jax.lax.cond(
                        live, update,
                        lambda old_r=old_r, old_i=old_i: (old_r, old_i))
                else:
                    nr, ni = update()
                parts_r.append(nr)
                parts_i.append(ni)
            new_r = jnp.concatenate(parts_r, axis=-1)
            new_i = jnp.concatenate(parts_i, axis=-1)
            er, ei = _freq_halo(new_r, new_i, F, L, fold)
            xr[pl.ds(Q1 + m, 1), :, :F] = new_r.astype(xr.dtype)
            xi[pl.ds(Q1 + m, 1), :, :F] = new_i.astype(xi.dtype)
            nxt = jnp.minimum(m + 2 * Q1 + 1, nxt_cap)
            fr, fi = _freq_halo(xr[pl.ds(nxt, 1)][..., :F].astype(cdt),
                                xi[pl.ds(nxt, 1)][..., :F].astype(cdt), F, L, fold)
            return shift(win_r, er, fr), shift(win_i, ei, fi)
        tr = jnp.zeros((1, P, F), dtype=cdt)
        ti = jnp.zeros_like(tr)
        for dr in range(2 * Q - 1):
            if (use_colors or multi_pass) and dr == Q1:
                continue  # centre taps handled by the color/passes rounds
            rr = ri = None
            for dk in range(2 * L + 1):
                if not nz[dr, dk]:
                    continue
                if rr is None:
                    rr, ri = row(win_r, dr), row(win_i, dr)
                wr = wr_ref[dr, dk, :]
                wi = wi_ref[dr, dk, :]
                br = rr[..., dk:dk + F]
                bi = ri[..., dk:dk + F]
                tr += wr * br - wi * bi
                ti += wr * bi + wi * br
        amp_m = am[pl.ds(m, 1)][..., :F].astype(cdt)
        valid = None if valid_fn is None else valid_fn(m)
        cen_r, cen_i = row(win_r, Q1), row(win_i, Q1)
        if use_colors:
            new_r, new_i, er, ei = _color_rounds(
                tr, ti, cen_r, cen_i, amp_m, thr, inner_scheme,
                lambda dk: wr_ref[Q1, dk, :], lambda dk: wi_ref[Q1, dk, :],
                nz[Q1], F, L, extra_cond=valid)
        elif multi_pass:
            new_r, new_i = passes_update(tr, ti, cen_r, cen_i, amp_m, valid)
            er, ei = _freq_halo(new_r, new_i, F, L, fold)
        else:
            a2 = tr * tr + ti * ti
            scale = amp_m * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
            cond = (amp_m > thr) & (a2 > 0)
            if valid is not None:
                cond = cond & valid
            old_r = cen_r[..., L:L + F]
            old_i = cen_i[..., L:L + F]
            new_r = jnp.where(cond, tr * scale, old_r)
            new_i = jnp.where(cond, ti * scale, old_i)
            er, ei = _freq_halo(new_r, new_i, F, L, fold)
        xr[pl.ds(Q1 + m, 1), :, :F] = new_r.astype(xr.dtype)  # write-back
        xi[pl.ds(Q1 + m, 1), :, :F] = new_i.astype(xi.dtype)
        # shift: drop the oldest row, re-centre, pull in frame m+Q (old)
        nxt = jnp.minimum(m + 2 * Q1 + 1, nxt_cap)
        fr, fi = _freq_halo(xr[pl.ds(nxt, 1)][..., :F].astype(cdt),
                            xi[pl.ds(nxt, 1)][..., :F].astype(cdt), F, L, fold)
        return shift(win_r, er, fr), shift(win_i, ei, fi)

    # frame_unroll folds the per-frame window shift into register renaming
    # across the unrolled bodies. Mosaic only lowers unroll=1 or a FULL
    # unroll (unroll == trip count), so -1 requests the full unroll and any
    # k > 1 is clamped to it rather than failing in the backend.
    unroll = True if (frame_unroll < 0 or frame_unroll > 1) else False
    jax.lax.fori_loop(0, T_loop, frame_body, init, unroll=unroll)


# ---------------------------------------------------------------------------
# batch / no-future sweeps
# ---------------------------------------------------------------------------

def _sweeps_kernel(thr_ref, mean_ref, sr_hbm, si_hbm, amp_hbm, wr_ref, wi_ref,
                   osr_hbm, osi_hbm, xr, xi, am, sem, *, T, F, Q, L, iters,
                   micro, nz, inner_passes, inner_scheme, P, frame_unroll=1,
                   window_carry="stack", lane_skip=False, tap_chunks=1):
    # scratch/slab lane width is padded to a 128 multiple (DMA requires
    # tile-aligned transfers); compute slices values down to F lanes
    """One program = P utterances. Scratch layout (rows, P, F); frame t at
    row Q-1+t."""
    Q1 = Q - 1
    n_groups = _cdiv(T, micro)
    g = pl.program_id(0)

    _dma(sr_hbm.at[g], xr.at[Q1:Q1 + T], sem)
    _dma(si_hbm.at[g], xi.at[Q1:Q1 + T], sem)
    _dma(amp_hbm.at[g], am.at[:], sem)
    for j in range(Q1):
        xr[j] = xr[Q1]
        xi[j] = xi[Q1]
        xr[Q1 + T + j] = xr[Q1 + T - 1]
        xi[Q1 + T + j] = xi[Q1 + T - 1]

    mean_amp = mean_ref[0]  # (P, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (micro, 1, 1), 0)
    has_centre = bool(nz[Q1].any())

    cdt = jnp.promote_types(xr.dtype, jnp.float32)  # bf16 storage computes in f32

    def window_iter(it, _):
        _window_sweep(xr, xi, am, wr_ref, wi_ref, nz, thr_ref[it] * mean_amp,
                      Q=Q, L=L, F=F, P=P, T_loop=T, nxt_cap=T + 2 * Q1 - 1,
                      inner_scheme=inner_scheme, has_centre=has_centre,
                      carry=window_carry, frame_unroll=frame_unroll,
                      lane_skip=lane_skip, tap_chunks=tap_chunks,
                      inner_passes=inner_passes)
        return _

    def group_update(it, grp, _):
        thr = thr_ref[it] * mean_amp  # (P, 1)
        start = grp * micro
        # accumulate in f32 regardless of (possibly bf16) storage dtype,
        # mirroring the micro=1 window path
        pr = xr[pl.ds(start, micro + 2 * Q1)][..., :F].astype(cdt)
        pi = xi[pl.ds(start, micro + 2 * Q1)][..., :F].astype(cdt)
        er, ei = _freq_halo(pr, pi, F, L)

        tr = jnp.zeros((micro, P, F), dtype=pr.dtype)
        ti = jnp.zeros_like(tr)
        for dr in range(2 * Q - 1):
            if dr == Q1:
                continue
            for dk in range(2 * L + 1):
                if not nz[dr, dk]:
                    continue
                wr = wr_ref[dr, dk, :]
                wi = wi_ref[dr, dk, :]
                br = er[dr:dr + micro, :, dk:dk + F]
                bi = ei[dr:dr + micro, :, dk:dk + F]
                tr += wr * br - wi * bi
                ti += wr * bi + wi * br

        amp_g = am[pl.ds(start, micro)][..., :F].astype(cdt)
        old_r = er[Q1:Q1 + micro, :, L:L + F]
        old_i = ei[Q1:Q1 + micro, :, L:L + F]
        valid = (start + row_ids) < T

        cr_rows = er[Q1:Q1 + micro]
        ci_rows = ei[Q1:Q1 + micro]
        new_r, new_i = old_r, old_i
        for _pass in range(inner_passes if has_centre else 1):
            fr, fi = tr, ti
            if has_centre:
                for dk in range(2 * L + 1):
                    if not nz[Q1, dk]:
                        continue
                    wr = wr_ref[Q1, dk, :]
                    wi = wi_ref[Q1, dk, :]
                    fr = fr + (wr * cr_rows[..., dk:dk + F] - wi * ci_rows[..., dk:dk + F])
                    fi = fi + (wr * ci_rows[..., dk:dk + F] + wi * cr_rows[..., dk:dk + F])
            a2 = fr * fr + fi * fi
            scale = amp_g * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
            cond = (amp_g > thr) & (a2 > 0) & valid
            new_r = jnp.where(cond, fr * scale, old_r)
            new_i = jnp.where(cond, fi * scale, old_i)
            if has_centre and _pass + 1 < inner_passes:
                cr_rows, ci_rows = _freq_halo(new_r, new_i, F, L)

        xr[pl.ds(Q1 + start, micro), :, :F] = new_r.astype(xr.dtype)
        xi[pl.ds(Q1 + start, micro), :, :F] = new_i.astype(xi.dtype)
        return _

    def one_iter(it, _):
        if micro == 1:
            return window_iter(it, _)
        return jax.lax.fori_loop(
            0, n_groups, lambda b, c: group_update(it, b, c), _, unroll=False)

    jax.lax.fori_loop(0, iters, one_iter, 0, unroll=False)

    _dma(xr.at[Q1:Q1 + T], osr_hbm.at[g], sem)
    _dma(xi.at[Q1:Q1 + T], osi_hbm.at[g], sem)


def packed_lws_sweeps(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st: Stencil,
    thresholds: jnp.ndarray,
    micro: int = 1,
    pack: int = 4,
    inner_passes: int = 1,
    inner_scheme: str = "jacobi",
    storage=None,
    interpret: bool = False,
    frame_unroll: int = 1,
    window_carry: str = "stack",
    lane_skip: bool = False,
    tap_chunks: int = 1,
):
    """Batch/no-future sweeps, P utterances per program. (B, T, F) planes.

    `storage=jnp.bfloat16` keeps the evolving planes in bf16 (f32 compute),
    halving VMEM so pack=8 fits - ~2x throughput at slightly reduced
    numerical fidelity (phase states round-trip through bf16 every write)."""
    if thresholds.shape[0] == 0:
        return sr, si
    squeeze = sr.ndim == 2
    if squeeze:
        sr, si = sr[None], si[None]
    B, T, F = sr.shape
    Q, L = st.Q, st.L
    if Q > MAX_Q:
        raise ValueError(f"packed kernel supports Q <= {MAX_Q}, got Q={Q}")
    iters = int(thresholds.shape[0])
    micro = max(1, int(micro))
    P = int(pack)

    direct = window_carry == "direct"
    if direct and micro > 1:
        raise ValueError("window_carry='direct' requires micro=1")
    amp = jnp.sqrt(sr * sr + si * si)
    mean_amp = jnp.mean(amp, axis=(-2, -1))  # (B,)

    b_pad = (-B) % P
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        sr, si, amp = jnp.pad(sr, pad3), jnp.pad(si, pad3), jnp.pad(amp, pad3)
        mean_amp = jnp.pad(mean_amp, (0, b_pad))
    G = (B + b_pad) // P
    n_groups = _cdiv(T, micro)
    t_pad = n_groups * micro - T
    if t_pad:
        amp = jnp.pad(amp, ((0, 0), (0, t_pad), (0, 0)))

    # (G, T, P, Fpad) layout: each program DMAs its whole slab via at[g];
    # lane width padded to the 128 tile so DMA needs no lane slicing.
    # direct mode stores rows frequency-PRE-EXTENDED (F+2L lanes, Spad wide)
    # so the kernel reads taps straight from scratch (see _window_sweep).
    Fpad = _cdiv(F, 128) * 128
    Spad = _cdiv(F + 2 * L, 128) * 128 if direct else Fpad

    sdt = storage or sr.dtype

    def to_slabs(a, width=Fpad):
        a = jnp.moveaxis(a.reshape(G, P, a.shape[1], a.shape[-1]), 1, 2)
        pad = width - a.shape[-1]
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad))).astype(sdt)

    if direct:
        sr_e, si_e = freq_extend(sr, si, L)
        sr_t, si_t = to_slabs(sr_e, Spad), to_slabs(si_e, Spad)
    else:
        sr_t, si_t = to_slabs(sr), to_slabs(si)
    amp_t = to_slabs(amp)
    mean_t = mean_amp.reshape(G, P, 1)

    wdt = jnp.promote_types(sr.dtype, jnp.float32)
    kern = functools.partial(
        _sweeps_kernel, T=T, F=F, Q=Q, L=L, iters=iters, micro=micro,
        nz=st.nz, inner_passes=int(inner_passes), inner_scheme=inner_scheme,
        P=P, frame_unroll=int(frame_unroll), window_carry=window_carry,
        lane_skip=bool(lane_skip), tap_chunks=int(tap_chunks))

    rows = (Q - 1) + n_groups * micro + (Q - 1) + micro  # + read slack
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec((2 * Q - 1, 2 * L + 1, F), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    osr, osi = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thresholds
            pl.BlockSpec((1, P, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            hbm, hbm, hbm, wspec, wspec,
        ],
        out_specs=(hbm, hbm),
        out_shape=(jax.ShapeDtypeStruct((G, T, P, Spad), sdt),
                   jax.ShapeDtypeStruct((G, T, P, Spad), sdt)),
        scratch_shapes=[
            pltpu.VMEM((rows, P, Spad), sdt),
            pltpu.VMEM((rows, P, Spad), sdt),
            pltpu.VMEM((n_groups * micro, P, Fpad), sdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(thresholds.astype(sr.dtype), mean_t, sr_t, si_t, amp_t,
      st.Wr[:, :, :F].astype(wdt), st.Wi[:, :, :F].astype(wdt))

    off = L if direct else 0

    def from_slabs(a):  # (G, T, P, Spad) -> (B, T, F)
        a = a.astype(sr.dtype)
        return jnp.moveaxis(a[..., off:off + F], 2, 1).reshape(G * P, T, F)[:B]

    osr, osi = from_slabs(osr), from_slabs(osi)
    if squeeze:
        osr, osi = osr[0], osi[0]
    return osr, osi


# ---------------------------------------------------------------------------
# online RTISI-LA
# ---------------------------------------------------------------------------

def online_supported(F: int, Q: int, L: int, LA: int, pack: int = 8,
                     vmem_budget: int = 14 * 2 ** 20) -> bool:
    """Whether the streaming online kernel's VMEM-resident parts fit: the
    2+LA stencil weight sets dominate; the sliding state window is
    O((LA+Q)*pack) rows regardless of T."""
    fp = _cdiv(F, 128) * 128
    weights = 2 * (2 + LA) * (2 * Q - 1) * (2 * L + 1) * fp * 4
    rows = (LA + 2 * Q - 1) + (LA + 1) + 6  # window + amp window + buffers
    window = 3 * rows * pack * (fp + 2 * L) * 4
    return weights + window < vmem_budget


def _online_row_update_fns(wr_ref, wi_ref, nzs, Q, L, F, P, inner_scheme,
                           lane_skip=False):
    """Shared machinery of the streaming online kernels: `set_row` replaces
    one static row of a carried (rows, P, F+2L) window; `row_update` applies
    one visibility-masked stencil update (weight set `w_set`) to window row
    `idx`, re-extending the frequency halo in place. `lane_skip` chunks the
    plain (non-color) update by VPU lane tiles and skips chunks whose bins
    are all below the threshold (bit-identical; see _window_sweep)."""
    def set_row(arr, row, idx):
        parts = []
        if idx > 0:
            parts.append(arr[:idx])
        parts.append(row)
        if idx + 1 < arr.shape[0]:
            parts.append(arr[idx + 1:])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else row

    def row_update(win_r, win_i, idx, w_set, thr, amp_row):
        nz = nzs[w_set]
        use_colors = inner_scheme != "jacobi" and bool(nz[Q - 1].any())
        if lane_skip and not use_colors:
            parts_r, parts_i = [], []
            for f0, f1 in _lane_chunks(F):
                fw = f1 - f0
                a_c = amp_row[..., f0:f1]
                old_r = win_r[idx:idx + 1, :, L + f0:L + f1]
                old_i = win_i[idx:idx + 1, :, L + f0:L + f1]
                live = jnp.any(a_c > thr)

                def update(f0=f0, fw=fw, a_c=a_c, old_r=old_r, old_i=old_i):
                    tr = jnp.zeros((1, P, fw), dtype=win_r.dtype)
                    ti = jnp.zeros_like(tr)
                    for dr in range(2 * Q - 1):
                        for dk in range(2 * L + 1):
                            if not nz[dr, dk]:
                                continue
                            wr = wr_ref[w_set, dr, dk, f0:f1]
                            wi = wi_ref[w_set, dr, dk, f0:f1]
                            r = idx - (Q - 1) + dr
                            br = win_r[r:r + 1, :, dk + f0:dk + f0 + fw]
                            bi = win_i[r:r + 1, :, dk + f0:dk + f0 + fw]
                            tr += wr * br - wi * bi
                            ti += wr * bi + wi * br
                    a2 = tr * tr + ti * ti
                    scale = a_c * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
                    cond = (a_c > thr) & (a2 > 0)
                    return (jnp.where(cond, tr * scale, old_r),
                            jnp.where(cond, ti * scale, old_i))

                nr, ni = jax.lax.cond(
                    live, update,
                    lambda old_r=old_r, old_i=old_i: (old_r, old_i))
                parts_r.append(nr)
                parts_i.append(ni)
            er, ei = _freq_halo(jnp.concatenate(parts_r, axis=-1),
                                jnp.concatenate(parts_i, axis=-1), F, L)
            return set_row(win_r, er, idx), set_row(win_i, ei, idx)
        tr = jnp.zeros((1, P, F), dtype=win_r.dtype)
        ti = jnp.zeros_like(tr)
        for dr in range(2 * Q - 1):
            if use_colors and dr == Q - 1:
                continue  # centre taps handled by the color rounds
            for dk in range(2 * L + 1):
                if not nz[dr, dk]:
                    continue
                wr = wr_ref[w_set, dr, dk, :]
                wi = wi_ref[w_set, dr, dk, :]
                r = idx - (Q - 1) + dr
                br = win_r[r:r + 1, :, dk:dk + F]
                bi = win_i[r:r + 1, :, dk:dk + F]
                tr += wr * br - wi * bi
                ti += wr * bi + wi * br
        if use_colors:
            _, _, er, ei = _color_rounds(
                tr, ti, win_r[idx:idx + 1], win_i[idx:idx + 1], amp_row, thr,
                inner_scheme, lambda dk: wr_ref[w_set, Q - 1, dk, :],
                lambda dk: wi_ref[w_set, Q - 1, dk, :], nz[Q - 1], F, L)
        else:
            a2 = tr * tr + ti * ti
            scale = amp_row * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
            cond = (amp_row > thr) & (a2 > 0)
            old_r = win_r[idx:idx + 1, :, L:L + F]
            old_i = win_i[idx:idx + 1, :, L:L + F]
            new_r = jnp.where(cond, tr * scale, old_r)
            new_i = jnp.where(cond, ti * scale, old_i)
            er, ei = _freq_halo(new_r, new_i, F, L)
        return set_row(win_r, er, idx), set_row(win_i, ei, idx)

    return set_row, row_update


def _online_kernel(thr_ref, mean_ref, sr_hbm, si_hbm, wr_ref, wi_ref,
                   osr_hbm, osi_hbm, row_r, row_i, stage_r, stage_i, sem,
                   *, T, F, Q, L, LA, iters, nzs, inner_scheme, P,
                   lane_skip=False):
    """One program = P utterances, streaming over frames: per step one input
    row is DMA'd from HBM, the amplitude is computed in-kernel into a carried
    (LA+1)-row window, the evolving phase state lives in a sliding register
    window, and the committed row streams straight back to HBM (the output
    slab aliases the input). VMEM use is independent of T, so any
    spectrogram length runs (the reference TF_RTISI_LA, lwslib.cpp:1424-1492,
    likewise works at any size)."""
    W = LA + Q
    WR = W + Q - 1
    g = pl.program_id(0)
    mean_amp = mean_ref[0]  # (P, 1)
    cdt = jnp.promote_types(row_r.dtype, jnp.float32)
    big = jnp.asarray(3.4e38, cdt)

    def load_row(mc):
        _dma(sr_hbm.at[g, pl.ds(mc, 1)], row_r.at[:], sem)
        _dma(si_hbm.at[g, pl.ds(mc, 1)], row_i.at[:], sem)
        return (row_r[:][..., :F].astype(cdt), row_i[:][..., :F].astype(cdt))

    _, row_update = _online_row_update_fns(
        wr_ref, wi_ref, nzs, Q, L, F, P, inner_scheme, lane_skip=lane_skip)

    newest = W - 1

    def frame_step(m, carry):
        win_r, win_i, ampw = carry
        live = m < T
        mc = jnp.minimum(m, T - 1)
        rr, ri = load_row(mc)
        # drain steps (m >= T) shift in a dead row: amp 0 + thr big disable
        # every update, so only the commit pipeline advances
        amp_new = jnp.where(live, jnp.sqrt(rr * rr + ri * ri), 0.0)
        ampw = _shift_concat((ampw[1:], amp_new))
        fr_, fi_ = _freq_halo(rr, ri, F, L)
        win_r = _shift_concat((win_r[1:W], fr_, win_r[W:]))
        win_i = _shift_concat((win_i[1:W], fi_, win_i[W:]))

        amp_m = ampw[LA:LA + 1]
        thr0 = jnp.where(live, jnp.zeros((), cdt), big)
        win_r, win_i = row_update(win_r, win_i, newest, 0, thr0, amp_m)

        def h_body(h, wcar):
            wr_, wi_ = wcar
            thr = jnp.where(live, thr_ref[h] * mean_amp, big)
            for d in range(LA, 0, -1):
                # rows before the stream start are zeros from the window init,
                # matching the m-d < 0 masking of the offline scan
                wr_, wi_ = row_update(wr_, wi_, newest - d, 2 + (d - 1), thr,
                                      ampw[LA - d:LA - d + 1])
            return row_update(wr_, wi_, newest, 1, thr, amp_m)

        win_r, win_i = jax.lax.fori_loop(0, iters, h_body, (win_r, win_i))

        # frame m-LA is final: stage the row and DMA it straight to HBM
        c = m - LA
        cc = jnp.clip(c, 0, T - 1)
        @pl.when(jnp.logical_and(c >= 0, c < T))
        def _():
            stage_r[:, :, :F] = win_r[newest - LA:newest - LA + 1, :, L:L + F].astype(stage_r.dtype)
            stage_i[:, :, :F] = win_i[newest - LA:newest - LA + 1, :, L:L + F].astype(stage_i.dtype)
            _dma(stage_r.at[:], osr_hbm.at[g, pl.ds(cc, 1)], sem)
            _dma(stage_i.at[:], osi_hbm.at[g, pl.ds(cc, 1)], sem)
        return win_r, win_i, ampw

    f0r, f0i = load_row(0)
    e0r, e0i = _freq_halo(f0r, f0i, F, L)
    win_r0 = jnp.tile(e0r, (WR, 1, 1))
    win_i0 = jnp.tile(e0i, (WR, 1, 1))
    ampw0 = jnp.zeros((LA + 1, P, F), cdt)
    jax.lax.fori_loop(0, T + LA, frame_step, (win_r0, win_i0, ampw0),
                      unroll=False)


def packed_rtisi_la(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st_la: list[Stencil],
    st_ai: Stencil,
    st_af: Stencil,
    thresholds: jnp.ndarray,
    pack: int = 8,
    inner_scheme: str = "jacobi",
    interpret: bool = False,
    lane_skip: bool = False,
):
    """Online RTISI-LA, P utterances per program, any T*F (state streams
    through a VMEM register window; HBM slabs are aliased in place)."""
    if thresholds.shape[0] == 0:
        return sr, si
    squeeze = sr.ndim == 2
    if squeeze:
        sr, si = sr[None], si[None]
    B, T, F = sr.shape
    Q, L = st_af.Q, st_af.L
    LA = len(st_la)
    if Q > MAX_Q or LA > 8:
        raise ValueError(f"packed online kernel supports Q <= {MAX_Q} and LA <= 8")
    iters = int(thresholds.shape[0])
    P = int(pack)

    amp = jnp.sqrt(sr * sr + si * si)
    mean_amp = jnp.mean(amp, axis=(-2, -1))
    b_pad = (-B) % P
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        sr, si = jnp.pad(sr, pad3), jnp.pad(si, pad3)
        mean_amp = jnp.pad(mean_amp, (0, b_pad))
    G = (B + b_pad) // P

    Fpad = _cdiv(F, 128) * 128

    def to_slabs(a):
        a = jnp.moveaxis(a.reshape(G, P, T, F), 1, 2)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, Fpad - F)))

    sr_t, si_t = to_slabs(sr), to_slabs(si)
    mean_t = mean_amp.reshape(G, P, 1)

    sets = [st_ai, st_af] + list(st_la)
    wdt = jnp.promote_types(sr.dtype, jnp.float32)
    wrs = jnp.stack([s.Wr[:, :, :F].astype(wdt) for s in sets])
    wis = jnp.stack([s.Wi[:, :, :F].astype(wdt) for s in sets])
    nzs = [s.nz for s in sets]

    kern = functools.partial(_online_kernel, T=T, F=F, Q=Q, L=L, LA=LA,
                             inner_scheme=inner_scheme,
                             iters=iters, nzs=nzs, P=P,
                             lane_skip=bool(lane_skip))
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec(wrs.shape, lambda g: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    osr, osi = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            hbm, hbm, wspec, wspec,
        ],
        out_specs=(hbm, hbm),
        out_shape=(jax.ShapeDtypeStruct((G, T, P, Fpad), sr.dtype),
                   jax.ShapeDtypeStruct((G, T, P, Fpad), si.dtype)),
        scratch_shapes=[
            pltpu.VMEM((1, P, Fpad), sr.dtype),
            pltpu.VMEM((1, P, Fpad), si.dtype),
            pltpu.VMEM((1, P, Fpad), sr.dtype),
            pltpu.VMEM((1, P, Fpad), si.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0, 3: 1},  # committed rows overwrite in place
        interpret=interpret,
    )(thresholds.astype(sr.dtype), mean_t, sr_t, si_t, wrs, wis)

    def from_slabs(a):
        return jnp.moveaxis(a[..., :F], 2, 1).reshape(G * P, T, F)[:B]

    osr, osi = from_slabs(osr), from_slabs(osi)
    if squeeze:
        osr, osi = osr[0], osi[0]
    return osr, osi


# ---------------------------------------------------------------------------
# chunked streaming online (RTISI-LA with carried state)
# ---------------------------------------------------------------------------

def _online_chunk_kernel(thr_ref, nlive_ref, mean_ref, sr_hbm, si_hbm,
                         wr_ref, wi_ref, w0r_ref, w0i_ref, aw0_ref,
                         osr_hbm, osi_hbm, wor_ref, woi_ref, awo_ref,
                         row_r, row_i, stage_r, stage_i, sem,
                         *, N, F, Q, L, LA, iters, nzs, inner_scheme, P,
                         lane_skip=False):
    """Chunked variant of `_online_kernel`: processes N frames starting from
    a caller-provided sliding-window state and returns the final state, so a
    live stream advances in one kernel dispatch per chunk (StreamingLWS
    push_block). Output row m holds the commit of absolute frame
    (frames_seen + m - LA); the host discards rows from before the look-ahead
    pipeline filled. Frames m >= n_live are drain steps (amp 0, thresholds
    maxed): the pipeline shifts and commits but no update runs, matching the
    offline kernel's tail drain."""
    W = LA + Q
    WR = W + Q - 1
    E = F + 2 * L
    g = pl.program_id(0)
    n_live = nlive_ref[0]
    cdt = jnp.promote_types(row_r.dtype, jnp.float32)
    big = jnp.asarray(3.4e38, cdt)

    def load_row(mc):
        _dma(sr_hbm.at[g, pl.ds(mc, 1)], row_r.at[:], sem)
        _dma(si_hbm.at[g, pl.ds(mc, 1)], row_i.at[:], sem)
        return (row_r[:][..., :F].astype(cdt), row_i[:][..., :F].astype(cdt))

    _, row_update = _online_row_update_fns(
        wr_ref, wi_ref, nzs, Q, L, F, P, inner_scheme, lane_skip=lane_skip)

    newest = W - 1

    def frame_step(m, carry):
        win_r, win_i, ampw = carry
        live = m < n_live
        rr, ri = load_row(m)
        amp_new = jnp.where(live, jnp.sqrt(rr * rr + ri * ri), 0.0)
        ampw = _shift_concat((ampw[1:], amp_new))
        fr_, fi_ = _freq_halo(rr, ri, F, L)
        win_r = _shift_concat((win_r[1:W], fr_, win_r[W:]))
        win_i = _shift_concat((win_i[1:W], fi_, win_i[W:]))

        amp_m = ampw[LA:LA + 1]
        mean_m = mean_ref[0, m]  # (P, 1) running (or fixed) mean at frame m
        thr0 = jnp.where(live, jnp.zeros((), cdt), big)
        win_r, win_i = row_update(win_r, win_i, newest, 0, thr0, amp_m)

        def h_body(h, wcar):
            wr_, wi_ = wcar
            thr = jnp.where(live, thr_ref[h] * mean_m, big)
            for d in range(LA, 0, -1):
                wr_, wi_ = row_update(wr_, wi_, newest - d, 2 + (d - 1), thr,
                                      ampw[LA - d:LA - d + 1])
            return row_update(wr_, wi_, newest, 1, thr, amp_m)

        win_r, win_i = jax.lax.fori_loop(0, iters, h_body, (win_r, win_i))

        # the frame leaving the look-ahead window commits to output row m
        stage_r[:, :, :F] = win_r[newest - LA:newest - LA + 1, :, L:L + F].astype(stage_r.dtype)
        stage_i[:, :, :F] = win_i[newest - LA:newest - LA + 1, :, L:L + F].astype(stage_i.dtype)
        _dma(stage_r.at[:], osr_hbm.at[g, pl.ds(m, 1)], sem)
        _dma(stage_i.at[:], osi_hbm.at[g, pl.ds(m, 1)], sem)
        return win_r, win_i, ampw

    win_r0 = w0r_ref[0][..., :E].astype(cdt)
    win_i0 = w0i_ref[0][..., :E].astype(cdt)
    ampw0 = aw0_ref[0][..., :F].astype(cdt)
    win_r, win_i, ampw = jax.lax.fori_loop(
        0, N, frame_step, (win_r0, win_i0, ampw0), unroll=False)

    pad_e = w0r_ref.shape[-1] - E
    pad_f = aw0_ref.shape[-1] - F
    wor_ref[0] = jnp.pad(win_r, ((0, 0), (0, 0), (0, pad_e))).astype(wor_ref.dtype)
    woi_ref[0] = jnp.pad(win_i, ((0, 0), (0, 0), (0, pad_e))).astype(woi_ref.dtype)
    awo_ref[0] = jnp.pad(ampw, ((0, 0), (0, 0), (0, pad_f))).astype(awo_ref.dtype)


def online_chunk_init(B, st_la, st_af, fr0, fi0, pack: int = 8):
    """Initial chunked-stream state from the first frame of each stream:
    the window is filled with replicas of the frequency-extended first frame
    (extspec edge semantics, lwslib.cpp:21-25) and the amplitude window with
    zeros (pre-start frames never update). fr0/fi0: (B, F)."""
    Q, L, LA = st_af.Q, st_af.L, len(st_la)
    WR = LA + 2 * Q - 1
    F = fr0.shape[-1]
    P = int(pack)
    b_pad = (-B) % P
    Epad = _cdiv(F + 2 * L, 128) * 128
    Fpad = _cdiv(F, 128) * 128
    if b_pad:
        fr0 = jnp.pad(fr0, ((0, b_pad), (0, 0)))
        fi0 = jnp.pad(fi0, ((0, b_pad), (0, 0)))
    G = (B + b_pad) // P
    er, ei = _freq_halo(fr0, fi0, F, L)
    er = jnp.pad(er, ((0, 0), (0, Epad - (F + 2 * L)))).reshape(G, P, Epad)
    ei = jnp.pad(ei, ((0, 0), (0, Epad - (F + 2 * L)))).reshape(G, P, Epad)
    w0r = jnp.tile(er[:, None], (1, WR, 1, 1))
    w0i = jnp.tile(ei[:, None], (1, WR, 1, 1))
    aw0 = jnp.zeros((G, LA + 1, P, Fpad), fr0.dtype)
    return w0r, w0i, aw0


def online_chunk(sr, si, state, means, st_la, st_ai, st_af, thresholds,
                 n_live=None, pack: int = 8, inner_scheme: str = "jacobi",
                 interpret: bool = False, lane_skip: bool = False):
    """Advance a chunked online stream by the frames in `sr`/`si` (B, N, F).

    `state` is the (w0r, w0i, aw0) tuple from `online_chunk_init` or a prior
    call; `means` (B, N) gives the threshold scale in effect at each frame
    (running mean of input magnitudes, or a fixed mean for offline parity).
    Returns (committed_r, committed_i, new_state): committed row m of stream
    b holds the final value of absolute frame seen+m-LA (the caller drops
    rows from before the pipeline filled). Set `n_live` < N to mark trailing
    drain frames (flush); n_live may be a traced scalar so one compiled
    program serves both live blocks and the flush tail."""
    B, N, F = sr.shape
    Q, L = st_af.Q, st_af.L
    LA = len(st_la)
    if Q > MAX_Q or LA > 8:
        raise ValueError(f"chunked online kernel supports Q <= {MAX_Q} and LA <= 8")
    iters = int(thresholds.shape[0])
    P = int(pack)
    if n_live is None:
        n_live = N

    b_pad = (-B) % P
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        sr, si = jnp.pad(sr, pad3), jnp.pad(si, pad3)
        means = jnp.pad(means, ((0, b_pad), (0, 0)))
    G = (B + b_pad) // P
    Fpad = _cdiv(F, 128) * 128

    def to_slabs(a):
        a = jnp.moveaxis(a.reshape(G, P, N, F), 1, 2)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, Fpad - F)))

    sr_t, si_t = to_slabs(sr), to_slabs(si)
    mean_t = jnp.moveaxis(means.reshape(G, P, N), 1, 2)[..., None]  # (G,N,P,1)
    w0r, w0i, aw0 = state

    sets = [st_ai, st_af] + list(st_la)
    wdt = jnp.promote_types(sr.dtype, jnp.float32)
    wrs = jnp.stack([s.Wr[:, :, :F].astype(wdt) for s in sets])
    wis = jnp.stack([s.Wi[:, :, :F].astype(wdt) for s in sets])
    nzs = [s.nz for s in sets]

    kern = functools.partial(_online_chunk_kernel, N=N, F=F, Q=Q, L=L, LA=LA,
                             inner_scheme=inner_scheme, iters=iters, nzs=nzs,
                             P=P, lane_skip=bool(lane_skip))
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec(wrs.shape, lambda g: (0, 0, 0, 0), memory_space=pltpu.VMEM)

    def gblock(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda g: (g,) + (0,) * (a.ndim - 1),
                            memory_space=pltpu.VMEM)

    osr, osi, wor, woi, awo = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            gblock(mean_t), hbm, hbm, wspec, wspec,
            gblock(w0r), gblock(w0i), gblock(aw0),
        ],
        out_specs=(hbm, hbm, gblock(w0r), gblock(w0i), gblock(aw0)),
        out_shape=(jax.ShapeDtypeStruct((G, N, P, Fpad), sr.dtype),
                   jax.ShapeDtypeStruct((G, N, P, Fpad), si.dtype),
                   jax.ShapeDtypeStruct(w0r.shape, w0r.dtype),
                   jax.ShapeDtypeStruct(w0i.shape, w0i.dtype),
                   jax.ShapeDtypeStruct(aw0.shape, aw0.dtype)),
        scratch_shapes=[
            pltpu.VMEM((1, P, Fpad), sr.dtype),
            pltpu.VMEM((1, P, Fpad), si.dtype),
            pltpu.VMEM((1, P, Fpad), sr.dtype),
            pltpu.VMEM((1, P, Fpad), si.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(thresholds.astype(sr.dtype),
      jnp.reshape(jnp.asarray(n_live, jnp.int32), (1,)), mean_t, sr_t, si_t,
      wrs, wis, w0r, w0i, aw0)

    def from_slabs(a):
        return jnp.moveaxis(a[..., :F], 2, 1).reshape(G * P, N, F)[:B]

    return from_slabs(osr), from_slabs(osi), (wor, woi, awo)


# ---------------------------------------------------------------------------
# time-tiled batch / no-future sweeps (arbitrary T)
# ---------------------------------------------------------------------------

def _tiled_sweeps_kernel(thr_ref, mean_ref, s_hbm_r, s_hbm_i, amp_hbm,
                         wr_ref, wi_ref, live_ref, osr_hbm, osi_hbm, xr, xi,
                         am, sem, *, T, F, Q, L, iters, micro, nz,
                         inner_passes, inner_scheme, P, TT, frame_unroll=1,
                         window_carry="stack", lane_skip=False, tap_chunks=1,
                         fold=1):
    """Long-T variant: the evolving state lives in the (pre-halo-padded)
    OUTPUT slab in HBM; each iteration sweeps time tiles of TT frames,
    DMA-ing tile+halo in and the updated tile out. Because tiles are
    processed in order and written back immediately, the frame order is
    IDENTICAL to the fully-resident kernel (previous tile's updated tail is
    re-read as the left halo; next tile's head still holds last iteration's
    values). HBM slabs have Q-1 frozen edge-replica rows at both ends, so
    tile DMA never needs clamping."""
    Q1 = Q - 1
    g = pl.program_id(0)
    n_tiles = _cdiv(T, TT)
    groups_per_tile = TT // micro

    # the input slabs are ALIASED to the outputs (input_output_aliases), so
    # osr/osi already hold the halo-padded input; sweeps evolve them in place
    del s_hbm_r, s_hbm_i

    # unfolded: per-utterance scalar means (P, 1); lane-folded: per-lane
    # mean rows (P, F) — each packed spectrum's own mean under its lanes
    mean_amp = mean_ref[0] if fold == 1 else mean_ref[0][:, :F]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (micro, 1, 1), 0)
    has_centre = bool(nz[Q1].any())

    def window_tile(thr, t0):
        """micro=1 fast path within a tile: sliding register window, one
        row write-back + one row shift-in per frame (see _window_sweep)."""
        _window_sweep(xr, xi, am, wr_ref, wi_ref, nz, thr,
                      Q=Q, L=L, F=F, P=P, T_loop=TT,
                      nxt_cap=TT + 2 * Q1 - 1, inner_scheme=inner_scheme,
                      has_centre=has_centre,
                      valid_fn=lambda mm: (t0 + mm) < T,
                      carry=window_carry, frame_unroll=frame_unroll,
                      lane_skip=lane_skip, tap_chunks=tap_chunks,
                      inner_passes=inner_passes, fold=fold)

    def tile_sweep(it, k, _):
        thr = thr_ref[it] * mean_amp
        t0 = k * TT  # first frame of the tile
        rows = TT + 2 * Q1
        _dma(osr_hbm.at[g, pl.ds(t0, rows)], xr.at[0:rows], sem)
        _dma(osi_hbm.at[g, pl.ds(t0, rows)], xi.at[0:rows], sem)
        _dma(amp_hbm.at[g, pl.ds(t0, TT)], am.at[0:TT], sem)

        def group_update(grp, __):
            start = grp * micro  # tile-local frame offset
            pr = xr[pl.ds(start, micro + 2 * Q1)][..., :F]
            pi = xi[pl.ds(start, micro + 2 * Q1)][..., :F]
            er, ei = _freq_halo(pr, pi, F, L, fold)

            tr = jnp.zeros((micro, P, F), dtype=pr.dtype)
            ti = jnp.zeros_like(tr)
            for dr in range(2 * Q - 1):
                if dr == Q1:
                    continue
                for dk in range(2 * L + 1):
                    if not nz[dr, dk]:
                        continue
                    wr = wr_ref[dr, dk, :]
                    wi = wi_ref[dr, dk, :]
                    tr += wr * er[dr:dr + micro, :, dk:dk + F] - wi * ei[dr:dr + micro, :, dk:dk + F]
                    ti += wr * ei[dr:dr + micro, :, dk:dk + F] + wi * er[dr:dr + micro, :, dk:dk + F]

            amp_g = am[pl.ds(start, micro)][..., :F]
            old_r = er[Q1:Q1 + micro, :, L:L + F]
            old_i = ei[Q1:Q1 + micro, :, L:L + F]
            valid = (t0 + start + row_ids) < T

            cr_rows = er[Q1:Q1 + micro]
            ci_rows = ei[Q1:Q1 + micro]
            new_r, new_i = old_r, old_i
            for _pass in range(inner_passes if has_centre else 1):
                fr, fi = tr, ti
                if has_centre:
                    for dk in range(2 * L + 1):
                        if not nz[Q1, dk]:
                            continue
                        wr = wr_ref[Q1, dk, :]
                        wi = wi_ref[Q1, dk, :]
                        fr = fr + (wr * cr_rows[..., dk:dk + F] - wi * ci_rows[..., dk:dk + F])
                        fi = fi + (wr * ci_rows[..., dk:dk + F] + wi * cr_rows[..., dk:dk + F])
                a2 = fr * fr + fi * fi
                scale = amp_g * jax.lax.rsqrt(jnp.where(a2 > 0, a2, 1))
                cond = (amp_g > thr) & (a2 > 0) & valid
                new_r = jnp.where(cond, fr * scale, old_r)
                new_i = jnp.where(cond, fi * scale, old_i)
                if has_centre and _pass + 1 < inner_passes:
                    cr_rows, ci_rows = _freq_halo(new_r, new_i, F, L, fold)

            xr[pl.ds(Q1 + start, micro), :, :F] = new_r
            xi[pl.ds(Q1 + start, micro), :, :F] = new_i
            return __

        if micro == 1:
            window_tile(thr, t0)
        else:
            jax.lax.fori_loop(0, groups_per_tile, group_update, 0, unroll=False)
        _dma(xr.at[Q1:Q1 + TT], osr_hbm.at[g, pl.ds(Q1 + t0, TT)], sem)
        _dma(xi.at[Q1:Q1 + TT], osi_hbm.at[g, pl.ds(Q1 + t0, TT)], sem)
        return _

    def one_iter(it, _):
        # sparsity-threshold iteration skip (the reference's own
        # acceleration, python/lws.pyx:203-206 + lwslib.cpp:84-85 applied at
        # sweep granularity): when no bin of any packed utterance exceeds
        # this iteration's scaled threshold, every update's
        # `amp > thr` select keeps the old value — the sweep is a no-op and
        # is skipped EXACTLY (at the reference batch defaults alpha=100,
        # beta=0.1 the first ~10 of 100 sweeps are dead on typical audio).
        @pl.when(live_ref[g, it] != 0)
        def _run():
            jax.lax.fori_loop(
                0, n_tiles, lambda k, c: tile_sweep(it, k, c), 0,
                unroll=False)
        return _

    jax.lax.fori_loop(0, iters, one_iter, 0, unroll=False)


def _live_iters(amp, mean_amp, thresholds, G, P, b_pad):
    """(G, iters) int32: 1 where any bin of any of the group's P packed
    utterances exceeds that iteration's scaled threshold (iteration-skip
    predicate; computed once in XLA — amp never changes across sweeps)."""
    amax = jnp.max(amp, axis=(-2, -1))
    if b_pad:
        amax = jnp.pad(amax, (0, b_pad))
    live = (amax.reshape(G, P, 1)
            > thresholds[None, None, :].astype(amax.dtype)
            * mean_amp.reshape(G, P, 1))
    return jnp.any(live, axis=1).astype(jnp.int32)


def tiled_lws_sweeps(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st: Stencil,
    thresholds: jnp.ndarray,
    micro: int = 1,
    pack: int = 4,
    tile: int | None = None,
    inner_passes: int = 1,
    inner_scheme: str = "jacobi",
    storage=None,
    interpret: bool = False,
    halo: tuple | None = None,
    mean_amp: jnp.ndarray | None = None,
    frame_unroll: int = 1,
    window_carry: str = "stack",
    lane_skip: bool = False,
    tap_chunks: int = 1,
    lane_fold: int = 1,
):
    """Batch/no-future sweeps for arbitrary T: exact same frame order as
    packed_lws_sweeps, with the state streamed through VMEM in time tiles.
    `tile=None` sizes the tile to the VMEM budget. `storage=jnp.bfloat16`
    keeps the evolving planes and HBM slabs in bf16 (f32 compute): halves
    HBM traffic and VMEM so the tile (and pack) can grow, at slightly
    reduced numerical fidelity.

    `halo`, when given, is (top_r, top_i, bot_r, bot_i) of shape (B, Q-1, F):
    explicit frozen time-halo frames used instead of the default edge
    replicas — the time-sharded multi-chip path passes the neighbour shard's
    boundary frames here (parallel/sharding.py). `mean_amp` (B,) overrides
    the locally computed mean magnitude (the global psum'd mean when time-
    sharded, matching the reference's whole-spectrogram mean,
    python/lws.pyx:240-245).

    `lane_fold=n` packs n batch groups side by side in the LANE axis with
    2L-lane dead straddles between their interiors, cutting the 128-lane
    tile padding the VPU burns per op (F=257: 2 groups x 3 tiles -> 1 x 5;
    see PERF.md round-5 levers). The tap arithmetic per bin is identical
    in the identical order and the straddle lanes carry zero weight and
    zero amp, so outputs are BIT-EQUAL to lane_fold=1 in f32 storage (the
    sweep-level iteration skip couples the folded groups to the max of
    their live counts — extra sweeps where every update's `amp > thr`
    select keeps the old value exactly). Requires the plain jacobi update
    (micro=1, no lane_skip/tap_chunks); the fold silently clamps to the
    largest divisor of the group count."""
    if thresholds.shape[0] == 0:
        return sr, si
    squeeze = sr.ndim == 2
    if squeeze:
        sr, si = sr[None], si[None]
        if halo is not None:
            halo = tuple(h[None] for h in halo)
        if mean_amp is not None:
            mean_amp = mean_amp[None]
    B, T, F = sr.shape
    Q, L = st.Q, st.L
    Q1 = Q - 1
    if Q > MAX_Q:
        raise ValueError(f"packed kernel supports Q <= {MAX_Q}, got Q={Q}")
    iters = int(thresholds.shape[0])
    micro = max(1, int(micro))
    direct = window_carry == "direct"
    if direct and micro > 1:
        raise ValueError("window_carry='direct' requires micro=1")
    # don't pack more utterances than the batch fills (rounded to the
    # 8-sublane tile): dead sublane tiles would burn VPU cycles
    P = min(int(pack), max(8, _cdiv(B, 8) * 8))
    fold = effective_fold(B, P, lane_fold)
    if fold > 1 and (inner_scheme != "jacobi" or lane_skip
                     or tap_chunks > 1 or micro > 1):
        raise ValueError("lane_fold > 1 requires the plain jacobi update "
                         "(micro=1, no lane_skip/tap_chunks)")
    # folded interior lane width: `fold` spectra side by side, 2L dead
    # straddle lanes (each group's halo slot in the extended row) between
    Fk = fold * (F + 2 * L) - 2 * L
    if tile is None:
        tile = _tiled_tile(F, Q, L, P, micro,
                           itemsize=jnp.dtype(storage or sr.dtype).itemsize,
                           tap_chunks=int(tap_chunks),
                           window_carry=window_carry, lane_fold=fold)
        if tile is None:
            # fixed costs leave no useful tile (tiled_supported is the
            # caller-facing predicate and uses the same sizing)
            raise ValueError(
                f"tiled kernel cannot fit F={F}, Q={Q}, L={L}, pack={P} "
                "in VMEM; use a smaller pack or the XLA path")
    TT = max(micro, (int(tile) // micro) * micro)
    # balance: with the tile count fixed, shrink the tile so the last tile
    # isn't mostly padding (T=223 @ tile=74 -> 4x74 with 73 dead pad rows;
    # balanced 4x56 -> 1 pad row, ~25% less wasted compute)
    TT = max(micro, _cdiv(_cdiv(T, _cdiv(T, TT)), micro) * micro)

    amp = jnp.sqrt(sr * sr + si * si)
    if mean_amp is None:
        mean_amp = jnp.mean(amp, axis=(-2, -1))

    b_pad = (-B) % P
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        sr, si, amp = jnp.pad(sr, pad3), jnp.pad(si, pad3), jnp.pad(amp, pad3)
        mean_amp = jnp.pad(mean_amp, (0, b_pad))
        if halo is not None:
            halo = tuple(jnp.pad(h, pad3) for h in halo)
    G0 = (B + b_pad) // P  # unfolded group count (live/mean derivation)
    G = G0 // fold
    n_tiles = _cdiv(T, TT)
    t_pad = n_tiles * TT - T
    Fpad = _cdiv(Fk, 128) * 128
    # direct mode: state rows are stored frequency-pre-extended (+2L lanes)
    Spad = _cdiv(Fk + 2 * L, 128) * 128 if direct else Fpad

    sdt = storage or sr.dtype
    out_dt = sr.dtype

    def to_slabs(a, with_halo, top_h=None, bot_h=None, width=Fpad):
        # (B, T, Fx) -> (G, Q1 + T + t_pad + Q1, P, width) with time halos
        # (explicit frames when given, edge replicas otherwise)
        Fx = a.shape[-1]
        a = jnp.moveaxis(a.reshape(G, P, T, Fx), 1, 2)
        if with_halo:
            if top_h is None:
                top = jnp.tile(a[:, :1], (1, Q1, 1, 1))
                bot = jnp.tile(a[:, -1:], (1, Q1 + t_pad, 1, 1))
            else:
                top = jnp.moveaxis(top_h.reshape(G, P, Q1, Fx), 1, 2)
                bot = jnp.moveaxis(bot_h.reshape(G, P, Q1, Fx), 1, 2)
                # t_pad filler rows are only ever read as neighbours of
                # masked (invalid) frames; replicate the last halo frame
                bot = jnp.concatenate(
                    [bot, jnp.tile(bot[:, -1:], (1, t_pad, 1, 1))], axis=1)
            a = jnp.concatenate([top, a, bot], axis=1)
        elif t_pad:
            a = jnp.pad(a, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, width - Fx))).astype(sdt)

    def fold_lanes(a, gapped=True):
        # (G*fold*P, T', Fx) -> (G*P, T', folded width): consecutive
        # groups' lanes side by side; `gapped` inserts the 2L dead
        # straddle lanes between interiors (pre-extended rows abut)
        a5 = a.reshape((G, fold, P) + a.shape[1:])
        segs = []
        for c in range(fold):
            segs.append(a5[:, c])
            if gapped and c < fold - 1:
                segs.append(jnp.zeros(
                    a5.shape[:1] + a5.shape[2:-1] + (2 * L,), a.dtype))
        out = jnp.concatenate(segs, -1)
        return out.reshape((G * P,) + out.shape[2:])

    # sweep-level iteration skip and the threshold rows derive from the
    # UNFOLDED per-utterance amp/mean, then fold (live: a folded group
    # runs while ANY of its packed spectra is live — the extra sweeps are
    # exact no-ops for the dead ones, every select keeps the old value)
    live_t = _live_iters(amp, mean_amp, thresholds, G0, P, 0)
    if fold == 1:
        mean_t = mean_amp.reshape(G, P, 1)
        mspec = pl.BlockSpec((1, P, 1), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        live_t = jnp.max(live_t.reshape(G, fold, iters), axis=1)
        # per-lane threshold rows: each folded spectrum's own mean under
        # its interior lanes (straddles inherit the left mean; dead either
        # way — amp is zero there)
        m3 = mean_amp.reshape(G, fold, P)
        rows = [jnp.broadcast_to(m3[:, c, :, None],
                                 (G, P, F + 2 * L if c < fold - 1 else F))
                for c in range(fold)]
        mean_t = jnp.pad(jnp.concatenate(rows, -1),
                         ((0, 0), (0, 0), (0, Spad - Fk)))
        mspec = pl.BlockSpec((1, P, Spad), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)

    if direct:
        sr_x, si_x = freq_extend(sr, si, L)
        halo_x = (None if halo is None else
                  freq_extend(halo[0], halo[1], L) + freq_extend(halo[2], halo[3], L))
    else:
        sr_x, si_x, halo_x = sr, si, halo
    if fold > 1:
        sr_x = fold_lanes(sr_x, not direct)
        si_x = fold_lanes(si_x, not direct)
        amp = fold_lanes(amp)
        if halo_x is not None:
            halo_x = tuple(fold_lanes(h, not direct) for h in halo_x)
    if halo_x is None:
        sr_t = to_slabs(sr_x, True, width=Spad)
        si_t = to_slabs(si_x, True, width=Spad)
    else:
        sr_t = to_slabs(sr_x, True, halo_x[0], halo_x[2], width=Spad)
        si_t = to_slabs(si_x, True, halo_x[1], halo_x[3], width=Spad)
    amp_t = to_slabs(amp, False)
    # amp/mean_amp are already batch-padded with zeros here, which can never
    # be live (0 > thr*0 is false), so no extra masking is needed

    wdt = jnp.promote_types(sr.dtype, jnp.float32)
    wr_w = st.Wr[:, :, :F].astype(wdt)
    wi_w = st.Wi[:, :, :F].astype(wdt)
    if fold > 1:
        # weight rows folded the same way, ZERO in the straddles: a tap
        # whose slice crosses a group boundary multiplies halo lanes the
        # extended row provides, and straddle OUTPUT positions accumulate
        # exactly zero (their cond is always false)
        zw = jnp.zeros(wr_w.shape[:2] + (2 * L,), wdt)
        pr_, pi_ = [], []
        for c in range(fold):
            pr_.append(wr_w)
            pi_.append(wi_w)
            if c < fold - 1:
                pr_.append(zw)
                pi_.append(zw)
        wr_w = jnp.concatenate(pr_, -1)
        wi_w = jnp.concatenate(pi_, -1)

    kern = functools.partial(
        _tiled_sweeps_kernel, T=T, F=Fk, Q=Q, L=L, iters=iters, micro=micro,
        nz=st.nz, inner_passes=int(inner_passes), inner_scheme=inner_scheme,
        P=P, TT=TT, frame_unroll=int(frame_unroll), window_carry=window_carry,
        lane_skip=bool(lane_skip), tap_chunks=int(tap_chunks), fold=fold)

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec((2 * Q - 1, 2 * L + 1, Fk), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    rows_hbm = Q1 + n_tiles * TT + Q1
    osr, osi = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mspec,
            hbm, hbm, hbm, wspec, wspec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(hbm, hbm),
        out_shape=(jax.ShapeDtypeStruct((G, rows_hbm, P, Spad), sdt),
                   jax.ShapeDtypeStruct((G, rows_hbm, P, Spad), sdt)),
        scratch_shapes=[
            pltpu.VMEM((TT + 2 * Q1, P, Spad), sdt),
            pltpu.VMEM((TT + 2 * Q1, P, Spad), sdt),
            pltpu.VMEM((TT, P, Fpad), sdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0, 3: 1},  # input slabs ARE the state buffers
        interpret=interpret,
    )(thresholds.astype(sr.dtype), mean_t, sr_t, si_t, amp_t,
      wr_w, wi_w, live_t)

    off = L if direct else 0

    def from_slabs(a):  # strip halos + pads (+ unfold packed lanes)
        a = a[:, Q1:Q1 + T].astype(out_dt)           # (G, T, P, Spad)
        if fold == 1:
            a = a[..., off:off + F]
            return jnp.moveaxis(a, 2, 1).reshape(G * P, T, F)[:B]
        segs = [a[..., c * (F + 2 * L) + off: c * (F + 2 * L) + off + F]
                for c in range(fold)]
        a = jnp.stack(segs, axis=1)                  # (G, fold, T, P, F)
        return jnp.moveaxis(a, 3, 2).reshape(G0 * P, T, F)[:B]

    osr, osi = from_slabs(osr), from_slabs(osi)
    if squeeze:
        osr, osi = osr[0], osi[0]
    return osr, osi


# ---------------------------------------------------------------------------
# time-segmented single-/small-batch sweeps (sublane-utilisation recovery)
# ---------------------------------------------------------------------------

def segmented_lws_sweeps(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st: Stencil,
    thresholds: jnp.ndarray,
    segments: int = 8,
    sweeps_per_exchange: int = 1,
    micro: int = 1,
    pack: int = 16,
    inner_passes: int = 1,
    inner_scheme: str = "jacobi",
    storage=None,
    interpret: bool = False,
    frame_unroll: int = 1,
    window_carry: str = "stack",
    lane_skip: bool = False,
    tap_chunks: int = 1,
    halo: tuple | None = None,
    mean_amp: jnp.ndarray | None = None,
):
    """Batch/no-future sweeps with each utterance's time axis split into
    `segments` virtual utterances that fill the sublane pack.

    `halo`: optional (top_r, top_i, bot_r, bot_i) stage-entry frames of
    shape (B, Q-1, F) replacing the edge-replica frozen halos at the TRUE
    boundaries — used by the processor's macro time-chunking so an interior
    macro-chunk seam sees its real neighbours. `mean_amp`: optional (B,)
    whole-signal mean magnitude overriding the locally computed one (the
    reference's threshold scale is the WHOLE signal's mean,
    python/lws.pyx:240-245 — a macro chunk must not rescale to its own).

    A single long spectrogram runs the tiled kernel at 1/P sublane
    utilisation (the other P-1 lanes are padding). Splitting time into S
    segments processed as S packed utterances recovers full vector width;
    cross-segment information flows through a (Q-1)-frame halo exchange
    every `sweeps_per_exchange` sweeps — the single-chip analogue of the
    mesh time-sharding in parallel/sharding.py (same block-Jacobi-at-seams
    semantics, same frozen stage-entry edge halos at the true boundaries).

    T is padded to a segment multiple with edge-frame replicas; the padded
    tail frames live in the last segment, update like ordinary frames, and
    are discarded on return (the reference's frozen-edge semantics apply at
    the true signal edges only).
    """
    if thresholds.shape[0] == 0:
        return sr, si
    squeeze = sr.ndim == 2
    if squeeze:
        sr, si = sr[None], si[None]
    B, T, F = sr.shape
    Q = st.Q
    Q1 = Q - 1
    S = max(1, int(segments))
    Tseg = _cdiv(T, S)
    if Tseg < max(Q1, 1) * 2:
        raise ValueError(f"segments={S} leaves {Tseg} frames/segment; need >= {2 * Q1}")
    iters = int(thresholds.shape[0])
    s_ex = max(1, int(sweeps_per_exchange))
    rounds, rem = divmod(iters, s_ex)

    t_pad = S * Tseg - T
    if t_pad:
        tail = jnp.tile(sr[:, -1:], (1, t_pad, 1))
        sr = jnp.concatenate([sr, tail], axis=1)
        si = jnp.concatenate([si, jnp.tile(si[:, -1:], (1, t_pad, 1))], axis=1)

    if mean_amp is None:
        amp_mean = jnp.mean(jnp.sqrt(sr[:, :T] ** 2 + si[:, :T] ** 2),
                            axis=(-2, -1))
    else:
        amp_mean = jnp.asarray(mean_amp).reshape(B)
    mean_seg = jnp.repeat(amp_mean, S)  # (B*S,): reference whole-signal mean

    seg_r = sr.reshape(B * S, Tseg, F)
    seg_i = si.reshape(B * S, Tseg, F)

    # frozen stage-entry halos for the true boundaries of each utterance
    # (caller-provided real neighbour frames under macro chunking, edge
    # replicas otherwise — reference edge semantics)
    if halo is None:
        frozen_top_r = jnp.repeat(jnp.tile(sr[:, :1], (1, Q1, 1)), S, axis=0)
        frozen_top_i = jnp.repeat(jnp.tile(si[:, :1], (1, Q1, 1)), S, axis=0)
        frozen_bot_r = jnp.repeat(jnp.tile(sr[:, -1:], (1, Q1, 1)), S, axis=0)
        frozen_bot_i = jnp.repeat(jnp.tile(si[:, -1:], (1, Q1, 1)), S, axis=0)
    else:
        h_tr, h_ti, h_br, h_bi = halo
        frozen_top_r = jnp.repeat(jnp.asarray(h_tr), S, axis=0)
        frozen_top_i = jnp.repeat(jnp.asarray(h_ti), S, axis=0)
        frozen_bot_r = jnp.repeat(jnp.asarray(h_br), S, axis=0)
        frozen_bot_i = jnp.repeat(jnp.asarray(h_bi), S, axis=0)
    first = (jnp.arange(B * S) % S == 0)[:, None, None]
    last = (jnp.arange(B * S) % S == S - 1)[:, None, None]

    def exchange(cr, ci):
        # live halos from same-utterance neighbour segments (roll over the
        # segment axis never crosses utterances thanks to the first/last
        # masks selecting the frozen halos there)
        top_r = jnp.where(first, frozen_top_r, jnp.roll(cr[:, -Q1:], 1, axis=0))
        top_i = jnp.where(first, frozen_top_i, jnp.roll(ci[:, -Q1:], 1, axis=0))
        bot_r = jnp.where(last, frozen_bot_r, jnp.roll(cr[:, :Q1], -1, axis=0))
        bot_i = jnp.where(last, frozen_bot_i, jnp.roll(ci[:, :Q1], -1, axis=0))
        return top_r, top_i, bot_r, bot_i

    def run_block(cr, ci, thr_block):
        halo = exchange(cr, ci)
        return tiled_lws_sweeps(
            cr, ci, st, thr_block, micro=micro, pack=pack,
            inner_passes=inner_passes, inner_scheme=inner_scheme,
            storage=storage, interpret=interpret, halo=halo,
            mean_amp=mean_seg, frame_unroll=frame_unroll,
            window_carry=window_carry, lane_skip=lane_skip,
            tap_chunks=tap_chunks)

    cr, ci = seg_r, seg_i
    if rounds:
        def body(carry, thr_block):
            return run_block(*carry, thr_block), None
        (cr, ci), _ = jax.lax.scan(
            body, (cr, ci), thresholds[:rounds * s_ex].reshape(rounds, s_ex))
    if rem:
        cr, ci = run_block(cr, ci, thresholds[rounds * s_ex:])

    osr = cr.reshape(B, S * Tseg, F)[:, :T]
    osi = ci.reshape(B, S * Tseg, F)[:, :T]
    if squeeze:
        osr, osi = osr[0], osi[0]
    return osr, osi
