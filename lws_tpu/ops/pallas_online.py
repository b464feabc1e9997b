"""Pallas TPU kernel: online (TF-RTISI-LA) phase recovery.

The online schedule is inherently frame-sequential (lwslib.cpp:1432 commit
order), which makes the XLA scan formulation dispatch/compile-bound. This
kernel runs the whole schedule per utterance inside VMEM with a SLIDING
REGISTER WINDOW of the LA+Q most recent frames: every update position is
static relative to the window, so there is no dynamic row indexing at all -
the window shifts by one frame per step (static concatenation), new input
frames stream in as aligned 8-row chunks, and committed frames stream out as
aligned 8-row chunks (the scratch interior starts at row 8+LA so commit
offsets land on sublane-tile boundaries).

Per new frame m (exactly the reference sequencing, lwslib.cpp:1441-1451):
  1. asym-init of m from strictly-past frames (W_ai stencil, threshold 0)
  2. per round h: look-ahead frames m-d (d=LA..1) with stencil(W, v=min(d,Q-1)),
     then m with the asym-full stencil (v=0), at thresholds[h]
Virtual steps m >= T (needed to drain the commit pipeline) disable updates
via an infinite threshold; frames before the stream keep zero magnitudes so
they stay frozen edge replicas, matching the offline clamping
(lwslib.cpp:1434-1439).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.stencil import Stencil

__all__ = ["pallas_rtisi_la"]


def _cdiv(a, b):
    return -(-a // b)


def _kernel(thr_ref, mean_ref, sr_ref, si_ref, amp_ref, wr_ref, wi_ref,
            osr_ref, osi_ref, xr, xi, *, T, F, Q, L, LA, iters, nzs):
    """One program = one utterance. nzs[set] = host nonzero map per stencil
    set; sets are ordered [ai, af, la_1 .. la_LA]."""
    TOP = 8 + LA  # interior frame k lives at scratch row TOP + k - LA ... see below
    GB = 8  # group size (f32 sublane tile)
    n_groups = _cdiv(T + LA, GB)
    W = LA + Q  # window frames: m-LA-(Q-1) .. m
    WR = W + Q - 1  # + right dummy rows so the newest frame's patch slices exist
    Fp = F + 2 * L
    big = jnp.asarray(3.4e38, xr.dtype)

    # scratch row of frame k is ROW0 + k where ROW0 = 8 + LA... commits for
    # group g (frames g*8-LA .. g*8+7-LA) then land at rows [8+g*8, 8+g*8+8).
    ROW0 = 8 + LA

    # ---- initialise scratch: zeros, interior input frames ----
    xr[:, :] = jnp.zeros_like(xr[:, :])
    xi[:, :] = jnp.zeros_like(xi[:, :])
    xr[ROW0:ROW0 + T, :] = sr_ref[0]
    xi[ROW0:ROW0 + T, :] = si_ref[0]

    mean_amp = mean_ref[pl.program_id(0)]

    def freq_halo1(row_r, row_i):
        """(1, F) -> (1, F+2L) conjugate-reflected margins."""
        left = [(row_r[:, k:k + 1], -row_i[:, k:k + 1]) for k in range(L, 0, -1)]
        right = [(row_r[:, k:k + 1], -row_i[:, k:k + 1])
                 for k in range(F - 2, F - 2 - L, -1)]
        er = jnp.concatenate([p[0] for p in left] + [row_r] + [p[0] for p in right], axis=1)
        ei = jnp.concatenate([p[1] for p in left] + [row_i] + [p[1] for p in right], axis=1)
        return er, ei

    def set_row(arr, row, idx):
        """arr with row `idx` replaced (static idx; no zero-size slices -
        Mosaic rejects empty vectors)."""
        parts = []
        if idx > 0:
            parts.append(arr[:idx])
        parts.append(row)
        if idx + 1 < arr.shape[0]:
            parts.append(arr[idx + 1:])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else row

    def row_update(win_r, win_i, idx, w_set, thr, amp_row):
        """Update window row `idx` (static) with stencil set `w_set` (static)."""
        nz = nzs[w_set]
        tr = jnp.zeros((1, F), dtype=win_r.dtype)
        ti = jnp.zeros((1, F), dtype=win_r.dtype)
        for dr in range(2 * Q - 1):
            for dk in range(2 * L + 1):
                if not nz[dr, dk]:
                    continue
                wr = wr_ref[w_set, dr, dk, :]
                wi = wi_ref[w_set, dr, dk, :]
                r = idx - (Q - 1) + dr
                br = win_r[r:r + 1, dk:dk + F]
                bi = win_i[r:r + 1, dk:dk + F]
                tr += wr * br - wi * bi
                ti += wr * bi + wi * br
        a = jnp.sqrt(tr * tr + ti * ti)
        scale = amp_row / jnp.where(a > 0, a, 1)
        cond = (amp_row > thr) & (a > 0)
        old_r = win_r[idx:idx + 1, L:L + F]
        old_i = win_i[idx:idx + 1, L:L + F]
        new_r = jnp.where(cond, tr * scale, old_r)
        new_i = jnp.where(cond, ti * scale, old_i)
        er, ei = freq_halo1(new_r, new_i)
        return set_row(win_r, er, idx), set_row(win_i, ei, idx)

    newest = W - 1  # window row of the newest frame

    def group_body(g, carry):
        win_r, win_i = carry
        base = g * GB  # first frame index of this group (m = base + j)

        # aligned loads: input frames [base, base+16) and amp [base-8, base+16)
        in_r = xr[pl.ds(8 + base, 2 * GB), :]   # rows 8+base = ROW0+base-LA
        in_i = xi[pl.ds(8 + base, 2 * GB), :]
        amp_g = amp_ref[0, pl.ds(base, 3 * GB), :]  # padded: row 8+k = frame k

        com_r = jnp.zeros((GB, Fp), dtype=win_r.dtype)
        com_i = jnp.zeros((GB, Fp), dtype=win_i.dtype)

        for j in range(GB):
            m = base + j
            live = m < T  # virtual drain steps never update
            # shift in frame m's input (static row LA+j of the 16-row chunk)
            fr, fi = freq_halo1(in_r[LA + j:LA + j + 1, :], in_i[LA + j:LA + j + 1, :])
            win_r = jnp.concatenate([win_r[1:W], fr, win_r[W:]], axis=0)
            win_i = jnp.concatenate([win_i[1:W], fi, win_i[W:]], axis=0)

            amp_m = amp_g[8 + j:8 + j + 1, :]  # frame m (padded row 8+k = frame k)
            thr0 = jnp.where(live, jnp.zeros((), xr.dtype), big)
            win_r, win_i = row_update(win_r, win_i, newest, 0, thr0, amp_m)

            def h_body(h, wcar):
                wr_, wi_ = wcar
                thr = jnp.where(live, thr_ref[h] * mean_amp, big)
                for d in range(LA, 0, -1):
                    amp_d = amp_g[8 + j - d:8 + j - d + 1, :]
                    wr_, wi_ = row_update(wr_, wi_, newest - d, 2 + (d - 1), thr, amp_d)
                return row_update(wr_, wi_, newest, 1, thr, amp_m)

            win_r, win_i = jax.lax.fori_loop(0, iters, h_body, (win_r, win_i))

            # frame m-LA is now final: collect it (window row newest-LA)
            com_r = set_row(com_r, win_r[newest - LA:newest - LA + 1], j)
            com_i = set_row(com_i, win_i[newest - LA:newest - LA + 1], j)

        xr[pl.ds(8 + base, GB), :] = com_r[:, L:L + F]  # aligned commit write
        xi[pl.ds(8 + base, GB), :] = com_i[:, L:L + F]
        return win_r, win_i

    # initial window: replicas of frame 0 (frozen extspec edge semantics)
    f0r, f0i = freq_halo1(sr_ref[0, 0:1, :], si_ref[0, 0:1, :])
    win_r0 = jnp.tile(f0r, (WR, 1))
    win_i0 = jnp.tile(f0i, (WR, 1))

    jax.lax.fori_loop(0, n_groups, group_body, (win_r0, win_i0), unroll=False)

    osr_ref[0] = xr[ROW0:ROW0 + T, :]
    osi_ref[0] = xi[ROW0:ROW0 + T, :]


def pallas_rtisi_la(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st_la: list[Stencil],
    st_ai: Stencil,
    st_af: Stencil,
    thresholds: jnp.ndarray,
    interpret: bool = False,
):
    """Online LWS with the whole schedule in one VMEM-resident kernel.

    Same signature semantics as core.online.rtisi_la; (B, T, F) or (T, F).
    """
    if thresholds.shape[0] == 0:
        return sr, si
    squeeze = sr.ndim == 2
    if squeeze:
        sr, si = sr[None], si[None]
    B, T, F = sr.shape
    Q, L = st_af.Q, st_af.L
    LA = len(st_la)
    iters = int(thresholds.shape[0])
    if Q - 1 > 8 or LA > 8:
        raise ValueError("pallas online kernel supports Q <= 9 and LA <= 8")

    amp = jnp.sqrt(sr * sr + si * si)
    mean_amp = jnp.mean(amp, axis=(-2, -1))  # (B,)

    # stencil sets: [ai, af, la_1 .. la_LA]
    sets = [st_ai, st_af] + list(st_la)
    wrs = jnp.stack([s.Wr[:, :, :F] for s in sets])
    wis = jnp.stack([s.Wi[:, :, :F] for s in sets])
    nzs = [s.nz for s in sets]

    GB = 8
    n_groups = _cdiv(T + LA, GB)
    # amp padded so that row 8+k = frame k and group reads [base, base+24) fit
    amp_pad = jnp.pad(amp, ((0, 0), (8, n_groups * GB + 24 - T - 8), (0, 0)))
    rows = 8 + LA + n_groups * GB + 24  # scratch rows incl. read slack

    kern = functools.partial(_kernel, T=T, F=F, Q=Q, L=L, LA=LA, iters=iters, nzs=nzs)

    bspec = pl.BlockSpec((1, T, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, amp_pad.shape[1], F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(wrs.shape, lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    osr, osi = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thresholds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mean (B,)
            bspec, bspec, aspec,
            wspec, wspec,
        ],
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct((B, T, F), sr.dtype),
                   jax.ShapeDtypeStruct((B, T, F), si.dtype)),
        scratch_shapes=[
            pltpu.VMEM((rows, F), sr.dtype),
            pltpu.VMEM((rows, F), si.dtype),
        ],
        interpret=interpret,
    )(thresholds.astype(sr.dtype), mean_amp, sr, si, amp_pad, wrs, wis)
    if squeeze:
        osr, osi = osr[0], osi[0]
    return osr, osi
