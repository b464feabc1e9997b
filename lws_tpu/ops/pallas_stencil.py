"""Pallas TPU kernel: whole-spectrogram-resident LWS sweeps.

The speed-of-light design for the batch/no-future schedules: one pallas_call
runs ALL iterations with the spectrogram planes resident in VMEM, eliminating
the per-iteration HBM round trips and the 100 x T-step XLA scan of the
reference-ordered path. Grid is over the batch dimension (one program per
utterance - the data-parallel axis), so a single chip pipelines B programs.

Update order: block-sequential Gauss-Seidel - frames are processed in blocks
of `block` rows; blocks run strictly in order (later blocks read earlier
blocks' updated values, like the reference raster sweep, lwslib.cpp:81-82),
bins within a block update in parallel. block=1 reproduces the XLA "gs" order
exactly; block~8-32 trades a little update-order fidelity for VPU-shaped
(sublane x lane) tiles.

Memory layout per program (f32): two scratch planes (Q-1 + T + Q-1, F+2L)
holding the time-extended spectrogram (frozen edge-replica halos at both
ends, lwslib.cpp:21-25), plus the (1, T, F) amp/in/out blocks and the
(2Q-1, 2L+1, F) stencil weights. The +-L frequency halo is materialised
per-block on the fly (conjugate reflection), not stored.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.stencil import Stencil

__all__ = ["pallas_lws_sweeps", "pallas_supported"]


def _cdiv(a, b):
    return -(-a // b)


def pallas_supported(T: int, F: int, Q: int, L: int, vmem_budget: int = 14 * 2 ** 20) -> bool:
    """Whole-plane residency check against the real ~16 MiB VMEM budget:
    pipelined in/out blocks (x2 buffering) + scratch planes + weights."""
    fp = _cdiv(F + 2 * L, 128) * 128
    tp = T + 2 * (Q - 1)
    scratch = 2 * tp * fp * 4
    blocks = 5 * T * _cdiv(F, 128) * 128 * 4  # sr/si/amp in + sr/si out
    weights = 2 * (2 * Q - 1) * (2 * L + 1) * fp * 4
    return scratch + 2 * blocks + weights < vmem_budget


def _kernel(thr_ref, mean_ref, sr_ref, si_ref, amp_ref, wr_ref, wi_ref,
            osr_ref, osi_ref, xr, xi, *, T, F, Q, L, iters, block, micro, nz, inner_passes):
    """One program = one batch element; runs every sweep in VMEM.

    Scratch layout (rows): [0..TOP) alignment pad (top Q-1 rows of it hold the
    frozen edge halo), [TOP..TOP+T) interior, then the bottom frozen halo and
    alignment pad. TOP = 8 so every dynamic block read/write offset is a
    multiple of the f32 sublane tile (Mosaic requirement); block % 8 == 0.
    """
    TOP = 8
    n_blocks = -(-T // block)
    win = block + 2 * TOP  # aligned read window rows

    # ---- initialise scratch: zero pads, interior, frozen edge halos ----
    xr[:TOP, :] = jnp.zeros((TOP, F), xr.dtype)
    xi[:TOP, :] = jnp.zeros((TOP, F), xi.dtype)
    xr[TOP + n_blocks * block:, :] = jnp.zeros_like(xr[TOP + n_blocks * block:, :])
    xi[TOP + n_blocks * block:, :] = jnp.zeros_like(xi[TOP + n_blocks * block:, :])
    xr[TOP:TOP + T, :] = sr_ref[0]
    xi[TOP:TOP + T, :] = si_ref[0]
    for j in range(Q - 1):
        xr[TOP - 1 - j, :] = sr_ref[0, 0, :]
        xi[TOP - 1 - j, :] = si_ref[0, 0, :]
        xr[TOP + T + j, :] = sr_ref[0, T - 1, :]
        xi[TOP + T + j, :] = si_ref[0, T - 1, :]

    mean_amp = mean_ref[pl.program_id(0)]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (micro, 1), 0)

    def freq_halo(rows_r, rows_i):
        """(rows, F) -> (rows, F+2L): conjugate-reflected margins.

        Mosaic has no lane-reverse primitive; the L mirror lanes are gathered
        as width-1 static slices (L is small, typically 5).
        """
        left = [(rows_r[:, k:k + 1], -rows_i[:, k:k + 1]) for k in range(L, 0, -1)]
        right = [(rows_r[:, k:k + 1], -rows_i[:, k:k + 1])
                 for k in range(F - 2, F - 2 - L, -1)]
        er = jnp.concatenate([p[0] for p in left] + [rows_r] + [p[0] for p in right], axis=1)
        ei = jnp.concatenate([p[1] for p in left] + [rows_i] + [p[1] for p in right], axis=1)
        return er, ei

    n_micro = block // micro
    has_centre = bool(nz[Q - 1].any())

    def micro_update(er, ei, amp_blk, thr, start, g):
        """Update the g-th micro-group of the window in registers (GS order)."""
        r0 = TOP + g * micro  # window-local first updated row
        tr = jnp.zeros((micro, F), dtype=er.dtype)
        ti = jnp.zeros((micro, F), dtype=er.dtype)
        for dr in range(2 * Q - 1):
            if dr == Q - 1:
                continue
            for dk in range(2 * L + 1):
                if not nz[dr, dk]:
                    continue
                wr = wr_ref[dr, dk, :]
                wi = wi_ref[dr, dk, :]
                r = r0 - (Q - 1) + dr
                br = er[r:r + micro, dk:dk + F]
                bi = ei[r:r + micro, dk:dk + F]
                tr += wr * br - wi * bi
                ti += wr * bi + wi * br

        amp_g = amp_blk[g * micro:(g + 1) * micro, :]
        old_r = er[r0:r0 + micro, L:L + F]
        old_i = ei[r0:r0 + micro, L:L + F]
        valid = (start + g * micro + row_ids) < T  # mask ragged tail rows

        cr_rows = er[r0:r0 + micro, :]
        ci_rows = ei[r0:r0 + micro, :]
        new_r, new_i = old_r, old_i
        for _pass in range(inner_passes if has_centre else 1):
            fr, fi = tr, ti
            if has_centre:
                for dk in range(2 * L + 1):
                    if not nz[Q - 1, dk]:
                        continue
                    wr = wr_ref[Q - 1, dk, :]
                    wi = wi_ref[Q - 1, dk, :]
                    fr = fr + (wr * cr_rows[:, dk:dk + F] - wi * ci_rows[:, dk:dk + F])
                    fi = fi + (wr * ci_rows[:, dk:dk + F] + wi * cr_rows[:, dk:dk + F])
            a = jnp.sqrt(fr * fr + fi * fi)
            scale = amp_g / jnp.where(a > 0, a, 1)
            cond = (amp_g > thr) & (a > 0) & valid
            new_r = jnp.where(cond, fr * scale, old_r)
            new_i = jnp.where(cond, fi * scale, old_i)
            if has_centre and _pass + 1 < inner_passes:
                cr_rows, ci_rows = freq_halo(new_r, new_i)

        if n_micro == 1:
            # single group: no later group reads the window again
            return new_r, new_i
        nr_ext, ni_ext = freq_halo(new_r, new_i)
        # r0 is a python int: rebuild the window with static slicing (Mosaic
        # has no dynamic_update_slice on vector values)
        er = jnp.concatenate([er[:r0], nr_ext, er[r0 + micro:]], axis=0)
        ei = jnp.concatenate([ei[:r0], ni_ext, ei[r0 + micro:]], axis=0)
        return er, ei

    def sweep_block(it, b, _):
        thr = thr_ref[it] * mean_amp
        start = b * block  # first interior frame of this block
        pr = xr[pl.ds(start, win), :]  # aligned read: scratch rows [start, start+win)
        pi = xi[pl.ds(start, win), :]
        er, ei = freq_halo(pr, pi)
        amp_blk = amp_ref[0, pl.ds(start, block), :]

        # sequential micro-groups inside the window: register-level Gauss-Seidel
        if n_micro == 1:
            new_r, new_i = micro_update(er, ei, amp_blk, thr, start, 0)
            xr[pl.ds(TOP + start, block), :] = new_r  # aligned write
            xi[pl.ds(TOP + start, block), :] = new_i
            return _
        for g in range(n_micro):
            er, ei = micro_update(er, ei, amp_blk, thr, start, g)

        xr[pl.ds(TOP + start, block), :] = er[TOP:TOP + block, L:L + F]  # aligned write
        xi[pl.ds(TOP + start, block), :] = ei[TOP:TOP + block, L:L + F]
        return _

    def one_iter(it, _):
        return jax.lax.fori_loop(
            0, n_blocks, lambda b, c: sweep_block(it, b, c), _, unroll=False)

    jax.lax.fori_loop(0, iters, one_iter, 0, unroll=False)

    osr_ref[0] = xr[TOP:TOP + T, :]
    osi_ref[0] = xi[TOP:TOP + T, :]


def pallas_lws_sweeps(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st: Stencil,
    thresholds: jnp.ndarray,
    block: int = 16,
    micro: int | None = None,
    inner_passes: int = 1,
    interpret: bool = False,
):
    """Run len(thresholds) LWS sweeps with the spectrogram resident in VMEM.

    sr, si: (B, T, F) float32 planes. Semantics identical to
    core.batch.lws_sweeps(order="gs") up to the block update granularity.
    """
    if thresholds.shape[0] == 0:
        return sr, si
    squeeze = sr.ndim == 2
    if squeeze:
        sr, si = sr[None], si[None]
    B, T, F = sr.shape
    Q, L = st.Q, st.L
    iters = int(thresholds.shape[0])

    amp = jnp.sqrt(sr * sr + si * si)
    mean_amp = jnp.mean(amp, axis=(-2, -1))  # (B,)

    # memory blocks must be 8-row aligned (f32 sublane tile); `micro` is the
    # sequential update granularity inside a block (micro=1 -> exact frame-GS)
    block = int(block)
    if micro is None:
        micro = block
    micro = max(1, min(int(micro), block))
    block = max(8, (block // 8) * 8)
    while block % micro:
        micro -= 1

    kern = functools.partial(
        _kernel, T=T, F=F, Q=Q, L=L, iters=iters, block=block, micro=micro,
        nz=st.nz, inner_passes=int(inner_passes))

    from .pallas_packed import MAX_Q
    if Q > MAX_Q:
        raise ValueError(f"pallas kernel supports Q <= {MAX_Q}, got Q={Q}; use the XLA path")
    n_blocks = -(-T // block)
    Tp = 8 + n_blocks * block + 16  # TOP pad + blocks + bottom read slack
    # pad amp to a whole number of blocks: the kernel's dynamic row reads must
    # never clamp (lax.dynamic_slice clamping would silently read wrong rows)
    t_pad = n_blocks * block - T
    if t_pad:
        amp = jnp.pad(amp, ((0, 0), (0, t_pad), (0, 0)))
    out_shape = (jax.ShapeDtypeStruct((B, T, F), sr.dtype),
                 jax.ShapeDtypeStruct((B, T, F), si.dtype))
    grid = (B,)
    bspec = pl.BlockSpec((1, T, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((2 * Q - 1, 2 * L + 1, F), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    osr, osi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thresholds (iters,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mean (B,), indexed by program id
            bspec, bspec,  # sr, si
            pl.BlockSpec((1, T + t_pad, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # amp (padded to block multiple)
            wspec, wspec,  # Wr, Wi
        ],
        out_specs=(bspec, bspec),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Tp, F), sr.dtype),
            pltpu.VMEM((Tp, F), si.dtype),
        ],
        interpret=interpret,
    )(thresholds.astype(sr.dtype), mean_amp, sr, si, amp,
      st.Wr[:, :, :F], st.Wi[:, :, :F])
    if squeeze:
        osr, osi = osr[0], osi[0]
    return osr, osi
