"""Online LWS: TF-domain RTISI-LA as a lax.scan frame-commit pipeline.

Functional equivalent of the reference online driver TF_RTISI_LA
(lwslib/lwslib.cpp:1424-1492) and its Asym_UpdatePhase* kernels
(lwslib.cpp:767-1421), re-expressed with the single visibility-masked stencil:

For each newest frame m (left-to-right scan):
  1. initialise its phase from strictly-past frames with the asymmetric-init
     weights (threshold 0)                          -> stencil(W_ai, v=-1)
  2. for each of `iterations` rounds h:
     a. re-update the LA look-ahead frames m-d (d = LA..1, ascending frame
        order) with the normal weights; a frame d steps behind the newest may
        see at most d future frames (clamped to Q-1) -> stencil(W, v=min(d,Q-1))
        [reference: rframe = M0+Q-m-1 clamping, lwslib.cpp:1143-1151]
     b. re-update the newest frame with the asymmetric-full weights, past +
        centre-frame taps only                       -> stencil(W_af, v=0)

The per-frame update order is Gauss-Seidel in place, exactly like the
reference; all F bins of a frame update in parallel (vectorized over batch).
The reference's `update==1` self-term branches (lwslib.cpp:1162-1164) are dead
code - both bindings hardcode update_type=2 (python/lws.pyx:363) - and are not
reproduced.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .stencil import (Stencil, freq_extend, make_time_halos, safe_sqrt,
                      time_extend, update_frame)


def rtisi_la(
    sr: jnp.ndarray,
    si: jnp.ndarray,
    st_la: list[Stencil],  # st_la[d-1]: stencil(W, v=min(d, Q-1)) for d = 1..LA
    st_ai: Stencil,  # stencil(W_asym_init, v=-1)
    st_af: Stencil,  # stencil(W_asym_full, v=0)
    thresholds: jnp.ndarray,
    inner_passes: int = 1,
    inner_scheme: str = "jacobi",
):
    """Run online (RTISI-LA) phase recovery over (sr, si) of shape (..., T, F)."""
    iters = thresholds.shape[0]
    if iters == 0:
        return sr, si
    Q, L = st_af.Q, st_af.L
    LA = len(st_la)
    T = sr.shape[-2]
    F = st_af.n_bins

    # safe_sqrt (core/stencil.py): forward is plain jnp.sqrt, backward
    # finite at zero bins
    amp = safe_sqrt(sr * sr + si * si)
    mean_amp = jnp.mean(amp, axis=(-2, -1), keepdims=True)
    thr_sched = thresholds.astype(amp.dtype)

    er, ei = freq_extend(sr, si, L)
    top_r, bot_r = make_time_halos(er, Q)
    top_i, bot_i = make_time_halos(ei, Q)
    xr0 = time_extend(er, top_r, bot_r)
    xi0 = time_extend(ei, top_i, bot_i)
    amp_t = jnp.moveaxis(amp, -2, 0)  # (T, ..., F)
    tdim = amp.ndim - 2

    def amp_row(f):
        return lax.dynamic_slice_in_dim(amp, f, 1, axis=tdim)[..., 0, :]

    def frame_step(x, xs):
        m, amp_m = xs
        # (1) initial phase estimate for the newest uncommitted frame
        x = update_frame(x[0], x[1], m, amp_m, st_ai, jnp.zeros_like(amp_m))

        def h_body(h, xh):
            thr = lax.dynamic_index_in_dim(thr_sched, h, keepdims=False) * mean_amp[..., 0, :]
            # (2a) look-ahead window, ascending frame order
            for d in range(LA, 0, -1):
                f = m - d
                xh = lax.cond(
                    f >= 0,
                    lambda s, ff=f, dd=d: update_frame(
                        s[0], s[1], ff, amp_row(ff), st_la[dd - 1], thr, inner_passes,
                        inner_scheme),
                    lambda s: s,
                    xh,
                )
            # (2b) newest frame with the asymmetric-full window
            return update_frame(xh[0], xh[1], m, amp_m, st_af, thr, inner_passes,
                                inner_scheme)

        x = lax.fori_loop(0, iters, h_body, x)
        return x, None

    (xr, xi), _ = lax.scan(frame_step, (xr0, xi0), (jnp.arange(T), amp_t))
    return xr[..., Q - 1:Q - 1 + T, L:L + F], xi[..., Q - 1:Q - 1 + T, L:L + F]
