"""The LWS processor: public API mirroring the reference `lws` class.

Drop-in equivalent of python/lws.pyx:378-499 with the same constructor surface
(parameter names preserved) plus TPU-native extensions: arbitrary leading
batch dimensions, dtype control (float32 planes on TPU by default, float64
under jax_enable_x64 for oracle parity), and sweep-order selection.

All weight tensors are precomputed once at construction (host, float64) and
the three schedules run as jit-compiled device programs with no host
round-trips between iterations.

Device data convention: spectrograms are SPLIT real/imag float pairs
(sr, si) on device; complex arrays appear only at the host boundary. Every
phase-recovery method accepts either a complex array (returns a host complex
array, reference-compatible) or an (sr, si) pair (returns a pair, zero-copy
chaining for production pipelines).
"""
from __future__ import annotations

import functools
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from . import stft as _stft
from .core.batch import lws_sweeps
from .core.online import rtisi_la
from .core.stencil import make_stencil, merge, split
from .ops.pallas_packed import (online_supported, packed_rtisi_la,
                                segmented_lws_sweeps, tiled_lws_sweeps)
from .weights import build_stencil, create_weights
from .windows import (
    build_asymmetric_windows,
    default_window,
    get_thresholds,
    overlap_factor,
    synthwin,
)

__all__ = ["LWS", "lws"]


def _default_real_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class LWS:
    """Fast spectrogram phase recovery using Local Weighted Sums, TPU-native.

    Constructor signature mirrors the reference (python/lws.pyx:379-383);
    `mode='speech'` selects batch-only, `mode='music'` enables the no-future
    and online stages (python/lws.pyx:432-437).
    """

    def __init__(
        self,
        awin_or_fsize,
        fshift,
        L=5,
        swin=None,
        look_ahead=3,
        nofuture_iterations=0,
        nofuture_alpha=1,
        nofuture_beta=0.1,
        nofuture_gamma=1,
        online_iterations=0,
        online_alpha=1,
        online_beta=0.1,
        online_gamma=1,
        batch_iterations=100,
        batch_alpha=100,
        batch_beta=0.1,
        batch_gamma=1,
        symmetric_win=True,
        mode=None,
        fftsize=None,
        perfectrec=True,
        use_simplifications=True,
        dtype=None,
        order="gs",
        precision=None,
        inner_passes=None,
        inner_scheme=None,
        backend="auto",
        pallas_pack=32,
        pallas_storage=None,
        pallas_unroll=1,
        pallas_window=None,
        pallas_tap_chunks=1,
        pallas_fold="auto",
        auto_segment=True,
    ):
        if isinstance(awin_or_fsize, (int, np.integer)):
            awin = default_window(int(awin_or_fsize), fshift, symmetric=symmetric_win)
        else:
            awin = np.asarray(awin_or_fsize, dtype=np.float64)
            if awin.ndim > 1:
                if awin.ndim > 2 or (awin.shape[0] > 1 and awin.shape[1] > 1):
                    raise ValueError("The analysis window should be flat")
                awin = awin.flatten()

        if fftsize is None:
            fftsize = len(awin)
        if fftsize > len(awin):
            # symmetric zero-padding of the windows (python/lws.pyx:399-410);
            # boundary samples then fall outside the perfect-reconstruction region
            if (fftsize - len(awin)) % 2 != 0:
                raise ValueError("The zero-padding should add even length to the original window.")
            warnings.warn(
                "lws_tpu: fftsize exceeds the window length; the windows are "
                "symmetrically zero-padded, so samples within fftsize/2 of "
                "the signal boundaries lose perfect reconstruction "
                "(reference behaviour, python/lws.pyx:403-406)")
            pad = np.zeros((fftsize - len(awin)) // 2)
            awin = np.concatenate([pad, awin, pad])
            if swin is not None:
                swin = np.concatenate([pad, np.asarray(swin, dtype=np.float64), pad])

        if use_simplifications and not np.allclose(awin, awin[::-1]):
            # the summarized-weight simplifications assume a symmetric
            # analysis window, awin[t] == awin[T-1-t] (python/lws.pyx:452-454)
            warnings.warn(
                "lws_tpu: the analysis window is not symmetric, but "
                "use_simplifications=True assumes awin[t] == awin[T-1-t]; "
                "pass use_simplifications=False for exact weights")
        self.awin = awin
        self.swin = synthwin(awin, fshift, swin=swin)
        self.fshift = int(fshift)
        self.fsize = len(awin)
        self.fftsize = int(fftsize)
        self.perfectrec = perfectrec
        self.L = int(L)
        self.look_ahead = int(look_ahead)
        self.use_simplifications = use_simplifications
        self.order = order
        # matmul precision for order="jacobi_mxu" (None = backend default,
        # bf16-pass on TPU): default parity with the elementwise Jacobi
        # order holds up to ~17-19 dB consistency; "highest" recovers it
        # exactly at ~2.6x the MXU work (PERF.md). Ignored by other orders.
        self.precision = precision
        if order == "jacobi_mxu" and precision is None:
            # measured quality floor (PERF.md round-4 levers): at the
            # backend-default bf16-pass matmul precision a pure tone floors
            # out at 19.74 dB where the elementwise Jacobi order reaches
            # 23.67; precision="highest" recovers it exactly at ~2.6x cost
            warnings.warn(
                "lws_tpu: order='jacobi_mxu' at the backend-default matmul "
                "precision floors achievable consistency near ~19 dB on "
                "high-consistency material (PERF.md); pass "
                "precision='highest' to recover elementwise-Jacobi-exact "
                "results at ~2.6x the MXU cost")
        self._inner_passes_arg = inner_passes  # resolved after Q is known
        self.inner_scheme = inner_scheme  # resolved after Q is known
        self.backend = backend
        # micro (blocked parallel frame updates) and lane_skip (lane-granular
        # threshold skip) are measured research REJECTS on TPU (PERF.md):
        # they stay available as kernel-level kwargs on
        # ops.pallas_packed.tiled_lws_sweeps / packed_lws_sweeps for
        # experiments, but are not constructor knobs — the production path
        # always runs the exact reference frame order (micro=1, dense rows)
        self.pallas_micro = 1
        # configured sublane-pack ceiling: the launch planner walks a
        # halving ladder (32 -> 16 -> 8) and the kernel clamps to the batch
        # size, so 32 costs nothing on small batches and buys ~5-60%
        # on well-filled ones (PERF.md round-4 levers: p32 vs p16 measured
        # 999 vs 958 at Q=4, 1629 vs 1295 at Q=2)
        self.pallas_pack = int(pallas_pack)
        # opt-in bf16 state storage for the batch/no-future tiled kernels:
        # halves HBM traffic / VMEM at slightly reduced fidelity (compute
        # stays f32); e.g. LWS(..., pallas_storage="bfloat16")
        self.pallas_storage = (jnp.dtype(pallas_storage)
                               if pallas_storage is not None else None)
        if self.pallas_storage == jnp.dtype(jnp.bfloat16):
            # measured quality ceiling (PERF.md round-4 levers): a 3 s tone
            # recovers 30.2 dB at f32 storage but only 22.3 dB at bf16 — the
            # knob is consistency-parity ONLY where the f32 result already
            # saturates below ~22 dB (the HBM-bound vocoder/longform classes)
            warnings.warn(
                "lws_tpu: pallas_storage='bfloat16' caps achievable "
                "consistency near ~22 dB (a signal that recovers 30 dB at "
                "f32 storage stops at ~22 dB, PERF.md); use it only where "
                "the f32 result already saturates below that — keep the "
                "default f32 storage for clean/high-consistency material")
        # Mosaic frame-loop unroll hint for the batch/no-future sweep
        # kernels (bit-neutral: identical output at any level). >1 lets the
        # compiler turn the per-frame register-window shift into register
        # renaming across unrolled bodies; measured on hardware before
        # changing the default (tools/unroll_experiment.py, PERF.md).
        self.pallas_unroll = int(pallas_unroll)
        # loop-carried window representation in the sweep kernels: "stack"
        # (concat shift), "rows" (tuple carry, SSA-renamed shift) or
        # "direct" (no carried window; frequency-pre-extended scratch rows)
        # — bit-identical outputs, different Mosaic compilation/VMEM
        # trade-offs (PERF.md). None (default) = auto: the launch planner
        # prefers direct (faster at every probed geometry, 10-20x faster
        # compiles, and its halved scoped spill keeps wide packs where the
        # carried window cannot — e.g. the vocoder's Q=8/F=1025 pack=16,
        # +44% measured), falling back to the carried modes for bf16
        # storage and tap-chunked launches (_window_modes).
        if pallas_window not in (None, "stack", "rows", "direct"):
            raise ValueError(
                "pallas_window must be None (auto), 'stack', 'rows' or 'direct'")
        self.pallas_window = pallas_window
        # tap-accumulation chunking (ops/pallas_packed._chunk_bounds):
        # computing the stencil update in n frequency chunks divides the
        # kernel's scoped-VMEM spill by ~n (bit-identical output), letting
        # wide sublane packs fit high-Q/large-F geometries (e.g. the
        # vocoder's Q=8, F=1025 at pack=16)
        self.pallas_tap_chunks = int(pallas_tap_chunks)
        if self.pallas_window == "direct" and self.pallas_tap_chunks > 1:
            raise ValueError(
                "pallas_tap_chunks > 1 has no effect with "
                "pallas_window='direct' (there is no carried window to "
                "chunk); use one or the other")
        # lane folding (ops/pallas_packed.tiled_lws_sweeps' lane_fold): pack
        # n batch groups side by side in the LANE axis, cutting the
        # 128-lane tile padding per vector op (F=257: 12 padded tiles for
        # 4 groups -> 9 folded; serving kernel 1016 -> 1065 audio-s/s,
        # library default 782 -> 931, PERF.md round-5). Bit-neutral
        # throughput knob like pack/window_carry. "auto" (default) lets
        # the launch planner explore folds 4 -> 1 and take the deepest
        # fitting one; an int pins the maximum (still divisor-clamped to
        # the group count). Requires the plain jacobi update to engage.
        if pallas_fold == "auto":
            self.pallas_fold = "auto"
            fold_max = 4
        else:
            self.pallas_fold = int(pallas_fold)
            if self.pallas_fold < 1:
                raise ValueError("pallas_fold must be >= 1 or 'auto'")
            fold_max = self.pallas_fold
            if fold_max > 1 and self.pallas_tap_chunks > 1:
                raise ValueError(
                    "pallas_fold > 1 requires pallas_tap_chunks == 1 (the "
                    "chunked tap paths index unfolded lane coordinates)")
        self._fold_max = fold_max if self.pallas_tap_chunks == 1 else 1
        self.auto_segment = bool(auto_segment)
        if dtype is not None and jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
            dtype = jnp.float64 if jnp.dtype(dtype) == jnp.complex128 else jnp.float32
        self.rdtype = jnp.dtype(dtype) if dtype is not None else _default_real_dtype()

        Qint, Qfloat = overlap_factor(self.fsize, self.fshift)
        self.Q = Qint if self.fsize % self.fshift == 0 else Qfloat
        self._Qi = Qint
        if self.inner_scheme is None:
            # Low-overlap stencils (Q <= 3) are the order-sensitive cases
            # where in-frame Jacobi loses ~1 dB vs the reference's in-frame
            # raster Gauss-Seidel; red-black x3 rounds restores (and for Q=2
            # beats) the reference's information flow (QUALITY.md).
            self.inner_scheme = "color2x3" if Qint <= 3 else "jacobi"
        # in-frame passes: explicit value applies to every stage (legacy
        # behaviour); the default resolves per stage. Bench-scale anchoring
        # vs the float64 oracle (QUALITY.md) showed plain in-frame Jacobi
        # losing up to 1.6 dB to the reference's in-frame raster order at
        # Q=4 on long (T~600+) spectrograms — three same-frame re-passes
        # close the gap and beat the reference by ~2 dB mean at ~10-15%
        # cost, so they are the batch-stage default for jacobi-scheme
        # configs. Q=8 measures no gap (cross-frame taps dominate), and the
        # color schemes already carry their own in-frame flow.
        # folding only supports the plain jacobi update (the color schemes
        # index lane parity in unfolded bin coordinates)
        self._fold_eff = (self._fold_max
                          if self.inner_scheme == "jacobi" else 1)
        self.inner_passes = (1 if self._inner_passes_arg is None
                             else int(self._inner_passes_arg))
        if self._inner_passes_arg is None and self.inner_scheme == "jacobi" \
                and 4 <= Qint <= 7:
            self.batch_inner_passes = 3
        else:
            self.batch_inner_passes = self.inner_passes

        if mode == "speech":
            nofuture_iterations = 0
            online_iterations = 0
        elif mode == "music":
            nofuture_iterations = 1
            online_iterations = 10

        self.batch_iterations = batch_iterations
        self.batch_alpha, self.batch_beta, self.batch_gamma = batch_alpha, batch_beta, batch_gamma
        self.online_iterations = online_iterations
        self.online_alpha, self.online_beta, self.online_gamma = online_alpha, online_beta, online_gamma
        self.nofuture_iterations = nofuture_iterations
        self.nofuture_alpha, self.nofuture_beta, self.nofuture_gamma = (
            nofuture_alpha, nofuture_beta, nofuture_gamma)

        # weight tensors (host, float64), reference-identical layout
        self.W = create_weights(self.awin, self.swin, self.fshift, self.L, use_simplifications)
        self.win_ai, self.win_af = build_asymmetric_windows(self.awin * self.swin, self.fshift)
        self.W_ai = create_weights(self.win_ai, self.swin, self.fshift, self.L, use_simplifications)
        self.W_af = create_weights(self.win_af, self.swin, self.fshift, self.L, use_simplifications)

        # expanded stencil tensors (device) for every visibility the pipeline needs
        nreal = self.fftsize // 2 + 1
        Q = self._Qi
        wst = build_stencil(self.W, nreal)
        wst_ai = build_stencil(self.W_ai, nreal)
        wst_af = build_stencil(self.W_af, nreal)
        self._st_batch = make_stencil(wst, Q, self.L, v=Q - 1, dtype=self.rdtype)
        self._st_nofuture = make_stencil(wst_ai, Q, self.L, v=-1, dtype=self.rdtype)
        self._st_af = make_stencil(wst_af, Q, self.L, v=0, dtype=self.rdtype)
        self._st_la = [
            make_stencil(wst, Q, self.L, v=min(d, Q - 1), dtype=self.rdtype)
            for d in range(1, self.look_ahead + 1)
        ]

        self._batch_xla = jax.jit(functools.partial(
            lws_sweeps, st=self._st_batch, order=self.order,
            inner_passes=self.batch_inner_passes,
            inner_scheme=self.inner_scheme, precision=self.precision))
        self._nofuture_xla = jax.jit(
            functools.partial(lws_sweeps, st=self._st_nofuture,
                              order=self.order, precision=self.precision))
        self._online_xla = jax.jit(functools.partial(
            rtisi_la, st_la=self._st_la, st_ai=self._st_nofuture, st_af=self._st_af,
            inner_passes=self.inner_passes, inner_scheme=self.inner_scheme))
        # the online kernel streams state through a VMEM register window, so
        # any T*F fits; only the 2+LA weight sets are VMEM-resident. Batch
        # defaults to pack=16 (+12% measured, PERF.md); online keeps 8 (its
        # per-frame iteration loop is deeper, VMEM window scales with pack)
        self._online_pack = min(8, self.pallas_pack)
        self._online_packed = jax.jit(functools.partial(
            packed_rtisi_la, st_la=self._st_la, st_ai=self._st_nofuture,
            st_af=self._st_af, pack=self._online_pack,
            inner_scheme=self.inner_scheme))
        # pack is a call-time static arg: _eff_pack downshifts 16 -> 8 for
        # geometries whose wide-pack fixed VMEM costs leave no useful tile
        # (e.g. F=1025 at Q=8) instead of losing the Pallas path entirely
        self._batch_tiled = jax.jit(functools.partial(
            tiled_lws_sweeps, st=self._st_batch, micro=self.pallas_micro,
            inner_passes=self.batch_inner_passes,
            inner_scheme=self.inner_scheme, storage=self.pallas_storage,
            frame_unroll=self.pallas_unroll,
            tap_chunks=self.pallas_tap_chunks),
            static_argnames=("pack", "window_carry", "lane_fold"))
        self._nofuture_tiled = jax.jit(functools.partial(
            tiled_lws_sweeps, st=self._st_nofuture, micro=self.pallas_micro,
            storage=self.pallas_storage, frame_unroll=self.pallas_unroll,
            tap_chunks=self.pallas_tap_chunks),
            static_argnames=("pack", "window_carry", "lane_fold"))
        self._batch_seg = jax.jit(functools.partial(
            segmented_lws_sweeps, st=self._st_batch, micro=self.pallas_micro,
            inner_passes=self.batch_inner_passes,
            inner_scheme=self.inner_scheme, storage=self.pallas_storage,
            frame_unroll=self.pallas_unroll,
            tap_chunks=self.pallas_tap_chunks),
            static_argnames=("segments", "sweeps_per_exchange", "pack",
                             "window_carry"))
        self._nofuture_seg = jax.jit(functools.partial(
            segmented_lws_sweeps, st=self._st_nofuture, micro=self.pallas_micro,
            storage=self.pallas_storage, frame_unroll=self.pallas_unroll,
            tap_chunks=self.pallas_tap_chunks),
            static_argnames=("segments", "sweeps_per_exchange", "pack",
                             "window_carry"))

    def _pallas_base_ok(self):
        """Stage-independent Pallas preconditions: TPU backend, float32
        planes, reference-like "gs" order, Q <= ops.pallas_packed.MAX_Q."""
        from .ops.pallas_packed import MAX_Q
        return (self.backend != "xla"
                and jax.default_backend() == "tpu"
                and self.rdtype == jnp.float32
                and self.order == "gs"
                and self._Qi <= MAX_Q)

    def _window_modes(self):
        """Window-carry candidates in preference order. An explicit
        pallas_window pins the mode. The None default prefers "direct"
        (frequency-pre-extended scratch rows, no carried register window):
        measured faster than the carried modes at every probed geometry —
        Q=2 +0..26%, Q=4 +6..15%, Q=8 +44% (PERF.md round-4 levers) — and
        its simpler IR compiles 10-20x faster. Carried "stack" stays as the
        fallback and as the preferred mode when it preserves precision or
        tap_chunks > 1 requires it (nothing to chunk in direct mode).
        bf16 storage also prefers direct: the carried-window-keeps-f32
        precision argument was measured dead on the vocoder config
        (direct+bf16 16.65 dB vs stack+bf16 16.58, and 250 vs ~164
        audio-s/s — PERF.md round-4 levers)."""
        if self.pallas_window is not None:
            return (self.pallas_window,)
        if self.pallas_tap_chunks > 1:
            return ("stack",)
        return ("direct", "stack")

    def _pack_ladder(self):
        """Sublane-pack candidates: halving ladder from the configured pack
        down to the 8-row physical minimum (32 -> 32, 16, 8), so a wide
        default still finds the largest pack each geometry fits.

        Full frame unroll caps the ladder at 16: the unrolled straight-line
        body inflates Mosaic's scoped stack beyond the unroll=1-calibrated
        VMEM model (rows+unroll at p32/F=257 measured 17.44M demand vs the
        16M limit on-chip), and p16 is where the serving mode was measured
        (PERF.md)."""
        p = self.pallas_pack
        if self.pallas_unroll != 1:
            p = min(p, 16)
        if p <= 8:
            return (p,)
        ladder = []
        while p > 8:
            ladder.append(p)
            p //= 2
        ladder.append(8)
        return tuple(ladder)

    def _fold_candidates(self):
        """Lane-fold ladder, deepest first. A deeper fold always issues
        fewer padded lane tiles per utterance (ceil(W_f/128)/(8f) is
        decreasing in f), so the planner prefers the deepest fold the
        geometry and VMEM admit; "auto" caps exploration at 4 (measured
        sweet spot at narrow F; wider folds grow compile/VMEM risk for
        diminishing tile savings, PERF.md round-5)."""
        if self._fold_eff <= 1:
            return (1,)
        return tuple(range(self._fold_eff, 0, -1))

    def _plan_tiled(self, pair):
        """(pack, segments, window_carry, lane_fold) launch plan for the
        tiled batch/no-future kernel, or None when nothing fits.

        The VMEM fit is evaluated at the POST-segmentation effective batch
        (auto-segmentation multiplies the virtual utterance count, which can
        raise the kernel's internal sublane pack past what the unsegmented
        batch would use), so the gate and the launched kernel always agree.
        Candidate order: deepest lane fold first (fewest padded lane tiles
        per utterance — the dominant issue cost); within a fold, the
        configured pack's halving ladder, every window-carry candidate,
        and segmentation halved until the fit holds (folded candidates are
        plain-kernel only; a foldable batch never triggers segmentation —
        it fills the sublanes by construction). Packs, segments, folds and
        the carry representation are purely throughput knobs (bit-identical
        semantics, PERF.md), so downshifting preserves results."""
        from .ops.pallas_packed import (effective_fold, fold_tile_saving,
                                        tiled_supported)
        F = pair[0].shape[-1]
        T = pair[0].shape[-2]
        B = int(np.prod(pair[0].shape[:-2])) if pair[0].ndim > 2 else 1
        isz = (self.pallas_storage or jnp.dtype(self.rdtype)).itemsize
        for f_try in self._fold_candidates():
            for p in self._pack_ladder():
                # only packs whose group count realises exactly this fold;
                # shallower folds get their turn later in the ladder
                if effective_fold(B, p, f_try) != f_try:
                    continue
                for w in self._window_modes():
                    if f_try > 1 and self.pallas_fold == "auto":
                        # "auto" engages a fold only when its padded-tile
                        # saving clears the measured profitability line
                        # (on-chip A/B, PERF.md round-5): direct wins from
                        # ~17% (F=257 fold 2: +11%) while the carried modes
                        # need ~20%+ (F=257 fold 2 rows+unroll: -6%, fold 4
                        # at 25%: +5%); F=1025's 5.6% measured a net loss
                        need = 0.16 if w == "direct" else 0.20
                        if fold_tile_saving(F, self.L, f_try) < need:
                            continue
                    S = 1 if f_try > 1 else self._auto_segments(B, T, p)
                    while S >= 1:
                        if tiled_supported(F, self._Qi, self.L, pack=p,
                                           micro=self.pallas_micro, B=B * S,
                                           itemsize=isz,
                                           tap_chunks=self.pallas_tap_chunks,
                                           window_carry=w, lane_fold=f_try):
                            return p, S, w, f_try
                        S //= 2
        return None

    def _eff_pack(self, pair):
        """Largest workable sublane pack for this call's geometry (the pack
        component of `_plan_tiled`), or None when the tiled kernel cannot
        run it at all."""
        plan = self._plan_tiled(pair)
        return None if plan is None else plan[0]

    def _use_pallas(self, pair):
        """Whether the batch/no-future Pallas kernels apply to this call.

        micro > 1 (blocked updates) is a CPU/interpret research knob: its
        unaligned dynamic-sublane stores do not compile under Mosaic for
        micro >= 8, and micro=4 measures no faster than the exact-order
        register window (PERF.md) - on TPU only micro=1 routes to Pallas.
        """
        ok = (self._pallas_base_ok() and self.pallas_micro == 1
              and self._plan_tiled(pair) is not None)
        if self.backend == "pallas" and not ok:
            raise ValueError("pallas backend requested but unsupported for this config")
        return ok

    def _online_ok(self, pair):
        """Whether the streaming online kernel's weight sets fit VMEM."""
        F = pair[0].shape[-1]
        return online_supported(F, self._Qi, self.L, self.look_ahead,
                                self._online_pack)

    def _xla_fallback(self, fn, sr, si, thresholds, st=None, halo=None,
                      mean_amp=None):
        """On TPU, the frame-sequential XLA scan compiles pathologically; when
        the Pallas kernels do not apply (e.g. Q > 9) and the user did not
        explicitly ask for the XLA backend, fall back to Jacobi sweeps with a
        warning — in the MXU banded-matmul form at precision="highest",
        which is elementwise-Jacobi-exact and measured 1.8x faster than the
        elementwise form on the bench batch config (341 vs 191 audio-s/s,
        PERF.md). Only cheap at moderate F: band FLOP inflation grows with
        F, so wide-F geometries keep the elementwise form. An explicit
        backend="xla" is always honoured."""
        if (jax.default_backend() == "tpu" and self.order == "gs"
                and self.backend != "xla"):
            warnings.warn(
                "lws_tpu: the Pallas kernels do not support this configuration; "
                "using Jacobi-order sweeps on TPU. Expect consistency within "
                "~1.5 dB of the exact Gauss-Seidel order at equal iteration "
                "counts (above or below depending on material — QUALITY.md; "
                "tests/test_oracle.py pins a Q=32 geometry within 1.5 dB of "
                "the float64 oracle). Pass backend='xla' to force the exact "
                "frame-sequential scan, or run off-TPU for the exact order.")
            F = sr.shape[-1]
            if F <= 1100:
                jfn = jax.jit(functools.partial(
                    lws_sweeps, st=st, order="jacobi_mxu",
                    precision="highest"))
            else:
                jfn = jax.jit(functools.partial(lws_sweeps, st=st,
                                                order="jacobi"))
            fn = jfn
        kw = {}
        if halo is not None:
            kw["halo"] = halo
        if mean_amp is not None:
            kw["mean_amp"] = mean_amp
        return fn(sr, si, thresholds=thresholds, **kw)

    def _auto_segments(self, B, T, pack=None):
        """Time segments for long, sublane-underfilled workloads.

        A single 10-min spectrogram runs the tiled kernel at 1/pack sublane
        utilisation; splitting time into S virtual utterances with per-sweep
        halo exchange recovers full width (6x measured on the long-form
        config, PERF.md) at quality parity. Only kicks in when the batch
        leaves the pack underfilled AND segments stay >= 2048 frames, so
        ordinary workloads keep the exact unsegmented order."""
        if not self.auto_segment:
            return 1
        free = (pack or self.pallas_pack) // max(1, B)
        if free < 2:
            return 1
        # S capped at 8: one full sublane tile per segment group; S=16
        # shrinks the VMEM time-tiles enough to lose the gain (PERF.md)
        return max(1, min(free, 8, T // 2048))

    # macro time-chunking: beyond this frame count a single launch's slab
    # prep exceeds HBM (the 2-hour 48 kHz longform, T=337k, measured OOM
    # while the 1-hour T=169k fits) — process in ~150k-frame chunks with
    # REAL-neighbour frozen halos and the whole-signal threshold scale, so
    # a seam behaves exactly like a segmented-kernel seam with zero
    # exchanges (quality-equivalent; gated on auto_segment)
    # chunk sizing: at F=2049 the caller's input pair + the output pair
    # already pin ~10 GB of the 16 GB HBM, so each chunk's launch
    # transients (slab prep chains) must stay well under the remainder —
    # 60k frames ≈ 4 GB transient measured headroom
    # threshold: a 1-hour/F=2049 single shot (T=169k) fits only when the
    # caller holds nothing else — macro-chunk from 150k so real pipelines
    # (input + output + user buffers live) keep HBM headroom
    _MACRO_T = 150_000
    _MACRO_CHUNK = 60_000

    def _macro_sweeps(self, sr, si, thresholds, tiled, seg, xla, st):
        """Sequential macro-chunked sweeps for arbitrarily long T."""
        shape = sr.shape
        if sr.ndim == 2:
            sr, si = sr[None], si[None]
        elif sr.ndim > 3:
            sr = sr.reshape((-1,) + shape[-2:])
            si = si.reshape((-1,) + shape[-2:])
        B, T, F = sr.shape
        Q1 = self._Qi - 1
        n = -(-T // self._MACRO_CHUNK)
        bounds = [round(i * T / n) for i in range(n + 1)]
        mean = jnp.mean(jnp.sqrt(sr * sr + si * si), axis=(-2, -1))

        def edge_rows(x, lo, hi, edge):
            # rows [lo, hi) clamped to [0, T), padded with the edge-frame
            # replica where they fall outside (reference edge semantics)
            part = x[:, max(lo, 0):min(hi, T)]
            miss = (hi - lo) - part.shape[1]
            if miss:
                pad = jnp.tile(x[:, edge:edge + 1], (1, miss, 1))
                part = (jnp.concatenate([pad, part], axis=1) if lo < 0
                        else jnp.concatenate([part, pad], axis=1))
            return part

        outs_r, outs_i = [], []
        for i in range(n):
            a, b = bounds[i], bounds[i + 1]
            halo = (edge_rows(sr, a - Q1, a, 0), edge_rows(si, a - Q1, a, 0),
                    edge_rows(sr, b, b + Q1, T - 1),
                    edge_rows(si, b, b + Q1, T - 1))
            o_r, o_i = self._sweep_fn(sr[:, a:b], si[:, a:b], thresholds,
                                      tiled, seg, xla, st, halo=halo,
                                      mean_amp=mean)
            outs_r.append(o_r)
            outs_i.append(o_i)
        osr = jnp.concatenate(outs_r, axis=1)
        osi = jnp.concatenate(outs_i, axis=1)
        return osr.reshape(shape), osi.reshape(shape)

    def _sweep_fn(self, sr, si, thresholds, tiled, seg, xla, st,
                  halo=None, mean_amp=None):
        """Shared batch/no-future dispatch: one `_plan_tiled` evaluation
        picks the kernel variant (segmented when the plan says the batch
        underfills the sublanes, plain tiled otherwise), with the XLA
        fallback behind it. T past _MACRO_T takes the macro-chunked path
        (bounded HBM at any length)."""
        if (halo is None and self.auto_segment
                and sr.shape[-2] > self._MACRO_T):
            # any backend: the XLA paths honour the frozen-halo/mean
            # contract too (core/batch.lws_sweeps), so macro chunking keeps
            # HBM bounded wherever the sweeps run
            return self._macro_sweeps(sr, si, thresholds, tiled, seg, xla,
                                      st)
        plan = None
        if self._pallas_base_ok() and self.pallas_micro == 1:
            plan = self._plan_tiled((sr, si))
        if self.backend == "pallas" and plan is None:
            raise ValueError("pallas backend requested but unsupported for this config")
        if plan is not None:
            extra = {}
            if halo is not None:
                extra["halo"] = halo
            if mean_amp is not None:
                extra["mean_amp"] = mean_amp
            pk, S, w, fe = plan
            if S > 1:
                # 10 sweeps per halo exchange: measured quality-equivalent
                # on the longform config (10.95 vs 10.96 dB at 4) and
                # another +5% over the round-3 cadence of 4, which was
                # already ~20% over per-sweep exchange (PERF.md)
                fn = functools.partial(seg, segments=S,
                                       sweeps_per_exchange=10, pack=pk,
                                       window_carry=w, **extra)
                return self._run_flat(fn, sr, si, thresholds)
            # the time-tiled kernel streams state through VMEM, so the wide
            # pack fits regardless of T (a single tile when T is small)
            return self._run_flat(
                functools.partial(tiled, pack=pk, window_carry=w,
                                  lane_fold=fe, **extra),
                sr, si, thresholds)
        return self._xla_fallback(xla, sr, si, thresholds, st=st, halo=halo,
                                  mean_amp=mean_amp)

    def _batch_fn(self, sr, si, thresholds):
        return self._sweep_fn(sr, si, thresholds, self._batch_tiled,
                              self._batch_seg, self._batch_xla, self._st_batch)

    def _nofuture_fn(self, sr, si, thresholds):
        return self._sweep_fn(sr, si, thresholds, self._nofuture_tiled,
                              self._nofuture_seg, self._nofuture_xla,
                              self._st_nofuture)

    def _online_fn(self, sr, si, thresholds):
        # the online kernel has its OWN fit gate (its register window scales
        # with 2+LA weight sets, not the batch kernel's time tiles): gating
        # it on the tiled-kernel plan would regress valid online geometries
        # (e.g. F=2049/Q=8, where the tiled kernel does not fit but the
        # streaming online kernel does) to the frame-sequential XLA scan
        ok = (self._pallas_base_ok() and self.look_ahead <= 8
              and self._online_ok((sr, si)))
        if self.backend == "pallas" and not ok:
            raise ValueError(
                "pallas backend requested but unsupported for the online stage")
        if ok:
            return self._run_flat(self._online_packed, sr, si, thresholds)
        if jax.default_backend() == "tpu" and self.backend != "xla":
            # unlike batch/no-future there is no Jacobi-order escape hatch:
            # RTISI-LA's frame-commit pipeline is inherently sequential, so
            # the only fallback is the frame-scan — warn about the compile
            warnings.warn(
                "lws_tpu: the streaming online kernel does not support this "
                "configuration (weight sets exceed VMEM or look_ahead > 8); "
                "falling back to the frame-sequential XLA scan, which can "
                "compile very slowly on TPU")
        return self._online_xla(sr, si, thresholds=thresholds)

    @staticmethod
    def _run_flat(fn, sr, si, thresholds):
        """Collapse extra leading batch dims to the kernel's (B, T, F)."""
        shape = sr.shape
        if sr.ndim > 3:
            flat = (-1,) + shape[-2:]
            osr, osi = fn(sr.reshape(flat), si.reshape(flat), thresholds=thresholds)
            return osr.reshape(shape), osi.reshape(shape)
        return fn(sr, si, thresholds=thresholds)

    # ---------------- analysis / synthesis ----------------

    def stft(self, x, framepadding=False):
        """STFT -> host complex array (reference-compatible; framepadding
        mirrors matlab/stft.m:43-46)."""
        return _stft.stft(x, self.fsize, self.fshift, self.awin,
                          fftsize=self.fftsize, perfectrec=self.perfectrec,
                          framepadding=framepadding)

    def stft_ri(self, x, framepadding=False):
        """STFT -> (sr, si) device pair (zero-copy pipeline path)."""
        return _stft.stft_ri(x, self.fsize, self.fshift, self.awin,
                             fftsize=self.fftsize, perfectrec=self.perfectrec,
                             framepadding=framepadding)

    def istft(self, S):
        # swin is already normalised for perfect reconstruction at construction
        sr, si = self._as_pair(S)
        return _stft.istft_ri(sr, si, self.fshift, self.swin,
                              fftsize=self.fftsize, perfectrec=self.perfectrec)

    def get_consistency(self, S):
        sr, si = self._as_pair(S)
        return _stft.get_consistency_ri(sr, si, self.fsize, self.fshift,
                                        self.awin, self.swin,
                                        fftsize=self.fftsize, perfectrec=self.perfectrec)

    # ---------------- phase recovery schedules ----------------

    def _as_pair(self, S):
        if self._is_pair(S):
            pair = (jnp.asarray(S[0], dtype=self.rdtype),
                    jnp.asarray(S[1], dtype=self.rdtype))
        else:
            pair = split(np.asarray(S), dtype=self.rdtype)
        if pair[0].shape[-1] % 2 == 0:
            raise ValueError(
                "Please only include non-negative frequencies in the input spectrogram.")
        return pair

    @staticmethod
    def _is_pair(S):
        return isinstance(S, (tuple, list)) and len(S) == 2

    def _ret(self, pair, was_pair):
        return pair if was_pair else merge(*pair)

    def _thr(self, iterations, alpha, beta, gamma, thresholds):
        if thresholds is None:
            thresholds = get_thresholds(iterations, alpha, beta, gamma)
        return jnp.asarray(np.asarray(thresholds, dtype=np.float64), dtype=self.rdtype)

    def nofuture_lws(self, S, iterations=None, thresholds=None):
        """No-future initialisation pass (strictly-past stencil, W_ai weights)."""
        if iterations is None:
            iterations = self.nofuture_iterations
        thr = self._thr(iterations, self.nofuture_alpha, self.nofuture_beta,
                        self.nofuture_gamma, thresholds)
        was_pair = self._is_pair(S)
        pair = self._as_pair(S)
        if thr.shape[0]:
            pair = self._nofuture_fn(*pair, thresholds=thr)
        return self._ret(pair, was_pair)

    def online_lws(self, S, iterations=None, thresholds=None):
        """Online (TF-RTISI-LA) sliding-commit pass."""
        if iterations is None:
            iterations = self.online_iterations
        thr = self._thr(iterations, self.online_alpha, self.online_beta,
                        self.online_gamma, thresholds)
        was_pair = self._is_pair(S)
        pair = self._as_pair(S)
        if thr.shape[0]:
            pair = self._online_fn(*pair, thresholds=thr)
        return self._ret(pair, was_pair)

    def _sharded_pack(self, pair, n_time):
        """Workable (pack, window_carry) for the per-shard geometry of a
        time-sharded call, or None when the tiled kernel cannot run it
        (same candidate order as `_plan_tiled`, without segmentation)."""
        from .ops.pallas_packed import tiled_supported
        F = pair[0].shape[-1]
        B = int(np.prod(pair[0].shape[:-2])) if pair[0].ndim > 2 else 1
        isz = (self.pallas_storage or jnp.dtype(self.rdtype)).itemsize
        for p in self._pack_ladder():
            for w in self._window_modes():
                if tiled_supported(F, self._Qi, self.L, pack=p,
                                   micro=self.pallas_micro, B=B, itemsize=isz,
                                   tap_chunks=self.pallas_tap_chunks,
                                   window_carry=w):
                    return p, w
        return None

    def batch_lws(self, S, iterations=None, thresholds=None, mesh=None,
                  kernel=None, sweeps_per_exchange=1):
        """Full batch LWS sweeps.

        With `mesh` (a ('data','time') jax Mesh), long spectrograms run
        time-sharded with per-round halo exchange - the long-form multi-host
        path (see lws_tpu.parallel). `kernel` picks the per-shard sweep
        implementation: None (default) auto-selects the TPU-fast Pallas
        tiled kernel when it applies (same gates as the unsharded path) and
        the portable XLA scan otherwise; "tiled"/"xla" force one.
        `sweeps_per_exchange` trades halo traffic for cross-shard staleness.
        """
        if iterations is None:
            iterations = self.batch_iterations
        thr = self._thr(iterations, self.batch_alpha, self.batch_beta,
                        self.batch_gamma, thresholds)
        was_pair = self._is_pair(S)
        pair = self._as_pair(S)
        if thr.shape[0]:
            if mesh is not None:
                from .parallel import shard_pair, sharded_lws_sweeps
                pair = shard_pair(pair, mesh, time_sharded=True)
                n_time = mesh.shape["time"]
                shard_plan = self._sharded_pack(pair, n_time)
                if kernel is None:
                    tiled_ok = (self._pallas_base_ok()
                                and self.pallas_micro == 1
                                and shard_plan is not None)
                    kernel = "tiled" if tiled_ok else "xla"
                kw = {}
                if kernel == "tiled":
                    if shard_plan is None:
                        raise ValueError(
                            "tiled kernel cannot run this sharded geometry")
                    # pass the planned kernel variant through so the sharded
                    # path runs exactly what _sharded_pack's VMEM gate
                    # approved (pack, window carry and the configured knobs)
                    kw = dict(pack=shard_plan[0],
                              interpret=jax.default_backend() != "tpu",
                              storage=self.pallas_storage,
                              frame_unroll=self.pallas_unroll,
                              window_carry=shard_plan[1],
                              tap_chunks=self.pallas_tap_chunks)
                pair = sharded_lws_sweeps(
                    *pair, st=self._st_batch, thresholds=thr, mesh=mesh,
                    order=self.order,
                    inner_passes=self.batch_inner_passes,
                    inner_scheme=self.inner_scheme, kernel=kernel,
                    sweeps_per_exchange=int(sweeps_per_exchange), **kw)
            else:
                pair = self._batch_fn(*pair, thresholds=thr)
        return self._ret(pair, was_pair)

    def run_lws(self, S):
        """The 3-stage pipeline: no-future -> online -> batch (python/lws.pyx:495-499).

        Stays on device between stages (the reference re-extends and
        re-extracts the spectrogram around every stage,
        python/lws.pyx:256/288/355; here the split pair never leaves HBM).
        """
        was_pair = self._is_pair(S)
        pair = self._as_pair(S)
        pair = self.nofuture_lws(pair)
        pair = self.online_lws(pair)
        pair = self.batch_lws(pair)
        return self._ret(pair, was_pair)


# lowercase alias for drop-in compatibility with `lws.lws(...)`
lws = LWS
