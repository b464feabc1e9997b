"""Stage drivers vs reference goldens.

- no-future: the stencil has strictly-past taps only, so frame-sequential
  Gauss-Seidel order is IDENTICAL to the reference raster order -> exact
  float64 parity with the reference general kernel.
- batch/online: same-frame taps make the reference's within-frame bin ordering
  unreproducible in a vectorized sweep; parity is measured as consistency-dB
  quality at equal iteration counts (BASELINE.md criterion).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import lws_tpu
from lws_tpu import LWS, get_thresholds


def _proc(golden, **kw):
    return LWS(int(golden.fsize), int(golden.fshift), L=int(golden.L),
               dtype=jnp.complex128, **kw)


def _is_frac(golden):
    return golden.W.shape[0] != int(golden.Q)


def test_nofuture_exact_vs_reference(golden):
    p = _proc(golden)
    A = jnp.abs(jnp.asarray(golden.S)).astype(jnp.complex128)
    out = p.nofuture_lws(A, thresholds=get_thresholds(1, 1, 0.1, 1))
    ref = golden.nofuture_i1_anyq.astype(np.complex128)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_batch_quality_parity(golden):
    p = _proc(golden)
    A = jnp.abs(jnp.asarray(golden.S)).astype(jnp.complex128)
    out = p.batch_lws(A, thresholds=get_thresholds(100, 100, 0.1, 1))
    c = float(p.get_consistency(out))
    ref_c = float(golden.consistency_batch)
    assert c > ref_c - 0.5, f"batch consistency {c:.2f} dB vs reference {ref_c:.2f} dB"
    # magnitudes are preserved exactly by construction
    np.testing.assert_allclose(np.abs(np.asarray(out)), np.abs(np.asarray(A)),
                               rtol=1e-9, atol=1e-9)


def test_online_quality_parity(golden):
    p = _proc(golden)
    A = jnp.abs(jnp.asarray(golden.S)).astype(jnp.complex128)
    S0 = p.nofuture_lws(A, thresholds=get_thresholds(1, 1, 0.1, 1))
    out = p.online_lws(S0, thresholds=get_thresholds(10, 1, 0.1, 1))
    c = float(p.get_consistency(out))
    ref_c = float(golden.consistency_online)
    assert c > ref_c - 1.0, f"online consistency {c:.2f} dB vs reference {ref_c:.2f} dB"


def test_run_lws_quality_parity(golden):
    p = _proc(golden, nofuture_iterations=1, online_iterations=10)
    A = jnp.abs(jnp.asarray(golden.S)).astype(jnp.complex128)
    out = p.run_lws(A)
    c = float(p.get_consistency(out))
    ref_c = float(golden.consistency_run)
    # per-config gate: the in-frame color scheme (Q <= 3 default) closed the
    # old q2/q3 gap, so every config must sit within 0.4 dB of the reference
    # (iteration noise only); the aggregate test enforces >= 0 on average.
    assert c > ref_c - 0.4, f"run_lws consistency {c:.2f} dB vs reference {ref_c:.2f} dB"


def test_run_lws_beats_reference_on_average():
    """Across all golden configs, mean final consistency matches or beats the
    reference C implementation at equal iteration counts (BASELINE.md)."""
    import glob, os
    deltas = []
    gdir = os.path.join(os.path.dirname(__file__), "golden")
    for path in sorted(glob.glob(os.path.join(gdir, "ref_*.npz"))):
        z = np.load(path)
        p = LWS(int(z["fsize"]), int(z["fshift"]), L=int(z["L"]),
                dtype=jnp.complex128, nofuture_iterations=1, online_iterations=10)
        A = jnp.abs(jnp.asarray(z["S"])).astype(jnp.complex128)
        out = p.run_lws(A)
        deltas.append(float(p.get_consistency(out)) - float(z["consistency_run"]))
    mean_delta = sum(deltas) / len(deltas)
    assert mean_delta > 0.0, f"mean run_lws delta {mean_delta:+.2f} dB ({deltas})"


def test_monotone_consistency(golden_q4):
    """Consistency rises across pipeline stages (the reference's self-check)."""
    g = golden_q4
    p = _proc(g, nofuture_iterations=1, online_iterations=10)
    A = jnp.abs(jnp.asarray(g.S)).astype(jnp.complex128)
    c0 = float(p.get_consistency(A))
    S0 = p.nofuture_lws(A)
    c1 = float(p.get_consistency(S0))
    S1 = p.online_lws(S0)
    c2 = float(p.get_consistency(S1))
    S2 = p.batch_lws(S1)
    c3 = float(p.get_consistency(S2))
    assert c0 < c1 < c2 < c3


def test_batched_pipeline_matches_single(golden_q4):
    g = golden_q4
    p = _proc(g)
    A1 = jnp.abs(jnp.asarray(g.S)).astype(jnp.complex128)
    A = jnp.stack([A1, A1 * 0.5])
    thr = get_thresholds(5, 100, 0.1, 1)
    out_b = p.batch_lws(A, thresholds=thr)
    out_0 = p.batch_lws(A1, thresholds=thr)
    out_1 = p.batch_lws(A1 * 0.5, thresholds=thr)
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(out_1), atol=1e-10)


def test_speech_music_modes(golden_q4):
    g = golden_q4
    sp = _proc(g, mode="speech")
    assert sp.nofuture_iterations == 0 and sp.online_iterations == 0
    mu = _proc(g, mode="music")
    assert mu.nofuture_iterations == 1 and mu.online_iterations == 10


def test_jacobi_order_converges(golden_q4):
    g = golden_q4
    p = _proc(g, order="jacobi")
    A = jnp.abs(jnp.asarray(g.S)).astype(jnp.complex128)
    out = p.batch_lws(A, thresholds=get_thresholds(100, 100, 0.1, 1))
    c = float(p.get_consistency(out))
    assert c > float(g.consistency_A) + 10  # improves substantially


def test_functional_api_matches_class(golden_q4):
    g = golden_q4
    p = _proc(g)
    A = jnp.abs(jnp.asarray(g.S)).astype(jnp.complex128)
    thr = get_thresholds(3, 100, 0.1, 1)
    out_f = lws_tpu.batch_lws(A, p.W, thr)  # same W object -> exact equality
    out_c = p.batch_lws(A, thresholds=thr)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c), atol=1e-12)
    out_nf = lws_tpu.nofuture_lws(A, p.W_ai, get_thresholds(1, 1, 0.1, 1))
    np.testing.assert_allclose(np.asarray(out_nf),
                               np.asarray(p.nofuture_lws(A, iterations=1)), atol=1e-12)
    out_on = lws_tpu.online_lws(A, p.W, p.W_ai, p.W_af, get_thresholds(2, 1, 0.1, 1),
                                LA=3, fshift=int(g.fshift))
    np.testing.assert_allclose(np.asarray(out_on),
                               np.asarray(p.online_lws(A, iterations=2)), atol=1e-12)


def test_zero_iterations_identity(golden_q4):
    g = golden_q4
    p = _proc(g, mode="speech")
    A = jnp.abs(jnp.asarray(g.S)).astype(jnp.complex128)
    np.testing.assert_array_equal(np.asarray(p.nofuture_lws(A)), np.asarray(A))
    np.testing.assert_array_equal(np.asarray(p.online_lws(A)), np.asarray(A))


def test_run_with_metrics(golden_q4):
    from lws_tpu.utils import run_with_metrics
    g = golden_q4
    p = _proc(g, nofuture_iterations=1, online_iterations=2, batch_iterations=5)
    A = jnp.abs(jnp.asarray(g.S)).astype(jnp.complex128)
    out, metrics = run_with_metrics(p, A, sample_rate=16000)
    assert [m.stage for m in metrics] == ["input", "no-future", "online", "batch"]
    assert metrics[-1].consistency_db > metrics[0].consistency_db
    assert all(m.audio_seconds > 0 for m in metrics)
    assert out.shape == A.shape


def test_silence_is_finite_and_silent():
    """Degenerate all-zero spectrograms flow through every schedule without
    NaN/Inf (the phase update keeps old values when |temp| == 0, mirroring
    the reference's abstemp > 0 guard, lwslib.cpp:134) and stay zero."""
    proc = LWS(512, 128, mode="music")
    Z = np.zeros((1, 40, 257), dtype=np.complex128)
    for fn in (proc.run_lws, proc.batch_lws, proc.nofuture_lws, proc.online_lws):
        out = np.asarray(fn(Z))
        assert np.isfinite(out).all()
        assert (out == 0).all()
    assert np.isfinite(np.asarray(proc.istft(Z))).all()


def test_torch_tensor_inputs_interop():
    """PyTorch CPU tensors (the common vocoder input type) flow through the
    public API via numpy coercion: stft on a waveform tensor, batch_lws on
    a magnitude tensor — no explicit conversion required of the user."""
    torch = pytest.importorskip("torch")
    proc = LWS(512, 128)
    t = np.arange(16000) / 16000.0
    x = torch.tensor(0.5 * np.sin(2 * np.pi * 440 * t), dtype=torch.float32)
    X = proc.stft(x)
    assert X.shape[-1] == 257
    mag = torch.abs(torch.tensor(np.asarray(X)))
    out = np.asarray(proc.batch_lws(mag, thresholds=get_thresholds(3, 1, 0.1, 1)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.abs(out), np.abs(np.asarray(X)), atol=1e-4)


def test_macro_chunk_equivalence_full_schedule():
    """End-to-end macro time-chunking numerics (processor._macro_sweeps):
    chunked vs unchunked batch output at the FULL 100-iteration schedule,
    bench-scale T, float64. The chunk seams use REAL-neighbour frozen halos
    plus the whole-signal threshold scale, so a seam behaves like a
    segmented-kernel seam with zero exchanges — measured Δ0.005 dB on the
    on-chip 2-hour run (PERF.md); this pins the same equivalence on the CPU
    XLA path where it runs in CI."""
    p = LWS(512, 128, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    t = np.arange(80000) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 240 * t)
         + 0.3 * np.sin(2 * np.pi * 1128 * t)
         + 0.2 * np.sin(2 * np.pi * (300 + 3000 * t / t[-1]) * t)
         + 0.05 * rng.standard_normal(t.size))
    A = np.abs(np.asarray(p.stft(x))).astype(np.complex128)
    assert A.shape[0] > 600  # bench-scale frame count
    thr = get_thresholds(100, 100, 0.1, 1)
    out_full = np.asarray(p.batch_lws(A, thresholds=thr))

    # chunk at CPU scale: 3 chunks of ~210 frames (the on-chip ratio class)
    p._MACRO_T = 256
    p._MACRO_CHUNK = 256
    out_chunk = np.asarray(p.batch_lws(A, thresholds=thr))
    c_f = float(np.asarray(p.get_consistency(out_full)))
    c_c = float(np.asarray(p.get_consistency(out_chunk)))
    # measured 0.008 dB here (matching the on-chip 0.005 dB, PERF.md)
    assert abs(c_f - c_c) < 0.02, (c_f, c_c)
    # magnitudes are exactly preserved through the chunked path too
    np.testing.assert_allclose(np.abs(out_chunk), np.abs(A), atol=1e-8)
