"""Streaming online LWS vs the offline RTISI-LA scan."""
import numpy as np
import pytest

import jax.numpy as jnp

from lws_tpu import LWS
from lws_tpu.streaming import StreamingLWS


def _padded_signal(proc, x):
    """Apply the perfectrec pre-padding so stream frames align with proc.stft."""
    fsize, fshift = proc.fsize, proc.fshift
    residual = fsize % fshift
    pre = fsize - fshift if residual == 0 else fsize - residual
    post = 0 if len(x) % fshift == 0 else fshift - len(x) % fshift
    return np.concatenate([np.zeros(pre), x, np.zeros(post)])


def test_streaming_matches_offline_online(golden_q4):
    """With a fixed mean_amp, committed frames == the offline online_lws
    output rows (the stream window reproduces the scan state exactly)."""
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=4)
    x = np.asarray(g.x)
    xp = _padded_signal(proc, x)

    S = proc.stft(x)  # perfectrec=True -> frames at 0, fshift, ... of xp
    A = np.abs(S).astype(np.complex128)
    mean_amp = float(np.mean(np.abs(A)))
    offline = np.asarray(proc.online_lws(A))

    stream = StreamingLWS(proc, iterations=4, mean_amp=mean_amp, keep_frames=True)
    # stream the magnitude frames directly (vocoder-style frame input)
    for i in range(A.shape[0]):
        stream.push_frame(np.abs(S[i]))

    committed = np.stack(stream.committed_frames)
    n = committed.shape[0]  # frames 0 .. T-LA-1
    # separate jit programs -> different fusion/rounding; state evolution is
    # identical (>99% bitwise agreement, rest at ~1e-5 relative)
    np.testing.assert_allclose(committed, offline[:n], rtol=1e-3, atol=1e-3)
    close = np.isclose(committed, offline[:n], rtol=1e-6, atol=1e-8)
    assert close.mean() > 0.97, close.mean()


def test_push_block_matches_push(golden_q4):
    """push_block (one scan dispatch per chunk) produces the same audio as
    sample-by-sample push: the block step is the same per-frame step under
    lax.scan, so state evolution is identical."""
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=4)
    x = np.asarray(g.x)
    xp = _padded_signal(proc, x)

    a = StreamingLWS(proc, iterations=4)
    out_a = [a.push(xp)]
    out_a.append(a.flush())
    ya = np.concatenate(out_a)

    b = StreamingLWS(proc, iterations=4)
    out_b = []
    for i in range(0, len(xp), 4000):
        out_b.append(b.push_block(xp[i:i + 4000]))
    out_b.append(b.flush())
    yb = np.concatenate(out_b)

    assert ya.shape == yb.shape
    # separate jit programs (standalone step vs scan-of-step) fuse/round
    # differently; agreement is at fp-noise level
    np.testing.assert_allclose(ya, yb, rtol=1e-4, atol=1e-6)


def test_push_block_batched_streams(golden_q4):
    """push_block with streams>1 stays consistent with single-stream runs."""
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=3)
    x = np.asarray(g.x)
    xp = _padded_signal(proc, x)
    X = np.stack([xp, 0.5 * xp])

    s2 = StreamingLWS(proc, iterations=3, streams=2)
    y2 = np.concatenate([s2.push_block(X), s2.flush()], axis=-1)

    s1 = StreamingLWS(proc, iterations=3)
    y1 = np.concatenate([s1.push_block(xp), s1.flush()], axis=-1)
    assert y2.shape == (2, y1.shape[0])
    np.testing.assert_allclose(y2[0], y1, rtol=1e-4, atol=1e-6)
    # scale equivariance of the whole pipeline (thresholds are relative)
    np.testing.assert_allclose(y2[1], 0.5 * y1, rtol=1e-4, atol=1e-6)


def test_streaming_audio_end_to_end(golden_q4):
    """Push real audio in ragged chunks; the reconstructed stream should be
    a faithful signal (energy, length) and improve consistency vs zero-phase."""
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=4)
    x = np.asarray(g.x)
    xp = _padded_signal(proc, x)
    stream = StreamingLWS(proc, iterations=4, keep_frames=True)

    rng = np.random.default_rng(0)
    out = []
    i = 0
    while i < len(xp):
        n = int(rng.integers(50, 700))
        out.append(stream.push(xp[i:i + n]))
        i += n
    out.append(stream.flush())
    y = np.concatenate(out)
    assert len(y) > len(xp) - proc.fsize - (stream.LA + 1) * proc.fshift
    # committed spectra form a coherent phase-recovered spectrogram
    committed = np.stack(stream.committed_frames)
    c = float(np.asarray(proc.get_consistency(committed.astype(np.complex128))))
    assert c > 5.0, c  # audio input is already consistent; sanity bound


def test_streaming_latency_accounting(golden_q4):
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64)
    stream = StreamingLWS(proc, iterations=2)
    assert stream.latency_frames == proc.look_ahead + 1
    # no output until fsize + LA*fshift samples arrived
    out = stream.push(np.zeros(proc.fsize - 1))
    assert out.size == 0
    out = stream.push(np.zeros(proc.fshift * proc.look_ahead + 1))
    assert out.size >= 0  # pipeline filling
    stream.reset()
    assert stream._frames_seen == 0


def test_flush_commits_all_content_frames(golden_q4):
    """flush() must commit every frame that contains real samples, with the
    tail frames keeping their offline-final values (frozen drain)."""
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=4)
    x = np.asarray(g.x)
    xp = _padded_signal(proc, x)
    S = proc.stft(x)
    mean_amp = float(np.mean(np.abs(S)))
    offline = np.asarray(proc.online_lws(np.abs(S).astype(np.complex128)))

    stream = StreamingLWS(proc, iterations=4, mean_amp=mean_amp, keep_frames=True)
    for i in range(S.shape[0]):
        stream.push_frame(np.abs(S[i]))
    stream.flush()
    committed = np.stack(stream.committed_frames)
    assert committed.shape[0] == S.shape[0]  # every frame committed
    # the drained tail rows equal the offline extraction (no extra updates)
    np.testing.assert_allclose(committed[-proc.look_ahead:],
                               offline[-proc.look_ahead:], rtol=1e-3, atol=1e-3)


def test_flush_audio_covers_signal(golden_q4):
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=2)
    x = np.asarray(g.x)
    xp = _padded_signal(proc, x)
    stream = StreamingLWS(proc, iterations=2)
    y1 = stream.push(xp)
    y2 = stream.flush()
    y = np.concatenate([y1, y2])
    n_frames = (len(xp) - proc.fsize) // proc.fshift + 1
    # all frames committed -> fshift samples each, plus the OLA tail
    assert len(y) >= n_frames * proc.fshift


def test_batched_streams_match_single(golden_q4):
    """streams=S lockstep == S independent single streams."""
    g = golden_q4
    proc = LWS(int(g.fsize), int(g.fshift), L=int(g.L), dtype=jnp.float64,
               online_iterations=2)
    x = np.asarray(g.x)[:4000]
    xs = np.stack([x, 0.5 * x])
    sb = StreamingLWS(proc, iterations=2, streams=2)
    yb = np.concatenate([sb.push(xs), sb.flush()], axis=-1)
    singles = []
    for i in range(2):
        s1 = StreamingLWS(proc, iterations=2)
        singles.append(np.concatenate([s1.push(xs[i]), s1.flush()]))
    ys = np.stack(singles)
    assert yb.shape == ys.shape
    np.testing.assert_allclose(yb, ys, rtol=1e-6, atol=1e-8)
