"""Constructor warning parity with the reference (python/lws.pyx:403-406,
452-454): fftsize zero-padding boundary caveat and non-symmetric analysis
window."""
import warnings

import numpy as np
import pytest

from lws_tpu import LWS


def test_fftsize_padding_warns():
    with pytest.warns(UserWarning, match="perfect reconstruction"):
        p = LWS(384, 96, fftsize=512)
    assert p.fsize == 512  # windows padded


def test_fftsize_equal_does_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        LWS(512, 128, fftsize=512)


def test_asymmetric_window_warns():
    win = np.hanning(256)
    win[:10] *= 0.5  # break the symmetry
    with pytest.warns(UserWarning, match="not symmetric"):
        LWS(np.sqrt(win + 1e-3), 64)


def test_symmetric_window_does_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        LWS(np.sqrt(np.hanning(256) + 1e-3), 64)


def test_asymmetric_window_silent_without_simplifications():
    win = np.hanning(256)
    win[:10] *= 0.5
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        LWS(np.sqrt(win + 1e-3), 64, use_simplifications=False)


def test_direct_with_tap_chunks_rejected():
    with pytest.raises(ValueError, match="tap_chunks"):
        LWS(512, 128, pallas_window="direct", pallas_tap_chunks=2)


def test_bf16_storage_warns_quality_ceiling():
    # PERF.md: bf16 state storage caps achievable consistency near ~22 dB
    with pytest.warns(UserWarning, match="22 dB"):
        LWS(512, 128, pallas_storage="bfloat16")


def test_f32_storage_does_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        LWS(512, 128, pallas_storage="float32")


def test_jacobi_mxu_default_precision_warns_quality_floor():
    # PERF.md: default (bf16-pass) matmul precision floors out ~19 dB
    with pytest.warns(UserWarning, match="19 dB"):
        LWS(512, 128, order="jacobi_mxu")


def test_jacobi_mxu_highest_precision_does_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        LWS(512, 128, order="jacobi_mxu", precision="highest")
