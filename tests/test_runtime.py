import numpy as np
import pytest

from audio2face_tpu.runtime import (
    Prefetcher,
    fragment_batch_i16,
    gather_rows_f32,
    native_available,
)
from audio2face_tpu.runtime.hostloader import _build, _LIB_PATH


def test_native_library_builds():
    """The C++ host loader must compile in this image (g++ is baked in)."""
    assert native_available(), "native hostloader failed to build/load"


def _numpy_fragment(audio, starts, window):
    idx = starts[:, None] + np.arange(window)[None, :]
    valid = (idx >= 0) & (idx < len(audio))
    out = np.where(valid, audio[np.clip(idx, 0, len(audio) - 1)], 0)
    return (out / 32768.0).astype(np.float32)


def test_fragment_batch_matches_numpy():
    rng = np.random.default_rng(0)
    audio = rng.integers(-32768, 32767, 50000).astype(np.int16)
    starts = np.asarray([-5720, 0, 1000, 44000, 49999, 60000], np.int64)
    native = fragment_batch_i16(audio, starts, 11440)
    ref = _numpy_fragment(audio, starts, 11440)
    np.testing.assert_array_equal(native, ref)


def test_fragment_matches_reference_fragmenter():
    """Native gather == the reference get_audio_fragment semantics
    (vocaset.py:408-430) after normalization."""
    from audio2face_tpu.data.vocaset import get_audio_fragment, normalize_audio

    rng = np.random.default_rng(1)
    audio = rng.integers(-1000, 1000, 44000).astype(np.int16)
    sr, n_pad = 22000, int(22000 * 0.52 / 2)
    for idx, shift in [(0, 0), (30, 250), (90, -500)]:
        ref = normalize_audio(get_audio_fragment(audio, idx, sample_rate=sr, shift=shift))
        start = idx * sr // 60 - n_pad - shift
        native = fragment_batch_i16(audio, np.asarray([start], np.int64), 2 * n_pad)[0]
        np.testing.assert_allclose(native, ref, atol=1e-7)


def test_gather_rows():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(100, 7, 3)).astype(np.float32)
    idx = np.asarray([3, 99, 0, 3], np.int64)
    out = gather_rows_f32(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    # non-f32 source falls back cleanly
    out64 = gather_rows_f32(src.astype(np.float64), idx)
    np.testing.assert_allclose(out64, src[idx], rtol=1e-6)


def test_prefetcher_order_and_errors():
    items = list(range(20))
    out = list(Prefetcher(iter(items), transform=lambda x: x * 2))
    assert out == [x * 2 for x in items]

    def bad():
        yield 1
        raise RuntimeError("boom")

    p = Prefetcher(bad())
    assert next(p) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(p)
