"""mp3 ingestion tests (``data/codecs.py`` + ``read_audio`` dispatch).

Self-contained: the fixture encodes a known tone with the system
libmp3lame (test-only ctypes binding), then the codec under test decodes
it back.  Tolerances are mp3-psychoacoustic, not bit-exact.
"""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from sm_hpss_mtl_tpu.data import codecs
from sm_hpss_mtl_tpu.data.audio import duration_seconds, read_audio, write_wav

pytestmark = pytest.mark.skipif(not codecs.available(),
                                reason="libmpg123 not present")


def _encode_mp3(path, x, sr):
    """Minimal libmp3lame encode of mono float32 (test helper only)."""
    lib = ctypes.CDLL(ctypes.util.find_library("mp3lame") or
                      "libmp3lame.so.0")
    lib.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lib.lame_init())
    lib.lame_set_in_samplerate(gf, sr)
    lib.lame_set_num_channels(gf, 1)
    lib.lame_set_mode(gf, 3)  # MONO
    lib.lame_set_brate(gf, 128)
    assert lib.lame_init_params(gf) >= 0
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    out = ctypes.create_string_buffer(len(pcm) * 2 + 7200)
    n = lib.lame_encode_buffer(
        gf, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)), None,
        len(pcm), out, len(out))
    assert n >= 0
    data = out.raw[:n]
    n = lib.lame_encode_flush(gf, out, len(out))
    data += out.raw[:n]
    lib.lame_close(gf)
    with open(path, "wb") as f:
        f.write(data)


@pytest.fixture(scope="module")
def tone_mp3(tmp_path_factory):
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path_factory.mktemp("mp3") / "tone.mp3"
    _encode_mp3(str(path), x, sr)
    return str(path), x, sr


def test_read_mp3_roundtrip(tone_mp3):
    path, x, sr = tone_mp3
    y, got_sr = codecs.read_mp3(path)
    assert got_sr == sr
    # mp3 adds encoder+decoder delay; align by cross-correlation.
    n = min(len(x), len(y))
    assert abs(n - len(x)) < sr // 4
    c = np.correlate(y[: sr // 2], x[: sr // 4], mode="valid")
    lag = int(np.argmax(c))
    seg_y = y[lag:lag + sr]
    seg_x = x[:sr]
    corr = float(np.dot(seg_y, seg_x) /
                 (np.linalg.norm(seg_y) * np.linalg.norm(seg_x)))
    assert corr > 0.99
    # The dominant spectral peak survives at 440 Hz.
    spec = np.abs(np.fft.rfft(y))
    assert abs(np.argmax(spec) * sr / len(y) - 440.0) < 2.0


def test_read_audio_dispatch(tone_mp3, tmp_path):
    path, x, sr = tone_mp3
    y_mp3, sr1 = read_audio(path)
    assert sr1 == 16000 and y_mp3.ndim == 1
    wav = tmp_path / "tone.wav"
    write_wav(str(wav), x, sr)
    y_wav, sr2 = read_audio(str(wav))
    assert sr2 == 16000
    # Same underlying signal through either door.
    n = min(len(y_mp3), len(y_wav))
    c = np.correlate(y_mp3[: sr // 2], y_wav[: sr // 4], mode="valid")
    lag = int(np.argmax(c))
    a, b = y_mp3[lag:lag + sr], y_wav[:sr]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.99


def test_mp3_duration(tone_mp3):
    path, x, sr = tone_mp3
    dur = duration_seconds(path)
    assert dur == pytest.approx(len(x) / sr, abs=0.2)


def test_stereo_resample_mp3(tmp_path):
    """A 44.1 kHz stereo mp3 comes out mono 16 kHz through read_audio."""
    sr = 44100
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)
    lib = ctypes.CDLL(ctypes.util.find_library("mp3lame") or
                      "libmp3lame.so.0")
    lib.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lib.lame_init())
    lib.lame_set_in_samplerate(gf, sr)
    lib.lame_set_num_channels(gf, 2)
    assert lib.lame_init_params(gf) >= 0
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    out = ctypes.create_string_buffer(len(pcm) * 4 + 7200)
    n = lib.lame_encode_buffer(
        gf, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        len(pcm), out, len(out))
    data = out.raw[:n]
    n = lib.lame_encode_flush(gf, out, len(out))
    data += out.raw[:n]
    lib.lame_close(gf)
    path = tmp_path / "stereo.mp3"
    path.write_bytes(data)

    y, got_sr = read_audio(str(path))
    assert got_sr == 16000 and y.ndim == 1
    spec = np.abs(np.fft.rfft(y))
    assert abs(np.argmax(spec) * 16000 / len(y) - 523.25) < 3.0
