"""RMS-energy silence removal.

Semantics follow the reference's Cython ``removeSilence``
(``/root/reference/lib/cython_impl/tools.pyx:42-134``): frames whose RMS
energy falls below ``alpha * max(energy)`` are marked silent, the marker is
smoothed with a 5-tap median, and only silent *segments* longer than
``beta`` seconds are excised.  Segment sample bounds use the reference's
exact arithmetic (``k = max(shift*(i-1)+size, 1)``,
``l = min(shift*(j-1)+size, n)``) including the quirk that a lone silent
segment is kept (the reference requires ``nSil > 1`` before removing
anything, ``tools.pyx:126``).

Documented deviation: the reference preallocates the output as
``np.ones(nSamples)`` and returns the *full-length* buffer, leaving a tail
of constant 1.0 samples after the retained audio (``tools.pyx:92,129,134``)
— a buffer-reuse bug that injects a DC step into every silence-trimmed
file.  We return only the retained samples.  ``total_sil_duration`` is
returned in float seconds (the reference truncates it to int).

The segment scan is inherently sequential run-length logic over a few
hundred frames — host-side numpy is the right tool; the expensive part
(RMS frames) runs on device via ``ops.stft.rms_energy`` when batched.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import medfilt


def frame_markers(energy: np.ndarray, alpha: float = 0.025) -> np.ndarray:
    """Threshold + 5-tap median smoothing -> per-frame voiced(1)/silent(0)."""
    thresh = alpha * np.max(energy)
    marker = (energy >= thresh).astype(np.int64)
    return (medfilt(marker.astype(np.float64), 5) > 0.5).astype(np.int64)


def silent_segments(marker: np.ndarray, n_samples: int, fs: int,
                    frame_size: int, frame_shift: int,
                    beta: float = 0.075) -> list[tuple[int, int]]:
    """Run-length scan reproducing the reference's segment arithmetic.

    Returns sample-index [k, l) spans of silent segments longer than
    ``beta`` seconds.
    """
    n_frames = len(marker)
    segments: list[tuple[int, int]] = []
    i = 0
    while i < n_frames:
        while marker[i] == 1:
            if i == n_frames - 1:
                break
            i += 1
        j = i
        while marker[j] == 0:
            if j == n_frames - 1:
                break
            j += 1
        k = max(frame_shift * (i - 1) + frame_size, 1)
        l = min(frame_shift * (j - 1) + frame_size, n_samples)
        if (l - k) / fs > beta:
            segments.append((k, l))
        i = j + 1
    return segments


def remove_silence(x: np.ndarray, energy: np.ndarray, fs: int,
                   Tw: int = 25, Ts: int = 10,
                   alpha: float = 0.025, beta: float = 0.075):
    """Silence removal with the reference's semantics.

    Parameters mirror ``cremoveSilence(Xin, nSamples, energy, nFrames, fs,
    Tw, Ts)``: ``energy`` is the per-frame RMS (see ``ops.stft.rms_energy``
    / ``ops.reference.rms_energy``), Tw/Ts in ms.

    Returns ``(x_out, sample_marker, frame_marker, total_sil_seconds)``.
    """
    frame_size = int(Tw * fs / 1000)
    frame_shift = int(Ts * fs / 1000)
    n = len(x)
    marker = frame_markers(np.asarray(energy), alpha)
    segments = silent_segments(marker, n, fs, frame_size, frame_shift, beta)

    sample_marker = np.ones(n, dtype=np.int64)
    total = 0.0
    for k, l in segments:
        sample_marker[k:l] = 0
        total += (l - k) / fs

    # Reference quirk: removal only happens with >1 qualifying segment.
    if len(segments) > 1:
        x_out = x[sample_marker == 1]
    else:
        x_out = x
    return x_out, sample_marker, marker, total
