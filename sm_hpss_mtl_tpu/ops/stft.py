"""Batched STFT / iSTFT / RMS framing as XLA ops.

TPU-native replacement for the reference's librosa STFT calls
(``/root/reference/lib/preprocessing.py:381,387,407,417``): framing is a
static-shape gather, the window multiply fuses into the rFFT, and everything
is batched over files/segments so XLA can pipeline HBM reads.  All functions
are jit-friendly (static shapes, no data-dependent control flow) and operate
on the *last* axis as time so they vmap/shard naturally over leading axes.

Default geometry matches the reference: 16 kHz audio, Tw=25 ms window
(win_length=400), Ts=10 ms hop (hop_length=160), n_fft=400 (512 for the
Jang model) — ``/root/reference/Proposed_Work_Results.py:758-765,800-801``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import reference as ref


def hann_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window zero-padded to ``n_fft`` (host-computed constant)."""
    return jnp.asarray(ref.pad_center(ref.hann_window(win_length), n_fft), dtype=dtype)


def n_frames(n_samples: int, frame_length: int, hop_length: int) -> int:
    """Frame count for center=False framing (static helper)."""
    return 1 + (n_samples - frame_length) // hop_length


def frame(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Frame the last axis: ``(..., n) -> (..., n_frames, frame_length)``.

    center=False semantics: frame ``t`` is ``y[..., t*hop : t*hop+frame_length]``.
    Implemented as a static-index gather so it stays a single XLA gather op.
    """
    nf = n_frames(y.shape[-1], frame_length, hop_length)
    idx = (np.arange(nf)[:, None] * hop_length + np.arange(frame_length)[None, :])
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "win_length", "hop_length"))
def stft(y: jax.Array, *, n_fft: int, win_length: int, hop_length: int) -> jax.Array:
    """Complex STFT of the last axis, center=False: ``(..., n) ->
    (..., 1+n_fft//2, n_frames)``.

    Output layout is (freq, time) to match the reference's featuregram
    orientation (``nFeatures x nFrames``).
    """
    window = hann_window(win_length, n_fft, dtype=y.dtype)
    frames = frame(y, n_fft, hop_length) * window  # (..., T, n_fft)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., T, F)
    return jnp.swapaxes(spec, -1, -2)


@functools.partial(jax.jit, static_argnames=("n_fft", "win_length", "hop_length"))
def stft_mag(y: jax.Array, *, n_fft: int, win_length: int, hop_length: int) -> jax.Array:
    """Magnitude STFT ``(..., F, T)`` (float32)."""
    return jnp.abs(stft(y, n_fft=n_fft, win_length=win_length,
                        hop_length=hop_length)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "win_length", "hop_length", "length"))
def istft(S: jax.Array, *, n_fft: int, win_length: int, hop_length: int,
          length: int | None = None) -> jax.Array:
    """Inverse of :func:`stft` via windowed overlap-add with NOLA
    normalization.  ``S``: ``(..., F, T)`` complex -> ``(..., n_samples)``.

    Overlap-add is expressed as a strided scatter-add, which XLA lowers to
    an efficient segmented reduction on TPU.
    """
    S = jnp.swapaxes(S, -1, -2)                      # (..., T, F)
    window = hann_window(win_length, n_fft, dtype=jnp.float32)
    frames = jnp.fft.irfft(S, n=n_fft, axis=-1) * window   # (..., T, n_fft)
    T = frames.shape[-2]
    out_len = n_fft + hop_length * (T - 1)

    # Scatter-add each frame into the output at its hop offset.
    idx = (np.arange(T)[:, None] * hop_length + np.arange(n_fft)[None, :]).reshape(-1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape(batch_shape + (T * n_fft,))
    y = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
    y = y.at[..., idx].add(flat)

    wsum = jnp.zeros(out_len, dtype=jnp.float32).at[idx].add(
        jnp.tile(window ** 2, T))
    y = y / jnp.where(wsum > 1e-10, wsum, 1.0)
    if length is not None:
        if length <= out_len:
            y = y[..., :length]
        else:
            pad = [(0, 0)] * (y.ndim - 1) + [(0, length - out_len)]
            y = jnp.pad(y, pad)
    return y


@functools.partial(jax.jit, static_argnames=("frame_length", "hop_length"))
def rms_energy(y: jax.Array, *, frame_length: int, hop_length: int) -> jax.Array:
    """Per-frame RMS with center=True reflect padding, matching
    ``librosa.feature.rms`` as used for silence gating
    (``/root/reference/lib/preprocessing.py:337``). ``(..., n) -> (..., T)``."""
    pad = [(0, 0)] * (y.ndim - 1) + [(frame_length // 2, frame_length // 2)]
    yp = jnp.pad(y, pad, mode="reflect")
    frames = frame(yp, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(frames.astype(jnp.float32) ** 2, axis=-1))
