"""Time-sharded fused audio->feature frontend.

Multi-chip version of ``ops.frontend_pallas``: the raw audio is sharded
along time across the mesh's ``time`` axis, each chip exchanges the
small audio halo with its ring neighbors over ICI (``lax.ppermute``) and
runs the fused DFT+HPSS+mel kernel on its local chunk.  Compared with
the spectral halo exchange (``parallel.halo``), the wire traffic is raw
audio — ``l_harm//2 * hop`` samples per boundary, ~25x smaller than the
same halo in spectrogram frames — and each chip's HBM only ever holds
audio plus mel features, never the full-resolution spectrogram.

Shard-boundary correctness: interior boundaries receive real neighbor
audio, so their median windows are exact; the kernel's global-edge
symmetric mirror is gated by a per-shard scalar flag
(``edge_flags = [axis_index == 0, axis_index == n-1]``) so it fires
only on the true first/last shards.  Output is equal to the unsharded
``stft_hpss_mel`` up to f32 rounding.

This is how the DAFx12-style multi-hour broadcast featurization
(``/root/reference/DAFx12_...py:594-706``) scales past one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stft_hpss_mel_time_sharded(
        y: jax.Array, mel_basis, mesh: Mesh, *, n_fft: int = 400,
        win_length: int = 400, hop_length: int = 160, l_harm: int = 21,
        l_perc: int = 11, power: float = 2.0, tile_t: int = 768,
        dft_precision: str = "bf16x3", axis: str = "time",
        interpret: bool | None = None) -> tuple[jax.Array, jax.Array]:
    """Audio ``(B, n_samples)`` -> ``(mel(H), mel(P))``, time-sharded.

    Requirements: the frame count ``T = 1 + (n - n_fft) // hop`` must
    divide evenly by the ``axis`` size, and each local block must hold
    at least ``2 * (l_harm // 2)`` frames.  ``interpret=None`` picks
    Pallas on TPU and interpret mode elsewhere (so the sharding logic is
    testable on the virtual CPU mesh).
    """
    from ..ops import frontend_pallas as fp

    B, N = y.shape
    ht = l_harm // 2
    n = mesh.shape[axis]
    T = 1 + (N - n_fft) // hop_length
    if T % n:
        raise ValueError(f"T={T} not divisible by {axis}={n}")
    T_local = T // n
    if T_local < 2 * ht:
        raise ValueError("local time block smaller than 2*(l_harm//2)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    halo = ht * hop_length
    tail_len = n_fft - hop_length   # samples past the last frame start
    body = y[:, :T * hop_length].astype(jnp.float32)
    tail = y[:, T * hop_length:(T - 1) * hop_length + n_fft]
    tail = tail.astype(jnp.float32)
    M = jnp.asarray(mel_basis, jnp.float32)

    body_spec = P(None, axis)
    out_spec = P(None, None, axis)
    rep = P(None, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(body_spec, rep, rep),
        out_specs=(out_spec, out_spec),
        # pallas_call's out_shape carries no varying-mesh-axes info, so
        # shard_map's vma checker can't see through it.
        check_vma=False)
    def _fn(y_local, tail_rep, M_rep):
        idx = jax.lax.axis_index(axis)
        # Left halo: my left neighbor's last `halo` samples.
        right_perm = [(i, (i + 1) % n) for i in range(n)]
        left_halo = jax.lax.ppermute(y_local[:, -halo:], axis, right_perm)
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo),
                              left_halo)
        # Right extension: neighbor's first `halo + tail_len` samples;
        # the last shard substitutes the replicated global tail + zeros.
        left_perm = [(i, (i - 1) % n) for i in range(n)]
        right_ext = jax.lax.ppermute(y_local[:, :halo + tail_len], axis,
                                     left_perm)
        own_tail = jnp.concatenate(
            [tail_rep, jnp.zeros((y_local.shape[0], halo), jnp.float32)],
            axis=-1)
        right_ext = jnp.where(idx == n - 1, own_tail, right_ext)

        y_ext = jnp.concatenate([left_halo, y_local, right_ext], axis=-1)
        flags = jnp.stack([(idx == 0).astype(jnp.int32),
                           (idx == n - 1).astype(jnp.int32)])[None, :]
        return fp._frontend_pallas(
            y_ext, M_rep.T, n_fft=n_fft, win_length=win_length,
            hop_length=hop_length, l_harm=l_harm, l_perc=l_perc,
            power=power, tile_t=min(tile_t, max(8, 8 * -(-T_local // 8))),
            dft_precision=dft_precision, halo_in_audio=True,
            edge_flags=flags, interpret=interpret)

    return _fn(body, tail, M)
