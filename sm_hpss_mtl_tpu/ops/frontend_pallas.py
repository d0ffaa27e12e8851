"""Fully fused audio -> mel-HPSS frontend Pallas kernel for TPU.

Round-1 profiling (NOTES.md) showed the featurize pipeline split evenly
between the block-matmul STFT (~1.7 ms for 16x30 s) and the fused
HPSS+mel Pallas kernel (~1.7 ms), with the full-resolution spectrogram
making an HBM round trip in between.  This module fuses the *entire*
reference front-end — ``librosa.core.stft`` -> ``decompose.hpss`` ->
``feature.melspectrogram`` (``/root/reference/lib/preprocessing.py:
417-422``) — into ONE kernel: each Pallas program reads a raw-audio
tile from HBM and writes only the two ``(tile_t, n_mels)`` mel-HPSS
feature tiles.  The spectrogram, the medians, and the masks live and
die in VMEM, and the MXU (DFT + mel matmuls) overlaps the VPU (median
selection networks) inside one program.

Design:

- **Framing without gathers.**  Audio is reshaped XLA-side into
  hop-sized "superblocks"; frame ``t`` occupies superblocks
  ``[t, t+J)`` with ``J = ceil(n_fft / hop)``.  In-kernel the windowed
  rDFT is then ``sum_j A[j : j+n_fr] @ D_j`` — J unit-stride sublane
  slices of the audio tile hit with hop-row slabs of the DFT basis on
  the MXU.  No strided slices, no transposes: the result lands directly
  in (frames, freq) layout, which makes the harmonic median a sublane
  shift and the percussive median a lane shift.
- **Frequency reflect-pad baked into the basis.**  The percussive
  median needs ``l_perc//2`` symmetric-padded frequency rows.  A
  mirrored frequency is just a duplicated DFT basis column, so the
  basis is built ``(hop*J, 2*(F + l_perc - 1))`` with the mirror
  columns included and the padded magnitude comes out of the matmul
  for free (the extra lanes disappear into lane-padding anyway).
- **Time halos are audio overlap; global edges mirror in-kernel.**
  Interior tiles read ``l_harm//2`` extra frames of real audio on each
  side.  At the global start/end the oracle semantics are *symmetric
  spectral* padding, which no audio halo can express — but the mirror
  rows are flipped copies of rows already inside the first/last tile,
  so the kernel stages the magnitude in a VMEM scratch and overwrites
  the halo rows under ``@pl.when(first/last tile)`` (static row
  indices; ~10 sublane row copies).  An XLA-side oracle splice was
  measured first and rejected: the jnp median sort on even a 30-frame
  slab costs ~1.3 ms — more than half the whole fused kernel.
- **DFT precision.**  The windowed-DFT matmuls default to a manual
  bf16x3 decomposition (hi/lo bf16 splits, lo*lo term dropped — ~f32
  accuracy; Mosaic lacks ``Precision.HIGH``): 3 one-pass MXU matmuls
  per block vs HIGHEST's 6.  The DFT and the medians serialize on
  their data dependency, so MXU time is on the critical path.  Pass
  ``dft_precision='highest'`` to pin full f32 exactness.

The jnp oracle chain (``ops.stft.stft_mag`` -> ``ops.hpss.hpss`` ->
mel matmul) is the correctness reference; non-TPU backends fall back
to it (Pallas interpret mode is exercised separately in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import reference as ref
from .hpss_pallas import _apply_median_network, median_network

_F32_TINY = float(np.finfo(np.float32).tiny)
_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host-side constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _dft_block_basis(n_fft: int, win_length: int, hop: int, hp: int):
    """Windowed rDFT basis in superblock layout, with the percussive
    median's symmetric frequency padding baked in as duplicated columns.

    Returns ``(J*hop, 2*Fpad)`` float32: row ``j*hop + s`` is audio
    sample ``j*hop + s`` of the frame (zero beyond ``n_fft``); columns
    ``[0, Fpad)`` are the real (cos) part and ``[Fpad, 2*Fpad)`` the
    imaginary (−sin) part, where column ``q`` maps to true frequency
    ``fmap[q]`` under numpy's ``mode='symmetric'`` edge rule.
    """
    F = 1 + n_fft // 2
    J = -(-n_fft // hop)
    fmap = (list(range(hp - 1, -1, -1)) + list(range(F))
            + list(range(F - 1, F - hp - 1, -1)))
    window = ref.pad_center(ref.hann_window(win_length), n_fft)
    n = np.arange(J * hop)
    ang = 2.0 * np.pi * np.asarray(fmap)[None, :] * n[:, None] / n_fft
    w = np.where(n < n_fft, window[np.minimum(n, n_fft - 1)], 0.0)[:, None]
    real = np.cos(ang) * w
    imag = -np.sin(ang) * w
    return np.concatenate([real, imag], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _tile_masks(c_ref, h_ref, d_ref, e_ref, a_scr, mag_ref, *, n_fr,
                tile_t, F, Fpad, hop, J, l_harm, l_perc, power, edge_fixes,
                dft_precision, stage="full"):
    """Shared kernel body: audio tile -> (mask_h, mask_p, s_center).

    The audio window a tile needs overlaps its right neighbor by
    ``2*ht + J - 1`` superblock rows.  Overlap is inexpressible as a
    BlockSpec tiling, and materializing whole overlapped windows
    XLA-side (the round-1..3 design) hit a fusion cliff growing
    superlinearly with the grid — 0.05 / 1.1 / 5.0 ms of pure prep at
    64 / 128 / 256 cells (NOTES r4 'before' probes).  So the window
    arrives in two pieces: ``c_ref`` is the tile's NON-overlapping
    ``(tile_t, hop)`` center block (standard pipelined BlockSpec) and
    ``h_ref`` the tiny pre-stacked ``(tail_pad, hop)`` halo (~3% of the
    audio, cheap to materialize); the kernel stitches them into the
    ``a_scr`` VMEM scratch before the DFT.

    ``e_ref`` is a (1, 2) int32 SMEM scalar: [mirror_left, mirror_right].
    Both are 1 for a whole signal; the time-sharded caller
    (``parallel.frontend_shard``) zeroes the flag on shards whose halo
    audio came from a ring neighbor instead of a global edge."""
    ht = l_harm // 2
    hp = l_perc // 2
    a_scr[0:tile_t, :] = c_ref[0]
    a_scr[tile_t:, :] = h_ref[0, 0]
    a = a_scr[...]                                    # (n_sb_pad, hop)
    d = d_ref[...]                                    # (J*hop, 2*Fpad)

    if dft_precision == "bf16x3":
        # Manual bf16x3: split both operands into hi+lo bf16 parts and
        # drop the lo*lo term — ~f32 accuracy in 3 one-pass MXU matmuls
        # per block vs HIGHEST's 6 (Mosaic lacks Precision.HIGH).
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d_hi = d.astype(jnp.bfloat16)
        d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mm = functools.partial(jax.lax.dot,
                               preferred_element_type=jnp.float32)
        acc = None
        for j in range(J):
            sl = slice(j * hop, (j + 1) * hop)
            prod = (mm(a_hi[j:j + n_fr], d_hi[sl])
                    + mm(a_hi[j:j + n_fr], d_lo[sl])
                    + mm(a_lo[j:j + n_fr], d_hi[sl]))
            acc = prod if acc is None else acc + prod  # (n_fr, 2*Fpad)
    else:
        acc = None
        for j in range(J):
            prod = jax.lax.dot(a[j:j + n_fr, :], d[j * hop:(j + 1) * hop, :],
                               precision=_HIGHEST,
                               preferred_element_type=jnp.float32)
            acc = prod if acc is None else acc + prod  # (n_fr, 2*Fpad)
    re = acc[:, :Fpad]
    im = acc[:, Fpad:]
    mag_ref[...] = jnp.sqrt(re * re + im * im)        # (n_fr, Fpad)

    # Global-edge symmetric padding: padded frame -1-i mirrors frame i
    # (row ht-1-i := row ht+i, tile 0 only), and frame T+m mirrors frame
    # T-1-m.  The right halo can cross T-1 in the last TWO tiles (the
    # final tile may be thinner than ht), so ``edge_fixes`` carries
    # (tile_index, row_of_frame_T-1, rows_to_fix) for each.  All indices
    # are static; source and destination rows are disjoint.
    t = pl.program_id(1)

    @pl.when((t == 0) & (e_ref[0, 0] == 1))
    def _():
        for i in range(ht):
            mag_ref[ht - 1 - i, :] = mag_ref[ht + i, :]

    for tile_i, r, n_fix in edge_fixes:
        @pl.when((t == tile_i) & (e_ref[0, 1] == 1))
        def _(r=r, n_fix=n_fix):
            for m in range(n_fix):
                mag_ref[r + 1 + m, :] = mag_ref[r - m, :]

    mag = mag_ref[...]
    if stage == "no_median":
        # Profiling hook (tools/bench_frontend.py): skip the median
        # selection networks and mask arithmetic so (full - no_median)
        # isolates the VPU median share of the kernel.  NOT a compute
        # mode.  The two stand-in masks must be distinct, non-constant
        # tensors: equal (or scalar-multiple) masks let Mosaic CSE one
        # of the two mel matmuls away and the leg under-measures.
        ramp = jax.lax.broadcasted_iota(  # Mosaic iota is integer-only
            jnp.int32, (tile_t, F), 1).astype(jnp.float32)
        mask_h = 0.5 + 1e-6 * ramp
        mask_p = 0.5 - 1e-6 * ramp
        return mask_h, mask_p, mag[ht:ht + tile_t, hp:hp + F]
    harm = _apply_median_network(
        [mag[k:k + tile_t, hp:hp + F] for k in range(l_harm)], l_harm)
    perc = _apply_median_network(
        [mag[ht:ht + tile_t, k:k + F] for k in range(l_perc)], l_perc)

    z = jnp.maximum(harm, perc)
    bad = z < _F32_TINY
    zn = jnp.where(bad, 1.0, z)
    hn = (harm / zn) ** power
    pn = (perc / zn) ** power
    denom = jnp.where(bad, 1.0, hn + pn)
    mask_h = jnp.where(bad, 0.0, hn / denom)
    mask_p = jnp.where(bad, 0.0, pn / denom)
    s_center = mag[ht:ht + tile_t, hp:hp + F]         # (tile_t, F)
    return mask_h, mask_p, s_center


def _frontend_kernel(c_ref, hal_ref, d_ref, e_ref, m_ref, h_ref, p_ref,
                     a_scr, mag_ref, **kw):
    """Mel variant: write ``(tile_t, n_mels)`` mel-projected H/P tiles."""
    mask_h, mask_p, s_center = _tile_masks(c_ref, hal_ref, d_ref, e_ref,
                                           a_scr, mag_ref, **kw)
    m = m_ref[...]                                    # (F, n_mels)
    h_ref[0, 0] = jax.lax.dot(s_center * mask_h, m, precision=_HIGHEST,
                              preferred_element_type=jnp.float32)
    p_ref[0, 0] = jax.lax.dot(s_center * mask_p, m, precision=_HIGHEST,
                              preferred_element_type=jnp.float32)


def _frontend_kernel_mag(c_ref, hal_ref, d_ref, e_ref, h_ref, p_ref,
                         a_scr, mag_ref, **kw):
    """Full-resolution variant: write ``(tile_t, F)`` masked-magnitude
    H/P tiles (the reference's HarmSpec/PercSpec featName family)."""
    mask_h, mask_p, s_center = _tile_masks(c_ref, hal_ref, d_ref, e_ref,
                                           a_scr, mag_ref, **kw)
    h_ref[0, 0] = s_center * mask_h
    p_ref[0, 0] = s_center * mask_p


def _audio_superblocks(y: jax.Array, *, T: int, tile_t: int, hop: int,
                       J: int, ht: int, halo_in_audio: bool = False):
    """(B, N) audio -> (centers, halos, nT, n_sb_pad).

    ``centers`` is the padded superblock array ``(B, NSB, hop)`` whose
    rows ``[t*tile_t, (t+1)*tile_t)`` are tile ``t``'s non-overlapping
    center block (a plain pad+reshape — layout-preserving, one linear
    copy, no duplication).  ``halos`` is the small pre-stacked
    ``(B, nT, tail_pad, hop)`` right-halo array (rows
    ``[(t+1)*tile_t, (t+1)*tile_t + tail_pad)``, ~3% of the audio);
    overlap lives only here, so the fusion-cliff-prone overlapped stack
    of the old design shrinks ~30x (see ``_tile_masks``).  ``tail_pad``
    rounds the true ``2*ht + J - 1`` tail up to the 8-sublane
    granularity; the surplus rows are never consumed.  With
    ``halo_in_audio`` the caller already prepended ``ht*hop`` halo
    samples (time-sharded path); otherwise the halo is zero and the
    kernel's edge mirror repairs the boundary.
    """
    B, N = y.shape
    nT = -(-T // tile_t)
    tail = 2 * ht + J - 1
    tail_pad = 8 * -(-tail // 8)
    NSB = nT * tile_t + tail_pad
    pad_l = 0 if halo_in_audio else ht * hop
    pad_r = NSB * hop - pad_l - N
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad_l, pad_r)))
    sb = yp.reshape(B, NSB, hop)
    halos = jnp.stack([sb[:, (t + 1) * tile_t:(t + 1) * tile_t + tail_pad]
                       for t in range(nT)], axis=1)
    return sb, halos, nT, tile_t + tail_pad


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "win_length", "hop_length", "l_harm",
                     "l_perc", "power", "tile_t", "dft_precision",
                     "halo_in_audio", "interpret", "dim_semantics",
                     "stage", "raw_out"))
def _frontend_pallas(y: jax.Array, M, *, n_fft, win_length,
                     hop_length, l_harm, l_perc, power, tile_t,
                     dft_precision="bf16x3", halo_in_audio=False,
                     edge_flags=None, interpret=False,
                     dim_semantics=None, stage="full", raw_out=False):
    """Run the fused kernel.  ``M`` is the ``(F, n_mels)`` mel basis for
    the mel variant, or None for full-resolution masked magnitudes.

    ``halo_in_audio``: the input already carries ``ht*hop`` halo samples
    on each side (time-sharded path); ``edge_flags`` is a traced (1, 2)
    int32 [mirror_left, mirror_right] — defaults to mirroring both
    global edges."""
    B, N = y.shape
    F = 1 + n_fft // 2
    emit_mel = M is not None
    n_out = M.shape[1] if emit_mel else F
    ht, hp = l_harm // 2, l_perc // 2
    Fpad = F + 2 * hp
    J = -(-n_fft // hop_length)
    T = 1 + (N - n_fft) // hop_length - (2 * ht if halo_in_audio else 0)
    if tile_t < ht:
        # The left-edge mirror only fires on tile 0; a tile thinner than
        # the halo would need it on tile 1 too and be silently wrong.
        raise ValueError(f"tile_t={tile_t} must be >= l_harm//2={ht}")
    # The halo store lands at sublane offset tile_t in the audio scratch,
    # so tiles are 8-granular (rounding up never changes the tile count:
    # _pick_tile returns multiples of 8, and a single tile only grows).
    tile_t = 8 * -(-tile_t // 8)
    n_fr = tile_t + 2 * ht

    centers, halos, nT, n_sb = _audio_superblocks(
        y, T=T, tile_t=tile_t, hop=hop_length, J=J, ht=ht,
        halo_in_audio=halo_in_audio)
    tail_pad = n_sb - tile_t
    if edge_flags is None:
        edge_flags = jnp.ones((1, 2), jnp.int32)
    basis = jnp.asarray(_dft_block_basis(n_fft, win_length, hop_length, hp))
    edge_fixes = []
    for tile_i in {max(0, nT - 2), nT - 1}:
        r = (T - 1) - tile_i * tile_t + ht      # row of frame T-1 in tile_i
        n_fix = min(ht, n_fr - 1 - r)
        if 0 <= r and n_fix > 0:
            edge_fixes.append((tile_i, r, n_fix))

    kw = dict(n_fr=n_fr, tile_t=tile_t, F=F, Fpad=Fpad, hop=hop_length,
              J=J, l_harm=l_harm, l_perc=l_perc, power=power,
              edge_fixes=tuple(edge_fixes), dft_precision=dft_precision,
              stage=stage)

    out_shape = jax.ShapeDtypeStruct((B, nT, tile_t, n_out), jnp.float32)
    grid = (B, nT)
    in_specs = [
        # Non-overlapping center blocks (pipelined) + the small
        # pre-stacked right halos (see _tile_masks).
        pl.BlockSpec((1, tile_t, hop_length), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tail_pad, hop_length),
                     lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J * hop_length, 2 * Fpad), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    inputs = [centers, halos, basis, jnp.asarray(edge_flags, jnp.int32)]
    if emit_mel:
        in_specs.append(pl.BlockSpec((F, n_out), lambda b, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(M.astype(jnp.float32))
        kernel = functools.partial(_frontend_kernel, **kw)
    else:
        kernel = functools.partial(_frontend_kernel_mag, **kw)
    out_spec = pl.BlockSpec((1, 1, tile_t, n_out),
                            lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)

    comparators = len(median_network(l_harm)) + len(median_network(l_perc))
    flops_tile = (J * n_fr * hop_length * 2 * Fpad * 2
                  + (comparators * 2 + 12) * tile_t * F
                  + (2 * tile_t * F * n_out * 2 if emit_mel else 0))
    H, P = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(out_shape, out_shape),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((n_sb, hop_length), jnp.float32),
                        pltpu.VMEM((n_fr, Fpad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * B * nT,
            bytes_accessed=(n_sb * hop_length + 2 * tile_t * n_out) * 4
            * B * nT,
            transcendentals=0),
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=dim_semantics)
            if dim_semantics is not None else None),
        interpret=interpret,
    )(*inputs)

    if raw_out:
        # Profiling hook (tools/bench_frontend.py): skip the untile
        # reshape+transpose so its HBM cost can be measured separately.
        return H, P

    def _untile(X):                                   # (B, nT, tile_t, m)
        X = X.reshape(B, nT * tile_t, n_out)[:, :T]
        return jnp.swapaxes(X, -1, -2)                # (B, n_out, T)

    return _untile(H), _untile(P)


# ---------------------------------------------------------------------------
# Oracle path + edge splice
# ---------------------------------------------------------------------------

def _oracle(y: jax.Array, M, *, n_fft, win_length,
            hop_length, l_harm, l_perc, power):
    """jnp reference chain: stft_mag -> hpss (-> mel matmul if ``M``,
    the ``(n_mels, F)`` basis, is given)."""
    from . import hpss as hpss_mod
    from . import stft as stft_mod
    S = stft_mod.stft_mag(y, n_fft=n_fft, win_length=win_length,
                          hop_length=hop_length)
    H, P = hpss_mod.hpss(S, l_harm=l_harm, l_perc=l_perc, power=power)
    if M is None:
        return H, P
    proj = functools.partial(jnp.einsum, "mf,bft->bmt", precision=_HIGHEST,
                             preferred_element_type=jnp.float32)
    return proj(M, H), proj(M, P)


def _pick_tile(T: int, cap: int) -> int:
    """Largest 8-aligned tile <= cap minimizing padded frames: compute
    scales with nT*tile_t, so e.g. T=2998 runs 2% faster at tile 752
    (pads to 3008) than at the VMEM-optimal cap 768 (pads to 3072)."""
    nT = -(-T // cap)
    return max(8, 8 * -(-T // (8 * nT)))


def _chunked_frontend(y, Mt, *, tile_cap, chunk_tiles, **kw):
    """Run batched long audio as sequential TIME-segment sub-calls of
    ``chunk_tiles`` tiles each, instead of one tall ``(B, nT)`` grid.

    Measured (tools/probe_sustained.py + interleaved A/Bs, real chip):
    per-cell time inside ONE ``pallas_call`` grows superlinearly with
    the per-item tile count when B > 1 — a (16, 16) grid runs ~1.36x
    slower than four (16, 4) time-segment calls over the same audio
    (9.97 -> 7.34 ms at B16 x 120 s), with 20-27% wins at every B >= 2
    geometry probed (8/16/32 x 120 s, 16 x 480 s, 2 x 600 s).  Chunking
    along BATCH does not recover it (a (4, 16) x 4 split measures
    *worse* than the single grid), and B == 1 grids don't exhibit the
    penalty at all (a (1, 240) grid beats every segmented variant) —
    so the rule is: keep the per-call tile count at ~4 whenever B > 1,
    leave single-recording calls whole.

    Time segmentation reuses the kernel's ``halo_in_audio`` contract
    from the time-sharded path (``parallel/frontend_shard.py``):
    interior boundaries receive ``ht*hop`` real audio halo samples, so
    the medians at the seams are exact, and the global-edge mirror
    flags fire only on the true first/last segments.
    """
    B, N = y.shape
    n_fft, hop = kw["n_fft"], kw["hop_length"]
    ht = kw["l_harm"] // 2
    T = 1 + (N - n_fft) // hop
    tile = _pick_tile(T, tile_cap)
    nT = -(-T // tile)
    if chunk_tiles is None or B == 1 or nT <= chunk_tiles:
        return _frontend_pallas(y, Mt, tile_t=tile, **kw)
    # Time chunking: T_seg-frame segments with ht*hop real-audio halos.
    T_seg = chunk_tiles * tile
    n_seg = -(-T // T_seg)
    bounds = [s * T_seg for s in range(n_seg)] + [T]
    if n_seg > 1 and bounds[-1] - bounds[-2] < 2 * ht:
        # The kernel's edge mirror needs 2*ht real frames: fold a tiny
        # ragged tail into the previous segment.
        bounds.pop(-2)
    halo = ht * hop
    tail_len = n_fft - hop
    ypad = jnp.pad(y.astype(jnp.float32),
                   ((0, 0), (halo, halo + tail_len + T_seg * hop)))
    Hs, Ps = [], []
    for s in range(len(bounds) - 1):
        f0, f1 = bounds[s], bounds[s + 1]
        Ts = f1 - f0
        seg = ypad[:, f0 * hop:f0 * hop + (Ts + 2 * ht - 1) * hop + n_fft]
        flags = jnp.asarray([[1 if s == 0 else 0,
                              1 if f1 == T else 0]], jnp.int32)
        H, P = _frontend_pallas(seg, Mt, tile_t=_pick_tile(Ts, tile),
                                halo_in_audio=True, edge_flags=flags, **kw)
        Hs.append(H)
        Ps.append(P)
    return jnp.concatenate(Hs, axis=-1), jnp.concatenate(Ps, axis=-1)


def _dispatch(y, M, *, n_fft, win_length, hop_length, l_harm, l_perc,
              power, tile_t, dft_precision, interpret, chunk_tiles=4):
    """Shared lead-dim handling + short-clip fallback.  ``M`` is the
    ``(n_mels, F)`` mel basis or None for full-resolution output."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    lead = None
    if y.ndim != 2:
        lead = y.shape[:-1]
        y = y.reshape((-1, y.shape[-1]))
    kw = dict(n_fft=n_fft, win_length=win_length, hop_length=hop_length,
              l_harm=l_harm, l_perc=l_perc, power=power)

    ht = l_harm // 2
    T = 1 + (y.shape[-1] - n_fft) // hop_length
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not on_tpu or T < 2 * ht:
        # Short clips: the in-kernel edge mirror needs 2*ht real frames —
        # run the oracle (or, on TPU, the spectral Pallas kernel) whole.
        if on_tpu:
            from . import hpss_pallas, stft as stft_mod
            S = stft_mod.stft_mag(y, n_fft=n_fft, win_length=win_length,
                                  hop_length=hop_length)
            if M is not None:
                out = hpss_pallas.hpss_mel(S, M, l_harm=l_harm,
                                           l_perc=l_perc, power=power,
                                           interpret=interpret)
            else:
                out = hpss_pallas.hpss(S, l_harm=l_harm, l_perc=l_perc,
                                       power=power, interpret=interpret)
        else:
            out = _oracle(y, M, **kw)
    else:
        if M is None:
            # Full-resolution (tile_t, F) output tiles cost ~6 MB more
            # VMEM than mel tiles; tile 768 OOMs the 16 MB scoped limit
            # at F=257 (measured) — cap at 512.
            tile_t = min(tile_t, 512)
        out = _chunked_frontend(y, None if M is None else M.T,
                                tile_cap=tile_t, chunk_tiles=chunk_tiles,
                                interpret=interpret,
                                dft_precision=dft_precision, **kw)

    H, P = out
    if lead is not None:
        H = H.reshape(lead + H.shape[-2:])
        P = P.reshape(lead + P.shape[-2:])
    if squeeze:
        H, P = H[0], P[0]
    return H, P


def stft_hpss_mel(y: jax.Array, mel_basis, *, n_fft: int = 400,
                  win_length: int = 400, hop_length: int = 160,
                  l_harm: int = 21, l_perc: int = 11, power: float = 2.0,
                  tile_t: int = 768, dft_precision: str = "bf16x3",
                  interpret: bool = False,
                  chunk_tiles: int | None = 4
                  ) -> tuple[jax.Array, jax.Array]:
    """Audio ``(..., n_samples)`` -> ``(mel(H), mel(P))`` of shape
    ``(..., n_mels, T)`` in one fused Pallas pass.

    ``mel_basis`` is ``(n_mels, F)`` (e.g. ``mel.mel_filterbank``); on
    non-TPU backends falls back to the jnp oracle chain.  ``tile_t`` is
    a cap: the actual tile is auto-sized to minimize padded frames
    (see ``_pick_tile``).  ``chunk_tiles`` caps the per-``pallas_call``
    TIME-tile count for batched inputs — longer audio runs as
    sequential time-segment sub-calls, 20-27% faster than one tall
    grid at B >= 2 (``_chunked_frontend``); ``None`` disables chunking.
    """
    M = jnp.asarray(mel_basis, jnp.float32)
    return _dispatch(y, M, n_fft=n_fft, win_length=win_length,
                     hop_length=hop_length, l_harm=l_harm, l_perc=l_perc,
                     power=power, tile_t=tile_t,
                     dft_precision=dft_precision, interpret=interpret,
                     chunk_tiles=chunk_tiles)


def stft_hpss(y: jax.Array, *, n_fft: int = 400, win_length: int = 400,
              hop_length: int = 160, l_harm: int = 21, l_perc: int = 11,
              power: float = 2.0, tile_t: int = 768,
              dft_precision: str = "bf16x3",
              interpret: bool = False,
              chunk_tiles: int | None = 4
              ) -> tuple[jax.Array, jax.Array]:
    """Audio ``(..., n_samples)`` -> full-resolution ``(H, P)`` masked
    magnitudes of shape ``(..., F, T)`` in one fused Pallas pass — the
    reference's HarmSpec/PercSpec featName family
    (``lib/preprocessing.py:404-416``) without the spectrogram ever
    leaving VMEM.  ``chunk_tiles`` as in :func:`stft_hpss_mel`."""
    return _dispatch(y, None, n_fft=n_fft, win_length=win_length,
                     hop_length=hop_length, l_harm=l_harm, l_perc=l_perc,
                     power=power, tile_t=tile_t,
                     dft_precision=dft_precision, interpret=interpret,
                     chunk_tiles=chunk_tiles)
