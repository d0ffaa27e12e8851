"""Fused audio -> mel-HPSS frontend kernel tests (interpret mode on CPU).

Parity oracle is the jnp reference chain ``stft_mag -> hpss -> mel``
(itself librosa-parity-tested in test_dsp_parity.py).  Full-speed parity
on real TPU is exercised by bench.py and the verify flow.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sm_hpss_mtl_tpu.ops import frontend_pallas as fp
from sm_hpss_mtl_tpu.ops import hpss as hpss_mod
from sm_hpss_mtl_tpu.ops import mel as mel_mod
from sm_hpss_mtl_tpu.ops import stft as stft_mod

pytestmark = pytest.mark.quick


def _oracle(y, M, *, n_fft, win, hop, l_harm, l_perc):
    S = stft_mod.stft_mag(jnp.asarray(y), n_fft=n_fft, win_length=win,
                          hop_length=hop)
    H, P = hpss_mod.hpss(S, l_harm=l_harm, l_perc=l_perc)
    proj = lambda X: np.asarray(jnp.einsum(
        "...ft,mf->...mt", X, jnp.asarray(M),
        precision="highest", preferred_element_type=jnp.float32))
    return proj(H), proj(P)


def _mel(n_mels, n_fft):
    return mel_mod.mel_filterbank(22050, n_fft, n_mels)


@pytest.mark.parametrize("n_samples,tile_t", [
    (16_000, 48),    # T=98: thin 2-frame last tile (< ht) — right mirror
                     # must fire in the second-to-last tile too
    (8_000, 364),    # T=48: single tile wider than T
    (7_920, 24),     # T=48: exact tile multiple (full last tile)
    (9_520, 48),     # T=58: last tile exactly ht frames
])
def test_frontend_parity_small(rng, n_samples, tile_t):
    # Calls _frontend_pallas directly: the public entry treats tile_t as
    # a cap and auto-sizes tiles to minimize padding, which would defeat
    # these exact thin-/full-last-tile geometries.
    n_fft, win, hop, l_harm, l_perc = 400, 400, 160, 21, 11
    M = _mel(32, n_fft)
    y = rng.standard_normal((2, n_samples)).astype(np.float32)
    Hm, Pm = fp._frontend_pallas(jnp.asarray(y), jnp.asarray(M).T,
                                 n_fft=n_fft, win_length=win,
                                 hop_length=hop, l_harm=l_harm,
                                 l_perc=l_perc, power=2.0,
                                 tile_t=tile_t, interpret=True)
    gH, gP = _oracle(y, M, n_fft=n_fft, win=win, hop=hop,
                     l_harm=l_harm, l_perc=l_perc)
    np.testing.assert_allclose(np.asarray(Hm), gH, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Pm), gP, rtol=2e-4, atol=2e-5)


def test_frontend_parity_jang_geometry(rng):
    # n_fft=512 > win=400, hop=160: J=4 superblocks with a partial tail
    # and a zero-padded window — the Jang-model STFT geometry.
    n_fft, win, hop = 512, 400, 160
    M = _mel(24, n_fft)
    y = rng.standard_normal((1, 12_000)).astype(np.float32)
    Hm, Pm = fp._frontend_pallas(jnp.asarray(y), jnp.asarray(M).T,
                                 n_fft=n_fft, win_length=win,
                                 hop_length=hop, l_harm=11, l_perc=5,
                                 power=2.0, tile_t=32, interpret=True)
    gH, gP = _oracle(y, M, n_fft=n_fft, win=win, hop=hop,
                     l_harm=11, l_perc=5)
    np.testing.assert_allclose(np.asarray(Hm), gH, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Pm), gP, rtol=2e-4, atol=2e-5)


def test_frontend_short_clip_fallback(rng):
    # T < 4*ht: the edge splice would cover everything -> whole-array
    # fallback path must still be parity-exact.
    n_fft, win, hop = 400, 400, 160
    M = _mel(16, n_fft)
    y = rng.standard_normal((1, n_fft + 20 * hop)).astype(np.float32)  # T=21
    Hm, Pm = fp.stft_hpss_mel(jnp.asarray(y), M, n_fft=n_fft,
                              win_length=win, hop_length=hop,
                              l_harm=21, l_perc=11)
    gH, gP = _oracle(y, M, n_fft=n_fft, win=win, hop=hop,
                     l_harm=21, l_perc=11)
    np.testing.assert_allclose(np.asarray(Hm), gH, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Pm), gP, rtol=1e-5, atol=1e-6)


def test_frontend_lead_dims_and_1d(rng):
    M = _mel(16, 400)
    y = rng.standard_normal((2, 2, 16_000)).astype(np.float32)
    H4, _ = fp.stft_hpss_mel(jnp.asarray(y), M, tile_t=48, interpret=True)
    assert H4.shape[:2] == (2, 2) and H4.shape[-2] == 16
    H1, _ = fp.stft_hpss_mel(jnp.asarray(y[0, 0]), M, tile_t=48,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H4)[0, 0],
                               rtol=1e-5, atol=1e-7)


def test_featuregram_fused_path_matches_oracle(rng):
    from sm_hpss_mtl_tpu.ops import featuregram as fg
    y = jnp.asarray(rng.standard_normal((2, 16_000)).astype(np.float32))
    # On the CPU test backend use_pallas=True routes stft_hpss_mel to its
    # oracle fallback — this pins the featuregram-level wiring (shapes,
    # mel-sr quirk, dB post-processing) to the plain path.
    a = fg.featuregram(y, feat_name="LogMelHarmPercSpec", n_mels=40,
                       use_pallas=True)
    b = fg.featuregram(y, feat_name="LogMelHarmPercSpec", n_mels=40,
                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_fft,n_samples,tile_t", [
    (400, 16_000, 48),   # thin last tile
    (512, 12_000, 32),   # Jang geometry, J=4
])
def test_frontend_fullres_parity(rng, n_fft, n_samples, tile_t):
    # stft_hpss: full-resolution masked magnitudes (no mel), the
    # Papakostas/Jang-MTL featName family.
    win, hop, l_harm, l_perc = 400, 160, 21, 11
    y = rng.standard_normal((2, n_samples)).astype(np.float32)
    # dft_precision='highest' isolates the kernel structure from bf16x3
    # rounding (~1e-3 strict-rel on raw magnitudes; the bf16x3 accuracy
    # budget is pinned on-chip in PARITY_TPU_r2.json frontend_cases).
    Hm, Pm = fp.stft_hpss(jnp.asarray(y), n_fft=n_fft, win_length=win,
                          hop_length=hop, l_harm=l_harm, l_perc=l_perc,
                          tile_t=tile_t, dft_precision="highest",
                          interpret=True)
    S = stft_mod.stft_mag(jnp.asarray(y), n_fft=n_fft, win_length=win,
                          hop_length=hop)
    gH, gP = hpss_mod.hpss(S, l_harm=l_harm, l_perc=l_perc)
    np.testing.assert_allclose(np.asarray(Hm), np.asarray(gH),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Pm), np.asarray(gP),
                               rtol=2e-4, atol=2e-5)


def test_pick_tile_and_tile_guard():
    # Auto-tiler: keeps the cap-implied tile count, shrinks to the
    # smallest 8-aligned cover (T=2998 @ cap 768 -> 4x752).
    assert fp._pick_tile(2998, 768) == 752
    assert fp._pick_tile(48, 768) == 48
    assert fp._pick_tile(5, 768) == 8
    assert fp._pick_tile(98, 48) == 40
    # Tiles thinner than the halo would silently skip the edge mirror.
    with pytest.raises(ValueError, match="tile_t"):
        fp._frontend_pallas(
            jnp.zeros((1, 16_000)), None, n_fft=400, win_length=400,
            hop_length=160, l_harm=21, l_perc=11, power=2.0, tile_t=8,
            interpret=True)


def test_audio_superblocks_pieces(rng):
    # The center blocks + the small halo stack together reconstruct the
    # overlapped (n_sb, hop) window of every tile (the round-4 design:
    # overlap lives only in the ~3% halo stack, never as whole
    # materialized windows — NOTES r4 fusion-cliff diagnosis).
    hop, J, ht, tile_t, T = 160, 3, 10, 48, 98
    y = rng.standard_normal((2, 16_000)).astype(np.float32)
    sb, halos, nT, n_sb = fp._audio_superblocks(
        jnp.asarray(y), T=T, tile_t=tile_t, hop=hop, J=J, ht=ht)
    sb, halos = np.asarray(sb), np.asarray(halos)
    tail_pad = n_sb - tile_t
    assert n_sb % 8 == 0
    assert halos.shape == (2, nT, tail_pad, hop)
    assert nT == -(-T // tile_t)
    for t in range(nT):
        window = sb[:, t * tile_t:t * tile_t + n_sb]
        np.testing.assert_array_equal(
            window[:, :tile_t], sb[:, t * tile_t:(t + 1) * tile_t])
        np.testing.assert_array_equal(window[:, tile_t:], halos[:, t])
    # The padded superblock array is the zero-padded audio itself
    # (pad_l = ht*hop on the left), flattened row-major.
    flat = sb.reshape(2, -1)
    np.testing.assert_array_equal(flat[:, ht * hop:ht * hop + y.shape[1]],
                                  y)
    assert np.all(flat[:, :ht * hop] == 0)


def test_frontend_profiling_stages(rng):
    # stage='no_median' (fixed near-0.5 masks) and raw_out are profiling
    # hooks; they must not disturb the default path and must produce the
    # documented shapes/semantics.
    n_fft, win, hop = 400, 400, 160
    M = _mel(16, n_fft)
    y = rng.standard_normal((1, 16_000)).astype(np.float32)
    kw = dict(n_fft=n_fft, win_length=win, hop_length=hop, l_harm=21,
              l_perc=11, power=2.0, interpret=True)
    Hr, Pr = fp._frontend_pallas(jnp.asarray(y), jnp.asarray(M).T,
                                 tile_t=48, raw_out=True, **kw)
    assert Hr.ndim == 4 and Hr.shape[2] == 48  # (B, nT, tile_t, n_mels)
    Hn, Pn = fp._frontend_pallas(jnp.asarray(y), jnp.asarray(M).T,
                                 tile_t=48, stage="no_median", **kw)
    # Distinct masks (CSE-proofing) -> the two heads differ slightly and
    # their mean is exactly mel(0.5 * S).
    assert np.any(np.asarray(Hn) != np.asarray(Pn))
    from sm_hpss_mtl_tpu.ops import stft as stft_mod
    S = stft_mod.stft_mag(jnp.asarray(y), n_fft=n_fft, win_length=win,
                          hop_length=hop)
    mel_half = np.einsum("mf,bft->bmt", M, 0.5 * np.asarray(S))
    np.testing.assert_allclose((np.asarray(Hn) + np.asarray(Pn)) / 2,
                               mel_half, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("B,n_samples,tile_t,chunk_tiles", [
    (2, 40_000, 24, 4),    # T=248, nT=11 -> segments of 4 tiles
    (3, 40_000, 24, 3),    # odd batch, 3-tile segments
    (2, 40_000, 24, 10),   # ragged last segment folds the tiny tail
    (4, 20_000, 24, 2),    # shorter rows, thin segments
])
def test_frontend_time_chunking_matches_single_call(
        rng, B, n_samples, tile_t, chunk_tiles):
    """Time-segment sub-calls (real-audio halos via the halo_in_audio
    contract, edge mirrors only at the global first/last segments) must
    match the single-grid kernel to f32 rounding — the per-frame DFT
    contractions and the seam medians are the same computations."""
    n_fft, win, hop, l_harm, l_perc = 400, 400, 160, 21, 11
    M = _mel(16, n_fft)
    y = rng.standard_normal((B, n_samples)).astype(np.float32)
    kw = dict(n_fft=n_fft, win_length=win, hop_length=hop,
              l_harm=l_harm, l_perc=l_perc, power=2.0,
              dft_precision="bf16x3", interpret=True)
    Mt = jnp.asarray(M, jnp.float32).T
    T = 1 + (n_samples - n_fft) // hop
    ref = fp._frontend_pallas(jnp.asarray(y), Mt,
                              tile_t=fp._pick_tile(T, tile_t), **kw)
    got = fp._chunked_frontend(jnp.asarray(y), Mt, tile_cap=tile_t,
                               chunk_tiles=chunk_tiles, **kw)
    assert got[0].shape == ref[0].shape
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_frontend_chunking_single_call_cases(rng):
    """chunk_tiles=None, B==1, and small inputs take the single-call
    path (B==1 measured FASTER unchunked — see _chunked_frontend)."""
    M = _mel(16, 400)
    y2 = rng.standard_normal((2, 8_000)).astype(np.float32)
    a = fp.stft_hpss_mel(jnp.asarray(y2), M, interpret=True,
                         chunk_tiles=None)
    b = fp.stft_hpss_mel(jnp.asarray(y2), M, interpret=True,
                         chunk_tiles=4)
    for x, z in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))
    # B==1 long row: chunked call must be bit-identical (single path).
    y1 = rng.standard_normal((1, 40_000)).astype(np.float32)
    kw = dict(n_fft=400, win_length=400, hop_length=160, l_harm=21,
              l_perc=11, power=2.0, dft_precision="bf16x3",
              interpret=True)
    Mt = jnp.asarray(M, jnp.float32).T
    c = fp._chunked_frontend(jnp.asarray(y1), Mt, tile_cap=24,
                             chunk_tiles=4, **kw)
    d = fp._frontend_pallas(jnp.asarray(y1), Mt,
                            tile_t=fp._pick_tile(248, 24), **kw)
    for x, z in zip(c, d):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))
