"""File-level featurization with on-device compute and npy caching.

Mirrors ``get_featuregram`` (``/root/reference/lib/preprocessing.py:
355-457``): per (class, file[, mix partner, SMR]) featuregrams, cached as
``<cache_dir>/<classname>/<name>.npy`` with the reference's exact cache
naming (``spstem_mustem_<dB>dB`` for mixtures), so a cache written by one
run is reusable by any driver.

The compute itself runs on the accelerator through
``ops.featuregram.featuregram`` (STFT -> HPSS (Pallas on TPU) -> mel ->
log in one program).  Audio is featurized at its exact length — compile
once per distinct length; the persistent JAX compile cache plus the npy
cache make this a first-epoch-only cost, matching the reference's
"slow epoch 1, then disk" behavior with a far faster epoch 1.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import featuregram as fg
from ..ops.mixing import mix_signals_np
from .audio import load_and_preprocess_signal


@dataclass(frozen=True)
class FeatureConfig:
    """Per-model feature settings (the reference's featName/n_fft/n_mels/
    l_harm/l_perc PARAMS sub-dicts, ``Proposed_Work_Results.py:750-797``)."""
    feat_name: str = "LogMelHarmPercSpec"
    sr: int = 16000
    n_fft: int = 400
    win_length: int = 400
    hop_length: int = 160
    n_mels: int = 120
    l_harm: int = 21
    l_perc: int = 11
    Tw: int = 25
    Ts: int = 10

    @property
    def dim(self) -> int:
        return fg.feature_dim(self.feat_name, n_fft=self.n_fft,
                              n_mels=self.n_mels)


def mixture_cache_name(sp_path: str, mu_path: str, target_db) -> str:
    stem = lambda p: os.path.basename(p).rsplit(".", 1)[0]
    if sp_path and mu_path:
        return f"{stem(sp_path)}_{stem(mu_path)}_{target_db}dB"
    return stem(sp_path or mu_path)


class Featurizer:
    """Callable file -> (D, T) featuregram with optional disk cache."""

    def __init__(self, config: FeatureConfig, cache_dir: str | None = None,
                 use_pallas: bool | None = None):
        self.config = config
        self.cache_dir = cache_dir
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    def _compute(self, audio: np.ndarray) -> np.ndarray:
        c = self.config
        out = fg.featuregram(
            jnp.asarray(audio), feat_name=c.feat_name, sr=c.sr,
            n_fft=c.n_fft, win_length=c.win_length, hop_length=c.hop_length,
            n_mels=c.n_mels, l_harm=c.l_harm, l_perc=c.l_perc,
            use_pallas=self.use_pallas)
        return np.asarray(out, dtype=np.float32)

    def featuregram(self, classname: str, sp_path: str = "",
                    mu_path: str = "", target_db=None,
                    save_feat: bool = True) -> np.ndarray:
        """Featuregram for one item; ``classname`` in {'speech', 'music',
        'speech_music', 'speech_noise', 'noise', 'muspeak'}."""
        name = mixture_cache_name(sp_path, mu_path, target_db)
        cache_path = None
        if self.cache_dir:
            cache_path = os.path.join(self.cache_dir, classname, name + ".npy")
            if os.path.exists(cache_path):
                return np.load(cache_path, allow_pickle=False)

        c = self.config
        if classname in ("speech_music", "speech_noise"):
            sp, _ = load_and_preprocess_signal(sp_path, c.Tw, c.Ts)
            mu, _ = load_and_preprocess_signal(mu_path, c.Tw, c.Ts)
            audio = mix_signals_np(sp, mu, target_db).astype(np.float32)
        elif classname in ("speech", "muspeak"):
            audio, _ = load_and_preprocess_signal(sp_path, c.Tw, c.Ts)
        else:  # music / noise
            audio, _ = load_and_preprocess_signal(mu_path, c.Tw, c.Ts)

        fv = self._compute(audio)
        if cache_path and save_feat:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            np.save(cache_path, fv)
        return fv
