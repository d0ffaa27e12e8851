"""Corpus-level feature statistics for frame-level scaling.

Mirrors ``get_data_stats`` (``/root/reference/lib/preprocessing.py:
461-586``): two passes over every training featuregram — per-class frame
sums for the mean (classes averaged with equal weight, not frame count),
then squared deviations for the stdev with ``(n-1)`` normalization.  The
reference accumulates in float128; numpy 2 dropped that alias, so we use
``np.longdouble`` (the same x87 80-bit type on this platform).

The per-fold (mean, stdev) pair feeds ``data.batcher.scale_frames`` /
the native ``scale_frames`` kernel when
``ExperimentConfig.frame_level_scaling`` is on.
"""

from __future__ import annotations

import os

import numpy as np

from .featurize import Featurizer


def _iter_class_featuregrams(featurizer: Featurizer, folder: str,
                             files_by_class: dict):
    for cls, files in files_by_class.items():
        for item in files:
            if isinstance(item, dict):
                sp = os.path.join(folder, "speech", item["speech"])
                partner = "music" if "music" in item else "noise"
                mu = os.path.join(folder, partner, item[partner])
                if not (os.path.exists(sp) and os.path.exists(mu)):
                    continue
                yield cls, featurizer.featuregram(
                    "speech_music" if partner == "music" else "speech_noise",
                    sp, mu, item["SMR"])
            else:
                sub = "speech" if cls == "speech" else cls
                path = os.path.join(folder, sub, item)
                if not os.path.exists(path):
                    continue
                kw = ({"sp_path": path} if cls == "speech"
                      else {"mu_path": path})
                yield cls, featurizer.featuregram(cls, **kw)


def _clean(fv: np.ndarray) -> np.ndarray:
    """Drop rows containing NaN/Inf (preprocessing.py:507-508) after
    transposing to frames-major."""
    fv = fv.T
    good = np.isfinite(fv).all(axis=1)
    return fv[good]


def get_data_stats(featurizer: Featurizer, folder: str,
                   files_by_class: dict) -> tuple[np.ndarray, np.ndarray]:
    """(mean, stdev) float32 vectors of length D over the training files.

    ``files_by_class``: {'music': [...], 'speech': [...],
    'speech+music': [pair dicts]} — the classes are averaged with equal
    weight for the mean, like the reference.
    """
    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}
    for cls, fv in _iter_class_featuregrams(featurizer, folder,
                                            files_by_class):
        frames = _clean(fv).astype(np.longdouble)
        sums[cls] = sums.get(cls, 0) + frames.sum(axis=0)
        counts[cls] = counts.get(cls, 0) + frames.shape[0]

    class_means = [sums[c] / (counts[c] + 1e-10) for c in sums]
    overall_mean = np.sum(class_means, axis=0) / len(class_means)

    sq = np.zeros_like(overall_mean)
    n_frames = 0
    for cls, fv in _iter_class_featuregrams(featurizer, folder,
                                            files_by_class):
        frames = _clean(fv).astype(np.longdouble)
        sq += ((frames - overall_mean) ** 2).sum(axis=0)
        n_frames += frames.shape[0]
    stdev = np.sqrt(sq / max(n_frames - 1, 1))
    return (np.asarray(overall_mean, np.float32),
            np.asarray(stdev, np.float32))


def load_or_compute_fold_stats(cache_path: str, featurizer: Featurizer,
                               folder: str, files_by_class: dict):
    """Cached (mean, stdev), the reference's resume idiom."""
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        return z["mean"], z["stdev"]
    mean, stdev = get_data_stats(featurizer, folder, files_by_class)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    np.savez(cache_path, mean=mean, stdev=stdev)
    return mean, stdev
