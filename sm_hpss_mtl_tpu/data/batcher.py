"""Class-balanced infinite batch stream with MTL label construction.

Semantics follow the reference's ``generator``
(``/root/reference/Proposed_Work_Results.py:49-270``):

- Per class, files are shuffled and consumed; the list refills (and
  reshuffles) when exhausted.  Every file contributes *all* its patches;
  leftovers beyond the per-class quota are carried to later batches.
- Each batch stacks ``batch_size`` patches per class in the order
  music(0), speech(1)[, speech_music(2)] — so the effective batch is
  ``n_classes * batch_size``.
- Label encodings (:170-262): S=1 for speech only, M=1 for music only —
  the mixture class gets 0 on both (driver quirk, replicated);
  R = [music_ratio, speech_ratio] with music [1,0], speech [0,1] and
  mixtures [10^(-dB/10), 1] (dB>=0) / [1, 10^(dB/10)] (dB<0);
  3C = one-hot class.
- Optional Gaussian noise augmentation with scale drawn from
  {5e-3, 1e-3, 5e-4, 1e-4} (:239-242), optional frame-level scaling with
  per-fold corpus stats, optional skewness-vector features (:97-113).
- TCN-family models receive (N, T, D) patches; CNN models (N, D, W, 1).

Unlike the reference's ``np.append`` accumulation (quadratic copying,
SURVEY.md §3.1), buffers are lists of arrays concatenated once per
assembly.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np

from .. import native
from ..ops.patches import extract_patches_np, standardize_rows
from .featurize import Featurizer

_NOISE_SCALES = (5e-3, 1e-3, 5e-4, 1e-4)


def scale_frames(fv: np.ndarray, mean: np.ndarray, stdev: np.ndarray) -> np.ndarray:
    """Frame-level corpus scaling (``tools.pyx:138-166``):
    ``(FV - mean) / (stdev + 1e-10)`` with per-row stats."""
    return (fv - mean[:, None]) / (stdev[:, None] + 1e-10)


@dataclass
class BatcherConfig:
    batch_size: int = 16
    patch_size: int = 68
    patch_shift: int = 68
    feat_name: str = "LogMelHarmPercSpec"
    #: 'time_mel' (TCN) or 'image' (CNNs) patch layout.
    input_kind: str = "time_mel"
    augment_noise: bool = True
    frame_level_scaling: bool = False
    #: None | 'Row' | 'Col'
    skewness_vector: str | None = None
    #: emit {'harm_input','perc_input'} dict batches (intermediate fusion)
    dual_tower: bool = False
    seed: int = 0
    #: LRU byte budget for per-file extracted patches (0 disables).
    #: Standardize+extract is deterministic per (file, config), so
    #: revisited files skip it entirely; the featuregram-level cache in
    #: Featurizer stays the fallback for evicted entries.
    patch_cache_mb: int = 512


class _ClassStream:
    """One class's file queue + leftover patch buffer.

    ``take`` consumes from the front via a cursor and only copies the
    ``n`` patches it returns — a long file's leftover buffer (thousands
    of patches) is never recopied per batch (the reference's
    ``np.append`` equivalent was quadratic, SURVEY.md §3.1)."""

    def __init__(self, items: list, rng: np.random.Generator):
        self.items = list(items)
        self.queue: list = []
        self.rng = rng
        self.buf: list[np.ndarray] = []
        self.dbs: list[np.ndarray] = []
        self.offset = 0  # consumed rows of buf[0]
        self.count = 0

    def next_item(self):
        if not self.queue:
            self.queue = list(self.items)
            self.rng.shuffle(self.queue)
        return self.queue.pop()

    def push(self, patches: np.ndarray, db=None):
        self.buf.append(patches)
        n = patches.shape[0]
        self.dbs.append(np.full((n,), np.nan if db is None else db))
        self.count += n

    def take_into(self, out: np.ndarray) -> np.ndarray:
        """Consume ``len(out)`` patches directly into ``out`` (one copy —
        the take-then-concatenate path copied the whole batch twice).
        Returns the consumed per-patch dB values."""
        n = out.shape[0]
        db_out = np.empty((n,))
        filled = 0
        while filled < n:
            arr, dbs = self.buf[0], self.dbs[0]
            avail = arr.shape[0] - self.offset
            k = min(avail, n - filled)
            out[filled:filled + k] = arr[self.offset:self.offset + k]
            db_out[filled:filled + k] = dbs[self.offset:self.offset + k]
            self.offset += k
            filled += k
            if self.offset == arr.shape[0]:
                self.buf.pop(0)
                self.dbs.pop(0)
                self.offset = 0
        self.count -= n
        return db_out


class BalancedBatcher:
    """Infinite iterator over class-balanced batches.

    ``file_list`` is the fold dict from ``folds.get_train_test_files``:
    {'music': [...], 'speech': [...], 'speech+music': [{'speech','music',
    'SMR'}, ...]}; the mixture key is optional (2-class mode).
    """

    def __init__(self, featurizer: Featurizer, folder: str, file_list: dict,
                 config: BatcherConfig, fold_stats: tuple | None = None):
        self.fz = featurizer
        self.folder = folder
        self.cfg = config
        self.fold_stats = fold_stats
        self.rng = np.random.default_rng(config.seed)
        if "speech+noise" in file_list:
            self.n_classes = 5
        elif "speech+music" in file_list:
            self.n_classes = 3
        else:
            self.n_classes = 2
        self.streams = {
            "music": _ClassStream(file_list["music"], self.rng),
            "speech": _ClassStream(file_list["speech"], self.rng),
        }
        if self.n_classes >= 3:
            self.streams["speech_music"] = _ClassStream(
                file_list["speech+music"], self.rng)
        if self.n_classes == 5:
            self.streams["noise"] = _ClassStream(file_list["noise"], self.rng)
            self.streams["speech_noise"] = _ClassStream(
                file_list["speech+noise"], self.rng)
        self._patch_cache: OrderedDict = OrderedDict()
        self._patch_bytes = 0
        self._patch_limit = config.patch_cache_mb * (1 << 20)
        #: patch-LRU behavior counters (cold-regime diagnosis at corpus
        #: scale: hits/misses/evictions; read by tools/scale_rehearsal).
        self.cache_stats = {"hits": 0, "misses": 0, "evictions": 0}

    # -- featurization ----------------------------------------------------
    def _pc_get(self, key):
        hit = self._patch_cache.get(key)
        if hit is not None:
            self._patch_cache.move_to_end(key)
            self.cache_stats["hits"] += 1
        else:
            self.cache_stats["misses"] += 1
        return hit

    def _pc_put(self, key, patches: np.ndarray, db):
        if patches.nbytes > self._patch_limit:
            return
        self._patch_cache[key] = (patches, db)
        self._patch_bytes += patches.nbytes
        while self._patch_bytes > self._patch_limit:
            _, (old, _db) = self._patch_cache.popitem(last=False)
            self._patch_bytes -= old.nbytes
            self.cache_stats["evictions"] += 1

    def _patches_for(self, classname: str, item):
        if self._patch_limit > 0:
            if isinstance(item, dict):
                key = (classname, item["speech"],
                       item.get("music") or item.get("noise"), item["SMR"])
            else:
                key = (classname, item)
            hit = self._pc_get(key)
            if hit is not None:
                return hit
            patches, db = self._patches_for_uncached(classname, item)
            if patches is not None:
                self._pc_put(key, patches, db)
            return patches, db
        return self._patches_for_uncached(classname, item)

    def _patches_for_uncached(self, classname: str, item):
        if classname in ("speech_music", "speech_noise"):
            partner_dir = "music" if classname == "speech_music" else "noise"
            partner_key = "music" if classname == "speech_music" else "noise"
            sp = os.path.join(self.folder, "speech", item["speech"])
            mu = os.path.join(self.folder, partner_dir, item[partner_key])
            if not (os.path.exists(sp) and os.path.exists(mu)):
                return None, None
            fv = self.fz.featuregram(classname, sp, mu, item["SMR"])
            db = item["SMR"]
        elif classname == "speech":
            sp = os.path.join(self.folder, "speech", item)
            if not os.path.exists(sp):
                return None, None
            fv = self.fz.featuregram("speech", sp_path=sp)
            db = None
        else:  # music / noise
            mu = os.path.join(self.folder, classname, item)
            if not os.path.exists(mu):
                return None, None
            fv = self.fz.featuregram(classname, mu_path=mu)
            db = None

        if self.cfg.frame_level_scaling and self.fold_stats is not None:
            fv = scale_frames(fv, *self.fold_stats)
        patches = self._extract(fv)
        return patches, db

    def _extract(self, fv: np.ndarray) -> np.ndarray:
        """Per-featName patching incl. the harm/perc split-standardize-
        reassemble of ``get_feature_patches`` (preprocessing.py:137-292)."""
        cfg = self.cfg
        dual = "HarmPerc" in cfg.feat_name
        if dual:
            half = fv.shape[0] // 2
            parts = [fv[:half], fv[half:]]
        else:
            parts = [fv]
        use_native = native.available()
        out = []
        for part in parts:
            if not cfg.frame_level_scaling:
                part = (native.standardize_rows(part) if use_native
                        else np.asarray(standardize_rows(part)))
            ex = native.extract_patches if use_native else extract_patches_np
            out.append(ex(part, cfg.patch_size, cfg.patch_shift))
        patches = np.concatenate(out, axis=1) if dual else out[0]
        if cfg.skewness_vector:
            from ..ops.stats import patch_statistics
            axis = 1 if cfg.skewness_vector == "Row" else 0
            stats = np.asarray(patch_statistics(patches, stat_type="skew",
                                                axis=axis))
            patches = stats[:, :, None] if axis == 1 else stats[:, None, :]
        patches = np.asarray(patches, dtype=np.float32)
        if self.cfg.input_kind == "time_mel":
            # Store per-file patches in the model's (N, T, D) layout so
            # batch assembly is a contiguous concat — the per-batch
            # transposed copy dominated assembly on this host (~21 ms of
            # a 32 ms batch); done here it amortizes over the patch cache.
            patches = np.ascontiguousarray(np.transpose(patches, (0, 2, 1)))
        return patches

    # -- assembly ---------------------------------------------------------
    def _fill(self, classname: str):
        stream = self.streams[classname]
        while stream.count < self.cfg.batch_size:
            patches, db = self._patches_for(classname, stream.next_item())
            if patches is None:
                continue
            stream.push(patches, db)

    def __iter__(self):
        return self

    def __next__(self):
        bs = self.cfg.batch_size
        # Reference class order: music(0), speech(1), speech_music(2)[,
        # noise(3), speech_noise(4)] (5_class_classification.py:584-607).
        order = ["music", "speech"]
        if self.n_classes >= 3:
            order.append("speech_music")
        if self.n_classes == 5:
            order += ["noise", "speech_noise"]
        for cls in order:
            self._fill(cls)
        patch_shape = self.streams[order[0]].buf[0].shape[1:]
        x = np.empty((len(order) * bs, *patch_shape), np.float32)
        dbs = [self.streams[cls].take_into(x[i * bs:(i + 1) * bs])
               for i, cls in enumerate(order)]

        if self.cfg.input_kind != "time_mel":
            x = x[..., None]

        if self.cfg.augment_noise:
            # Same scale-choice stream as before (self.rng); the Gaussian
            # field itself comes from the native ziggurat sampler when
            # available — float32 end to end (the float64
            # ``rng.normal`` draw dominated warm batch assembly, ~36 ms
            # of a 56 ms batch on this host).
            scale = float(self.rng.choice(_NOISE_SCALES))
            if native.available():
                native.add_gaussian_noise(
                    x, scale, int(self.rng.integers(np.iinfo(np.int64).max)))
            else:
                x += (self.rng.standard_normal(x.shape, dtype=np.float32)
                      * np.float32(scale))

        labels = self._labels(dbs)
        if self.cfg.dual_tower:
            # Split the stacked [harm; perc] feature dim into the twin-tower
            # dict batch (Intermediate_Fusion_Results.py:47-318).
            d = x.shape[-1] // 2 if self.cfg.input_kind == "time_mel" else None
            if self.cfg.input_kind == "time_mel":
                x = {"harm_input": x[..., :d], "perc_input": x[..., d:]}
            else:
                h = x.shape[1] // 2
                x = {"harm_input": x[:, :h], "perc_input": x[:, h:]}
        return x, labels

    def _labels(self, dbs):
        bs = self.cfg.batch_size
        n = self.n_classes * bs
        y = np.repeat(np.arange(self.n_classes), bs)
        onehot = np.zeros((n, self.n_classes), np.float32)
        onehot[np.arange(n), y] = 1.0

        if self.n_classes == 5:
            return self._labels_5(dbs, onehot)

        s = np.zeros(n, np.float32)
        s[bs:2 * bs] = 1.0          # speech rows only (spmu=0, this driver)
        m = np.zeros(n, np.float32)
        m[:bs] = 1.0                # music rows only

        r = np.ones((3 * bs, 2), np.float32)
        r[:bs] = [1.0, 0.0]
        r[bs:2 * bs] = [0.0, 1.0]
        if self.n_classes == 3:
            mix_db = dbs[2]
            for i, db in enumerate(mix_db):
                if db >= 0:
                    r[2 * bs + i] = [10.0 ** (-db / 10.0), 1.0]
                else:
                    r[2 * bs + i] = [1.0, 10.0 ** (db / 10.0)]
        return {"S": s, "M": m, "R": r[:n], "3C": onehot}

    def _labels_5(self, dbs, onehot):
        """5-class encodings (``5_class_classification.py:608-671``).

        Note the driver differences vs the 3-class generator: here
        speech+music counts as S=1 AND M=1, and the R head is 3-dim
        [music, speech, noise] with the reference's (inconsistent but
        replicated) speech+noise convention."""
        bs = self.cfg.batch_size
        n = 5 * bs
        s = np.array([0, 1, 1, 0, 1], np.float32).repeat(bs)
        m = np.array([1, 0, 1, 0, 0], np.float32).repeat(bs)
        no = np.array([0, 0, 0, 1, 1], np.float32).repeat(bs)

        r = np.ones((n, 3), np.float32)
        r[:bs] = [1, 0, 0]
        r[bs:2 * bs] = [0, 1, 0]
        for i, db in enumerate(dbs[2]):          # speech+music
            if db >= 0:
                r[2 * bs + i] = [10.0 ** (-db / 10.0), 1.0, 0.0]
            else:
                r[2 * bs + i] = [1.0, 10.0 ** (db / 10.0), 0.0]
        r[3 * bs:4 * bs] = [0, 0, 1]
        for i, db in enumerate(dbs[4]):          # speech+noise
            if db >= 0:
                r[4 * bs + i] = [0.0, 10.0 ** (-db / 10.0), 1.0]
            else:
                r[4 * bs + i] = [0.0, 1.0, 10.0 ** (db / 10.0)]
        return {"S": s, "M": m, "N": no, "R": r, "3C": onehot}
