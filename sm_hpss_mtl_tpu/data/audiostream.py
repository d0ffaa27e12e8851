"""Raw-audio streaming for the fully on-device training pipeline.

The reference's hot loop featurizes on the host inside its generator
(``/root/reference/Proposed_Work_Results.py:49-270``); round 1 measured
that path at ~7.6 ms/48-patch batch against a 0.2-0.3 ms device step —
the chip idles >95%.  This module is the TPU-native alternative: the
host only serves class-balanced **raw audio crops** (a memmap slice per
clip — microseconds), and STFT/HPSS/mel/patching/training all run in
one XLA program (``train.endtoend.make_audio_train_step``).

Semantics vs the host batcher (documented deltas, not quirks):

- The host batcher walks *whole files* and carries leftover patches
  across batches (the reference's stateful generator).  Here each step
  samples a fixed-length **random crop** per clip; a crop of
  ``k * patch_size`` frames yields exactly ``k`` patches on device.
  Class balance per step is identical (equal clips per class); file
  coverage is sampling-with-shuffled-queues rather than exhaustive
  sweeps.
- Labels are **clip-level** and broadcast patch-wise on device — the
  same values the host batcher assigns (every patch of a file carries
  the file's class/SMR labels there too).
- Per-featuregram row standardization happens on device over the crop's
  frames rather than the whole file's (a crop-local mean/std).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.mixing import mix_signals_np
from .audio import load_and_preprocess_signal
from .featurize import FeatureConfig, mixture_cache_name


def crop_samples(n_patches: int, patch_size: int, cfg: FeatureConfig,
                 patch_shift: int | None = None) -> int:
    """Samples for exactly ``n_patches`` windows of ``patch_size`` frames
    at stride ``patch_shift`` (center=False framing: T frames need
    (T-1)*hop + win samples)."""
    shift = patch_size if patch_shift is None else patch_shift
    frames = (n_patches - 1) * shift + patch_size
    return (frames - 1) * cfg.hop_length + cfg.win_length


class AudioCache:
    """Preprocessed-audio cache (the audio-domain analog of the
    featuregram cache): ``load_and_preprocess_signal`` (+ SMR mixing for
    mixture classes) computed once per (class, file[, partner, SMR]) and
    stored as float32 ``.npy``; reads are ``mmap`` so a random crop only
    touches its own pages."""

    def __init__(self, cache_dir: str | None = None, Tw: int = 25,
                 Ts: int = 10, max_open: int = 512):
        self.cache_dir = cache_dir
        self.Tw, self.Ts = Tw, Ts
        self._mem: dict[str, np.ndarray] = {}
        # Open-memmap LRU: np.load(mmap_mode) costs ~0.3 ms in open+header
        # parse — at 12 clips/step that alone would dwarf the device step.
        self._open: "dict[str, np.ndarray]" = {}
        self._max_open = max_open

    def _compute(self, classname: str, sp_path, mu_path, smr):
        if classname in ("speech_music", "speech_noise"):
            sp, _ = load_and_preprocess_signal(sp_path, self.Tw, self.Ts)
            mu, _ = load_and_preprocess_signal(mu_path, self.Tw, self.Ts)
            return mix_signals_np(sp, mu, smr).astype(np.float32)
        path = sp_path or mu_path
        audio, _ = load_and_preprocess_signal(path, self.Tw, self.Ts)
        return audio.astype(np.float32)

    def get(self, classname: str, sp_path=None, mu_path=None, smr=None
            ) -> np.ndarray:
        key = f"{classname}/{mixture_cache_name(sp_path, mu_path, smr)}"
        if self.cache_dir is None:
            if key not in self._mem:
                self._mem[key] = self._compute(classname, sp_path, mu_path,
                                               smr)
            return self._mem[key]
        npy = os.path.join(self.cache_dir, key + ".npy")
        mm = self._open.get(npy)
        if mm is not None:
            return mm
        if not os.path.exists(npy):
            os.makedirs(os.path.dirname(npy), exist_ok=True)
            audio = self._compute(classname, sp_path, mu_path, smr)
            tmp = npy + f".tmp{os.getpid()}.npy"
            np.save(tmp, audio)
            os.replace(tmp, npy)
        mm = np.load(npy, mmap_mode="r")
        if len(self._open) >= self._max_open:
            self._open.pop(next(iter(self._open)))
        self._open[npy] = mm
        return mm


class _FileQueue:
    """Shuffle-refill file queue (the batcher's stream discipline)."""

    def __init__(self, items: list, rng: np.random.Generator):
        self.items = list(items)
        self.queue: list = []
        self.rng = rng

    def next(self):
        if not self.queue:
            self.queue = list(self.items)
            self.rng.shuffle(self.queue)
        return self.queue.pop()


class AudioCropBatcher:
    """Infinite iterator of ``(audio (n_classes*c, L), clip labels)``.

    ``c = clips_per_class``; ``L = crop_samples(n_patches_per_clip,
    patch_size, cfg)``.  Per-step patch budget per class is
    ``c * n_patches_per_clip`` (pick them so it equals the host
    batcher's ``batch_size``).  Label encodings match
    ``BalancedBatcher._labels`` exactly (clip-level rows).
    """

    def __init__(self, cache: AudioCache, folder: str, file_list: dict,
                 cfg: FeatureConfig, *, clips_per_class: int,
                 n_patches_per_clip: int, patch_size: int,
                 patch_shift: int | None = None, seed: int = 0,
                 min_crop_s: float = 0.0):
        self.cache = cache
        self.folder = folder
        self.cfg = cfg
        self.c = clips_per_class
        # min_crop_s floors the crop length: the device step standardizes
        # over the WHOLE crop but trains only on the first
        # n_patches_per_clip windows (endtoend.device_featurize_patches
        # max_patches) — longer crops give stabler crop-local stats on
        # non-stationary real audio without reducing clips per step.
        self.L = max(crop_samples(n_patches_per_clip, patch_size, cfg,
                                  patch_shift=patch_shift),
                     int(min_crop_s * cfg.sr))
        self.rng = np.random.default_rng(seed)
        if "speech+noise" in file_list:
            self.n_classes = 5
        elif "speech+music" in file_list:
            self.n_classes = 3
        else:
            self.n_classes = 2
        self.order = ["music", "speech"]
        if self.n_classes >= 3:
            self.order.append("speech_music")
        if self.n_classes == 5:
            self.order += ["noise", "speech_noise"]
        key_of = {"speech_music": "speech+music",
                  "speech_noise": "speech+noise"}
        self.queues = {cls: _FileQueue(file_list[key_of.get(cls, cls)],
                                       self.rng)
                       for cls in self.order}
        self._exists: dict[str, bool] = {}

    def _path_ok(self, path: str) -> bool:
        # Memoized positives only: os.path.exists is a syscall per clip
        # per STEP on the hot path, and present corpus files don't vanish
        # mid-run — but absent ones may appear later (cache warm-up,
        # late mount), so misses are re-checked.
        if path in self._exists:
            return True
        ok = os.path.exists(path)
        if ok:
            self._exists[path] = True
        return ok

    # -- clip sampling ------------------------------------------------------

    def _clip_audio(self, classname: str, item):
        if classname in ("speech_music", "speech_noise"):
            partner = "music" if classname == "speech_music" else "noise"
            sp = os.path.join(self.folder, "speech", item["speech"])
            mu = os.path.join(self.folder, partner, item[partner])
            if not (self._path_ok(sp) and self._path_ok(mu)):
                return None, None
            audio = self.cache.get(classname, sp, mu, item["SMR"])
            db = float(item["SMR"])
        else:
            sub = "speech" if classname == "speech" else classname
            path = os.path.join(self.folder, sub, item)
            if not self._path_ok(path):
                return None, None
            kw = ({"sp_path": path} if classname == "speech"
                  else {"mu_path": path})
            audio = self.cache.get(classname, **kw)
            db = None
        return audio, db

    def _crop_into(self, out: np.ndarray, audio: np.ndarray) -> None:
        """Write one random crop into ``out`` (one copy, straight from
        the mmap; no intermediate materialization)."""
        n = audio.shape[0]
        if n >= self.L:
            start = int(self.rng.integers(0, n - self.L + 1))
            out[:] = audio[start:start + self.L]
            return
        # Short clip: wrap-tile (the patching wrap rule, tools.pyx:29-38),
        # rotated to a random phase — a fixed phase would make every crop
        # of a short clip identical (no crop augmentation), which
        # silently collapses training when ``min_crop_s`` exceeds the
        # corpus clip length (observed: 0.82 -> 0.44 accuracy).
        off = int(self.rng.integers(0, n))
        pos = 0
        while pos < self.L:
            m = min(n - off, self.L - pos)
            out[pos:pos + m] = audio[off:off + m]
            pos += m
            off = 0 if off + m >= n else off + m

    def __iter__(self):
        return self

    def __next__(self):
        batch = np.empty((self.n_classes * self.c, self.L), np.float32)
        row, dbs = 0, {}
        for cls in self.order:
            got, cls_dbs = 0, []
            misses = 0
            max_misses = 4 * max(len(self.queues[cls].items), 1)
            while got < self.c:
                if misses >= max_misses:
                    raise FileNotFoundError(
                        f"class '{cls}': no readable audio after "
                        f"{misses} attempts — corpus files missing under "
                        f"{self.folder}")
                audio, db = self._clip_audio(cls, self.queues[cls].next())
                if audio is None:
                    misses += 1
                    continue
                self._crop_into(batch[row], audio)
                row += 1
                cls_dbs.append(np.nan if db is None else db)
                got += 1
            dbs[cls] = np.asarray(cls_dbs)
        return batch, self._labels(dbs)

    # -- labels (BalancedBatcher._labels, clip-level) -----------------------

    def _labels(self, dbs: dict) -> dict:
        c = self.c
        n = self.n_classes * c
        y = np.repeat(np.arange(self.n_classes), c)
        onehot = np.zeros((n, self.n_classes), np.float32)
        onehot[np.arange(n), y] = 1.0
        if self.n_classes == 5:
            return self._labels_5(dbs, onehot)

        s = np.zeros(n, np.float32)
        s[c:2 * c] = 1.0
        m = np.zeros(n, np.float32)
        m[:c] = 1.0
        r = np.ones((3 * c, 2), np.float32)
        r[:c] = [1.0, 0.0]
        r[c:2 * c] = [0.0, 1.0]
        if self.n_classes == 3:
            for i, db in enumerate(dbs["speech_music"]):
                if db >= 0:
                    r[2 * c + i] = [10.0 ** (-db / 10.0), 1.0]
                else:
                    r[2 * c + i] = [1.0, 10.0 ** (db / 10.0)]
        return {"S": s, "M": m, "R": r[:n], "3C": onehot}

    def _labels_5(self, dbs: dict, onehot: np.ndarray) -> dict:
        c = self.c
        n = 5 * c
        s = np.array([0, 1, 1, 0, 1], np.float32).repeat(c)
        m = np.array([1, 0, 1, 0, 0], np.float32).repeat(c)
        no = np.array([0, 0, 0, 1, 1], np.float32).repeat(c)
        r = np.ones((n, 3), np.float32)
        r[:c] = [1, 0, 0]
        r[c:2 * c] = [0, 1, 0]
        for i, db in enumerate(dbs["speech_music"]):
            if db >= 0:
                r[2 * c + i] = [10.0 ** (-db / 10.0), 1.0, 0.0]
            else:
                r[2 * c + i] = [1.0, 10.0 ** (db / 10.0), 0.0]
        r[3 * c:4 * c] = [0, 0, 1]
        for i, db in enumerate(dbs["speech_noise"]):
            if db >= 0:
                r[4 * c + i] = [0.0, 10.0 ** (-db / 10.0), 1.0]
            else:
                r[4 * c + i] = [0.0, 1.0, 10.0 ** (db / 10.0)]
        return {"S": s, "M": m, "N": no, "R": r, "3C": onehot}
