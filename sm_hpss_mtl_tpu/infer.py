"""Convenience inference API: checkpoint -> classify audio files.

The experiment drivers cover the paper's evaluation protocols; this is
the plain "user hands us a wav" path:

    from sm_hpss_mtl_tpu.infer import Classifier
    clf = Classifier.from_checkpoint("results/.../fold0_ckpt")
    out = clf.classify_file("clip.wav")
    out["class_name"], out["probabilities"], out["heads"]
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .data.featurize import FeatureConfig, Featurizer
from .eval.tester import FileWiseTester
from .models import get_model
from .train import TrainState, for_model, make_predict, restore_checkpoint
from .train.config import MODEL_PRESETS, TIME_MAJOR_MODELS

CLASS_NAMES = ("music", "speech", "speech_music", "noise", "speech_noise")


@dataclass
class Classifier:
    tester: FileWiseTester
    n_classes: int = 3

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, *,
                        model: str = "Lemaire_et_al_MTL",
                        n_classes: int = 3, patch_size: int = 68,
                        patch_shift: int = 68) -> "Classifier":
        preset = MODEL_PRESETS[model]
        feat_cfg = FeatureConfig(feat_name=preset["feat_name"],
                                 n_fft=preset["n_fft"],
                                 n_mels=preset["n_mels"])
        mels_kw = ({"n_mels": preset["n_mels"]}
                   if preset["n_mels"] > 0 else {})
        spec = get_model(model, n_classes=n_classes, **mels_kw)
        input_kind = ("time_mel" if any(model.startswith(m)
                                        for m in TIME_MAJOR_MODELS)
                      else "image")
        dim = feat_cfg.dim
        if input_kind == "time_mel":
            sample = jnp.zeros((2, patch_size, dim))
        else:
            sample = jnp.zeros((2, dim, patch_size, 1))
        opt, _ = for_model(model, tr_steps=1)
        template = TrainState.create(spec.module, opt, sample,
                                     jax.random.PRNGKey(0))
        state, _ = restore_checkpoint(ckpt_dir, template)
        predict = make_predict(spec.module)
        tester = FileWiseTester(
            featurizer=Featurizer(feat_cfg),
            predict_fn=lambda x: predict(state, x),
            folder="", feat_name=feat_cfg.feat_name,
            input_kind=input_kind, patch_size=patch_size,
            test_patch_shift=patch_shift, mtl=spec.mtl)
        return cls(tester=tester, n_classes=n_classes)

    def _summarize(self, pred: np.ndarray, heads) -> dict:
        probs = pred.mean(axis=0)
        label = int(np.argmax(probs))
        out = {"label": label,
               "class_name": CLASS_NAMES[label],
               "probabilities": probs,
               "patch_labels": np.argmax(pred, axis=1)}
        if isinstance(heads, dict):
            out["heads"] = {k: np.asarray(v).mean(axis=0)
                            for k, v in heads.items()}
        return out

    def classify_file(self, wav_path: str) -> dict:
        """Classify one audio file (treated as the 'muspeak' generic
        class for featurization purposes)."""
        pred, heads = self.tester.predict_file("muspeak", sp_path=wav_path)
        return self._summarize(pred, heads)

    def classify_pair(self, speech_path: str, music_path: str,
                      smr_db: float) -> dict:
        """Classify a speech+music mixture rendered at ``smr_db``."""
        pred, heads = self.tester.predict_file("speech_music", speech_path,
                                               music_path, smr_db)
        return self._summarize(pred, heads)
