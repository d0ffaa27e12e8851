"""File-wise model evaluation and the SMR sweep.

Mirrors ``test_file_wise_generator`` / ``test_model`` / ``perform_testing``
(``/root/reference/Proposed_Work_Results.py:459-673``): every test file
is featurized (without cache writes), cut into patches with the
reference's hard-coded test shift of 68 frames (:474 — deliberately kept
as a config default, see ``ExperimentConfig.test_patch_shift``),
predicted patch-wise, and scored with argmax over the 3C head; the
optional SMR sweep re-mixes every speech+music pair at each target dB.

Patches from one file form one device batch; files are processed in
sequence with the same jitted predict function (one compile per patch
count bucket — patch counts vary by file length, so patch batches are
padded up to the next power of two and masked).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..data.batcher import scale_frames
from ..data.featurize import Featurizer
from ..ops.patches import extract_patches_np, standardize_rows
from .metrics import get_performance


def _pad_pow2(x: np.ndarray) -> tuple[np.ndarray, int]:
    n = x.shape[0]
    m = 1
    while m < n:
        m *= 2
    if m == n:
        return x, n
    pad = np.repeat(x[-1:], m - n, axis=0)
    return np.concatenate([x, pad], axis=0), n


@dataclass
class FileWiseTester:
    featurizer: Featurizer
    predict_fn: callable          # (batch) -> outputs (dict or (B,C) probs)
    folder: str
    feat_name: str
    input_kind: str = "time_mel"
    patch_size: int = 68
    test_patch_shift: int = 68
    mtl: bool = True
    frame_level_scaling: bool = False
    fold_stats: tuple | None = None
    skewness_vector: str | None = None
    #: split patches into {'harm_input','perc_input'} (intermediate fusion)
    dual_tower: bool = False

    def file_patches(self, classname: str, sp_path: str = "",
                     mu_path: str = "", target_db=None) -> np.ndarray:
        fv = self.featurizer.featuregram(classname, sp_path, mu_path,
                                         target_db, save_feat=False)
        if self.frame_level_scaling and self.fold_stats is not None:
            fv = scale_frames(fv, *self.fold_stats)
        dual = "HarmPerc" in self.feat_name
        parts = ([fv[:fv.shape[0] // 2], fv[fv.shape[0] // 2:]]
                 if dual else [fv])
        out = []
        for part in parts:
            if not self.frame_level_scaling:
                part = np.asarray(standardize_rows(part))
            out.append(extract_patches_np(part, self.patch_size,
                                          self.test_patch_shift))
        patches = np.concatenate(out, axis=1) if dual else out[0]
        if self.skewness_vector:
            from ..ops.stats import patch_statistics
            axis = 1 if self.skewness_vector == "Row" else 0
            stats = np.asarray(patch_statistics(patches, stat_type="skew",
                                                axis=axis))
            patches = stats[:, :, None] if axis == 1 else stats[:, None, :]
        if self.input_kind == "time_mel":
            patches = np.transpose(patches, (0, 2, 1))
        else:
            patches = patches[..., None]
        return patches.astype(np.float32)

    def predict_file(self, classname: str, sp_path: str = "",
                     mu_path: str = "", target_db=None):
        patches = self.file_patches(classname, sp_path, mu_path, target_db)
        padded, n = _pad_pow2(patches)
        if self.dual_tower:
            if self.input_kind == "time_mel":
                d = padded.shape[-1] // 2
                padded = {"harm_input": jnp.asarray(padded[..., :d]),
                          "perc_input": jnp.asarray(padded[..., d:])}
            else:
                h = padded.shape[1] // 2
                padded = {"harm_input": jnp.asarray(padded[:, :h]),
                          "perc_input": jnp.asarray(padded[:, h:])}
            out = self.predict_fn(padded)
        else:
            out = self.predict_fn(jnp.asarray(padded))
        if isinstance(out, dict):
            out = {k: np.asarray(v)[:n] for k, v in out.items()}
            pred = out["3C"]
        else:
            out = np.asarray(out)[:n]
            pred = out
        return pred, out

    # ------------------------------------------------------------------
    def test_model(self, test_files: dict, target_db=None,
                   verbose: bool = False):
        """Full test pass.  ``target_db=None`` uses each pair's annotated
        SMR; otherwise every pair is remixed at ``target_db``."""
        preds, labels, gts = [], [], []

        singles = [("music", 0), ("speech", 1)]
        if "speech+noise" in test_files:
            singles.append(("noise", 3))
        if target_db is None:
            for classname, label in singles:
                for fl in test_files.get(classname, []):
                    path = os.path.join(self.folder, classname, fl)
                    if not os.path.exists(path):
                        continue
                    sp, mu = ("", path) if classname != "speech" else (path, "")
                    pred, _ = self.predict_file(classname, sp, mu, None)
                    preds.append(pred)
                    labels.append(np.argmax(pred, axis=1))
                    gts.append(np.full(len(pred), label))
                    if verbose:
                        acc = np.mean(labels[-1] == label)
                        print(f"{classname} {fl}: {len(pred)} patches "
                              f"acc={acc:.3f}", flush=True)

        pair_specs = [("speech+music", "speech_music", "music", "music", 2)]
        if "speech+noise" in test_files:
            pair_specs.append(("speech+noise", "speech_noise", "noise",
                               "noise", 4))
        for key, classname, pdir, pkey, label in pair_specs:
            for pair in test_files.get(key, []):
                sp = os.path.join(self.folder, "speech", pair["speech"])
                mu = os.path.join(self.folder, pdir, pair[pkey])
                if not (os.path.exists(sp) and os.path.exists(mu)):
                    continue
                db = pair["SMR"] if target_db is None else target_db
                pred, _ = self.predict_file(classname, sp, mu, db)
                preds.append(pred)
                labels.append(np.argmax(pred, axis=1))
                gts.append(np.full(len(pred), label))

        pred_labels = np.concatenate(labels)
        ground = np.concatenate(gts)
        n_classes = preds[0].shape[1]
        conf, precision, recall, fscore = get_performance(
            pred_labels, ground, list(range(n_classes)))
        return {"ConfMat": conf, "precision": precision, "recall": recall,
                "fscore": fscore, "PtdLabels": pred_labels,
                "Predictions": np.concatenate(preds), "GroundTruth": ground}

    def smr_sweep(self, test_files: dict, levels=(-5, 0, 5, 10, 15, 20)):
        """Per-SMR results + pooled 'All' metrics
        (``perform_testing``, :649-671)."""
        results = {}
        all_labels, all_gts = [], []
        for db in levels:
            res = self.test_model({"speech+music":
                                   test_files.get("speech+music", [])},
                                  target_db=db)
            results[db] = res
            all_labels.append(res["PtdLabels"])
            all_gts.append(res["GroundTruth"])
        pooled_labels = np.concatenate(all_labels)
        pooled_gts = np.concatenate(all_gts)
        n_classes = 3
        conf, p, r, f = get_performance(pooled_labels, pooled_gts,
                                        list(range(n_classes)))
        results["All"] = {"ConfMat": conf, "precision": p, "recall": r,
                          "fscore": f}
        return results
