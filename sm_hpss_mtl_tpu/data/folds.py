"""Cross-validation fold construction.

Mirrors ``create_CV_folds`` / ``get_annotations``
(``/root/reference/create_cross_validation_folds.py:86-261`` and the
5-class variant): files are assigned to ``CV`` folds round-robin *within
each annotation stratum* (music genre, speech gender), and each fold of
the synthetic mixture classes (speech+music, speech+noise) is built by
randomly pairing files from the same fold while cycling the SMR through
``mixing_dB_range`` (default −5..20 dB in 1 dB steps,
``create_cross_validation_folds.py:327``).

The produced structure is the reference's ``cv_file_list`` dict (same
keys: per-class ``fold{k}`` lists, pair dicts with 'speech'/'music'/
'SMR', ``filewise_duration``, ``total_duration`` in hours,
``dataset_size``), so it round-trips through the same pickles.
"""

from __future__ import annotations

import csv
import os
import pickle

import numpy as np

from .audio import duration_seconds

DEFAULT_MIXING_DB = list(range(-5, 21))


def read_annotations(annot_dir: str, class_name: str) -> list[tuple[str, str]]:
    """Rows of ``<class>.csv`` as (file_stem, stratum) pairs; missing file
    -> empty list (caller falls back to unstratified)."""
    path = os.path.join(annot_dir, class_name + ".csv")
    if not os.path.exists(path):
        return []
    out = []
    with open(path, newline="\n") as f:
        for row in csv.reader(f, delimiter=",", quotechar="|"):
            if not row:
                continue
            out.append((row[0], row[1] if len(row) > 1 else "no_annot"))
    return out


def _stratified_folds(entries: list[tuple[str, str]], cv: int,
                      existing_dir: str,
                      division: dict | None = None) -> dict:
    """Round-robin fold assignment within each stratum, in annotation-file
    order (the reference's ``last_added_fold`` cycling).  ``division``
    (optional dict) collects the per-stratum assignment
    ``{stratum: {foldK: [files]}}`` — the reference's
    ``*_division.pkl`` sidecar structure."""
    folds = {f"fold{k}": [] for k in range(cv)}
    last = {}
    for stem, stratum in entries:
        wav = stem + ".wav"
        if existing_dir and not os.path.exists(os.path.join(existing_dir, wav)):
            continue
        if stratum not in last:
            last[stratum] = 0
        else:
            last[stratum] = (last[stratum] + 1) % cv
        fold = f"fold{last[stratum]}"
        folds[fold].append(wav)
        if division is not None:
            division.setdefault(stratum,
                                {f"fold{k}": [] for k in range(cv)}
                                )[fold].append(wav)
    return folds


def _pair_folds(folds_a: dict, folds_b: dict, key_a: str, key_b: str,
                cv: int, mixing_db: list[int], rng: np.random.Generator) -> dict:
    """Random pairing with re-shuffled replacement, SMR cycling; pair count
    per fold = size of the larger constituent fold."""
    out = {}
    for k in range(cv):
        fold = f"fold{k}"
        out[fold] = []
        a = list(folds_a[fold])
        b = list(folds_b[fold])
        rng.shuffle(a)
        rng.shuffle(b)
        db_idx = 0
        if not folds_a[fold] or not folds_b[fold]:
            continue  # a constituent fold is empty; no pairs possible
        for _ in range(max(len(folds_a[fold]), len(folds_b[fold]))):
            if not a:
                a = list(folds_a[fold])
                rng.shuffle(a)
            if not b:
                b = list(folds_b[fold])
                rng.shuffle(b)
            out[fold].append({key_a: a.pop(), key_b: b.pop(),
                              "SMR": mixing_db[db_idx]})
            db_idx = (db_idx + 1) % len(mixing_db)
    return out


def measure_durations(folder: str, class_names) -> tuple[dict, dict]:
    """Per-class total and per-file durations in seconds
    (``calculate_dataset_size``, ``create_cross_validation_folds.py:43-82``)."""
    total, filewise = {}, {}
    for cls in class_names:
        total[cls] = 0.0
        filewise[cls] = {}
        d = os.path.join(folder, cls)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".wav"):
                continue
            dur = duration_seconds(os.path.join(d, fn))
            filewise[cls][fn] = dur
            total[cls] += dur
    return total, filewise


def create_cv_folds(folder: str, *, annot_dir: str | None = None,
                    cv: int = 3, with_noise: bool = False,
                    mixing_db: list[int] | None = None,
                    seed: int = 0) -> dict:
    """Build the full ``cv_file_list`` structure for a MUSAN-layout corpus."""
    mixing_db = mixing_db or DEFAULT_MIXING_DB
    rng = np.random.default_rng(seed)
    annot_dir = annot_dir or os.path.join(folder, "annotations")
    base_classes = ["music", "speech"] + (["noise"] if with_noise else [])

    cv_file_list = {"CV_folds": cv,
                    "dataset_name": os.path.basename(os.path.normpath(folder))}
    divisions = {}
    for cls in base_classes:
        entries = read_annotations(annot_dir, cls)
        if not entries:
            entries = [(fn[:-4], "no_annot")
                       for fn in sorted(os.listdir(os.path.join(folder, cls)))
                       if fn.endswith(".wav")]
        divisions[cls] = {}
        cv_file_list[cls] = _stratified_folds(entries, cv,
                                              os.path.join(folder, cls),
                                              division=divisions[cls])
    cv_file_list["_divisions"] = divisions

    cv_file_list["speech+music"] = _pair_folds(
        cv_file_list["speech"], cv_file_list["music"], "speech", "music",
        cv, mixing_db, rng)
    if with_noise:
        cv_file_list["speech+noise"] = _pair_folds(
            cv_file_list["speech"], cv_file_list["noise"], "speech", "noise",
            cv, mixing_db, rng)

    total, filewise = measure_durations(folder, base_classes)
    cv_file_list["filewise_duration"] = filewise
    cv_file_list["total_duration"] = dict(total)
    cv_file_list["total_duration"]["speech+music"] = max(total.values())
    if with_noise:
        cv_file_list["total_duration"]["speech+noise"] = max(total.values())
    for k in cv_file_list["total_duration"]:
        cv_file_list["total_duration"][k] /= 3600.0
    cv_file_list["dataset_size"] = sum(cv_file_list["total_duration"].values())
    return cv_file_list


def get_train_test_files(cv_file_list: dict, fold: int,
                         class_names=None) -> tuple[dict, dict]:
    """Fold ``fold`` = test, all others = train
    (``Proposed_Work_Results.py:704-718``)."""
    class_names = class_names or ["music", "speech", "speech+music"]
    cv = cv_file_list["CV_folds"]
    train, test = {}, {}
    for cls in class_names:
        train[cls], test[cls] = [], []
        for k in range(cv):
            files = cv_file_list[cls][f"fold{k}"]
            (test if k == fold else train)[cls].extend(files)
    return train, test


def save_cv_folds(cv_file_list: dict, op_dir: str) -> None:
    os.makedirs(op_dir, exist_ok=True)
    with open(os.path.join(op_dir, "cv_file_list.pkl"), "wb") as f:
        pickle.dump(cv_file_list, f, pickle.HIGHEST_PROTOCOL)
    # Sidecar artifacts matching the reference's output directory:
    # details.txt dumps every cv_file_list key
    # (create_cross_validation_folds.py:286-289) and Dataset_Duration.pkl
    # re-exposes the duration maps (:328-333).
    with open(os.path.join(op_dir, "details.txt"), "w",
              encoding="utf8") as f:
        for key in cv_file_list:
            f.write(f"{key}: {cv_file_list[key]}\n\n\n")
    with open(os.path.join(op_dir, "Dataset_Duration.pkl"), "wb") as f:
        pickle.dump({"total_duration": cv_file_list.get("total_duration", {}),
                     "filewise_duration":
                         cv_file_list.get("filewise_duration", {})},
                    f, pickle.HIGHEST_PROTOCOL)
    # Per-stratum division sidecars matching the reference's data assets
    # (cross_validation_info/musan/{music_genre,speech_gender}_division
    # .pkl): {stratum: {foldK: [files]}}.
    names = {"music": "music_genre_division",
             "speech": "speech_gender_division",
             "noise": "noise_division"}
    for cls, div in cv_file_list.get("_divisions", {}).items():
        with open(os.path.join(op_dir, names.get(cls, cls + "_division")
                               + ".pkl"), "wb") as f:
            pickle.dump(div, f, pickle.HIGHEST_PROTOCOL)
    # Human-readable fold CSVs, like the reference's fold{k}.csv.
    has_noise = "speech+noise" in cv_file_list
    for k in range(cv_file_list["CV_folds"]):
        rows_per_cls = {}
        names = ["music", "speech", "speech+music"] + (
            ["noise", "speech+noise"] if has_noise else [])
        for cls in names:
            fold_files = cv_file_list[cls][f"fold{k}"]
            rows_per_cls[cls] = [
                (f"{fl['speech']}+{fl.get('music', fl.get('noise'))}"
                 f"@{fl['SMR']}dB") if isinstance(fl, dict) else fl
                for fl in fold_files]
        n_rows = max(len(v) for v in rows_per_cls.values())
        with open(os.path.join(op_dir, f"fold{k}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(names)
            for i in range(n_rows):
                w.writerow([rows_per_cls[c][i] if i < len(rows_per_cls[c])
                            else "" for c in names])


def load_cv_folds(op_dir: str) -> dict:
    with open(os.path.join(op_dir, "cv_file_list.pkl"), "rb") as f:
        return pickle.load(f)
