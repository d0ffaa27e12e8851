"""Classification metrics matching ``misc.getPerformance``
(``/root/reference/lib/misc.py:95-103``): sklearn confusion matrix and
per-class precision/recall/F1 rounded to 4 places."""

from __future__ import annotations

import numpy as np
from sklearn.metrics import confusion_matrix, precision_recall_fscore_support


def get_performance(pred_labels, ground_truth, labels):
    conf = confusion_matrix(y_true=ground_truth, y_pred=pred_labels,
                            labels=labels)
    precision, recall, fscore, _ = precision_recall_fscore_support(
        y_true=ground_truth, y_pred=pred_labels, beta=1.0, average=None,
        labels=labels, zero_division=0)
    return (conf, np.round(precision, 4), np.round(recall, 4),
            np.round(fscore, 4))


def accuracy(conf: np.ndarray) -> float:
    return float(np.round(np.sum(np.diag(conf)) / max(np.sum(conf), 1), 4))
