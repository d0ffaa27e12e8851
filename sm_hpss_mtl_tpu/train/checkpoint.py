"""Orbax checkpointing.

The reference persists three artifacts per model — weights ``.h5``,
architecture JSON, hyperparams/timing ``.npz``
(``/root/reference/Proposed_Work_Results.py:370-374``) — plus a
best-val-loss ``ModelCheckpoint``.  Here one orbax checkpoint carries the
same triple: model state (params + batch_stats + opt_state + step),
run metadata (epochs, batch size, learning rate, trainingTimeTaken),
and the config dict.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def save_checkpoint(path: str, state: TrainState,
                    metadata: dict | None = None) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state, "step": state.step}
    ckptr.save(os.path.join(path, "state"), payload, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        import json
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_checkpoint(path: str, template: TrainState
                       ) -> tuple[TrainState, dict]:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {"params": template.params, "batch_stats": template.batch_stats,
              "opt_state": template.opt_state, "step": template.step}
    restored = ckptr.restore(os.path.join(path, "state"),
                             target=jax.tree_util.tree_map(lambda x: x, target))
    meta = {}
    meta_path = os.path.join(path, "metadata.json")
    if os.path.exists(meta_path):
        import json
        with open(meta_path) as f:
            meta = json.load(f)
    return TrainState(params=restored["params"],
                      batch_stats=restored["batch_stats"],
                      opt_state=restored["opt_state"],
                      step=restored["step"]), meta


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(os.path.join(os.path.abspath(path), "state"))


def update_metadata(path: str, fields: dict) -> None:
    """Merge ``fields`` into the checkpoint's ``metadata.json``.

    Used by the experiment runner to stamp ``completed`` /
    ``epochs_run`` after training finishes, so a later resume can tell a
    finished fold from one whose process died mid-budget."""
    import json
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    meta_path = os.path.join(path, "metadata.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.update(fields)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2, default=str)
