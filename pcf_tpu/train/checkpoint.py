"""Checkpoint save/restore via Orbax.

Replaces the reference's torch.save dict {epoch, state_dict, optimizer,
scheduler, best_iou} flow (train_ScanNet_DDP_WarmUP.py:336-353). Improvement
over the reference (SURVEY.md §5): a real RESUME path — the reference
hardcodes init_epoch = 0 and never restores.

Layout: <dir>/<step>/... managed by CheckpointManager; 'best' is tracked via
metadata and restorable by tag.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from pcf_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("miou", 0.0),
                keep_checkpoints_without_metrics=True,
            ),
        )

    def save(self, epoch: int, state: TrainState, metrics: dict | None = None):
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ),
            metrics=metrics or {},
        )
        self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState, epoch: int | None = None) -> tuple[TrainState, int]:
        """Restore latest (or a specific) checkpoint; returns (state, epoch)."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return state_template, 0
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
            ),
        )
        return restored["state"], int(step)

    def restore_eval(self, epoch: int | None = None):
        """Restore (params, batch_stats, epoch) without an opt_state template.

        Eval/serving must not depend on how the checkpoint's optimizer tree
        was shaped (optimizer reworks change it; the torch analog reads only
        state_dict, test_ScanNet_simple.py:117-125). Restores the raw saved
        tree and extracts the model variables. Returns (None, None, 0) when
        no checkpoint exists.
        """
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return None, None, 0
        # Template from the checkpoint's own metadata (shape/dtype), pinned
        # to a LOCAL device: restoring with no template would re-apply the
        # SAVED device sharding, which fails when the checkpoint was written
        # on a different backend (e.g. trained on TPU, evaluated on CPU).
        path = os.path.join(self.directory, str(step), "state")
        ck = ocp.StandardCheckpointer()
        meta = ck.metadata(path).item_metadata
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding), meta)
        st = ck.restore(path, template)
        get = st.get if isinstance(st, dict) else lambda k: getattr(st, k)
        return get("params"), get("batch_stats"), int(step)

    def best_epoch(self):
        return self._mgr.best_step()

    def latest_epoch(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_params_only(path: str, params: Any):
    """Standalone parameter dump (the analog of a bare state_dict .pth)."""
    ocp.StandardCheckpointer().save(os.path.abspath(path), params, force=True)


def load_params_only(path: str, template: Any):
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), template)
