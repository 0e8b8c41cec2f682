"""Checkpoint/resume + best-metric tracking (orbax).

Capability parity with the reference's checkpointing (main.py:319-349
auto-resume, :351-382 pretrain partial load, :427-447 periodic saves,
util/misc.py:500-502 rank-0 save, util/utils.py:402-473 BestMetricHolder):

* orbax ``CheckpointManager`` replaces ``torch.save`` — multi-host-safe
  single-controller writes, automatic retention;
* auto-resume: if the output dir holds a checkpoint, adopt it;
* pretrain partial load: keyword ignore-list + shape-match filtering over
  the flat param dict (main.py:360-375 semantics).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None) -> None:
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or {}
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self._mgr.close()


def load_pretrained_params(
    params: Any,
    pretrained: Any,
    ignore_keywords: Optional[List[str]] = None,
) -> Any:
    """Partial init: copy matching-path, matching-shape leaves.

    Mirrors main.py:360-375: keys containing any ignore keyword are skipped;
    shape mismatches are skipped with a warning instead of failing.
    """
    ignore_keywords = ignore_keywords or []
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    src_map = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(pretrained)[0]
    }
    ordered, skipped, loaded = [], [], 0
    for path, val in flat:
        key = jax.tree_util.keystr(path)
        use = val
        if key in src_map and not any(s in key for s in ignore_keywords):
            src = src_map[key]
            if np.shape(src) == np.shape(val):
                use = src
                loaded += 1
            else:
                skipped.append(key)
        ordered.append(use)
    if skipped:
        print(
            f"[pretrain] shape-mismatch skipped ({len(skipped)}): {skipped[:8]}"
        )
    print(f"[pretrain] loaded {loaded}/{len(flat)} leaves")
    return jax.tree_util.tree_unflatten(treedef, ordered)


class BestMetricHolder:
    """Track best AP for regular and EMA branches (util/utils.py:402-473)."""

    def __init__(self, use_ema: bool = False):
        self.use_ema = use_ema
        self.best_regular = -1.0
        self.best_ema = -1.0

    def update(self, value: float, epoch: int, is_ema: bool = False) -> bool:
        if is_ema:
            if value > self.best_ema:
                self.best_ema = value
                return True
            return False
        if value > self.best_regular:
            self.best_regular = value
            return True
        return False

    def summary(self) -> Dict[str, float]:
        out = {"best_regular": self.best_regular}
        if self.use_ema:
            out["best_ema"] = self.best_ema
        return out
