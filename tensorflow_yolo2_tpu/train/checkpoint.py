"""Checkpoint manager on Orbax.

Capability of the reference's cornerstone subsystem (SURVEY §5.4;
net_utils.py:14-219 + config.py:78-89):

- layout ``ckpts/<network_name>/<imdb_name>/train_{iter|epoch}_<N>/``
  with the step encoded in the directory name (the reference parses it
  back from the filename, net_utils.py:109-110 — same here);
- newest-checkpoint selection (by step, which is mtime-consistent);
- three restore modes:
  (a) exact resume of the full train state (params + opt state + BN stats);
  (b) warm-start from a *different* run's checkpoint by pytree-path
      intersection (the capability of restore_darknet19_variables'
      variable-name intersection, net_utils.py:81-101);
  (c) partial restore with excluded scopes for new heads
      (restore_resnet_tf_variables' yolo_fc1/yolo_fc2/loss_layer
      exclusions, net_utils.py:177-199) — exclusions are path prefixes;
- optimizer-swap on resume (``new_optimizer`` reinit,
  net_utils.py:203-212): restore params/stats but rebuild opt state;
- bounded retention (``keep``), async-friendly Orbax IO.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

from tensorflow_yolo2_tpu.config import (
    TRAIN_SNAPSHOT_PREFIX,
    Paths,
    scope_matches,
)


def _path_key(path) -> str:
    """Render a pytree key path as 'a/b/0/c' regardless of node kind
    (DictKey .key, GetAttrKey .name, SequenceKey .idx) so dict-keyed
    Orbax restores intersect attribute-keyed trees (dataclass states)."""
    parts = []
    for k in path:
        for attr in ("key", "name", "idx"):
            v = getattr(k, attr, None)
            if v is not None:
                parts.append(str(v))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def _flatten(tree: Any) -> dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_key(path): leaf for path, leaf in flat}


def merge_pytrees(init: Any, restored: Any,
                  exclude_scopes: tuple[str, ...] = ()) -> tuple[Any, int]:
    """Overwrite ``init`` leaves with same-path, same-shape leaves from
    ``restored`` unless the path starts with an excluded scope. Returns
    (merged, n_restored). This is the name-intersection warm-start."""
    restored_flat = _flatten(restored) if restored is not None else {}
    count = 0

    def pick(path, leaf):
        nonlocal count
        key = _path_key(path)
        if scope_matches(key, exclude_scopes):
            return leaf
        # non-array init leaves (step counters, hyperparameter scalars)
        # keep their init value rather than aborting the merge
        shape = getattr(leaf, "shape", None)
        if shape is None:
            return leaf
        cand = restored_flat.get(key)
        if cand is not None and getattr(cand, "shape", None) == shape:
            count += 1
            return cand.astype(leaf.dtype) if hasattr(cand, "astype") else cand
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, init)
    return merged, count


class CheckpointManager:
    """Per-(network, dataset) checkpoint directory manager."""

    def __init__(self, network_name: str, imdb_name: str,
                 save_by_epoch: bool = False, keep: int = 10,
                 paths: Paths | None = None):
        self.paths = paths or Paths()
        self.dir = self.paths.ckpts_dir(network_name, imdb_name)
        self.interval = "epoch" if save_by_epoch else "iter"
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    # -- naming (reference: train_{interval}_{N}.ckpt, net_utils.py:27-28) --

    def _name(self, step: int) -> str:
        return f"{TRAIN_SNAPSHOT_PREFIX}_{self.interval}_{step}"

    def _step_of(self, name: str) -> int | None:
        m = re.fullmatch(
            rf"{TRAIN_SNAPSHOT_PREFIX}_{self.interval}_(\d+)", name)
        return int(m.group(1)) if m else None

    def all_steps(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        steps = [self._step_of(n) for n in os.listdir(self.dir)]
        return sorted(s for s in steps if s is not None)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def latest_path(self) -> str | None:
        step = self.latest_step()
        return (os.path.join(self.dir, self._name(step))
                if step is not None else None)

    # -- save / restore -------------------------------------------------------

    def save(self, step: int, state: Any) -> str:
        path = os.path.join(self.dir, self._name(step))
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        self._gc()
        return path

    def restore(self, target: Any, step: int | None = None) -> tuple[Any, int]:
        """Exact resume: returns (state, step). ``target`` is a pytree of
        like-shaped arrays (the freshly-initialized state)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        path = os.path.join(self.dir, self._name(step))
        restored = self._ckptr.restore(path, target)
        return restored, step

    def restore_raw(self, step: int | None = None) -> Any:
        """Structure-free restore (for warm-start intersection)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        path = os.path.join(self.dir, self._name(step))
        return self._ckptr.restore(path)

    def _gc(self) -> None:
        steps = self.all_steps()
        for s in steps[:-self.keep] if self.keep else []:
            shutil.rmtree(os.path.join(self.dir, self._name(s)),
                          ignore_errors=True)


def warm_start_params(init_params: Any, ckpt_path: str,
                      exclude_scopes: tuple[str, ...] = ()) -> tuple[Any, int]:
    """Load params from any checkpoint dir and merge by path intersection
    (modes (b)/(c) above). ``ckpt_path`` points at one snapshot dir; the
    checkpoint may hold a full train state — a top-level 'params' entry is
    used when present."""
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(ckpt_path)
    if isinstance(raw, dict) and "params" in raw:
        raw = raw["params"]
    return merge_pytrees(init_params, raw, exclude_scopes)
