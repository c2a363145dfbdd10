"""Checkpointing.

The reference saves weights-only torch state_dicts with no optimizer/
scheduler/epoch state and no resume capability (SURVEY.md §5). Here the
FULL train state (params, BN stats, both optimizer states, step) is saved
via orbax, giving real checkpoint/resume, while `save_params`/`load_params`
keep the reference's lightweight best-weights semantics.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(directory, state: Any, step: Optional[int] = None) -> str:
    ocp = _ocp()
    path = Path(directory).resolve()
    path.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    target = path / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return str(target)


def restore_train_state(path, template: Any) -> Any:
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve(), target=jax.device_get(template))


def latest_checkpoint(directory) -> Optional[str]:
    path = Path(directory)
    if not path.exists():
        return None
    steps = sorted(
        (int(p.name.split("_")[1]), p) for p in path.glob("step_*") if p.is_dir()
    )
    return str(steps[-1][1]) if steps else None


def save_params(path, params: Any) -> None:
    """Weights-only save (the reference's best_model.pth analogue) as a
    flattened npz."""
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]
    arrays = {jax.tree_util.keystr(k): v for k, v in flat}
    np.savez(path, **arrays)


def load_params(path, template: Any) -> Any:
    import numpy as np

    with np.load(path) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = [z[jax.tree_util.keystr(k)] for k, _ in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves
    )
