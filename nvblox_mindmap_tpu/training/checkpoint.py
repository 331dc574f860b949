"""Checkpointing with the reference's reproducibility contract.

(reference: mindmap/model_utils/checkpoint.py + cli/args.py:303-353)
- ``best.ckpt`` / ``last.ckpt`` hold {params, opt_state, iter, best_loss}.
- ``training_args.json`` freezes the model-construction arguments next to the
  checkpoints; loading a checkpoint re-applies the frozen model args over CLI
  args so a model is never rebuilt differently than it was trained.

Serialization uses flax msgpack for pytrees (portable, no pickle of jax
arrays) inside a single file per checkpoint.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

TRAINING_ARGUMENT_FILE_NAME = "training_args.json"


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


def save_checkpoint_file(path: str, params: Any, opt_state: Any, step: int,
                         loss: Optional[float]):
    payload = {
        "params": serialization.to_bytes(_to_host(params)),
        "opt_state": pickle.dumps(_to_host(opt_state)),
        "iter": int(step),
        "best_loss": None if loss is None else float(loss),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint_file(
    path: str, params_template: Any, opt_state_template: Any = None
) -> Tuple[Any, Any, int, Optional[float]]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    try:
        params = serialization.from_bytes(params_template, payload["params"])
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint {path} does not match the model built from its "
            "frozen args - the architecture defaults may have changed since "
            "it was written. Known case: checkpoints from before ViT prefix "
            "tokens existed need --feature_num_prefix_tokens 0. "
            f"Restore error: {e}"
        ) from e
    opt_state = (
        pickle.loads(payload["opt_state"]) if opt_state_template is not None else None
    )
    return params, opt_state, payload["iter"], payload["best_loss"]


def save_checkpoint(
    checkpoint_dir: str,
    params: Any,
    opt_state: Any,
    step: int,
    new_loss: Optional[float],
    best_loss: Optional[float],
) -> Optional[float]:
    """Save last.ckpt always; best.ckpt when the loss improves.

    Returns the updated best loss (reference checkpoint.py:30-52).
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    if new_loss is not None and (best_loss is None or new_loss <= best_loss):
        best_loss = new_loss
        save_checkpoint_file(
            os.path.join(checkpoint_dir, "best.ckpt"), params, opt_state, step, best_loss
        )
    # last.ckpt records the RUNNING best (reference checkpoint.py:42-50):
    # storing the (possibly worse) new_loss would let a later mediocre eval
    # overwrite best.ckpt after a resume.
    save_checkpoint_file(
        os.path.join(checkpoint_dir, "last.ckpt"), params, opt_state, step, best_loss
    )
    return best_loss


def save_training_args(checkpoint_dir: str, args_dict: Dict):
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, TRAINING_ARGUMENT_FILE_NAME)
    with open(path, "w") as f:
        json.dump(args_dict, f, indent=2, default=str)


def load_training_args(checkpoint_path: str) -> Optional[Dict]:
    """Given a checkpoint file path, load the sibling frozen args if present."""
    args_path = os.path.join(
        os.path.dirname(checkpoint_path), TRAINING_ARGUMENT_FILE_NAME
    )
    if not os.path.isfile(args_path):
        return None
    with open(args_path) as f:
        return json.load(f)
