"""Checkpoint save/restore (ref: src/utils/model_saver.py).

Checkpoints are msgpack-serialized pytrees written as
``{label}_iter{N|NK}.ckpt``; the previous non-keep checkpoint of the same
label is deleted (ref: model_saver.py:22-49). ``training_state`` bundles
optimizer states + step, enabling same-exp resume and the cross-exp
curriculum loads (ref: exp1_stage1_2.yaml load_checkpoint).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

from flax import serialization

from ..utils.paths import iter2str


class Saver:
    def __init__(self, model_dir: str, keep_steps: Sequence[int] = ()):
        self.model_dir = model_dir
        self.keep_steps = set(int(s) for s in keep_steps)
        self._last: Dict[str, int] = {}
        os.makedirs(model_dir, exist_ok=True)

    def _path(self, label: str, itr: int) -> str:
        return os.path.join(self.model_dir, f"{label}_iter{iter2str(itr)}.ckpt")

    def save(self, tree_dict: Dict[str, Any], itr: int,
             keep: Optional[bool] = None) -> List[str]:
        """tree_dict: label -> pytree (e.g. comp_model / discriminator /
        training_state). Returns written paths."""
        written = []
        keep_this = keep if keep is not None else itr in self.keep_steps
        for label, tree in tree_dict.items():
            path = self._path(label, itr)
            with open(path, "wb") as f:
                f.write(serialization.msgpack_serialize(
                    serialization.to_state_dict(tree)))
            written.append(path)
            prev = self._last.get(label)
            if prev is not None and prev not in self.keep_steps:
                prev_path = self._path(label, prev)
                if os.path.exists(prev_path):
                    os.remove(prev_path)
            if not keep_this:
                self._last[label] = itr
            else:
                self._last.pop(label, None)
        return written

    @staticmethod
    def load(path: str, target: Any = None) -> Any:
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        if target is None:
            return state
        return serialization.from_state_dict(target, state)
