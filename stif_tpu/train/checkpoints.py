"""Checkpoint / resume.

Parity target: the reference's two-file scheme — ``<iter>_G.pth`` weights +
``<iter>.state`` training state (epoch/iter/optimizer/scheduler), with
``module.``-prefix stripping and ``check_resume`` path rewiring
(``codes/models/base_model.py:79-121``, ``codes/options/options.py:102-117``).

TPU-native: a single orbax checkpoint holding params + optimizer state + step
(the schedule is a pure function of the step, so no scheduler state needs
saving), plus ``stif_tpu.convert.load_pth_checkpoint`` for importing reference
``.pth`` weights.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from stif_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: TrainState):
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        return step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def save_params_only(self, params, step: int, prefix: str = "params",
                         keep: int = 0):
        """The ``<iter>_G.pth`` equivalent: weights only. ``keep`` > 0 prunes
        older ``<prefix>_*`` snapshots down to the newest ``keep``."""
        path = os.path.join(self.directory, f"{prefix}_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params)
        ckptr.wait_until_finished()
        if keep > 0:
            import re
            import shutil

            pat = re.compile(rf"^{re.escape(prefix)}_(\d+)$")
            found = sorted(
                (int(m.group(1)), n) for n in os.listdir(self.directory)
                if (m := pat.match(n)))
            for _, name in found[:-keep]:
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)
        return path


def load_params(path: str, abstract_params):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_params)
