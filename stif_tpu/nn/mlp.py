"""LIIF-style ReLU MLP, registered as ``'mlp'``.

Parity: ``/root/reference/codes/models/modules/mlp.py:7-30`` — Linear/ReLU
stack over a ``hidden_list``, final plain Linear, applied over the last axis
with leading dims flattened (shape-preserving). Registered in the LIIF model
registry (``liif_models.py:7-23``) as ``'mlp'`` by ``stif_tpu.models``; the
Sakuya archs reference it only from commented-out code, but the registry
entry is part of the public surface.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class MLP(nn.Module):
    in_dim: int = 0            # kept for signature parity; flax infers inputs
    out_dim: int = 3
    hidden_list: Sequence[int] = ()

    @nn.compact
    def __call__(self, x):
        for h in self.hidden_list:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)
