"""Tiny model registry (reference ``codes/models/modules/liif_models.py:7-23``
and ``codes/models/networks.py:8-26`` ``define_G`` dispatch)."""

from __future__ import annotations

_MODELS = {}


def register_model(name: str):
    def deco(cls):
        _MODELS[name] = cls
        return cls

    return deco


def make_model(name: str, **kwargs):
    if name not in _MODELS:
        raise KeyError(f"unknown model '{name}'; have {sorted(_MODELS)}")
    return _MODELS[name](**kwargs)
