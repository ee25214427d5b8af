"""Model registry: string name -> model factory.

The reference selects architectures by module-dict lookup
(``tae.__dict__[args.model]()``, reference train.py:94). We keep the same
public names (all 36 of them) behind an explicit registry so CLIs can resolve
``--model tae_patch16_vocab16_px256`` etc., while factories accept keyword
overrides (``num_classes=...`` for the downstream heads).
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_model(name: str, factory: Callable[..., Any] | None = None):
    """Register ``factory`` under ``name``. Usable as decorator or call."""
    def _do(fn: Callable[..., Any]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate model name: {name}")
        _REGISTRY[name] = fn
        return fn

    if factory is not None:
        return _do(factory)
    return _do


def create(name: str, **kwargs: Any):
    try:
        factory = _REGISTRY[name]
    except KeyError:
        known = ", ".join(sorted(_REGISTRY))
        raise KeyError(f"unknown model {name!r}; known models: {known}") from None
    return factory(**kwargs)


def list_models(prefix: str = "") -> list[str]:
    return sorted(n for n in _REGISTRY if n.startswith(prefix))
