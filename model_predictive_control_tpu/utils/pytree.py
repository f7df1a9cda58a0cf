"""Pytree dataclass helper.

The reference keeps problem data in plain dataclasses (``session_2/problem.py:4-33``,
``session_4/parameters.py:4-54``). For a TPU-native engine those containers must be
JAX pytrees so they flow through ``jit`` / ``vmap`` / ``lax.scan`` and can be sharded
over device meshes. This module provides a tiny decorator that registers a frozen
dataclass as a pytree, with support for static (non-traced) fields such as horizon
lengths and iteration counts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    """Mark a dataclass field as static (part of the pytree structure, not a leaf).

    Use for integers that control traced shapes (horizons, iteration counts) and
    for callables/strings.
    """
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["pytree_static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Freeze ``cls`` as a dataclass and register it as a JAX pytree.

    Fields declared with :func:`static_field` become part of the treedef (so two
    instances with different static values produce different jit caches); all other
    fields are leaves that can hold arrays, be vmapped over, and be sharded.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("pytree_static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    return jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )


def replace(obj: _T, **changes: Any) -> _T:
    """``dataclasses.replace`` re-exported for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
