"""Lightweight pytree dataclass machinery.

The reference framework (desy-ml/cheetah) models beams and lattice elements as
``torch.nn.Module`` objects with registered buffers/parameters
(``cheetah/accelerator/element.py:17``, ``cheetah/particles/beam.py:9``). The
TPU-native equivalent is a *pytree dataclass*: array-valued fields are pytree
leaves (traced, differentiated, vmapped and sharded by JAX), while
configuration fields (names, tracking methods, grid shapes) are static aux
data that participate in ``jax.jit``'s cache key.

Compared to ``flax.struct.dataclass`` this gives us:

* mutable instances (reference-style ``quad.k1 = ...`` ergonomics outside of
  traced code),
* inheritance-friendly registration for the big ``Element`` class hierarchy,
* control over unflattening so tracers round-trip without re-validation.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, TypeVar

import jax

T = TypeVar("T")

_STATIC_MARKER = "cheetah_tpu_static"

# Every class registered via ``pytree_dataclass``, in definition order —
# consumed by ``register_export_serialization``.
_REGISTERED_CLASSES: list[type] = []
_EXPORT_REGISTERED: set[type] = set()


def axis_field(default: Any = dataclasses.MISSING, **kwargs) -> dataclasses.Field:
    """A dataclass field that is a pytree leaf (an array / traced value)."""
    if default is not dataclasses.MISSING:
        kwargs.setdefault("default", default)
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC_MARKER] = False
    return dataclasses.field(metadata=metadata, **kwargs)


def static_field(default: Any = dataclasses.MISSING, **kwargs) -> dataclasses.Field:
    """A dataclass field that is static aux data (part of the jit cache key)."""
    if default is not dataclasses.MISSING:
        kwargs.setdefault("default", default)
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC_MARKER] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def _partition_fields(cls) -> tuple[list[str], list[str]]:
    """Names of (leaf fields, static fields) in declaration order."""
    leaf_names, static_names = [], []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC_MARKER, False):
            static_names.append(f.name)
        else:
            leaf_names.append(f.name)
    return leaf_names, static_names


class _Static:
    """Hashable, equality-comparable wrapper around the static field values."""

    __slots__ = ("values",)

    def __init__(self, values: tuple):
        self.values = values

    def __hash__(self) -> int:
        try:
            return hash(self.values)
        except TypeError:
            # Unhashable static values (e.g. metadata dicts) hash by repr.
            return hash(repr(self.values))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _Static) and self.values == other.values


def pytree_dataclass(cls: type[T] | None = None, *, init: bool = True) -> type[T]:
    """Decorator registering a (mutable) dataclass as a JAX pytree node.

    Fields default to pytree leaves; mark configuration with ``static_field``.
    Unflattening bypasses ``__init__``/``__post_init__`` so traced values
    round-trip untouched.
    """

    def wrap(cls: type[T]) -> type[T]:
        cls = dataclasses.dataclass(cls, init=init, repr=False, eq=False)
        leaf_names, static_names = _partition_fields(cls)

        def flatten_with_keys(obj):
            leaves = tuple(
                (jax.tree_util.GetAttrKey(name), getattr(obj, name))
                for name in leaf_names
            )
            static = _Static(tuple(getattr(obj, name) for name in static_names))
            return leaves, static

        def flatten(obj):
            leaves = tuple(getattr(obj, name) for name in leaf_names)
            static = _Static(tuple(getattr(obj, name) for name in static_names))
            return leaves, static

        def unflatten(static: _Static, leaves) -> T:
            obj = object.__new__(cls)
            for name, value in zip(leaf_names, leaves):
                object.__setattr__(obj, name, value)
            for name, value in zip(static_names, static.values):
                object.__setattr__(obj, name, value)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

        cls.__pytree_leaf_fields__ = tuple(leaf_names)
        cls.__pytree_static_fields__ = tuple(static_names)

        if "__repr__" not in cls.__dict__:
            cls.__repr__ = _pytree_repr

        _REGISTERED_CLASSES.append(cls)
        return cls

    return wrap if cls is None else wrap(cls)


def _encode_static(value: Any) -> Any:
    """JSON-able encoding of one static field value; tuples and dicts are
    tagged so they round-trip with their exact Python types (a ``grid_shape``
    must come back a *tuple* — it participates in jit cache keys)."""
    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    if isinstance(value, tuple):
        return {"__tuple__": [_encode_static(v) for v in value]}
    if isinstance(value, list):
        return [_encode_static(v) for v in value]
    if isinstance(value, dict):
        if not all(isinstance(k, str) for k in value):
            raise ValueError(
                "static dict fields must have string keys to be exportable; "
                f"got keys {list(value)!r}"
            )
        return {"__dict__": {k: _encode_static(v) for k, v in value.items()}}
    raise ValueError(
        f"static field value {value!r} ({type(value).__name__}) is not "
        "serializable for jax.export — only None/bool/int/float/str and "
        "tuples/lists/dicts thereof are supported"
    )


def _decode_static(value: Any) -> Any:
    if isinstance(value, dict):
        if "__tuple__" in value:
            return tuple(_decode_static(v) for v in value["__tuple__"])
        if "__dict__" in value:
            return {k: _decode_static(v) for k, v in value["__dict__"].items()}
    if isinstance(value, list):
        return [_decode_static(v) for v in value]
    return value


def register_export_serialization() -> int:
    """Register every ``pytree_dataclass`` (elements, segments, beams, ...)
    with :mod:`jax.export`, so exported computations whose calling convention
    mentions them can be ``serialize()``d and ``deserialize()``d — the AOT
    deployment path. Idempotent; returns the number of newly registered
    classes. Called automatically at package import; call again after
    defining custom elements."""
    from jax import export as jax_export

    count = 0
    for cls in list(_REGISTERED_CLASSES):
        if cls in _EXPORT_REGISTERED:
            continue

        def _serialize_auxdata(static: _Static) -> bytes:
            return json.dumps(
                [_encode_static(v) for v in static.values]
            ).encode("utf-8")

        def _deserialize_auxdata(blob) -> _Static:
            values = json.loads(bytes(blob).decode("utf-8"))
            return _Static(tuple(_decode_static(v) for v in values))

        jax_export.register_pytree_node_serialization(
            cls,
            serialized_name=f"{cls.__module__}.{cls.__qualname__}",
            serialize_auxdata=_serialize_auxdata,
            deserialize_auxdata=_deserialize_auxdata,
        )
        _EXPORT_REGISTERED.add(cls)
        count += 1
    return count


def _pytree_repr(self) -> str:
    parts = [
        f"{f.name}={getattr(self, f.name)!r}"
        for f in dataclasses.fields(self)
        if f.repr
    ]
    return f"{type(self).__name__}({', '.join(parts)})"


def as_float_array(value: Any, dtype: Any = None):
    """``jnp.asarray`` that promotes integer/bool inputs to the default float
    dtype (physical parameters must never be integer arrays — integer transfer
    maps would silently truncate)."""
    import jax.numpy as jnp

    arr = jnp.asarray(value, dtype=dtype)
    if dtype is None and not jnp.issubdtype(arr.dtype, jnp.floating):
        arr = arr.astype(jnp.result_type(float))
    return arr


def tree_equal(a: Any, b: Any) -> bool:
    """Structural + numerical equality of two pytrees (used for ``==``)."""
    import jax.numpy as jnp

    if jax.tree_util.tree_structure(a) != jax.tree_util.tree_structure(b):
        return False
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    for la, lb in zip(leaves_a, leaves_b):
        la, lb = jnp.asarray(la), jnp.asarray(lb)
        if la.shape != lb.shape or bool(jnp.any(la != lb)):
            return False
    return True


def replace(obj: T, **changes: Any) -> T:
    """Functional update of a pytree dataclass (like ``dataclasses.replace``)."""
    return dataclasses.replace(obj, **changes)


def is_differentiation_tracer(x: Any) -> bool:
    """True when ``x`` is (or wraps, through vmap batching) a forward- or
    reverse-mode AD tracer — i.e. ``x`` is an input being differentiated, not
    merely an argument traced by ``jit``/``vmap``.

    Used by static fast-path decisions (e.g. the drift-kick-drift
    zero-offset skip) as a safety net: a value under differentiation must
    stay in the compute graph even when a static hint says it is zero,
    otherwise its gradient would silently come out zero.
    """
    from jax._src.interpreters import ad as _ad_internal
    from jax._src.interpreters import batching as _batching_internal

    ad_types = (_ad_internal.JVPTracer,)
    if hasattr(_ad_internal, "LinearizeTracer"):
        ad_types = ad_types + (_ad_internal.LinearizeTracer,)
    while isinstance(x, jax.core.Tracer):
        if isinstance(x, ad_types):
            return True
        if isinstance(x, _batching_internal.BatchTracer):
            x = x.val
            continue
        return False
    return False
