"""Executable reference-API parity guard.

"A user of the reference should find everything they need": these tests
introspect the live torch reference (same import the float64 oracle uses)
and assert that every public name and every public class member it exposes
has a counterpart here. New public surface in the reference shows up as a
failure, not as silent drift.
"""

import dataclasses

from reference_oracle import ref

import cheetah_tpu as ct

# torch idioms whose role is played by different machinery here; each entry
# documents the counterpart.
MEMBER_EXCLUSIONS = {
    # nn.Module buffer registration -> pytree dataclass fields
    # (cheetah_tpu/utils/pytree.py).
    "register_buffer_or_parameter",
}


def _torch_module_baseline():
    import torch

    return set(dir(torch.nn.Module))


def _has_member(cls, member: str) -> bool:
    if hasattr(cls, member):
        return True
    if dataclasses.is_dataclass(cls):
        return member in {field.name for field in dataclasses.fields(cls)}
    return False


def test_top_level_names_all_present():
    """Every public top-level name of the reference package exists here
    (classes, warning types, and the submodule entry points)."""
    missing = [
        name
        for name in dir(ref)
        if not name.startswith("_") and not hasattr(ct, name)
    ]
    assert missing == [], f"reference top-level names without counterpart: {missing}"


def test_shared_classes_expose_every_reference_member():
    """For every shared public class, each public member of the reference
    class (beyond the nn.Module namespace) exists here — methods,
    classmethods, properties, or dataclass fields."""
    baseline = _torch_module_baseline()
    shared = [
        name
        for name in dir(ref)
        if not name.startswith("_")
        and isinstance(getattr(ref, name), type)
        and hasattr(ct, name)
    ]
    assert len(shared) >= 30  # the whole element/beam/warning surface

    problems = {}
    for name in shared:
        ref_cls, our_cls = getattr(ref, name), getattr(ct, name)
        public = {
            member
            for member in dir(ref_cls)
            if not member.startswith("_") and member not in baseline
        }
        missing = sorted(
            member
            for member in public - MEMBER_EXCLUSIONS
            if not _has_member(our_cls, member)
        )
        if missing:
            problems[name] = missing
    assert problems == {}, f"reference members without counterpart: {problems}"


# ---------------------------------------------------------------------------
# Signature-level parity: parameter names and plain-Python defaults.
# ---------------------------------------------------------------------------

# Parameter names whose role is played by different machinery here; each
# entry documents the counterpart.
PARAM_EXCLUSIONS = {
    # torch device placement -> jax implicit device placement / sharding.
    "device",
    # torch.Generator seeding -> explicit jax PRNG `key` argument.
    "random_state",
}

# (class, method) -> parameter names excluded for a documented reason.
METHOD_PARAM_EXCLUSIONS = {}

# Classes whose constructor is not compared; each entry documents why.
CONSTRUCTOR_EXCLUSIONS = {
    # Abstract base: not directly constructible in either framework.
    # Subclasses here route name/sanitize_name/metadata/dtype through
    # Element._init_element, and every concrete subclass's constructor IS
    # compared below.
    "Element",
}


def _plain_default(value):
    """Reference default values comparable across frameworks: plain Python
    scalars/strings/None and tuples thereof (torch tensors and factory
    sentinels are not comparable and are skipped)."""
    if value is None or isinstance(value, (bool, int, float, str)):
        return True
    if isinstance(value, tuple):
        return all(_plain_default(v) for v in value)
    return False


def _signature_params(fn):
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return None
    return {
        name: param
        for name, param in sig.parameters.items()
        if name not in ("self", "cls")
        and param.kind
        not in (param.VAR_POSITIONAL, param.VAR_KEYWORD)
    }


def _accepts_any_kwarg(fn) -> bool:
    """True for signatures with a ``**kwargs`` catch-all: reference kwarg
    names remain reachable by name (typos are rejected at the delegation
    target — e.g. ``_moments.resolve_parameters`` validates the moment name
    set, matplotlib raises for unknown plot kwargs)."""
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    return any(
        param.kind is param.VAR_KEYWORD for param in sig.parameters.values()
    )


def _is_bare_stub(fn) -> bool:
    """Abstract ``(*args, **kwargs)`` declarations on the Beam ABC: every
    concrete override's signature is compared on the subclass itself."""
    params = _signature_params(fn)
    return params is not None and len(params) == 0 and _accepts_any_kwarg(fn)


def _shared_classes():
    return [
        name
        for name in dir(ref)
        if not name.startswith("_")
        and isinstance(getattr(ref, name), type)
        and hasattr(ct, name)
    ]


def test_shared_class_constructor_signatures_match():
    """For every shared public class, every reference ``__init__`` parameter
    name exists in ours (a kwarg rename or drop fails loudly), and defaults
    match wherever the reference default is a plain Python value. Extra
    parameters HERE are allowed (e.g. ``key`` for explicit PRNG, jit-related
    knobs) — the guard is one-directional, like the member guard."""
    problems = {}
    for name in _shared_classes():
        if name in CONSTRUCTOR_EXCLUSIONS:
            continue
        ref_params = _signature_params(getattr(ref, name).__init__)
        our_params = _signature_params(getattr(ct, name).__init__)
        if ref_params is None or our_params is None:
            continue
        issues = []
        for pname, param in ref_params.items():
            if pname in PARAM_EXCLUSIONS:
                continue
            if pname not in our_params:
                issues.append(f"missing param {pname!r}")
                continue
            import inspect

            ref_default = param.default
            our_default = our_params[pname].default
            if (
                ref_default is not inspect.Parameter.empty
                and _plain_default(ref_default)
                and our_default is not inspect.Parameter.empty
                and _plain_default(our_default)
                and ref_default != our_default
            ):
                issues.append(
                    f"default drift {pname!r}: ref {ref_default!r} "
                    f"vs ours {our_default!r}"
                )
        if issues:
            problems[name] = issues
    assert problems == {}, f"constructor signature drift: {problems}"


def test_shared_method_signatures_match():
    """Shared public methods (defined on the reference class itself, not the
    nn.Module namespace) accept every reference parameter name."""
    baseline = _torch_module_baseline()
    problems = {}
    for name in _shared_classes():
        ref_cls, our_cls = getattr(ref, name), getattr(ct, name)
        for member in dir(ref_cls):
            if member.startswith("_") or member in baseline:
                continue
            ref_attr = getattr(ref_cls, member, None)
            our_attr = getattr(our_cls, member, None)
            if not callable(ref_attr) or not callable(our_attr):
                continue
            if isinstance(ref_attr, type) or isinstance(our_attr, type):
                continue
            ref_params = _signature_params(ref_attr)
            our_params = _signature_params(our_attr)
            if ref_params is None or our_params is None:
                continue
            if _is_bare_stub(our_attr):
                continue
            catch_all = _accepts_any_kwarg(our_attr)
            excluded = METHOD_PARAM_EXCLUSIONS.get((name, member), set())
            missing = [
                pname
                for pname in ref_params
                if pname not in our_params
                and pname not in PARAM_EXCLUSIONS
                and pname not in excluded
                and not catch_all
            ]
            if missing:
                problems[f"{name}.{member}"] = missing
    assert problems == {}, f"method signature drift: {problems}"
