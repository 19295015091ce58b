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
