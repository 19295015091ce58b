"""Communication-volume auditing for compiled sharded programs.

Multi-host linear scaling rests on one invariant: per step, the bytes moved
by collectives that cross the slow DCN axis must be O(settings + readouts) —
kilobytes — never O(particles). This module makes that invariant *checkable*:
it parses the collectives out of a compiled HLO module and attributes their
volume to mesh axes, so a layout regression that all-gathers the particle
array over DCN fails a test instead of silently destroying scaling.

No reference analogue (the torch reference has no communication layer).

Usage::

    compiled = jax.jit(step).lower(*args).compile()
    report = collective_report(compiled, mesh, dcn_axes=("hosts",))
    assert report.dcn_bytes < 64e3

The byte figure is the summed *output* size of every collective whose
participant group spans more than one index along a DCN axis — a lower bound
proxy for wire traffic (a ring all-reduce moves ~2x), which is exactly what
an O(particles)-vs-O(readouts) audit needs.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import numpy as np
from jax.sharding import Mesh

# ``f32[4096,7]{1,0}`` result types; tuple results repeat the pattern.
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_COLLECTIVE_KINDS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
)
_DTYPE_BYTES = {
    "pred": 1,
    "s8": 1,
    "u8": 1,
    "s16": 2,
    "u16": 2,
    "bf16": 2,
    "f16": 2,
    "s32": 4,
    "u32": 4,
    "f32": 4,
    "s64": 8,
    "u64": 8,
    "f64": 8,
    "c64": 8,
    "c128": 16,
}


@dataclasses.dataclass
class CollectiveOp:
    """One collective in a compiled module."""

    kind: str
    output_bytes: int
    groups: list[list[int]]
    crosses: dict[str, bool]
    line: str


@dataclasses.dataclass
class CollectiveReport:
    ops: list[CollectiveOp]
    dcn_axes: tuple[str, ...]

    @property
    def dcn_bytes(self) -> int:
        """Summed output bytes of collectives spanning any DCN axis."""
        return sum(
            op.output_bytes
            for op in self.ops
            if any(op.crosses.get(axis, False) for axis in self.dcn_axes)
        )

    @property
    def total_bytes(self) -> int:
        return sum(op.output_bytes for op in self.ops)

    def bytes_crossing(self, axis: str) -> int:
        return sum(op.output_bytes for op in self.ops if op.crosses.get(axis))


def _result_bytes(line: str) -> int:
    """Bytes of the op's result (the text left of the op name).

    Async ``-start`` ops have a tuple result ``(operands..., results...)``
    (the operand aliases come first); counting every component would
    double-count the transfer, so for those only the second half of the
    shapes — the results — is summed.
    """
    lhs = line.split("= ", 1)
    if len(lhs) != 2:
        return 0
    # The result type(s) sit between '=' and the op kind.
    kind_pos = min(
        (lhs[1].find(kind) for kind in _COLLECTIVE_KINDS if kind in lhs[1]),
        default=-1,
    )
    type_text = lhs[1][:kind_pos] if kind_pos > 0 else lhs[1]
    sizes = []
    for dtype, dims in _SHAPE_RE.findall(type_text):
        if dtype not in _DTYPE_BYTES:
            continue
        size = 1
        for dim in dims.split(","):
            if dim:
                size *= int(dim)
        sizes.append(size * _DTYPE_BYTES[dtype])
    if "-start" in lhs[1][: kind_pos + 30] and len(sizes) >= 2:
        sizes = sizes[len(sizes) // 2 :]
    return sum(sizes)


def _parse_groups(line: str, num_devices: int) -> list[list[int]]:
    """Participant groups, handling both explicit and iota HLO syntax."""
    explicit = re.search(r"replica_groups=\{(\{[0-9,{} ]*\})\}", line)
    if explicit:
        return [
            [int(device) for device in group.split(",") if device.strip()]
            for group in re.findall(r"\{([0-9, ]*)\}", explicit.group(1))
        ]
    # Iota form: replica_groups=[2,4]<=[4,2]T(1,0) — reshape/transpose of
    # arange(prod) into (num_groups, group_size).
    iota = re.search(
        r"replica_groups=\[(\d+),(\d+)\]<=\[([0-9,]+)\](?:T\(([0-9,]+)\))?",
        line,
    )
    if iota:
        num_groups, group_size = int(iota.group(1)), int(iota.group(2))
        reshape_dims = [int(d) for d in iota.group(3).split(",")]
        ids = np.arange(np.prod(reshape_dims)).reshape(reshape_dims)
        if iota.group(4):
            ids = ids.transpose([int(d) for d in iota.group(4).split(",")])
        return ids.reshape(num_groups, group_size).tolist()
    # collective-permute carries source_target_pairs instead of
    # replica_groups: each pair is a two-participant "group" (traffic flows
    # source -> target, so the pair determines which axes are crossed).
    pairs = re.search(r"source_target_pairs=\{((?:\{\d+,\s*\d+\},?\s*)+)\}", line)
    if pairs:
        return [
            [int(source), int(target)]
            for source, target in re.findall(r"\{(\d+),\s*(\d+)\}", pairs.group(1))
        ]
    # No groups attribute: all devices participate.
    return [list(range(num_devices))]


def _axis_coordinates(mesh: Mesh) -> dict[int, dict[str, int]]:
    """LOGICAL device id -> {axis name: index along that axis}.

    HLO ``replica_groups`` entries are logical partition ids — positions in
    the mesh's row-major flattened device assignment — NOT ``device.id``.
    The two differ whenever the mesh permutes devices (e.g.
    ``mesh_utils.create_hybrid_device_mesh`` reorders by topology on real
    TPU slices), and keying by ``device.id`` then misattributes collectives
    across axes (verified: a permuted CPU mesh flips an intra-host
    all-reduce to "crosses hosts").
    """
    axis_names = list(mesh.axis_names)
    devices = np.asarray(mesh.devices)
    return {
        logical_id: dict(zip(axis_names, index))
        for logical_id, index in enumerate(np.ndindex(devices.shape))
    }


def parse_collectives(hlo_text: str, mesh: Mesh) -> list[CollectiveOp]:
    """Every collective op in ``hlo_text`` with volume and axis attribution."""
    coords = _axis_coordinates(mesh)
    num_devices = len(coords)
    ops = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # Start ops (async pairs) carry the semantics; 'done' ops add nothing.
        if "-done" in stripped or "fusion" in stripped.split("(")[0]:
            continue
        kind = next(
            (
                k
                for k in _COLLECTIVE_KINDS
                if re.search(rf"(?:^|\s|%){k}(?:-start)?(?:\.\d+)?\(", stripped)
            ),
            None,
        )
        if kind is None:
            continue
        groups = _parse_groups(stripped, num_devices)
        crosses = {}
        for axis in mesh.axis_names:
            crosses[axis] = any(
                len(
                    {
                        coords[device][axis]
                        for device in group
                        if device in coords
                    }
                )
                > 1
                for group in groups
            )
        ops.append(
            CollectiveOp(
                kind=kind,
                output_bytes=_result_bytes(stripped),
                groups=groups,
                crosses=crosses,
                line=stripped,
            )
        )
    return ops


def collective_report(
    compiled, mesh: Mesh, dcn_axes: tuple[str, ...] = ("hosts",)
) -> CollectiveReport:
    """Audit a ``jax.jit(...).lower(...).compile()`` result against ``mesh``.

    :param compiled: The compiled executable (has ``as_text()``).
    :param mesh: The mesh the program was compiled against.
    :param dcn_axes: Axis names that ride the data-center network.
    """
    return CollectiveReport(
        ops=parse_collectives(compiled.as_text(), mesh), dcn_axes=tuple(dcn_axes)
    )
