"""Measure the f32/bf16 precision contract against the float64 golden corpus.

For every element class in the zoo, tracks the corpus incoming beam at
float32 and bfloat16 and reports the worst-case deviation from the float64
golden output: max absolute phase-space coordinate error and relative beam
moment (sigma_x / sigma_px) error. The resulting table documents the
dual-precision contract in docs/design.md (run on CPU; the numerics are
dtype-bound, not backend-bound).

    python scripts/precision_table.py [--markdown]
"""

import argparse
import collections
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import cheetah_tpu as ct

RESOURCES = pathlib.Path(__file__).resolve().parent.parent / (
    "tests/resources/consistency"
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--markdown", action="store_true")
    args = parser.parse_args()

    from element_zoo import ELEMENT_CASES, build_jax_element

    incoming64 = np.load(RESOURCES / "incoming.npz")["particles"]

    # Worst case per (class, dtype): coordinate error and moment error.
    coord_err = collections.defaultdict(float)
    moment_err = collections.defaultdict(float)

    for index, (class_name, spec, parity) in enumerate(ELEMENT_CASES):
        if spec is None or not parity:
            continue
        golden_path = RESOURCES / f"{index:03d}_{class_name}.npz"
        if not golden_path.is_file():
            continue
        golden = np.load(golden_path)["particles"]

        for dtype, label in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
            spec_cast = {
                k: (float(v) if isinstance(v, (int, float)) and k not in (
                    "num_steps", "binning") else v)
                for k, v in spec.items()
            }
            element = build_jax_element(class_name, spec_cast)
            element = jax.tree_util.tree_map(
                lambda x: x.astype(dtype) if hasattr(x, "dtype") else x, element
            )
            beam = ct.ParticleBeam(
                particles=jnp.asarray(incoming64, dtype),
                energy=jnp.asarray(1.5e8, dtype),
            )
            out = np.asarray(
                element.track(beam).particles, dtype=np.float64
            )
            err = np.max(np.abs(out[..., :6] - golden[..., :6]))
            coord_err[(class_name, label)] = max(
                coord_err[(class_name, label)], float(err)
            )
            for col in (0, 1):
                g = np.std(golden[..., col])
                o = np.std(out[..., col])
                if g > 0:
                    moment_err[(class_name, label)] = max(
                        moment_err[(class_name, label)], abs(o - g) / g
                    )

    classes = sorted({c for c, _ in coord_err})
    if args.markdown:
        print("| Element class | f32 max coord err | f32 moment rel err | "
              "bf16 max coord err | bf16 moment rel err |")
        print("|---|---|---|---|---|")
        for c in classes:
            print(
                f"| {c} | {coord_err[(c, 'f32')]:.1e} | "
                f"{moment_err[(c, 'f32')]:.1e} | "
                f"{coord_err[(c, 'bf16')]:.1e} | "
                f"{moment_err[(c, 'bf16')]:.1e} |"
            )
    else:
        for c in classes:
            print(
                f"{c:30s} f32: coord {coord_err[(c, 'f32')]:.1e} "
                f"moment {moment_err[(c, 'f32')]:.1e}   "
                f"bf16: coord {coord_err[(c, 'bf16')]:.1e} "
                f"moment {moment_err[(c, 'bf16')]:.1e}"
            )


if __name__ == "__main__":
    main()
