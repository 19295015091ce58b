"""Canonical constructor arguments for every element class.

The analogue of the reference's ``ELEMENT_SUBCLASSES_ARGS`` registry
(``tests/conftest.py:12-152``): `test_elements.py` asserts that every Element
subclass has at least one entry here, so new elements cannot silently escape
coverage. Specs are plain Python numbers/lists so the same spec constructs
both the cheetah_tpu element and the torch reference element.
"""

# (class_name, constructor_spec, expects_reference_parity)
ELEMENT_CASES = [
    ("Drift", {"length": 1.1}, True),
    ("Drift", {"length": 0.9, "tracking_method": "second_order"}, True),
    ("Drift", {"length": 0.9, "tracking_method": "drift_kick_drift"}, True),
    ("Quadrupole", {"length": 0.3, "k1": 4.2}, True),
    ("Quadrupole", {"length": 0.3, "k1": -7.0, "tilt": 0.1,
                    "misalignment": [1e-4, -2e-4]}, True),
    ("Quadrupole", {"length": 0.3, "k1": 4.2,
                    "tracking_method": "second_order"}, True),
    ("Quadrupole", {"length": 0.3, "k1": 4.2, "num_steps": 3,
                    "tracking_method": "drift_kick_drift"}, True),
    ("Dipole", {"length": 0.5, "angle": 0.2}, True),
    ("Dipole", {"length": 0.5, "angle": 0.15, "k1": 1.5, "dipole_e1": 0.05,
                "dipole_e2": -0.03, "tilt": 0.1, "gap": 0.02,
                "fringe_integral": 0.4}, True),
    ("Dipole", {"length": 0.5, "angle": 0.2,
                "tracking_method": "second_order"}, True),
    ("Dipole", {"length": 0.5, "angle": 0.2, "dipole_e1": 0.05,
                "dipole_e2": -0.03, "gap": 0.02, "fringe_integral": 0.4,
                "tracking_method": "drift_kick_drift"}, True),
    ("RBend", {"length": 0.5, "angle": 0.2, "rbend_e1": 0.05,
               "rbend_e2": -0.02}, True),
    ("Sextupole", {"length": 0.25, "k2": 40.0}, True),
    ("Sextupole", {"length": 0.25, "k2": -25.0, "tilt": 0.05,
                   "misalignment": [1e-4, 2e-4]}, True),
    ("Sextupole", {"length": 0.25, "k2": 40.0,
                   "tracking_method": "linear"}, True),
    ("Solenoid", {"length": 0.4, "k": 2.5,
                  "misalignment": [1e-4, -1e-4]}, True),
    ("Undulator", {"length": 2.0, "period": 0.05, "kx": 1.2, "ky": 0.0}, True),
    ("Undulator", {"length": 2.0, "period": 0.05, "kx": 0.0, "ky": 0.8}, True),
    ("Cavity", {"length": 1.0, "voltage": 5e6, "phase": 30.0,
                "frequency": 1.3e9}, True),
    ("Cavity", {"length": 1.0, "voltage": 5e6, "phase": -15.0,
                "frequency": 1.3e9, "cavity_type": "traveling_wave"}, True),
    ("Cavity", {"length": 1.0, "voltage": 0.0, "phase": 0.0,
                "frequency": 1.3e9}, True),
    ("TransverseDeflectingCavity", {"length": 0.6, "voltage": 1e6,
                                    "phase": 0.1, "frequency": 2.9e9,
                                    "misalignment": [1e-4, -1e-4],
                                    "tilt": 0.05}, True),
    ("HorizontalCorrector", {"length": 0.1, "angle": 2e-4}, True),
    ("VerticalCorrector", {"length": 0.1, "angle": -3e-4}, True),
    ("CombinedCorrector", {"length": 0.1, "horizontal_angle": 2e-4,
                           "vertical_angle": -1e-4}, True),
    ("Marker", {}, True),
    ("Aperture", {"x_max": 2e-4, "y_max": 3e-4, "shape": "rectangular"}, True),
    ("Aperture", {"x_max": 2e-4, "y_max": 3e-4, "shape": "elliptical"}, True),
    ("BPM", {"is_active": True}, True),
    ("Screen", {"is_active": True}, True),
    ("Screen", {"is_active": True, "is_blocking": True}, True),
    # CustomTransferMap, Segment, Superimposed and SpaceChargeKick are covered
    # by dedicated tests (constructors take elements/matrices, not scalars).
    ("CustomTransferMap", None, False),
    ("Segment", None, False),
    ("Superimposed", None, False),
    ("SpaceChargeKick", None, False),
]


def build_jax_element(class_name: str, spec: dict):
    import jax.numpy as jnp

    import cheetah_tpu as ct

    cls = getattr(ct, class_name)
    kwargs = {}
    for key, value in spec.items():
        if isinstance(value, (int, float)) and key not in ("num_steps", "binning"):
            kwargs[key] = jnp.asarray(value, jnp.float64)
        elif isinstance(value, list):
            kwargs[key] = jnp.asarray(value, jnp.float64)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def build_ref_element(class_name: str, spec: dict):
    from reference_oracle import ref, torch

    cls = getattr(ref, class_name)
    kwargs = {}
    for key, value in spec.items():
        if isinstance(value, (int, float)) and key not in ("num_steps", "binning"):
            kwargs[key] = torch.tensor(value, dtype=torch.float64)
        elif isinstance(value, list):
            kwargs[key] = torch.tensor(value, dtype=torch.float64)
        else:
            kwargs[key] = value
    return cls(**kwargs)
