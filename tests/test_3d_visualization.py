"""3D mesh visualisation path (analogue of ``tests/test_3d_visualization.py``)
exercised against a mocked ``trimesh`` and a fabricated local asset cache, so
the component runs without network access or the optional dependency."""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct


class FakeMesh:
    def __init__(self):
        # Unit cross-section, 2 m long along the beam (z) axis.
        self.extents = (1.0, 1.0, 2.0)
        self.scales = []
        self.transforms = []

    def apply_scale(self, scale):
        self.scales.append(float(scale))

    def apply_transform(self, transform):
        self.transforms.append(np.asarray(transform))


class FakeScene:
    def __init__(self):
        self.geometries = []

    def add_geometry(self, geometry):
        if geometry is not None:
            self.geometries.append(geometry)


def _make_fake_trimesh():
    transformations = types.ModuleType("trimesh.transformations")

    def translation_matrix(direction):
        matrix = np.eye(4)
        matrix[:3, 3] = direction
        return matrix

    transformations.translation_matrix = translation_matrix
    transformations.identity_matrix = lambda: np.eye(4)

    trimesh = types.ModuleType("trimesh")
    trimesh.transformations = transformations
    trimesh.Scene = FakeScene
    trimesh.loaded = []

    def load_mesh(path):
        mesh = FakeMesh()
        trimesh.loaded.append(path)
        return mesh

    trimesh.load_mesh = load_mesh
    return trimesh


@pytest.fixture
def fake_trimesh(monkeypatch, tmp_path):
    """Install a stub ``trimesh`` and a fabricated asset cache with meshes for
    drift, quadrupole and horizontal_corrector (but deliberately not bpm)."""
    trimesh = _make_fake_trimesh()
    monkeypatch.setitem(sys.modules, "trimesh", trimesh)
    monkeypatch.setitem(sys.modules, "trimesh.transformations", trimesh.transformations)
    asset_dir = tmp_path / "assets" / "v1.2.0"
    asset_dir.mkdir(parents=True)
    for name in ("drift", "quadrupole", "horizontal_corrector"):
        (asset_dir / f"{name}.glb").write_bytes(b"fake-glb")
    monkeypatch.setenv("CHEETAH_TPU_ASSETS", str(tmp_path / "assets"))
    return trimesh


def test_element_to_mesh_scales_and_translates(fake_trimesh):
    """The mesh is scaled to the element length and the output transform
    advances the scene by exactly that length (ref ``element.py:391-483``)."""
    quad = ct.Quadrupole(length=jnp.asarray(0.2, jnp.float64))

    mesh, output_transform = quad.to_mesh(show_download_progress=False)

    assert isinstance(mesh, FakeMesh)
    # length / mesh_length = 0.2 / 2.0, then the cuteness factor (default 1).
    assert mesh.scales == [pytest.approx(0.1), pytest.approx(1.0)]
    np.testing.assert_allclose(output_transform[:3, 3], [0.0, 0.0, 0.2])


def test_element_to_mesh_cuteness_dict(fake_trimesh):
    quad = ct.Quadrupole(length=jnp.asarray(0.2, jnp.float64), name="q1")

    mesh, _ = quad.to_mesh(cuteness={"q1": 3.0}, show_download_progress=False)
    assert mesh.scales[-1] == pytest.approx(3.0)

    mesh, _ = quad.to_mesh(cuteness={"*": 2.0}, show_download_progress=False)
    assert mesh.scales[-1] == pytest.approx(2.0)


def test_segment_to_mesh_chains_transforms(fake_trimesh):
    """``Segment.to_mesh`` returns a scene plus the lattice-exit transform,
    and each element mesh is placed at its upstream s position (ref
    ``segment.py:1029-1055``)."""
    segment = ct.Segment(
        [
            ct.Drift(length=jnp.asarray(0.3, jnp.float64)),
            ct.Quadrupole(length=jnp.asarray(0.2, jnp.float64)),
            ct.Drift(length=jnp.asarray(0.1, jnp.float64)),
            ct.HorizontalCorrector(length=jnp.asarray(0.1, jnp.float64)),
            ct.Drift(length=jnp.asarray(0.3, jnp.float64)),
        ]
    )

    scene, output_transform = segment.to_mesh(show_download_progress=False)

    assert isinstance(scene, FakeScene)
    assert isinstance(output_transform, np.ndarray)
    assert output_transform.shape == (4, 4)
    # The exit transform advances by the summed lattice length.
    np.testing.assert_allclose(output_transform[:3, 3], [0.0, 0.0, 1.0])
    assert len(scene.geometries) == 5
    # Each mesh was placed at the cumulative upstream length.
    placements = [mesh.transforms[0][2, 3] for mesh in scene.geometries]
    np.testing.assert_allclose(placements, [0.0, 0.3, 0.5, 0.6, 0.7])


def test_no_mesh_warning(fake_trimesh):
    """A missing asset warns and skips the element (ref behaviour)."""
    bpm = ct.BPM(name="bpm1")

    with pytest.warns(ct.VisualizationWarning, match="bpm1 of type BPM"):
        mesh, output_transform = bpm.to_mesh(show_download_progress=False)

    assert mesh is None
    np.testing.assert_allclose(output_transform, np.eye(4))


def test_zero_length_warning(fake_trimesh):
    hcorr = ct.HorizontalCorrector(length=jnp.asarray(0.0, jnp.float64), name="h1")

    with pytest.warns(ct.VisualizationWarning, match="length of zero"):
        mesh, output_transform = hcorr.to_mesh(show_download_progress=False)

    assert isinstance(mesh, FakeMesh)
    np.testing.assert_allclose(output_transform[:3, 3], [0.0, 0.0, 0.0])


def test_to_mesh_without_trimesh_raises(monkeypatch):
    monkeypatch.setitem(sys.modules, "trimesh", None)
    drift = ct.Drift(length=jnp.asarray(1.0, jnp.float64))
    with pytest.raises(ImportError, match="trimesh"):
        drift.to_mesh()
