"""Native (C++) mesh loader: build, parity with the pure-Python loaders,
and graceful fallback (SURVEY.md section 5 degradation contract)."""

import os
import struct

import numpy as np
import pytest

from manipulapy_tpu import native
from manipulapy_tpu.urdf import geometry


def _write_binary_stl(path, tris):
    """tris: (T, 3, 3) float array -> minimal binary STL."""
    tris = np.asarray(tris, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", tris.shape[0]))
        for t in tris:
            f.write(struct.pack("<3f", 0.0, 0.0, 1.0))  # normal
            for v in t:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def _write_ascii_stl(path, tris):
    with open(path, "w") as f:
        f.write("solid test\n")
        for t in np.asarray(tris, dtype=np.float64):
            f.write(" facet normal 0 0 1\n  outer loop\n")
            for v in t:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid test\n")


def _quad_tris():
    """Two triangles sharing an edge (tests vertex welding)."""
    a, b, c, d = (0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (1.0, 1.0, 0.0), (0.0, 1.0, 0.0)
    return np.array([[a, b, c], [a, c, d]])


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


class TestBuild:
    def test_builds_and_reports_available(self, built):
        assert os.path.exists(native.library_path())

    def test_disabled_by_env(self, monkeypatch):
        monkeypatch.setenv("MANIPULAPY_TPU_NO_NATIVE", "1")
        # _disabled gates _load for fresh loads; available() may still be
        # True if the lib was already cached — the contract that matters is
        # that geometry.load_stl keeps working either way (fallback test
        # below covers the unavailable case).
        assert native._disabled()


class TestSTLParity:
    def test_binary_stl_matches_python(self, built, tmp_path):
        p = str(tmp_path / "quad.stl")
        _write_binary_stl(p, _quad_tris())
        nv, nf = native.load_stl(p)
        with open(p, "rb") as f:
            ref = geometry._parse_binary_stl(
                (f.read(84), f)[1], 2
            )
        np.testing.assert_array_equal(nv, ref.vertices)
        np.testing.assert_array_equal(nf, ref.faces)
        assert nv.shape == (4, 3)  # welded: 6 soup verts -> 4 unique
        assert nf.shape == (2, 3)

    def test_ascii_stl_matches_python(self, built, tmp_path):
        p = str(tmp_path / "quad_ascii.stl")
        _write_ascii_stl(p, _quad_tris())
        nv, nf = native.load_stl(p)
        with open(p) as f:
            ref = geometry._parse_ascii_stl(f.read())
        np.testing.assert_array_equal(nv, ref.vertices)
        np.testing.assert_array_equal(nf, ref.faces)

    def test_random_soup_parity(self, built, tmp_path):
        rng = np.random.default_rng(0)
        tris = rng.normal(size=(50, 3, 3))
        # Duplicate some triangles so welding has real work.
        tris = np.concatenate([tris, tris[:10]], axis=0)
        p = str(tmp_path / "soup.stl")
        _write_binary_stl(p, tris)
        nv, nf = native.load_stl(p)
        with open(p, "rb") as f:
            f.read(84)
            ref = geometry._parse_binary_stl(f, 60)
        np.testing.assert_array_equal(nv, ref.vertices)
        np.testing.assert_array_equal(nf, ref.faces)

    def test_geometry_load_stl_uses_native(self, built, tmp_path):
        p = str(tmp_path / "quad.stl")
        _write_binary_stl(p, _quad_tris())
        mesh = geometry.load_stl(p)
        assert mesh.num_vertices == 4
        assert mesh.num_faces == 2

    def test_malformed_file_raises(self, built, tmp_path):
        p = tmp_path / "bad.stl"
        p.write_text("solid nope\nendsolid nope\n")
        with pytest.raises(ValueError):
            native.load_stl(str(p))


class TestOBJParity:
    OBJ = """
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
f -4 -3 -2
"""

    def test_obj_matches_python(self, built, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text(self.OBJ)
        nv, nf = native.load_obj(str(p))
        # Python loader without the native fast path:
        import unittest.mock as mock

        with mock.patch.object(geometry, "_try_native", return_value=None):
            ref = geometry.load_obj(str(p))
        np.testing.assert_array_equal(nv, ref.vertices)
        np.testing.assert_array_equal(nf, ref.faces)
        # quad fan-triangulated (2) + explicit triangle (1)
        assert nf.shape == (3, 3)

    def test_vt_vn_indices(self, built, tmp_path):
        p = tmp_path / "tex.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3\n")
        nv, nf = native.load_obj(str(p))
        assert nv.shape == (3, 3)
        np.testing.assert_array_equal(nf, [[0, 1, 2]])


class TestFallback:
    def test_python_fallback_when_native_off(self, tmp_path, monkeypatch):
        p = str(tmp_path / "quad.stl")
        _write_binary_stl(p, _quad_tris())
        monkeypatch.setattr(geometry, "_try_native", lambda *a: None)
        mesh = geometry.load_stl(p)
        assert mesh.num_vertices == 4 and mesh.num_faces == 2
