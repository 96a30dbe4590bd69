"""VTK reader/writer roundtrip + h5 loader."""
import numpy as np
import pytest

from tpufem.io import h5 as h5io
from tpufem.io import vtk
from tpufem.utils import meshgen
from tpufem.utils.format import human_readable_number


def test_vtk_roundtrip_tet(tmp_path):
    coords, conn = meshgen.box_tet(2, 2, 2)
    p = tmp_path / "mesh.vtk"
    vtk.write_vtk(str(p), coords, {"c3d4": conn},
                  point_data={"z": coords[:, 2], "disp": coords * 0.1})
    pts, blocks = vtk.read_vtk(str(p))
    np.testing.assert_allclose(pts, coords)
    np.testing.assert_array_equal(blocks["c3d4"], conn)
    pts2, conn2 = vtk.load_mesh(str(p), "c3d4")
    np.testing.assert_array_equal(conn2, conn)


def test_vtk_roundtrip_mixed(tmp_path):
    coords, hexes = meshgen.box_hex(1, 1, 1)
    _, quads = meshgen.grid_quad(1, 1)
    p = tmp_path / "mixed.vtk"
    vtk.write_vtk(str(p), coords, {"c3d8": hexes, "s4": quads})
    pts, blocks = vtk.read_vtk(str(p))
    np.testing.assert_array_equal(blocks["c3d8"], hexes)
    np.testing.assert_array_equal(blocks["s4"], quads)
    with pytest.raises(ValueError):
        vtk.load_mesh(str(p))  # ambiguous without element_type
    with pytest.raises(ValueError):
        vtk.load_mesh(str(p), "c3d10")


def test_vtk_second_order_roundtrip(tmp_path):
    coords, conn = meshgen.box_tet10(1, 1, 1)
    p = tmp_path / "tet10.vtk"
    vtk.write_vtk(str(p), coords, {"c3d10": conn})
    pts, conn2 = vtk.load_mesh(str(p), "c3d10")
    np.testing.assert_array_equal(conn2, conn)


def test_h5_sample_roundtrip(tmp_path):
    import h5py

    p = tmp_path / "sample_0.h5"
    forces = np.random.default_rng(0).standard_normal((10, 6))
    rbe2 = np.array([1, 2, 3])
    outputs = np.random.default_rng(1).standard_normal((10, 1, 6))
    with h5py.File(p, "w") as f:
        f["forces"] = forces
        f["rbe2"] = rbe2
        f["outputs"] = outputs
    d = h5io.load_simjeb_sample(str(p))
    np.testing.assert_allclose(d["forces"], forces)
    np.testing.assert_array_equal(d["rbe2"], rbe2)
    assert "rbe3" not in d
    m = h5io.rbe2_mask(10, d["rbe2"])
    assert m.sum() == 3 and m[1] == 1


def test_human_readable_number():
    assert human_readable_number(1234) == "1.2K"
    assert human_readable_number(2.5e9) == "2.5B"
    assert human_readable_number(3.2) == "3.2"
    assert human_readable_number(-4.5e6) == "-4.5M"


def test_viz_gated_without_plotly():
    from tpufem.viz import plot
    try:
        import plotly  # noqa: F401
        has_plotly = True
    except ImportError:
        has_plotly = False
    coords, conn = meshgen.box_tet(1, 1, 1)
    if not has_plotly:
        with pytest.raises(ImportError):
            plot.visualize_mesh(coords, conn, "c3d4")
    else:
        fig = plot.visualize_mesh(coords, conn, "c3d4")
        assert fig is not None
