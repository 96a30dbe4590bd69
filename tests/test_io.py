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


@pytest.mark.parametrize("compress", [False, True])
def test_vtu_roundtrip_mixed(tmp_path, compress):
    coords, hexes = meshgen.box_hex(1, 2, 1)
    _, quads = meshgen.grid_quad(2, 1)
    p = tmp_path / "mixed.vtu"
    vtk.write_vtu(str(p), coords, {"c3d8": hexes, "s4": quads},
                  point_data={"z": coords[:, 2]}, compress=compress)
    pts, blocks = vtk.read_vtu(str(p))
    np.testing.assert_allclose(pts, coords)
    np.testing.assert_array_equal(blocks["c3d8"], hexes)
    np.testing.assert_array_equal(blocks["s4"], quads)
    pts2, conn2 = vtk.load_mesh(str(p), "c3d8")   # extension dispatch
    np.testing.assert_array_equal(conn2, hexes)


@pytest.mark.parametrize("etype,gen", [
    ("c3d4", lambda: meshgen.box_tet(2, 2, 2)),
    ("c3d10", lambda: meshgen.box_tet10(1, 1, 1)),
    ("c3d6", lambda: meshgen.box_wedge(1, 1, 1)),
])
def test_vtu_roundtrip_types(tmp_path, etype, gen):
    coords, conn = gen()
    p = tmp_path / f"{etype}.vtu"
    vtk.write_vtu(str(p), coords, {etype: conn})
    pts, conn2 = vtk.load_mesh(str(p), etype)
    np.testing.assert_allclose(pts, coords)
    np.testing.assert_array_equal(conn2, conn)


def test_vtu_ascii_and_inline_base64(tmp_path):
    """Hand-built .vtu files in the formats write_vtu does not emit."""
    coords, conn = meshgen.box_tet(1, 1, 1)
    n, m = coords.shape[0], conn.shape[0]
    offs = np.arange(1, m + 1) * 4
    # ascii
    pa = tmp_path / "ascii.vtu"
    pa.write_text(
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" byte_order="LittleEndian">\n'
        '<UnstructuredGrid>'
        f'<Piece NumberOfPoints="{n}" NumberOfCells="{m}">\n'
        '<Points><DataArray type="Float32" NumberOfComponents="3" '
        'format="ascii">\n'
        + " ".join(f"{v:.7g}" for v in coords.reshape(-1)) +
        '</DataArray></Points>\n'
        '<Cells><DataArray type="Int32" Name="connectivity" format="ascii">\n'
        + " ".join(str(v) for v in conn.reshape(-1)) +
        '</DataArray>\n'
        '<DataArray type="Int32" Name="offsets" format="ascii">\n'
        + " ".join(str(v) for v in offs) +
        '</DataArray>\n'
        '<DataArray type="UInt8" Name="types" format="ascii">\n'
        + " ".join("10" for _ in range(m)) +
        '</DataArray></Cells></Piece></UnstructuredGrid></VTKFile>\n')
    pts, blocks = vtk.read_vtu(str(pa))
    np.testing.assert_allclose(pts, coords, rtol=1e-6)
    np.testing.assert_array_equal(blocks["c3d4"], conn)

    # inline base64 (uncompressed, UInt32 headers)
    import base64
    import struct

    def b64(arr):
        raw = np.ascontiguousarray(arr).tobytes()
        return base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()

    pb = tmp_path / "b64.vtu"
    pb.write_text(
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" byte_order="LittleEndian" '
        'header_type="UInt32">\n'
        '<UnstructuredGrid>'
        f'<Piece NumberOfPoints="{n}" NumberOfCells="{m}">\n'
        '<Points><DataArray type="Float64" NumberOfComponents="3" '
        'format="binary">' + b64(coords.astype("<f8")) +
        '</DataArray></Points>\n'
        '<Cells><DataArray type="Int64" Name="connectivity" format="binary">'
        + b64(conn.astype("<i8")) + '</DataArray>\n'
        '<DataArray type="Int64" Name="offsets" format="binary">'
        + b64(offs.astype("<i8")) + '</DataArray>\n'
        '<DataArray type="UInt8" Name="types" format="binary">'
        + b64(np.full(m, 10, "u1")) + '</DataArray>'
        '</Cells></Piece></UnstructuredGrid></VTKFile>\n')
    pts, blocks = vtk.read_vtu(str(pb))
    np.testing.assert_allclose(pts, coords)
    np.testing.assert_array_equal(blocks["c3d4"], conn)


def test_vtu_inline_base64_compressed(tmp_path):
    """Compressed inline base64: header and body are separate segments."""
    import base64
    import struct
    import zlib

    coords, conn = meshgen.box_tet(1, 1, 1)
    n, m = coords.shape[0], conn.shape[0]
    offs = np.arange(1, m + 1) * 4

    def b64z(arr):
        raw = np.ascontiguousarray(arr).tobytes()
        comp = zlib.compress(raw)
        head = struct.pack("<QQQQ", 1, len(raw), len(raw), len(comp))
        return (base64.b64encode(head).decode()
                + base64.b64encode(comp).decode())

    p = tmp_path / "b64z.vtu"
    p.write_text(
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" byte_order="LittleEndian" '
        'header_type="UInt64" compressor="vtkZLibDataCompressor">\n'
        '<UnstructuredGrid>'
        f'<Piece NumberOfPoints="{n}" NumberOfCells="{m}">\n'
        '<Points><DataArray type="Float64" NumberOfComponents="3" '
        'format="binary">' + b64z(coords.astype("<f8")) +
        '</DataArray></Points>\n'
        '<Cells><DataArray type="Int64" Name="connectivity" format="binary">'
        + b64z(conn.astype("<i8")) + '</DataArray>\n'
        '<DataArray type="Int64" Name="offsets" format="binary">'
        + b64z(offs.astype("<i8")) + '</DataArray>\n'
        '<DataArray type="UInt8" Name="types" format="binary">'
        + b64z(np.full(m, 10, "u1")) + '</DataArray>'
        '</Cells></Piece></UnstructuredGrid></VTKFile>\n')
    pts, blocks = vtk.read_vtu(str(p))
    np.testing.assert_allclose(pts, coords)
    np.testing.assert_array_equal(blocks["c3d4"], conn)


def _vtk_style_compressed_appended(coords, conn, header_dtype, blocksize,
                                   encode_b64):
    """Emulate vtkXMLUnstructuredGridWriter output byte-for-byte in shape:
    appended data, vtkZLibDataCompressor with the given block size
    (VTK default 32768 — large arrays span MULTIPLE blocks), offsets in
    ENCODED space when encode_b64 (each array base64'd separately, header
    segment separate from body — the pyvista/VTK writer contract)."""
    import base64
    import zlib

    hd = np.dtype(header_dtype)
    hname = {"<u4": "UInt32", "<u8": "UInt64", "<i4": "Int32"}[
        str(hd.str).replace("|", "<")]
    n, m = coords.shape[0], conn.shape[0]
    offs = np.arange(1, m + 1) * conn.shape[1]
    arrays = [("Float64", "Points", coords.astype("<f8")),
              ("Int64", "connectivity", conn.astype("<i8")),
              ("Int64", "offsets", offs.astype("<i8")),
              ("UInt8", "types",
               np.full(m, vtk.ETYPE_TO_VTK["c3d4"], "u1"))]
    payload = b"" if not encode_b64 else ""
    offsets = []
    for _, _, arr in arrays:
        raw = np.ascontiguousarray(arr).tobytes()
        blocks = [raw[i:i + blocksize] for i in range(0, len(raw), blocksize)]
        comp = [zlib.compress(b) for b in blocks]
        head = np.array([len(blocks), blocksize,
                         len(blocks[-1]) if blocks else 0]
                        + [len(c) for c in comp], hd).tobytes()
        offsets.append(len(payload))
        if encode_b64:
            payload += (base64.b64encode(head).decode()
                        + base64.b64encode(b"".join(comp)).decode())
        else:
            payload += head + b"".join(comp)
    enc = "base64" if encode_b64 else "raw"
    xml = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" version="1.0" '
        f'byte_order="LittleEndian" header_type="{hname}" '
        'compressor="vtkZLibDataCompressor">\n'
        '<UnstructuredGrid>'
        f'<Piece NumberOfPoints="{n}" NumberOfCells="{m}">\n'
        '<Points><DataArray type="Float64" NumberOfComponents="3" '
        f'format="appended" offset="{offsets[0]}"/></Points>\n'
        '<Cells>'
        '<DataArray type="Int64" Name="connectivity" format="appended" '
        f'offset="{offsets[1]}"/>\n'
        '<DataArray type="Int64" Name="offsets" format="appended" '
        f'offset="{offsets[2]}"/>\n'
        '<DataArray type="UInt8" Name="types" format="appended" '
        f'offset="{offsets[3]}"/>'
        '</Cells></Piece></UnstructuredGrid>\n'
        f'<AppendedData encoding="{enc}">_')
    tail = '</AppendedData>\n</VTKFile>\n'
    if encode_b64:
        return (xml + payload + tail).encode()
    return xml.encode() + payload + tail.encode()


@pytest.mark.parametrize("header_dtype", ["<u4", "<u8", "<i4"])
@pytest.mark.parametrize("encode_b64", [False, True])
def test_vtu_multiblock_compressed_appended(tmp_path, header_dtype,
                                            encode_b64):
    """pyvista's actual default output: appended zlib data in 32 KB
    blocks (multi-block for large arrays), UInt32/UInt64/Int32 headers,
    raw or per-array base64 encoding (offsets in encoded space)."""
    coords, conn = meshgen.box_tet(6, 6, 6)   # conn bytes > 2 blocks
    data = _vtk_style_compressed_appended(coords, conn, header_dtype,
                                          blocksize=8192,
                                          encode_b64=encode_b64)
    p = tmp_path / "pv.vtu"
    p.write_bytes(data)
    pts, blocks = vtk.read_vtu(str(p))
    np.testing.assert_allclose(pts, coords)
    np.testing.assert_array_equal(blocks["c3d4"], conn)


def test_vtu_uint8_header_inline(tmp_path):
    """UInt8 header_type variant (tiny arrays, uncompressed inline b64)."""
    import base64

    coords, conn = meshgen.box_tet(1, 1, 1)
    n, m = coords.shape[0], conn.shape[0]
    offs = np.arange(1, m + 1) * 4

    def b64(arr):
        raw = np.ascontiguousarray(arr).tobytes()
        assert len(raw) < 256
        return base64.b64encode(bytes([len(raw)]) + raw).decode()

    p = tmp_path / "u8.vtu"
    p.write_text(
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" byte_order="LittleEndian" '
        'header_type="UInt8">\n'
        '<UnstructuredGrid>'
        f'<Piece NumberOfPoints="{n}" NumberOfCells="{m}">\n'
        '<Points><DataArray type="Float32" NumberOfComponents="3" '
        'format="binary">' + b64(coords.astype("<f4")) +
        '</DataArray></Points>\n'
        '<Cells><DataArray type="Int32" Name="connectivity" format="binary">'
        + b64(conn.astype("<i4")) + '</DataArray>\n'
        '<DataArray type="Int32" Name="offsets" format="binary">'
        + b64(offs.astype("<i4")) + '</DataArray>\n'
        '<DataArray type="UInt8" Name="types" format="binary">'
        + b64(np.full(m, 10, "u1")) + '</DataArray>'
        '</Cells></Piece></UnstructuredGrid></VTKFile>\n')
    pts, blocks = vtk.read_vtu(str(p))
    np.testing.assert_allclose(pts, coords.astype(np.float32))
    np.testing.assert_array_equal(blocks["c3d4"], conn)


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
