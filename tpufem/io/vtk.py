"""Legacy VTK unstructured-grid reader/writer (no pyvista dependency).

Capability parity with reference vtk_loader_to_torch (solver/element.py:39-90)
— that function shells out to pyvista, which is not available here; this is
a self-contained parser for legacy .vtk files (ASCII and big-endian binary,
DATASET UNSTRUCTURED_GRID), plus a writer for results inspection.

VTK cell type ids <-> element types:
  10 c3d4, 24 c3d10, 12 c3d8, 25 c3d20, 13 c3d6, 26 c3d15,
  5 s3, 22 s6, 9 s4, 23 s8.
"""
from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import numpy as np

VTK_TO_ETYPE = {10: "c3d4", 24: "c3d10", 12: "c3d8", 25: "c3d20",
                13: "c3d6", 26: "c3d15", 5: "s3", 22: "s6", 9: "s4", 23: "s8"}
ETYPE_TO_VTK = {v: k for k, v in VTK_TO_ETYPE.items()}
_NODES = {"c3d4": 4, "c3d10": 10, "c3d8": 8, "c3d20": 20, "c3d6": 6,
          "c3d15": 15, "s3": 3, "s6": 6, "s4": 4, "s8": 8}

_DTYPES = {"float": ">f4", "double": ">f8", "int": ">i4", "long": ">i8",
           "unsigned_int": ">u4", "vtktypeint64": ">i8", "vtktypeint32": ">i4",
           "char": ">i1", "unsigned_char": ">u1", "short": ">i2"}


def _read_tokens_ascii(data: bytes, offset: int, count: int, dtype):
    toks = []
    pos = offset
    while len(toks) < count:
        eol = data.find(b"\n", pos)
        if eol < 0:
            eol = len(data)
        toks.extend(data[pos:eol].split())
        pos = eol + 1
    arr = np.array(toks[:count], dtype=dtype)
    return arr, pos


def read_vtk(path: str) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Parse a legacy .vtk unstructured grid.

    Returns (points [N, 3] float64, {etype: connectivity [M_t, k]}).
    """
    with open(path, "rb") as f:
        data = f.read()

    lines_end = 0
    header_lines = []
    pos = 0
    for _ in range(4):
        eol = data.find(b"\n", pos)
        header_lines.append(data[pos:eol].strip().decode("latin1"))
        pos = eol + 1
    binary = header_lines[2].upper() == "BINARY"
    if "UNSTRUCTURED_GRID" not in header_lines[3].upper():
        raise ValueError(f"not an unstructured grid: {header_lines[3]}")

    points = None
    conn_flat = None
    offsets = None
    cell_types = None

    while pos < len(data):
        eol = data.find(b"\n", pos)
        if eol < 0:
            break
        line = data[pos:eol].strip().decode("latin1")
        pos = eol + 1
        if not line:
            continue
        parts = line.split()
        kw = parts[0].upper()
        if kw == "POINTS":
            n = int(parts[1])
            dt = _DTYPES[parts[2].lower()]
            if binary:
                nbytes = n * 3 * np.dtype(dt).itemsize
                points = np.frombuffer(data[pos:pos + nbytes], dtype=dt
                                       ).astype(np.float64).reshape(n, 3)
                pos += nbytes + 1
            else:
                arr, pos = _read_tokens_ascii(data, pos, n * 3, np.float64)
                points = arr.reshape(n, 3)
        elif kw == "CELLS":
            ncells, total = int(parts[1]), int(parts[2])
            if binary:
                nbytes = total * 4
                raw = np.frombuffer(data[pos:pos + nbytes], dtype=">i4"
                                    ).astype(np.int64)
                pos += nbytes + 1
            else:
                raw, pos = _read_tokens_ascii(data, pos, total, np.int64)
            if ncells + 1 == total or (total == ncells + 1):
                offsets = raw  # rare OFFSETS form
            else:
                conn_flat = raw
        elif kw in ("OFFSETS", "CONNECTIVITY"):
            n = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
            dt = _DTYPES.get(parts[-1].lower(), ">i8")
            count = n if n is not None else 0
            if binary:
                nbytes = count * np.dtype(dt).itemsize
                raw = np.frombuffer(data[pos:pos + nbytes], dtype=dt
                                    ).astype(np.int64)
                pos += nbytes + 1
            else:
                raw, pos = _read_tokens_ascii(data, pos, count, np.int64)
            if kw == "OFFSETS":
                offsets = raw
            else:
                conn_flat = raw
        elif kw == "CELL_TYPES":
            n = int(parts[1])
            if binary:
                nbytes = n * 4
                cell_types = np.frombuffer(data[pos:pos + nbytes], dtype=">i4"
                                           ).astype(np.int64)
                pos += nbytes + 1
            else:
                cell_types, pos = _read_tokens_ascii(data, pos, n, np.int64)
        elif kw in ("POINT_DATA", "CELL_DATA", "FIELD"):
            break  # attributes not needed for mesh loading

    if points is None or conn_flat is None or cell_types is None:
        raise ValueError("incomplete VTK file (need POINTS, CELLS, CELL_TYPES)")

    blocks: Dict[str, list] = {}
    if offsets is not None and conn_flat is not None and offsets.size == cell_types.size + 1:
        for ci, ct in enumerate(cell_types):
            et = VTK_TO_ETYPE.get(int(ct))
            if et is None:
                continue
            blocks.setdefault(et, []).append(
                conn_flat[offsets[ci]:offsets[ci + 1]])
    else:
        # classic [n, id0, ..., idn-1] stream
        i = 0
        ci = 0
        while i < conn_flat.size:
            n = int(conn_flat[i])
            et = VTK_TO_ETYPE.get(int(cell_types[ci]))
            if et is not None:
                blocks.setdefault(et, []).append(conn_flat[i + 1:i + 1 + n])
            i += n + 1
            ci += 1
    out = {et: np.stack(v).astype(np.int32) for et, v in blocks.items()}
    return points, out


def load_mesh(path: str, element_type: Optional[str] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """(points, conn) for one element type — vtk_loader_to_torch parity."""
    points, blocks = read_vtk(path)
    if element_type is None:
        if len(blocks) != 1:
            raise ValueError(f"mesh has multiple cell types {list(blocks)}; "
                             "pass element_type")
        return points, next(iter(blocks.values()))
    et = element_type.lower()
    if et not in blocks:
        raise ValueError(f"no {et} cells in {path} (has {list(blocks)})")
    return points, blocks[et]


def write_vtk(path: str, points, blocks: Dict[str, np.ndarray],
              point_data: Optional[Dict[str, np.ndarray]] = None,
              title: str = "tpufem output") -> None:
    """Write an ASCII legacy .vtk unstructured grid with optional nodal data."""
    points = np.asarray(points, dtype=np.float64)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write(title + "\n")
        f.write("ASCII\nDATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {points.shape[0]} double\n")
        np.savetxt(f, points, fmt="%.17g")
        ncells = sum(np.asarray(c).shape[0] for c in blocks.values())
        total = sum(np.asarray(c).size + np.asarray(c).shape[0]
                    for c in blocks.values())
        f.write(f"CELLS {ncells} {total}\n")
        for et, conn in blocks.items():
            conn = np.asarray(conn)
            k = conn.shape[1]
            with_n = np.concatenate(
                [np.full((conn.shape[0], 1), k, conn.dtype), conn], axis=1)
            np.savetxt(f, with_n, fmt="%d")
        f.write(f"CELL_TYPES {ncells}\n")
        for et, conn in blocks.items():
            ct = ETYPE_TO_VTK[et.lower()]
            np.savetxt(f, np.full(np.asarray(conn).shape[0], ct, np.int64),
                       fmt="%d")
        if point_data:
            f.write(f"POINT_DATA {points.shape[0]}\n")
            for name, arr in point_data.items():
                arr = np.asarray(arr)
                if arr.ndim == 1:
                    f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    np.savetxt(f, arr, fmt="%.17g")
                else:
                    f.write(f"VECTORS {name} double\n")
                    np.savetxt(f, arr, fmt="%.17g")
