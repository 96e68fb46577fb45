"""Minimal VTK XML StructuredGrid (.vts) writer — replaces the pyevtk dependency.

Writes appended raw binary (little-endian) .vts files that ParaView reads;
covers the reference's ``grid_to_vtk`` and ``elements_to_vtk`` surfaces
(visualization.py:52-117).
"""

import struct

import numpy as np


def _da(name, arr, n_comp):
    return (f'<DataArray type="Float64" Name="{name}" '
            f'NumberOfComponents="{n_comp}" format="appended" offset="OFFSET"/>')


def write_vts(path, x, y, point_data=None):
    """Write a 2D structured grid (nx, ny) with optional nodal scalar fields."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nx, ny = x.shape
    point_data = point_data or {}

    blocks = []

    def add_block(arr):
        raw = arr.astype("<f8").tobytes()
        blocks.append(struct.pack("<Q", len(raw)) + raw)

    pts = np.zeros((nx * ny, 3))
    # VTK expects x varying fastest; our arrays are (i, j) so transpose
    pts[:, 0] = x.T.ravel()
    pts[:, 1] = y.T.ravel()
    add_block(pts)
    fields_xml = []
    for name, arr in point_data.items():
        arr = np.asarray(arr, dtype=np.float64)
        add_block(arr.T.ravel())
        fields_xml.append((name, 1))

    offsets = []
    off = 0
    for b in blocks:
        offsets.append(off)
        off += len(b)

    xml = ['<?xml version="1.0"?>',
           '<VTKFile type="StructuredGrid" version="1.0" byte_order="LittleEndian" '
           'header_type="UInt64">',
           f'<StructuredGrid WholeExtent="0 {nx-1} 0 {ny-1} 0 0">',
           f'<Piece Extent="0 {nx-1} 0 {ny-1} 0 0">',
           '<Points>',
           f'<DataArray type="Float64" Name="Points" NumberOfComponents="3" '
           f'format="appended" offset="{offsets[0]}"/>',
           '</Points>',
           '<PointData>']
    for k, (name, _) in enumerate(fields_xml):
        xml.append(f'<DataArray type="Float64" Name="{name}" NumberOfComponents="1" '
                   f'format="appended" offset="{offsets[k+1]}"/>')
    xml += ['</PointData>', '</Piece>', '</StructuredGrid>',
            '<AppendedData encoding="raw">', '_']
    header = "\n".join(xml).encode()
    footer = b"\n</AppendedData>\n</VTKFile>\n"
    with open(path, "wb") as f:
        f.write(header)
        for b in blocks:
            f.write(b)
        f.write(footer)
    return path


def grid_to_vtk(basepath, x, y):
    """Reference grid export (visualization.py:52-64)."""
    return write_vts(basepath + ".vts", x, y)


def elements_to_vtk(basepath, x, y, point_data=None):
    """Solution export on the global node lattice.

    The reference writes one sub-lattice per element; for a conforming nodal
    lattice a single structured grid is equivalent and lighter.
    ``point_data`` values are (nx, ny) nodal arrays.
    """
    return write_vts(basepath + ".vts", x, y, point_data)
