"""Minimal pure-numpy reader for the repo's legacy binary VTK output.

The reference verifies each channel check from BOTH writers — VTK
(python/verify_laminar_channel_vtk.py, verify_couette_vtk.py via the
``vtk`` package) and XDMF/HDF5. The ``vtk`` package is not available
here, so this parses the legacy ``STRUCTURED_GRID`` files our
``io/vtk.py`` writer emits (binary, big-endian doubles, point data on
the cell-center grid — format parity with src/VTKWriter.hpp:14-153)
directly with numpy.

Returns arrays indexed (nx, ny) like the solver (axis 0 = x).
"""

from __future__ import annotations

import numpy as np


def read_structured_grid(path):
    """Parse one legacy binary STRUCTURED_GRID .vtk file.

    Returns dict with 'x', 'y' (1D center coords), 'scalars' {name: (nx,
    ny)}, 'vectors' {name: (nx, ny, 2)} and 'time' (from the title line).
    """
    with open(path, "rb") as f:
        data = f.read()

    def next_line(pos):
        end = data.index(b"\n", pos)
        return data[pos:end].decode("ascii", "replace"), end + 1

    pos = 0
    _, pos = next_line(pos)                     # # vtk DataFile Version
    title, pos = next_line(pos)
    t = float(title.split(":")[1]) if ":" in title else float("nan")
    fmt, pos = next_line(pos)
    if fmt.strip() != "BINARY":
        raise ValueError(f"{path}: expected BINARY, got {fmt!r}")
    _, pos = next_line(pos)                     # DATASET STRUCTURED_GRID
    dims_line, pos = next_line(pos)
    nx, ny, nz = (int(v) for v in dims_line.split()[1:4])
    pts_line, pos = next_line(pos)
    n_pts = int(pts_line.split()[1])
    assert n_pts == nx * ny * nz, (n_pts, nx, ny, nz)

    pts = np.frombuffer(data, dtype=">f8", count=3 * n_pts, offset=pos)
    pos += pts.nbytes
    pts = pts.reshape(ny, nx, 3)                # x fastest (VTK order)
    x = np.ascontiguousarray(pts[0, :, 0])
    y = np.ascontiguousarray(pts[:, 0, 1])

    scalars, vectors = {}, {}
    while pos < len(data):
        line, pos = next_line(pos)
        line = line.strip()
        if not line or line.startswith("POINT_DATA") \
                or line.startswith("CELL_DATA"):
            continue
        if line.startswith("SCALARS"):
            name = line.split()[1]
            _, pos = next_line(pos)             # LOOKUP_TABLE default
            arr = np.frombuffer(data, dtype=">f8", count=n_pts, offset=pos)
            pos += arr.nbytes
            scalars[name] = arr.reshape(ny, nx).T  # -> (nx, ny)
        elif line.startswith("VECTORS"):
            name = line.split()[1]
            arr = np.frombuffer(data, dtype=">f8", count=3 * n_pts,
                                offset=pos)
            pos += arr.nbytes
            vec = arr.reshape(ny, nx, 3)
            vectors[name] = np.stack(
                [vec[..., 0].T, vec[..., 1].T], axis=-1)  # (nx, ny, 2)
        else:
            raise ValueError(f"{path}: unexpected record {line!r}")
    return {"x": x, "y": y, "scalars": scalars, "vectors": vectors,
            "time": t}


def last_vtk_file(output_dir):
    import glob
    import os

    files = sorted(glob.glob(os.path.join(output_dir, "state_*.vtk")))
    if not files:
        raise FileNotFoundError(f"no state_*.vtk in {output_dir}")
    return files[-1]
