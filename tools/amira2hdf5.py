"""AmiraMesh -> HDF5 converter (tools/AmiraMesh2HDF5.cpp analog).

Parses binary-little-endian AmiraMesh lattices (the format the reference
tool handles: uniform-coordinate 2D/3D float lattices) and writes the data
blocks into an HDF5 file.

Usage: python tools/amira2hdf5.py <input.am> <output.h5>
"""

from __future__ import annotations

import re
import sys

import numpy as np


def parse_amira(path: str):
    raw = open(path, "rb").read()
    header_end = raw.find(b"# Data section follows")
    if header_end < 0:
        raise ValueError("no data section marker found")
    header = raw[:header_end].decode("ascii", errors="replace")

    if "AmiraMesh BINARY-LITTLE-ENDIAN" not in header:
        raise ValueError("only binary little-endian AmiraMesh is supported")

    m = re.search(r"define\s+Lattice\s+(\d+)\s+(\d+)(?:\s+(\d+))?", header)
    if not m:
        raise ValueError("no Lattice definition")
    dims = tuple(int(g) for g in m.groups() if g)

    bbox = None
    mb = re.search(r"BoundingBox\s+([\d\s.eE+-]+)", header)
    if mb:
        bbox = [float(v) for v in mb.group(1).split()]

    # data declarations: Lattice { float Data } @1  (possibly float[n])
    decls = re.findall(r"Lattice\s*\{\s*(\w+)(?:\[(\d+)\])?\s+(\w+)\s*\}\s*@(\d+)", header)
    dtype_map = {"float": np.float32, "double": np.float64, "int": np.int32,
                 "byte": np.uint8, "short": np.int16}

    # data blocks start after "@N" markers in the body
    body = raw[header_end:]
    blocks = {}
    for m2 in re.finditer(rb"@(\d+)\n", body):
        blocks[int(m2.group(1))] = m2.end()

    out = {}
    for typ, ncomp, name, idx in decls:
        idx = int(idx)
        ncomp = int(ncomp) if ncomp else 1
        dt = dtype_map[typ]
        count = int(np.prod(dims)) * ncomp
        start = header_end + blocks[idx]
        arr = np.frombuffer(raw, dtype=dt, count=count, offset=start)
        shape = dims[::-1] + ((ncomp,) if ncomp > 1 else ())
        out[name] = arr.reshape(shape)
    return out, dims, bbox


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    import h5py

    data, dims, bbox = parse_amira(sys.argv[1])
    with h5py.File(sys.argv[2], "w") as f:
        f.attrs["dims"] = dims
        if bbox:
            f.attrs["bounding_box"] = bbox
        for name, arr in data.items():
            f.create_dataset(name, data=arr)
    print(f"wrote {sys.argv[2]}: {list(data)} dims={dims}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
