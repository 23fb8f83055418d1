"""Gmsh `.msh` (format 4.1, ASCII and binary) reader.

The reference converts .msh to XDMF via meshio before loading
(reference: helmholtz_x/io_utils.py:98-136); this framework reads the
committed .msh files directly — geometry stays an offline step (see
mesh/generate.py for the built-in parametric generators), but no
meshio/gmsh python dependency is needed to consume the meshes.
"""

from __future__ import annotations

import struct

import numpy as np

from .core import Mesh

# gmsh element type -> (topological dim, nodes per element)
_ELEM = {1: (1, 2), 2: (2, 3), 4: (3, 4), 15: (0, 1)}


def _read_sections(path: str):
    sections = {}
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("$") and not line.startswith("$End"):
            name = line[1:]
            j = i + 1
            while j < len(lines) and not lines[j].startswith("$End"):
                j += 1
            sections[name] = lines[i + 1:j]
            i = j + 1
        else:
            i += 1
    return sections


class _BinCursor:
    """Sequential reader over one binary section's payload bytes."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def ints(self, n):
        out = np.frombuffer(self.buf, np.int32, n, self.off)
        self.off += 4 * n
        return out

    def sizes(self, n):
        out = np.frombuffer(self.buf, np.uint64, n, self.off)
        self.off += 8 * n
        return out.astype(np.int64)

    def doubles(self, n):
        out = np.frombuffer(self.buf, np.float64, n, self.off)
        self.off += 8 * n
        return out


def _binary_section(raw: bytes, name: str) -> bytes:
    start = raw.index(b"$" + name.encode())
    start = raw.index(b"\n", start) + 1
    end = raw.index(b"$End" + name.encode(), start)
    return raw[start:end]


def _parse_binary(path: str):
    """Binary 4.1: sections delimited by ASCII $Name/$EndName lines, block
    headers as int32, node/element tags as size_t (8 bytes per the header),
    coordinates as doubles."""
    with open(path, "rb") as f:
        raw = f.read()

    # $Entities: physical tags per (dim, entity tag)
    phys = {}
    c = _BinCursor(_binary_section(raw, "Entities"))
    counts = c.sizes(4)
    for d, cnt in enumerate(counts):
        for _ in range(int(cnt)):
            tag = int(c.ints(1)[0])
            c.doubles(3 if d == 0 else 6)
            nphys = int(c.sizes(1)[0])
            ptags = c.ints(nphys)
            if d > 0:
                nb = int(c.sizes(1)[0])
                c.ints(nb)
            phys[(d, tag)] = int(ptags[0]) if nphys else -1

    c = _BinCursor(_binary_section(raw, "Nodes"))
    nblocks, nnodes, _min_tag, max_tag = (int(v) for v in c.sizes(4))
    coords = np.zeros((max_tag + 1, 3))
    for _ in range(nblocks):
        _edim, _etag, parametric = (int(v) for v in c.ints(3))
        num = int(c.sizes(1)[0])
        tags = c.sizes(num)
        xyz = c.doubles(3 * num).reshape(num, 3)
        if parametric:
            raise NotImplementedError("parametric nodes")
        coords[tags] = xyz

    c = _BinCursor(_binary_section(raw, "Elements"))
    nblocks = int(c.sizes(4)[0])
    cells_by_dim = {0: [], 1: [], 2: [], 3: []}
    tags_by_dim = {0: [], 1: [], 2: [], 3: []}
    for _ in range(nblocks):
        edim, etag, etype = (int(v) for v in c.ints(3))
        num = int(c.sizes(1)[0])
        if etype not in _ELEM:
            # skip unknown element payload: gmsh reference table needed for
            # node counts; only the P1 simplex types appear in our meshes
            raise NotImplementedError(f"element type {etype}")
        d, nn = _ELEM[etype]
        data = c.sizes(num * (1 + nn)).reshape(num, 1 + nn)
        ptag = phys.get((edim, etag), -1)
        cells_by_dim[d].extend(data[:, 1:].tolist())
        tags_by_dim[d].extend([ptag] * num)
    return phys, coords, max_tag, cells_by_dim, tags_by_dim


def read_msh(path: str, dim: int | None = None) -> Mesh:
    with open(path, "rb") as f:
        head = f.read(128).decode("latin1").splitlines()
    fmt = head[1].split() if len(head) > 1 else []
    if not fmt or not fmt[0].startswith("4"):
        raise NotImplementedError(
            f"msh format {' '.join(fmt[:2])} (4.x only; convert offline: "
            "gmsh <in> -save -format msh41 -o <out>)")
    if fmt[1] == "1":  # binary file-type
        if int(fmt[2]) != 8:
            raise NotImplementedError("binary .msh with size_t != 8 bytes")
        one = struct.unpack("<i", open(path, "rb").read().split(
            b"\n", 2)[2][:4])[0]
        if one != 1:
            raise NotImplementedError("big-endian binary .msh")
        parsed = _parse_binary(path)
        return _build_mesh(*parsed, dim=dim)

    sec = _read_sections(path)

    # $Entities: physical tags per (dim, entity tag)
    phys = {}
    ent = sec["Entities"]
    counts = list(map(int, ent[0].split()))
    idx = 1
    for d, cnt in enumerate(counts):
        for _ in range(cnt):
            parts = ent[idx].split()
            idx += 1
            tag = int(parts[0])
            if d == 0:
                nphys = int(parts[4])
                ptags = list(map(int, parts[5:5 + nphys]))
            else:
                nphys = int(parts[7])
                ptags = list(map(int, parts[8:8 + nphys]))
            phys[(d, tag)] = ptags[0] if ptags else -1

    # $Nodes: numEntityBlocks numNodes minTag maxTag
    nd = sec["Nodes"]
    hdr = list(map(int, nd[0].split()))
    nblocks, nnodes = hdr[0], hdr[1]
    max_tag = hdr[3]
    coords = np.zeros((max_tag + 1, 3))
    seen = np.zeros(max_tag + 1, dtype=bool)
    i = 1
    for _ in range(nblocks):
        _, _, _, num = map(int, nd[i].split())
        i += 1
        tags = [int(nd[i + k]) for k in range(num)]
        i += num
        for k in range(num):
            xyz = list(map(float, nd[i + k].split()))
            coords[tags[k]] = xyz[:3]
            seen[tags[k]] = True
        i += num

    # $Elements
    el = sec["Elements"]
    hdr = list(map(int, el[0].split()))
    nblocks = hdr[0]
    cells_by_dim = {0: [], 1: [], 2: [], 3: []}
    tags_by_dim = {0: [], 1: [], 2: [], 3: []}
    i = 1
    for _ in range(nblocks):
        edim, etag, etype, num = map(int, el[i].split())
        i += 1
        if etype not in _ELEM:
            i += num
            continue
        d, nn = _ELEM[etype]
        ptag = phys.get((edim, etag), -1)
        for k in range(num):
            parts = list(map(int, el[i + k].split()))
            cells_by_dim[d].append(parts[1:1 + nn])
            tags_by_dim[d].append(ptag)
        i += num

    return _build_mesh(phys, coords, max_tag, cells_by_dim, tags_by_dim,
                       dim=dim)


def _build_mesh(phys, coords, max_tag, cells_by_dim, tags_by_dim,
                dim: int | None = None) -> Mesh:
    if dim is None:
        dim = max(d for d in (3, 2, 1) if cells_by_dim[d])
    cells_raw = np.asarray(cells_by_dim[dim], dtype=np.int64)
    facets_raw = np.asarray(cells_by_dim[dim - 1], dtype=np.int64) \
        if cells_by_dim[dim - 1] else np.zeros((0, dim), np.int64)

    # compact node numbering over used nodes
    used = np.unique(np.concatenate([cells_raw.ravel(), facets_raw.ravel()]))
    remap = -np.ones(max_tag + 1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    if dim == 2:
        pts = coords[used][:, :2]
    elif dim == 1:
        pts = coords[used][:, :1]
    else:
        pts = coords[used]

    mesh = Mesh(points=pts, cells=remap[cells_raw].astype(np.int32), dim=dim)
    mesh.cell_tag_indices = np.arange(mesh.num_cells, dtype=np.int32)
    mesh.cell_tag_values = np.asarray(tags_by_dim[dim], dtype=np.int32)
    mesh.facets = remap[facets_raw].astype(np.int32)
    mesh.facet_tag_values = np.asarray(tags_by_dim[dim - 1], dtype=np.int32) \
        if len(facets_raw) else np.zeros(0, np.int32)
    return mesh
