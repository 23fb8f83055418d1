"""Gmsh `.msh` (format 4.1 ASCII) reader.

The reference converts .msh to XDMF via meshio before loading
(reference: helmholtz_x/io_utils.py:98-136); this framework reads the
committed .msh files directly — geometry stays an offline gmsh step, but no
meshio/gmsh python dependency is needed to consume the meshes.
"""

from __future__ import annotations

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


def read_msh(path: str, dim: int | None = None) -> Mesh:
    sec = _read_sections(path)
    fmt = sec["MeshFormat"][0].split()
    if not fmt[0].startswith("4") or (len(fmt) > 1 and fmt[1] != "0"):
        # Every committed reference mesh is 4.1 ASCII (file-type 0); binary
        # .msh is out of scope — convert offline with
        #   gmsh in.msh -save -format msh41 -o out.msh      (ASCII default)
        # or meshio: `meshio convert in.msh out.msh --ascii`.
        raise NotImplementedError(
            f"msh format {' '.join(fmt[:2])} (only 4.x ASCII; convert binary "
            "files offline: gmsh <in> -save -format msh41 -o <out>)")

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

    if dim is None:
        dim = max(d for d in (3, 2, 1) if cells_by_dim[d])
    cells_raw = np.asarray(cells_by_dim[dim], dtype=np.int64)
    facets_raw = np.asarray(cells_by_dim[dim - 1], dtype=np.int64) \
        if cells_by_dim[dim - 1] else np.zeros((0, dim), np.int64)

    # compact node numbering over used nodes
    used = np.unique(np.concatenate([cells_raw.ravel(), facets_raw.ravel()]))
    remap = -np.ones(max_tag + 1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    gdim = dim if dim >= 2 else 1
    pts = coords[used][:, :max(gdim, 2) if dim == 2 else (3 if dim == 3 else 1)]
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
