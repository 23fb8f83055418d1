"""Offline mesh generation: parametric tet meshes for the case geometries.

The reference generates every case mesh with gmsh's OCC kernel
(e.g. Longitudinal/NetworkCode/RijkeTube3D/generateMesh.py: a cylinder of
diameter ``d_tube`` and length 1 with per-surface physical groups).  gmsh is
deliberately NOT a dependency of this framework, so this module provides the
missing Lm-layer tool: structured tetrahedral generators for the geometries
the cases use (cylinder tube, box duct), with the same physical-tag
conventions, plus a gmsh `.msh` 4.1 ASCII writer so generated meshes
round-trip through :mod:`helmholtz_x_tpu.mesh.msh` and external gmsh/meshio
tooling.

The cylinder mesher builds a classic polar disk triangulation (center point
+ concentric rings with ``6 i`` nodes on ring i) and extrudes it along z,
splitting each prism into 3 tets by the lowest-global-index diagonal rule —
which guarantees face conformity between neighbouring prisms without any
Delaunay machinery.
"""

from __future__ import annotations

import numpy as np

from .core import Mesh


# ---------------------------------------------------------------------------
# disk triangulation


def _disk_points(r: float, nr: int):
    """Polar disk point set: center + rings i=1..nr of radius r*i/nr with
    6*i equally spaced nodes.  Returns (points (n,2), ring index list)."""
    pts = [(0.0, 0.0)]
    ring_start = [0, 1]
    for i in range(1, nr + 1):
        rad = r * i / nr
        cnt = 6 * i
        ang = np.arange(cnt) * (2 * np.pi / cnt)
        for a in ang:
            pts.append((rad * np.cos(a), rad * np.sin(a)))
        ring_start.append(ring_start[-1] + cnt)
    return np.asarray(pts), ring_start


def _disk_triangles(nr: int, ring_start):
    """Conforming triangulation between consecutive rings (fan at the
    center, 2i+1 triangles per sector in annulus i -> i+1)."""
    tris = []
    # center fan: ring 1 has 6 nodes
    for j in range(6):
        tris.append((0, 1 + j, 1 + (j + 1) % 6))
    for i in range(1, nr):
        ni, no = 6 * i, 6 * (i + 1)
        si, so = ring_start[i], ring_start[i + 1]
        # walk both rings sector by sector: sector s spans i inner nodes and
        # i+1 outer nodes (plus the wrap nodes)
        for s in range(6):
            inner = [si + (s * i + t) % ni for t in range(i + 1)]
            outer = [so + (s * (i + 1) + t) % no for t in range(i + 2)]
            # alternate: outer-outer-inner then inner-inner-outer
            a = b = 0  # indices into outer/inner
            # 2i+1 triangles: advance along both chains
            for t in range(2 * i + 1):
                if t % 2 == 0:  # triangle with outer edge
                    tris.append((outer[a], outer[a + 1], inner[b]))
                    a += 1
                else:  # triangle with inner edge
                    tris.append((inner[b], outer[a], inner[b + 1]))
                    b += 1
    return np.asarray(tris, dtype=np.int64)


def _orient2d(pts, tris):
    """CCW-orient every triangle."""
    p = pts[tris]
    cross = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
             - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0]))
    flip = cross < 0
    tris = tris.copy()
    tris[flip] = tris[flip][:, [0, 2, 1]]
    return tris


# ---------------------------------------------------------------------------
# prism extrusion


def _prisms_to_tets(tri: np.ndarray, bot: np.ndarray, top: np.ndarray):
    """Split one prism layer into 3 tets per prism with the lowest-global-
    index rule (neighbouring prisms pick matching quad-face diagonals, so
    the mesh is conforming).  bot/top: global ids of the triangle's vertices
    on the lower/upper plane."""
    tets = []
    for (b0, b1, b2), (t0, t1, t2) in zip(bot, top):
        verts = [b0, b1, b2]
        # rotate so the smallest global id is first — the standard
        # marching-prism decomposition is then conforming
        s = int(np.argmin(verts))
        b = [b0, b1, b2][s:] + [b0, b1, b2][:s]
        t = [t0, t1, t2][s:] + [t0, t1, t2][:s]
        # quad faces (b1,b2,t2,t1) and (b2,b0,t0,t2): choose diagonals by
        # smaller-id endpoint
        if min(b[1], t[2]) < min(b[2], t[1]):
            tets.append((b[0], b[1], b[2], t[2]))
            tets.append((b[0], b[1], t[2], t[1]))
        else:
            tets.append((b[0], b[1], b[2], t[1]))
            tets.append((b[0], t[1], b[2], t[2]))
        tets.append((b[0], t[1], t[2], t[0]))
    return tets


def _fix_tet_orientation(points: np.ndarray, tets: np.ndarray) -> np.ndarray:
    a = points[tets[:, 1]] - points[tets[:, 0]]
    b = points[tets[:, 2]] - points[tets[:, 0]]
    c = points[tets[:, 3]] - points[tets[:, 0]]
    vol = np.einsum("ij,ij->i", np.cross(a, b), c)
    flip = vol < 0
    tets = tets.copy()
    tets[flip] = tets[flip][:, [0, 1, 3, 2]]
    return tets


def cylinder_tet(radius: float, length: float, nr: int = 2, nz: int = 50,
                 tags: dict | None = None) -> Mesh:
    """Structured tet mesh of a z-aligned cylinder (the RijkeTube3D /
    RijkeFFD geometry; reference generateMesh.py uses gmsh OCC addCylinder).

    Physical facet tags default to the reference convention:
    1 = inlet disk (z=0), 2 = outlet disk (z=length), 3 = lateral wall.
    The cell tag is 1 everywhere (single volume group).
    """
    tags = tags or {"inlet": 1, "outlet": 2, "lateral": 3}
    disk, ring_start = _disk_points(radius, nr)
    tris = _orient2d(disk, _disk_triangles(nr, ring_start))
    np_disk = len(disk)
    zs = np.linspace(0.0, length, nz + 1)
    points = np.concatenate([
        np.column_stack([np.tile(disk[:, 0], nz + 1),
                         np.tile(disk[:, 1], nz + 1),
                         np.repeat(zs, np_disk)])], axis=0)

    tets = []
    for layer in range(nz):
        off_b = layer * np_disk
        off_t = (layer + 1) * np_disk
        tets.extend(_prisms_to_tets(tris, tris + off_b, tris + off_t))
    cells = _fix_tet_orientation(points, np.asarray(tets, dtype=np.int64))

    # boundary facets
    facets = []
    fvals = []
    # inlet (z=0): the disk triangles of layer 0; outlet: top layer
    for t in tris:
        facets.append(tuple(t))
        fvals.append(tags["inlet"])
    off = nz * np_disk
    for t in tris:
        facets.append(tuple(t + off))
        fvals.append(tags["outlet"])
    # lateral: outer ring edges extruded to quads -> 2 triangles each;
    # REUSE the tet faces so the facet diagonals match the volume mesh:
    # collect boundary faces whose 3 vertices all sit on the outer ring
    outer0 = ring_start[nr]
    on_wall = np.zeros(len(points), dtype=bool)
    for layer in range(nz + 1):
        on_wall[layer * np_disk + outer0: layer * np_disk + np_disk] = True
    faces = {}
    for tet in cells:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            tri_f = tuple(sorted((tet[f[0]], tet[f[1]], tet[f[2]])))
            faces[tri_f] = faces.get(tri_f, 0) + 1
    for tri_f, cnt in faces.items():
        if cnt == 1 and all(on_wall[v] for v in tri_f):
            facets.append(tri_f)
            fvals.append(tags["lateral"])

    mesh = Mesh(points=points, cells=cells.astype(np.int32), dim=3)
    mesh.cell_tag_indices = np.arange(len(cells), dtype=np.int32)
    mesh.cell_tag_values = np.ones(len(cells), dtype=np.int32)
    mesh.facets = np.asarray(facets, dtype=np.int32)
    mesh.facet_tag_values = np.asarray(fvals, dtype=np.int32)
    return mesh


def box_tet(lx: float, ly: float, lz: float, nx: int, ny: int, nz: int,
            tags: dict | None = None) -> Mesh:
    """Structured tet mesh of a box duct (each hex cube -> 6 tets, Kuhn
    decomposition: conforming by construction).  Facet tags:
    1 = z=0 inlet, 2 = z=lz outlet, 3 = all lateral walls."""
    tags = tags or {"inlet": 1, "outlet": 2, "lateral": 3}
    xs = np.linspace(0, lx, nx + 1)
    ys = np.linspace(0, ly, ny + 1)
    zs = np.linspace(0, lz, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    points = np.column_stack([X.ravel(), Y.ravel(), Z.ravel()])

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    kuhn = [(0, 1, 3, 7), (0, 1, 7, 5), (0, 5, 7, 4),
            (0, 3, 2, 7), (0, 2, 6, 7), (0, 6, 4, 7)]
    tets = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                corner = [vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k),
                          vid(i + 1, j + 1, k), vid(i, j, k + 1),
                          vid(i + 1, j, k + 1), vid(i, j + 1, k + 1),
                          vid(i + 1, j + 1, k + 1)]
                for t in kuhn:
                    tets.append([corner[v] for v in t])
    cells = _fix_tet_orientation(points, np.asarray(tets, dtype=np.int64))

    faces = {}
    for tet in cells:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            tri_f = tuple(sorted((tet[f[0]], tet[f[1]], tet[f[2]])))
            faces[tri_f] = faces.get(tri_f, 0) + 1
    facets, fvals = [], []
    for tri_f, cnt in faces.items():
        if cnt != 1:
            continue
        p = points[list(tri_f)]
        if np.all(np.abs(p[:, 2]) < 1e-14):
            tag = tags["inlet"]
        elif np.all(np.abs(p[:, 2] - lz) < 1e-14):
            tag = tags["outlet"]
        else:
            tag = tags["lateral"]
        facets.append(tri_f)
        fvals.append(tag)

    mesh = Mesh(points=points, cells=cells.astype(np.int32), dim=3)
    mesh.cell_tag_indices = np.arange(len(cells), dtype=np.int32)
    mesh.cell_tag_values = np.ones(len(cells), dtype=np.int32)
    mesh.facets = np.asarray(facets, dtype=np.int32)
    mesh.facet_tag_values = np.asarray(fvals, dtype=np.int32)
    return mesh


def _disk_points_radii(radii):
    """Polar disk point set with EXPLICIT ring radii (ring i=1..nr at
    radii[i-1] with 6*i equally spaced nodes) — the stepped-duct meshes
    need a ring at exactly the narrow radius so wide and narrow sections
    share conforming nodes.  Returns (points (n,2), ring index list)."""
    pts = [(0.0, 0.0)]
    ring_start = [0, 1]
    for i, rad in enumerate(radii, start=1):
        cnt = 6 * i
        ang = np.arange(cnt) * (2 * np.pi / cnt)
        for a in ang:
            pts.append((rad * np.cos(a), rad * np.sin(a)))
        ring_start.append(ring_start[-1] + cnt)
    return np.asarray(pts), ring_start


def stepped_duct_tet(spans, r_wide: float, r_narrow: float, h: float,
                     plane_tags: dict, lateral_tags, volume_tag: int = 1) -> Mesh:
    """Structured tet mesh of a z-aligned duct whose radius steps between
    ``r_wide`` and ``r_narrow`` (the FlamedDuct .step geometry class,
    reference: Longitudinal/NetworkCode/FlamedDuct/generateMesh.py imports
    geomDir/tube.step; see flamed_duct_tet for the exact case parameters).

    ``spans``: ordered (z0, z1, radius) segments (radius in {r_wide,
    r_narrow}); ``plane_tags``: {z: tag} for horizontal boundary faces
    (inlet/outlet disks and the step annuli); ``lateral_tags``: list of
    (z0, z1, tag) intervals for the cylindrical walls; ``h``: target edge
    length.

    Conformity: the disk triangulation places a ring at EXACTLY r_narrow,
    so narrow sections mesh the sub-disk PREFIX of the wide disk's point
    set — shared planes need no node matching, and the step annulus faces
    are the wide-disk triangles beyond the sub-disk (count 6*(nr^2-n2^2)).
    """
    n2 = max(2, int(round(r_narrow / h)))
    n1 = max(1, int(round((r_wide - r_narrow) / h)))
    radii = np.concatenate([
        r_narrow * np.arange(1, n2 + 1) / n2,
        r_narrow + (r_wide - r_narrow) * np.arange(1, n1 + 1) / n1])
    nr = n2 + n1
    disk, ring_start = _disk_points_radii(radii)
    tris_full = _orient2d(disk, _disk_triangles(nr, ring_start))
    np_full = len(disk)
    np_sub = ring_start[n2 + 1]
    tris_sub = tris_full[: 6 * n2 * n2]  # annuli are appended ring by ring

    # global plane list: z + wideness (a plane shared by a wide and a
    # narrow segment carries the full disk)
    zlist, wides, seg_of_layer = [], [], []
    for si, (z0, z1, r) in enumerate(spans):
        seg_wide = abs(r - r_wide) < 1e-12
        nzseg = max(1, int(round((z1 - z0) / h)))
        zs = np.linspace(z0, z1, nzseg + 1)
        if si == 0:
            zlist.append(zs[0])
            wides.append(seg_wide)
        else:
            wides[-1] = wides[-1] or seg_wide
        for z in zs[1:]:
            zlist.append(float(z))
            wides.append(seg_wide)
            seg_of_layer.append(si)

    offs = []
    pts = []
    for z, wide in zip(zlist, wides):
        offs.append(sum(len(p) for p in pts))
        d = disk if wide else disk[:np_sub]
        pts.append(np.column_stack([d[:, 0], d[:, 1], np.full(len(d), z)]))
    points = np.concatenate(pts, axis=0)

    tets = []
    for layer, si in enumerate(seg_of_layer):
        tri = tris_full if abs(spans[si][2] - r_wide) < 1e-12 else tris_sub
        tets.extend(_prisms_to_tets(tri, tri + offs[layer],
                                    tri + offs[layer + 1]))
    cells = _fix_tet_orientation(points, np.asarray(tets, dtype=np.int64))

    # boundary faces -> tags: horizontal faces by their plane's tag,
    # lateral faces by centroid-z interval
    faces = {}
    for tet in cells:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            tri_f = tuple(sorted((tet[f[0]], tet[f[1]], tet[f[2]])))
            faces[tri_f] = faces.get(tri_f, 0) + 1
    facets, fvals = [], []
    for tri_f, cnt in faces.items():
        if cnt != 1:
            continue
        zz = points[list(tri_f), 2]
        if zz.max() - zz.min() < 1e-12:
            z = float(zz[0])
            tag = None
            for zp, tp in plane_tags.items():
                if abs(z - zp) < 1e-9:
                    tag = tp
                    break
            if tag is None:
                raise ValueError(f"untagged horizontal boundary face at z={z}")
        else:
            zc = float(zz.mean())
            tag = None
            for z0, z1, tp in lateral_tags:
                if z0 - 1e-9 <= zc <= z1 + 1e-9:
                    tag = tp
                    break
            if tag is None:
                raise ValueError(f"untagged lateral boundary face at z={zc}")
        facets.append(tri_f)
        fvals.append(tag)

    mesh = Mesh(points=points, cells=cells.astype(np.int32), dim=3)
    mesh.cell_tag_indices = np.arange(len(cells), dtype=np.int32)
    mesh.cell_tag_values = np.full(len(cells), volume_tag, dtype=np.int32)
    mesh.facets = np.asarray(facets, dtype=np.int32)
    mesh.facet_tag_values = np.asarray(fvals, dtype=np.int32)
    return mesh


def annular_sector_tet(r_in: float, r_out: float, length: float,
                       n_sectors: int = 16, nr: int = 3, nphi: int = 4,
                       nz: int = 16, z0: float = 0.0,
                       tags: dict | None = None) -> Mesh:
    """Structured tet mesh of a 1/n annular sector with Master/Slave
    boundary tags for the Bloch reduction.

    Reproduces the reference's annular-sector tag convention
    (AnnularCombustor/Micca/bloch/generateMesh.py:374-392: the
    phi=0 azimuthal cut is the Master surface, tag 12; the phi=2 pi/n cut
    is the Slave, tag 13), so ``Blochifier(geometry, {..., 12: "Master",
    13: "Slave"}, N)`` consumes the result directly.  Slave nodes are the
    EXACT z-rotation images of master nodes by construction (structured
    polar grid), which is the property the geometric Bloch pairing needs;
    ``mesh.stitch.rotational_stitch(mesh, n_sectors)`` revolves it into
    the conforming full annulus.

    Default facet tags: 1 = inlet (z=z0), 2 = outlet (z=z0+length),
    3 = outer wall, 4 = inner wall, 12 = master, 13 = slave; single cell
    group 1.
    """
    tags = tags or {"inlet": 1, "outlet": 2, "outer": 3, "inner": 4,
                    "master": 12, "slave": 13}
    theta = 2 * np.pi / n_sectors
    rs = np.linspace(r_in, r_out, nr + 1)
    phis = np.linspace(0.0, theta, nphi + 1)
    zs = np.linspace(z0, z0 + length, nz + 1)
    R, PHI, Zc = np.meshgrid(rs, phis, zs, indexing="ij")
    points = np.column_stack([(R * np.cos(PHI)).ravel(),
                              (R * np.sin(PHI)).ravel(), Zc.ravel()])

    def vid(i, j, k):
        return (i * (nphi + 1) + j) * (nz + 1) + k

    kuhn = [(0, 1, 3, 7), (0, 1, 7, 5), (0, 5, 7, 4),
            (0, 3, 2, 7), (0, 2, 6, 7), (0, 6, 4, 7)]
    tets = []
    for i in range(nr):
        for j in range(nphi):
            for k in range(nz):
                corner = [vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k),
                          vid(i + 1, j + 1, k), vid(i, j, k + 1),
                          vid(i + 1, j, k + 1), vid(i, j + 1, k + 1),
                          vid(i + 1, j + 1, k + 1)]
                for t in kuhn:
                    tets.append([corner[v] for v in t])
    cells = _fix_tet_orientation(points, np.asarray(tets, dtype=np.int64))

    rr = np.hypot(points[:, 0], points[:, 1])
    ph = np.arctan2(points[:, 1], points[:, 0])
    zz = points[:, 2]
    eps = 1e-12 * max(r_out, abs(z0) + length)
    faces = {}
    for tet in cells:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            tri_f = tuple(sorted((tet[f[0]], tet[f[1]], tet[f[2]])))
            faces[tri_f] = faces.get(tri_f, 0) + 1
    facets, fvals = [], []
    for tri_f, cnt in faces.items():
        if cnt != 1:
            continue
        v = list(tri_f)
        if np.all(np.abs(zz[v] - z0) < eps):
            tag = tags["inlet"]
        elif np.all(np.abs(zz[v] - (z0 + length)) < eps):
            tag = tags["outlet"]
        elif np.all(np.abs(rr[v] - r_out) < eps):
            tag = tags["outer"]
        elif np.all(np.abs(rr[v] - r_in) < eps):
            tag = tags["inner"]
        elif np.all(np.abs(ph[v]) < 1e-12):
            tag = tags["master"]
        elif np.all(np.abs(ph[v] - theta) < 1e-12):
            tag = tags["slave"]
        else:  # pragma: no cover
            raise ValueError("unclassified boundary face")
        facets.append(tri_f)
        fvals.append(tag)

    mesh = Mesh(points=points, cells=cells.astype(np.int32), dim=3)
    mesh.cell_tag_indices = np.arange(len(cells), dtype=np.int32)
    mesh.cell_tag_values = np.ones(len(cells), dtype=np.int32)
    mesh.facets = np.asarray(facets, dtype=np.int32)
    mesh.facet_tag_values = np.asarray(fvals, dtype=np.int32)
    return mesh


def flamed_duct_tet(h: float = 0.010) -> Mesh:
    """The FlamedDuct case geometry with the reference's facet-tag
    conventions (decoded from the committed MeshDir/mesh XDMF: 1 m duct,
    wide radius 0.12615 m for z in [0, 0.2] and [0.5, 1.0], narrow radius
    0.0892 m between; tags 3/8 = choked inlet/outlet disks, 2/6 = step
    annuli, 1/4/5/7 = lateral walls split at the reference plane z=0.35;
    volume physical group 99, reference generateMesh.py:41)."""
    R1, R2 = 0.12615, 0.0892
    spans = [(0.0, 0.2, R1), (0.2, 0.35, R2), (0.35, 0.5, R2),
             (0.5, 1.0, R1)]
    plane_tags = {0.0: 3, 0.2: 2, 0.5: 6, 1.0: 8}
    lateral = [(0.0, 0.2, 1), (0.2, 0.35, 4), (0.35, 0.5, 5), (0.5, 1.0, 7)]
    return stepped_duct_tet(spans, R1, R2, h, plane_tags, lateral,
                            volume_tag=99)


# ---------------------------------------------------------------------------
# gmsh .msh 4.1 ASCII writer


def write_msh41(path: str, mesh: Mesh, binary: bool = False) -> None:
    """Write a 3D tet Mesh as gmsh `.msh` format 4.1 (ASCII, or binary with
    ``binary=True``) with one discrete surface entity per facet tag and one
    volume entity (round-trips through mesh.msh.read_msh and external
    gmsh/meshio)."""
    assert mesh.dim == 3, "writer covers the 3D tet meshes"
    pts = mesh.points
    n = len(pts)
    ftags = np.unique(mesh.facet_tag_values) if len(mesh.facets) else []
    if binary:
        _write_msh41_binary(path, mesh, ftags)
        return
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")
        # entities: one surface per facet tag, one volume
        f.write("$Entities\n")
        f.write(f"0 0 {len(ftags)} 1\n")
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        box = f"{lo[0]} {lo[1]} {lo[2]} {hi[0]} {hi[1]} {hi[2]}"
        for t in ftags:
            f.write(f"{t} {box} 1 {t} 0\n")
        f.write(f"1 {box} 1 1 0\n")
        f.write("$EndEntities\n")
        # nodes: a single volume-entity block with every node
        f.write("$Nodes\n")
        f.write(f"1 {n} 1 {n}\n")
        f.write(f"3 1 0 {n}\n")
        for i in range(1, n + 1):
            f.write(f"{i}\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        f.write("$EndNodes\n")
        # elements: one block per facet tag (type 2 = tri) + tets (type 4)
        nblocks = len(ftags) + 1
        nelem = len(mesh.facets) + len(mesh.cells)
        f.write("$Elements\n")
        f.write(f"{nblocks} {nelem} 1 {nelem}\n")
        eid = 1
        for t in ftags:
            sel = np.nonzero(mesh.facet_tag_values == t)[0]
            f.write(f"2 {t} 2 {len(sel)}\n")
            for i in sel:
                a, b, c = (mesh.facets[i] + 1)
                f.write(f"{eid} {a} {b} {c}\n")
                eid += 1
        f.write(f"3 1 4 {len(mesh.cells)}\n")
        for cell in mesh.cells + 1:
            f.write(f"{eid} {cell[0]} {cell[1]} {cell[2]} {cell[3]}\n")
            eid += 1
        f.write("$EndElements\n")


def _write_msh41_binary(path: str, mesh: Mesh, ftags) -> None:
    import struct

    pts = mesh.points
    n = len(pts)

    def i32(*vals):
        return struct.pack(f"<{len(vals)}i", *vals)

    def sz(*vals):
        return struct.pack(f"<{len(vals)}Q", *[int(v) for v in vals])

    def dbl(arr):
        return np.ascontiguousarray(arr, dtype="<f8").tobytes()

    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n4.1 1 8\n")
        f.write(struct.pack("<i", 1))
        f.write(b"\n$EndMeshFormat\n")
        f.write(b"$Entities\n")
        f.write(sz(0, 0, len(ftags), 1))
        for t in ftags:
            f.write(i32(int(t)) + dbl(np.concatenate([lo, hi]))
                    + sz(1) + i32(int(t)) + sz(0))
        f.write(i32(1) + dbl(np.concatenate([lo, hi])) + sz(1) + i32(1)
                + sz(0))
        f.write(b"\n$EndEntities\n")
        f.write(b"$Nodes\n")
        f.write(sz(1, n, 1, n))
        f.write(i32(3, 1, 0) + sz(n))
        f.write(sz(*range(1, n + 1)))
        f.write(dbl(pts))
        f.write(b"\n$EndNodes\n")
        nelem = len(mesh.facets) + len(mesh.cells)
        f.write(b"$Elements\n")
        f.write(sz(len(ftags) + 1, nelem, 1, nelem))
        eid = 1
        for t in ftags:
            sel = np.nonzero(mesh.facet_tag_values == t)[0]
            f.write(i32(2, int(t), 2) + sz(len(sel)))
            block = np.column_stack([
                np.arange(eid, eid + len(sel)),
                np.asarray(mesh.facets)[sel] + 1]).astype(np.uint64)
            f.write(np.ascontiguousarray(block, dtype="<u8").tobytes())
            eid += len(sel)
        f.write(i32(3, 1, 4) + sz(len(mesh.cells)))
        block = np.column_stack([
            np.arange(eid, eid + len(mesh.cells)),
            np.asarray(mesh.cells) + 1]).astype(np.uint64)
        f.write(np.ascontiguousarray(block, dtype="<u8").tobytes())
        f.write(b"\n$EndElements\n")
