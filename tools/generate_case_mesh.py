"""Offline mesh regeneration CLI (the Lm-layer replacement for the
reference's per-case gmsh `generateMesh.py` scripts).

    python tools/generate_case_mesh.py rijke3d    [out_prefix] [--binary]
    python tools/generate_case_mesh.py duct       [out_prefix] [--binary]
    python tools/generate_case_mesh.py flamedduct [out_prefix] [--binary] [--h=0.010]
    python tools/generate_case_mesh.py sector     [out_prefix] [--binary]
    python tools/generate_case_mesh.py annulus    [out_prefix] [--binary]
    python tools/generate_case_mesh.py rijke2d    [out_prefix]
    python tools/generate_case_mesh.py rijke1d    [out_prefix]

Writes <out_prefix>.msh (gmsh 4.1; --binary for file-type 1) and
<out_prefix>.xdmf/.h5 so either loader path can consume the result.
Geometry parameters follow the reference cases:

    rijke3d:    cylinder d=0.047 m, L=1 m (RijkeTube3D/generateMesh.py)
    duct:       0.25 x 0.25 x 1.0 m box duct (structured Kuhn box)
    flamedduct: the FlamedDuct stepped duct (generateMesh.py .step import;
                radii 0.12615/0.0892 m, reference facet tags 1-8, --h sets
                the target edge length — 0.010 matches the reference lc)
    rijke2d:    1.0 x 0.047 rectangle  (RijkeTube2D)
    rijke1d:    unit interval, 3000 cells (RijkeTube1D)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    binary = "--binary" in sys.argv
    case = args[0] if args else "rijke3d"
    out = args[1] if len(args) > 1 else f"MeshDir/{case}"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    from helmholtz_x_tpu.mesh.xdmf import _write_tagged_grid, write_xdmf_mesh

    if case == "rijke3d":
        from helmholtz_x_tpu.mesh.generate import cylinder_tet, write_msh41

        mesh = cylinder_tet(0.047 / 2, 1.0, nr=2, nz=100)
        write_msh41(out + ".msh", mesh, binary=binary)
        write_xdmf_mesh(out)  # converts the .msh we just wrote
    elif case == "duct":
        from helmholtz_x_tpu.mesh.generate import box_tet, write_msh41

        mesh = box_tet(0.25, 0.25, 1.0, 8, 8, 40)
        write_msh41(out + ".msh", mesh, binary=binary)
        write_xdmf_mesh(out)
    elif case == "flamedduct":
        from helmholtz_x_tpu.mesh.generate import flamed_duct_tet, write_msh41

        h = 0.010
        for a in sys.argv[1:]:
            if a.startswith("--h="):
                h = float(a.split("=", 1)[1])
        mesh = flamed_duct_tet(h=h)
        write_msh41(out + ".msh", mesh, binary=binary)
        write_xdmf_mesh(out)
    elif case in ("sector", "annulus"):
        # MICCA combustion-chamber annular sector (R 0.15-0.20 m, L 0.2 m,
        # 16 sectors) with Master(12)/Slave(13) tags; 'annulus' revolves it
        # into the conforming full annulus (Master/Slave dropped)
        from helmholtz_x_tpu.mesh.generate import (annular_sector_tet,
                                                   write_msh41)

        mesh = annular_sector_tet(0.15, 0.20, 0.20, n_sectors=16,
                                  nr=4, nphi=6, nz=24)
        if case == "annulus":
            from helmholtz_x_tpu.mesh.stitch import rotational_stitch

            mesh = rotational_stitch(mesh, 16, drop_facet_tags=(12, 13))
        write_msh41(out + ".msh", mesh, binary=binary)
        write_xdmf_mesh(out)
    elif case in ("rijke2d", "rijke1d"):
        if case == "rijke2d":
            from helmholtz_x_tpu.mesh.builders import rectangle_setup

            mesh = rectangle_setup(47, 4, 1.0, 0.047)
        else:
            from helmholtz_x_tpu.mesh import one_dimensional_setup

            mesh = one_dimensional_setup(3000)
        pts = mesh.points
        if pts.shape[1] == 1:
            pts = np.concatenate([pts, np.zeros_like(pts)], axis=1)
        _write_tagged_grid(out, pts, mesh.cells, mesh.dim,
                           getattr(mesh, "cell_tag_values", None), "mesh_tags")
        if getattr(mesh, "facets", None) is not None and len(mesh.facets):
            _write_tagged_grid(out + "_tags", pts, mesh.facets, mesh.dim - 1,
                               mesh.facet_tag_values, "mesh_tags")
    else:
        raise SystemExit(f"unknown case {case!r} (rijke1d|rijke2d|rijke3d|duct)")

    print(f"{case}: {mesh.num_cells} cells, {mesh.num_vertices} vertices -> "
          f"{out}.xdmf" + (f" + {out}.msh" if case in ("rijke3d", "duct")
                           else ""))


if __name__ == "__main__":
    main()
