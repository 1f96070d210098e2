"""Structure analysis for a block-tile (BCSR/ELL) form of the FEM pencil: with
RCM-ordered quadratic nodes and TILE-dof dense tiles, how many nonzero tiles does
each tile row touch (= flop/storage waste vs the element form), at bench box and
CDT torus scale? Feeds the fused-apply redesign (VERDICT r4 #1)."""
import sys
import time

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

sys.path.insert(0, ".")

from mesheditor_tpu.fem.assembly import filter_degenerate
from mesheditor_tpu.fem.quad_mesh import build_quad_mesh
from mesheditor_tpu.mesh import box_tets


def analyze(name, points, tets, tile=256):
    kept = filter_degenerate(points, tets)
    quad = build_quad_mesh(kept, points.shape[0])
    en = np.asarray(quad.element_nodes, np.int64)  # (E, 10)
    nn = quad.node_count
    e = en.shape[0]
    # node-node adjacency from element co-occurrence
    rows = np.repeat(en, 10, axis=1).reshape(-1)
    cols = np.tile(en, (1, 10)).reshape(-1)
    g = sp.coo_matrix((np.ones(rows.size, np.int8), (rows, cols)), shape=(nn, nn)).tocsr()
    g.data[:] = 1
    perm = reverse_cuthill_mckee(g, symmetric_mode=True)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(nn)
    gp = g[perm][:, perm].tocoo()
    # node bandwidth
    bw = int(np.abs(gp.row - gp.col).max())
    # dof tiles: node n -> dof rows 3n..3n+2; tile index = 3*node_new // tile
    ndofs = 3 * nn
    tr = (3 * gp.row) // tile
    tc = (3 * gp.col) // tile
    # conservative: a node pair can straddle two tiles; count both corners
    pairs = set()
    for dr in (0, 2):
        for dc in (0, 2):
            a = (3 * gp.row + dr) // tile
            b = (3 * gp.col + dc) // tile
            pairs.update(zip(a.tolist(), b.tolist()))
    ntr = -(-ndofs // tile)
    per_row = np.zeros(ntr, np.int64)
    for a, b in pairs:
        per_row[a] += 1
    nnz_node_pairs = gp.nnz
    ntiles = len(pairs)
    fill = nnz_node_pairs * 9 / (ntiles * tile * tile)
    print(f"{name}: E={e} nodes={nn} dofs={ndofs} bw_nodes={bw} "
          f"tile={tile} tile_rows={ntr} nz_tiles={ntiles} "
          f"tiles/row avg={ntiles/ntr:.1f} max={per_row.max()} fill={fill:.2f}")
    mb = ntiles * tile * tile * 4 / 1e6
    flops_p = 2 * ntiles * tile * tile  # per panel column
    elem_flops_p = 2 * e * 30 * 30
    print(f"  storage {mb:.0f} MB f32 ({mb/2:.0f} bf16); flops/col {flops_p/1e6:.1f}M "
          f"vs element-form {elem_flops_p/1e6:.1f}M (x{flops_p/elem_flops_p:.1f})")
    return ntiles, per_row


def main():
    t0 = time.perf_counter()
    mesh = box_tets((0.3, 0.16, 0.15), (18, 10, 9))
    for tile in (128, 256, 512):
        analyze(f"bench box (tile={tile})", mesh.points, mesh.tets, tile)

    try:
        from mesheditor_tpu.mesh import torus_surface
        from mesheditor_tpu.mesh.cdt import generate_tets_delaunay

        pts, tris = torus_surface(0.06, 0.025)
        h = float(np.max(pts.max(0) - pts.min(0))) / 24
        tm = generate_tets_delaunay(pts, tris, lattice_h=h)
        for tile in (128, 256, 512):
            analyze(f"cdt torus (tile={tile})", tm.points, tm.tets, tile)
    except Exception as ex:
        print("cdt torus skipped:", ex)
    print(f"total {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
