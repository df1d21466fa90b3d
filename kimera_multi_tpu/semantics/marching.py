"""Triangle mesh extraction from TSDF grids: marching tetrahedra.

Completes the voxblox-equivalent surface pipeline (SURVEY.md marks
marching cubes a stretch goal; marching tetrahedra produces equivalent
crack-free triangle meshes from a 16-case table that is small enough to
derive and verify, instead of the 256-case MC tables). Fully vectorized:
every cube splits into 6 tetrahedra sharing the 0-6 diagonal; per-tet
sign configurations index a (16, 2, 3) edge table; triangle vertices are
linear zero-crossing interpolations along tet edges. Fixed-capacity
masked output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tsdf import TsdfGrid

# cube corners: bit 0 -> +x, bit 1 -> +y, bit 2 -> +z
_CORNER_OFFSETS = np.asarray(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.int32)
# corner index = x + 2 y + 4 z; the 6-tet split shares the 0-7 diagonal
# (corners 0 = (0,0,0) and 7 = (1,1,1))
_TETS = np.asarray(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
     [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int32)
# tet edges by local vertex pair
_TET_EDGES = np.asarray(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)
# e01=0 e02=1 e03=2 e12=3 e13=4 e23=5

# (16, 2, 3): for each inside-bitmask, up to two triangles of edge ids
_TRI_TABLE = -np.ones((16, 2, 3), np.int32)
_TRI_TABLE[0b0001, 0] = [0, 1, 2]                       # v0 inside
_TRI_TABLE[0b0010, 0] = [0, 4, 3]                       # v1
_TRI_TABLE[0b0100, 0] = [1, 3, 5]                       # v2
_TRI_TABLE[0b1000, 0] = [2, 5, 4]                       # v3
_TRI_TABLE[0b0011] = [[1, 2, 4], [1, 4, 3]]             # v0, v1
_TRI_TABLE[0b0101] = [[0, 2, 5], [0, 5, 3]]             # v0, v2
_TRI_TABLE[0b1001] = [[0, 1, 5], [0, 5, 4]]             # v0, v3
_TRI_TABLE[0b0110] = [[0, 1, 5], [0, 5, 4]]             # v1, v2
_TRI_TABLE[0b1010] = [[0, 3, 5], [0, 5, 2]]             # v1, v3
_TRI_TABLE[0b1100] = [[1, 2, 4], [1, 4, 3]]             # v2, v3
_TRI_TABLE[0b1110] = _TRI_TABLE[0b0001]                 # complements
_TRI_TABLE[0b1101] = _TRI_TABLE[0b0010]
_TRI_TABLE[0b1011] = _TRI_TABLE[0b0100]
_TRI_TABLE[0b0111] = _TRI_TABLE[0b1000]


def marching_tetrahedra(grid: TsdfGrid, level: float = 0.0,
                        max_triangles: int = 16384):
    """Extract the level-set triangle mesh.

    Returns (tris (T, 3, 3) world-space vertices, valid (T,)). Only
    tetrahedra whose 4 corners are all observed (weight > 0) emit
    geometry.
    """
    t = grid.tsdf
    w = grid.weight
    X, Y, Z = t.shape
    cx, cy, cz = X - 1, Y - 1, Z - 1

    # corner values/positions per cube: (cx, cy, cz, 8)
    def corner(arr, off):
        return arr[off[0]:off[0] + cx, off[1]:off[1] + cy,
                   off[2]:off[2] + cz]

    vals = jnp.stack([corner(t, o) for o in _CORNER_OFFSETS], -1)
    obs = jnp.stack([corner(w, o) > 0 for o in _CORNER_OFFSETS], -1)

    ii = jax.lax.broadcasted_iota(jnp.int32, (cx, cy, cz), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cx, cy, cz), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (cx, cy, cz), 2)
    base = jnp.stack([ii, jj, kk], -1).astype(jnp.float32)
    corners = (base[..., None, :] + _CORNER_OFFSETS.astype(np.float32)
               + 0.5) * grid.voxel_size + grid.origin  # (cx,cy,cz,8,3)

    tri_table = jnp.asarray(_TRI_TABLE)
    tet_edges = jnp.asarray(_TET_EDGES)
    tets = jnp.asarray(_TETS)

    tris_out = []
    valid_out = []
    for ti in range(6):
        tv = tets[ti]  # (4,) cube corner ids
        v4 = vals[..., tv]  # (cx,cy,cz,4)
        p4 = corners[..., tv, :]  # (cx,cy,cz,4,3)
        tet_obs = jnp.all(obs[..., tv], axis=-1)  # all 4 tet corners seen
        inside = (v4 < level).astype(jnp.int32)
        code = (inside[..., 0] + 2 * inside[..., 1] + 4 * inside[..., 2]
                + 8 * inside[..., 3])
        # edge zero crossings: (cx,cy,cz,6,3)
        a = v4[..., tet_edges[:, 0]]
        b = v4[..., tet_edges[:, 1]]
        pa = p4[..., tet_edges[:, 0], :]
        pb = p4[..., tet_edges[:, 1], :]
        alpha = (level - a) / jnp.where(jnp.abs(b - a) < 1e-9, 1e-9, b - a)
        alpha = jnp.clip(alpha, 0.0, 1.0)[..., None]
        epts = pa + alpha * (pb - pa)
        for k in range(2):
            eidx = tri_table[code, k]  # (cx,cy,cz,3)
            tri_ok = (eidx[..., 0] >= 0) & tet_obs
            safe = jnp.clip(eidx, 0, 5)
            verts = jnp.take_along_axis(
                epts, safe[..., :, None].repeat(3, -1), axis=-2)
            tris_out.append(verts.reshape(-1, 3, 3))
            valid_out.append(tri_ok.reshape(-1))
    tris = jnp.concatenate(tris_out)
    valid = jnp.concatenate(valid_out)
    # compact to capacity (valid triangles first, deterministic order)
    score = valid.astype(jnp.float32)
    order = jnp.argsort(-score, stable=True)[:max_triangles]
    return tris[order], valid[order]


def write_ply_triangles(path: str, tris, valid) -> int:
    """Write a triangle mesh PLY. Returns the triangle count."""
    import os

    tris = np.asarray(tris)[np.asarray(valid)]
    n_t = len(tris)
    verts = tris.reshape(-1, 3)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {3 * n_t}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {n_t}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for p in verts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
        for i in range(n_t):
            f.write(f"3 {3*i} {3*i+1} {3*i+2}\n")
    return n_t
