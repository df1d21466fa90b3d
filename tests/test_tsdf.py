"""Metric-semantic TSDF integration + surface extraction + artifacts."""

import os

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.semantics import mesh_io, tsdf


def test_tsdf_reconstructs_plane(tmp_path):
    # scene: ground plane z=0 with label 3, observed from above
    H, W = 48, 64
    fx = fy = 40.0
    cx, cy = W / 2, H / 2
    grid = tsdf.make_grid((32, 32, 16), origin=(-2.0, -2.0, -1.0),
                          voxel_size=0.125, trunc=0.3)

    # camera at (0,0,2) looking down (-z): cam z axis -> world -z
    R_wc = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    poses = [jnp.asarray([x, y, 2.0]) for x in (-0.5, 0.5)
             for y in (-0.5, 0.5)]
    for t_wc in poses:
        # render depth of the plane: ray through pixel hits z=0 at depth
        us = np.arange(W) + 0.5
        vs = np.arange(H) + 0.5
        uu, vv = np.meshgrid(us, vs)
        # cam-frame direction (x, y, 1); world dir z component = -1
        # depth along cam z to reach world z=0 from height 2: z_cam = 2
        depth = np.full((H, W), 2.0, np.float32)
        labels = np.full((H, W), 3, np.int32)
        grid = tsdf.integrate(grid, jnp.asarray(depth), jnp.asarray(labels),
                              R_wc, t_wc, fx, fy, cx, cy)

    verts, normals, labels, valid = tsdf.extract_surface(grid,
                                                         max_vertices=2048)
    v = np.asarray(verts)[np.asarray(valid)]
    nrm = np.asarray(normals)[np.asarray(valid)]
    lab = np.asarray(labels)[np.asarray(valid)]
    assert len(v) > 50
    # surface near z=0
    assert np.abs(v[:, 2]).mean() < 0.1
    # normals roughly +-z
    assert np.abs(nrm[:, 2]).mean() > 0.8
    # semantics preserved
    assert (lab == 3).mean() > 0.9

    # artifacts
    ply = str(tmp_path / "mesh.ply")
    n = mesh_io.write_ply_points(ply, verts, normals, labels, valid)
    assert n == len(v)
    txt = open(ply).read()
    assert txt.startswith("ply") and f"element vertex {n}" in txt
    html = str(tmp_path / "run.html")
    mesh_io.write_html_viewer(html, {0: np.zeros((10, 3))}, points=v)
    assert os.path.getsize(html) > 500


def test_depth_binning():
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.5, 0.0, 4.0]])
    labels = jnp.asarray([1, 2])
    depth, lab = tsdf.depth_image_from_points(
        pts, labels, jnp.ones(2, bool), 32, 32, 20.0, 20.0, 16.0, 16.0)
    d = np.asarray(depth)
    assert abs(d[16, 16] - 2.0) < 1e-5
    assert np.asarray(lab)[16, 16] == 1
    # second point at u = 20*0.125+16 = 18.5 -> 18
    assert abs(d[16, 18] - 4.0) < 1e-5


def test_marching_tetrahedra_plane(tmp_path):
    from kimera_multi_tpu.semantics import marching

    H, W = 48, 64
    fx = fy = 40.0
    cx, cy = W / 2, H / 2
    grid = tsdf.make_grid((32, 32, 16), origin=(-2.0, -2.0, -1.0),
                          voxel_size=0.125, trunc=0.3)
    R_wc = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    for t_wc in [jnp.asarray([x, y, 2.0]) for x in (-0.5, 0.5)
                 for y in (-0.5, 0.5)]:
        depth = np.full((H, W), 2.0, np.float32)
        labels = np.full((H, W), 3, np.int32)
        grid = tsdf.integrate(grid, jnp.asarray(depth), jnp.asarray(labels),
                              R_wc, t_wc, fx, fy, cx, cy)
    tris, valid = marching.marching_tetrahedra(grid)
    v = np.asarray(valid)
    assert v.sum() > 100
    T = np.asarray(tris)[v]
    # all triangle vertices on the z=0 plane (within a voxel)
    assert np.abs(T[..., 2]).max() < 0.13
    # total area covers a decent part of the observed patch
    e1 = T[:, 1] - T[:, 0]
    e2 = T[:, 2] - T[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert area > 1.0
    # PLY triangle output
    p = str(tmp_path / "mesh_tris.ply")
    n = marching.write_ply_triangles(p, tris, valid)
    assert n == v.sum()
    head = open(p).read(200)
    assert f"element face {n}" in head
