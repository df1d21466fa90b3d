"""Deformation-graph mesh correction (kimera_pgmo equivalent)."""

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.solve import deformation as dfm


def _grid_nodes(nx=6, ny=4, spacing=1.0):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos = np.stack([xs.ravel() * spacing, ys.ravel() * spacing,
                    np.zeros(nx * ny)], -1).astype(np.float32)
    return pos


def test_rigid_translation_interpolates():
    """Constraining a few nodes to a rigid translation must drag the whole
    graph along (regularizer propagates the motion)."""
    pos = _grid_nodes()
    G = len(pos)
    graph = dfm.build_graph_knn(jnp.asarray(pos), k=4)
    shift = np.array([0.5, -0.3, 0.8], np.float32)
    con_node = jnp.asarray([0, 5, G - 1, G - 6], jnp.int32)
    con_target = jnp.asarray(pos[np.asarray(con_node)] + shift)
    state = dfm.solve(dfm.identity_state(G), graph, con_node, con_target,
                      jnp.ones(4, bool))
    moved = pos + np.asarray(state.t)
    assert np.allclose(moved, pos + shift, atol=0.05)


def test_bending_deformation_and_skinning():
    """Bend one end of a strip upward; constrained end follows exactly,
    far end stays, vertices interpolate smoothly."""
    pos = _grid_nodes(nx=8, ny=2)
    G = len(pos)
    graph = dfm.build_graph_knn(jnp.asarray(pos), k=3)
    # constrain the x=7 column up by 2, the x=0 column fixed
    idx_far = np.nonzero(pos[:, 0] > 6.5)[0]
    idx_near = np.nonzero(pos[:, 0] < 0.5)[0]
    con_node = jnp.asarray(np.concatenate([idx_far, idx_near]), jnp.int32)
    targets = pos[np.asarray(con_node)].copy()
    targets[: len(idx_far), 2] += 2.0
    state = dfm.solve(dfm.identity_state(G), graph, con_node,
                      jnp.asarray(targets),
                      jnp.ones(len(targets), bool))
    moved = pos + np.asarray(state.t)
    # constraints met
    assert np.allclose(moved[idx_far, 2], 2.0, atol=0.1)
    assert np.allclose(moved[idx_near, 2], 0.0, atol=0.1)
    # middle interpolates monotonically in x
    mid = moved[pos[:, 1] < 0.5]
    order = np.argsort(pos[pos[:, 1] < 0.5, 0])
    z = mid[order, 2]
    assert (np.diff(z) > -0.15).all()

    # vertex skinning: dense strip vertices follow the graph
    npr = np.random.default_rng(0)
    verts = np.stack([
        npr.uniform(0, 7, 200), npr.uniform(0, 1, 200), np.zeros(200)],
        -1).astype(np.float32)
    sidx, sw = dfm.skinning(jnp.asarray(verts), graph.node_pos, k=4)
    deformed = np.asarray(dfm.deform_vertices(
        jnp.asarray(verts), graph, state, sidx, sw))
    # deformed z grows with x, ends near 0 and 2
    lo = deformed[verts[:, 0] < 1.0, 2]
    hi = deformed[verts[:, 0] > 6.0, 2]
    assert np.abs(lo).mean() < 0.3
    assert np.abs(hi - 2.0).mean() < 0.4
