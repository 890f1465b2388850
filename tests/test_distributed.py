"""Distributed pose graph on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lego_loam_tpu.parallel import graph as pgd
from tests.test_posegraph import CFG, _chain_state

import lego_loam_tpu.models.posegraph as pg
from lego_loam_tpu.utils.math3d import Pose


def _loop_state():
    n = 32
    yaw_step = 2 * np.pi / (n - 1)
    state, trues = _chain_state(
        n, drift_per_step=np.array([0.03, 0.02, 0.0]), yaw_step=yaw_step)
    Ti = Pose(jnp.asarray(trues[n - 1][0], jnp.float32),
              jnp.asarray(trues[n - 1][1], jnp.float32))
    Tj = Pose(jnp.asarray(trues[0][0], jnp.float32),
              jnp.asarray(trues[0][1], jnp.float32))
    Z = Ti.inverse().compose(Tj)
    state = state._replace(
        loop_i=state.loop_i.at[0].set(n - 1),
        loop_j=state.loop_j.at[0].set(0),
        loop_R=state.loop_R.at[0].set(Z.R),
        loop_t=state.loop_t.at[0].set(Z.t),
        loop_w=state.loop_w.at[0].set(100.0),
        n_loops=jnp.int32(1),
    )
    return pg.distribute_loop_error(
        state, jnp.int32(n - 1), jnp.int32(0), Z, CFG), trues, n


def test_edge_list_matches_posegraph_residuals():
    state, trues, n = _loop_state()
    edges = pgd.build_edge_list(state, CFG)
    r_edges = pgd.edge_residuals(edges, state.kf_R, state.kf_t)
    r_ref = pg.graph_residuals(state.kf_R, state.kf_t, state, CFG)
    # same residual rows (order: chain, loops, prior)
    K, L = CFG.max_keyframes, CFG.max_loop_edges
    np.testing.assert_allclose(np.asarray(r_edges[:K]), np.asarray(r_ref[:K]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_edges[K:K + L]),
                               np.asarray(r_ref[K:K + L]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_edges[K + L]),
                               np.asarray(r_ref[K + L]), atol=1e-4)


def test_sharded_solve_matches_single():
    state, trues, n = _loop_state()
    R1, t1 = pgd.solve_pose_graph_single(state, CFG)

    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))
    R8, t8 = pgd.solve_pose_graph_sharded(state, CFG, mesh)

    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=1e-3)

    # and the solve actually fixed the loop
    end_err = np.linalg.norm(np.asarray(t8[n - 1]) - trues[n - 1][1])
    assert end_err < 0.3, f"end error {end_err:.3f}"


def test_sharded_solve_matches_models_posegraph():
    state, trues, n = _loop_state()
    solved = pg.solve_pose_graph(state, CFG)
    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))
    R8, t8 = pgd.solve_pose_graph_sharded(state, CFG, mesh)
    np.testing.assert_allclose(np.asarray(t8[:n]),
                               np.asarray(solved.kf_t[:n]), atol=5e-3)
