"""Default-capacity exercise (round-4 VERDICT item 4).

Every other test runs the keyframe pool at 64-1024; the shipping default is
max_keyframes=4096 (config.py).  These tests run the pose-graph solve, the
pool compaction, and a post-compaction solve at exactly that scale so the
default configuration's numerics are pinned, not extrapolated.  (The
on-chip latency of the same programs is measured by examples/bench_scale.py
and recorded in SCALING.md.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lego_loam_tpu import config_for
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import posegraph as pg
from lego_loam_tpu.utils.math3d import Pose

from tests.test_posegraph import _chain_state

CFG4K = config_for(
    "vlp16", deskew=False,
    max_keyframes=4096, max_loop_edges=16, pg_gn_iters=10,
    kf_corner_cap=8, kf_surf_cap=8, kf_outlier_cap=8,
    max_map_corner=64, max_map_surf=64,
    max_scan_corner_ds=64, max_scan_surf_ds=64)


def _add_loop(state, i, j, trues, w=100.0, slot=0):
    Ti = Pose(jnp.asarray(trues[i][0], jnp.float32),
              jnp.asarray(trues[i][1], jnp.float32))
    Tj = Pose(jnp.asarray(trues[j][0], jnp.float32),
              jnp.asarray(trues[j][1], jnp.float32))
    Z = Ti.inverse().compose(Tj)
    return state._replace(
        loop_i=state.loop_i.at[slot].set(i),
        loop_j=state.loop_j.at[slot].set(j),
        loop_R=state.loop_R.at[slot].set(Z.R),
        loop_t=state.loop_t.at[slot].set(Z.t),
        loop_w=state.loop_w.at[slot].set(w),
        n_loops=jnp.int32(slot + 1),
    )


def _two_lap_chain(n, cfg):
    """Drifted two-lap circular chain (lap 2 revisits lap 1)."""
    yaw_step = 2 * np.pi / (n // 2)
    return _chain_state(
        n, drift_per_step=np.array([0.002, 0.0015, 0.0005]),
        yaw_step=yaw_step, yaw_drift_per_step=2e-4, step_len=0.15, cfg=cfg)


def test_solve_at_default_capacity():
    """K=4096, n_kf=4000, multiple loop edges, no warm start: >=90% of the
    end-pose drift corrected by the solve alone."""
    n = 4000
    state, trues = _two_lap_chain(n, CFG4K)
    gt = np.asarray([p[1] for p in trues])
    errs_before = np.linalg.norm(np.asarray(state.kf_t)[:n] - gt, axis=1)
    assert errs_before[-1] > 2.0

    # lap-2 keyframes loop against their lap-1 revisits, at the weight the
    # loop detector assigns a good alignment (sigma floor 0.1 -> w = 100)
    half = n // 2
    for s, i in enumerate(range(half, n, 400)):
        state = _add_loop(state, i, i - half, trues, slot=s)

    solved = pg.solve_pose_graph(state, CFG4K)
    errs_after = np.linalg.norm(np.asarray(solved.kf_t)[:n] - gt, axis=1)
    end_corr = 1.0 - errs_after[-1] / errs_before[-1]
    mean_corr = 1.0 - errs_after.mean() / errs_before.mean()
    assert end_corr >= 0.90, f"end corrected {end_corr:.1%}"
    # the mean includes lap-1 poses no loop edge revisits — their drift is
    # unobservable and stays; the revisited lap corrects
    assert mean_corr >= 0.60, f"mean corrected {mean_corr:.1%}"
    # untouched pool slots stay exactly as initialized
    np.testing.assert_array_equal(np.asarray(solved.kf_t[n:]), 0.0)


def test_compaction_at_default_capacity():
    """Fill the pool to K-1, compact, and verify the thinned graph still
    solves: chain self-consistency and loop-edge remapping at scale."""
    K = CFG4K.max_keyframes
    n = K - 1
    state, trues = _two_lap_chain(n, CFG4K)
    half_lap = n // 2
    for s, i in enumerate(range(half_lap, n, 900)):
        state = _add_loop(state, i, i - half_lap, trues, slot=s)
    n_loops_before = int(state.n_loops)
    li_before = np.asarray(state.loop_i)[:n_loops_before]
    lj_before = np.asarray(state.loop_j)[:n_loops_before]
    kf_t_before = np.asarray(state.kf_t).copy()

    out = mp.compact_keyframes(state, CFG4K)

    half = n // 2
    expect_kept = [i for i in range(half) if i % 2 == 0] + list(range(half, n))
    assert int(out.n_kf) == len(expect_kept)
    # spot-check retained poses across the whole pool
    for new_i in range(0, len(expect_kept), 321):
        np.testing.assert_allclose(
            np.asarray(out.kf_t[new_i]), kf_t_before[expect_kept[new_i]],
            atol=1e-6)
    # chain measurements recompose to the retained poses (sampled windows)
    kf_R = np.asarray(out.kf_R)
    kf_t = np.asarray(out.kf_t)
    meas_R = np.asarray(out.kf_meas_R)
    meas_t = np.asarray(out.kf_meas_t)
    for start in (1, 1234, 2345, len(expect_kept) - 40):
        for i in range(start, min(start + 30, len(expect_kept))):
            pred = kf_t[i - 1] + kf_R[i - 1] @ meas_t[i]
            np.testing.assert_allclose(pred, kf_t[i], atol=2e-2)
            # float32 compose over 4000 keyframes: ~1.5e-4 orthonormality
            # loss in the stored estimates themselves
            np.testing.assert_allclose(kf_R[i - 1] @ meas_R[i], kf_R[i],
                                       atol=5e-4)
    # loop edges: endpoints either remapped (both kept) or dropped
    kept_pos = {old: new for new, old in enumerate(expect_kept)}
    expected_edges = [(kept_pos[i], kept_pos[j])
                      for i, j in zip(li_before, lj_before)
                      if i in kept_pos and j in kept_pos]
    assert int(out.n_loops) == len(expected_edges)
    got = list(zip(np.asarray(out.loop_i)[:int(out.n_loops)].tolist(),
                   np.asarray(out.loop_j)[:int(out.n_loops)].tolist()))
    assert got == expected_edges
    assert bool(out.map_stale)

    # the compacted graph still solves: correct a fresh drifted loop end
    trues_kept = [trues[i] for i in expect_kept]
    errs_before = np.linalg.norm(
        kf_t[len(expect_kept) - 1] - trues_kept[-1][1])
    solved = pg.solve_pose_graph(out, CFG4K)
    errs_after = np.linalg.norm(
        np.asarray(solved.kf_t[len(expect_kept) - 1]) - trues_kept[-1][1])
    assert errs_after <= errs_before + 1e-3
    assert np.isfinite(np.asarray(solved.kf_t[:len(expect_kept)])).all()
