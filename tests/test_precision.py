"""Matmul precision policy (utils/precision.f32_matmuls).

On TPU the DEFAULT matmul precision feeds the MXU bf16 inputs; measured on
the chip this degraded a 36-scan synthetic trajectory 7x (0.083 -> 0.577 m
RMSE, examples/accuracy_sweep.py).  Every jitted entry point must therefore
trace under highest (full float32) matmul precision.  These tests pin the
policy structurally via the lowered StableHLO, which records the per-op
precision on any backend (so they catch a dropped decorator on the CPU CI
mesh without needing a TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lego_loam_tpu.utils.precision import f32_matmuls


def test_decorator_sets_highest_precision():
    def mm(a, b):
        return a @ b

    a = jnp.ones((8, 8))
    txt_plain = jax.jit(mm).lower(a, a).as_text()
    txt_fixed = jax.jit(f32_matmuls(mm)).lower(a, a).as_text()
    assert "HIGHEST" not in txt_plain
    assert "HIGHEST" in txt_fixed


def _lowered(fn, *args, **kw):
    return fn.lower(*args, **kw).as_text()


def test_entry_points_trace_with_highest_precision():
    """The pipeline entry jits must carry HIGHEST on their dot ops."""
    from lego_loam_tpu import config_for
    from lego_loam_tpu.models import mapping as mp
    from lego_loam_tpu.models import odometry as odo
    from lego_loam_tpu.models.pipeline import frontend_step
    from lego_loam_tpu.types import FeatureCloud, ScanFeatures
    from lego_loam_tpu.utils.math3d import Pose

    cfg = config_for(
        "vlp16", deskew=False,
        max_keyframes=16, max_map_corner=512, max_map_surf=1024,
        kf_corner_cap=64, kf_surf_cap=128, kf_outlier_cap=64,
        max_scan_corner_ds=64, max_scan_surf_ds=128, nn_query_tile=64,
        max_sharp=32, max_less_sharp=64, max_flat=32, max_less_flat=128,
        max_outlier=32, max_loop_edges=4, pg_gn_iters=1,
    )
    N = cfg.sensor.n_scan * cfg.sensor.horizon_scan
    ident = Pose.identity()
    txt = _lowered(
        frontend_step, odo.init_state(cfg),
        jnp.zeros((N, 3), jnp.float32), jnp.zeros((N,), bool),
        jnp.zeros((N,), jnp.int32), ident, ident, jnp.float32(0.0),
        cfg, True)
    assert txt.count("HIGHEST") > 0, "frontend_step lost the f32 policy"

    def fc(n):
        return FeatureCloud(jnp.zeros((n, 3), jnp.float32),
                            jnp.zeros((n,), jnp.int32),
                            jnp.zeros((n,), jnp.float32),
                            jnp.zeros((n,), bool))

    feats = ScanFeatures(fc(cfg.max_sharp), fc(cfg.max_less_sharp),
                         fc(cfg.max_flat), fc(cfg.max_less_flat),
                         fc(cfg.max_outlier))
    txt = _lowered(mp.mapping_step, mp.init_state(cfg), feats, ident,
                   jnp.float32(0.0), cfg)
    assert txt.count("HIGHEST") > 0, "mapping_step lost the f32 policy"


def test_precision_policy_numerics():
    """The wrapped matmul is exact f32 regardless of platform defaults."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(64, 3)) * 30.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(3, 64)) * 30.0, jnp.float32)

    got = jax.jit(f32_matmuls(lambda x, y: x @ y))(a, b)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-6, atol=1e-3)
