"""Corridor vertical-bias probe (round-5, VERDICT item 1 follow-up).

diag_corridor.py established: the +z drift is a GEOMETRIC odometry bias
(noise=0, mapping off: +0.016 m/scan, linear).  This probe decomposes one
scan-pair registration: evaluate the surf (pitch, roll, tz) constraint set
AT THE TRUE relative pose and report the residual distribution and the
z-gradient split by plane orientation (ground-like vs wall-like normals).
If the z-gradient at truth is nonzero, the constraint set itself is biased
(association / plane construction), not the solver.

Run:  python examples/diag_corridor2.py [n_scans]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lego_loam_tpu import config_for  # noqa: E402
from lego_loam_tpu.io import synthetic as syn  # noqa: E402
from lego_loam_tpu.models import odometry as odo  # noqa: E402
from lego_loam_tpu.models.pipeline import frontend_step  # noqa: E402
from lego_loam_tpu.utils.math3d import Pose  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24

BASE = dict(
    deskew=False,
    max_keyframes=128, max_map_corner=4096, max_map_surf=16384,
    kf_corner_cap=512, kf_surf_cap=2048, kf_outlier_cap=512,
    max_scan_corner_ds=512, max_scan_surf_ds=2048, nn_query_tile=512,
)


def main():
    cfg = config_for("vlp16", **BASE)
    world = syn.corridor_world(length=300.0, pole_period=12.0, end_caps=False)
    poses = syn.straight_trajectory(N, start=2.0, step=0.8)
    ostate = odo.init_state(cfg)
    bef = aft = Pose.identity()

    prev_feats = None
    R_true = jnp.eye(3, dtype=jnp.float32)
    t_true = jnp.asarray([0.8, 0.0, 0.0], jnp.float32)
    rel_true = Pose(R_true, t_true)

    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.0,
                                       rng=np.random.default_rng(k))
        ostate_prev_refs = (ostate.ref_corner, ostate.ref_surf)
        ostate, feats, opose, rel, fused, stats = frontend_step(
            ostate, jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
            jnp.asarray(ring, jnp.int32), bef, aft, jnp.float32(0.1 * k),
            cfg, cfg.sensor.use_ring)
        if k == 0:
            continue
        rel_np = np.asarray(rel.t)
        if k % 4 != 1 and k < N - 1:
            continue

        ref_c, ref_s = ostate_prev_refs
        flat = feats.flat._replace(s=jnp.ones_like(feats.flat.s))
        sharp = feats.sharp._replace(s=jnp.ones_like(feats.sharp.s))

        def surf_report(rel_q, tag):
            i1, i2, i3, ok = odo._assoc_surf(rel_q, flat, ref_s, cfg)
            q = odo.warp_to_start(rel_q, flat.xyz, flat.s)
            a, b, c = ref_s.xyz[i1], ref_s.xyz[i2], ref_s.xyz[i3]
            n = jnp.cross(b - a, c - a)
            n = n / odo._safe_norm(n, keepdims=True)
            d = jnp.sum(n * (q - a), axis=-1)
            ok = np.asarray(ok)
            d = np.asarray(d)[ok]
            nz = np.asarray(jnp.abs(n[:, 2]))[ok]
            ground = nz > 0.7
            # gradient of 0.5*sum d^2 wrt vz is sum(d * n_z) with sign of n
            # fixed to point "up" for interpretability
            sgn = np.sign(np.asarray(n[:, 2])[ok] + 1e-12)
            dz = d * sgn  # signed offset along +z normal direction
            gz = np.sum(np.asarray(n[:, 2])[ok] * d)
            print(f"    [{tag}] n_ok={ok.sum():3d} ground={ground.sum():3d} "
                  f"wall={(~ground).sum():3d}  |d| mean={np.abs(d).mean():.4f}"
                  f"  dz(ground) mean={dz[ground].mean() if ground.any() else 0:+.4f}"
                  f"  dz(wall) mean={dz[~ground].mean() if (~ground).any() else 0:+.4f}"
                  f"  grad_z={gz:+.5f}")

        Rr = np.asarray(rel.R)
        pitch = -np.degrees(np.arcsin(np.clip(Rr[2, 0], -1, 1)))
        roll = np.degrees(np.arctan2(Rr[2, 1], Rr[2, 2]))
        acc_R = np.asarray(ostate.pose.R)
        acc_pitch = -np.degrees(np.arcsin(np.clip(acc_R[2, 0], -1, 1)))
        print(f"scan {k:3d}: rel=({rel_np[0]:+.4f},{rel_np[1]:+.4f},"
              f"{rel_np[2]:+.4f}) rel_pitch={pitch:+.3f}deg "
              f"rel_roll={roll:+.3f} acc_pitch={acc_pitch:+.3f}deg")
        surf_report(rel_true, "truth ")
        surf_report(rel, "est   ")

        if k == 1:
            # dump the worst constraints' geometry: query + 3 ref points
            i1, i2, i3, ok = odo._assoc_surf(rel_true, flat, ref_s, cfg)
            q = np.asarray(odo.warp_to_start(rel_true, flat.xyz, flat.s))
            a = np.asarray(ref_s.xyz[i1])
            b = np.asarray(ref_s.xyz[i2])
            c = np.asarray(ref_s.xyz[i3])
            nrm = np.cross(b - a, c - a)
            nrm = nrm / (np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
            d = np.sum(nrm * (q - a), axis=-1)
            okn = np.asarray(ok)
            order = np.argsort(-np.abs(d) * okn)
            rr = np.asarray(flat.ring)
            rrr = np.asarray(ref_s.ring)
            for w in order[:8]:
                print(f"      |d|={abs(d[w]):.3f} q=({q[w,0]:+.2f},"
                      f"{q[w,1]:+.2f},{q[w,2]:+.2f}) ring={rr[w]}")
                for nm, pj, ij in (("a", a, i1), ("b", b, i2), ("c", c, i3)):
                    jj = int(np.asarray(ij)[w])
                    print(f"         {nm}=({pj[w,0]:+.2f},{pj[w,1]:+.2f},"
                          f"{pj[w,2]:+.2f}) ring={rrr[jj]}")
    print("done")


if __name__ == "__main__":
    main()
