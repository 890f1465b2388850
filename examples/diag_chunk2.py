"""Chunk-slowness isolation round 2 (see diag_chunk.py).

Round 1 found: shipped chunk_steps (C) ~6 ms/scan, frontend-only scan (D)
~5.6 ms/scan, but mapping-every-scan (E) and cond-mapping-no-donate (F)
~0.2 ms/scan.  The common factor of the two slow programs is NOT the cond,
NOT donation alone, NOT the mapping.  This round:

  G. shipped chunk_steps logic, donation REMOVED
  H. frontend-only scan, mstate CLOSED OVER (not a carry element)
  I. frontend-only scan, no mstate at all (carry = ostate)
  J. shipped chunk_steps logic + donation, loop-closure block removed
     = (C minus the `if cfg.loop_closure_enabled` python branch, which for
        loop_closure_enabled=False should be identical anyway)

plus HLO `copy` instruction census for the slow/fast programs.

Run:  python examples/diag_chunk2.py
"""

from __future__ import annotations

import os
import re
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from lego_loam_tpu import config_for
from lego_loam_tpu.io import synthetic as syn
from lego_loam_tpu.models import mapping as mp
from lego_loam_tpu.models import odometry as odo
from lego_loam_tpu.models.fusion import fuse_pose
from lego_loam_tpu.models.pipeline import frontend_step
from lego_loam_tpu.utils.precision import f32_matmuls

C = 32
K = 256


def build(cfg, n):
    world = syn.default_world(seed=0)
    poses = syn.circle_trajectory(n, radius=12.0, arc=0.9 * np.pi)
    out = []
    for k, (R, t) in enumerate(poses):
        xyz, valid, ring = syn.raycast(world, R, t, cfg.sensor, noise=0.02,
                                       rng=np.random.default_rng(k))
        out.append((jnp.asarray(xyz, jnp.float32), jnp.asarray(valid),
                    jnp.asarray(ring, jnp.int32)))
    return out


def census(lowered_compiled, label):
    txt = lowered_compiled.as_text()
    # count copy/bitcast/fusion ops inside while bodies, and total copies
    n_copy = len(re.findall(r"= f32\[.*copy\(", txt))
    copies = re.findall(r"(f32\[[0-9,]*\][^\n]*copy\([^\n]*)", txt)
    big = [c[:90] for c in copies if _bytes(c) >= 1 << 20]
    print(f"  [{label}] total-copy-lines={len(copies)} big(>=1MB)={len(big)}")
    for b in big[:12]:
        print(f"      {b}")
    return txt


def _bytes(line):
    m = re.match(r"f32\[([0-9,]*)\]", line)
    if not m or not m.group(1):
        return 4
    n = 1
    for d in m.group(1).split(","):
        n *= int(d)
    return 4 * n


def main():
    print(f"platform={jax.default_backend()} C={C} K={K}")
    cfg = config_for("vlp16", deskew=False, max_keyframes=K)
    scans = build(cfg, 3 * C)
    stackc = lambda i: tuple(
        jnp.stack([scans[i * C + k][j] for k in range(C)]) for j in range(3))
    frames0 = jnp.arange(C, dtype=jnp.int32)
    times0 = jnp.arange(C, dtype=jnp.float32) * cfg.sensor.scan_period
    use_ring = cfg.sensor.use_ring

    def shipped_body(donate: bool, with_loop_branch: bool):
        def run_impl(ostate, mstate, xyz, valid, ring, frames, times):
            def step(carry, inp):
                ostate, mstate = carry
                xyz_k, valid_k, ring_k, frame_k, t_k = inp
                ostate, feats, opose, rel, _fused_fe, stats = frontend_step(
                    ostate, xyz_k, valid_k, ring_k,
                    mstate.bef_mapped, mstate.aft_mapped, t_k, cfg, use_ring)
                do_map = (frame_k % cfg.mapping_process_every) == 0
                mfeats = feats._replace(
                    less_sharp=ostate.ref_corner, less_flat=ostate.ref_surf)
                mstate, mpose = jax.lax.cond(
                    do_map,
                    lambda m: mp.mapping_step(m, mfeats, opose, t_k, cfg,
                                              compact_inline=True),
                    lambda m: (m, m.aft_mapped),
                    mstate)
                if with_loop_branch and cfg.loop_closure_enabled:
                    raise AssertionError("not in this experiment")
                closed = jnp.bool_(False)
                fused = fuse_pose(mstate, opose)
                return (ostate, mstate), (opose, fused, mpose, do_map,
                                          closed, stats)

            (ostate, mstate), outs = jax.lax.scan(
                step, (ostate, mstate), (xyz, valid, ring, frames, times))
            return ostate, mstate, outs

        kw = dict(donate_argnames=("ostate", "mstate")) if donate else {}
        return jax.jit(f32_matmuls(run_impl), **kw)

    def frontend_variant(mode):
        """mode: 'closed' (mstate captured), 'none' (no mstate)."""
        mstate0 = mp.init_state(cfg)

        @jax.jit
        @f32_matmuls
        def run(ostate, xyz, valid, ring, frames, times):
            def step(carry, inp):
                ostate = carry
                xyz_k, valid_k, ring_k, frame_k, t_k = inp
                if mode == "closed":
                    bef, aft = mstate0.bef_mapped, mstate0.aft_mapped
                else:
                    from lego_loam_tpu.utils.math3d import Pose
                    bef = aft = Pose.identity()
                ostate, feats, opose, rel, fused_fe, stats = frontend_step(
                    ostate, xyz_k, valid_k, ring_k, bef, aft, t_k, cfg,
                    use_ring)
                return ostate, (opose, fused_fe)

            ostate, outs = jax.lax.scan(
                step, ostate, (xyz, valid, ring, frames, times))
            return ostate, outs

        return run

    def time_variant(label, fn, with_mstate, donate):
        ostate = odo.init_state(cfg)
        mstate = mp.init_state(cfg)
        t0 = time.perf_counter()
        if with_mstate:
            out = fn(ostate, mstate, *stackc(0), frames0, times0)
            jax.block_until_ready(out[2][1].t)
            ostate, mstate = out[0], out[1]
        else:
            out = fn(ostate, *stackc(0), frames0, times0)
            jax.block_until_ready(out[1][1].t)
            ostate = out[0]
        print(f"  ({label} compile+first: {time.perf_counter()-t0:.1f} s)")
        t0 = time.perf_counter()
        for i in (1, 2):
            if with_mstate:
                out = fn(ostate, mstate, *stackc(i), frames0 + i * C, times0)
                ostate, mstate = out[0], out[1]
            else:
                out = fn(ostate, *stackc(i), frames0 + i * C, times0)
                ostate = out[0]
        jax.block_until_ready(out[-1][1].t)
        w = time.perf_counter() - t0
        print(f"{label:26s}: {w/(2*C)*1e3:7.2f} ms/scan -> {2*C/w:8.1f} fps")

    G = shipped_body(donate=False, with_loop_branch=True)
    time_variant("G shipped-no-donate", G, True, False)
    J = shipped_body(donate=True, with_loop_branch=False)
    time_variant("J shipped-donate", J, True, True)
    H = frontend_variant("closed")
    time_variant("H frontend-mstate-closed", H, False, False)
    I = frontend_variant("none")
    time_variant("I frontend-identity-pose", I, False, False)

    # HLO copy census for slow vs fast
    print("HLO census:")
    ostate = odo.init_state(cfg)
    mstate = mp.init_state(cfg)
    args = (ostate, mstate, *stackc(0), frames0, times0)
    census(J.lower(*args).compile(), "J shipped-donate")
    census(G.lower(*args).compile(), "G shipped-no-donate")


if __name__ == "__main__":
    main()
