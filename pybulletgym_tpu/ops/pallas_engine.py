"""Pallas TPU execution engine: the whole physics step as ONE kernel.

Why this exists: the engine's math is thousands of small elementwise ops on
per-env scalars. XLA's TPU loop-fusions *recompute* shared subexpressions
per consumer, so a deep FK/dynamics DAG with heavy sharing explodes
combinatorially inside a fusion (measured ~1000x slowdown), and unfused
graphs pay per-instruction dispatch. Mosaic compiles the same trace into
straight-line VPU code where every op is one vector instruction on an
(8, 128) tile of envs — sharing preserved, zero per-op overhead.

This is the "Pallas-optimized contact+integrator kernel" the design calls
for (BASELINE north star; SURVEY §7 step 4): frame_skip substeps of
FK -> CRBA/RNE -> unrolled Cholesky -> narrowphase -> unrolled PGS ->
semi-implicit Euler, all inside one `pallas_call`, gridded over env tiles.

Layout contract: arrays enter as (rows, B) with B a multiple of 1024;
internally each per-env scalar is one (8, 128) vreg tile (f32 native tile).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pybulletgym_tpu.models.schema import Model
from pybulletgym_tpu.ops.step import PhysicsConfig, make_substep_scalar

TILE = 1024            # envs per kernel program: 8 sublanes x 128 lanes
_SUB, _LANE = 8, 128


def _blocked(x, rows):
    """(rows, B) -> (rows, B//128, 128)."""
    B = x.shape[-1]
    return x.reshape(rows, B // _LANE, _LANE)


def make_pallas_physics_step(model: Model, cfg: PhysicsConfig, interpret: bool = False):
    """step(q (nq,B), v (nv,B), tau (nv,B)) -> (q', v', depths (R,B)).

    B must be a multiple of 1024. Drop-in replacement for
    `ops.step.make_physics_step`'s step function on TPU.
    """
    substep, plan, n_rows = make_substep_scalar(model, cfg)
    nq, nv = model.nq, model.nv
    R = max(n_rows, 1)

    def kernel(q_ref, v_ref, tau_ref, qo_ref, vo_ref, do_ref):
        q = tuple(q_ref[i] for i in range(nq))
        v = tuple(v_ref[i] for i in range(nv))
        tau = tuple(tau_ref[i] for i in range(nv))
        zero = jnp.zeros_like(q[0])
        depths0 = tuple(zero for _ in range(R))

        def body(_, carry):
            cq, cv, _d = carry
            q2, v2, d = substep(cq, cv, tau)
            d = tuple(d) + tuple(zero for _ in range(R - len(d)))
            return (tuple(q2), tuple(v2), d)

        q2, v2, d = jax.lax.fori_loop(
            0, cfg.frame_skip, body, (q, v, depths0), unroll=False
        )
        for i in range(nq):
            qo_ref[i] = q2[i]
        for i in range(nv):
            vo_ref[i] = v2[i]
        for i in range(R):
            do_ref[i] = d[i]

    def step(q, v, tau):
        B = q.shape[-1]
        assert B % TILE == 0, f"batch {B} must be a multiple of {TILE}"
        grid = (B // TILE,)
        qb = _blocked(q, nq)
        vb = _blocked(v, nv)
        taub = _blocked(tau, nv)

        def spec(rows):
            return pl.BlockSpec(
                (rows, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )

        q2, v2, d = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(nq), spec(nv), spec(nv)],
            out_specs=[spec(nq), spec(nv), spec(R)],
            out_shape=[
                jax.ShapeDtypeStruct((nq, B // _LANE, _LANE), q.dtype),
                jax.ShapeDtypeStruct((nv, B // _LANE, _LANE), q.dtype),
                jax.ShapeDtypeStruct((R, B // _LANE, _LANE), q.dtype),
            ],
            interpret=interpret,
        )(qb, vb, taub)
        return (
            q2.reshape(nq, B),
            v2.reshape(nv, B),
            d.reshape(R, B)[:n_rows] if n_rows else jnp.zeros((0, B), q.dtype),
        )

    return step, plan, n_rows
