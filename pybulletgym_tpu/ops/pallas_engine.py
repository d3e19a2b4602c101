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
from pybulletgym_tpu.ops import smath as sm
from pybulletgym_tpu.ops.step import PhysicsConfig, make_substep_scalar

TILE = 1024            # envs per kernel program: 8 sublanes x 128 lanes
_SUB, _LANE = 8, 128

# Deep models (humanoid: nv=23, 41 contact rows) need more Mosaic stack
# than the 16 MB scoped-vmem default; v5e has 128 MB VMEM per core.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


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
            compiler_params=_COMPILER_PARAMS,
        )(qb, vb, taub)
        return (
            q2.reshape(nq, B),
            v2.reshape(nv, B),
            d.reshape(R, B)[:n_rows] if n_rows else jnp.zeros((0, B), q.dtype),
        )

    return step, plan, n_rows


# ---------------------------------------------------------------------------
# full env step as one kernel: auto-reset + RNG + torques + physics + obs +
# reward + bookkeeping. This is the entire reference step/reset call stack
# (SURVEY §3.2/§3.3) in a single TPU kernel launch.
# ---------------------------------------------------------------------------


def make_pallas_env_step(task, interpret: bool = False):
    """Build step_fn(state: EnvState, action (act, B)) -> EnvState running
    everything in one pallas_call. B must be a multiple of 1024."""
    from pybulletgym_tpu.envs.base import EnvState

    model, cfg = task.model, task.physics
    substep, plan, n_rows = make_substep_scalar(model, cfg)
    nq, nv, act = model.nq, model.nv, task.act_dim
    R = max(n_rows, 1)
    obs_dim = task.obs_dim
    max_steps = task.max_episode_steps

    # discover aux/comps key order once via abstract evaluation
    s_like = jax.ShapeDtypeStruct((_SUB, _LANE), jnp.uint32)
    i_like = jax.ShapeDtypeStruct((_SUB, _LANE), jnp.int32)
    _, _, aux_shape = jax.eval_shape(task.initial_state_scalar, s_like, i_like, s_like)
    aux_keys = tuple(sorted(aux_shape.keys()))
    naux = max(len(aux_keys), 1)

    def kernel(q_ref, v_ref, a_ref, aux_ref, done_ref, sc_ref, ep_ref, seed_ref,
               qo, vo, obso, rewo, termo, trunco, sco, epo, auxo, compso):
        pid = pl.program_id(0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        env_id = (pid * _SUB + sub) * _LANE + lane
        seed = seed_ref[0]
        done = done_ref[0] > 0.5
        epoch = ep_ref[0] + done.astype(jnp.uint32)

        # ---- auto-reset [ref: env_bases.py · BaseBulletEnv.reset] ------
        fq, fv, faux = task.initial_state_scalar(seed, env_id, epoch)
        q = [jnp.where(done, fq[i], q_ref[i]) for i in range(nq)]
        v = [jnp.where(done, fv[i], v_ref[i]) for i in range(nv)]
        aux = {
            k: jnp.where(done, faux[k], aux_ref[j]) for j, k in enumerate(aux_keys)
        }
        step_count = jnp.where(done, 0, sc_ref[0])
        ids = (seed, env_id, epoch)
        q, v, aux = task.pre_physics_scalar(q, v, aux, ids)

        # ---- torques [ref: WalkerBase.apply_action] --------------------
        a = [jnp.clip(a_ref[i], -1.0, 1.0) for i in range(act)]
        tau = task.action_tau_scalar(a)
        zero = jnp.zeros_like(q[0])
        tau = tuple(t if not isinstance(t, float) else zero for t in tau)

        # ---- physics: frame_skip substeps [ref: World.step] ------------
        depths0 = tuple(zero for _ in range(R))

        def body(_, carry):
            cq, cv, _d = carry
            q2, v2, d = substep(cq, cv, tau)
            d = tuple(d) + tuple(zero for _ in range(R - len(d)))
            return (tuple(q2), tuple(v2), d)

        q2, v2, d = jax.lax.fori_loop(0, cfg.frame_skip, body, (tuple(q), tuple(v), depths0))

        # ---- observations / rewards [ref: WalkerBaseBulletEnv.step] ----
        obs, reward, term, aux2, comps = task.output_scalar(
            list(q2), list(v2), list(d[:n_rows]), a, aux, ids
        )

        # NaN guard [ref: walker_base_env.py · step isfinite check]
        finite = sm.isfinite(reward)
        for x in list(obs) + list(q2) + list(v2):
            finite = finite & sm.isfinite(x)
        term = term | ~finite
        obs = [jnp.where(sm.isfinite(o), o, 0.0) for o in obs]
        reward = jnp.where(sm.isfinite(reward), reward, 0.0)

        step2 = step_count + 1
        trunc = (step2 >= max_steps) & ~term

        for i in range(nq):
            qo[i] = q2[i]
        for i in range(nv):
            vo[i] = v2[i]
        for i in range(obs_dim):
            obso[i] = obs[i]
        rewo[0] = reward
        termo[0] = term.astype(jnp.float32)
        trunco[0] = trunc.astype(jnp.float32)
        sco[0] = step2
        epo[0] = epoch
        if aux_keys:
            for j, k in enumerate(aux_keys):
                auxo[j] = aux2[k]
        else:
            auxo[0] = zero
        for j, k in enumerate(sorted(comps.keys())):
            compso[j] = comps[k]

    # probe comps keys
    def _probe(q, v, d, a, aux, ids):
        return task.output_scalar(q, v, d, a, aux, ids)

    f_like = jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32)
    _, _, _, _, comps_shape = jax.eval_shape(
        _probe,
        [f_like] * nq, [f_like] * nv, [f_like] * n_rows, [f_like] * act,
        {k: f_like for k in aux_keys}, (s_like, i_like, s_like),
    )
    comp_keys = tuple(sorted(comps_shape.keys()))
    ncomp = max(len(comp_keys), 1)

    def spec(rows):
        return pl.BlockSpec(
            (rows, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    def step_fn(state: EnvState, action) -> EnvState:
        B = state.q.shape[-1]
        assert B % TILE == 0, f"batch {B} must be a multiple of {TILE}"
        grid = (B // TILE,)
        Bs = B // _LANE

        aux_in = (
            jnp.stack([state.aux[k] for k in aux_keys], 0)
            if aux_keys else jnp.zeros((1, B), jnp.float32)
        )
        done_f = (state.terminated | state.truncated).astype(jnp.float32)

        ins = [
            _blocked(state.q, nq),
            _blocked(state.v, nv),
            _blocked(jnp.asarray(action), act),
            _blocked(aux_in, naux),
            done_f.reshape(1, Bs, _LANE),
            state.step_count.reshape(1, Bs, _LANE),
            state.epoch.reshape(1, Bs, _LANE),
            state.seed.reshape(1, Bs, _LANE),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nq, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((nv, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((obs_dim, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, Bs, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((1, Bs, _LANE), jnp.uint32),
            jax.ShapeDtypeStruct((naux, Bs, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((ncomp, Bs, _LANE), jnp.float32),
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(nq), spec(nv), spec(act), spec(naux),
                      spec(1), spec(1), spec(1), spec(1)],
            out_specs=[spec(nq), spec(nv), spec(obs_dim), spec(1), spec(1),
                       spec(1), spec(1), spec(1), spec(naux), spec(ncomp)],
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(*ins)
        q2, v2, obs, rew, term, trunc, sc, ep, auxo, compso = outs
        return EnvState(
            q=q2.reshape(nq, B),
            v=v2.reshape(nv, B),
            obs=obs.reshape(obs_dim, B),
            reward=rew.reshape(B),
            terminated=term.reshape(B) > 0.5,
            truncated=trunc.reshape(B) > 0.5,
            step_count=sc.reshape(B),
            epoch=ep.reshape(B),
            env_id=state.env_id,
            seed=state.seed,
            aux={k: auxo[j].reshape(B) for j, k in enumerate(aux_keys)},
            rewards={k: compso[j].reshape(B) for j, k in enumerate(comp_keys)},
        )

    return step_fn
