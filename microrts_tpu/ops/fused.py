"""Pallas-fused engine steps: the whole tick as one TPU kernel.

The jitted plane-op engine materializes ~10^2 intermediate [B, H, W] arrays
per tick through HBM; at 16x16 each op runs far below HBM peak, so per-op
overhead dominates.  This wrapper runs the SAME engine math (the pure
functions from engine/kernel.py, vmapped inside the kernel body) over a
block of envs resident in VMEM — one pallas_call per phase instead of ~100
XLA ops, with a single HBM read+write of the state.

Exactness: the kernel body traces the identical jnp computation, so fused
and unfused paths agree bit-for-bit (asserted by tests/test_fused.py, which
runs the kernels in interpreter mode).
Restrictions: deterministic-damage rulesets only (UTT v1/v2 — the nondet
path needs threefry inside the kernel; it falls back to the unfused engine).

STATUS (experimental): the engine was refactored Mosaic-compatible (no
scatters, no i1 pads/constants/selects, no cross-minor reshapes, no
cumsum, chained reductions) and the kernels now pass Mosaic's lowering,
but the final compile currently dies in a Mosaic-internal CHECK
(`array.h:480 limits[i] <= dim(i) (2 vs. 1)`).  Narrowed repro: STORING
any [B, H, W] plane whose ancestry includes the damage-box computation
crashes, while REDUCING the same value to a scalar compiles — i.e. a
layout-assignment bug on materialization, not an unsupported op (outputs
like `time` that dead-code the board pass).  Interpreter-mode equivalence
is green; the unfused engine remains the production path (~1.4M full RL
env-steps/s/chip, already past the 1M north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.kernel import Engine
from ..engine.types import Candidates, State

# State fields, split by rank ("plane" = [H, W] per env, "scalar" = per env)
PLANE_FIELDS = ("terrain", "utype", "owner", "hp", "carried", "uid", "busy",
                "atype", "aparam", "atx", "aty", "aptype", "aticks",
                "aorder", "atime")
SCALAR_FIELDS = ("time", "resources", "next_id", "order_ctr",
                 "cancel_ctr", "key")
CAND_FIELDS = ("atype", "aparam", "atx", "aty", "aptype", "rank")


def _split_state(state: State):
    planes = [getattr(state, f) for f in PLANE_FIELDS]
    scalars = [getattr(state, f) for f in SCALAR_FIELDS]
    return planes, scalars


def _scalar2d(x):
    """Per-env scalars as [B, k] (TPU pallas wants >=2D blocks)."""
    return x[:, None] if x.ndim == 1 else x


def _mk_state(plane_vals, scalar_vals) -> State:
    kw = dict(zip(PLANE_FIELDS, plane_vals))
    kw.update(zip(SCALAR_FIELDS, scalar_vals))
    return State(**kw)


def fused_cycle(engine: Engine, block: int = 256,
                interpret: bool = False):
    """Returns cycle_b(state[B, ...]) -> (state', done[B]) running each
    block of envs fully in VMEM."""
    H, W = engine.cfg.height, engine.cfg.width

    def kernel(*refs):
        n_in = len(PLANE_FIELDS) + len(SCALAR_FIELDS)
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        planes = [r[:] for r in in_refs[:len(PLANE_FIELDS)]]
        scalars = [r[:] for r in in_refs[len(PLANE_FIELDS):]]
        # undo the 2D packing of true scalars
        scalars = [s[:, 0] if f in ("time", "next_id", "order_ctr", "cancel_ctr") else s
                   for f, s in zip(SCALAR_FIELDS, scalars)]
        planes[6] = planes[6] != 0  # busy (astype->i1 truncation unsupported in Mosaic)
        state = _mk_state(planes, scalars)
        new_state, done = jax.vmap(engine.cycle)(state)
        new_planes, new_scalars = _split_state(new_state)
        outs = ([jnp.where(p, 1, 0) if p.dtype == jnp.bool_
                 else p for p in new_planes]
                + [_scalar2d(s) for s in new_scalars]
                + [jnp.where(done, 1, 0)[:, None]])
        for r, v in zip(out_refs, outs):
            r[:] = v

    def cycle_b(state: State):
        B = state.utype.shape[0]
        assert B % block == 0, (B, block)
        planes, scalars = _split_state(state)
        ins = [p.astype(jnp.int32) for p in planes] \
            + [_scalar2d(s) for s in scalars]
        grid = (B // block,)

        def spec(x):
            blk = (block,) + x.shape[1:]
            return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (x.ndim - 1),
                                memory_space=pltpu.VMEM)

        out_shapes = ([jax.ShapeDtypeStruct((B, H, W), jnp.int32)
                       for _ in PLANE_FIELDS]
                      + [jax.ShapeDtypeStruct(_scalar2d(s).shape, s.dtype)
                         for s in scalars]
                      + [jax.ShapeDtypeStruct((B, 1), jnp.int32)])
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(x) for x in ins],
            out_specs=[spec(jnp.zeros(s.shape, s.dtype))
                       for s in out_shapes],
            out_shape=out_shapes,
            interpret=interpret,
        )(*ins)
        n_p = len(PLANE_FIELDS)
        new_planes = list(outs[:n_p])
        new_planes[6] = new_planes[6].astype(bool)
        new_scalars = [o[:, 0] if f in ("time", "next_id", "order_ctr", "cancel_ctr")
                       else o
                       for f, o in zip(SCALAR_FIELDS, outs[n_p:-1])]
        done = outs[-1][:, 0].astype(bool)
        return _mk_state(new_planes, new_scalars), done

    return cycle_b


def fused_issue(engine: Engine, block: int = 256,
                interpret: bool = False):
    """Returns issue_b(state[B, ...], cand[B, ...]) -> state'."""
    H, W = engine.cfg.height, engine.cfg.width

    def kernel(*refs):
        n_in = len(PLANE_FIELDS) + len(SCALAR_FIELDS) + len(CAND_FIELDS)
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        np_, ns = len(PLANE_FIELDS), len(SCALAR_FIELDS)
        planes = [r[:] for r in in_refs[:np_]]
        scalars = [r[:] for r in in_refs[np_:np_ + ns]]
        scalars = [s[:, 0] if f in ("time", "next_id", "order_ctr", "cancel_ctr") else s
                   for f, s in zip(SCALAR_FIELDS, scalars)]
        planes[6] = planes[6] != 0
        cand_vals = [r[:] for r in in_refs[np_ + ns:]]
        state = _mk_state(planes, scalars)
        cand = Candidates(**dict(zip(CAND_FIELDS, cand_vals)))
        new_state = jax.vmap(engine.issue)(state, cand)
        new_planes, new_scalars = _split_state(new_state)
        outs = ([jnp.where(p, 1, 0) if p.dtype == jnp.bool_
                 else p for p in new_planes]
                + [_scalar2d(s) for s in new_scalars])
        for r, v in zip(out_refs, outs):
            r[:] = v

    def issue_b(state: State, cand: Candidates):
        B = state.utype.shape[0]
        assert B % block == 0
        planes, scalars = _split_state(state)
        ins = ([p.astype(jnp.int32) for p in planes]
               + [_scalar2d(s) for s in scalars]
               + [getattr(cand, f) for f in CAND_FIELDS])
        grid = (B // block,)

        def spec(x):
            blk = (block,) + x.shape[1:]
            return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (x.ndim - 1),
                                memory_space=pltpu.VMEM)

        out_shapes = ([jax.ShapeDtypeStruct((B, H, W), jnp.int32)
                       for _ in PLANE_FIELDS]
                      + [jax.ShapeDtypeStruct(_scalar2d(s).shape, s.dtype)
                         for s in scalars])
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(x) for x in ins],
            out_specs=[spec(jnp.zeros(s.shape, s.dtype))
                       for s in out_shapes],
            out_shape=out_shapes,
            interpret=interpret,
        )(*ins)
        n_p = len(PLANE_FIELDS)
        new_planes = list(outs[:n_p])
        new_planes[6] = new_planes[6].astype(bool)
        new_scalars = [o[:, 0] if f in ("time", "next_id", "order_ctr", "cancel_ctr")
                       else o
                       for f, o in zip(SCALAR_FIELDS, outs[n_p:])]
        return _mk_state(new_planes, new_scalars)

    return issue_b
