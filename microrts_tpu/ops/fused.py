"""Pallas-fused engine steps: the whole tick as one TPU kernel.

The jitted plane-op engine materializes ~10^2 intermediate [B, H, W] arrays
per tick through HBM; each fusion is bandwidth-bound, so the tick's cost is
(number of materializations) x (bytes per plane).  These kernels run the
SAME engine math (the pure functions from engine/kernel.py, vmapped inside
the kernel body) over a block of envs resident in VMEM — one pallas_call
per phase instead of ~100 XLA fusions, with a single HBM read+write of the
state.

Layout: batch-MINOR.  Mosaic tiles the two minor dims of every ref as
(8, 128); a [block, H, W] ref therefore pads W up to 128 lanes (8x VMEM
waste and 1/8 lane utilization at W=16) and blows the 16 MB scoped-VMEM
stack for any useful block size.  With refs shaped [H, W, block] /
[k, block] instead, lanes carry the env batch (full utilization, no
padding), H/W shifts are cheap major-dim pad/slices, and the engine math
is vmapped over the LAST axis (``in_axes=-1``).  XLA's own fusions pick
exactly this layout for the unfused path (``{0,2,1:T(8,128)}`` on
[B, 16, 16] operands — batch minor), so the boundary ``moveaxis`` is a
relayout XLA can elide or do at line speed.

Exactness: the kernel body traces the identical jnp computation, so fused
and unfused paths agree bit-for-bit (asserted by tests/test_fused.py in
interpreter mode and by the TPU test in tests/test_fused_device.py).
Restrictions: deterministic-damage rulesets only (UTT v1/v2 — the nondet
path needs threefry inside the kernel; use the unfused engine).
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
# true per-env scalars (rank 0 per env; stored as one [1, B] row)
SCALAR_RANK0 = ("time", "next_id", "order_ctr", "cancel_ctr")
CAND_FIELDS = ("atype", "aparam", "atx", "aty", "aptype", "rank")


def _split_state(state: State):
    planes = [getattr(state, f) for f in PLANE_FIELDS]
    scalars = [getattr(state, f) for f in SCALAR_FIELDS]
    return planes, scalars


def _scalar_bm(f, x):
    """Per-env scalar leaves as batch-minor 2D rows: [B] -> [1, B],
    [B, k] -> [k, B]."""
    return x[None, :] if f in SCALAR_RANK0 else x.T


def _mk_state(plane_vals, scalar_vals) -> State:
    kw = dict(zip(PLANE_FIELDS, plane_vals))
    kw.update(zip(SCALAR_FIELDS, scalar_vals))
    return State(**kw)


def _bm_in_state(state: State):
    """State -> list of batch-minor arrays ([H, W, B] planes, [k, B] rows),
    every plane widened to i32 (Mosaic has no i1 loads/stores and narrow
    int refs tile poorly; the engine's canonical narrow dtypes are restored
    inside the kernel body by ``_read_state``)."""
    planes, scalars = _split_state(state)
    ins = [jnp.moveaxis(p.astype(jnp.int32), 0, -1) for p in planes]
    ins += [_scalar_bm(f, s) for f, s in zip(SCALAR_FIELDS, scalars)]
    return ins


def _read_state(refs):
    """Kernel-side: refs -> a State whose leaves carry batch at axis -1,
    restored to canonical dtypes (bool via != 0; the i32<->narrow casts are
    register-level inside the kernel, not memory traffic)."""
    from ..engine.types import FIELD_DTYPES
    n_p = len(PLANE_FIELDS)
    planes = []
    for f, r in zip(PLANE_FIELDS, refs[:n_p]):
        dt = FIELD_DTYPES[f]
        planes.append(r[:] != 0 if dt == jnp.bool_ else r[:].astype(dt))
    scalars = []
    for f, r in zip(SCALAR_FIELDS, refs[n_p:]):
        v = r[:]
        scalars.append(v[0] if f in SCALAR_RANK0 else v)
    return _mk_state(planes, scalars)


def _write_state(out_refs, state: State):
    planes, scalars = _split_state(state)
    vals = [jnp.where(p, 1, 0) if p.dtype == jnp.bool_
            else p.astype(jnp.int32) for p in planes]
    vals += [s[None, :] if f in SCALAR_RANK0 else s
             for f, s in zip(SCALAR_FIELDS, scalars)]
    for r, v in zip(out_refs, vals):
        r[:] = v


def _state_out_shapes(state: State, H, W, B):
    shapes = [jax.ShapeDtypeStruct((H, W, B), jnp.int32)
              for _ in PLANE_FIELDS]
    for f in SCALAR_FIELDS:
        s = getattr(state, f)
        k = 1 if f in SCALAR_RANK0 else s.shape[1]
        shapes.append(jax.ShapeDtypeStruct((k, B), s.dtype))
    return shapes


def _unpack_state(outs):
    from ..engine.types import FIELD_DTYPES
    n_p = len(PLANE_FIELDS)
    planes = [jnp.moveaxis(o, -1, 0).astype(FIELD_DTYPES[f])
              for f, o in zip(PLANE_FIELDS, outs[:n_p])]
    scalars = [o[0] if f in SCALAR_RANK0 else o.T
               for f, o in zip(SCALAR_FIELDS, outs[n_p:n_p
                                                   + len(SCALAR_FIELDS)])]
    return _mk_state(planes, scalars)


def _specs(arrs, block):
    """Batch-minor BlockSpecs: tile the LAST (env) axis by ``block``."""
    out = []
    for x in arrs:
        shape = x.shape if hasattr(x, "shape") else x
        blk = tuple(shape[:-1]) + (block,)
        nd = len(shape)
        out.append(pl.BlockSpec(
            blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,),
            memory_space=pltpu.VMEM))
    return out


def fused_cycle(engine: Engine, block: int = 512, interpret: bool = False):
    """Returns cycle_b(state[B, ...]) -> (state', done[B]) running each
    block of envs fully in VMEM (one kernel for the whole GameState.cycle)."""
    H, W = engine.cfg.height, engine.cfg.width
    n_out = len(PLANE_FIELDS) + len(SCALAR_FIELDS)

    def kernel(*refs):
        state = _read_state(refs[:n_out])
        new_state, done = jax.vmap(engine.cycle, in_axes=-1,
                                   out_axes=-1)(state)
        _write_state(refs[n_out:-1], new_state)
        refs[-1][:] = jnp.where(done, 1, 0)[None, :]

    def cycle_b(state: State):
        B = state.utype.shape[0]
        assert B % block == 0, (B, block)
        ins = _bm_in_state(state)
        out_shapes = _state_out_shapes(state, H, W, B) \
            + [jax.ShapeDtypeStruct((1, B), jnp.int32)]
        outs = pl.pallas_call(
            kernel,
            grid=(B // block,),
            in_specs=_specs(ins, block),
            out_specs=_specs([s.shape for s in out_shapes], block),
            out_shape=out_shapes,
            interpret=interpret,
        )(*ins)
        return _unpack_state(outs[:-1]), outs[-1][0].astype(bool)

    return cycle_b


def fused_issue(engine: Engine, block: int = 512, interpret: bool = False):
    """Returns issue_b(state[B, ...], cand[B, ...]) -> state'."""
    H, W = engine.cfg.height, engine.cfg.width
    n_state = len(PLANE_FIELDS) + len(SCALAR_FIELDS)
    n_in = n_state + len(CAND_FIELDS)

    def kernel(*refs):
        state = _read_state(refs[:n_state])
        cand_vals = [r[:] for r in refs[n_state:n_in]]
        cand = Candidates(**dict(zip(CAND_FIELDS, cand_vals)))
        new_state = jax.vmap(engine.issue, in_axes=-1,
                             out_axes=-1)(state, cand)
        _write_state(refs[n_in:], new_state)

    def issue_b(state: State, cand: Candidates):
        B = state.utype.shape[0]
        assert B % block == 0
        ins = _bm_in_state(state) \
            + [jnp.moveaxis(getattr(cand, f), 0, -1) for f in CAND_FIELDS]
        out_shapes = _state_out_shapes(state, H, W, B)
        outs = pl.pallas_call(
            kernel,
            grid=(B // block,),
            in_specs=_specs(ins, block),
            out_specs=_specs([s.shape for s in out_shapes], block),
            out_shape=out_shapes,
            interpret=interpret,
        )(*ins)
        return _unpack_state(outs)

    return issue_b
