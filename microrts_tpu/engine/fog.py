"""Fog of war: partial observability as dense sight-disc stencils.

TPU-native re-design of ``rts/PartiallyObservableGameState.java``: the
per-unit Euclidean sight discs (:61-71, :156-179) become a static offset-box
scan (offsets up to the UTT's max sightRadius), and "deleting unobservable
units" (:35-54) becomes masking the unit planes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernel import _shift, make_lookup
from .types import EngineConfig, State


def _sight_offsets(max_sight: int):
    offs = []
    for oy in range(-max_sight, max_sight + 1):
        for ox in range(-max_sight, max_sight + 1):
            if ox * ox + oy * oy <= max_sight * max_sight:
                offs.append((ox, oy, ox * ox + oy * oy))
    return offs


def visibility(state: State, player, cfg: EngineConfig) -> jax.Array:
    """bool [H, W]: cells within any own unit's sightRadius (squared
    Euclidean, PartiallyObservableGameState.observable :61-71)."""
    T = cfg.num_types
    max_sight = max(cfg.sight_radius)
    lk_sight = make_lookup(cfg.sight_radius)
    t = jnp.clip(state.utype - 1, 0, T - 1)
    own = (state.utype > 0) & (state.owner == jnp.int32(player))
    s2 = lk_sight(t) ** 2
    vis = jnp.zeros(own.shape, bool)
    for ox, oy, d2 in _sight_offsets(max_sight):
        # a unit at (x, y) with sight s sees (x+ox, y+oy) iff d2 <= s^2
        vis = vis | _shift(own & (d2 <= s2), ox, oy, fill=False)
    return vis


def po_state(state: State, player, cfg: EngineConfig) -> State:
    """The observer's view: non-own units outside visibility removed
    (PartiallyObservableGameState ctor :35-54 — hidden resources too)."""
    vis = visibility(state, player, cfg)
    hide = (state.utype > 0) & (state.owner != jnp.int32(player)) & ~vis
    keep = ~hide
    return state.replace(
        utype=jnp.where(keep, state.utype, 0),
        owner=jnp.where(keep, state.owner, -1),
        hp=jnp.where(keep, state.hp, 0),
        carried=jnp.where(keep, state.carried, 0),
        uid=jnp.where(keep, state.uid, 0),
        busy=state.busy & keep,
        atype=jnp.where(keep, state.atype, 0),
        aparam=jnp.where(keep, state.aparam, 0),
        atx=jnp.where(keep, state.atx, 0),
        aty=jnp.where(keep, state.aty, 0),
        aptype=jnp.where(keep, state.aptype, 0),
        aticks=jnp.where(keep, state.aticks, 0),
        aorder=jnp.where(keep, state.aorder, 0),
        atime=jnp.where(keep, state.atime, -1),
    ).canon()


def observation_po(state: State, player, cfg: EngineConfig) -> jax.Array:
    """8-plane PO observation (PartiallyObservableGameState :82-154):
    the 6 standard planes over the observer's view, + my visibility,
    + known-opponent visibility (sight discs of VISIBLE enemy units)."""
    me = jnp.int32(player)
    view = po_state(state, player, cfg)
    exists = view.utype > 0
    ownerp = jnp.where(exists & (view.owner >= 0),
                       ((view.owner + me) % 2) + 1, 0)
    actp = jnp.where(exists & view.busy, view.atype, 0)
    vis = visibility(state, player, cfg)

    # opponent visibility from units the observer can see
    T = cfg.num_types
    max_sight = max(cfg.sight_radius)
    lk_sight = make_lookup(cfg.sight_radius)
    t = jnp.clip(view.utype - 1, 0, T - 1)
    enemy_vis_src = exists & (view.owner >= 0) & (view.owner != me)
    s2 = lk_sight(t) ** 2
    opp_vis = jnp.zeros(vis.shape, bool)
    for ox, oy, d2 in _sight_offsets(max_sight):
        opp_vis = opp_vis | _shift(enemy_vis_src & (d2 <= s2), ox, oy,
                                   fill=False)

    return jnp.stack([
        jnp.where(exists, view.hp, 0),
        jnp.where(exists, view.carried, 0),
        ownerp,
        jnp.where(exists, view.utype, 0),
        actp,
        state.terrain,
        vis.astype(jnp.int32),
        opp_vis.astype(jnp.int32),
    ]).astype(jnp.int32)
