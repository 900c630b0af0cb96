"""Evaluation functions (ai/evaluation/*), vectorized over planes.

Faithful to the Java formulas including their quirks: the Sqrt variants
compute ``sqrt(hp / maxHp)`` with Java INTEGER division
(SimpleSqrtEvaluationFunction.java / ...3.java — 0 unless at full health),
while SimpleEvaluationFunction divides in float.  All evaluate
``(state, maxplayer) -> float`` and vmap/jit cleanly, so they drive batched
playout search and learned-eval comparisons on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.kernel import make_lookup
from ..engine.types import EngineConfig, State

RESOURCE = 20.0
RESOURCE_IN_WORKER = 10.0
UNIT_BONUS_MULTIPLIER = 40.0
VICTORY = 10_000.0


def _player_planes(state: State, player, cfg: EngineConfig):
    T = cfg.num_types
    t = jnp.clip(state.utype - 1, 0, T - 1)
    mine = (state.utype > 0) & (state.owner == jnp.int32(player))
    maxhp = make_lookup(cfg.hp)(t)
    cost = make_lookup(cfg.cost)(t)
    bal = jnp.where(jnp.int32(player) == 1, state.resources[1],
                    state.resources[0])
    return t, mine, maxhp, cost, bal


def simple_base_score(state: State, player, cfg: EngineConfig):
    """SimpleEvaluationFunction.base_score (float hp ratio)."""
    _, mine, maxhp, cost, bal = _player_planes(state, player, cfg)
    unit_term = UNIT_BONUS_MULTIPLIER * cost * state.hp \
        / jnp.maximum(maxhp, 1).astype(jnp.float32)
    return (bal * RESOURCE
            + jnp.sum(jnp.where(mine, state.carried * RESOURCE_IN_WORKER
                                + unit_term, 0.0)))


def simple_eval(state: State, maxplayer, cfg: EngineConfig):
    return (simple_base_score(state, maxplayer, cfg)
            - simple_base_score(state, 1 - maxplayer, cfg))


def _sqrt_base_score(state: State, player, cfg: EngineConfig):
    """Sqrt variants' base_score — NOTE Java integer division hp/maxHp."""
    _, mine, maxhp, cost, bal = _player_planes(state, player, cfg)
    ratio = (state.hp // jnp.maximum(maxhp, 1)).astype(jnp.float32)
    unit_term = UNIT_BONUS_MULTIPLIER * cost * jnp.sqrt(ratio)
    score = (bal * RESOURCE
             + jnp.sum(jnp.where(mine, state.carried * RESOURCE_IN_WORKER
                                 + unit_term, 0.0)))
    return score, jnp.any(mine)


def simple_sqrt_eval(state: State, maxplayer, cfg: EngineConfig):
    """SimpleSqrtEvaluationFunction: s1 - s2."""
    s1, _ = _sqrt_base_score(state, maxplayer, cfg)
    s2, _ = _sqrt_base_score(state, 1 - maxplayer, cfg)
    return s1 - s2


def simple_sqrt_eval2(state: State, maxplayer, cfg: EngineConfig):
    """SimpleSqrtEvaluationFunction2: +-VICTORY when one side is wiped."""
    s1, _ = _sqrt_base_score(state, maxplayer, cfg)
    s2, _ = _sqrt_base_score(state, 1 - maxplayer, cfg)
    return jnp.where((s1 == 0) & (s2 != 0), -VICTORY,
                     jnp.where((s1 != 0) & (s2 == 0), VICTORY, s1 - s2))


def simple_sqrt_eval3(state: State, maxplayer, cfg: EngineConfig):
    """SimpleSqrtEvaluationFunction3: 2*s1/(s1+s2) - 1 in [-1, 1]
    (base_score is 0 for a player with no units)."""
    s1, any1 = _sqrt_base_score(state, maxplayer, cfg)
    s2, any2 = _sqrt_base_score(state, 1 - maxplayer, cfg)
    s1 = jnp.where(any1, s1, 0.0)
    s2 = jnp.where(any2, s2, 0.0)
    return jnp.where(s1 + s2 == 0, 0.5, 2.0 * s1 / (s1 + s2) - 1.0)


# SimpleOptEvaluationFunction.java:12-14 — tuned constants
OPT_RESOURCE = 0.19059792
OPT_RESOURCE_IN_WORKER = 0.60513535
OPT_UNIT_BONUS_MULTIPLIER = 0.30983887


def simple_opt_eval(state: State, maxplayer, cfg: EngineConfig):
    """SimpleOptEvaluationFunction.evaluate (:17-31): SimpleEvaluation's
    float-ratio formula under the tuned constants."""

    def base(player):
        _, mine, maxhp, cost, bal = _player_planes(state, player, cfg)
        unit_term = OPT_UNIT_BONUS_MULTIPLIER * cost * state.hp \
            / jnp.maximum(maxhp, 1).astype(jnp.float32)
        return (bal * OPT_RESOURCE
                + jnp.sum(jnp.where(
                    mine, state.carried * OPT_RESOURCE_IN_WORKER + unit_term,
                    0.0)))

    return base(maxplayer) - base(1 - maxplayer)


def simple_opt_upper_bound(state: State, cfg: EngineConfig):
    """SimpleOptEvaluationFunction.upperBound (:34-54): all reachable
    material of the better-off player, in bonus units."""
    neutral = (state.utype > 0) & (state.owner == -1)
    free = jnp.sum(jnp.where(neutral, state.carried, 0)
                   .astype(jnp.float32))

    def reach(player):
        _, mine, _maxhp, cost, bal = _player_planes(state, player, cfg)
        return bal + jnp.sum(jnp.where(mine, state.carried + cost, 0.0))

    return (free + jnp.maximum(reach(0), reach(1))) \
        * OPT_UNIT_BONUS_MULTIPLIER


# LanchesterEvaluationFunction weights (index 0: maps < 128 wide)
_LW = dict(base=0.12900641042498262, rax=0.23108197488337265,
           worker=0.18122298329807154, light=1.7496678034331925,
           ranged=1.6793840344563218, heavy=3.9012441116439427,
           carried=0.3566229669443759, mined=0.30141654836442761)
_LW128 = dict(base=0.48944975377829392, rax=0.55022866772062451,
              worker=-0.0078514695699861588, light=0.12587241165484406,
              ranged=0.029918374064639004, heavy=0.16414240458460899,
              carried=0.01061490087512941, mined=0.38643842595899713)
_ORDER = 1.7


def lanchester_eval(state: State, maxplayer, cfg: EngineConfig,
                    type_ids: dict):
    """LanchesterEvaluationFunction: 2*sigmoid(s_max - s_min) - 1.
    ``type_ids``: name -> id mapping for Base/Barracks/Worker/Light/
    Heavy/Ranged (absent = -1)."""
    W = _LW128 if cfg.width == 128 else _LW

    def score(player):
        t, mine, maxhp, _cost, bal = _player_planes(state, player, cfg)
        tid = lambda n: type_ids.get(n, -1)
        hp = state.hp.astype(jnp.float32)
        maxhp_f = jnp.maximum(maxhp, 1).astype(jnp.float32)
        is_ = lambda n: mine & (t == tid(n))
        s_build = jnp.sum(jnp.where(is_("Base"), W["base"] * hp, 0.0)) \
            + jnp.sum(jnp.where(is_("Barracks"), W["rax"] * hp, 0.0))
        unit_score = (
            jnp.sum(jnp.where(is_("Worker"), W["worker"] * hp, 0.0))
            + jnp.sum(jnp.where(is_("Light"), W["light"] * hp / maxhp_f, 0.0))
            + jnp.sum(jnp.where(is_("Ranged"), W["ranged"] * hp, 0.0))
            + jnp.sum(jnp.where(is_("Heavy"), W["heavy"] * hp / maxhp_f, 0.0)))
        n_units = jnp.sum(jnp.where(
            is_("Worker") | is_("Light") | is_("Ranged") | is_("Heavy"),
            1.0, 0.0))
        unit_score = unit_score * jnp.power(jnp.maximum(n_units, 1e-9),
                                            _ORDER - 1.0)
        carried = jnp.sum(jnp.where(mine, state.carried, 0)
                          .astype(jnp.float32))
        return (unit_score + s_build + carried * W["carried"]
                + bal * W["mined"])

    s = score(maxplayer) - score(1 - maxplayer)
    return 2.0 * jax.nn.sigmoid(s) - 1.0
