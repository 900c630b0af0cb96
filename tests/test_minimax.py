"""ABCD / RTMinimax: jitted DFS vs a transparent eager recursion.

The eager oracle mirrors ABCD.java's recursion directly in host Python
(same odometer enumeration order, same alt alternation, same strict
first-best alpha-beta), calling the same engine primitives eagerly.  With
``playout_len=0`` both are deterministic, so the fixed-stack
``lax.while_loop`` implementation must choose the IDENTICAL root action.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.minimax import abcd_bot, rt_minimax_bot
from microrts_tpu.bots.scripted import random_bot
from microrts_tpu.bots.treesearch import _advance, _can_act, _issue_player
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.ops.arms import arm_space, arms_to_action
from microrts_tpu.ops.enumerate import enumerate_joint_actions
from microrts_tpu.ops.evaluation import simple_sqrt_eval3
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env4():
    return GridnetEnv(asset_path("maps/melee4x4light2.xml"))


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def _eager_abcd(env, state, player, max_depth, max_actions=128):
    """Host-recursion mirror of ABCD.java:105-193 with leaf eval3."""
    eng = env.engine
    ecfg = env.cfg.engine
    sp = arm_space(env)
    maxp = int(player)

    def rec(st, level, nextsim, alpha, beta):
        can0 = bool(_can_act(st, maxp))
        can1 = bool(_can_act(st, 1 - maxp))
        term = bool(eng.gameover(st)) or not (can0 or can1)
        if term or level >= max_depth:
            return float(simple_sqrt_eval3(st, maxp, ecfg)), None
        both = can0 and can1
        mover = nextsim if both else (maxp if can0 else 1 - maxp)
        nextsim2 = (1 - nextsim) if both else nextsim
        arms, valid = enumerate_joint_actions(env, st, mover, max_actions)
        arms, valid = np.asarray(arms), np.asarray(valid)
        assert valid.sum() < max_actions, "enumeration truncated"
        is_max = mover == maxp
        best_v, best_a = None, None
        for k in range(len(valid)):
            if not valid[k]:
                continue
            a = jnp.asarray(arms[k])
            st1 = _issue_player(env, st, arms_to_action(sp, a), mover)
            st2, _ = _advance(env, st1)
            v, _ = rec(st2, level + 1, nextsim2, alpha, beta)
            if is_max:
                alpha = max(alpha, v)
                if best_v is None or v > best_v:
                    best_v, best_a = v, arms[k]
            else:
                beta = min(beta, v)
                if best_v is None or v < best_v:
                    best_v, best_a = v, arms[k]
            if beta <= alpha:
                break
        return best_v, best_a

    return rec(state, 0, maxp, -1e5, 1e5)


@pytest.mark.heavy
def test_abcd_matches_eager_recursion(env4):
    env = env4
    sp = arm_space(env)
    bot = jax.jit(abcd_bot(env, max_depth=2, playout_len=0,
                           node_budget=4000), static_argnums=1)
    s = env.reset(jax.random.PRNGKey(0))
    opp = random_bot(env, 5.0)
    k = jax.random.PRNGKey(1)
    checked = 0
    for i in range(30):   # light moves take 8 ticks between decision points
        k, k0, k1 = jax.random.split(k, 3)
        if bool(_can_act(s, 0)) and not bool(env.engine.gameover(s)):
            act = np.asarray(bot(s, 0, k0))
            _, oracle_arms = _eager_abcd(env, s, 0, 2)
            want = np.asarray(arms_to_action(
                sp, jnp.asarray(oracle_arms).reshape(env.h, env.w)))
            np.testing.assert_array_equal(act, want)
            checked += 1
            if checked >= 3:
                break
        s, _, done = env.step(
            s, bot(s, 0, k0), opp(s, 1, k1))
        if bool(done):
            break
    assert checked >= 2


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


@pytest.mark.heavy
def test_abcd_and_rtminimax_play_legally(env8):
    env = env8
    bots = [
        jax.jit(abcd_bot(env, max_depth=2, playout_len=8, node_budget=60),
                static_argnums=1),
        jax.jit(rt_minimax_bot(env, lookahead=12, stack_cap=6,
                               node_budget=60), static_argnums=1),
    ]
    opp = random_bot(env, 5.0)
    for bi, bot in enumerate(bots):
        s = env.reset(jax.random.PRNGKey(10 + bi))
        k = jax.random.PRNGKey(20 + bi)
        produced_real = False
        for i in range(5):
            k, k0, k1 = jax.random.split(k, 3)
            a = bot(s, 0, k0)
            assert _legal(env, s, a, 0)
            produced_real |= bool(np.asarray(a[..., 0]).any())
            s, _, done = env.step(s, a, opp(s, 1, k1))
            if bool(done):
                break
        assert produced_real, f"bot {bi} never issued a real action"


@pytest.mark.slow
def test_abcd_beats_random_biased(env8):
    """VERDICT r1 item 2: ABCD must beat RandomBiasedAI on basesWorkers8x8."""
    from microrts_tpu.eval.tournament import play_matches

    env = env8
    abcd = abcd_bot(env, max_depth=2, playout_len=24, node_budget=160)
    rb = random_bot(env, 5.0)
    w = play_matches(env, abcd, rb, n_games=6, max_cycles=800, seed=5)
    assert (w == 0).sum() > (w == 1).sum()
