"""Periphery: serialization round-trips, tournament, config, renderer, CLI."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.config import GameSettings, make_bot
from microrts_tpu.engine.types import state_from_pgs
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.eval.tournament import play_matches
from microrts_tpu.interop.serialize import (TraceRecorder, state_from_xml,
                                            state_to_xml)
from microrts_tpu.interop.trace import load_trace
from microrts_tpu.render import render_ansi, render_rgb

MAPS = "/root/reference/maps"


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")


def _advance(env, s, n, seed=0):
    from microrts_tpu.bots.scripted import worker_rush
    wr = worker_rush(env)
    step = jax.jit(lambda s, k: env.step(
        s, wr(s, 0, k), wr(s, 1, jax.random.fold_in(k, 7))))
    k = jax.random.PRNGKey(seed)
    for _ in range(n):
        k, sub = jax.random.split(k)
        s, _, _ = step(s, sub)
    return s


def test_state_xml_roundtrip_midgame(env):
    """GameState XML round-trip incl. in-flight assignments
    (GameState.toxml :763-801 / fromXML :845-889)."""
    s = _advance(env, env.reset(jax.random.PRNGKey(0)), 37)
    s2 = state_from_xml(state_to_xml(s, env.utt), env.utt, env.cfg.engine)
    for f in ("utype", "owner", "hp", "carried", "busy", "atype", "aparam",
              "aticks", "atime", "terrain"):
        assert (np.asarray(getattr(s, f)) == np.asarray(getattr(s2, f))).all(), f
    assert int(s2.time) == int(s.time)
    # the reloaded state keeps evolving
    s3, _, _ = env.step(s2, jnp.zeros((8, 8, 7), jnp.int32),
                        jnp.zeros((8, 8, 7), jnp.int32))
    assert int(s3.time) == int(s.time) + 1


def test_trace_recording_roundtrip(env, tmp_path):
    from microrts_tpu.bots.scripted import worker_rush
    wr = worker_rush(env)
    rec = TraceRecorder(env.utt)
    s = env.reset(jax.random.PRNGKey(1))
    k = jax.random.PRNGKey(2)
    for _ in range(10):
        k, sub = jax.random.split(k)
        a0 = wr(s, 0, sub)
        c0, _, _ = env.decode(s, a0, 0, env._inflight_claims(s),
                              env._inflight_spent(s, 0))
        rec.record_candidates(s, c0)
        s, _, _ = env.step(s, a0, jnp.zeros((8, 8, 7), jnp.int32))
    p = str(tmp_path / "t.zip")
    rec.save_zip(p)
    tr = load_trace(p)
    assert len(tr.entries) == 10
    assert tr.utt.num_types == env.utt.num_types
    # recorded snapshot equals the recorded state
    assert len(tr.entries[0].pgs.units) == 6


@pytest.mark.heavy
def test_tournament_play_matches(env):
    wr = make_bot("WorkerRush", env)
    pa = make_bot("PassiveAI", env)
    w = play_matches(env, wr, pa, n_games=3, max_cycles=600, seed=0)
    assert (w == 0).all()


def test_game_settings_properties(tmp_path):
    gs = GameSettings()
    gs.apply_properties(open("/root/reference/resources/config.properties")
                        .read())
    assert gs.max_cycles == 5000
    assert gs.utt_version == 2
    assert gs.ai1 == "ai.abstraction.WorkerRush"
    assert gs.map_location == "maps/16x16/basesWorkers16x16.xml"


def test_renderers(env):
    s = env.reset(jax.random.PRNGKey(0))
    img = render_rgb(s, env.utt, scale=8)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    txt = render_ansi(s, env.utt)
    assert "t=0" in txt and "R" in txt


def test_cli_runs():
    out = subprocess.run(
        [sys.executable, "-m", "microrts_tpu", "--cpu",
         "--map", "maps/8x8/basesWorkers8x8.xml", "--ai1", "WorkerRush",
         "--ai2", "PassiveAI", "--max_cycles", "400"],
        capture_output=True, text=True, timeout=400, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-800:]
    assert "winner = player 0" in out.stdout


def test_branching_factor_matches_oracle(env):
    from microrts_tpu import refimpl
    from microrts_tpu.engine.pgs import PhysicalGameState
    from microrts_tpu.ops.branching import branching_factor

    s = env.reset(jax.random.PRNGKey(0))
    exact, _flt, _lg = branching_factor(env, s, 0)
    gs = refimpl.GameState(PhysicalGameState.load(
        f"{MAPS}/8x8/basesWorkers8x8.xml", env.utt).clone(), env.utt)
    prod = 1
    for u in gs.pgs.units:
        if u.player == 0:
            prod *= len(gs.get_unit_actions(u))
    assert exact == prod


def test_mapgen_playable(tmp_path):
    from microrts_tpu.bots.scripted import passive_bot, worker_rush
    from microrts_tpu.utils.mapgen import generate_symmetric_map, save_map_xml

    pgs = generate_symmetric_map(10, 10, n_resources=2, seed=3)
    p = str(tmp_path / "gen.xml")
    from microrts_tpu.engine.utt import UnitTypeTable
    save_map_xml(pgs, UnitTypeTable(2), p)
    env2 = GridnetEnv(p)
    wr, pa = worker_rush(env2), passive_bot(env2)
    s = env2.reset(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, k: env2.step(s, wr(s, 0, k), pa(s, 1, k)))
    k = jax.random.PRNGKey(1)
    done = False
    for _ in range(1200):
        k, sub = jax.random.split(k)
        s, _, done = step(s, sub)
        if bool(done):
            break
    assert bool(done) and int(env2.engine.winner(s)) == 0


def test_frame_skip():
    env4 = GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml", frame_skip=4)
    s = env4.reset(jax.random.PRNGKey(0))
    s, _, _ = env4.step(s, jnp.zeros((8, 8, 7), jnp.int32),
                        jnp.zeros((8, 8, 7), jnp.int32))
    assert int(s.time) == 4


@pytest.mark.heavy
def test_remote_bot_loopback():
    """Full game over the SocketAI TCP protocol: our server hosts a rush
    bot; RemoteBot queries it per tick from the local game loop."""
    import time as _time

    from microrts_tpu.bots.scripted import passive_bot, worker_rush
    from microrts_tpu.interop.socket_ai import AIServer, RemoteBot

    def mk(utt, h, w):
        e = GridnetEnv.from_dims(utt, h, w)
        return e, worker_rush(e)

    srv = AIServer(mk, port=19903)
    srv.start_background()
    _time.sleep(0.3)
    env5 = GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")
    remote = RemoteBot(env5, port=19903)
    pa = passive_bot(env5)
    s = env5.reset(jax.random.PRNGKey(0))
    done = False
    for i in range(600):
        s, _, done = env5.step(s, remote(s, 0), pa(s, 1, jax.random.PRNGKey(i)))
        if bool(done):
            break
    remote.close()
    srv.shutdown()
    assert bool(done) and int(env5.engine.winner(s)) == 0
