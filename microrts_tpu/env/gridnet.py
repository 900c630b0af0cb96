"""Gridnet RL environment: the MicroRTS-Py-compatible primary API surface.

Re-designs the ConnAALL RL bridge (SURVEY.md §2.5) as pure jittable
functions over the device engine:

* action decode  = PlayerAction.fromVectorAction (PlayerAction.java:384-417)
  + UnitAction.fromVectorAction (UnitAction.java:675-709)
  + fillWithNones(gs, player, 1) (JNIAI.java:53)
* step           = JNIGridnetClientSelfPlay.gameStep (:159-190): decode p0,
  issue, decode p1 (seeing p0's same-tick claims), issue, cycle, rewards
* observation    = GameState.getVectorObservation (:922-968), 6 int planes
* masks          = JNIGridnetClient layout (:60-99):
  [can-act, 6 types, 4 move, 4 harvest, 4 return, 4 produce-dir, T types,
   (2R+1)^2 relative attack]
* rewards        = ai/reward/* implementations, computed from the decoded
  PlayerAction + pre/post states like the Java clients do

Decode-order semantics: Java scans the action array sequentially, merging
each kept action's ResourceUsage cumulatively (positions + per-player
costs, in-flight included).  Only PRODUCE actions consume budget and only
MOVE/PRODUCE claim cells, so the only genuinely sequential part is the
produce budget; it runs as a short fori_loop over the first
``max_produce_scan`` produce candidates in rank order, and position
conflicts resolve vectorized as min-rank-wins against moves + kept
produces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import kernel as K
from ..engine.kernel import make_lookup
from ..engine.pgs import PhysicalGameState
from ..engine.types import (ATTACK, HARVEST, INF, MOVE, NONE, PRODUCE, RETURN,
                            Candidates, EngineConfig, State, state_from_pgs)
from ..engine.utt import UnitTypeTable

REWARD_NAMES = (
    "winloss", "resourcegather", "produceworker", "producebuilding",
    "producecombat", "attack", "closertoenemybase", "closertoenemyunit",
)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    engine: EngineConfig
    max_produce_scan: int = 16
    reward_fns: Tuple[str, ...] = REWARD_NAMES[:6]
    # type-name ids for name-based rewards (-1 = absent in this UTT)
    worker_id: int = -1
    base_id: int = -1
    barracks_id: int = -1
    light_id: int = -1
    heavy_id: int = -1
    ranged_id: int = -1


class GridnetEnv:
    """Single-map gridnet env.  All methods are pure and jittable; batching
    is the caller's `vmap` (see env.vec for the auto-resetting vector env)."""

    def __init__(self, map_path: str, utt: Optional[UnitTypeTable] = None,
                 reward_fns: Sequence[str] = REWARD_NAMES[:6],
                 max_produce_scan: int = 16, partial_obs: bool = False,
                 frame_skip: int = 1):
        self.partial_obs = partial_obs
        self.frame_skip = frame_skip
        self.utt = utt if utt is not None else UnitTypeTable(2)
        self.pgs0 = PhysicalGameState.load(map_path, self.utt)
        self.h, self.w = self.pgs0.height, self.pgs0.width
        ecfg = EngineConfig.from_utt(self.utt, self.h, self.w)
        self.engine = K.make_engine(ecfg)

        def tid(name):
            ut = self.utt.get_unit_type(name)
            return ut.ID if ut is not None else -1

        self.cfg = EnvConfig(
            engine=ecfg, max_produce_scan=max_produce_scan,
            reward_fns=tuple(reward_fns),
            worker_id=tid("Worker"), base_id=tid("Base"),
            barracks_id=tid("Barracks"), light_id=tid("Light"),
            heavy_id=tid("Heavy"), ranged_id=tid("Ranged"))
        self._init_state = state_from_pgs(self.pgs0.clone(), ecfg)

    @classmethod
    def from_dims(cls, utt: UnitTypeTable, h: int, w: int,
                  **kwargs) -> "GridnetEnv":
        """Mapless env over given dimensions (for serving remote games
        whose map lives on the other side of the socket)."""
        self = cls.__new__(cls)
        self.partial_obs = kwargs.get("partial_obs", False)
        self.frame_skip = kwargs.get("frame_skip", 1)
        self.utt = utt
        self.pgs0 = PhysicalGameState(w, h)
        self.pgs0.players = []
        self.h, self.w = h, w
        ecfg = EngineConfig.from_utt(utt, h, w)
        self.engine = K.make_engine(ecfg)

        def tid(name):
            ut = utt.get_unit_type(name)
            return ut.ID if ut is not None else -1

        self.cfg = EnvConfig(
            engine=ecfg,
            reward_fns=tuple(kwargs.get("reward_fns", REWARD_NAMES[:6])),
            worker_id=tid("Worker"), base_id=tid("Base"),
            barracks_id=tid("Barracks"), light_id=tid("Light"),
            heavy_id=tid("Heavy"), ranged_id=tid("Ranged"))
        self._init_state = state_from_pgs(self.pgs0, ecfg)
        return self

    @property
    def num_rewards(self) -> int:
        return len(self.cfg.reward_fns)

    @property
    def action_dim(self) -> int:
        """Per-cell action component sizes [6, 4, 4, 4, 4, T, (2R+1)^2]."""
        return 7

    def action_nvec(self):
        d = 2 * self.cfg.engine.max_range + 1
        return np.array([6, 4, 4, 4, 4, self.cfg.engine.num_types, d * d])

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> State:
        return self._init_state.replace(key=key)

    # ------------------------------------------------------------------
    def decode(self, state: State, actions: jax.Array, player,
               claimed0: jax.Array, spent0: jax.Array) -> Tuple[Candidates,
                                                                jax.Array,
                                                                jax.Array]:
        """PlayerAction.fromVectorAction for one player.

        ``actions``: int32 [H, W, 7] gridnet components
        ``claimed0``: bool [H, W] cells claimed by in-flight reservations and
        (for p1) the other player's same-tick kept claims.
        ``spent0``: int32 scalar, this player's in-flight produce costs.
        Returns (candidates incl. NONE(1) pads, claimed', spent')."""
        cfg = self.cfg.engine
        H, W, T = self.h, self.w, cfg.num_types
        R = cfg.max_range
        D = 2 * R + 1
        lk_cost = make_lookup(cfg.cost)

        me = jnp.int32(player)
        present = (state.utype > 0) & (state.owner == me) & ~state.busy

        at = actions[..., 0]
        aparam = jnp.select(
            [at == MOVE, at == HARVEST, at == RETURN, at == PRODUCE],
            [actions[..., 1], actions[..., 2], actions[..., 3],
             actions[..., 4]],
            default=jnp.where(at == NONE, -1, 0))
        aptype = jnp.clip(actions[..., 5], 0, T - 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        rel = actions[..., 6]
        atx = jnp.where(at == ATTACK, xs + rel % D - R, 0)
        aty = jnp.where(at == ATTACK, ys + rel // D - R, 0)

        rank = (ys * W + xs).astype(jnp.int32)
        cand_ok = present & (at >= 0) & (at < 6)

        # --- claims (MOVE / PRODUCE): Java tracks claimed positions as
        # FLAT indices pos = (x+dx) + (y+dy)*W (UnitAction.resourceUsage
        # :246-296) — out-of-bounds moves wrap across rows and still claim.
        # We replicate exactly with a padded flat buffer of length
        # H*W + 2*W (slot = pos + W); every direction is then a constant
        # flat offset, so reads/writes are static slices, not gathers.
        is_claim = cand_ok & ((at == MOVE) | (at == PRODUCE))
        dparam = jnp.clip(aparam, 0, 3)
        OFF = (-W, 1, W, -1)  # up, right, down, left in flat space
        L = H * W + 2 * W
        HW = H * W
        is_claim_f = is_claim.reshape(-1)
        dparam_f = dparam.reshape(-1)
        rank_f = rank.reshape(-1)

        def read_slot(buf, d):
            s = W + OFF[d]
            return buf[s:s + HW]

        # blocked: own claim slot already reserved (in-flight base_ru)
        blocked0_f = jnp.zeros(HW, bool)
        for d in range(4):
            blocked0_f = blocked0_f | ((dparam_f == d)
                                       & read_slot(claimed0, d))
        blocked0 = is_claim & blocked0_f.reshape(H, W)
        is_claim = is_claim & ~blocked0
        is_claim_f = is_claim.reshape(-1)

        is_move = is_claim & (at == MOVE)
        is_prod = is_claim & (at == PRODUCE)
        pcost = jnp.where(is_prod, lk_cost(aptype), 0)

        # min move-claim rank per claim slot (moves never fail on budget)
        mrank = jnp.full(L, INF, jnp.int32)
        for d in range(4):
            s = W + OFF[d]
            seg = jnp.where((dparam_f == d) & is_move.reshape(-1),
                            rank_f, INF)
            mrank = mrank.at[s:s + HW].min(seg)

        # sequential budget resolution over produce candidates in rank
        # order.  The candidates are GATHERED into compact [Kp] vectors
        # once, then the order-sensitive keep/drop recurrence unrolls over
        # Kp with [Kp]-wide ops — no per-trip scatters into the [L] claim
        # buffer (a lax.scan with .at[x].set bodies was ~60% of the whole
        # live env step on the TPU profile).
        Kp = self.cfg.max_produce_scan
        is_prod_f = is_prod.reshape(-1)
        balance = jnp.where(me == 1, state.resources[1],
                            state.resources[0])
        iflat = jnp.arange(HW, dtype=jnp.int32)
        slot_f = W + iflat + make_lookup(OFF)(dparam_f)
        pcost_f = pcost.reshape(-1)
        # every per-candidate attribute is read at its OWN cell densely
        # (no gathers: jnp.take from [HW] planes serialized at ~10 ms per
        # op on the TPU profile), the move-conflict (pos) check is applied
        # HERE (a produce losing to a lower-rank move claim is skipped by
        # Java's cumulative check without consuming budget or a scan slot),
        # and (rank, cost, slot) are packed into ONE i32 key; the Kp
        # lowest-rank candidates are then drawn by iterative min-extraction
        # (keys are unique and extracted in increasing order, so each round
        # is a single fused mask+min-reduce — measured ~4x cheaper than the
        # [HW]-wide multi-operand lax.sort it replaces).
        m_at_slot = jnp.zeros(HW, jnp.int32)
        for d in range(4):
            m_at_slot = jnp.where(dparam_f == d, read_slot(mrank, d),
                                  m_at_slot)
        pos_ok = is_prod_f & (rank_f < m_at_slot)
        rb = max(1, (HW - 1).bit_length())
        cb = max(1, max(cfg.cost).bit_length())
        sb = (L - 1).bit_length()
        IMAX = jnp.iinfo(jnp.int32).max
        if rb + cb + sb <= 30:
            packed = (rank_f << (cb + sb)) | (pcost_f << sb) | slot_f
            key_p = jnp.where(pos_ok, packed, IMAX)
            prev = jnp.int32(-1)
            r_k, c_k, x_k, valid = [], [], [], []
            for _ in range(Kp):
                m = jnp.min(jnp.where(key_p > prev, key_p, IMAX))
                prev = m
                valid.append(m < IMAX)
                x_k.append(m & ((1 << sb) - 1))
                c_k.append((m >> sb) & ((1 << cb) - 1))
                r_k.append(m >> (cb + sb))
        else:
            # maps too large to pack: one multi-operand sort instead
            key_w = jnp.where(pos_ok, rank_f, INF)
            sk, sc, sx = jax.lax.sort((key_w, pcost_f, slot_f), num_keys=1)
            valid = [sk[i] < INF for i in range(Kp)]
            r_k = [sk[i] for i in range(Kp)]
            c_k = [sc[i] for i in range(Kp)]
            x_k = [sx[i] for i in range(Kp)]

        spent = spent0
        kept, prod_kept_f = [], jnp.zeros(HW, bool)
        for i in range(Kp):
            blocked = valid[0] & ~valid[0]
            for j in range(i):
                blocked = blocked | (kept[j] & (x_k[j] == x_k[i]))
            # ResourceUsage.consistentWith zero-skip (:31-50): the first
            # produce is never budget-dropped when nothing is accumulated
            res_ok = (spent == 0) | (spent + c_k[i] <= balance)
            keep_i = valid[i] & ~blocked & res_ok
            spent = spent + jnp.where(keep_i, c_k[i], 0)
            kept.append(keep_i)
            # expand back to the flat plane by RANK identity (ranks are
            # unique per candidate; dense compares, no scatter)
            prod_kept_f = prod_kept_f | (
                rank_f == jnp.where(keep_i, r_k[i], -1))
        spent1 = spent
        prod_kept = prod_kept_f.reshape(H, W) & is_prod
        # produce candidates beyond the scan window are dropped (NONE(1) pad)
        prank = jnp.full(L, INF, jnp.int32)
        for d in range(4):
            s = W + OFF[d]
            seg = jnp.where((dparam_f == d) & prod_kept.reshape(-1),
                            rank_f, INF)
            prank = prank.at[s:s + HW].min(seg)
        mrank_own = jnp.zeros(HW, jnp.int32)
        prank_own = jnp.zeros(HW, jnp.int32)
        for d in range(4):
            mrank_own = jnp.where(dparam_f == d, read_slot(mrank, d),
                                  mrank_own)
            prank_own = jnp.where(dparam_f == d, read_slot(prank, d),
                                  prank_own)
        move_kept = is_move & (rank_f == mrank_own).reshape(H, W) \
            & (rank_f < prank_own).reshape(H, W)

        keep = ((cand_ok & (at != MOVE) & (at != PRODUCE))
                | move_kept | prod_kept)
        # fillWithNones(gs, player, 1): own idle units without a kept action
        pad = present & ~keep
        atype_out = jnp.where(keep, at, jnp.where(pad, NONE, -1))
        aparam_out = jnp.where(keep, aparam, jnp.where(pad, 1, 0))
        rank_out = jnp.where(keep, rank,
                             jnp.where(pad, H * W + rank, INF))
        claimed1 = claimed0
        for d in range(4):
            s = W + OFF[d]
            seg = (dparam_f == d) & (move_kept | prod_kept).reshape(-1)
            claimed1 = claimed1.at[s:s + HW].max(seg)

        cand = Candidates(atype=atype_out, aparam=aparam_out, atx=atx,
                          aty=aty, aptype=aptype, rank=rank_out)
        return cand, claimed1, spent1

    def _inflight_claims(self, state: State) -> jax.Array:
        """Flat padded claim buffer [H*W + 2*W] of in-flight MOVE/PRODUCE
        target positions (Java base_ru positions, wrap semantics included;
        in-flight targets are always in-bounds since they passed issueSafe)."""
        H, W = self.h, self.w
        OFF = (-W, 1, W, -1)
        inflight = (state.busy & ((state.atype == MOVE)
                                  | (state.atype == PRODUCE)))
        buf = jnp.zeros(H * W + 2 * W, bool)
        for d in range(4):
            s = W + OFF[d]
            seg = (inflight & (state.aparam == d)).reshape(-1)
            buf = buf.at[s:s + H * W].max(seg)
        return buf

    def _inflight_spent(self, state: State, player) -> jax.Array:
        COST = jnp.asarray(self.cfg.engine.cost, jnp.int32)
        lk_cost = make_lookup(self.cfg.engine.cost)
        pc = jnp.where(state.busy & (state.atype == PRODUCE)
                       & (state.owner == player),
                       lk_cost(jnp.clip(state.aptype, 0,
                                        self.cfg.engine.num_types - 1)), 0)
        return jnp.sum(pc)

    # ------------------------------------------------------------------
    def step(self, state: State, a0: jax.Array, a1: jax.Array):
        """Self-play step (JNIGridnetClientSelfPlay.gameStep :159-190):
        decode p0 -> decode p1 (sees p0's claims) -> one merged issue ->
        cycle -> rewards.  Returns (state', rewards [2, NR], done).

        Under partial observability each player's decode runs against its
        fog-of-war view (hidden enemy reservations are invisible to the
        cumulative base_ru, exactly as in the Java client where getAction
        receives the PartiallyObservableGameState); issue/cycle use the
        full state."""
        pre = state
        if self.partial_obs:
            # Java flow: decode p0 against its fog view, issue, then decode
            # p1 against ITS fog view of the post-issue state (visible p0
            # same-tick claims included via the in-flight scan; the engine's
            # atime plane makes sequential same-tick issues exact), issue,
            # cycle.  Hidden enemy reservations can thus conflict at issue
            # and cancel cross-cycle, as in the reference.
            from ..engine.fog import po_state
            view0 = po_state(state, 0, self.cfg.engine)
            c0, _, _ = self.decode(state, a0, 0,
                                   self._inflight_claims(view0),
                                   self._inflight_spent(state, 0))
            state1 = self.engine.issue(state, c0)
            view1 = po_state(state1, 1, self.cfg.engine)
            c1, _, _ = self.decode(state1, a1, 1,
                                   self._inflight_claims(view1),
                                   self._inflight_spent(state1, 1))
            state2 = self.engine.issue(state1, c1)
            state2, done = self.engine.cycle(state2)
            r0 = self._rewards(pre, c0, 0, state2)
            r1 = self._rewards(pre, c1, 1, state2)
            return state2, jnp.stack([r0, r1]), done

        # Sequential per-player decode+issue, exactly the Java client flow
        # (getAction -> issueSafe per player in order): p1's cumulative
        # base_ru sees p0's POST-issueSafe assignments — an illegal p0
        # claim that issueSafe turned into NONE must not block p1.  The
        # engine's atime plane makes the second same-tick issue exact.
        c0, _, _ = self.decode(state, a0, 0, self._inflight_claims(state),
                               self._inflight_spent(state, 0))
        state1 = self.engine.issue_env(state, c0)
        c1, _, _ = self.decode(state1, a1, 1,
                               self._inflight_claims(state1),
                               self._inflight_spent(state1, 1))
        state2 = self.engine.issue_env(state1, c1)
        state2, done = self.engine.cycle(state2)
        for _ in range(self.frame_skip - 1):
            state2, d2 = self.engine.cycle(state2)
            done = done | d2
        r0 = self._rewards(pre, c0, 0, state2)
        r1 = self._rewards(pre, c1, 1, state2)
        return state2, jnp.stack([r0, r1]), done

    def step_vs(self, state: State, a0: jax.Array, bot_fn):
        """Step with an external player-0 action and an on-device scripted
        opponent (JNIGridnetClient.gameStep semantics).  ``bot_fn(state,
        player)`` returns a gridnet [H, W, 7] tensor (the standard bot
        contract); it is decoded against the post-issue state so the
        opponent sees player 0's same-tick claims, like the sequential
        getAction calls in the Java client loop."""
        pre = state
        claimed = self._inflight_claims(state)
        c0, claimed, _ = self.decode(state, a0, 0, claimed,
                                     self._inflight_spent(state, 0))
        state1 = self.engine.issue_env(state, c0)
        a1 = bot_fn(state1, 1)
        c1, _, _ = self.decode(state1, a1, 1,
                               self._inflight_claims(state1),
                               self._inflight_spent(state1, 1))
        state1 = self.engine.issue_env(state1, c1)
        state1, done = self.engine.cycle(state1)
        r0 = self._rewards(pre, c0, 0, state1)
        return state1, r0, done

    # ------------------------------------------------------------------
    # observations

    def observation(self, state: State, player) -> jax.Array:
        """GameState.getVectorObservation (:922-968): int32 [6, H, W] planes
        hp, carried, owner-relative, type+1, current-action-type, walls.
        Under partial_obs: the 8-plane PO observation
        (PartiallyObservableGameState :82-154)."""
        if self.partial_obs:
            from ..engine.fog import observation_po
            return observation_po(state, player, self.cfg.engine)
        exists = state.utype > 0
        me = jnp.int32(player)
        ownerp = jnp.where(exists & (state.owner >= 0),
                           ((state.owner + me) % 2) + 1, 0)
        actp = jnp.where(exists & state.busy, state.atype, 0)
        return jnp.stack([
            jnp.where(exists, state.hp, 0),
            jnp.where(exists, state.carried, 0),
            ownerp,
            jnp.where(exists, state.utype, 0),
            actp,
            state.terrain,
        ]).astype(jnp.int32)

    def observation_onehot(self, state: State, player) -> jax.Array:
        """MicroRTS-Py-style binarized observation [H, W, 5+5+3+(T+1)+6]
        (the Python-side binarization the reference defers, GameState.java:45)."""
        T = self.cfg.engine.num_types
        obs = self.observation(state, player)  # [6, H, W]
        hp = jax.nn.one_hot(jnp.clip(obs[0], 0, 4), 5)
        res = jax.nn.one_hot(jnp.clip(obs[1], 0, 4), 5)
        own = jax.nn.one_hot(obs[2], 3)
        typ = jax.nn.one_hot(obs[3], T + 1)
        act = jax.nn.one_hot(obs[4], 6)
        return jnp.concatenate([hp, res, own, typ, act], axis=-1)

    def masks(self, state: State, player) -> jax.Array:
        """int32 [H, W, 1+6+4+4+4+4+T+(2R+1)^2] (JNIGridnetClient :60-99)."""
        m = self.engine.legal_masks(state, player)
        return jnp.concatenate(
            [m["can_act"][..., None], m["type"], m["move"], m["harvest"],
             m["ret"], m["produce_dir"], m["produce_type"], m["attack"]],
            axis=-1).astype(jnp.int32)

    # ------------------------------------------------------------------
    def dones(self, state: State) -> jax.Array:
        """Per-reward-function done flags (RewardFunctionInterface.isDone):
        winloss -> gameover; resourcegather -> no resource left with
        stock > 0 (ResourceGatherRewardFunction); others always False."""
        eng = self.engine
        out = []
        T = self.cfg.engine.num_types
        IS_RES = jnp.asarray(self.cfg.engine.is_resource, bool)
        for name in self.cfg.reward_fns:
            if name == "winloss":
                out.append(eng.gameover(state))
            elif name == "resourcegather":
                t = jnp.clip(state.utype - 1, 0, T - 1)
                node = (state.utype > 0) & make_lookup(
                    self.cfg.engine.is_resource, bool)(t)
                out.append(~jnp.any(node & (state.carried > 0)))
            else:
                out.append(jnp.asarray(False))
        return jnp.stack(out)

    # ------------------------------------------------------------------
    # rewards (ai/reward/*; computed like the Java clients: from the decoded
    # PlayerAction of this tick + the pre/post states)

    def _rewards(self, pre: State, cand: Candidates, player,
                 after: State) -> jax.Array:
        cfg = self.cfg
        me = jnp.int32(player)
        acted = (cand.atype >= 0) & (pre.owner == me) & (pre.utype > 0)
        out = []
        for name in cfg.reward_fns:
            out.append(self._reward_one(name, pre, cand, acted, me, after))
        return jnp.stack(out)

    def _reward_one(self, name, pre, cand, acted, me, after):
        cfg = self.cfg
        eng = self.engine
        if name == "winloss":
            over = eng.gameover(after)
            return jnp.where(over,
                             jnp.where(eng.winner(after) == me, 1.0, -1.0),
                             0.0)
        if name == "resourcegather":
            n = jnp.sum(acted & ((cand.atype == HARVEST)
                                 | (cand.atype == RETURN)))
            return n.astype(jnp.float32)
        if name == "produceworker":
            n = jnp.sum(acted & (cand.atype == PRODUCE)
                        & (cand.aptype == cfg.worker_id))
            return n.astype(jnp.float32)
        if name == "producebuilding":
            n = jnp.sum(acted & (cand.atype == PRODUCE)
                        & ((cand.aptype == cfg.base_id)
                           | (cand.aptype == cfg.barracks_id)))
            return n.astype(jnp.float32)
        if name == "producecombat":
            n = jnp.sum(acted & (cand.atype == PRODUCE)
                        & ((cand.aptype == cfg.light_id)
                           | (cand.aptype == cfg.heavy_id)
                           | (cand.aptype == cfg.ranged_id)))
            return n.astype(jnp.float32)
        if name == "attack":
            # AttackRewardFunction: +1 per attack aimed at an enemy-occupied
            # cell, -1 at an own-occupied cell (pre-step board).  Target
            # offsets are bounded by the attack range: dense box scan.
            H, W = self.h, self.w
            R = self.cfg.engine.max_range
            xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            dxp = cand.atx - xs
            dyp = cand.aty - ys
            atk = acted & (cand.atype == ATTACK)
            pos = jnp.int32(0)
            neg = jnp.int32(0)
            for oy in range(-R, R + 1):
                for ox in range(-R, R + 1):
                    if ox * ox + oy * oy > R * R:
                        continue
                    sel = atk & (dxp == ox) & (dyp == oy)
                    occ = K._shift(pre.utype > 0, -ox, -oy, fill=False)
                    own = K._shift(pre.owner, -ox, -oy, fill=-1)
                    pos = pos + jnp.sum(sel & occ & (own == 1 - me))
                    neg = neg + jnp.sum(sel & occ & (own == me))
            return (pos - neg).astype(jnp.float32)
        if name in ("closertoenemybase", "closertoenemyunit"):
            return self._closer_reward(name, pre, after, me)
        raise ValueError(f"unknown reward fn {name!r}")

    def _closer_reward(self, name, pre, after, me):
        cfg = self.cfg
        H, W = self.h, self.w
        xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

        def min_dist(state, bx, by, has_target):
            mobile = ((state.utype > 0) & (state.owner == me)
                      & ((state.utype - 1 == cfg.worker_id)
                         | (state.utype - 1 == cfg.light_id)
                         | (state.utype - 1 == cfg.heavy_id)
                         | (state.utype - 1 == cfg.ranged_id)))
            d = jnp.sqrt((xs - bx) ** 2 + (ys - by) ** 2)
            return jnp.min(jnp.where(mobile, d, jnp.inf))

        if name == "closertoenemybase":
            tgt = (pre.utype - 1 == cfg.base_id) & (pre.owner == 1 - me)
        else:
            tgt = (pre.utype > 0) & (pre.owner == 1 - me)
        has = jnp.any(tgt)
        # first target in row-major order (Java breaks on first in list
        # order; equal when there is a single enemy base, the common case)
        idx = jnp.argmax(tgt.reshape(-1))
        bx = (idx % W).astype(jnp.float32)
        by = (idx // W).astype(jnp.float32)
        d_old = min_dist(pre, bx, by, has)
        d_new = min_dist(after, bx, by, has)
        r = jnp.where(jnp.isfinite(d_old) & jnp.isfinite(d_new),
                      d_old - d_new, 0.0)
        return jnp.where(has, r, 0.0)
