"""On-device scripted bots.

TPU-native re-designs of the reference's baseline and rush AIs (SURVEY.md
§2.3): every bot is a pure jittable function
``bot(state, player, key) -> int32[H, W, 7]`` producing gridnet action
tensors that are fed through the env's decode (the same path a Java
PlayerAction takes through issueSafe), so bots compose with vmap'd rollouts
and live entirely on device — replacing the host-side Java bot objects of
ai/PassiveAI.java, ai/RandomBiasedAI.java:25-60, and
ai/abstraction/{Worker,Light,Heavy,Ranged}Rush.java.

Rush-bot movement uses multi-source BFS distance fields (ops/fields.py) in
place of per-unit A*; target selection ("attack closest enemy",
WorkerRush.java:98-120) is realized by descending the distance field of the
whole enemy set, which reaches the nearest enemy by construction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..engine import kernel as K
from ..engine.kernel import make_lookup
from ..engine.types import ATTACK, HARVEST, MOVE, PRODUCE, RETURN, State
from ..env.gridnet import GridnetEnv
from ..ops.fields import descend_direction, distance_field


def passive_bot(env: GridnetEnv):
    """PassiveAI (ai/PassiveAI.java:28-55): never acts."""
    def bot(state: State, player, key):
        return jnp.zeros((env.h, env.w, 7), jnp.int32)
    return bot


def random_bot(env: GridnetEnv, bias: float = 1.0):
    """RandomAI (bias=1) / RandomBiasedAI (bias=5: attack, harvest and
    return weighted 5x, RandomBiasedAI.java:25-60).  Samples one legal
    action per unit from the env masks; cumulative consistency is enforced
    downstream by the decode, like PlayerActionGenerator.getRandom.

    Sampling is TWO uniforms per cell + unrolled integer k-th-legal-bit
    selection (no per-arm gumbel planes, no log/exp): the weighted type
    draw is a 6-entry threshold walk, the param draw is uniform over the
    chosen class's legal set.  Identical distribution to masked
    categoricals at ~1/50th the RNG traffic — this bot is the playout
    policy inside every search bot and the bench actor, so it IS the hot
    path."""
    H, W = env.h, env.w
    T = env.cfg.engine.num_types
    D = 2 * env.cfg.engine.max_range + 1
    tw = (1.0, 1.0, bias, bias, 1.0, bias)

    def kth_legal(L, j):
        """Index of the (j+1)-th True along the last axis of bool
        L [H, W, K] (j int32 [H, W]); 0 when out of range."""
        K = L.shape[-1]
        cnt = jnp.zeros(L.shape[:-1], jnp.int32)
        idx = jnp.zeros(L.shape[:-1], jnp.int32)
        for k in range(K):
            hit = L[..., k] & (cnt == j)
            idx = jnp.where(hit, k, idx)
            cnt = cnt + L[..., k]
        return idx

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        u = jax.random.uniform(key, (H, W, 2))
        tm = m["type"].astype(bool)

        # weighted type draw: threshold walk over the 6 classes
        w = [jnp.where(tm[..., i], tw[i], 0.0) for i in range(6)]
        tot = sum(w)
        x = u[..., 0] * tot
        acc = jnp.zeros((H, W))
        at = jnp.zeros((H, W), jnp.int32)
        chosen = jnp.zeros((H, W), bool)
        for i in range(6):
            acc = acc + w[i]
            hit = ~chosen & (x < acc)
            at = jnp.where(hit, i, at)
            chosen = chosen | hit

        # uniform param draw within the chosen class (one shared uniform;
        # only the chosen class's pick is ever read)
        def pick(L):
            L = L.astype(bool)
            n = jnp.sum(L, -1)
            j = jnp.minimum((u[..., 1] * n).astype(jnp.int32),
                            jnp.maximum(n - 1, 0))
            return kth_legal(L, j)

        mv = pick(m["move"])
        hv = pick(m["harvest"])
        rt = pick(m["ret"])
        pj = pick(m["produce_pair"].reshape(H, W, -1))
        pd, pt = pj // T, pj % T
        ak = pick(m["attack"])
        out = jnp.stack([at, mv, hv, rt, pd, pt, ak], axis=-1)
        return jnp.where(m["can_act"][..., None], out, 0).astype(jnp.int32)

    return bot


def random_biased_single_unit_bot(env: GridnetEnv, bias: float = 5.0):
    """RandomBiasedSingleUnitAI (ai/RandomBiasedSingleUnitAI.java:76-110):
    ONE uniformly-chosen idle own unit acts per call (biased draw like
    RandomBiasedAI); every other unit idles."""
    inner = random_bot(env, bias)

    def bot(state: State, player, key):
        k0, k1 = jax.random.split(key)
        a = inner(state, player, k0)
        m = env.engine.legal_masks(state, player)
        r = jax.random.uniform(k1, m["can_act"].shape)
        score = jnp.where(m["can_act"], r, -1.0)
        flat = jnp.argmax(score.reshape(-1))
        chosen = (jnp.arange(score.size).reshape(score.shape) == flat)
        return jnp.where((chosen & m["can_act"])[..., None], a, 0)

    return bot


@dataclasses.dataclass(frozen=True)
class RushSpec:
    """Behavior spec covering the whole scripted-bot variant family
    (ai/abstraction/*.java).  Defaults express plain WorkerRush; the other
    fields add the deltas of the defense / economy / ++ / cRush variants:

    - ``combat_type``: which type the barracks trains; "Mixed" trains the
      first affordable of Light > Ranged > Heavy (EconomyMilitaryRush
      .java:179-206's affordability ladder);
    - ``n_harvesters``: harvest crew size; -1 = every worker harvests
      (EconomyRush.java:291-323, CRush_V1.java:383-415);
    - ``defense_frac``: > 0 makes fighters engage only when the nearest
      enemy OR the own base is within ``H * defense_frac`` of the unit
      (WorkerDefense.java:117-143's H/2 standoff; distances here are BFS
      path distances rather than Java's Manhattan — documented
      approximation);
    - ``rebuild_base``: a worker rebuilds the base when none exists
      (WorkerRushPlusPlus.java:161-168, EconomyRush.java:253-264);
    - ``max_workers``: cap on worker training (EconomyRush qtdWorkLim=4;
      0 = unlimited);
    - ``expand``: a worker expands to a second base near the closest
      resource that has no base around, once a barracks stands and only
      one base is owned (ai/puppet/BasicConfigurableScript.java:279-307's
      EXPAND choice point; "no base around" here = BFS distance from own
      bases > ``EXPAND_RADIUS``, vs Java's radius-10 unit scan).
    """
    combat_type: str = "Worker"   # Worker | Light | Heavy | Ranged | Mixed
    n_harvesters: int = 1
    defense_frac: float = 0.0
    rebuild_base: bool = False
    max_workers: int = 0
    expand: bool = False


def rush_bot(env: GridnetEnv, spec: RushSpec = RushSpec()):
    """WorkerRush / LightRush / HeavyRush / RangedRush
    (ai/abstraction/WorkerRush.java:63-204 and siblings) plus the variant
    family via ``RushSpec``:
      - base trains Workers while affordable (capped by ``max_workers``);
      - (non-worker rushes) a worker builds a Barracks once affordable,
        and the Barracks trains the combat type;
      - the first ``n_harvesters`` workers run the harvest loop
        (Harvest.java:72-114: harvest adjacent / return adjacent / walk);
      - every other combat-capable unit attack-moves to the nearest enemy
        (gated by the ``defense_frac`` standoff for the defense family).
    """
    cfg = env.cfg
    ecfg = cfg.engine
    H, W, T = env.h, env.w, ecfg.num_types
    R = ecfg.max_range
    D = 2 * R + 1
    COST = tuple(ecfg.cost)
    lk_atk = make_lookup(ecfg.can_attack, bool)
    lk_harv = make_lookup(ecfg.can_harvest, bool)
    lk_res = make_lookup(ecfg.is_resource, bool)
    lk_stock = make_lookup(ecfg.is_stockpile, bool)
    lk_range = make_lookup(ecfg.attack_range)
    mixed = spec.combat_type == "Mixed"
    combat_id = -1 if mixed else getattr(cfg, f"{spec.combat_type.lower()}_id")
    need_barracks = spec.combat_type != "Worker" and cfg.barracks_id >= 0
    all_harvest = spec.n_harvesters < 0
    iters = H + W

    def bot(state: State, player, key):
        me = jnp.int32(player)
        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        mine = exists & (state.owner == me)
        idle = mine & ~state.busy
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        resource = exists & lk_res(t)
        my_base = mine & lk_stock(t)
        my_barracks = mine & (t == cfg.barracks_id) if need_barracks \
            else jnp.zeros_like(mine)

        passable = (state.terrain == 0) & ~exists
        free_n = jnp.stack([K.pull(passable, d, fill=False)
                            for d in range(4)], -1)
        d_enemy = distance_field(enemy, passable, iters)
        d_res = distance_field(resource, passable, iters)
        d_base = distance_field(my_base, passable, iters)

        balance = jnp.where(me == 1, state.resources[1],
                            state.resources[0])

        out = jnp.zeros((H, W, 7), jnp.int32)

        # ---- base: train workers (WorkerRush.baseBehavior), optionally
        # capped at max_workers (EconomyRush.java:153-158 qtdWorkLim)
        worker = mine & lk_harv(t)
        train_w = (idle & my_base & (cfg.worker_id >= 0)
                   & (balance >= COST[max(cfg.worker_id, 0)])
                   & jnp.any(free_n, -1))
        if spec.max_workers > 0:
            train_w &= jnp.sum(worker) < spec.max_workers
        tdir = jnp.argmax(free_n, -1).astype(jnp.int32)
        out = _set(out, train_w, PRODUCE, pdir=tdir, ptype=cfg.worker_id)

        # ---- barracks: train the combat type ("Mixed": first affordable
        # of Light > Ranged > Heavy, EconomyMilitaryRush.java:179-206)
        if need_barracks:
            if mixed:
                aff = [(tid, balance >= COST[tid])
                       for tid in (cfg.light_id, cfg.ranged_id,
                                   cfg.heavy_id) if tid >= 0]
                ctype = jnp.int32(aff[-1][0])
                can_aff = jnp.zeros((), bool)
                for tid, ok in reversed(aff):
                    ctype = jnp.where(ok, tid, ctype)
                    can_aff = can_aff | ok
                train_c = idle & my_barracks & can_aff & jnp.any(free_n, -1)
            else:
                ctype = jnp.int32(combat_id)
                train_c = (idle & my_barracks
                           & (balance >= COST[max(combat_id, 0)])
                           & jnp.any(free_n, -1))
            out = _set(out, train_c, PRODUCE, pdir=tdir, ptype=ctype)

        # ---- base rebuild: a worker rebuilds a lost base
        # (WorkerRushPlusPlus.java:161-168)
        harv_rank = _rank_by_uid(worker, state.uid)
        build_base = jnp.zeros_like(worker)
        if spec.rebuild_base and cfg.base_id >= 0:
            base_pend = (~jnp.any(my_base)
                         & (balance >= COST[cfg.base_id]))
            build_base = (idle & worker & (harv_rank == 0) & base_pend
                          & jnp.any(free_n, -1))
            out = _set(out, build_base, PRODUCE, pdir=tdir,
                       ptype=cfg.base_id)

        # ---- harvesters: lowest-uid workers run the harvest loop
        is_harv = worker if all_harvest \
            else worker & (harv_rank < spec.n_harvesters)
        hu = idle & is_harv & ~build_base
        adj_res = jnp.stack([K.pull(resource, d, fill=False)
                             for d in range(4)], -1)
        adj_base = jnp.stack([K.pull(my_base, d, fill=False)
                              for d in range(4)], -1)
        carrying = state.carried > 0
        # carrying: return if adjacent else walk to base
        do_ret = hu & carrying & jnp.any(adj_base, -1)
        out = _set(out, do_ret, RETURN,
                   rdir=jnp.argmax(adj_base, -1).astype(jnp.int32))
        walk_b = hu & carrying & ~jnp.any(adj_base, -1)
        mdir_b = descend_direction(d_base, free_n)
        out = _set(out, walk_b & (mdir_b >= 0), MOVE, mdir=mdir_b)
        # empty: harvest if adjacent else walk to resource
        do_hv = hu & ~carrying & jnp.any(adj_res, -1)
        out = _set(out, do_hv, HARVEST,
                   hdir=jnp.argmax(adj_res, -1).astype(jnp.int32))
        walk_r = hu & ~carrying & ~jnp.any(adj_res, -1)
        mdir_r = descend_direction(d_res, free_n)
        out = _set(out, walk_r & (mdir_r >= 0), MOVE, mdir=mdir_r)

        # ---- builder: first idle worker (after harvesters) builds barracks
        # (when every worker harvests, the oldest one interrupts its
        # harvest to build, EconomyRush.java:262-268's freeWorkers pop)
        if need_barracks:
            builder_rank = jnp.int32(0 if all_harvest
                                     else spec.n_harvesters)
            no_barracks = ~jnp.any(my_barracks)
            build = (idle & worker & (harv_rank == builder_rank)
                     & no_barracks & (balance >= COST[max(cfg.barracks_id, 0)])
                     & jnp.any(free_n, -1))
            out = _set(out, build, PRODUCE, pdir=tdir, ptype=cfg.barracks_id)
            fighter_min_rank = spec.n_harvesters + 1
        else:
            fighter_min_rank = spec.n_harvesters
        if all_harvest:
            fighter_min_rank = 1 << 30   # harvesting workers never fight

        # ---- expansion: a worker builds a second base next to the
        # nearest "free" resource (BasicConfigurableScript.java:279-307:
        # EXPAND choice, gated on a standing barracks and <= 1 base)
        if spec.expand and cfg.base_id >= 0:
            EXPAND_RADIUS = 8   # BASE_RESOURCE_RADIUS (:46)
            far_res = resource & (d_base > EXPAND_RADIUS)
            d_far = distance_field(far_res, passable, iters)
            want_exp = (jnp.any(my_barracks) & (jnp.sum(my_base) <= 1)
                        & jnp.any(far_res)
                        & (balance >= COST[cfg.base_id]))
            exp_rank = jnp.int32(0 if all_harvest else spec.n_harvesters)
            expander = (idle & worker & (harv_rank == exp_rank)
                        & want_exp & ~build_base)
            adj_far = jnp.stack([K.pull(far_res, d, fill=False)
                                 for d in range(4)], -1)
            exp_build = expander & jnp.any(adj_far, -1) \
                & jnp.any(free_n, -1)
            out = _set(out, exp_build, PRODUCE, pdir=tdir,
                       ptype=cfg.base_id)
            mdir_x = descend_direction(d_far, free_n)
            exp_walk = expander & ~exp_build & (mdir_x >= 0)
            out = _set(out, exp_walk, MOVE, mdir=mdir_x)

        # ---- fighters: attack in range else move toward nearest enemy
        fighter = (idle & mine & lk_atk(t)
                   & (~worker | (harv_rank >= fighter_min_rank)))
        # defense family standoff (WorkerDefense.java:117-143): engage only
        # when the nearest enemy or the own base is within H*frac of the
        # unit; otherwise stand ground (Java's attack(u, null) = idle).
        # A unit's own cell is occupied (not passable), so the field is INF
        # there — its true distance is 1 + the min over its 4 neighbors.
        if spec.defense_frac > 0.0:
            from ..engine.types import INF
            d_en_here = jnp.min(jnp.stack(
                [K.pull(d_enemy, d, fill=INF) for d in range(4)]), 0) + 1
            d_ba_here = jnp.min(jnp.stack(
                [K.pull(d_base, d, fill=INF) for d in range(4)]), 0) + 1
            thresh = jnp.int32(H * spec.defense_frac)
            fighter &= (d_en_here < thresh) | (d_ba_here < thresh)
        rng = lk_range(t)
        # nearest in-range enemy: scan the (2R+1)^2 disc, closest-first
        best = jnp.full((H, W), 0, jnp.int32)
        found = jnp.zeros((H, W), bool)
        offs = sorted(((dx * dx + dy * dy, dx, dy)
                       for dy in range(-R, R + 1) for dx in range(-R, R + 1)),
                      key=lambda z: z[0])
        for d2, dx, dy in offs:
            if d2 == 0:
                continue
            e_at = K._shift(enemy, -dx, -dy, fill=False) & (d2 <= rng * rng)
            rel = (R + dy) * D + (R + dx)
            best = jnp.where(~found & e_at, rel, best)
            found = found | e_at
        do_atk = fighter & found
        out = _set(out, do_atk, ATTACK, rel=best)
        mdir_e = descend_direction(d_enemy, free_n)
        out = _set(out, fighter & ~found & (mdir_e >= 0), MOVE, mdir=mdir_e)

        return out

    return bot


def _rank_by_uid(mask: jax.Array, uid: jax.Array) -> jax.Array:
    """Rank of each masked cell by ascending unit ID (0 = oldest unit)."""
    key = jnp.where(mask, uid, jnp.int32(2 ** 30)).reshape(-1)
    order = jnp.argsort(key)
    rank = jnp.zeros_like(key).at[order].set(
        jnp.arange(key.size, dtype=jnp.int32))
    return rank.reshape(mask.shape)


def _set(out, mask, atype, mdir=None, hdir=None, rdir=None, pdir=None,
         ptype=None, rel=None):
    def put(col, val):
        return out.at[..., col].set(jnp.where(mask, val, out[..., col]))
    out = put(0, jnp.where(mask, atype, out[..., 0]))
    if mdir is not None:
        out = put(1, jnp.where(mask, mdir, out[..., 1]))
    if hdir is not None:
        out = put(2, jnp.where(mask, hdir, out[..., 2]))
    if rdir is not None:
        out = put(3, jnp.where(mask, rdir, out[..., 3]))
    if pdir is not None:
        out = put(4, jnp.where(mask, pdir, out[..., 4]))
    if ptype is not None:
        out = put(5, jnp.where(mask, ptype, out[..., 5]))
    if rel is not None:
        out = put(6, jnp.where(mask, rel, out[..., 6]))
    return out


def worker_rush(env):  # WorkerRush.java
    return rush_bot(env, RushSpec("Worker"))


def light_rush(env):   # LightRush.java
    return rush_bot(env, RushSpec("Light"))


def heavy_rush(env):   # HeavyRush.java
    return rush_bot(env, RushSpec("Heavy"))


def ranged_rush(env):  # RangedRush.java
    return rush_bot(env, RushSpec("Ranged"))


# ---- defense family (ai/abstraction/{Worker,Light,Heavy,Ranged}Defense
# .java): rush behavior + the H/2 engage standoff -------------------------
def worker_defense(env):
    return rush_bot(env, RushSpec("Worker", defense_frac=0.5))


def light_defense(env):
    return rush_bot(env, RushSpec("Light", defense_frac=0.5))


def heavy_defense(env):
    return rush_bot(env, RushSpec("Heavy", defense_frac=0.5))


def ranged_defense(env):
    return rush_bot(env, RushSpec("Ranged", defense_frac=0.5))


# ---- economy family -----------------------------------------------------
def worker_rush_plus_plus(env):
    """WorkerRushPlusPlus.java: WorkerRush + base rebuild when lost."""
    return rush_bot(env, RushSpec("Worker", rebuild_base=True))


def economy_rush(env):
    """EconomyRush.java:48-60: every worker harvests, the worker count is
    capped (qtdWorkLim), a barracks goes up and trains the military ladder,
    lost bases are rebuilt."""
    return rush_bot(env, RushSpec("Mixed", n_harvesters=-1, max_workers=4,
                                  rebuild_base=True))


def economy_military_rush(env):
    """EconomyMilitaryRush.java: economy ramp + affordability-ladder
    military (:179-206)."""
    return rush_bot(env, RushSpec("Mixed", n_harvesters=-1, max_workers=4,
                                  rebuild_base=True))


def emr_deterministico(env):
    """EMRDeterministico.java: EconomyMilitaryRush with the deterministic
    qtdWorkLim=4 (:153-160).  Our bots are deterministic throughout, so
    this coincides with economy_military_rush by construction."""
    return rush_bot(env, RushSpec("Mixed", n_harvesters=-1, max_workers=4,
                                  rebuild_base=True))


def economy_rush_burster(env):
    """EconomyRushBurster.java: economy ramp, then military burst; Java
    picks the trained type uniformly (:182), here the deterministic
    affordability ladder stands in (documented approximation)."""
    return rush_bot(env, RushSpec("Mixed", n_harvesters=-1, max_workers=6,
                                  rebuild_base=True))


def simple_economy_rush(env):
    """SimpleEconomyRush.java: qtdWorkLim = 3 per base (:145)."""
    return rush_bot(env, RushSpec("Mixed", n_harvesters=-1, max_workers=3,
                                  rebuild_base=True))


def crush_v1(env):
    """CRush_V1.java (ai/abstraction/cRush): full-harvest economy into
    ranged production with base rebuild (:383-415)."""
    return rush_bot(env, RushSpec("Ranged", n_harvesters=-1, max_workers=5,
                                  rebuild_base=True))


def crush_v2(env):
    """CRush_V2.java: lean worker line (nbases+1, :154) funding constant
    ranged production; rebuilds lost bases."""
    return rush_bot(env, RushSpec("Ranged", n_harvesters=2,
                                  rebuild_base=True))


def po_wrap(env: GridnetEnv, bot):
    """Partial-observability wrapper: the bot sees only its fog-of-war view
    (ai/abstraction/partialobservability/PO*Rush.java pattern — same policy,
    applied to the PartiallyObservableGameState)."""
    from ..engine.fog import po_state

    def wrapped(state: State, player, key):
        return bot(po_state(state, player, env.cfg.engine), player, key)

    return wrapped


def po_worker_rush(env):   # POWorkerRush.java
    return po_wrap(env, worker_rush(env))


def po_light_rush(env):    # POLightRush.java
    return po_wrap(env, light_rush(env))


def po_heavy_rush(env):    # POHeavyRush.java
    return po_wrap(env, heavy_rush(env))


def po_ranged_rush(env):   # PORangedRush.java
    return po_wrap(env, ranged_rush(env))


def distribution_bot(env: GridnetEnv, type_weights):
    """UnitActionProbabilityDistributionAI (ai/stochastic/*): per-unit
    actions sampled with a learned/fixed weight per action TYPE (uniform
    over legal params within the type).  ``type_weights``: positive [6]
    (NONE, MOVE, HARVEST, RETURN, PRODUCE, ATTACK)."""
    inner = random_bot(env, 1.0)

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        w = jnp.asarray(type_weights, jnp.float32)
        tw = jnp.where(m["type"].astype(bool), w, 0.0)
        tw = jnp.where(tw.sum(-1, keepdims=True) > 0, tw,
                       jnp.ones_like(tw))
        k1, k2 = jax.random.split(key)
        at = jax.random.categorical(k1, jnp.log(tw + 1e-9), axis=-1)
        base = inner(state, player, k2)
        out = base.at[..., 0].set(jnp.where(m["can_act"], at, 0))
        return out

    return bot
