"""Bayesian unit-action models: train from traces, play as a stochastic AI.

TPU re-design of ai/machinelearning/bayes/ (SURVEY.md §2.4): the reference
learns per-unit naive-Bayes models over discrete features predicting the
unit's next UnitAction (CalibratedNaiveBayes.java:28-240, DiscreteCPD
count tables, FeatureGeneratorSimple.java:19-120), trains them from
recorded traces, and plays them through
UnitActionProbabilityDistributionAI (sampling the predicted distribution,
masked to legal actions).

TPU shape: the label space is the dense arm catalog (ops/arms.py) — the
exact analog of the reference's ``allPossibleActions`` index — so a model
is a prior [A] plus one count table [A, Xj] per feature, features are
computed as DENSE [H, W] planes (centroid-direction bins, neighborhood
occupancy via shifts), and prediction for every unit on the board is a
batch of one-hot matmuls: ``posterior[h,w,a] ∝ prior[a] * Π_j
cpd_j[a, x_j[h,w]]^c`` with calibration exponent ``c``
(CalibratedNaiveBayes.predictDistribution:223-260 — the reference notes
its own equation is "wrong" NB; the calibration exponent is kept, the
equation here is standard NB).

Features (FeatureGeneratorSimple.java:21-120, discretization matched):

0. carried resources, clipped to {0, 1, 2}
1. direction of the friendly centroid, 8 bins (atan2(dx, dy) + π/8)
2. direction of the enemy centroid, 8 bins
3. own barracks standing, {0, 1}
4-7. occupancy at offsets (−2,0) (0,−2) (2,0) (0,2):
   0 = empty, 1 = wall/out-of-bounds, 2+t = friendly type t,
   2+T+t = enemy type t
8. the unit's own type, {0..T−1}

Training consumes the same zipped-XML traces as the replay/parity
harness; ``fit_calibration`` line-searches the exponent like
calibrateProbabilities (CalibratedNaiveBayes.java:86-140).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import kernel as K
from ..engine.types import (ATTACK, HARVEST, MOVE, PRODUCE, RETURN,
                            EngineConfig, State)
from ..ops.arms import ArmSpace, arm_masks, arm_space, arms_to_action, \
    sample_arms

N_CARRY, N_DIR, N_BARR = 3, 8, 2
OFFS = ((-2, 0), (0, -2), (2, 0), (0, 2))   # xo/yo (FeatureGeneratorSimple)


def feature_sizes(cfg: EngineConfig) -> Tuple[int, ...]:
    T = cfg.num_types
    occ = 2 + 2 * T
    return (N_CARRY, N_DIR, N_DIR, N_BARR) + (occ,) * 4 + (T,)


def compute_features(state: State, player, cfg: EngineConfig) -> jax.Array:
    """int32 [H, W, 9] dense per-cell features (valid where a unit of
    ``player`` stands; other cells carry garbage and are never read)."""
    T = cfg.num_types
    me = jnp.int32(player)
    t = jnp.clip(state.utype - 1, 0, T - 1)
    exists = state.utype > 0
    mine = exists & (state.owner == me)
    enemy = exists & (state.owner >= 0) & (state.owner != me)
    H, W = state.utype.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)

    def centroid_dir(mask):
        n = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
        cx = jnp.sum(jnp.where(mask, xs, 0.0)) / n
        cy = jnp.sum(jnp.where(mask, ys, 0.0)) / n
        dx, dy = cx - xs, cy - ys
        ang = jnp.arctan2(dx, dy) + jnp.pi / 8.0   # Java: atan2(x, y)
        ang = jnp.where(ang < 0, ang + 2 * jnp.pi, ang)
        return jnp.clip((ang / (jnp.pi / 4.0)).astype(jnp.int32), 0, 7)

    barr_ids = _barracks_like(cfg)
    barracks_plane = jnp.zeros((H, W), bool)
    for b in barr_ids:
        barracks_plane = barracks_plane | (mine & (t == b))
    have_barr = jnp.any(barracks_plane).astype(jnp.int32)

    occ_feats = []
    for (xo, yo) in OFFS:
        # the value AT cell (x - xo, y - yo), read back at (x, y)
        # (FeatureGeneratorSimple.java:87-89; _shift(p, xo, yo) places
        # p[y - yo, x - xo] at (y, x))
        src_mine = K._shift(mine, xo, yo, fill=False)
        src_enemy = K._shift(enemy, xo, yo, fill=False)
        src_t = K._shift(t, xo, yo, fill=0)
        src_wall = K._shift(state.terrain != 0, xo, yo, fill=True)
        f = jnp.where(src_mine, 2 + src_t,
                      jnp.where(src_enemy, 2 + T + src_t,
                                jnp.where(src_wall, 1, 0)))
        occ_feats.append(f.astype(jnp.int32))

    return jnp.stack([
        jnp.clip(state.carried, 0, N_CARRY - 1),
        centroid_dir(mine),
        centroid_dir(enemy),
        jnp.full((H, W), have_barr),
        *occ_feats,
        t,
    ], axis=-1).astype(jnp.int32)


def _barracks_like(cfg: EngineConfig) -> List[int]:
    """Military-producing buildings (the "have barracks" feature,
    FeatureGeneratorSimple.java:43): immobile, non-stockpile producers."""
    out = []
    for i in range(cfg.num_types):
        if (not cfg.can_move[i] and not cfg.is_stockpile[i]
                and not cfg.is_resource[i] and any(cfg.produces[i])):
            out.append(i)
    return out


@dataclasses.dataclass
class NaiveBayesModel:
    """prior counts [A] + per-feature count tables [A, Xj] (Laplace+1 at
    predict), calibration exponent c (CalibratedNaiveBayes fields)."""
    prior: np.ndarray
    cpds: List[np.ndarray]
    calibration: float = 1.0

    def save(self, path: str) -> None:
        np.savez(path, prior=self.prior, calibration=self.calibration,
                 **{f"cpd{j}": c for j, c in enumerate(self.cpds)})

    @classmethod
    def load(cls, path: str) -> "NaiveBayesModel":
        z = np.load(path)
        cpds = [z[f"cpd{j}"] for j in range(len(z.files) - 2)]
        return cls(prior=z["prior"], cpds=cpds,
                   calibration=float(z["calibration"]))


def _labels_from_entry(entry, sp: ArmSpace, h: int, w: int,
                       player: int) -> np.ndarray:
    """int32 [H, W] arm label per acting cell of ``player``, -1 elsewhere
    (the y of TrainingInstance; AttackLocation becomes the relative
    window index like CalibratedNaiveBayes.calibrateProbabilities:96-99)."""
    R = (sp.diam - 1) // 2
    lab = np.full((h, w), -1, np.int32)
    by_id = {u.ID: u for u in entry.pgs.units}
    T = sp.num_types
    for uid, ua in entry.actions:
        u = by_id.get(uid)
        if u is None or u.player != player:
            continue
        if ua.type == MOVE:
            arm = 1 + ua.parameter
        elif ua.type == HARVEST:
            arm = 5 + ua.parameter
        elif ua.type == RETURN:
            arm = 9 + ua.parameter
        elif ua.type == PRODUCE:
            arm = 13 + ua.parameter * T + ua.unit_type
        elif ua.type == ATTACK:
            dx, dy = ua.x - u.x, ua.y - u.y
            if abs(dx) > R or abs(dy) > R:
                continue
            arm = sp.attack_base + (R + dy) * sp.diam + (R + dx)
        else:
            arm = 0
        lab[u.y, u.x] = arm
    return lab


def train_from_traces(env, trace_paths: Sequence[str],
                      calibrate: bool = False,
                      max_entries_per_trace: int = 10 ** 9
                      ) -> NaiveBayesModel:
    """Count-based NB training over recorded traces (the reference trains
    from the same zipped traces; CalibratedNaiveBayes.train:68-84)."""
    from ..engine.types import state_from_pgs
    from ..interop.trace import load_trace

    cfg = env.cfg.engine
    sp = arm_space(env)
    A = sp.n_arms
    sizes = feature_sizes(cfg)
    prior = np.zeros(A)
    cpds = [np.zeros((A, x)) for x in sizes]
    feats_j = jax.jit(lambda s, p: compute_features(s, p, cfg),
                      static_argnums=1)

    held: List[Tuple[np.ndarray, np.ndarray]] = []   # for calibration
    for path in trace_paths:
        trace = load_trace(path)
        for entry in trace.entries[:max_entries_per_trace]:
            if not entry.actions:
                continue
            st = state_from_pgs(entry.pgs.clone(), cfg, time=entry.time)
            for player in (0, 1):
                lab = _labels_from_entry(entry, sp, env.h, env.w, player)
                if (lab < 0).all():
                    continue
                f = np.asarray(feats_j(st, player))
                ys, xs = np.nonzero(lab >= 0)
                for y, x in zip(ys, xs):
                    a = lab[y, x]
                    prior[a] += 1
                    for j in range(len(sizes)):
                        cpds[j][a, f[y, x, j]] += 1
                    if calibrate:
                        held.append((f[y, x], a))

    model = NaiveBayesModel(prior=prior, cpds=cpds)
    if calibrate and held:
        model.calibration = fit_calibration(model, held)
    return model


def predict_log_posterior(model_arrays, feats: jax.Array, c) -> jax.Array:
    """log posterior [H, W, A] from feature planes [H, W, F].  One-hot
    matmul per feature (small Xj → MXU-friendly, no gathers)."""
    prior, cpds = model_arrays
    logp = jnp.log(prior + 1.0)[None, None, :] \
        - jnp.log(jnp.sum(prior + 1.0))
    for j, cpd in enumerate(cpds):
        Xj = cpd.shape[1]
        row_tot = jnp.sum(cpd + 1.0, axis=1, keepdims=True)
        logc = jnp.log(cpd + 1.0) - jnp.log(row_tot)      # [A, Xj]
        oh = (feats[..., j, None]
              == jnp.arange(Xj)[None, None, :]).astype(jnp.float32)
        logp = logp + c * jnp.einsum("hwx,ax->hwa", oh, logc)
    return logp


def bayes_bot(env, model: NaiveBayesModel, greedy: bool = False):
    """The UnitActionProbabilityDistributionAI analog: each unit samples
    (or argmaxes) the model's predicted distribution over its LEGAL arms
    (BayesianModel.predictDistribution + filterByPossibleActionIndexes)."""
    cfg = env.cfg.engine
    sp = arm_space(env)
    prior = jnp.asarray(model.prior, jnp.float32)
    cpds = [jnp.asarray(c, jnp.float32) for c in model.cpds]
    c = jnp.float32(model.calibration)

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        la = arm_masks(sp, m)
        feats = compute_features(state, player, cfg)
        logp = predict_log_posterior((prior, cpds), feats, c)
        if greedy:
            arm = jnp.argmax(jnp.where(la, logp, -jnp.inf), -1)
            arm = jnp.where(m["can_act"], arm, -1).astype(jnp.int32)
        else:
            probs = jnp.where(la, jnp.exp(
                logp - jnp.max(jnp.where(la, logp, -jnp.inf), -1,
                               keepdims=True)), 0.0)
            arm = sample_arms(sp, key, probs, m["can_act"])
        return arms_to_action(sp, arm)

    return bot


def fit_calibration(model: NaiveBayesModel,
                    held: List[Tuple[np.ndarray, int]]) -> float:
    """Line-search the exponent c maximizing held-out log-likelihood,
    stopping at the first decrease (calibrateProbabilities:86-140)."""
    feats = jnp.asarray(np.stack([f for f, _ in held]))     # [N, F]
    ys = np.asarray([a for _, a in held])
    prior = jnp.asarray(model.prior, jnp.float32)
    cpds = [jnp.asarray(cd, jnp.float32) for cd in model.cpds]

    def loglik(c):
        lp = predict_log_posterior(
            (prior, cpds), feats[:, None, :], jnp.float32(c))[:, 0, :]
        lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
        return float(jnp.sum(lp[jnp.arange(len(ys)), ys]))

    best_c, best_ll = 0.0, -np.inf
    for c in np.arange(0.0, 1.051, 0.05):
        ll = loglik(c)
        if ll > best_ll:
            best_c, best_ll = float(c), ll
        else:
            break
    return best_c
