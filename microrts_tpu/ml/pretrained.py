"""Import + dense TPU inference for the reference's PRETRAINED Bayes models.

The reference ships trained ``BayesianModelByUnitTypeWithDefaultModel`` XML
files (data/bayesianmodels/pretrained/ActionInterdependenceModel-*.xml):
one ``ActionInterdependenceModel`` per unit type plus a default model.
This module parses those exact files and evaluates them densely on device:

* **Label space.** The Java Y catalog is deterministic
  (BayesianModel.generateAllPossibleUnitActions, BayesianModel.java:144-172):
  NONE, 4 MOVE, 4 HARVEST, 4 RETURN, 4 x producible-type PRODUCE, then the
  attack disc (0 < dx^2+dy^2 <= R^2, dx-major).  ``java_catalog_to_arms``
  maps every Y index onto our dense arm catalog (ops/arms.py); the
  produce-section width is inferred from Ysize (the shipped files were
  trained with all 7 types producible -> Ysize 69).
* **Features.** ``compute_features_java`` reproduces
  FeatureGeneratorSimple.java:21-120 exactly — including its quirks:
  carried resources are UNCLIPPED, neutral units (resources) are encoded
  as *enemies* (3+T+type, :92-98), and empty in-bounds cells distinguish
  free / reserved-by-in-flight-move-or-produce / wall (0/1/2, :100-113).
* **Prediction.** ActionInterdependenceModel.predictDistribution
  (:228-323): prior (stored as Laplace-normalized probabilities) x
  per-feature Laplace CPDs (counts, beta=1, unseen value -> 1/Ysize) x the
  action-TYPE interdependence factor P(legal(type j) | selected type i) =
  (S[i,j]+1)/(C[i]+2) over legal types j != i (consider_action_types
  default true, individual-actions false, :46-47), then the calibration
  power 1/((1-c) + n_factors*c) and normalization over the unit's legal
  actions.  All of it is one-hot matmuls over [H, W] planes — no gathers.

``pretrained_bayes_bot`` plays the model directly
(UnitActionProbabilityDistributionAI analog); ``make_prior_fn`` feeds it
to InformedNaiveMCTS (bots/treesearch.py).
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import kernel as K
from ..engine.types import (ATTACK, HARVEST, MOVE, NONE, PRODUCE, RETURN,
                            EngineConfig, State)
from ..ops.arms import ArmSpace, arm_masks, arm_space, arms_to_action, \
    sample_arms

N_ACTION_TYPES = 6   # UnitAction.NUMBER_OF_ACTION_TYPES

# Java direction loop order in generateAllPossibleUnitActions:
# {UP, RIGHT, DOWN, LEFT} = parameters 0..3 — identical to our dir ids.


def _attack_disc(max_range: int) -> List[Tuple[int, int]]:
    """(ox, oy) offsets in the Java catalog order (ox-major,
    BayesianModel.java:164-172)."""
    out = []
    for ox in range(-max_range, max_range + 1):
        for oy in range(-max_range, max_range + 1):
            d = ox * ox + oy * oy
            if 0 < d <= max_range * max_range:
                out.append((ox, oy))
    return out


def java_catalog_to_arms(cfg: EngineConfig, sp: ArmSpace,
                         ysize: int) -> np.ndarray:
    """int32 [Ysize] Java Y index -> our arm id (-1 = unrepresentable).

    The produce section is 4 * P entries; P is inferred from Ysize.  The
    shipped pretrained files have P = num_types (historically every type
    had a non-empty producedBy); freshly-generated catalogs have P =
    len(producible).  Both lay produce out d-major over the type list.
    """
    T = cfg.num_types
    disc = _attack_disc(cfg.max_range)
    P = (ysize - 13 - len(disc)) // 4
    if 13 + 4 * P + len(disc) != ysize:
        raise ValueError(f"cannot lay out Ysize={ysize} "
                         f"(T={T}, disc={len(disc)})")
    if P == T:
        prod_types = list(range(T))
    else:
        prod_types = [t for t in range(T) if any(
            cfg.produces[p][t] for p in range(T))]
        if len(prod_types) != P:
            raise ValueError(f"produce section {P} matches neither all "
                             f"{T} types nor {len(prod_types)} producible")
    m = np.full(ysize, -1, np.int32)
    m[0] = 0                                   # NONE
    for d in range(4):
        m[1 + d] = 1 + d                       # MOVE
        m[5 + d] = 5 + d                       # HARVEST
        m[9 + d] = 9 + d                       # RETURN
    i = 13
    for d in range(4):
        for t in prod_types:
            m[i] = 13 + d * T + t
            i += 1
    R = (sp.diam - 1) // 2
    for (ox, oy) in disc:
        m[i] = sp.attack_base + (R + oy) * sp.diam + (R + ox)
        i += 1
    return m


def arm_action_types(sp: ArmSpace) -> np.ndarray:
    """int32 [A]: UnitAction type id of every arm."""
    T = sp.num_types
    ty = np.zeros(sp.n_arms, np.int32)
    ty[0] = NONE
    ty[1:5] = MOVE
    ty[5:9] = HARVEST
    ty[9:13] = RETURN
    ty[13:13 + 4 * T] = PRODUCE
    ty[sp.attack_base:] = ATTACK
    return ty


@dataclasses.dataclass
class _RawModel:
    """One parsed ActionInterdependenceModel (Java index space)."""
    ysize: int
    calibration: float
    xsizes: List[int]
    selected: List[bool]
    prior: np.ndarray             # [Ysize] probabilities
    cpds: List[np.ndarray]        # per feature: [Ysize, Xj] counts
    type_counts: np.ndarray       # [6] actiontypes_allowed_counts_prior
    type_pairs: np.ndarray        # [6, 6] selected_allowed_actiontype_prior


def _floats(el) -> np.ndarray:
    return np.asarray([float(t) for t in el.text.split()])


def _parse_aim(el) -> _RawModel:
    # every shipped pretrained file uses ESTIMATION_LAPLACE (=2,
    # BayesianModel.java:27); the COUNTS variant is not implemented here
    assert int(el.get("estimationMethod")) == 2, el.get("estimationMethod")
    ysize = int(el.get("Ysize"))
    nfeat = int(el.get("nfeatures"))
    cal = float(el.get("calibrationFactor"))
    xsizes = [int(t) for t in el.find("Xsizes").text.split()][:nfeat]
    prior = _floats(el.find("priorDistribution"))
    sf = el.find("selectedFeatures")
    selected = ([t == "true" for t in sf.text.split()][:nfeat]
                if sf is not None and sf.text and sf.text.strip()
                else [True] * nfeat)
    cpds = []
    for cpd in el.findall("DiscreteCPD"):
        xv = int(cpd.get("Xvalues"))     # = Ysize (rows)
        yv = int(cpd.get("Yvalues"))     # = feature cardinality (cols)
        vals = np.asarray([float(t) for t in cpd.text.split()])
        cpds.append(vals.reshape(xv, yv))
    tc_el = el.find("actiontypes_allowed_counts_prior")
    tp_el = el.find("selected_allowed_actiontype_prior")
    tc = (_floats(tc_el) if tc_el is not None
          else np.zeros(N_ACTION_TYPES))
    tp = (_floats(tp_el).reshape(N_ACTION_TYPES, N_ACTION_TYPES)
          if tp_el is not None
          else np.zeros((N_ACTION_TYPES, N_ACTION_TYPES)))
    assert len(cpds) == nfeat and len(prior) == ysize
    return _RawModel(ysize, cal, xsizes, selected, prior, cpds, tc, tp)


@dataclasses.dataclass
class PretrainedBayes:
    """Per-unit-type AIM models remapped onto our arm space and stacked
    [T, ...] for one-hot dispatch by the acting unit's type."""
    cfg: EngineConfig
    sp: ArmSpace
    log_prior: jnp.ndarray        # [T, A]
    log_cpds: List[jnp.ndarray]   # per feature: [T, A, S_j]
    log_tf: jnp.ndarray           # [T, 6, 6] log((S+1)/(C+2))
    nf_base: jnp.ndarray          # [T] 1 + n selected features
    calibration: jnp.ndarray      # [T]
    arm_type: jnp.ndarray         # [A] action type of each arm
    feature_sizes: Tuple[int, ...]


# static per-feature plane cardinalities of compute_features_java
def java_feature_sizes(cfg: EngineConfig) -> Tuple[int, ...]:
    occ = 3 + 2 * cfg.num_types
    carry_cap = 8        # unclipped in Java; capped statically here —
    # any value >= a model's stored cardinality predicts 1/Ysize anyway
    return (carry_cap, 8, 8, 2, occ, occ, occ, occ)


def load_pretrained(path: str, env) -> PretrainedBayes:
    """Parse a pretrained BayesianModelByUnitTypeWithDefaultModel XML and
    remap every contained model onto our arm catalog."""
    cfg = env.cfg.engine
    sp = arm_space(env)
    A = sp.n_arms
    root = ET.parse(path).getroot()
    assert root.tag == "BayesianModelByUnitTypeWithDefaultModel", root.tag

    by_type: Dict[int, _RawModel] = {}
    for ut in root.findall("UnitType"):
        by_type[int(ut.get("ID"))] = _parse_aim(
            ut.find("ActionInterdependenceModel"))
    default = _parse_aim(
        root.find("defaultModel").find("ActionInterdependenceModel"))

    sizes = java_feature_sizes(cfg)
    T = cfg.num_types
    nfeat = len(sizes)
    EPS = 1e-30

    def remap(raw: _RawModel):
        jmap = java_catalog_to_arms(cfg, sp, raw.ysize)
        prior = np.full(A, EPS)
        for j, a in enumerate(jmap):
            if a >= 0:
                prior[a] = max(raw.prior[j], EPS)
        logcpds = []
        for f in range(nfeat):
            counts, stored = raw.cpds[f], raw.cpds[f].shape[1]
            tab = np.full((A, sizes[f]), np.log(1.0 / raw.ysize))
            if raw.selected[f]:
                row_tot = counts.sum(1, keepdims=True)
                lap = (counts + 1.0) / (row_tot + stored)  # beta=1 Laplace
                ours = np.zeros((A, stored))
                for j, a in enumerate(jmap):
                    if a >= 0:
                        ours[a] = lap[j]
                ncols = min(stored, sizes[f])
                tab[:, :ncols] = np.log(np.maximum(ours[:, :ncols], EPS))
            else:
                tab[:] = 0.0          # feature not selected: factor 1
            logcpds.append(tab)
        ltf = np.log((raw.type_pairs + 1.0)
                     / (raw.type_counts[:, None] + 2.0))
        nf = 1.0 + sum(raw.selected)
        return np.log(prior), logcpds, ltf, nf, raw.calibration

    stacks = [remap(by_type.get(t, default)) for t in range(T)]
    return PretrainedBayes(
        cfg=cfg,
        sp=sp,
        log_prior=jnp.asarray(np.stack([s[0] for s in stacks])),
        log_cpds=[jnp.asarray(np.stack([s[1][f] for s in stacks]))
                  for f in range(nfeat)],
        log_tf=jnp.asarray(np.stack([s[2] for s in stacks])),
        nf_base=jnp.asarray(np.stack([s[3] for s in stacks]),
                            jnp.float32),
        calibration=jnp.asarray(np.stack([s[4] for s in stacks]),
                                jnp.float32),
        arm_type=jnp.asarray(arm_action_types(sp)),
        feature_sizes=sizes)


def _reserved_plane(state: State) -> jax.Array:
    """Cells occupied by an in-flight MOVE/PRODUCE target (the complement
    of GameState.free, GameState.java:191-207)."""
    inflight = (state.busy & ((state.atype == MOVE)
                              | (state.atype == PRODUCE)))
    res = jnp.zeros_like(inflight)
    for d in range(4):
        res = res | K.push(inflight & (state.aparam == d), d, fill=False)
    return res


def compute_features_java(state: State, player, cfg: EngineConfig,
                          sizes: Tuple[int, ...]) -> jax.Array:
    """int32 [H, W, 8]: FeatureGeneratorSimple.java:21-120 exactly (valid
    at cells holding a unit of ``player``; garbage elsewhere)."""
    T = cfg.num_types
    me = jnp.int32(player)
    t = jnp.clip(state.utype - 1, 0, T - 1)
    exists = state.utype > 0
    mine = exists & (state.owner == me)
    other = exists & ~mine        # enemies AND neutrals (:92-98)
    friendly = exists & (state.owner >= 0) & (state.owner == me)
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

    # player==-1 neutrals excluded from both centroids (:37-48)
    enemy_real = exists & (state.owner >= 0) & (state.owner != me)
    from .bayes import _barracks_like
    barr = jnp.zeros((H, W), bool)
    for b in _barracks_like(cfg):
        barr = barr | (friendly & (t == b))
    have_barr = jnp.any(barr).astype(jnp.int32)

    reserved = _reserved_plane(state)
    occ_feats = []
    for (xo, yo) in ((-2, 0), (0, -2), (2, 0), (0, 2)):
        # Java reads the cell at (x - xo, y - yo) (:87-89):
        # _shift(p, xo, yo) puts p[y - yo, x - xo] at (y, x)
        src = lambda p, fill: K._shift(p, xo, yo, fill=fill)
        s_friendly = src(friendly, False)
        s_other = src(other, False)
        s_t = src(t, 0)
        s_wall = src(state.terrain != 0, 0) != 0
        s_oob = src(jnp.zeros((H, W), jnp.int32), 1) != 0
        s_resv = src(reserved, False)
        f = jnp.where(s_friendly, 3 + s_t,
                      jnp.where(s_other, 3 + T + s_t,
                                jnp.where(s_oob | s_wall, 2,
                                          jnp.where(s_resv, 1, 0))))
        occ_feats.append(f.astype(jnp.int32))

    return jnp.stack([
        jnp.clip(state.carried, 0, sizes[0] - 1),
        centroid_dir(friendly),
        centroid_dir(enemy_real),
        jnp.full((H, W), have_barr),
        *occ_feats,
    ], axis=-1).astype(jnp.int32)


def predict_arm_logits(pm: PretrainedBayes, state: State, player,
                       legal_arms: jax.Array) -> jax.Array:
    """float32 [H, W, A] calibrated log-scores over legal arms
    (AIM.predictDistribution:228-323, pre-normalization)."""
    cfg_T = pm.log_prior.shape[0]
    feats = compute_features_java(state, player, pm.cfg, pm.feature_sizes)
    t = jnp.clip(state.utype - 1, 0, cfg_T - 1)
    oh_t = (t[..., None]
            == jnp.arange(cfg_T)[None, None, :]).astype(jnp.float32)

    logd = jnp.einsum("hwt,ta->hwa", oh_t, pm.log_prior)
    for f, table in enumerate(pm.log_cpds):
        Sf = table.shape[-1]
        oh_v = (feats[..., f, None]
                == jnp.arange(Sf)[None, None, :]).astype(jnp.float32)
        logd = logd + jnp.einsum("hws,hwt,tas->hwa", oh_v, oh_t, table)

    # action-type interdependence over the unit's LEGAL action types
    ty_oh = (pm.arm_type[:, None]
             == jnp.arange(N_ACTION_TYPES)[None, :]).astype(jnp.float32)
    lt = (jnp.einsum("hwa,aj->hwj", legal_arms.astype(jnp.float32), ty_oh)
          > 0).astype(jnp.float32)                      # [H, W, 6]
    tf_cell = jnp.einsum("hwt,tij->hwij", oh_t, pm.log_tf)
    m_all = jnp.einsum("hwij,hwj->hwi", tf_cell, lt)    # sum over legal j
    diag = jnp.einsum("hwii->hwi", tf_cell)
    contrib_ty = m_all - diag * lt                      # exclude j == i
    logd = logd + jnp.einsum("hwi,ai->hwa", contrib_ty, ty_oh)

    n_legal_ty = jnp.sum(lt, axis=-1)                   # [H, W]
    nf = (jnp.einsum("hwt,t->hw", oh_t, pm.nf_base)
          + jnp.maximum(n_legal_ty - 1.0, 0.0))
    c = jnp.einsum("hwt,t->hw", oh_t, pm.calibration)
    expo = 1.0 / ((1.0 - c) + nf * c)
    return logd * expo[..., None]


def pretrained_bayes_bot(env, path_or_model, greedy: bool = False):
    """UnitActionProbabilityDistributionAI over a pretrained model: every
    acting unit samples (or argmaxes) its calibrated distribution filtered
    to its legal arms (BayesianModel.filterByPossibleActionIndexes)."""
    pm = (path_or_model if isinstance(path_or_model, PretrainedBayes)
          else load_pretrained(path_or_model, env))
    sp = pm.sp

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        la = arm_masks(sp, m)
        logits = predict_arm_logits(pm, state, player, la)
        if greedy:
            arm = jnp.argmax(jnp.where(la, logits, -jnp.inf), -1)
            arm = jnp.where(m["can_act"], arm, -1).astype(jnp.int32)
        else:
            probs = jnp.where(la, jnp.exp(
                logits - jnp.max(jnp.where(la, logits, -jnp.inf), -1,
                                 keepdims=True)), 0.0)
            arm = sample_arms(sp, key, probs, m["can_act"])
        return arms_to_action(sp, arm)

    return bot


def make_prior_fn(env, path_or_model):
    """(state, player, legal_arms) -> [H, W, A] probabilities for
    InformedNaiveMCTS's per-unit exploration bias
    (InformedNaiveMCTSNode.java:66-84, 216)."""
    pm = (path_or_model if isinstance(path_or_model, PretrainedBayes)
          else load_pretrained(path_or_model, env))

    def prior_fn(state, player, legal_arms):
        logits = predict_arm_logits(pm, state, player, legal_arms)
        p = jnp.where(legal_arms, jnp.exp(
            logits - jnp.max(jnp.where(legal_arms, logits, -jnp.inf), -1,
                             keepdims=True)), 0.0)
        tot = jnp.sum(p, -1, keepdims=True)
        uni = legal_arms.astype(jnp.float32) / jnp.maximum(
            jnp.sum(legal_arms, -1, keepdims=True), 1)
        return jnp.where(tot > 0, p / jnp.maximum(tot, 1e-30), uni)

    return prior_fn
