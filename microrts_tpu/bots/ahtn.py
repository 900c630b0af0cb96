"""Adversarial HTN planning (AHTN) over lisp-defined task networks.

TPU re-design of ai/ahtn/ (SURVEY.md §2.4; Ontañón & Buro, IJCAI'15
"Adversarial Hierarchical-Task Network Planning for Complete Information
Games"): game play = minimax over pairs of HTN DECOMPOSITIONS — each
player's move in the search tree is a choice of method for a pending
task; fully decomposed plans bottom out in unit-level operators and the
game simulates forward between decision points
(AHTNAI.java:60-130, ai/ahtn/planner/PlannerBestFirst*.java).

Domains are lisp files in the same defdomain spirit as the reference's
``data/ahtn/microrts-ahtn-definition-*.lisp`` (shipped analogs:
``assets/ahtn/microrts-ahtn-{portfolio,low-level}.lisp``).  Subset
syntax::

    (defdomain NAME (
      (:method M-NAME (TASK ARGS...) [:pre COND] :tasks (SUBTASK ...))
      ...))

``SUBTASK`` is either a compound task ``(task args...)`` decomposed
recursively, or a primitive operator ``(!train ...)`` ``(!build ...)``
``(!harvest n)`` ``(!attack filter target)`` ``(!idle filter)`` that
compiles to the dense script DSL (synth/dsl.py) — so a fully decomposed
plan is a jittable program, method variables (``?x``) bind by positional
unification against the task instance, and preconditions are the DSL's
dense conditions evaluated on the live state.

TPU shape of the adversarial search: the reference interleaves
decomposition and minimax in a host recursion over cloned GameStates.
Here ALL fully-decomposed plans of the root task are enumerated up front
(the decomposition tree is static — game-state-dependent choices enter
through preconditions, which become applicability masks), and one
vmapped K_max x K_min playout matrix evaluates every plan pair from the
current state; maximin over applicable rows picks the plan
(= alpha-beta over the same two-ply choice tree, no pruning needed since
the matrix is one fused launch).  Documented divergences: plan
enumeration is bounded (``max_plans``); simulation horizon is a fixed
``step_playout`` instead of "until the next choice point"; re-planning
every tick plays the role of plan monitoring/repair.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.evaluation import simple_sqrt_eval3
from ..synth.dsl import (Attack, Build, CanAfford, Cond, EnemyInRange,
                         Harvest, Idle, NAllyOfType, Train,
                         compile_program)
from .portfolio import _playout_two

# ---- s-expression reader ------------------------------------------------


def parse_sexp(text: str):
    """Minimal s-expression parser (the LispParser analog,
    ai/ahtn/domain/LispParser/)."""
    # strip ;; comments
    lines = [ln.split(";")[0] for ln in text.splitlines()]
    toks = "\n".join(lines).replace("(", " ( ").replace(")", " ) ").split()

    def read(i):
        if toks[i] == "(":
            out = []
            i += 1
            while toks[i] != ")":
                node, i = read(i)
                out.append(node)
            return out, i + 1
        tok = toks[i]
        try:
            return int(tok), i + 1
        except ValueError:
            return tok, i + 1

    node, i = read(0)
    assert i == len(toks), "trailing tokens in domain file"
    return node


@dataclasses.dataclass
class Method:
    name: str
    task: Tuple            # (head, arg-patterns...)
    pre: Optional[list]    # sexp or None
    tasks: List[list]      # subtask sexps


@dataclasses.dataclass
class Domain:
    name: str
    methods: List[Method]

    def methods_for(self, head: str):
        return [m for m in self.methods if m.task[0] == head]


def load_domain(path: str) -> Domain:
    sexp = parse_sexp(open(path).read())
    assert sexp[0] == "defdomain", "expected (defdomain NAME (...))"
    name, body = sexp[1], sexp[2]
    methods = []
    for entry in body:
        assert entry[0] == ":method", entry
        mname, task = entry[1], tuple(entry[2])
        pre, tasks = None, None
        i = 3
        while i < len(entry):
            if entry[i] == ":pre":
                pre = entry[i + 1]
                i += 2
            elif entry[i] == ":tasks":
                tasks = entry[i + 1]
                i += 2
            else:
                raise ValueError(f"unknown method key {entry[i]}")
        methods.append(Method(mname, task, pre, tasks or []))
    return Domain(name, methods)


# ---- decomposition ------------------------------------------------------

_PRIMS = {"!train", "!build", "!harvest", "!attack", "!idle"}


def _subst(x, binding: Dict[str, object]):
    if isinstance(x, str) and x.startswith("?"):
        if x not in binding:
            raise ValueError(f"unbound variable {x}")
        return binding[x]
    if isinstance(x, list):
        return [_subst(e, binding) for e in x]
    return x


def _unify(pattern: Tuple, instance: Tuple) -> Optional[Dict[str, object]]:
    """Positional unification of a method's task pattern against a task
    instance; variables (?x) bind, constants must match."""
    if len(pattern) != len(instance) or pattern[0] != instance[0]:
        return None
    binding: Dict[str, object] = {}
    for p, v in zip(pattern[1:], instance[1:]):
        if isinstance(p, str) and p.startswith("?"):
            binding[p] = v
        elif p != v:
            return None
    return binding


def _prim_to_command(p: list):
    head = p[0]
    if head == "!train":
        return Train(str(p[1]), str(p[2]), int(p[3]))
    if head == "!build":
        return Build(str(p[1]), int(p[2]))
    if head == "!harvest":
        return Harvest(int(p[1]))
    if head == "!attack":
        return Attack(str(p[1]), str(p[2]))
    if head == "!idle":
        return Idle(str(p[1]))
    raise ValueError(f"unknown operator {head}")


def _cond_from_sexp(c: list) -> Cond:
    head = c[0]
    if head == "n-ally-of-type":
        return NAllyOfType(str(c[1]), int(c[2]))
    if head == "enemy-in-range":
        return EnemyInRange(int(c[1]))
    if head == "can-afford":
        return CanAfford(str(c[1]))
    raise ValueError(f"unknown condition {head}")


@dataclasses.dataclass
class PlanChoice:
    """One fully decomposed plan: commands + the preconditions of every
    method chosen along the decomposition path (all must hold for the
    plan to be applicable) + the path itself (for reporting)."""
    commands: Tuple
    pres: Tuple[Cond, ...]
    path: Tuple[str, ...]


def enumerate_plans(domain: Domain, root: Tuple = ("destroy-player",),
                    max_plans: int = 64, max_depth: int = 12
                    ) -> List[PlanChoice]:
    """All full decompositions of ``root`` (bounded): the static
    enumeration of the reference planner's choice tree."""
    out: List[PlanChoice] = []

    def expand(tasks: List[Tuple], cmds: tuple, pres: tuple,
               path: tuple, depth: int):
        if len(out) >= max_plans or depth > max_depth:
            return
        if not tasks:
            out.append(PlanChoice(cmds, pres, path))
            return
        head, rest = tasks[0], tasks[1:]
        if head[0] in _PRIMS:
            expand(rest, cmds + (_prim_to_command(list(head)),), pres,
                   path, depth)
            return
        matched = False
        for m in domain.methods_for(head[0]):
            binding = _unify(m.task, head)
            if binding is None:
                continue
            matched = True
            sub = [tuple(_subst(list(t), binding)) for t in m.tasks]
            new_pres = pres
            if m.pre is not None:
                new_pres = pres + (_cond_from_sexp(
                    _subst(list(m.pre), binding)),)
            expand(list(sub) + list(rest), cmds, new_pres,
                   path + (m.name,), depth + 1)
        if not matched:
            raise ValueError(f"no method for task {head}")

    expand([root], (), (), (), 0)
    return out


# ---- the adversarial bot ------------------------------------------------

def _default_domain_path() -> str:
    import os
    return os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "assets", "ahtn", "microrts-ahtn-portfolio.lisp")


def ahtn_bot(env: GridnetEnv, domain: Optional[Union[str, Domain]] = None,
             step_playout: int = 100, max_plans: int = 16,
             eval_fn=None):
    """AHTN (AHTNAI.java): minimax over decomposition pairs.

    Every tick: evaluate the K x K matrix of (my plan, their plan)
    playouts of ``step_playout`` ticks from the current state; rows whose
    preconditions fail are masked out; play the maximin plan's first-tick
    action."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    if domain is None:
        domain = _default_domain_path()
    if isinstance(domain, str):
        domain = load_domain(domain)
    plans = enumerate_plans(domain, max_plans=max_plans)
    K = len(plans)
    assert K >= 1, "domain produced no plans"
    bots = [compile_program(env, p.commands) for p in plans]
    branches = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in bots]
    playout = _playout_two(env, step_playout, eval_fn)

    # build the dense applicability check once (conditions are DSL conds)
    from ..synth.dsl import compile_program as _cp  # noqa: F401

    def applicable_mask(state, player):
        from ..engine.kernel import make_lookup
        T = ecfg.num_types
        me = jnp.int32(player)
        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        mine = exists & (state.owner == me)
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        lk_stock = make_lookup(ecfg.is_stockpile, bool)
        my_base = mine & lk_stock(t)
        passable = (state.terrain == 0) & ~exists
        from ..ops.fields import distance_field
        d_base = distance_field(my_base, passable, env.h + env.w)
        balance = jnp.where(me == 1, state.resources[1],
                            state.resources[0])
        cfg = env.cfg

        def one(c: Cond):
            if isinstance(c, NAllyOfType):
                tid = getattr(cfg, f"{c.unit.lower()}_id", -1)
                if tid < 0:
                    return jnp.bool_(False)
                return jnp.sum(mine & (t == tid)) >= c.k
            if isinstance(c, EnemyInRange):
                return jnp.any(enemy & (d_base <= c.r))
            if isinstance(c, CanAfford):
                tid = getattr(cfg, f"{c.unit.lower()}_id", -1)
                if tid < 0:
                    return jnp.bool_(False)
                return balance >= ecfg.cost[tid]
            raise TypeError(c)

        rows = []
        for p in plans:
            ok = jnp.bool_(True)
            for c in p.pres:
                ok = ok & one(c)
            rows.append(ok)
        return jnp.stack(rows)                      # [K]

    def bot(state: State, player, key):
        p = jnp.int32(player)

        def pair_value(i, j, k):
            me = lambda s, kk: jax.lax.switch(i, branches, s, p, kk)
            op = lambda s, kk: jax.lax.switch(j, branches, s, 1 - p, kk)
            return playout(state, p, me, op, k)

        key, km, ka = jax.random.split(key, 3)
        ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
        keys = jax.random.split(km, K * K).reshape(K, K, -1)
        scores = jax.vmap(jax.vmap(pair_value))(ii, jj, keys)
        app_me = applicable_mask(state, player)          # [K]
        app_op = applicable_mask(state, 1 - p)
        # opponent min over ITS applicable plans; me max over mine
        col_ok = app_op[None, :]
        row_min = jnp.min(jnp.where(col_ok, scores, jnp.inf), axis=1)
        row_min = jnp.where(jnp.any(col_ok), row_min,
                            jnp.mean(scores, axis=1))
        best = jnp.argmax(jnp.where(app_me, row_min, -jnp.inf))
        best = jnp.where(jnp.any(app_me), best, 0)
        return jax.lax.switch(best, branches, state, p, ka)

    return bot
