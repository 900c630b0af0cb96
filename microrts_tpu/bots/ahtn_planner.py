"""Full adversarial HTN planner over the reference's SHOP-style domains.

Host-side re-implementation of ai/ahtn (AHTNAI.java:60-130;
planner/AdversarialBoundedDepthPlannerAlphaBeta.java;
domain/{Clause,MethodDecomposition,PredefinedPredicates,
PredefinedOperators,PredefinedFunctions}.java) able to consume the FIVE
shipped domain files verbatim (assets/ahtn/microrts-ahtn-definition-
*.lisp).  Planning is inherently symbolic (unification, backtracking,
recursion over a term database) so it runs on the host against the
validated oracle engine (refimpl.py — the same rules the device engine is
bit-exact against); game playouts/evaluations stay cheap host arithmetic.
The dense jittable AHTN (bots/ahtn.py, compiled plan matrices) remains
the batched-tournament path; THIS module is the parity path for the
reference's actual planner semantics.

Faithful pieces:

* SHOP-style lisp domains: ``(:operator (head) (pre))`` and
  ``(:method name (head) body)`` with ``:sequence`` / ``:parallel`` /
  ``:!condition`` (non-branching) / ``:condition`` / nested
  ``(:method (goal args))`` calls and ``?_`` anonymous variables;
* the full predicate vocabulary (PredefinedPredicates.java): unit/5,
  closest-unit-to (Manhattan argmin, first bind only), can-move/attack/
  harvest, can-produce, has-resources-to-produce (reserved resources
  subtracted), in-attack-range (squared Euclidean), in-harvest-range,
  in-return-range (adjacency), direction, free-building-position,
  free-producing-direction, next-available-unit (lowest ID above
  ``lastunit`` with no assignment), no-more-available-units, path,
  path-to-attack, ``=``, plus the ``neighbor-position`` function
  (PredefinedFunctions.java);
* clause evaluation = backtracking conjunction with lazily resolved
  subclauses (Clause.java:194-260), ``or`` in order, ``not`` as
  negation-as-failure;
* MethodDecomposition execution states and ``executionCycle``
  (MethodDecomposition.java:411-541) incl. the sequence/parallel status
  lattice (CHOICE_POINT/FAILURE dominate, then ACTION_ISSUE, then
  WAITING);
* operator execution (PredefinedOperators.java): durative per-unit
  actions issued to the simulated state; ``!move*`` re-issue one A* step
  per completion until in range; the 5-cycle operator timeout analog
  (``operatorExecutionTimeout``);
* the adversarial search (AdversarialBoundedDepthPlannerAlphaBeta):
  simulate-until-next-choice-point, choice points expanded per owner
  (method candidates in domain order x condition binding streams),
  alpha-beta over choice-point owners, leaves scored by
  playout-then-evaluate, iterative deepening on choice-point depth.

Documented divergences: depth counts CHOICE POINTS expanded (the Java
``operatorDepth`` counts operator-issue rounds — ours prunes the same
trees slightly earlier); the default leaf playout uses the host
RandomBiasedAI analog instead of WorkerRush (a WorkerRush host port is
not worth its weight — pass ``playout_policy`` to override); bindings
ride immutable dicts instead of a global trail.
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

from .. import refimpl as R
from ..engine.pgs import HostUnit, PhysicalGameState
from ..engine.utt import UnitTypeTable
from ..utils.assets import asset_path

# ---------------------------------------------------------------------
# terms: int | str symbol | Var | Fn

_ANON = 0


@dataclasses.dataclass(frozen=True)
class Var:
    name: str


@dataclasses.dataclass(frozen=True)
class Fn:
    """A function term (only ``neighbor-position`` exists,
    PredefinedFunctions.java)."""
    name: str
    args: tuple


def _to_param(x):
    global _ANON
    if isinstance(x, int):
        return x
    if isinstance(x, list):
        return Fn(str(x[0]), tuple(_to_param(a) for a in x[1:]))
    s = str(x)
    if s.startswith("?"):
        if s == "?_":           # each ?_ occurrence is independent
            _ANON += 1
            return Var(f"?_anon{_ANON}")
        return Var(s)
    try:
        return int(s)
    except ValueError:
        return s


def term_from_sexp(e) -> tuple:
    return (str(e[0]),) + tuple(_to_param(x) for x in e[1:])


def subst(p, binds: Dict[Var, object]):
    if isinstance(p, Var):
        v = binds.get(p, p)
        if v is not p and isinstance(v, (Var, Fn)):
            return subst(v, binds)
        return v
    if isinstance(p, Fn):
        return Fn(p.name, tuple(subst(a, binds) for a in p.args))
    return p


def subst_term(t: tuple, binds) -> tuple:
    return (t[0],) + tuple(subst(p, binds) for p in t[1:])


def resolve_fn(p, gs: R.GameState):
    """Evaluate function terms (neighbor-position pos dir -> pos')."""
    if isinstance(p, Fn):
        args = [resolve_fn(a, gs) for a in p.args]
        if p.name == "neighbor-position":
            pos, d = args
            if isinstance(pos, int) and isinstance(d, int):
                x = pos % gs.pgs.width + R.DIR_OFFSET_X[d]
                y = pos // gs.pgs.width + R.DIR_OFFSET_Y[d]
                return x + y * gs.pgs.width
            return p
        raise ValueError(f"unknown function {p.name}")
    return p


def _match1(p, value) -> Optional[Dict]:
    """Match one resolved parameter against a concrete value: variables
    bind, constants must equal (Parameter.match)."""
    if isinstance(p, Var):
        return {p: value}
    if isinstance(p, Fn):
        return None
    return {} if p == value else None


# ---------------------------------------------------------------------
# predicates (PredefinedPredicates.java) — generators of binding dicts


def _unit_rows(term, gs: R.GameState, binds) -> Iterator[Dict]:
    """(unit ?id ?typeName ?player ?resources ?pos) over list order."""
    ps = [subst(p, binds) for p in term[1:]]
    for u in gs.pgs.units:
        out: Dict = {}
        vals = (int(u.ID), gs.utt.unit_types[u.type_id].name, u.player,
                u.resources, u.x + u.y * gs.pgs.width)
        ok = True
        for p, v in zip(ps, vals):
            p2 = resolve_fn(subst(p, out), gs)
            m = _match1(p2, v)
            if m is None:
                ok = False
                break
            out.update(m)
        if ok:
            yield out


def _pred(term, gs: R.GameState, binds) -> Iterator[Dict]:
    head = term[0]
    ps = [resolve_fn(subst(p, binds), gs) for p in term[1:]]
    utt = gs.utt

    def type_by_name(n):
        for i, t in enumerate(utt.unit_types):
            if t.name == n:
                return i
        return None

    if head == "unit":
        yield from _unit_rows(term, gs, binds)
        return
    if head == "=":
        a, b = ps
        if isinstance(a, Var):
            if not (isinstance(b, Var) and a == b):
                yield {a: b}
            else:
                yield {}
            return
        if isinstance(b, Var):
            yield {b: a}
            return
        if a == b:
            yield {}
        return
    if head == "closest-unit-to":
        # Manhattan argmin over matching units; FIRST binding only
        if not isinstance(ps[0], int):
            return
        ref = gs.pgs.get_unit(ps[0])
        if ref is None:
            return
        best, bestd = None, None
        for u in gs.pgs.units:
            out: Dict = {}
            vals = (int(u.ID), utt.unit_types[u.type_id].name, u.player,
                    u.resources, u.x + u.y * gs.pgs.width)
            ok = True
            for p, v in zip(term[2:], vals):
                p2 = resolve_fn(subst(subst(p, binds), out), gs)
                m = _match1(p2, v)
                if m is None:
                    ok = False
                    break
                out.update(m)
            if not ok:
                continue
            d = abs(u.x - ref.x) + abs(u.y - ref.y)
            if best is None or d < bestd:
                best, bestd = out, d
        if best is not None:
            yield best
        return
    if head in ("can-move", "can-attack", "can-harvest"):
        tid = type_by_name(ps[0]) if isinstance(ps[0], str) else None
        if tid is not None:
            flag = {"can-move": utt.can_move, "can-attack": utt.can_attack,
                    "can-harvest": utt.can_harvest}[head][tid]
            if flag:
                yield {}
        return
    if head == "can-produce":
        # Java quirk preserved (PredefinedPredicates.java:274-324): the
        # const/const and var/const paths look up ut2 from P1's name, so
        # they can only succeed if a type produces ITSELF — i.e. never.
        p1, p2 = ps
        t1 = type_by_name(p1) if isinstance(p1, str) else None
        if t1 is not None:
            prods = [j for j in range(utt.num_types)
                     if utt.produces_mask[t1][j]]
            if isinstance(p2, Var):
                for j in prods:
                    yield {p2: utt.unit_types[j].name}
            elif isinstance(p2, str) and t1 in prods:
                yield {}      # self-producing type: unreachable in practice
        elif isinstance(p1, Var):
            if isinstance(p2, Var):
                for i in range(utt.num_types):
                    for j in range(utt.num_types):
                        if utt.produces_mask[i][j]:
                            yield {p1: utt.unit_types[i].name,
                                   p2: utt.unit_types[j].name}
            # var/const: Java resolves ut2 from p1 -> null -> no match
        return
    if head == "has-resources-to-produce":
        pl, tn = ps
        tid = type_by_name(tn) if isinstance(tn, str) else None
        if isinstance(pl, int) and tid is not None:
            reserved = 0
            for a in gs.unit_actions.values():
                if (a.action.type == R.TYPE_PRODUCE
                        and a.unit.player == pl):
                    reserved += int(utt.cost[a.action.unit_type])
            if gs.pgs.players[pl].resources - reserved >= int(utt.cost[tid]):
                yield {}
        return
    if head in ("in-attack-range", "in-harvest-range", "in-return-range"):
        if isinstance(ps[0], int) and isinstance(ps[1], int):
            u1 = gs.pgs.get_unit(ps[0])
            u2 = gs.pgs.get_unit(ps[1])
            if u1 is None or u2 is None:
                return
            if head == "in-attack-range":
                r2 = int(utt.attack_range[u1.type_id]) ** 2
            else:
                r2 = 1
            dx, dy = u1.x - u2.x, u1.y - u2.y
            if dx * dx + dy * dy <= r2:
                yield {}
        return
    if head == "direction":
        p = ps[0]
        if isinstance(p, int):
            if p in (0, 1, 2, 3):
                yield {}
        else:
            for d in range(4):
                yield {p: d}
        return
    if head == "free-building-position":
        if isinstance(ps[0], int):
            x, y = ps[0] % gs.pgs.width, ps[0] // gs.pgs.width
            if (0 <= x < gs.pgs.width and 0 <= y < gs.pgs.height
                    and gs.free_cell(x, y)):
                yield {}
        return
    if head == "free-producing-direction":
        if isinstance(ps[0], int):
            u1 = gs.pgs.get_unit(ps[0])
            if u1 is None:
                return
            p2 = ps[1]
            dirs = [p2] if isinstance(p2, int) else range(4)
            for d in dirs:
                x = u1.x + R.DIR_OFFSET_X[d]
                y = u1.y + R.DIR_OFFSET_Y[d]
                if (0 <= x < gs.pgs.width and 0 <= y < gs.pgs.height
                        and gs.free_cell(x, y)):
                    yield {p2: d} if isinstance(p2, Var) else {}
        return
    if head == "next-available-unit":
        lastu, pl, out = ps
        if (isinstance(lastu, int) and isinstance(pl, int)
                and isinstance(out, Var)):
            found = None
            for u in gs.pgs.units:
                if (u.player == pl and u.ID > lastu
                        and gs.get_assignment(u) is None):
                    if found is None or u.ID < found.ID:
                        found = u
            if found is not None:
                yield {out: int(found.ID)}
        return
    if head == "no-more-available-units":
        lastu, pl = ps
        if isinstance(lastu, int) and isinstance(pl, int):
            for u in gs.pgs.units:
                if (u.player == pl and u.ID > lastu
                        and gs.get_assignment(u) is None):
                    return
            yield {}
        return
    if head in ("path", "path-to-attack"):
        if isinstance(ps[0], int) and isinstance(ps[1], int):
            u1 = gs.pgs.get_unit(ps[0])
            u2 = gs.pgs.get_unit(ps[1])
            if u1 is None or u2 is None:
                return
            rng = (int(utt.attack_range[u1.type_id])
                   if head == "path-to-attack" else 1)
            if astar_step(gs, u1, u2.x + u2.y * gs.pgs.width, rng,
                          exists_only=True) is not None:
                yield {}
        return
    if head == "true":
        yield {}
        return
    raise ValueError(f"undefined predicate {head}")


# clauses: ('term', term) | ('and', [..]) | ('or', [..]) | ('not', c)
#          | ('true',) | ('false',)

def clause_from_sexp(e) -> tuple:
    head = str(e[0])
    if head == "and":
        return ("and", [clause_from_sexp(c) for c in e[1:]])
    if head == "or":
        return ("or", [clause_from_sexp(c) for c in e[1:]])
    if head == "not":
        return ("not", clause_from_sexp(e[1]))
    if head == "true":
        return ("true",)
    if head == "false":
        return ("false",)
    return ("term", term_from_sexp(e))


def match_clause(c: tuple, gs: R.GameState, binds: Dict) -> Iterator[Dict]:
    """Yield successive binding dicts (EXTENDING ``binds``) — the
    backtracking evaluation of Clause.firstMatch/nextMatch."""
    kind = c[0]
    if kind == "true":
        yield binds
        return
    if kind == "false":
        return
    if kind == "term":
        for m in _pred(c[1], gs, binds):
            out = dict(binds)
            out.update(m)
            yield out
        return
    if kind == "not":
        for _ in match_clause(c[1], gs, binds):
            return
        yield binds
        return
    if kind == "or":
        for sub in c[1]:
            yield from match_clause(sub, gs, binds)
        return
    if kind == "and":
        def rec(i, b):
            if i == len(c[1]):
                yield b
                return
            for b2 in match_clause(c[1][i], gs, b):
                yield from rec(i + 1, b2)
        yield from rec(0, binds)
        return
    raise ValueError(c)


# ---------------------------------------------------------------------
# host A* (AStarPathFinding.java:26-90, expansion order down/left/up/right)

def astar_step(gs: R.GameState, u: HostUnit, target_pos: int, rng: int,
               exists_only: bool = False,
               extra_blocked: Optional[set] = None):
    """First MOVE UnitAction of a shortest path taking ``u`` within
    squared-Euclidean... the Java uses range as max(dx,dy)<=? — it calls
    findPathToPositionInRange with Chebyshev-free semantics: a cell c is
    a goal when distance(c, target) <= range in SQUARED EUCLIDEAN form
    for attack (range^2) and adjacency for range 1; we use squared
    Euclidean uniformly.  Returns None when unreachable (or True/None
    under ``exists_only``)."""
    W, H = gs.pgs.width, gs.pgs.height
    tx, ty = target_pos % W, target_pos // W
    r2 = rng * rng          # rng=0: exact-cell path (pf.findPath)

    def is_goal(x, y):
        dx, dy = x - tx, y - ty
        return dx * dx + dy * dy <= r2

    if is_goal(u.x, u.y):
        return True if exists_only else None
    blocked = set(extra_blocked or ())
    for a in gs.unit_actions.values():
        if a.action.type in (R.TYPE_MOVE, R.TYPE_PRODUCE):
            d = a.action.parameter
            blocked.add((a.unit.x + R.DIR_OFFSET_X[d])
                        + (a.unit.y + R.DIR_OFFSET_Y[d]) * W)
    start = u.x + u.y * W
    came: Dict[int, int] = {start: -1}
    pq = [(abs(u.x - tx) + abs(u.y - ty), 0, start)]
    g: Dict[int, int] = {start: 0}
    while pq:
        _, gc, pos = heapq.heappop(pq)
        x, y = pos % W, pos // W
        if is_goal(x, y):
            # walk back to the first step
            while came[pos] != start and came[pos] != -1:
                pos = came[pos]
            if exists_only:
                return True
            d = {-W: R.DIRECTION_UP, 1: R.DIRECTION_RIGHT,
                 W: R.DIRECTION_DOWN, -1: R.DIRECTION_LEFT}[pos - start]
            return R.UnitAction(R.TYPE_MOVE, d)
        # expansion tie order down, left, up, right (:73-76); ONLY free
        # cells are traversable — including goal cells: the unit must be
        # able to STAND where the path ends (AStarPathFinding expands
        # over gs.free cells only)
        for d in (R.DIRECTION_DOWN, R.DIRECTION_LEFT, R.DIRECTION_UP,
                  R.DIRECTION_RIGHT):
            x2 = x + R.DIR_OFFSET_X[d]
            y2 = y + R.DIR_OFFSET_Y[d]
            if not (0 <= x2 < W and 0 <= y2 < H):
                continue
            pos2 = x2 + y2 * W
            if gs.pgs.get_terrain(x2, y2) != 0:
                continue
            if gs.pgs.get_unit_at(x2, y2) is not None:
                continue
            if pos2 in blocked:
                continue
            if pos2 in g and g[pos2] <= gc + 1:
                continue
            g[pos2] = gc + 1
            came[pos2] = pos
            heapq.heappush(pq, (gc + 1 + abs(x2 - tx) + abs(y2 - ty),
                                gc + 1, pos2))
    return None


# ---------------------------------------------------------------------
# domain parsing

@dataclasses.dataclass
class HTNMethod:
    name: str
    head: tuple               # (goal functor, params...)
    body: Optional[tuple]     # template node or None (empty method)


@dataclasses.dataclass
class Domain:
    name: str
    operators: Dict[str, tuple]          # name -> precondition clause
    methods: Dict[str, List[HTNMethod]]  # goal functor -> in domain order


def _node_from_sexp(e) -> tuple:
    """Template nodes: ('seq'|'par', [nodes]) | ('cond'|'ncond', clause)
    | ('op', term) | ('call', term) (MethodDecomposition.fromLispElement
    :149-199)."""
    head = str(e[0])
    if head == ":sequence":
        return ("seq", [_node_from_sexp(c) for c in e[1:]])
    if head == ":parallel":
        return ("par", [_node_from_sexp(c) for c in e[1:]])
    if head == ":condition":
        return ("cond", clause_from_sexp(e[1]))
    if head == ":!condition":
        return ("ncond", clause_from_sexp(e[1]))
    if head == ":operator":
        return ("op", term_from_sexp(e[1]))
    if head == ":method":
        return ("call", term_from_sexp(e[1]))
    raise ValueError(f"unknown decomposition element {head}")


def load_domain(path: str) -> Domain:
    from .ahtn import parse_sexp
    sexp = parse_sexp(open(path).read())
    assert str(sexp[0]) == "defdomain", "expected (defdomain NAME (...))"
    dom = Domain(str(sexp[1]), {}, {})
    for entry in sexp[2]:
        kind = str(entry[0])
        if kind == ":operator":
            t = term_from_sexp(entry[1])
            dom.operators[t[0]] = clause_from_sexp(entry[2]) \
                if len(entry) > 2 else ("true",)
        elif kind == ":method":
            name = str(entry[1])
            head = term_from_sexp(entry[2])
            body = _node_from_sexp(entry[3]) if len(entry) > 3 else None
            dom.methods.setdefault(head[0], []).append(
                HTNMethod(name, head, body))
        else:
            raise ValueError(f"unknown domain entry {kind}")
    return dom


def bundled_domains() -> List[str]:
    names = ["microrts-ahtn-definition-portfolio.lisp",
             "microrts-ahtn-definition-flexible-portfolio.lisp",
             "microrts-ahtn-definition-flexible-single-target-portfolio.lisp",
             "microrts-ahtn-definition-low-level.lisp",
             "microrts-ahtn-definition-lowest-level.lisp"]
    return [asset_path(f"ahtn/{n}") for n in names]


# ---------------------------------------------------------------------
# runtime decomposition (MethodDecomposition.java)

SUCCESS, FAILURE, ACTION_ISSUE, WAITING, CHOICE = range(5)


class MD:
    """Mutable decomposition node (MethodDecomposition.java:23-63)."""

    __slots__ = ("kind", "clause", "term", "method", "subs", "exec_state",
                 "op_state", "updated_term", "updated_cycle")

    def __init__(self, kind, clause=None, term=None, subs=None):
        self.kind = kind          # 'cond'|'ncond'|'op'|'call'|'seq'|'par'
        self.clause = clause
        self.term = term
        self.method: Optional[MD] = None   # expansion of a 'call'
        self.subs: List[MD] = subs or []
        self.exec_state = 0
        self.op_state = 0
        self.updated_term: Optional[tuple] = None
        self.updated_cycle = -1

    @classmethod
    def from_template(cls, node: tuple, binds: Dict) -> "MD":
        kind = node[0]
        if kind in ("seq", "par"):
            return cls(kind, subs=[cls.from_template(c, binds)
                                   for c in node[1]])
        if kind in ("cond", "ncond"):
            return cls(kind, clause=_subst_clause(node[1], binds))
        return cls(kind, term=subst_term(node[1], binds))

    def clone(self, track: Dict[int, "MD"]) -> "MD":
        c = MD(self.kind, self.clause, self.term)
        c.method = self.method.clone(track) if self.method else None
        c.subs = [s.clone(track) for s in self.subs]
        c.exec_state = self.exec_state
        c.op_state = self.op_state
        c.updated_term = self.updated_term
        c.updated_cycle = self.updated_cycle
        track[id(self)] = c
        return c

    def execution_cycle(self, actions: List["MD"], cps: List["MD"]) -> int:
        if self.kind in ("cond", "ncond"):
            if self.exec_state == 0:
                cps.append(self)
                return CHOICE
            return SUCCESS if self.exec_state == 1 else FAILURE
        if self.kind == "op":
            if self.exec_state == 0:
                actions.append(self)
                return ACTION_ISSUE
            return WAITING if self.exec_state == 1 else SUCCESS
        if self.kind == "call":
            if self.method is None:
                cps.append(self)
                return CHOICE
            return self.method.execution_cycle(actions, cps)
        if self.kind == "seq":
            while True:
                if self.exec_state >= len(self.subs):
                    return SUCCESS
                tmp = self.subs[self.exec_state].execution_cycle(
                    actions, cps)
                if tmp != SUCCESS:
                    return tmp
                self.exec_state += 1
        if self.kind == "par":
            all_ok, any_issue = True, False
            for s in self.subs:
                tmp = s.execution_cycle(actions, cps)
                if tmp == ACTION_ISSUE:
                    any_issue = True
                if tmp in (CHOICE, FAILURE):
                    return tmp
                if tmp != SUCCESS:
                    all_ok = False
            if all_ok:
                return SUCCESS
            return ACTION_ISSUE if any_issue else WAITING
        return SUCCESS

    def operator_list(self, out):
        """convertToOperatorList (:544-590): (cycle, term) pairs."""
        if self.kind == "op" and self.updated_term is not None:
            out.append((self.updated_cycle, self.updated_term))
        if self.kind == "call" and self.method is not None:
            self.method.operator_list(out)
        for s in self.subs:
            s.operator_list(out)
        return out


def _subst_clause(c: tuple, binds: Dict) -> tuple:
    kind = c[0]
    if kind == "term":
        return ("term", subst_term(c[1], binds))
    if kind in ("and", "or"):
        return (kind, [_subst_clause(x, binds) for x in c[1]])
    if kind == "not":
        return ("not", _subst_clause(c[1], binds))
    return c


# ---------------------------------------------------------------------
# operator execution (PredefinedOperators.java) on the refimpl oracle

def _emit(gs: R.GameState, pa, u: HostUnit, ua: R.UnitAction):
    """Issue directly (pa=None, the planner's simulated path) or collect
    into the frame PlayerAction (the live-game path) —
    PredefinedOperators.OperatorExecutor's dual contract."""
    if pa is None:
        gs.issue([(u, ua)])
    else:
        pa.append((u, ua))


def _adj_dir(u1: HostUnit, u2: HostUnit) -> Optional[int]:
    if u1.x == u2.x - 1 and u1.y == u2.y:
        return R.DIRECTION_RIGHT
    if u1.x == u2.x + 1 and u1.y == u2.y:
        return R.DIRECTION_LEFT
    if u1.y == u2.y - 1 and u1.x == u2.x:
        return R.DIRECTION_DOWN
    if u1.y == u2.y + 1 and u1.x == u2.x:
        return R.DIRECTION_UP
    return None


def exec_operator(md: MD, gs: R.GameState, pa=None) -> bool:
    """One execution step of an operator; True = complete
    (PredefinedOperators.execute; pa=None issues directly into ``gs``,
    otherwise actions collect into ``pa``)."""
    t = md.updated_term
    head = t[0]
    utt = gs.utt

    def unit(i):
        return gs.pgs.get_unit(t[i]) if isinstance(t[i], int) else None

    if head == "!wait":
        if md.op_state == 1:
            return (gs.time - md.updated_cycle) >= t[1]
        md.op_state = 1
        return False
    if head == "!wait-for-free-unit":
        for u in gs.pgs.units:
            if u.player == t[1] and gs.get_assignment(u) is None:
                return True
        return False
    if head == "!fill-with-idles":
        fills = [(u, R.UnitAction(R.TYPE_NONE, 10)) for u in gs.pgs.units
                 if u.player == t[1] and gs.get_assignment(u) is None]
        for u, ua in fills:
            if pa is None or all(u is not v for v, _ in pa):
                _emit(gs, pa, u, ua)
        return True
    if head == "!idle":
        u1 = unit(1)
        if u1 is None:
            return True
        if md.op_state == 1:
            return gs.get_assignment(u1) is None
        _emit(gs, pa, u1, R.UnitAction(R.TYPE_NONE, 10))
        md.op_state = 1
        return False
    if head == "!attack":
        u1 = unit(1)
        if u1 is None:
            return True
        if gs.get_assignment(u1) is not None:
            return False
        if md.op_state == 1:
            return gs.get_assignment(u1) is None
        u2 = unit(2)
        if u2 is None:
            return True
        _emit(gs, pa, u1, R.UnitAction(R.TYPE_ATTACK_LOCATION, -1,
                                        u2.x, u2.y))
        md.op_state = 1
        return False
    if head in ("!harvest", "!return"):
        u1 = unit(1)
        if u1 is None:
            return True
        if gs.get_assignment(u1) is not None:
            return False
        if md.op_state == 1:
            return gs.get_assignment(u1) is None
        u2 = unit(2)
        if u2 is None:
            return True
        d = _adj_dir(u1, u2)
        if d is not None:
            ty = R.TYPE_HARVEST if head == "!harvest" else R.TYPE_RETURN
            _emit(gs, pa, u1, R.UnitAction(ty, d))
        md.op_state = 1
        return False
    if head == "!produce":
        u1 = unit(1)
        if u1 is None:
            return True
        if gs.get_assignment(u1) is not None:
            return False
        if md.op_state == 1:
            return gs.get_assignment(u1) is None
        d, tname = t[2], t[3]
        tid = next((i for i, ty in enumerate(utt.unit_types)
                    if ty.name == tname), None)
        if tid is None:
            return True
        x = u1.x + R.DIR_OFFSET_X[d]
        y = u1.y + R.DIR_OFFSET_Y[d]
        reserved = 0
        for a in gs.unit_actions.values():
            if (a.action.type == R.TYPE_PRODUCE
                    and a.unit.player == u1.player):
                reserved += int(utt.cost[a.action.unit_type])
        if (0 <= x < gs.pgs.width and 0 <= y < gs.pgs.height
                and gs.free_cell(x, y)
                and gs.pgs.players[u1.player].resources - reserved
                >= int(utt.cost[tid])):
            _emit(gs, pa, u1, R.UnitAction(R.TYPE_PRODUCE, d,
                                            unit_type=tid))
            md.op_state = 1
        return False
    if head == "!move":
        u1 = unit(1)
        if u1 is None:
            return True
        if gs.get_assignment(u1) is not None:
            return False
        pos2 = resolve_fn(t[2], gs) if isinstance(t[2], Fn) else t[2]
        if not isinstance(pos2, int):
            return True
        ua = astar_step(gs, u1, pos2, 0)
        if ua is None or ua is True:
            return True
        _emit(gs, pa, u1, ua)
        return False
    if head in ("!move-into-attack-range", "!move-into-harvest-range",
                "!move-into-return-range"):
        u1 = unit(1)
        if u1 is None:
            return True
        if gs.get_assignment(u1) is not None:
            return False
        u2 = unit(2)
        if u2 is None:
            return True
        rng = (int(utt.attack_range[u1.type_id])
               if head == "!move-into-attack-range" else 1)
        ua = astar_step(gs, u1, u2.x + u2.y * gs.pgs.width, rng)
        if ua is True:
            return True        # already in range
        if ua is None:
            return True        # unreachable: give up (pf returns null)
        _emit(gs, pa, u1, ua)
        return False
    raise ValueError(f"unknown operator {head}")


# ---------------------------------------------------------------------
# host-side evaluation + playout (SimpleSqrtEvaluationFunction3 +
# RandomBiasedAI analogs over the oracle)

def host_sqrt_eval3(gs: R.GameState, maxplayer: int) -> float:
    """SimpleSqrtEvaluationFunction3 (incl. the Java INTEGER hp/maxHp
    division quirk, mirrored from ops/evaluation._sqrt_base_score)."""
    def base(player):
        s = gs.pgs.players[player].resources * 20.0
        any_mine = False
        for u in gs.pgs.units:
            if u.player != player:
                continue
            any_mine = True
            maxhp = max(int(gs.utt.hp[u.type_id]), 1)
            s += u.resources * 10.0
            s += 40.0 * int(gs.utt.cost[u.type_id]) * math.sqrt(
                u.hitpoints // maxhp)
        return (s if any_mine else 0.0), any_mine

    s1, _ = base(maxplayer)
    s2, _ = base(1 - maxplayer)
    if s1 + s2 == 0:
        return 0.5
    return 2.0 * s1 / (s1 + s2) - 1.0


def host_random_biased(gs: R.GameState, player: int, rng) -> None:
    """RandomBiasedAI.getAction issued directly (attack/harvest/return
    x5 weight, RandomBiasedAI.java:25-60)."""
    pa = []
    used = ([], [0, 0])
    for a in gs.unit_actions.values():
        ru = R.resource_usage(a.action, a.unit, gs.pgs, gs.utt)
        used[0].extend(ru[0])
        used[1][0] += ru[1][0]
        used[1][1] += ru[1][1]
    for u in list(gs.pgs.units):
        if u.player != player or gs.get_assignment(u) is not None:
            continue
        acts = gs.get_unit_actions(u)
        weights = [5.0 if a.type in (R.TYPE_ATTACK_LOCATION,
                                     R.TYPE_HARVEST, R.TYPE_RETURN)
                   else 1.0 for a in acts]
        tot = sum(weights)
        r = rng.random() * tot
        pick = acts[-1]
        for a, w in zip(acts, weights):
            r -= w
            if r <= 0:
                pick = a
                break
        ru = R.resource_usage(pick, u, gs.pgs, gs.utt)
        if R.usages_consistent(used, ru, gs.pgs.players):
            used[0].extend(ru[0])
            used[1][0] += ru[1][0]
            used[1][1] += ru[1][1]
            pa.append((u, pick))
        else:
            none = next(a for a in acts if a.type == R.TYPE_NONE)
            pa.append((u, none))
    if pa:
        gs.issue(pa)


def clone_gs(gs: R.GameState) -> R.GameState:
    """Deep game-state clone (GameState.clone): new units, re-keyed
    assignment map in insertion order."""
    pgs2 = PhysicalGameState(gs.pgs.width, gs.pgs.height,
                             gs.pgs.terrain.copy())
    for p in gs.pgs.players:
        pgs2.players.append(dataclasses.replace(p))
    umap = {}
    for u in gs.pgs.units:
        u2 = dataclasses.replace(u)
        pgs2.add_unit(u2)
        umap[id(u)] = u2
    gs2 = R.GameState(pgs2, gs.utt, next_id=gs.next_id)
    gs2.time = gs.time
    gs2.cancel_counter = gs.cancel_counter
    for a in gs.unit_actions.values():
        u2 = umap[id(a.unit)]
        gs2.unit_actions[id(u2)] = R.Assignment(
            u2, dataclasses.replace(a.action), a.time)
    return gs2


# ---------------------------------------------------------------------
# the adversarial bounded-depth planner

VICTORY = 1e5
OP_TIMEOUT = 1000   # operatorExecutionTimeout (planner :48)


@dataclasses.dataclass
class World:
    gs: R.GameState
    max_root: MD
    min_root: MD
    ops: Tuple[List[MD], List[MD]]   # operators being executed (max, min)
    binds: Dict
    oper_depth: int = 0
    last_issue_time: int = -1

    def clone(self, keep: Sequence[MD] = ()) -> Tuple["World", List[MD]]:
        track: Dict[int, MD] = {}
        mr = self.max_root.clone(track)
        nr = self.min_root.clone(track)
        w = World(clone_gs(self.gs), mr, nr,
                  ([track[id(m)] for m in self.ops[0]],
                   [track[id(m)] for m in self.ops[1]]),
                  dict(self.binds), self.oper_depth, self.last_issue_time)
        return w, [track[id(k)] for k in keep]


class Planner:
    """AdversarialBoundedDepthPlannerAlphaBeta, recursive formulation."""

    def __init__(self, dd: Domain, maxplayer: int, max_depth: int,
                 playout_lookahead: int = 100,
                 eval_fn: Callable = host_sqrt_eval3,
                 playout_policy: Optional[Callable] = host_random_biased,
                 max_playouts: int = 200, seed: int = 0):
        import random
        self.dd = dd
        self.maxplayer = maxplayer
        self.max_depth = max_depth
        self.lookahead = playout_lookahead
        self.eval_fn = eval_fn
        self.playout_policy = playout_policy
        self.max_playouts = max_playouts
        self.n_playouts = 0
        self.rename_ctr = 0
        self.rng = random.Random(seed)

    # -- simulate until the next (branching) choice point ---------------
    def simulate(self, w: World):
        """-> ('leaf', w) | ('fail',) | ('cp', owner_is_max, cp_md, w)."""
        gs = w.gs
        while True:
            a1: List[MD] = []
            a2: List[MD] = []
            c1: List[MD] = []
            c2: List[MD] = []
            er1 = w.max_root.execution_cycle(a1, c1)
            er2 = w.min_root.execution_cycle(a2, c2)
            if (w.oper_depth >= self.max_depth
                    and gs.time > w.last_issue_time
                    and (er1 == CHOICE or er2 == CHOICE)):
                return ("leaf", w)           # bounded depth reached
            if er1 == SUCCESS and er2 == SUCCESS:
                return ("leaf", w)
            if er1 == FAILURE or er2 == FAILURE:
                return ("fail",)
            if er1 == CHOICE or er2 == CHOICE:
                cp = c1[0] if c1 else c2[0]
                owner_is_max = bool(c1)
                if cp.kind == "ncond":
                    # non-branching: FIRST binding in place, else fail
                    got = next(match_clause(cp.clause, gs, w.binds), None)
                    if got is None:
                        return ("fail",)
                    cp.exec_state = 1
                    w.binds = got
                    continue
                return ("cp", owner_is_max, cp, w)
            if ((er1 == WAITING or er2 == WAITING)
                    and er1 != ACTION_ISSUE and er2 != ACTION_ISSUE):
                if gs.cycle():
                    return ("leaf", w)
                for ops in w.ops:
                    done = []
                    for md in ops:
                        if (exec_operator(md, gs)
                                or gs.time > md.updated_cycle + OP_TIMEOUT):
                            md.exec_state = 2
                            done.append(md)
                        else:
                            md.exec_state = 1
                    for md in done:
                        ops.remove(md)
                continue
            if er1 == ACTION_ISSUE or er2 == ACTION_ISSUE:
                if gs.time > w.last_issue_time:
                    w.last_issue_time = gs.time
                    w.oper_depth += 1
            for issued, actions, ops in ((er1 == ACTION_ISSUE, a1, w.ops[0]),
                                         (er2 == ACTION_ISSUE, a2, w.ops[1])):
                if not issued:
                    continue
                for md in actions:
                    md.updated_term = (md.term[0],) + tuple(
                        resolve_fn(subst(p, w.binds), gs)
                        for p in md.term[1:])
                    md.updated_cycle = gs.time
                    md.op_state = 0
                    if exec_operator(md, gs):
                        md.exec_state = 2
                    else:
                        md.exec_state = 1
                        ops.append(md)

    # -- choice-point expansions ----------------------------------------
    def expansions(self, w: World, cp: MD):
        """Yield (world', keep-going) per expansion: method candidates in
        domain order, or condition binding stream."""
        if cp.kind == "call":
            goal = subst_term(cp.term, w.binds)
            for m in self.dd.methods.get(goal[0], []):
                head_binds = {}
                if len(m.head) != len(goal):
                    continue
                ok = True
                for hp, tp in zip(m.head[1:], goal[1:]):
                    if isinstance(hp, Var):
                        head_binds[hp] = tp
                    elif hp != tp:
                        ok = False
                        break
                if not ok:
                    continue
                w2, (cp2,) = w.clone(keep=[cp])
                self.rename_ctr += 1
                rn = _Renamer(head_binds, self.rename_ctr)
                cp2.method = (MD.from_template(_rename_node(m.body, rn),
                                               {})
                              if m.body is not None else MD("seq"))
                yield w2
        else:   # branching condition
            clause = _subst_clause(cp.clause, w.binds)
            last = None
            for got in match_clause(clause, w.gs, w.binds):
                if got == last:
                    continue       # consecutive-duplicate dedup (Java)
                last = got
                w2, (cp2,) = w.clone(keep=[cp])
                cp2.exec_state = 1
                w2.binds = got
                yield w2

    # -- leaf: playout + evaluate ----------------------------------------
    def leaf_value(self, gs: R.GameState) -> float:
        self.n_playouts += 1
        if self.lookahead > 0 and self.playout_policy is not None:
            gs = clone_gs(gs)
            limit = gs.time + self.lookahead
            over = gs.gameover()
            while not over and gs.time < limit:
                self.playout_policy(gs, self.maxplayer, self.rng)
                self.playout_policy(gs, 1 - self.maxplayer, self.rng)
                over = gs.cycle()
        return self.eval_fn(gs, self.maxplayer)

    MAX_TREE_DEPTH = 80   # recursion guard (Java MAX_TREE_DEPTH=25 on
    #                        iterative-deepening depth; ours caps the
    #                        choice-point chain directly)

    # -- alpha-beta over choice points ------------------------------------
    def search(self, w: World, alpha: float, beta: float, depth: int = 0):
        """-> (value, solved_world) or None when every expansion fails."""
        if self.max_playouts > 0 and self.n_playouts >= self.max_playouts:
            return None
        r = self.simulate(w)
        if r[0] == "fail":
            return None
        if r[0] == "leaf":
            return self.leaf_value(r[1].gs), r[1]
        _, owner_is_max, cp, w = r
        if depth >= self.MAX_TREE_DEPTH:
            return self.leaf_value(w.gs), w
        best = None
        for w2 in self.expansions(w, cp):
            sub = self.search(w2, alpha, beta, depth + 1)
            if sub is None:
                continue
            v, sol = sub
            if owner_is_max:
                if best is None or v > best[0]:
                    best = (v, sol)
                alpha = max(alpha, v)
            else:
                if best is None or v < best[0]:
                    best = (v, sol)
                beta = min(beta, v)
            if beta <= alpha:
                break
        return best

    def plan(self, gs: R.GameState):
        """-> (value, solved World) of the best joint decomposition."""
        me, opp = self.maxplayer, 1 - self.maxplayer
        w = World(clone_gs(gs),
                  MD("call", term=("destroy-player", me, opp)),
                  MD("call", term=("destroy-player", opp, me)),
                  ([], []), {})
        return self.search(w, -VICTORY, VICTORY)


class _Renamer:
    def __init__(self, head_binds: Dict, idx: int):
        self.head_binds = head_binds
        self.idx = idx

    def __call__(self, p):
        if isinstance(p, Var):
            if p in self.head_binds:
                return self.head_binds[p]
            return Var(f"{p.name}#{self.idx}")
        if isinstance(p, Fn):
            return Fn(p.name, tuple(self(a) for a in p.args))
        return p


def _rename_node(node: tuple, rn: _Renamer) -> tuple:
    kind = node[0]
    if kind in ("seq", "par"):
        return (kind, [_rename_node(c, rn) for c in node[1]])
    if kind in ("cond", "ncond"):
        return (kind, _rename_clause(node[1], rn))
    return (kind, (node[1][0],) + tuple(rn(p) for p in node[1][1:]))


def _rename_clause(c: tuple, rn: _Renamer) -> tuple:
    kind = c[0]
    if kind == "term":
        return ("term", (c[1][0],) + tuple(rn(p) for p in c[1][1:]))
    if kind in ("and", "or"):
        return (kind, [_rename_clause(x, rn) for x in c[1]])
    if kind == "not":
        return ("not", _rename_clause(c[1], rn))
    return c


# ---------------------------------------------------------------------
# the AHTN bot over the oracle engine (AHTNAI.java:75-160)

class AHTNPlanBot:
    """Host-side AHTN player: plans with iterative deepening every time it
    can act, carries the winning plan's first-cycle operators across
    frames (actionsBeingExecuted), executes them into per-frame
    PlayerActions."""

    def __init__(self, domain: str | Domain = None, max_depth: int = 4,
                 playout_lookahead: int = 100, max_playouts: int = 200,
                 seed: int = 0):
        if domain is None:
            domain = asset_path(
                "ahtn/microrts-ahtn-definition-flexible-single-target-"
                "portfolio.lisp")
        self.dd = load_domain(domain) if isinstance(domain, str) else domain
        self.max_depth = max_depth
        self.lookahead = playout_lookahead
        self.max_playouts = max_playouts
        self.seed = seed
        self.executing: List[MD] = []

    def get_action(self, gs: R.GameState, player: int):
        """-> list of (HostUnit, UnitAction) for this frame."""
        can_act = any(u.player == player and gs.get_assignment(u) is None
                      for u in gs.pgs.units)
        pa: List = []
        if can_act:
            best, best_depth = None, 0
            planner = None
            for depth in range(1, self.max_depth + 1):
                planner = Planner(self.dd, player, depth, self.lookahead,
                                  max_playouts=self.max_playouts,
                                  seed=self.seed)
                got = planner.plan(gs)
                if got is not None:
                    best, best_depth = got, depth
                if planner.n_playouts >= self.max_playouts:
                    break
            if best is not None:
                _, sol = best
                ops = sorted(sol.max_root.operator_list([]),
                             key=lambda p: p[0])
                self.executing = []
                for cyc, term in ops:
                    if cyc != gs.time:
                        break
                    md = MD("op", term=term)
                    md.updated_term = term
                    md.updated_cycle = gs.time
                    self.executing.append(md)
        done = []
        for md in self.executing:
            if exec_operator(md, gs, pa):
                done.append(md)
        for md in done:
            self.executing.remove(md)
        # drop actions of dead units (AHTNAI.java:126-130)
        return [(u, ua) for (u, ua) in pa
                if gs.pgs.get_unit(u.ID) is not None]
