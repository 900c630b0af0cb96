"""Program cleaning: strip behaviorally-dead structure from synthesized
scripts.

TPU re-design of the reference's post-synthesis AST cleaners
(ai/synthesis/runners/cleanAST/PerformCleanerAST.java and
PerformCleanerASTOptim.java): the Java runners re-parse an evolved
script, delete one construct at a time, and keep the deletion when the
shrunk script still behaves / scores the same — producing the minimal
readable strategy that synthesis actually found (dead guards and
shadowed commands are common because mutation inserts freely).

Two cleaners, matching the two Java runners:

* ``clean_program`` (PerformCleanerAST) — BEHAVIORAL equivalence: an
  edit is accepted only if the shrunk program emits the *identical*
  [H, W, 7] action tensor on every probe state.  Probe states come from
  real self-play rollouts of the program itself (``probe_states``), so
  "dead" means dead on the distribution the program actually visits,
  not on arbitrary boards.
* ``shrink_program`` (PerformCleanerASTOptim) — FITNESS preservation:
  an edit is accepted if the shrunk program's tournament fitness
  (synth.search.evaluate_population) stays within ``tol`` of the
  incumbent.  Strictly stronger shrinking (can delete commands whose
  effect never changes game outcomes).

TPU shape: where the Java cleaner replays games per candidate deletion
sequentially, both cleaners here evaluate EVERY candidate edit of a
round in one compiled launch — ``clean_program`` vmaps a
(candidate, probe) lane grid dispatching candidates via ``lax.switch``
(the same one-launch-per-generation trick as synth.search), and
``shrink_program`` reuses the batched tournament evaluator.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..env.gridnet import GridnetEnv
from .dsl import For, If, Program, compile_program
from .search import evaluate_population


def node_count(prog: Program) -> int:
    """Total AST nodes (commands + conditions), the cleaner's size metric."""
    n = 0
    for c in prog:
        if isinstance(c, If):
            n += 1 + node_count(c.then) + 1   # the If, its body, its cond
        elif isinstance(c, For):
            n += 1 + node_count(c.body)
        else:
            n += 1
    return n


def edit_candidates(prog: Program) -> List[Tuple[str, Program]]:
    """Single-edit shrink neighborhood of a program.

    Mirrors the deletions PerformCleanerAST tries line by line: drop a
    top-level command, unguard an ``If`` (splice its body in place —
    tests whether the guard ever mattered), unroll a ``For`` by one,
    and drop one command inside an ``If``/``For`` body (one level deep,
    like the Java cleaner's per-line descent)."""
    cands: List[Tuple[str, Program]] = []
    for i, c in enumerate(prog):
        rest = prog[:i] + prog[i + 1:]
        cands.append((f"drop[{i}] {type(c).__name__}", rest))
        if isinstance(c, If):
            cands.append((f"unguard[{i}]", prog[:i] + c.then + prog[i + 1:]))
            for j in range(len(c.then)):
                body = c.then[:j] + c.then[j + 1:]
                ed = (prog[:i]
                      + ((If(c.cond, body),) if body else ())
                      + prog[i + 1:])
                cands.append((f"drop[{i}].then[{j}]", ed))
        elif isinstance(c, For):
            if c.n > 1:
                cands.append((f"unroll[{i}] For({c.n}->{c.n - 1})",
                              prog[:i] + (For(c.n - 1, c.body),)
                              + prog[i + 1:]))
            else:
                cands.append((f"unwrap[{i}] For(1)",
                              prog[:i] + c.body + prog[i + 1:]))
            for j in range(len(c.body)):
                body = c.body[:j] + c.body[j + 1:]
                ed = (prog[:i]
                      + ((For(c.n, body),) if body else ())
                      + prog[i + 1:])
                cands.append((f"drop[{i}].body[{j}]", ed))
    # dedupe identical resulting programs (e.g. unwrap == drop for empty For)
    seen, out = set(), []
    for label, p in cands:
        if p != prog and p not in seen:
            seen.add(p)
            out.append((label, p))
    return out


def probe_states(env: GridnetEnv, program: Program, opponents:
                 Sequence[Callable], n_snaps: int = 24,
                 stride: int = 17, seed: int = 0):
    """States the program actually visits: play it against each opponent
    from both seats and snapshot the board every ``stride`` cycles.

    Returns ``(states, seats, keys)`` — a stacked State pytree with a
    leading probe axis of size ``len(opponents) * 2 * n_snaps``, the
    seat the program occupied in each probe, and per-probe PRNG keys
    (shared by base and candidate so stochastic target policies compare
    deterministically).  Snapshots are taken BEFORE each stride (ticks
    0, stride, 2*stride, …) so the opening position — where producers
    are idle and Train/Build commands visibly act — is always a probe;
    the default stride is prime so snapshots cannot alias with the
    UTT's action durations (a stride-25 probe set once saw the base
    mid-production in every snapshot and declared Train dead).
    Post-terminal snapshots repeat the frozen final board, which only
    adds redundant (always-equal) probes."""
    prog_bot = compile_program(env, program)
    opp_b = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in opponents]

    def one_lane(oi, seat, key):
        s0 = env.reset(key)

        def tick(carry, _):
            s, done, k = carry
            k, k0, k1 = jax.random.split(k, 3)
            ap = prog_bot(s, seat, k0)
            ao = jax.lax.switch(oi, opp_b, s, 1 - seat, k1)
            a0 = jnp.where(seat == 0, ap, ao)
            a1 = jnp.where(seat == 0, ao, ap)
            s2, _, d2 = env.step(s, a0, a1)
            s3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), s, s2)
            return (s3, done | d2, k), None

        def snap(carry, _):
            out = carry[0]
            carry, _ = jax.lax.scan(tick, carry, None, length=stride)
            return carry, out

        _, snaps = jax.lax.scan(snap, (s0, jnp.asarray(False), key), None,
                                length=n_snaps)
        return snaps

    lanes = [(oi, seat) for oi in range(len(opponents)) for seat in (0, 1)]
    ois = jnp.asarray([l[0] for l in lanes], jnp.int32)
    seats = jnp.asarray([l[1] for l in lanes], jnp.int32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(len(lanes), dtype=jnp.uint32))
    snaps = jax.jit(jax.vmap(one_lane))(ois, seats, keys)   # [L, S, ...]
    flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), snaps)
    n = len(lanes) * n_snaps
    seat_flat = jnp.repeat(seats, n_snaps)
    probe_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed + 1), jnp.arange(n, dtype=jnp.uint32))
    return flat, seat_flat, probe_keys


def mismatch_counts(env: GridnetEnv, base: Program,
                    candidates: Sequence[Program], states, seats,
                    keys) -> np.ndarray:
    """Per-candidate count of probe states where the candidate's action
    tensor differs from the base program's — ONE compiled launch over
    the (candidate, probe) lane grid."""
    base_bot = compile_program(env, base)
    cand_bots = [compile_program(env, p) for p in candidates]
    cand_b = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in cand_bots]

    def one(ci, s, seat, key):
        a_base = base_bot(s, seat, key)
        a_cand = jax.lax.switch(ci, cand_b, s, seat, key)
        return jnp.any(a_base != a_cand).astype(jnp.int32)

    C = len(candidates)
    n = seats.shape[0]
    cis = jnp.repeat(jnp.arange(C, dtype=jnp.int32), n)
    rep = lambda a: jax.tree.map(
        lambda x: jnp.tile(x, (C,) + (1,) * (x.ndim - 1)), a)
    diffs = jax.jit(jax.vmap(one))(cis, rep(states), jnp.tile(seats, C),
                                   jnp.tile(keys, (C, 1)))
    return np.asarray(diffs.reshape(C, n).sum(axis=1))


@dataclasses.dataclass
class CleanResult:
    program: Program
    removed: List[str]          # accepted edit labels, in order
    nodes_before: int
    nodes_after: int


def clean_program(env: GridnetEnv, program: Program,
                  opponents: Sequence[Callable], n_snaps: int = 24,
                  stride: int = 17, seed: int = 0,
                  max_rounds: int = 32) -> CleanResult:
    """PerformCleanerAST analog: greedily delete structure while the
    program's actions stay bit-identical on every probe state.

    Each round evaluates the whole single-edit neighborhood in one
    launch and accepts the equivalent edit that sheds the most nodes;
    terminates at a fixpoint (no equivalent edit remains)."""
    states, seats, keys = probe_states(env, program, opponents,
                                       n_snaps, stride, seed)
    cur = program
    removed: List[str] = []
    for _ in range(max_rounds):
        cands = edit_candidates(cur)
        if not cands:
            break
        counts = mismatch_counts(env, cur, [p for _, p in cands],
                                 states, seats, keys)
        ok = [(node_count(p), label, p)
              for (label, p), c in zip(cands, counts)
              if c == 0 and node_count(p) < node_count(cur)]
        if not ok:
            break
        _, label, cur = min(ok, key=lambda t: t[0])
        removed.append(label)
    return CleanResult(cur, removed, node_count(program), node_count(cur))


def shrink_program(env: GridnetEnv, program: Program,
                   opponents: Sequence[Callable], tol: float = 0.0,
                   games_per_pair: int = 2, max_cycles: int = 1200,
                   seed: int = 0, max_rounds: int = 16) -> CleanResult:
    """PerformCleanerASTOptim analog: greedily delete structure while
    tournament fitness stays within ``tol`` of the incumbent's.

    Each round scores incumbent + every single-edit candidate as one
    batched tournament; accepts the smallest candidate still within
    tolerance of the incumbent's CURRENT score (re-measured each round,
    same seed, so drift cannot accumulate past ``tol``)."""
    cur = program
    removed: List[str] = []
    for r in range(max_rounds):
        cands = edit_candidates(cur)
        if not cands:
            break
        fits = evaluate_population(env, [cur] + [p for _, p in cands],
                                   opponents, games_per_pair, max_cycles,
                                   seed=seed)
        ok = [(node_count(p), label, p)
              for (label, p), f in zip(cands, fits[1:])
              if f >= fits[0] - tol and node_count(p) < node_count(cur)]
        if not ok:
            break
        _, label, cur = min(ok, key=lambda t: t[0])
        removed.append(label)
    return CleanResult(cur, removed, node_count(program), node_count(cur))
