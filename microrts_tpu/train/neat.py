"""Topology-evolving NEAT, TPU-first: host epochs, device generations.

Completes the §2.6 neuroevolution inventory item that train/es.py covers
only as fixed-shape ES: REAL NEAT — genomes grow nodes and links under
historical-marking crossover and speciation — re-designed for a
fixed-shape accelerator.  The split mirrors where the time actually
goes in the reference (rts/MicroRTSNEAT.java:94-118 drives whole games
per organism; the jneat epoch between games is microseconds):

* **Device (hot): the whole population evaluates in one jit.**  Every
  genome is compiled host-side into one dense [N, N] weight matrix over
  a fixed node capacity N (absent/disabled links are structural zeros),
  so a generation is a stacked [P, N, N] tensor and a forward pass is a
  batched matmul on the MXU — no per-organism Java network walks
  (jneat/Network.java activate()'s linked-list traversal).  Recurrent
  links fall out for free: activation is the same
  flush -> load -> relax-for-depth loop as the reference
  (ai/units/NetworkHelpers.java:142-162 evaluateNetworkContinuous), run
  as a fixed ``relax_steps``-step unrolled recurrence with the NEAT
  sigmoid (slope 4.924273, jNeatCommon/NeatRoutine.java:13-15).
* **Host (cold): the NEAT epoch in numpy.**  Node and link genes carry
  GLOBAL historical markings (jneat/Gene.java, Innovation.java — the
  same structural mutation discovered in two lineages yields identical
  gene innovations AND identical node ids, so crossover composes),
  compatibility ``c1*E + c2*D + c3*avgWdiff`` (Genome.java:378-449 —
  NOTE the reference divides only the matching-weight term by the match
  count, not E/D by genome length; kept), speciation by
  first-compatible species (Population.java speciate), explicit fitness
  sharing (Species.java adjust_fitness), per-species offspring
  allocation with champion elitism, survival-threshold truncation, and
  the structural mutations (perturb/replace weights, add-link, add-node
  by gene splitting, enable-toggle — Genome.java mutate_*).

Capacity is the contract: ``NeatConfig.capacity`` bounds the node count
so every generation compiles to the same shapes (one XLA program for
the whole run); add-node mutations are rejected at capacity.  Genomes
reference nodes by global id; ``compile()`` maps the ids present onto
dense slots.  Parameters default to the NEAT paper values the reference
loads from its ``parametri`` file at run time (Neat.java:176-233
readParam — the checked-in defaults are zeros, so the constants here
are the published ones, not a copy).

Documented divergences: species age bonuses/stagnation dropoff and the
babies_stolen machinery (Population.java epoch tail) are omitted —
capability-neutral refinements; relax_steps is a config constant rather
than per-net ``max_depth()`` (a data-dependent depth would retrace).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SIGMOID_SLOPE = 4.924273  # NeatRoutine.fsigmoid's classic NEAT slope


@dataclasses.dataclass(frozen=True)
class NeatConfig:
    pop_size: int = 64
    capacity: int = 32          # node bound: 1 bias + in + out + hidden
    relax_steps: int = 6        # activation passes (net_depth analog)
    # compatibility (Genome.compatibility / p_*_coeff)
    c_excess: float = 1.0
    c_disjoint: float = 1.0
    c_mutdiff: float = 0.4
    compat_threshold: float = 3.0
    # reproduction (Neat.p_* / Species.reproduce)
    survival_thresh: float = 0.2
    elitism_min: int = 5        # champion copied if species bigger than this
    mutate_only_prob: float = 0.25
    mate_only_prob: float = 0.2
    # mutation (Genome.mutate_*)
    weight_mut_rate: float = 0.8
    weight_mut_power: float = 1.5
    weight_replace_rate: float = 0.1
    add_node_prob: float = 0.03
    add_link_prob: float = 0.1
    toggle_prob: float = 0.02
    init_weight: float = 1.0    # fresh-link weight scale


class NeatGenome:
    """Link genes (src, dst, weight, enabled, innovation) over GLOBAL
    node ids: 0 = bias, 1..n_in = sensors, next n_out = outputs, hidden
    ids handed out by the InnovationRegistry (shared across the
    population, so the same id means the same historical node in every
    genome — jneat's node ids)."""

    def __init__(self, n_in: int, n_out: int, cfg: NeatConfig):
        assert 1 + n_in + n_out <= cfg.capacity, "capacity too small"
        self.n_in, self.n_out, self.cfg = n_in, n_out, cfg
        self.src = np.zeros(0, np.int64)
        self.dst = np.zeros(0, np.int64)
        self.w = np.zeros(0, np.float64)
        self.on = np.zeros(0, bool)
        self.innov = np.zeros(0, np.int64)

    # -- helpers ---------------------------------------------------------
    @property
    def n_base(self) -> int:
        return 1 + self.n_in + self.n_out

    def hidden_ids(self) -> List[int]:
        ids = set(self.src.tolist()) | set(self.dst.tolist())
        return sorted(i for i in ids if i >= self.n_base)

    @property
    def n_nodes(self) -> int:
        return self.n_base + len(self.hidden_ids())

    def copy(self) -> "NeatGenome":
        g = NeatGenome(self.n_in, self.n_out, self.cfg)
        for f in ("src", "dst", "w", "on", "innov"):
            setattr(g, f, getattr(self, f).copy())
        return g

    def add_gene(self, s: int, d: int, w: float, innov: int,
                 enabled: bool = True):
        self.src = np.append(self.src, np.int64(s))
        self.dst = np.append(self.dst, np.int64(d))
        self.w = np.append(self.w, w)
        self.on = np.append(self.on, enabled)
        self.innov = np.append(self.innov, np.int64(innov))

    def out_slot0(self) -> int:
        return 1 + self.n_in

    # -- dense compilation (the device form) -----------------------------
    def compile(self) -> np.ndarray:
        """[capacity, capacity] dense W; W[i, j] = weight of link i->j
        in slot space (base nodes keep their ids; hidden ids map onto
        the remaining slots in sorted order)."""
        slot = {gid: self.n_base + k
                for k, gid in enumerate(self.hidden_ids())}
        W = np.zeros((self.cfg.capacity, self.cfg.capacity), np.float32)
        for s, d, w, on in zip(self.src, self.dst, self.w, self.on):
            if on:
                si = slot.get(int(s), int(s))
                di = slot.get(int(d), int(d))
                W[si, di] = w
        return W


class InnovationRegistry:
    """Historical markings (jneat/Innovation.java): the same structural
    mutation discovered twice gets the same gene innovation numbers and
    (for splits) the same new-node id."""

    def __init__(self, first_node_id: int):
        self.next_innov = 0
        self.next_node = first_node_id
        self.links = {}    # (src, dst) -> innov
        self.splits = {}   # split gene innov -> (node_id, innov_a, innov_b)

    def link(self, s: int, d: int) -> int:
        key = (s, d)
        if key not in self.links:
            self.links[key] = self.next_innov
            self.next_innov += 1
        return self.links[key]

    def split(self, gene_innov: int) -> Tuple[int, int, int]:
        if gene_innov not in self.splits:
            self.splits[gene_innov] = (self.next_node, self.next_innov,
                                       self.next_innov + 1)
            self.next_node += 1
            self.next_innov += 2
        return self.splits[gene_innov]


def fully_connected(n_in: int, n_out: int, cfg: NeatConfig,
                    reg: InnovationRegistry, rng: np.random.Generator
                    ) -> NeatGenome:
    """Minimal initial topology: bias+sensors fully wired to outputs
    (the NEAT paper's start-minimal rule; hidden structure must evolve)."""
    g = NeatGenome(n_in, n_out, cfg)
    for d in range(g.out_slot0(), g.out_slot0() + n_out):
        for s in range(0, 1 + n_in):
            g.add_gene(s, d, rng.uniform(-1, 1) * cfg.init_weight,
                       reg.link(s, d))
    return g


# ---- mutation (Genome.java mutate_link_weight / mutate_add_link /
# ---- mutate_add_node / mutate_gene_reenable) ---------------------------

def mutate_weights(g: NeatGenome, rng: np.random.Generator):
    cfg = g.cfg
    for i in range(len(g.w)):
        if rng.random() < cfg.weight_mut_rate:
            if rng.random() < cfg.weight_replace_rate:
                g.w[i] = rng.uniform(-1, 1) * cfg.init_weight
            else:
                g.w[i] += rng.uniform(-1, 1) * cfg.weight_mut_power


def mutate_add_link(g: NeatGenome, reg: InnovationRegistry,
                    rng: np.random.Generator, tries: int = 16):
    """New link between present nodes (recurrent allowed — the dense
    relax loop evaluates cycles natively).  Sensors/bias can't be dst."""
    nodes = list(range(g.n_base)) + g.hidden_ids()
    dsts = [n for n in nodes if n > g.n_in]
    have = set(zip(g.src.tolist(), g.dst.tolist()))
    for _ in range(tries):
        s = int(rng.choice(nodes))
        d = int(rng.choice(dsts))
        if (s, d) in have:
            continue
        g.add_gene(s, d, rng.uniform(-1, 1) * g.cfg.init_weight,
                   reg.link(s, d))
        return True
    return False


def mutate_add_node(g: NeatGenome, reg: InnovationRegistry,
                    rng: np.random.Generator):
    """Split an enabled link: disable it, insert node, in->new (w=1),
    new->out (old weight) — Genome.java mutate_add_node."""
    if g.n_nodes >= g.cfg.capacity:
        return False              # at capacity: structural freeze
    live = np.flatnonzero(g.on)
    if len(live) == 0:
        return False
    i = int(rng.choice(live))
    new, ia, ib = reg.split(int(g.innov[i]))
    if new in g.hidden_ids():     # this lineage already has this split
        return False
    g.on[i] = False
    g.add_gene(int(g.src[i]), new, 1.0, ia)
    g.add_gene(new, int(g.dst[i]), float(g.w[i]), ib)
    return True


def mutate(g: NeatGenome, reg: InnovationRegistry,
           rng: np.random.Generator):
    cfg = g.cfg
    if rng.random() < cfg.add_node_prob and mutate_add_node(g, reg, rng):
        return
    if rng.random() < cfg.add_link_prob and mutate_add_link(g, reg, rng):
        return
    mutate_weights(g, rng)
    if rng.random() < cfg.toggle_prob and len(g.on):
        i = int(rng.integers(0, len(g.on)))
        g.on[i] = ~g.on[i]
        # never strand a node with no enabled in-links
        if not g.on[i] and not np.any(g.on[g.dst == g.dst[i]]):
            g.on[i] = True


# ---- crossover + compatibility (Genome.java mate_multipoint /
# ---- compatibility) ----------------------------------------------------

def crossover(mom: NeatGenome, dad: NeatGenome, mom_fitter: bool,
              rng: np.random.Generator) -> NeatGenome:
    """Innovation-aligned multipoint mating: matching genes picked from
    either parent at random; disjoint/excess inherited from the fitter
    parent only (Genome.java mate_multipoint).  Matching innovations
    reference identical global (src, dst) by registry construction, so
    the child's node set equals the fitter parent's."""
    best, other = (mom, dad) if mom_fitter else (dad, mom)
    child = NeatGenome(best.n_in, best.n_out, best.cfg)
    omap = {int(v): i for i, v in enumerate(other.innov)}
    for i in range(len(best.innov)):
        j = omap.get(int(best.innov[i]))
        pick, k = (best, i) if j is None or rng.random() < 0.5 \
            else (other, j)
        # a gene disabled in either parent has a 75% chance of staying
        # disabled in the child (the NEAT paper rule jneat implements)
        enabled = bool(best.on[i]) and (j is None or bool(other.on[j]))
        if not enabled:
            enabled = rng.random() > 0.75
        child.add_gene(int(pick.src[k]), int(pick.dst[k]),
                       float(pick.w[k]), int(best.innov[i]), enabled)
    return child


def compat_distance(a: NeatGenome, b: NeatGenome) -> float:
    """c1*E + c2*D + c3*avg|dw| over matching genes — the reference's
    un-normalized form (Genome.java:448-449 divides E and D by 1.0)."""
    cfg = a.cfg
    ai = {int(v): i for i, v in enumerate(a.innov)}
    bi = {int(v): i for i, v in enumerate(b.innov)}
    if not ai and not bi:
        return 0.0
    match_dw, n_match = 0.0, 0
    for v, i in ai.items():
        j = bi.get(v)
        if j is not None:
            match_dw += abs(float(a.w[i]) - float(b.w[j]))
            n_match += 1
    cut = min(max(ai, default=-1), max(bi, default=-1))
    excess_a = sum(1 for v in ai if v > cut)
    excess_b = sum(1 for v in bi if v > cut)
    disjoint = (len(ai) - n_match - excess_a
                + len(bi) - n_match - excess_b)
    return (cfg.c_excess * (excess_a + excess_b)
            + cfg.c_disjoint * disjoint
            + cfg.c_mutdiff * (match_dw / max(n_match, 1)))


# ---- population / epoch (Population.java speciate + epoch,
# ---- Species.java adjust_fitness + reproduce) --------------------------

class NeatPopulation:
    def __init__(self, n_in: int, n_out: int, cfg: NeatConfig = NeatConfig(),
                 seed: int = 0):
        self.cfg = cfg
        self.reg = InnovationRegistry(first_node_id=1 + n_in + n_out)
        self.rng = np.random.default_rng(seed)
        self.genomes: List[NeatGenome] = []
        for _ in range(cfg.pop_size):
            g = fully_connected(n_in, n_out, cfg, self.reg, self.rng)
            mutate_weights(g, self.rng)
            self.genomes.append(g)
        self.generation = 0
        self.best: Optional[NeatGenome] = None
        self.best_fitness = -np.inf

    # device form of the whole generation
    def compiled(self) -> np.ndarray:
        return np.stack([g.compile() for g in self.genomes])   # [P, N, N]

    def _speciate(self) -> List[List[int]]:
        species: List[List[int]] = []
        reps: List[NeatGenome] = []
        for i, g in enumerate(self.genomes):
            for s, rep in enumerate(reps):
                if compat_distance(g, rep) < self.cfg.compat_threshold:
                    species[s].append(i)
                    break
            else:
                species.append([i])
                reps.append(g)
        return species

    def epoch(self, fitness) -> None:
        """One NEAT generation from measured fitnesses [P]."""
        cfg, rng = self.cfg, self.rng
        fit = np.asarray(fitness, np.float64)
        b = int(np.argmax(fit))
        if fit[b] > self.best_fitness:
            self.best_fitness = float(fit[b])
            self.best = self.genomes[b].copy()
        species = self._speciate()
        # explicit fitness sharing: adjusted = f / |species|
        shared = np.empty_like(fit)
        for members in species:
            shared[members] = fit[members] / len(members)
        shifted = shared - shared.min() + 1e-9   # allocation needs >= 0
        spec_share = np.array([shifted[m].sum() for m in species])
        babies = np.round(spec_share / spec_share.sum()
                          * cfg.pop_size).astype(int)
        # rounding drift -> settle on the best species
        babies[int(np.argmax(spec_share))] += cfg.pop_size - babies.sum()

        next_gen: List[NeatGenome] = []
        for members, n in zip(species, babies):
            if n <= 0:
                continue
            members = sorted(members, key=lambda i: -fit[i])
            champ = self.genomes[members[0]]
            if len(members) > cfg.elitism_min:
                next_gen.append(champ.copy())     # champion survives
                n -= 1
            # survival threshold: only the top fraction reproduces
            pool = members[:max(1, int(np.ceil(
                cfg.survival_thresh * len(members))))]
            for _ in range(n):
                mi = int(rng.choice(pool))
                if rng.random() < cfg.mutate_only_prob or len(pool) == 1:
                    child = self.genomes[mi].copy()
                    mutate(child, self.reg, rng)
                else:
                    di = int(rng.choice(pool))
                    child = crossover(self.genomes[mi], self.genomes[di],
                                      fit[mi] >= fit[di], rng)
                    if rng.random() >= cfg.mate_only_prob:
                        mutate(child, self.reg, rng)
                next_gen.append(child)
        while len(next_gen) < cfg.pop_size:       # rounding shortfall
            next_gen.append(self.genomes[b].copy())
        self.genomes = next_gen[:cfg.pop_size]
        self.generation += 1


# ---- device evaluation -------------------------------------------------

def neat_forward(W: jax.Array, x: jax.Array, n_in: int, n_out: int,
                 relax_steps: int = 6) -> jax.Array:
    """Activate one compiled net: ``W`` [N, N], ``x`` [..., n_in] ->
    [..., n_out].  flush -> clamp bias+sensors -> relax ``relax_steps``
    passes of h = sigmoid(h @ W) (NetworkHelpers.java:142-162)."""
    N = W.shape[0]
    batch = x.shape[:-1]
    h = jnp.zeros(batch + (N,), jnp.float32)
    clamp = jnp.concatenate(
        [jnp.ones(batch + (1,), jnp.float32), x.astype(jnp.float32),
         jnp.zeros(batch + (N - 1 - n_in,), jnp.float32)], -1)
    keep = (jnp.arange(N) <= n_in)                 # bias + sensors
    for _ in range(relax_steps):
        act = jax.nn.sigmoid(SIGMOID_SLOPE * (h @ W))
        h = jnp.where(keep, clamp, act)
    o0 = 1 + n_in
    return h[..., o0:o0 + n_out]


def neat_evolve(fitness_fn: Callable, pop: NeatPopulation,
                generations: int, key: jax.Array, log=None
                ) -> Tuple[NeatGenome, list]:
    """Generation loop: ``fitness_fn(Ws [P, N, N], key) -> [P]`` jittable
    (shapes never change, so it compiles once for the whole run)."""
    fit_j = jax.jit(fitness_fn)
    history = []
    for g in range(generations):
        key, k = jax.random.split(key)
        fit = np.asarray(fit_j(jnp.asarray(pop.compiled()), k))
        history.append(float(fit.max()))
        if log:
            log(g, float(fit.mean()), float(fit.max()),
                max(gg.n_nodes for gg in pop.genomes))
        pop.epoch(fit)
    return pop.best, history
