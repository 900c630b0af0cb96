"""Game configuration: GameSettings-compatible properties + CLI overrides.

Honors the reference's config keys and precedence (file first, then args —
rts/GameSettings.java:145-268, rts/MicroRTS.java:29-37; defaults per
resources/config.properties).  Java AI class names map to our on-device
bots (ai.abstraction.WorkerRush -> "WorkerRush", etc.).
"""

from __future__ import annotations

import argparse
import dataclasses


@dataclasses.dataclass
class GameSettings:
    launch_mode: str = "STANDALONE"   # STANDALONE | SERVER | CLIENT
    server_address: str = "127.0.0.1"
    server_port: int = 9898
    serialization_type: int = 2       # 1 XML / 2 JSON (socket protocol)
    constants_in_state: bool = True
    compress_terrain: bool = False
    map_location: str = "maps/16x16/basesWorkers16x16.xml"
    max_cycles: int = 5000
    update_interval: int = 5
    headless: bool = False
    partially_observable: bool = False
    utt_version: int = 2
    conflict_policy: int = 1
    ai1: str = "WorkerRush"
    ai2: str = "RandomBiasedAI"

    KEYMAP = {
        "launch_mode": "launch_mode", "server_address": "server_address",
        "server_port": "server_port",
        "serialization_type": "serialization_type",
        "constants_in_state": "constants_in_state",
        "compress_terrain": "compress_terrain",
        "map_location": "map_location", "max_cycles": "max_cycles",
        "update_interval": "update_interval", "headless": "headless",
        "partially_observable": "partially_observable",
        "UTT_version": "utt_version", "conflict_policy": "conflict_policy",
        "AI1": "ai1", "AI2": "ai2",
    }

    @classmethod
    def load_properties(cls, path: str) -> "GameSettings":
        gs = cls()
        gs.apply_properties(open(path).read())
        return gs

    def apply_properties(self, text: str) -> None:
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, val = line.partition("=")
            key, val = key.strip(), val.strip()
            field = self.KEYMAP.get(key)
            if field is None:
                continue
            cur = getattr(self, field)
            if isinstance(cur, bool):
                setattr(self, field, val.lower() == "true")
            elif isinstance(cur, int):
                setattr(self, field, int(val))
            else:
                setattr(self, field, val)

    def override_from_args(self, args: argparse.Namespace) -> None:
        for field in dataclasses.fields(self):
            v = getattr(args, field.name, None)
            if v is not None:
                setattr(self, field.name, v)


# Java class name -> our bot registry key (reflective instantiation analog
# of GameSettings/Game.java:44-50)
JAVA_AI_ALIASES = {
    "ai.abstraction.WorkerRush": "WorkerRush",
    "ai.abstraction.LightRush": "LightRush",
    "ai.abstraction.HeavyRush": "HeavyRush",
    "ai.abstraction.RangedRush": "RangedRush",
    "ai.RandomBiasedAI": "RandomBiasedAI",
    "ai.RandomAI": "RandomAI",
    "ai.PassiveAI": "PassiveAI",
    "ai.abstraction.partialobservability.POWorkerRush": "POWorkerRush",
    "ai.abstraction.partialobservability.POLightRush": "POLightRush",
    "ai.abstraction.partialobservability.POHeavyRush": "POHeavyRush",
    "ai.abstraction.partialobservability.PORangedRush": "PORangedRush",
    "ai.montecarlo.MonteCarlo": "MonteCarlo",
    "ai.mcts.naivemcts.NaiveMCTS": "NaiveMCTS",
    "ai.mcts.uct.UCT": "UCT",
    "ai.mcts.uct.DownsamplingUCT": "DownsamplingUCT",
    "ai.mcts.informedmcts.InformedNaiveMCTS": "InformedNaiveMCTS",
    "ai.mcts.mlps.MLPSMCTS": "MLPSMCTS",
    "ai.mcts.naivemcts.TwoPhaseNaiveMCTS": "TwoPhaseNaiveMCTS",
    "ai.mcts.uct.UCTFirstPlayUrgency": "UCTFirstPlayUrgency",
    "ai.mcts.uct.UCTUnitActions": "UCTUnitActions",
    "ai.RandomBiasedSingleUnitAI": "RandomBiasedSingleUnitAI",
    "ai.stochastic.UnitActionProbabilityDistributionAI":
        "UnitActionProbabilityDistributionAI",
    "ai.montecarlo.lsi.LSI": "LSI",
    "ai.puppet.PuppetSearchAB": "PuppetSearchAB",
    "ai.puppet.PuppetSearchMCTS": "PuppetSearchMCTS",
    "ai.puppet.PuppetNoPlan": "PuppetNoPlan",
    "ai.scv.SCV": "SCV",
    "ai.ahtn.AHTNAI": "AHTN",
    "ai.mcts.believestatemcts.BS1_NaiveMCTS": "BS1_NaiveMCTS",
    "ai.mcts.believestatemcts.BS2_NaiveMCTS": "BS2_NaiveMCTS",
    "ai.mcts.believestatemcts.BS3_NaiveMCTS": "BS3_NaiveMCTS",
    "ai.minimax.ABCD.ABCD": "ABCD",
    "ai.minimax.ABCD.IDABCD": "IDABCD",
    "ai.minimax.RTMiniMax.RTMinimax": "RTMinimax",
    "ai.minimax.RTMiniMax.IDRTMinimax": "IDRTMinimax",
    "ai.portfolio.PortfolioAI": "PortfolioAI",
    "ai.portfolio.portfoliogreedysearch.PGSAI": "PGSAI",
    "ai.abstraction.WorkerDefense": "WorkerDefense",
    "ai.abstraction.LightDefense": "LightDefense",
    "ai.abstraction.HeavyDefense": "HeavyDefense",
    "ai.abstraction.RangedDefense": "RangedDefense",
    "ai.abstraction.WorkerRushPlusPlus": "WorkerRushPlusPlus",
    "ai.abstraction.EconomyRush": "EconomyRush",
    "ai.abstraction.EconomyMilitaryRush": "EconomyMilitaryRush",
    "ai.abstraction.EMRDeterministico": "EMRDeterministico",
    "ai.abstraction.EconomyRushBurster": "EconomyRushBurster",
    "ai.abstraction.SimpleEconomyRush": "SimpleEconomyRush",
    "ai.abstraction.cRush.CRush_V1": "CRush_V1",
    "ai.abstraction.cRush.CRush_V2": "CRush_V2",
}


def _pretrained_wr() -> str:
    """The AIM-WR pretrained Bayes model (the Java InformedNaiveMCTS
    default, InformedNaiveMCTS.java:72-84); bundled in-package."""
    from .utils.assets import asset_path
    try:
        return asset_path("bayesianmodels/ActionInterdependenceModel-WR.xml")
    except FileNotFoundError:
        return asset_path(
            "data/bayesianmodels/pretrained/ActionInterdependenceModel-WR.xml")


def _uapd(env):
    """UnitActionProbabilityDistributionAI over the pretrained AIM-WR
    model (ai/stochastic/UnitActionProbabilityDistributionAI.java)."""
    from .ml.pretrained import pretrained_bayes_bot
    return pretrained_bayes_bot(env, _pretrained_wr())


def _cooperative(env):
    """CooperativeAI (ai/CooperativeAI.java): per-unit-type networks;
    fresh (unevolved) genomes by default, like an un-run MicroRTSNEAT."""
    from .bots.cooperative import cooperative_bot
    return cooperative_bot(env)


def make_bot(name: str, env) -> "callable":
    """Bot factory by (Java or short) name."""
    from .bots import scripted as S

    name = JAVA_AI_ALIASES.get(name, name)
    registry = {
        "PassiveAI": lambda: S.passive_bot(env),
        "RandomAI": lambda: S.random_bot(env, 1.0),
        "RandomBiasedAI": lambda: S.random_bot(env, 5.0),
        "RandomBiasedSingleUnitAI":
            lambda: S.random_biased_single_unit_bot(env),
        "WorkerRush": lambda: S.worker_rush(env),
        "LightRush": lambda: S.light_rush(env),
        "HeavyRush": lambda: S.heavy_rush(env),
        "RangedRush": lambda: S.ranged_rush(env),
        "POWorkerRush": lambda: S.po_worker_rush(env),
        "POLightRush": lambda: S.po_light_rush(env),
        "POHeavyRush": lambda: S.po_heavy_rush(env),
        "PORangedRush": lambda: S.po_ranged_rush(env),
        "WorkerDefense": lambda: S.worker_defense(env),
        "LightDefense": lambda: S.light_defense(env),
        "HeavyDefense": lambda: S.heavy_defense(env),
        "RangedDefense": lambda: S.ranged_defense(env),
        "WorkerRushPlusPlus": lambda: S.worker_rush_plus_plus(env),
        "EconomyRush": lambda: S.economy_rush(env),
        "EconomyMilitaryRush": lambda: S.economy_military_rush(env),
        "EMRDeterministico": lambda: S.emr_deterministico(env),
        "EconomyRushBurster": lambda: S.economy_rush_burster(env),
        "SimpleEconomyRush": lambda: S.simple_economy_rush(env),
        "CRush_V1": lambda: S.crush_v1(env),
        "CRush_V2": lambda: S.crush_v2(env),
    }

    def _search():
        from .bots import believestate as BS
        from .bots import lsi as LS
        from .bots import minimax as MM
        from .bots import portfolio as PF
        from .bots import search as SE
        from .bots import treesearch as TS
        from .bots import puppet as PU
        from .bots import scv as SV
        from .bots import ahtn as AH
        return {
            "SCV": lambda: SV.scv_bot(env),
            # full pool-selection model (battle-stats CSVs + in-graph
            # enemy classification; SCV.java:115-175, 356-536)
            "SCVAdaptive": lambda: SV.scv_bot(env, adaptive=True),
            "AHTN": lambda: AH.ahtn_bot(env),
            "LSI": lambda: LS.lsi_bot(env),
            "PuppetNoPlan": lambda: PU.puppet_ab_bot(env),
            "PuppetSearchMCTS": lambda: PU.puppet_mcts_bot(env),
            # stateful plan-holding variant (StatefulBot protocol)
            "PuppetSearchAB": lambda: PU.puppet_plan_bot(env),
            # stateful believe-state bots (StatefulBot protocol)
            "BS1_NaiveMCTS": lambda: BS.believe_state_bot(
                env, TS.naive_mcts_bot(env), level=1),
            "BS2_NaiveMCTS": lambda: BS.believe_state_bot(
                env, TS.naive_mcts_bot(env), level=2),
            "BS3_NaiveMCTS": lambda: BS.believe_state_bot(
                env, TS.naive_mcts_bot(env), level=3),
            "PortfolioAI": lambda: PF.portfolio_ai_bot(env),
            "PGSAI": lambda: PF.pgs_bot(env),
            "MonteCarlo": lambda: SE.monte_carlo_bot(env),
            "NaiveMCTS": lambda: TS.naive_mcts_bot(env),
            # tree reuse across moves (ContinuingAI/InterruptibleAI
            # analog; StatefulBot protocol)
            "ContinuingNaiveMCTS": lambda: TS.naive_mcts_continuing(env),
            # TwoPhaseNaiveMCTS.java:44-50 canonical epsilons
            "TwoPhaseNaiveMCTS": lambda: TS.naive_mcts_bot(
                env, eps0=1.0, eps_l=0.3, eps_g=0.0,
                phase2=(0.0, 0.3, 0.0), phase1_ratio=0.5),
            "InformedNaiveMCTS": lambda: TS.informed_naive_mcts_bot(
                env, _pretrained_wr()),
            "MLPSMCTS": lambda: TS.mlps_mcts_bot(env),
            "UCTFirstPlayUrgency": lambda: TS.uct_tree_bot(env, fpu=0.5),
            "UCTUnitActions": lambda: TS.uct_unit_actions_bot(env),
            "UnitActionProbabilityDistributionAI": lambda: _uapd(env),
            "UCT": lambda: TS.uct_tree_bot(env),
            "DownsamplingUCT": lambda: TS.uct_tree_bot(env,
                                                       n_candidates=4),
            # "ABCD" = the exact duration-aware alpha-beta DFS
            # (ai/minimax/ABCD/ABCD.java semantics: mover alternation,
            # odometer enumeration, playout leaves).  "SampledABCD" is the
            # SIMD-shaped one-ply K x K maximin re-shape (see
            # sampled_abcd_bot docstring) — far cheaper under vmap.
            "ABCD": lambda: MM.abcd_bot(env),
            "SampledABCD": lambda: MM.sampled_abcd_bot(env),
            "IDABCD": lambda: MM.id_abcd_bot(env),
            "RTMinimax": lambda: MM.rt_minimax_bot(env),
            "IDRTMinimax": lambda: MM.idrt_minimax_bot(env),
            "IDRTMinimaxRandomized":
                lambda: MM.idrt_minimax_randomized_bot(env),
            "CooperativeAI": lambda: _cooperative(env),
        }
    registry.update(_search())
    if name not in registry:
        raise ValueError(
            f"unknown AI {name!r}; available: {sorted(registry)}")
    return registry[name]()
