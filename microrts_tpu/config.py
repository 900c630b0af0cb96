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
}


def make_bot(name: str, env) -> "callable":
    """Bot factory by (Java or short) name."""
    from .bots import scripted as S

    name = JAVA_AI_ALIASES.get(name, name)
    registry = {
        "PassiveAI": lambda: S.passive_bot(env),
        "RandomAI": lambda: S.random_bot(env, 1.0),
        "RandomBiasedAI": lambda: S.random_bot(env, 5.0),
        "WorkerRush": lambda: S.worker_rush(env),
        "LightRush": lambda: S.light_rush(env),
        "HeavyRush": lambda: S.heavy_rush(env),
        "RangedRush": lambda: S.ranged_rush(env),
        "POWorkerRush": lambda: S.po_worker_rush(env),
        "POLightRush": lambda: S.po_light_rush(env),
        "POHeavyRush": lambda: S.po_heavy_rush(env),
        "PORangedRush": lambda: S.po_ranged_rush(env),
    }

    def _search():
        from .bots import search as SE
        from .bots import treesearch as TS
        return {
            "MonteCarlo": lambda: SE.monte_carlo_bot(env),
            "NaiveMCTS": lambda: TS.naive_mcts_bot(env),
            "UCT": lambda: TS.uct_tree_bot(env),
            "DownsamplingUCT": lambda: TS.uct_tree_bot(env,
                                                       n_candidates=4),
        }
    registry.update(_search())
    if name not in registry:
        raise ValueError(
            f"unknown AI {name!r}; available: {sorted(registry)}")
    return registry[name]()
