"""microrts_tpu: a TPU-native (JAX/XLA) reimplementation of microRTS.

Reference: ConnAALL/MicroRTS (pure Java).  The engine is a pure, fixed-shape
``jit``/``vmap`` state transition (``microrts_tpu.engine``); the vectorized RL
environment API lives in ``microrts_tpu.env``; scripted opponents in
``microrts_tpu.bots``; multi-host sharding in ``microrts_tpu.parallel``.
"""

__version__ = "0.1.0"

from .engine.utt import (  # noqa: F401
    UnitTypeTable,
    VERSION_ORIGINAL,
    VERSION_ORIGINAL_FINETUNED,
    VERSION_NON_DETERMINISTIC,
    MOVE_CONFLICT_RESOLUTION_CANCEL_BOTH,
    MOVE_CONFLICT_RESOLUTION_CANCEL_RANDOM,
    MOVE_CONFLICT_RESOLUTION_CANCEL_ALTERNATING,
)
from .engine.pgs import PhysicalGameState  # noqa: F401
