"""Game orchestration: host engine facade, match running, gating — the
equivalent of the reference's `cpp/program/` layer (SURVEY.md §2.5)."""

from katacoffee_tpu.program.engine import Engine, MoveInfo, AnalysisResult
from katacoffee_tpu.program.setup import load_game_config, load_search_params

__all__ = [
    "Engine",
    "MoveInfo",
    "AnalysisResult",
    "load_game_config",
    "load_search_params",
]
