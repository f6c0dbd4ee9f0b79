"""Game orchestration: host engine facade, match running, gating — the
equivalent of the reference's `cpp/program/` layer (SURVEY.md §2.5)."""

from katacoffee_tpu.program.engine import Engine, MoveInfo, AnalysisResult

__all__ = ["Engine", "MoveInfo", "AnalysisResult"]
