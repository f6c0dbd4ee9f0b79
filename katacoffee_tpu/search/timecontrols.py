"""Time controls: Fischer and byo-yomi budgeting — the role of the
reference's `cpp/search/timecontrols.{h,cpp}` (TimeControls, timecontrols.h:8)
and the lag/buffer shaping of `searchtimehelpers.cpp`.

The reference's search is wall-clock-bounded (threads poll a deadline); our
lockstep search is visit-bounded (one compiled program runs a fixed number of
sims). The adapter: compute the time budget for this move exactly as the
reference does, then convert it to a visit cap using the engine's measured
visits/second (the quantity `katago benchmark` reports). This keeps the
behavioral contract of GTP time_settings/time_left while staying
compile-friendly.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TimeControls:
    """State of one player's clock. Mirrors TimeControls fields
    (timecontrols.h:10-34): system NONE / ABSOLUTE / FISCHER / BYO_YOMI."""

    system: str = "none"  # none | absolute | fischer | byo_yomi
    main_time_left: float = 0.0
    increment: float = 0.0  # fischer
    period_time: float = 0.0  # byo-yomi
    periods_left: int = 0
    in_overtime: bool = False

    @staticmethod
    def absolute(main_time: float) -> "TimeControls":
        return TimeControls(system="absolute", main_time_left=main_time)

    @staticmethod
    def fischer(main_time: float, increment: float) -> "TimeControls":
        return TimeControls(system="fischer", main_time_left=main_time, increment=increment)

    @staticmethod
    def byo_yomi(main_time: float, period_time: float, periods: int) -> "TimeControls":
        return TimeControls(
            system="byo_yomi",
            main_time_left=main_time,
            period_time=period_time,
            periods_left=periods,
        )

    def time_for_move(self, moves_left_estimate: int = 12, lag_buffer: float = 0.2) -> float:
        """Seconds to spend on this move (TimeControls::getLimits semantics,
        simplified: spread main time over an estimated remaining-move count,
        add the per-move increment/period, keep a lag buffer)."""
        if self.system == "none":
            return float("inf")
        main = max(self.main_time_left - lag_buffer, 0.0)
        if self.system == "absolute":
            return main / max(moves_left_estimate, 1)
        if self.system == "fischer":
            return main / max(moves_left_estimate, 1) + max(self.increment - lag_buffer, 0.0)
        if self.system == "byo_yomi":
            if self.main_time_left > lag_buffer:
                # spend down main time, keeping periods in reserve
                return main / max(moves_left_estimate, 1)
            if self.periods_left >= 1:
                # in overtime: use one period per move, minus safety margin
                return max(self.period_time - lag_buffer, 0.01)
            return 0.01
        raise ValueError(f"unknown time system {self.system}")

    def update_after_move(self, time_used: float):
        """Apply clock accounting after spending `time_used` seconds."""
        if self.system == "none":
            return
        if self.system == "fischer":
            self.main_time_left = self.main_time_left - time_used + self.increment
        elif self.system == "absolute":
            self.main_time_left -= time_used
        elif self.system == "byo_yomi":
            if self.main_time_left > 0:
                self.main_time_left -= time_used
                if self.main_time_left < 0:
                    self.in_overtime = True
                    self.main_time_left = 0.0
            else:
                self.in_overtime = True
                # a move within the period resets it; exceeding consumes periods
                over = time_used - self.period_time
                while over > 0 and self.periods_left > 1:
                    self.periods_left -= 1
                    over -= self.period_time


def visits_for_time(
    time_budget: float,
    visits_per_second: float,
    max_visits: int,
    min_visits: int = 2,
) -> int:
    """Convert a seconds budget into a visit cap given measured throughput."""
    if time_budget == float("inf"):
        return max_visits
    v = int(time_budget * visits_per_second)
    return max(min_visits, min(v, max_visits))
