"""Independent scalar Python oracle of the Coffee rules, transcribed directly
from the reference spec (KataCoffee cpp/game/board.cpp with its enumerated
compile bugs repaired — see SURVEY.md §0). Deliberately written as cell-by-cell
scans (the reference's algorithm shape) so it shares no code path with the
vectorized JAX implementation it is used to verify.
"""

from __future__ import annotations

import dataclasses

EMPTY, BLACK, WHITE = 0, 1, 2
# (dy, dx) per direction 0=N,1=W,2=NW,3=NE — reference ADJ1..ADJ4 board.cpp:82-85
OFFSETS = [(-1, 0), (0, -1), (-1, -1), (-1, 1)]
D_NONE = 4


@dataclasses.dataclass
class OracleGame:
    x_size: int = 5
    y_size: int = 5
    win_len: int = 4

    def __post_init__(self):
        self.board = [[EMPTY] * self.x_size for _ in range(self.y_size)]
        self.to_move = BLACK
        self.last_xy = None  # (x, y)
        self.last_dir = D_NONE
        self.done = False
        self.winner = 0
        self.num_turns = 0
        self.history = []  # list of (x, y, dir, player)

    def on_board(self, x, y):
        return 0 <= x < self.x_size and 0 <= y < self.y_size

    def is_legal(self, x, y, direction):
        """Reference Board::isLegal (board.cpp:185-227), repaired."""
        if self.done:
            return False
        if not self.on_board(x, y) or self.board[y][x] != EMPTY:
            return False
        # (b) line constraint from last move (board.cpp:190-212)
        if self.last_dir != D_NONE:
            lx, ly = self.last_xy
            dx, dy = x - lx, y - ly
            if self.last_dir == 0:  # N: same column, different cell
                if dx != 0 or dy == 0:
                    return False
            elif self.last_dir == 1:  # W: same row, different cell
                if dx == 0 or dy != 0:
                    return False
            elif self.last_dir == 2:  # NW
                if dx != dy:
                    return False
            elif self.last_dir == 3:  # NE
                if dx != -dy:
                    return False
        # (c) an empty cell other than (x,y) exists on the full line through
        # (x,y) along ±direction; stones do not stop the scan (board.cpp:213-226)
        dy_, dx_ = OFFSETS[direction]
        for sign in (1, -1):
            cx, cy = x + sign * dx_, y + sign * dy_
            while self.on_board(cx, cy):
                if self.board[cy][cx] == EMPTY:
                    return True
                cx += sign * dx_
                cy += sign * dy_
        return False

    def legal_moves(self):
        """All legal (x, y, dir) triples."""
        return [
            (x, y, d)
            for d in range(4)
            for y in range(self.y_size)
            for x in range(self.x_size)
            if self.is_legal(x, y, d)
        ]

    def max_consecutives(self, x, y):
        """Reference Board::maxConsecutives (board.cpp:315-335)."""
        color = self.board[y][x]
        best = 1
        for dy_, dx_ in OFFSETS:
            n = 1
            for sign in (1, -1):
                cx, cy = x + sign * dx_, y + sign * dy_
                while self.on_board(cx, cy) and self.board[cy][cx] == color:
                    n += 1
                    cx += sign * dx_
                    cy += sign * dy_
            best = max(best, n)
        return best

    def per_cell_max_run(self):
        """Per-cell longest same-color run over the 4 directions (the intent
        of recordMaxConsecutives, board.cpp:336-375)."""
        out = [[0] * self.x_size for _ in range(self.y_size)]
        for y in range(self.y_size):
            for x in range(self.x_size):
                out[y][x] = self.max_consecutives(x, y)
        return out

    def play(self, x, y, direction):
        assert self.is_legal(x, y, direction), (x, y, direction)
        self.board[y][x] = self.to_move
        self.history.append((x, y, direction, self.to_move))
        self.last_xy = (x, y)
        self.last_dir = direction
        mover = self.to_move
        self.to_move = 3 - self.to_move
        self.num_turns += 1
        if self.max_consecutives(x, y) >= self.win_len:
            self.done = True
            self.winner = mover
        elif not self.legal_moves():
            # frozen rule: opponent stuck -> draw (SURVEY.md §2.1 decision)
            self.done = True
            self.winner = 0
