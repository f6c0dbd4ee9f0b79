// Native Coffee rules core.
//
// The framework's native runtime piece for host-side game logic — the role
// the reference's C++ `cpp/game/board.{h,cpp}` plays outside the NN hot path
// (GTP move validation, SGF replay, match/Elo summaries, and an independent
// second oracle for parity tests of the JAX env). Semantics are transcribed
// from the reference spec with its enumerated compile bugs repaired
// (SURVEY.md §0): legality = empty ∧ on-last-move-line ∧ the move's own line
// keeps ≥2 empty cells (board.cpp:185-227); the game ends the instant the
// mover completes win_len in a row through the played spot
// (board.cpp:376-383, boardhistory.cpp:171-175); our frozen rule: a player
// with no legal move loses nothing — the game is an immediate draw.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// All functions are reentrant; a Game is a caller-owned opaque blob.

#include <cstdint>
#include <cstring>

namespace {

constexpr int MAX_LEN = 19;
constexpr int MAX_AREA = MAX_LEN * MAX_LEN;

constexpr int D_NORTH = 0, D_WEST = 1, D_NORTHWEST = 2, D_NORTHEAST = 3, D_NONE = 4;
constexpr int8_t C_EMPTY = 0;

// (dy, dx) per direction, reference ADJ1..ADJ4 (board.cpp:82-85)
constexpr int DY[4] = {-1, 0, -1, -1};
constexpr int DX[4] = {0, -1, -1, 1};

struct Game {
  int32_t x_size;
  int32_t y_size;
  int32_t win_len;
  int32_t to_move;    // 1 black, 2 white
  int32_t last_spot;  // flat y*x+x, -1 none
  int32_t last_dir;   // 0..3, 4 = none
  int32_t done;       // 0/1
  int32_t winner;     // 0 draw/none, 1, 2
  int32_t num_turns;
  int8_t board[MAX_AREA];
};

inline bool on_board(const Game* g, int x, int y) {
  return x >= 0 && x < g->x_size && y >= 0 && y < g->y_size;
}

// Count empty cells on the maximal line through (x, y) along ±dir.
// Walls bound the line; stones do NOT (board.cpp:213-226 repaired intent).
int line_empty_count(const Game* g, int x, int y, int dir) {
  int count = (g->board[y * g->x_size + x] == C_EMPTY) ? 1 : 0;
  for (int sign = -1; sign <= 1; sign += 2) {
    int cx = x + sign * DX[dir], cy = y + sign * DY[dir];
    while (on_board(g, cx, cy)) {
      if (g->board[cy * g->x_size + cx] == C_EMPTY) count++;
      cx += sign * DX[dir];
      cy += sign * DY[dir];
    }
  }
  return count;
}

bool on_last_move_line(const Game* g, int x, int y) {
  if (g->last_dir == D_NONE || g->last_spot < 0) return true;
  int lx = g->last_spot % g->x_size, ly = g->last_spot / g->x_size;
  int dx = x - lx, dy = y - ly;
  switch (g->last_dir) {  // board.cpp:194-209
    case D_NORTH: return dx == 0 && dy != 0;
    case D_WEST: return dy == 0 && dx != 0;
    case D_NORTHWEST: return dx == dy;      // excludes same cell via empty chk
    case D_NORTHEAST: return dx == -dy;
    default: return true;
  }
}

bool is_legal(const Game* g, int x, int y, int dir) {
  if (g->done) return false;
  if (!on_board(g, x, y) || dir < 0 || dir >= 4) return false;
  if (g->board[y * g->x_size + x] != C_EMPTY) return false;
  if (!on_last_move_line(g, x, y)) return false;
  // the move's own line must keep an empty cell for the reply
  // (this cell counts 1; need >= 2)
  return line_empty_count(g, x, y, dir) >= 2;
}

// Longest same-color run through (x, y) over all 4 directions
// (Board::maxConsecutives, board.cpp:315-335).
int max_consecutives(const Game* g, int x, int y) {
  int8_t c = g->board[y * g->x_size + x];
  int best = 0;
  for (int dir = 0; dir < 4; dir++) {
    int run = 1;
    for (int sign = -1; sign <= 1; sign += 2) {
      int cx = x + sign * DX[dir], cy = y + sign * DY[dir];
      while (on_board(g, cx, cy) && g->board[cy * g->x_size + cx] == c) {
        run++;
        cx += sign * DX[dir];
        cy += sign * DY[dir];
      }
    }
    if (run > best) best = run;
  }
  return best;
}

bool any_legal_move(const Game* g) {
  for (int y = 0; y < g->y_size; y++)
    for (int x = 0; x < g->x_size; x++)
      for (int d = 0; d < 4; d++)
        if (is_legal(g, x, y, d)) return true;
  return false;
}

}  // namespace

extern "C" {

int32_t cc_game_size() { return (int32_t)sizeof(Game); }

void cc_init(Game* g, int32_t x_size, int32_t y_size, int32_t win_len) {
  std::memset(g, 0, sizeof(Game));
  g->x_size = x_size;
  g->y_size = y_size;
  g->win_len = win_len;
  g->to_move = 1;
  g->last_spot = -1;
  g->last_dir = D_NONE;
}

int32_t cc_is_legal(const Game* g, int32_t x, int32_t y, int32_t dir) {
  return is_legal(g, x, y, dir) ? 1 : 0;
}

// out: uint8[4 * y_size * x_size], dir-major (NNPos layout, nninputs.h:22-27)
void cc_legal_mask(const Game* g, uint8_t* out) {
  int area = g->x_size * g->y_size;
  for (int d = 0; d < 4; d++)
    for (int y = 0; y < g->y_size; y++)
      for (int x = 0; x < g->x_size; x++)
        out[d * area + y * g->x_size + x] = is_legal(g, x, y, d) ? 1 : 0;
}

// Play (x, y, dir). Returns 0 on illegal (state unchanged), 1 on success.
int32_t cc_play(Game* g, int32_t x, int32_t y, int32_t dir) {
  if (!is_legal(g, x, y, dir)) return 0;
  g->board[y * g->x_size + x] = (int8_t)g->to_move;
  g->last_spot = y * g->x_size + x;
  g->last_dir = dir;
  g->num_turns++;
  if (max_consecutives(g, x, y) >= g->win_len) {
    g->done = 1;
    g->winner = g->to_move;
  }
  g->to_move = 3 - g->to_move;
  if (!g->done && !any_legal_move(g)) {
    g->done = 1;  // frozen rule: no legal reply -> draw
    g->winner = 0;
  }
  return 1;
}

int32_t cc_done(const Game* g) { return g->done; }
int32_t cc_winner(const Game* g) { return g->winner; }
int32_t cc_to_move(const Game* g) { return g->to_move; }
int32_t cc_num_turns(const Game* g) { return g->num_turns; }
int32_t cc_last_spot(const Game* g) { return g->last_spot; }
int32_t cc_last_dir(const Game* g) { return g->last_dir; }

void cc_board(const Game* g, int8_t* out) {
  std::memcpy(out, g->board, (size_t)(g->x_size * g->y_size));
}

// Per-cell longest same-color run (recordMaxConsecutives, board.cpp:336-375)
void cc_per_cell_max_run(const Game* g, int32_t* out) {
  for (int y = 0; y < g->y_size; y++)
    for (int x = 0; x < g->x_size; x++)
      out[y * g->x_size + x] = max_consecutives(g, x, y);
}

// Fast random playout batch (xorshift64 PRNG, deterministic by seed):
// plays `n_games` full random-legal games; writes per game
// [winner, num_turns] into results[2 * i .. 2 * i + 1]. Used by parity
// stress tests and as a rollout microbenchmark.
void cc_random_playouts(
    int32_t x_size, int32_t y_size, int32_t win_len,
    uint64_t seed, int32_t n_games, int32_t* results) {
  Game g;
  for (int i = 0; i < n_games; i++) {
    cc_init(&g, x_size, y_size, win_len);
    uint64_t s = seed + (uint64_t)i * 0x9E3779B97F4A7C15ULL;
    int area = x_size * y_size;
    int moves[MAX_AREA * 4];
    while (!g.done) {
      int n = 0;
      for (int d = 0; d < 4; d++)
        for (int y = 0; y < y_size; y++)
          for (int x = 0; x < x_size; x++)
            if (is_legal(&g, x, y, d)) moves[n++] = d * area + y * x_size + x;
      if (n == 0) break;
      s ^= s << 13; s ^= s >> 7; s ^= s << 17;
      int a = moves[s % (uint64_t)n];
      cc_play(&g, (a % area) % x_size, (a % area) / x_size, a / area);
    }
    results[2 * i] = g.winner;
    results[2 * i + 1] = g.num_turns;
  }
}

// Replay a move sequence (flat dir-major actions). Returns the number of
// moves successfully applied (== n_moves iff the whole sequence is legal).
int32_t cc_replay(Game* g, const int32_t* actions, int32_t n_moves) {
  int area = g->x_size * g->y_size;
  for (int i = 0; i < n_moves; i++) {
    int a = actions[i];
    if (!cc_play(g, (a % area) % g->x_size, (a % area) / g->x_size, a / area))
      return i;
  }
  return n_moves;
}

}  // extern "C"
