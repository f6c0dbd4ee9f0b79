"""Native (C++) runtime components, loaded via ctypes.

The reference's engine is native C++ end-to-end; in the TPU design the
compute path is XLA-compiled, and the native layer covers what stays on the
host: exact game logic for GTP validation and SGF replay, the second oracle
for env parity tests, and fast batch playouts. Built on demand with g++
(no pybind11 in this environment — plain C ABI + ctypes), cached by source
hash under ~/.cache/katacoffee_tpu (the same role as the reference's
per-user tuner cache, cpp/dataio/homedata.cpp).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "coffee_core.cpp")


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "katacoffee_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"coffee_core_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    with tempfile.TemporaryDirectory() as td:
        tmp_so = os.path.join(td, "coffee_core.so")
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp_so],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_so, so_path)
    return so_path


_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    lib.cc_game_size.restype = ctypes.c_int32
    lib.cc_init.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.cc_is_legal.restype = ctypes.c_int32
    lib.cc_is_legal.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
    lib.cc_legal_mask.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.cc_play.restype = ctypes.c_int32
    lib.cc_play.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
    for name in ("cc_done", "cc_winner", "cc_to_move", "cc_num_turns", "cc_last_spot", "cc_last_dir"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int32
        fn.argtypes = [ctypes.c_void_p]
    lib.cc_board.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.cc_per_cell_max_run.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.cc_random_playouts.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.cc_replay.restype = ctypes.c_int32
    lib.cc_replay.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    _lib = lib
    return lib


class NativeGame:
    """ctypes wrapper over one native Game — same surface as the Python test
    oracle, backed by the C++ core."""

    def __init__(self, x_size: int = 5, y_size: int = 5, win_len: int = 4):
        self.lib = load_library()
        self.x_size, self.y_size, self.win_len = x_size, y_size, win_len
        self._buf = ctypes.create_string_buffer(self.lib.cc_game_size())
        self.lib.cc_init(self._buf, x_size, y_size, win_len)

    @property
    def done(self) -> bool:
        return bool(self.lib.cc_done(self._buf))

    @property
    def winner(self) -> int:
        return self.lib.cc_winner(self._buf)

    @property
    def to_move(self) -> int:
        return self.lib.cc_to_move(self._buf)

    @property
    def num_turns(self) -> int:
        return self.lib.cc_num_turns(self._buf)

    def is_legal(self, x: int, y: int, d: int) -> bool:
        return bool(self.lib.cc_is_legal(self._buf, x, y, d))

    def legal_mask(self) -> np.ndarray:
        out = np.zeros((4 * self.y_size * self.x_size,), np.uint8)
        self.lib.cc_legal_mask(self._buf, out.ctypes.data_as(ctypes.c_void_p))
        return out.astype(bool)

    def play(self, x: int, y: int, d: int) -> bool:
        return bool(self.lib.cc_play(self._buf, x, y, d))

    def play_action(self, action: int) -> bool:
        area = self.x_size * self.y_size
        d, spot = action // area, action % area
        return self.play(spot % self.x_size, spot // self.x_size, d)

    def replay(self, actions) -> int:
        arr = np.asarray(actions, np.int32)
        return self.lib.cc_replay(
            self._buf, arr.ctypes.data_as(ctypes.c_void_p), len(arr)
        )

    def board(self) -> np.ndarray:
        out = np.zeros((self.y_size, self.x_size), np.int8)
        self.lib.cc_board(self._buf, out.ctypes.data_as(ctypes.c_void_p))
        return out

    def per_cell_max_run(self) -> np.ndarray:
        out = np.zeros((self.y_size, self.x_size), np.int32)
        self.lib.cc_per_cell_max_run(self._buf, out.ctypes.data_as(ctypes.c_void_p))
        return out


def random_playouts(x_size: int, y_size: int, win_len: int, seed: int, n_games: int) -> np.ndarray:
    """[n_games, 2] array of (winner, num_turns) from full random games."""
    lib = load_library()
    out = np.zeros((n_games, 2), np.int32)
    lib.cc_random_playouts(
        x_size, y_size, win_len, seed, n_games, out.ctypes.data_as(ctypes.c_void_p)
    )
    return out


def native_available() -> bool:
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False
