"""Data I/O: SGF games, npz training data, shuffling, checkpoints/model
polling — the equivalent of the reference's `cpp/dataio/` + the file-bus
conventions of its training loop (SURVEY.md §2.4, §2.8 P6)."""

from katacoffee_tpu.dataio.sgf import Sgf, SgfNode, write_sgf, parse_sgf, parse_sgf_file
from katacoffee_tpu.dataio.trainingwrite import TrainingDataWriter, read_npz_rows
from katacoffee_tpu.dataio.shuffle import compute_window_size, shuffle_data
from katacoffee_tpu.dataio.checkpoints import (
    save_checkpoint,
    load_checkpoint,
    export_model,
    load_exported_model,
    find_latest_model,
)

__all__ = [
    "Sgf",
    "SgfNode",
    "write_sgf",
    "parse_sgf",
    "parse_sgf_file",
    "TrainingDataWriter",
    "read_npz_rows",
    "save_checkpoint",
    "load_checkpoint",
    "export_model",
    "load_exported_model",
    "find_latest_model",
    "compute_window_size",
    "shuffle_data",
]
