"""Checkpoint surgery — the roles of the reference's `clean_checkpoint.py`
(strip training state for release, reference python/clean_checkpoint.py) and
`edit_checkpoint.py` (dump/overwrite checkpoint contents,
reference python/edit_checkpoint.py), adapted to this package's checkpoint
format (dataio/checkpoints.py: JSON meta header + flax msgpack TrainState).

Actions:
  dump    print the meta header and a parameter-tree summary as JSON
          (edit_checkpoint -output-json-to role)
  edit    overwrite meta header fields in place, e.g. -set train_step=0
          (edit_checkpoint -overwrite-checkpoint-from-json role)
  export  write the EMA (or raw) params as a complete exported model dir —
          the release artifact; dropping the optimizer/EMA state is the
          clean_checkpoint role (in this framework "release" = the exported
          model dir consumed by selfplay/gtp/analysis, not a slimmer ckpt)
"""

from __future__ import annotations

import argparse
import json
import os


def _read_raw(path: str):
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    return meta, blob


def _write_raw(path: str, meta: dict, blob: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(len(json.dumps(meta).encode()).to_bytes(8, "little"))
        f.write(json.dumps(meta).encode())
        f.write(blob)
    os.replace(tmp, path)


def _tree_summary(tree, prefix: str = "") -> tuple[list[str], int]:
    """(lines, total_elements) over a msgpack_restore'd nested dict."""
    import numpy as np

    lines: list[str] = []
    total = 0
    if isinstance(tree, dict):
        for k in sorted(tree):
            sub, n = _tree_summary(tree[k], f"{prefix}/{k}" if prefix else str(k))
            lines.extend(sub)
            total += n
    elif hasattr(tree, "shape"):
        arr = np.asarray(tree)
        lines.append(f"{prefix}: {arr.dtype} {list(arr.shape)}")
        total += int(arr.size)
    else:
        lines.append(f"{prefix}: {tree!r}")
    return lines, total


def main_dump(args: argparse.Namespace) -> int:
    from flax import serialization

    meta, blob = _read_raw(args.checkpoint)
    state = serialization.msgpack_restore(blob)
    out: dict = {"meta": meta}
    for field in state if isinstance(state, dict) else {}:
        lines, total = _tree_summary(state[field])
        out[field] = {"num_elements": total}
        if args.shapes:
            out[field]["leaves"] = lines
    text = json.dumps(out, indent=2, default=str)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(text)
        print(f"dumped {args.checkpoint} -> {args.out_json}")
    else:
        print(text)
    return 0


def main_edit(args: argparse.Namespace) -> int:
    meta, blob = _read_raw(args.checkpoint)
    for kv in args.set or []:
        if "=" not in kv:
            raise SystemExit(f"-set expects key=value, got {kv!r}")
        k, v = kv.split("=", 1)
        try:
            meta[k] = json.loads(v)
        except json.JSONDecodeError:
            meta[k] = v
        print(f"set {k} = {meta[k]!r}")
    _write_raw(args.checkpoint, meta, blob)
    print(f"updated {args.checkpoint}")
    return 0


def main_export(args: argparse.Namespace) -> int:
    import jax
    from flax import serialization

    from katacoffee_tpu.dataio.checkpoints import export_model
    from katacoffee_tpu.game.board import GameConfig
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.train import TrainConfig, init_train_state

    cfg = GameConfig(args.x_size, args.y_size, args.win_len)
    model = CoffeeNet(get_model_spec(args.model), win_len=cfg.win_len)
    template = init_train_state(
        model, cfg, TrainConfig(), batch_size=8, rng=jax.random.PRNGKey(0)
    )
    meta, blob = _read_raw(args.checkpoint)
    state = serialization.from_bytes(template, blob)
    params = state.params if args.raw_params else state.ema_params
    step = int(meta.get("train_step", int(state.step)))
    name = args.name or f"export-s{step}"
    out = export_model(
        args.out_dir,
        name,
        params,
        args.model,
        cfg,
        extra={"train_step": step, "from_checkpoint": os.path.abspath(args.checkpoint)},
    )
    print(f"exported {'raw' if args.raw_params else 'EMA'} params -> {out}")
    return 0


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="katacoffee checkpoint")
    sub = ap.add_subparsers(dest="action", required=True)

    d = sub.add_parser("dump", help="print meta + parameter summary as JSON")
    d.add_argument("-checkpoint", required=True)
    d.add_argument("-out-json", default=None)
    d.add_argument("-shapes", action="store_true", help="list every leaf shape")

    e = sub.add_parser("edit", help="overwrite meta header fields in place")
    e.add_argument("-checkpoint", required=True)
    e.add_argument("-set", action="append", metavar="key=value")

    x = sub.add_parser("export", help="export ckpt params as a model dir")
    x.add_argument("-checkpoint", required=True)
    x.add_argument("-model", required=True, help="model spec name, e.g. b6c96")
    x.add_argument("-out-dir", required=True)
    x.add_argument("-name", default=None)
    x.add_argument("-x-size", type=int, default=5)
    x.add_argument("-y-size", type=int, default=5)
    x.add_argument("-win-len", type=int, default=4)
    x.add_argument(
        "-raw-params", action="store_true", help="export raw instead of EMA params"
    )

    args = ap.parse_args(argv)
    return {"dump": main_dump, "edit": main_edit, "export": main_export}[args.action](
        args
    )
