"""validate: evaluate an exported model on written training rows.

The role of the reference's `python/test.py` (244 LoC standalone harness:
load a model, stream npz batches through the loss metrics, print
aggregates): `python -m katacoffee_tpu validate <model_dir> <data_dir ...>`
prints one JSON object of weight-averaged loss metrics over the rows —
useful for comparing exported models on a fixed held-out set without a
trainer checkpoint."""

from __future__ import annotations

import json


def main(argv, **kw):
    import argparse

    import jax

    from katacoffee_tpu.dataio.checkpoints import load_exported_model
    from katacoffee_tpu.dataio.trainingwrite import (
        iter_shards,
        read_npz_rows,
        rows_to_batch,
    )
    from katacoffee_tpu.train import compute_losses

    ap = argparse.ArgumentParser(prog="katacoffee validate")
    ap.add_argument("model_dir")
    ap.add_argument("data_dirs", nargs="+", help="dirs of .npz training rows")
    ap.add_argument("-max-rows", type=int, default=100000)
    args = ap.parse_args(argv)

    model, params, cfg, meta = load_exported_model(args.model_dir)
    loss_fn = jax.jit(lambda p, b: compute_losses(cfg, model, p, b)[1])

    totals: dict[str, float] = {}
    wsum = 0.0
    rows = 0
    for d in args.data_dirs:
        for shard in iter_shards(d):
            batch = rows_to_batch(read_npz_rows(shard), cfg)
            n = int(batch.weight.shape[0])
            if n == 0:
                continue
            m = loss_fn(params, batch)
            w = float(m["weight_sum"])
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v) * (
                    w if k != "weight_sum" else 1.0
                )
            wsum += w
            rows += n
            if rows >= args.max_rows:
                break
        if rows >= args.max_rows:
            break
    if wsum <= 0:
        print(json.dumps({"error": "no rows found"}))
        return 1
    out = {k: (v / wsum if k != "weight_sum" else v) for k, v in totals.items()}
    out["rows"] = rows
    out["model"] = args.model_dir
    print(json.dumps({k: round(v, 6) if isinstance(v, float) else v for k, v in out.items()}))
    return 0
