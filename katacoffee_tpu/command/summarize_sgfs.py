"""summarize_sgfs: scan SGF dirs, tally results per player pair, fit Elos.

The role of the reference's `python/summarize_sgfs.py` + `python/elo.py`
(SURVEY.md §5 metrics): point it at match/gatekeeper SGF output dirs and get
a result matrix + MLE Elo table. Games are replayed through the native C++
rules core when available (validating every SGF byte), otherwise results are
taken from the RE tag.
"""

from __future__ import annotations

import os

from katacoffee_tpu.dataio.sgf import parse_sgf_file
from katacoffee_tpu.utils import compute_elos


def collect_results(sgf_dirs: list[str], validate: bool = True) -> list[tuple]:
    """Returns records [(black, white, wins_b, wins_w, draws)] aggregated per
    (black, white) pairing."""
    try:
        from katacoffee_tpu.native import NativeGame, native_available

        use_native = validate and native_available()
    except ImportError:
        use_native = False

    tally: dict[tuple, list] = {}
    skipped = 0
    for d in sgf_dirs:
        for root, _dirs, files in os.walk(d):
            for name in sorted(files):
                if not name.endswith(".sgf"):
                    continue
                path = os.path.join(root, name)
                try:
                    sgf = parse_sgf_file(path)
                except (ValueError, OSError):
                    skipped += 1
                    continue
                pb = sgf.root.get("PB") or "black"
                pw = sgf.root.get("PW") or "white"
                re = sgf.result()
                if re is None:
                    skipped += 1
                    continue
                if use_native:
                    x, y = sgf.board_size()
                    g = NativeGame(x, y, sgf.win_len())
                    ok = True
                    for mx, my, md, _pla in sgf.moves():
                        if not g.play(mx, my, md):
                            ok = False
                            break
                    if not ok:
                        skipped += 1
                        continue
                    if g.done:
                        re = {1: "B+", 2: "W+", 0: "0"}[g.winner]
                key = (pb, pw)
                t = tally.setdefault(key, [0, 0, 0])
                if re.startswith("B+"):
                    t[0] += 1
                elif re.startswith("W+"):
                    t[1] += 1
                else:
                    t[2] += 1
    records = [(pb, pw, t[0], t[1], t[2]) for (pb, pw), t in sorted(tally.items())]
    if skipped:
        print(f"skipped {skipped} unreadable/invalid SGFs")
    return records


def main(argv, **kw):
    import argparse

    ap = argparse.ArgumentParser(prog="katacoffee summarize_sgfs")
    ap.add_argument("sgf_dirs", nargs="+")
    ap.add_argument("-prior-games", type=float, default=2.0)
    ap.add_argument("-no-validate", action="store_true")
    args = ap.parse_args(argv)

    records = collect_results(args.sgf_dirs, validate=not args.no_validate)
    if not records:
        print("no results found")
        return
    total = 0
    for pb, pw, wb, ww, dr in records:
        total += wb + ww + dr
        print(f"{pb} (B) vs {pw} (W): {wb}-{ww}-{dr}")
    print(f"total games: {total}")
    elos = compute_elos(records, prior_games=args.prior_games)
    print()
    print(f"{'player':30s} {'elo':>8s} {'stdev':>7s}")
    for name, (e, s) in sorted(elos.as_dict().items(), key=lambda kv: -kv[1][0]):
        print(f"{name:30s} {e:8.1f} {s:7.1f}")
