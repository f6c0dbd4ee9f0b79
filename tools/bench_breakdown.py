#!/usr/bin/env python3
"""Per-phase time split of the headline bench (VERDICT r3 weak-1: the
descent-gather / NN / backup breakdown artifact that directs optimization).

Method: AOT-compile the bench's selfplay segment, map every HLO instruction
to a source phase via its metadata (source_file / source_line —
jax.named-scope-free, robust to fusion), trace ONE segment execution with
jax.profiler, aggregate device-op durations by phase, and report RELATIVE
shares normalized to an untraced forced-fetch wall clock. Traces through the
axon tunnel inflate absolute durations ~5-10x (CLAUDE.md timing-trust note),
so only the *shares* come from the trace; the wall seconds they're scaled to
are real.

Phases:
  nn        — model forward (nn/model.py + flax internals)
  features  — NN input planes (nn/features.py)
  descent   — PUCT select + path walk (mcts.py Descent section + helpers)
  expand    — env step, hash match, node alloc (mcts.py Expansion section)
  backup    — stats walk-up + node value recompute (Backup + _recompute_node)
  rooteval  — init_tree / root prior / root symmetry machinery
  reuse     — advance_root tree compaction
  moveselect— select_moves / play-selection weights
  env       — game/board.py rules ops outside expand
  other     — everything else (infeed, copies, unattributed)

Writes artifacts/bench_phase_split.json. Run on the real TPU (ONE TPU
process at a time): python tools/bench_breakdown.py
CPU smoke test:      python tools/bench_breakdown.py --platform cpu --batch 16 --sims 50
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# dedicated cache: the shared cache's key ignores metadata, so it can serve
# an executable whose op_name scope markers predate the current source —
# delete this dir after changing named scopes in mcts.py
CACHE = os.environ.get("KC_JAX_CACHE", "/root/repo/.jax_cache_phase")
TRACE_DIR = "/tmp/kc_phase_trace"


# ---------------------------------------------------------------------------
# source -> phase classification
# ---------------------------------------------------------------------------

def build_line_classifier():
    """Return fn(source_file, source_line) -> phase, built from the actual
    mcts.py function spans + section markers so line drift never stales."""
    import ast

    mcts_path = os.path.join(REPO, "katacoffee_tpu", "search", "mcts.py")
    src = open(mcts_path).read()
    lines = src.splitlines()
    spans = {}  # name -> (lo, hi)
    for n in ast.parse(src).body:
        if isinstance(n, ast.FunctionDef):
            spans[n.name] = (n.lineno, n.end_lineno)

    fn_phase = {
        "_select_action": "descent",
        "_gather_child_stats": "descent",
        "_edge_stats_from_raw": "descent",
        "_child_edge_stats": "descent",
        "_child_utility_stdev": "descent",
        "_recompute_node": "backup",
        "_bias_keys": "backup",
        "_bias_avg": "backup",
        "advance_root": "reuse",
        "init_tree": "rooteval",
        "_tree_from_root_eval": "rooteval",
        "_root_eval": "rooteval",
        "_make_root_prior": "rooteval",
        "_add_dirichlet_noise": "rooteval",
        "_root_symmetry_prune": "rooteval",
        "_sym_action_table": "rooteval",
        "select_moves": "moveselect",
        "root_play_selection_weights": "moveselect",
        "_root_explore_scaling": "moveselect",
        "root_values": "moveselect",
        "root_visit_counts": "moveselect",
        "root_child_weights": "moveselect",
        "policy_target": "moveselect",
    }

    # section markers inside the big per-sim bodies
    sections = []  # (start_line, phase), applies within its enclosing fn
    for i, ln in enumerate(lines, 1):
        m = re.search(r"#\s*-+\s*(Descent|Expansion|Backup)\s*-+", ln)
        if m:
            sections.append((i, {"Descent": "descent", "Expansion": "expand",
                                 "Backup": "backup"}[m.group(1)]))
    sections.sort()

    sim_spans = [spans[f] for f in ("_simulate_once", "_simulate_round") if f in spans]

    def classify(path: str, line: int) -> str:
        if not path:
            return "other"
        p = path.replace("\\", "/")
        if "/nn/features" in p:
            return "features"
        if "/nn/" in p or "/flax/" in p:
            return "nn"
        if "/game/board" in p or "/game/jitted" in p:
            return "env"
        if "/game/symmetry" in p:
            return "rooteval"
        if p.endswith("search/mcts.py"):
            for lo, hi in sim_spans:
                if lo <= line <= hi:
                    phase = "descent"  # before the first marker
                    for s, ph in sections:
                        if lo <= s <= hi and line >= s:
                            phase = ph
                    return phase
            for name, (lo, hi) in spans.items():
                if lo <= line <= hi:
                    return fn_phase.get(name, "other-search/" + name)
            return "other-search/module"
        if "/selfplay/" in p:
            return "selfplay-glue"
        return "other"

    return classify


def parse_frame_tables(hlo_text: str):
    """Parse the module's FileNames / FileLocations / StackFrames index
    tables (newer XLA emits metadata as stack_frame_id=N into these) and
    return fn(frame_id) -> (file, line)."""
    files, locs, frames = {}, {}, {}
    section = None
    for ln in hlo_text.splitlines():
        s = ln.strip()
        if s in ("FileNames", "FunctionNames", "FileLocations", "StackFrames"):
            section = s
            continue
        m = re.match(r"\s*(\d+)\s+(.*)", ln)
        if not m:
            if s:  # any other non-entry line ends the table
                section = None
            continue
        if section is None:
            continue
        idx, rest = int(m.group(1)), m.group(2)
        if section == "FileNames":
            files[idx] = rest.strip().strip('"')
        elif section == "FileLocations":
            fm = re.search(r"file_name_id=(\d+).*?line=(\d+)", rest)
            if fm:
                locs[idx] = (int(fm.group(1)), int(fm.group(2)))
        elif section == "StackFrames":
            fm = re.search(r"file_location_id=(\d+)", rest)
            if fm:
                frames[idx] = int(fm.group(1))

    def resolve(frame_id: int):
        loc = locs.get(frames.get(frame_id, -1))
        if not loc:
            return None, 0
        return files.get(loc[0], ""), loc[1]

    return resolve


SCOPE_PHASE = {
    "ph_nneval": "nn",
    "ph_features": "features",
    "ph_select": "descent-select",
    "ph_gather": "descent-gather",
    "ph_descent": "descent-other",
    "ph_expand": "expand",
    "ph_backup": "backup",
    "ph_recompute": "backup",
    "ph_reuse": "reuse",
    "ph_rootinit": "rooteval",
    "ph_rooteval": "rooteval",
    "ph_rootprior": "rooteval",
    "ph_moveselect": "moveselect",
}


def phase_from_op_name(op_name: str):
    """Innermost ph_* scope marker (mcts.py jax.named_scope annotations)
    wins; CoffeeNet module scopes mark the model forward."""
    phase = None
    for tok in op_name.split("/"):
        if tok in SCOPE_PHASE:
            phase = SCOPE_PHASE[tok]
        elif tok.startswith("CoffeeNet"):
            phase = "nn"
    return phase


def classify_hlo(hlo_text: str, classify) -> dict:
    """Map every HLO instruction name to a phase. Named-scope markers in
    op_name are authoritative (stack frames collapse to the loop call site
    inside while bodies); the frame tables cover unscoped glue. Fusions take
    the majority phase over their fused computation's instructions."""
    resolve = parse_frame_tables(hlo_text)
    comp_counts = {}  # computation name -> Counter(phase)
    instr_meta = {}  # instruction name -> phase from own metadata
    calls = {}  # instruction name -> called computation
    cur_comp = None
    for ln in hlo_text.splitlines():
        if ln and not ln[0].isspace():
            cm = re.match(r"(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(", ln)
            if cm:
                cur_comp = cm.group(1)
                comp_counts.setdefault(cur_comp, collections.Counter())
            continue
        m = re.match(r"\s*(%?[\w\.\-]+)\s*(?:\([^)]*\))?\s*=", ln)
        if m:
            name = m.group(1).lstrip("%")
            phase = None
            om = re.search(r'op_name="([^"]*)"', ln)
            if om:
                phase = phase_from_op_name(om.group(1))
            if phase is None:
                meta = re.search(r'source_file="([^"]*)"[^}]*?source_line=(\d+)', ln)
                if meta:
                    phase = classify(meta.group(1), int(meta.group(2)))
                else:
                    fm = re.search(r"stack_frame_id=(\d+)", ln)
                    if fm:
                        f, l = resolve(int(fm.group(1)))
                        if f:
                            phase = classify(f, l)
            cc = re.search(r"calls=%?([\w\.\-]+)", ln)
            if cc:
                calls[name] = cc.group(1)
            if phase:
                instr_meta[name] = phase
                if cur_comp:
                    comp_counts[cur_comp][phase] += 1
    out = {}
    for name, phase in instr_meta.items():
        out[name] = phase
    for name, comp in calls.items():
        cnt = comp_counts.get(comp)
        if cnt:
            out[name] = cnt.most_common(1)[0][0]
    return out


def aggregate_trace(trace_dir: str) -> tuple:
    """Returns (device_events, host_events) duration counters. TPU runs have
    a device lane; the CPU backend only has '/host:CPU' thread events (HLO op
    names mixed with Python frames — the caller filters by known op names)."""
    p = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(p))
    pids = {e["pid"]: e["args"]["name"] for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev, host = collections.Counter(), collections.Counter()
    for e in d["traceEvents"]:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" in pname or "/device:" in pname:
            dev[e["name"]] += e.get("dur", 0)
        elif "/host:CPU" in pname:
            host[e["name"]] += e.get("dur", 0)
    return dev, host


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sims", type=int, default=600)
    ap.add_argument("--moves", type=int, default=2)
    ap.add_argument("--model", default="b6c96")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "bench_phase_split.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from katacoffee_tpu.game import GameConfig, init_state
    from katacoffee_tpu.nn.configs import get_model_spec
    from katacoffee_tpu.nn.model import CoffeeNet, init_params
    from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
    from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

    cfg = GameConfig(5, 5, 4)
    sp = SearchParams.for_selfplay()
    model = CoffeeNet(get_model_spec(args.model), win_len=cfg.win_len)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    eval_fn = make_nn_eval_fn(cfg, model, params)
    settings = SelfplaySettings(num_sims=args.sims)
    B = args.batch

    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
    ep = jnp.zeros((B,), jnp.int32)
    seg = jax.jit(
        lambda s, e, r: run_selfplay_segment(
            cfg, sp, settings, eval_fn, s, e, r, args.moves
        )
    )
    print("compiling...", file=sys.stderr)
    compiled = seg.lower(states, ep, jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()
    classify = build_line_classifier()
    op_phase = classify_hlo(hlo, classify)
    print(f"classified {len(op_phase)} HLO instructions", file=sys.stderr)

    # warm + real wall (forced fetch)
    s2, e2, traj = compiled(states, ep, jax.random.PRNGKey(0))
    float(jnp.sum(traj.played_action))
    t0 = time.perf_counter()
    s2, e2, traj = compiled(s2, e2, jax.random.PRNGKey(1))
    float(jnp.sum(traj.played_action))
    wall = time.perf_counter() - t0

    # traced run (relative only)
    with jax.profiler.trace(TRACE_DIR):
        s3, e3, traj = compiled(s2, e2, jax.random.PRNGKey(2))
        float(jnp.sum(traj.played_action))
    dev, host = aggregate_trace(TRACE_DIR)
    trace_lane = "device"
    agg = dev
    if not dev:
        # CPU backend: keep only events whose names are known HLO ops
        trace_lane = "host-filtered"
        agg = collections.Counter(
            {n: us for n, us in host.items()
             if op_phase.get(n.lstrip("%").split(" ")[0])}
        )

    phase_us = collections.Counter()
    detail_us = collections.Counter()
    unmatched = collections.Counter()
    for name, us in agg.items():
        key = name.lstrip("%")
        # wrapper events envelope their children's time — skip to avoid
        # double counting: control-flow ops, and the whole-executable event
        # the TPU lane emits (e.g. "jit__lambda(123...)")
        base = key.split(" ")[0]
        if re.match(r"(while|conditional|call)[\.\d]*$", base):
            continue
        if re.match(r"jit_.*\(\d+\)$", base) or base.startswith("jit__"):
            continue
        ph = op_phase.get(key) or op_phase.get(base)
        if ph is None and re.match(r"(copy|bitcast|tuple|get-tuple-element)[\.\d]*$", base):
            ph = "copies"  # layout/aliasing copies carry no source metadata
        if ph is None:
            unmatched[key] += us
            ph = "unattributed"
        if "/" in ph:
            detail_us[ph] += us
            ph = ph.split("/")[0]
        phase_us[ph] += us
    total_us = sum(phase_us.values())
    shares = {k: v / total_us for k, v in phase_us.most_common()}
    visits = B * args.sims * args.moves
    result = {
        "batch": B, "sims": args.sims, "moves": args.moves, "model": args.model,
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "segment_wall_s_forced_fetch": round(wall, 4),
        "visits_per_sec_untraced": round(visits / wall, 1),
        "trace_total_device_ms": round(total_us / 1e3, 1),
        "trace_lane": trace_lane,
        "phase_share": {k: round(v, 4) for k, v in shares.items()},
        "phase_wall_ms_normalized": {
            k: round(v * wall * 1e3, 2) for k, v in shares.items()
        },
        "other_search_detail_ms": {
            k.split("/", 1)[1]: round(v * wall * 1e3 / max(total_us, 1), 2)
            for k, v in detail_us.most_common(10)
        },
        "top_unattributed": [
            [n, round(us / 1e3, 2)] for n, us in unmatched.most_common(8)
        ],
        "note": "shares from a jax.profiler trace (relative only; tunnel "
                "inflates absolute durations), scaled to the forced-fetch "
                "segment wall clock",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
