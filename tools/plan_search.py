"""Engine-plan measurement pass: sweep candidate configs, emit the plan.

Runs the official in-program e2e probe (same construction as bench.py's
program) across a grid of engine-plan configurations, STRICTLY ONE AT A
TIME in fresh subprocesses (axon claim hygiene: a crashed TPU client
poisons the grant; never two clients at once, never kill one). Emits a
JSON evidence file and prints the winning configuration — the
checked-in defaults in models/engine_plan.py are maintained from this
pass's output.

Usage:
    python tools/plan_search.py [--batch 128] [--out plans/yolov2_416.json]

Each configuration is expressed as env overrides, so reproducing any row
is `env <overrides> python tools/probe_layer.py e2e:pallas`.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# the candidate grid: coarse split movements + entry formulation; add
# per-layer YOLO2_Q16_PLAN rows when bisection narrows further
CONFIGS = [
    {"name": "default", "env": {}},
    {"name": "wi_52", "env": {"YOLO2_Q16_PALLAS_MAX_HW": "2704"}},
    {"name": "wi_104", "env": {"YOLO2_Q16_PALLAS_MAX_HW": "10816"}},
    {"name": "wi_208", "env": {"YOLO2_Q16_PALLAS_MAX_HW": "43264"}},
    {"name": "wi_52_sd", "env": {"YOLO2_Q16_PALLAS_MAX_HW": "2704",
                                 "YOLO2_Q16_ENTRY": "sd"}},
    {"name": "wi_104_sd", "env": {"YOLO2_Q16_PALLAS_MAX_HW": "10816",
                                  "YOLO2_Q16_ENTRY": "sd"}},
    # the round-3 ledger's 50.7 ms row was a "big-split" config (the
    # weight-resident conv3 path covering the large-spatial layers) whose
    # exact env was not logged; these rows re-derive it
    {"name": "wi_208_sd", "env": {"YOLO2_Q16_PALLAS_MAX_HW": "43264",
                                  "YOLO2_Q16_ENTRY": "sd"}},
]


def run_config(cfg: dict, batch: int) -> dict:
    env = dict(os.environ)
    env.update(cfg["env"])
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "probe_layer.py"),
         "e2e:pallas", str(batch)],
        env=env, cwd=REPO, capture_output=True, text=True)
    rec = {"name": cfg["name"], "env": cfg["env"],
           "wall_s": round(time.time() - t0, 1), "rc": proc.returncode}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec.update(json.loads(line))
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0:
        rec["tail"] = proc.stderr.strip().splitlines()[-1:] or [""]
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default=os.path.join(
        REPO, "plans", "yolov2_416_v5e.json"))
    ap.add_argument("--configs", default="",
                    help="comma list of config names to run (default all)")
    ap.add_argument("--emit-plan", action="store_true",
                    help="also write plans/<device_kind>.json for the "
                         "running chip from the winning config (loaded by "
                         "engine_plan.resolve_knobs at params-build time)")
    args = ap.parse_args(argv)

    # run in the order given on the command line (most promising first, so
    # a mid-sweep TPU-grant loss still leaves the valuable rows measured)
    want = [c.strip() for c in args.configs.split(",") if c.strip()]
    by_name = {c["name"]: c for c in CONFIGS}
    unknown = [n for n in want if n not in by_name]
    if unknown:
        ap.error(f"unknown config names: {unknown}")
    results = []
    for cfg in ([by_name[n] for n in want] if want else CONFIGS):
        print(f"== {cfg['name']} {cfg['env']}", flush=True)
        rec = run_config(cfg, args.batch)
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = [r for r in results if r.get("ms_per_step")]
    best = min(ok, key=lambda r: r["ms_per_step"]) if ok else None
    out = {"batch": args.batch, "results": results,
           "winner": best["name"] if best else None,
           "winner_env": best["env"] if best else None}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}; winner: {out['winner']}")

    if args.emit_plan and best:
        sys.path.insert(0, REPO)
        from yolotpu.models import engine_plan as ep
        kind = ep.current_device_kind()
        env = best["env"]
        plan = {
            "device_kind": kind,
            "model": "yolov2",
            "entry": env.get("YOLO2_Q16_ENTRY", ep.V5E_DEFAULTS["entry"]),
            "max_hw": int(env.get("YOLO2_Q16_PALLAS_MAX_HW",
                                  ep.V5E_DEFAULTS["max_hw"])),
            "xla_min_c": int(env.get("YOLO2_Q16_XLA_MIN_C",
                                     ep.V5E_DEFAULTS["xla_min_c"])),
            "plan": {str(i): k for i, k in sorted(
                ep._parse_plan_items(env.get("YOLO2_Q16_PLAN", "")).items())},
            "evidence": os.path.relpath(args.out, REPO),
            "date": time.strftime("%Y-%m-%d"),
        }
        path = os.path.join(ep.plan_dir(),
                            f"{ep.device_kind_slug(kind)}.json")
        with open(path, "w") as f:
            json.dump(plan, f, indent=2)
        print(f"wrote chip plan {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
