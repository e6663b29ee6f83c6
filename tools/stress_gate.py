#!/usr/bin/env python3
"""10x-stress GATE (VERDICT r10 #4): run tools/stress10x.scala, compute
10x/1x growth factors per operator, assert the pinned bounds, and write
STRESS_r{N}.json beside the other round artifacts. A regression in any
pinned growth factor exits non-zero — the stress class that caught the
Mondrian checkpoint-stats blowup and the phash hot-bucket blowup (both
invisible at 1x) now FAILS the round instead of decorating a doc table.

Bounds rationale (see PERFORMANCE.md "stress-gate hardening"): ratio
bounds for density-preserved workloads with >=1.4x headroom over idle
min-of-2 measurements; ABSOLUTE 10x-wall caps for the two workloads
whose 10x output is quadratic by construction (ratio would measure the
1x leg's overhead, not the operator). q174 is pinned post-cap (the
uncapped block product grew 6.7x and is the regression this guards).

Usage: python3 tools/stress_gate.py [--out STRESS_rN.json]
Round N defaults to newest CORRECTNESS_r*.json round + 1 (the round in
progress).
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Two bound kinds:
#   float           -> max allowed 10x/1x wall-clock growth ratio
#   {"abs10x": s}   -> max allowed ABSOLUTE 10x wall seconds
# The absolute form is for ops whose 10x corpus is output-quadratic BY
# CONSTRUCTION (the replicas are mutual near-dups at the op's threshold:
# q171's pair output grows 46,475x, q36's 724x -- r10's table records
# this), where a wall RATIO is meaningless: r11's min-of-2-reps runs
# showed the old 3.0x q171 pin had only ever passed because a slow
# single-shot 1x leg inflated the denominator (3.05 s single-shot vs
# 0.67 s steady-state). The absolute cap still catches the bug class
# this gate exists for -- banding-topology blowups (the pre-fix q171
# hot bucket took 1,289 s on the same workload; broken q36 banding
# would be the same two orders of magnitude).
BOUNDS = {
    # r13: shingle relation persisted inside minhashLsh (was recomputed
    # 3x) — measured 7.9 s / 6.6x growth on the output-quadratic corpus
    # (724x pairs); cap tightened 40 -> 15 (~1.9x headroom)
    "q36_minhash": {"abs10x": 15.0},
    "q160_ivfpq_search": 2.0,
    "q138_mondrian": 3.5,
    "q171_phash": {"abs10x": 30.0},
    # r12: the eager below-cap gate made the 1x leg ~3x cheaper (1.57 s
    # vs r11's 4.79 s -- below the cap the plan IS the exact uncapped
    # scoreBlocked), while the 10x leg still trips the 50k-pair cap and
    # runs the sorted-neighborhood regime. 1x and 10x therefore execute
    # DIFFERENT algorithms and their ratio measures the gate's savings,
    # not growth (the same category error the r11 postmortem fixed for
    # q171/q36). Pin the absolute 10x wall instead: measured 14.0 s in
    # r12 (r11: 16.6 s), cap 25 s (~1.7x headroom).
    "q174_entity_res": {"abs10x": 25.0},
    # round-11 ops: pair join bounded by basket width / fixed-level
    # frontier joins / fixed-domain per-time aggregate -- all ~linear;
    # headroom reflects their small 1x denominators (sub-second to ~5 s,
    # where fixed per-job overhead inflates the ratio).
    "q206_assoc": 8.0,
    "q208_bfs": 8.0,
    "q202_km": 5.0,
    # r13: delta-peeling k-core and label propagation over the 10x trade
    # graph (edges 10x, round count structural): measured 1.95x / 2.35x;
    # ~2x headroom over small 1x denominators (~2 s of per-round job
    # overhead dominates locally)
    "q278_kcore": 5.0,
    "q290_labelprop": 5.0,
}

# Every op stress10x.scala emits (both legs). A run that crashes midway
# parses a PREFIX of this list — before r15 any op past the crash was
# silently skipped and the gate could pass with bounded ops unchecked
# (the `if not paired` guard only caught a FULLY empty run). The gate
# now requires this exact set; extend it when stress10x.scala grows.
EXPECTED_OPS = {
    "q36_minhash", "q64_prefix", "q77_decontam", "q97_cc_star",
    "q114_pq_train", "q114_pq_search", "q138_mondrian",
    "q160_ivfpq_search", "q168_plain_semi", "q168_bloom_semi",
    "q171_phash", "q173_epoch_shuffle", "q174_entity_res",
    "q179_token_drift", "q202_km", "q206_assoc", "q208_bfs",
    "q278_kcore", "q290_labelprop",
}


def current_round():
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        return 0
    return int(re.search(r"_r(\d+)", os.path.basename(files[-1])).group(1)) + 1


def run_stress():
    cmd = [
        "/opt/spark/bin/spark-shell", "--master", "local[32]",
        "--driver-class-path", os.path.join(REPO, "target/scala-2.13/classes"),
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=32g",
        "-i", os.path.join(REPO, "tools/stress10x.scala"),
    ]
    # the REPL slurps the -i script with the platform charset: on a
    # LANG-less host that is POSIX/ASCII and the UTF-8 comments in the
    # script raise MalformedInputException BEFORE any op runs (the r14
    # vacuous-pass incident) — pin UTF-8 explicitly
    env = dict(os.environ, LANG="C.UTF-8", LC_ALL="C.UTF-8")
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    times = {}
    for line in out.stdout.splitlines():
        m = re.match(r"STRESS (\S+) ([0-9.]+) s", line)
        if m:
            times[m.group(1)] = float(m.group(2))
    if not times:
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:] + "\n")
        raise SystemExit("no STRESS lines captured — stress run failed")
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    n = current_round()
    out_path = args.out or os.path.join(REPO, f"STRESS_r{n:02d}.json")
    times = run_stress()
    ops = sorted({re.sub(r"_(1x|10x)$", "", k) for k in times})
    # A partial run must FAIL, not pass vacuously. Two channels:
    #   - an op with exactly one leg parsed (crash between its legs)
    #   - ops missing entirely (crash before them) — caught by requiring
    #     the parsed op set to equal the pinned EXPECTED_OPS list
    report, failures = {}, []
    for op in sorted(EXPECTED_OPS - set(ops)):
        failures.append(f"{op}: emitted no STRESS lines — run incomplete")
    for op in sorted(set(ops) - EXPECTED_OPS):
        failures.append(f"{op}: not in EXPECTED_OPS — update the pinned "
                        f"list when stress10x.scala grows")
    for op in ops:
        t1, t10 = times.get(f"{op}_1x"), times.get(f"{op}_10x")
        if t1 is None or t10 is None:
            failures.append(f"{op}: only one leg parsed "
                            f"(1x={t1}, 10x={t10}) — run incomplete")
            continue
        growth = round(t10 / t1, 2) if t1 > 0 else None
        bound = BOUNDS.get(op)
        if isinstance(bound, dict):
            cap = bound["abs10x"]
            ok = t10 <= cap
            label = f" (cap {cap}s abs)"
            fail_msg = f"{op}: 10x wall {t10}s > cap {cap}s"
        else:
            cap = None
            ok = bound is None or (growth is not None and growth <= bound)
            label = "" if bound is None else f" (bound {bound}x)"
            fail_msg = f"{op}: growth {growth}x > bound {bound}x"
        report[op] = {"sec_1x": t1, "sec_10x": t10, "growth": growth,
                      "bound": bound, "pass": ok}
        if not ok:
            failures.append(fail_msg)
        flag = "" if bound is None else (" OK" if ok else " FAIL")
        print(f"{op}: {t1:.2f}s -> {t10:.2f}s = {growth}x{label}{flag}")
    with open(out_path, "w") as f:
        json.dump({"round": n, "bounds": BOUNDS, "ops": report}, f, indent=2)
        f.write("\n")
    print(f"wrote {out_path}")
    if failures:
        for msg in failures:
            print("STRESS GATE FAIL:", msg, file=sys.stderr)
        return 1
    print("stress gate: all pinned growth bounds hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
