#!/usr/bin/env python3
"""Regenerate the headline query/oracle counts quoted in README.md and
PERFORMANCE.md from machine-checked artifacts, so the docs can never
drift from reality (they did twice: a stale "107" and a stale
"142/142").

Sources of truth, in order:
  - newest CORRECTNESS_r*.json  -> oracle-pass / rows-only counts at the
    last driver gate
  - --verify-out DIR (optional) -> a fresh local Verify dump; its
    oracle_sql.json keys count the CURRENTLY REGISTERED oracle queries
    (use after adding queries, before the next driver gate)

Docs carry inline markers the script rewrites in place:
    <!--N_ORACLE-->143<!--/N_ORACLE-->
Run:  python3 tools/update_counts.py [--verify-out /tmp/verify_sf001]
"""
import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "PERFORMANCE.md", "SURVEY.md"]


def newest_correctness():
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    return files[-1] if files else None


def counts():
    c = {}
    path = newest_correctness()
    if path:
        with open(path) as f:
            data = json.load(f)
        entries = {k: v for k, v in data.items() if isinstance(v, dict)}
        oracle = {k: v for k, v in entries.items() if v.get("err") != "no_oracle"}
        passed = [k for k, v in oracle.items()
                  if v.get("hash_match") and v.get("rows_match") and v.get("schema_match")]
        rows_only = [k for k, v in entries.items() if v.get("err") == "no_oracle"]
        errs = [k for k, v in entries.items()
                if v.get("err") not in (None, "no_oracle")]
        c["N_GATE_ROUND"] = re.search(r"_r(\d+)", os.path.basename(path)).group(1).lstrip("0")
        c["N_ORACLE"] = str(len(oracle))
        c["N_ORACLE_PASS"] = str(len(passed))
        c["N_ROWS_ONLY"] = str(len(rows_only))
        c["N_TOTAL"] = str(len(entries))
        if errs:
            print(f"WARNING: {len(errs)} queries errored at the last gate: {errs}",
                  file=sys.stderr)
    return c


def registered_counts(verify_out):
    c = {}
    path = os.path.join(verify_out, "oracle_sql.json")
    if os.path.exists(path):
        with open(path) as f:
            c["N_REGISTERED_ORACLE"] = str(len(json.load(f)))
    return c


def rewrite(doc, vals):
    path = os.path.join(REPO, doc)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        text = f.read()
    n = 0
    for key, val in vals.items():
        pat = re.compile(rf"(<!--{key}-->)(.*?)(<!--/{key}-->)", re.S)
        text, k = pat.subn(rf"\g<1>{val}\g<3>", text)
        n += k
    with open(path, "w") as f:
        f.write(text)
    return n


def check(doc, vals):
    """Return a list of (doc, key, found, expected) mismatches without
    rewriting anything."""
    path = os.path.join(REPO, doc)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        text = f.read()
    bad = []
    for key, val in vals.items():
        for m in re.finditer(rf"<!--{key}-->(.*?)<!--/{key}-->", text, re.S):
            if m.group(1) != val:
                bad.append((doc, key, m.group(1), val))
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-out", help="local Verify dump dir (oracle_sql.json)")
    ap.add_argument("--assert", dest="assert_mode", action="store_true",
                    help="fail (exit 2) if any doc marker differs from the "
                         "newest CORRECTNESS artifact instead of rewriting")
    args = ap.parse_args()
    vals = counts()
    if args.verify_out:
        vals.update(registered_counts(args.verify_out))
    if not vals:
        print("no CORRECTNESS_r*.json found and no --verify-out; nothing to do",
              file=sys.stderr)
        return 1
    if args.assert_mode:
        mismatches = [m for doc in DOCS for m in check(doc, vals)]
        if mismatches:
            for doc, key, found, want in mismatches:
                print(f"STALE: {doc} marker {key} reads {found!r}, "
                      f"newest artifact says {want!r}", file=sys.stderr)
            return 2
        print(f"assert ok: all markers match {newest_correctness()}")
        return 0
    total = 0
    for doc in DOCS:
        k = rewrite(doc, vals)
        total += k
        if k:
            print(f"{doc}: {k} markers updated")
    print(f"values: {vals}")
    if total == 0:
        print("WARNING: no markers found in any doc", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
