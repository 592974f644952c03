#!/usr/bin/env python3
"""Run the end-of-round verification sweep and record its TESTS.md row
mechanically — the round-hygiene rule (VERDICT r3 item 7, missed in
r7) turned into a tool so it cannot be skipped: fast tier, slow tier,
oracle line, all in one command, appended as a table row.

Usage:
    python tools/record_tests.py r8 [--notes "..."] [--sf-dir PATH]
    python tools/record_tests.py r8 --dry-run     # print, don't write

Runs sequentially (one Spark JVM at a time — concurrent 32-core JVMs
corrupt each other's timings and can OOM broadcasts). Writes the row
under the TESTS.md table header, newest first. Exits non-zero if any
tier or the oracle fails — a red sweep must not be recorded as a row.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str]) -> tuple[str, float, int]:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=False
    )
    dur = time.time() - t0
    out = (proc.stdout + proc.stderr).replace("\r", "\n")
    return out, dur, proc.returncode


def _summary_line(out: str) -> str:
    """pytest's final '== N passed ... ==' line, stripped of decor."""
    for line in reversed(out.splitlines()):
        if re.search(r"\d+ (passed|failed|error)", line):
            return line.strip().strip("= ").split(" in ")[0]
    return "NO SUMMARY LINE"


def _mmss(seconds: float) -> str:
    m, s = divmod(int(seconds + 0.5), 60)
    return f"{m}:{s:02d}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round_tag", help="e.g. r8")
    ap.add_argument("--notes", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    failures = []
    fast_out, fast_dur, rc = _run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "not slow"]
    )
    fast = f"{_summary_line(fast_out)}, {_mmss(fast_dur)}"
    print(f"fast tier: {fast} (rc={rc})", flush=True)
    if rc != 0:
        failures.append("fast tier")

    slow_out, slow_dur, rc = _run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "slow"]
    )
    slow = f"{_summary_line(slow_out)}, {_mmss(slow_dur)}"
    print(f"slow tier: {slow} (rc={rc})", flush=True)
    if rc != 0:
        failures.append("slow tier")

    oracle_out, oracle_dur, rc = _run(
        [sys.executable, "tools/check_oracle.py", args.sf_dir]
    )
    # the checker's verdict line, specifically — stdout and stderr are
    # concatenated, so "last line" heuristics pick up Spark progress
    # bars or JVM WARNs instead of the verdict
    verdicts = [
        ln.strip()
        for ln in oracle_out.splitlines()
        if "queries match" in ln or "MISMATCH" in ln
    ]
    oracle_line = verdicts[-1] if verdicts else "NO VERDICT LINE"
    oracle = f"oracle {args.sf_dir.rstrip('/').rsplit('/', 1)[-1]}: {oracle_line} ({_mmss(oracle_dur)})"
    print(f"{oracle} (rc={rc})", flush=True)
    if rc != 0:
        failures.append("oracle")

    notes = (args.notes + " " if args.notes else "") + oracle + "; A/B: see section below."
    row = f"| {args.round_tag} | {fast} | {slow} | {notes} |\n"
    print("row:", row, end="")
    if failures:
        print(f"REFUSING to record: {', '.join(failures)} failed", file=sys.stderr)
        return 1
    if args.dry_run:
        return 0

    path = os.path.join(REPO, "TESTS.md")
    with open(path) as fh:
        lines = fh.readlines()
    for i, line in enumerate(lines):
        if line.startswith("|---"):
            lines.insert(i + 1, row)
            break
    else:
        raise SystemExit("TESTS.md table header not found")
    with open(path, "w") as fh:
        fh.writelines(lines)
    print(f"recorded {args.round_tag} row in TESTS.md")
    return 0


if __name__ == "__main__":
    main()
