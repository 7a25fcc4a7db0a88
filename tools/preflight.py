"""One-command pre-flight: runs the full ship checklist from
ROUND_NOTES.md in dependency order and prints a single ledger line per
gate. Exit code 0 only when every gate is green.

    python tools/preflight.py            # full checklist (slow: ~1 h)
    python tools/preflight.py --quick    # skip sf0.1 mirror, bench,
                                         # scale probe, full invariance

Gates, in order (each is the exact command the checklist documents):
  1. oracle mirror @ sf0.01                (the driver's gate)
  2. oracle mirror @ sf0.01, VANILLA       (bare 1 GB driver heap)
  3. oracle mirror @ sf0.001               (fast SF)
  4. oracle mirror @ sf0.1                 (the SF that caught b08)
  5. type audit                            (0 mismatches)
  6. scan lint                             (<= 4 scans/table, registry-wide)
  7. partition-invariance sweep            (5 vs 67 shuffle partitions)
  8. plan report                           (regenerates PLANS.md)
  9. coverage check                        (ledger completeness)
 10. pytest                                (full suite)
 11. examples                              (all examples/*.py run)
 12. bench                                 (sf0.1 medians, one JSON line)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = [
    # (name, command, quick?)
    ("mirror sf0.01", [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.01"], True),
    (
        "mirror sf0.01 VANILLA",
        [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.01"],
        True,
    ),
    ("mirror sf0.001", [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.001"], True),
    ("mirror sf0.1", [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.1"], False),
    ("type audit", [sys.executable, "tools/type_audit.py"], True),
    ("scan lint", [sys.executable, "tools/scan_lint.py"], True),
    ("invariance sweep", [sys.executable, "tools/invariance_sweep.py"], False),
    ("plan report", [sys.executable, "tools/plan_report.py"], True),
    ("coverage check", [sys.executable, "tools/coverage_check.py"], True),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], True),
    ("bench", [sys.executable, "bench.py"], False),
]


def run_gate(name: str, cmd: list, env: dict) -> tuple[bool, float, str]:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True
    )
    dt = time.time() - t0
    lines = [
        l for l in (proc.stdout + proc.stderr).strip().splitlines()
        if l.strip() and "Stage" not in l and not l.lstrip().startswith("[")
        and " WARN " not in l  # log4j warnings land on stderr AFTER the summary
    ]
    # prefer the gate's own summary line over whatever happened to be last
    summary = [l for l in lines if "pass," in l or "OK —" in l or "passed" in l]
    last = (summary[-1] if summary else lines[-1] if lines else "")[:100]
    return proc.returncode == 0, dt, last


def run_examples(env: dict) -> tuple[bool, float, str]:
    t0 = time.time()
    bad = []
    exdir = os.path.join(REPO, "examples")
    for ex in sorted(os.listdir(exdir)):
        if not ex.endswith(".py"):
            continue
        proc = subprocess.run(
            [sys.executable, os.path.join(exdir, ex)], cwd=REPO, env=env, capture_output=True
        )
        if proc.returncode != 0:
            bad.append(ex)
    return not bad, time.time() - t0, ("FAILED: " + ", ".join(bad)) if bad else "all examples ran"


def main() -> int:
    quick = "--quick" in sys.argv
    base_env = dict(os.environ)
    failures = []
    for name, cmd, in_quick in GATES:
        if quick and not in_quick:
            print(f"SKIP  {name} (--quick)")
            continue
        env = dict(base_env)
        if name.endswith("VANILLA"):
            env["SPARK_GRAFT_VANILLA"] = "1"
        ok, dt, last = run_gate(name, cmd, env)
        print(f"{'ok  ' if ok else 'FAIL'}  {name:24s} {dt:7.1f}s  {last}")
        if not ok:
            failures.append(name)
    ok, dt, last = run_examples(base_env)
    print(f"{'ok  ' if ok else 'FAIL'}  {'examples':24s} {dt:7.1f}s  {last}")
    if not ok:
        failures.append("examples")
    if failures:
        print(f"\nPREFLIGHT FAIL: {failures}")
        return 1
    print("\nPREFLIGHT OK — every gate green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
