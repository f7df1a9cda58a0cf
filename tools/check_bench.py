"""TPU-side bench regression gate (VERDICT r1 item 3).

Runs ``python bench.py`` on the real chip, parses its one JSON line, and fails
(exit 1) if throughput or success fall below the floors recorded in
``BENCH_CONTRACT.json``. Run via ``./ci.sh bench`` from the repo root.

The floors are deliberately loose (80% of recorded throughput, absolute success
gate) so run-to-run TPU noise doesn't flake the gate, while a refactor that
halves either number cannot land silently (the r1 failure mode: measured
numbers lived only in docstrings).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def check_racing(contract_all) -> bool:
    """Racing-sweep gate (round 3): throughput + success + tracking floors via
    the ``racesweep`` CLI (its second run measures the compiled device loop)."""
    c = contract_all.get("racing_sweep")
    if c is None:
        return True
    proc = subprocess.run(
        [
            sys.executable, "-m", "model_predictive_control_tpu.cli",
            "racesweep", "--batch", "2048", "--steps", "50",
        ],
        capture_output=True, text=True, timeout=1500, cwd=ROOT,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print("BENCH GATE: racesweep failed", file=sys.stderr)
        return False
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    ok = True
    if r["solves_per_s"] < c["floor_solves_per_s"]:
        print(
            f"BENCH GATE: racing throughput regression — {r['solves_per_s']:.3g}"
            f" < floor {c['floor_solves_per_s']:.3g}", file=sys.stderr,
        )
        ok = False
    if r["success_rate"] < c["floor_success_rate"]:
        print(
            f"BENCH GATE: racing success regression — {r['success_rate']}"
            f" < floor {c['floor_success_rate']}", file=sys.stderr,
        )
        ok = False
    if r["mean_tracking_error"] > c["ceiling_mean_tracking_error_m"]:
        print(
            f"BENCH GATE: racing tracking regression — "
            f"{r['mean_tracking_error']:.4f} m > ceiling "
            f"{c['ceiling_mean_tracking_error_m']} m", file=sys.stderr,
        )
        ok = False
    if ok:
        print(
            f"BENCH GATE: racing ok — {r['solves_per_s']:.3g} solves/s, "
            f"success {r['success_rate']:.4f}, "
            f"mean err {r['mean_tracking_error']:.4f} m"
        )
    return ok


def main() -> int:
    contract_all = json.loads((ROOT / "BENCH_CONTRACT.json").read_text())
    contract = contract_all["headline"]
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True,
        text=True,
        timeout=1500,  # cold remote compile can take 10+ min on this tunnel
        cwd=ROOT,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print("BENCH GATE: bench.py failed", file=sys.stderr)
        return 1
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    result = json.loads(line)

    ok = check_racing(contract_all)
    if result["value"] < contract["floor_solves_per_s"]:
        print(
            f"BENCH GATE: throughput regression — {result['value']:.3g} solves/s "
            f"< floor {contract['floor_solves_per_s']:.3g} "
            f"(recorded {contract['recorded_solves_per_s']:.3g})",
            file=sys.stderr,
        )
        ok = False
    if result["success_rate"] < contract["floor_success_rate"]:
        print(
            f"BENCH GATE: success regression — {result['success_rate']} "
            f"< floor {contract['floor_success_rate']} "
            f"(recorded {contract['recorded_success_rate']})",
            file=sys.stderr,
        )
        ok = False
    if ok:
        print(
            f"BENCH GATE: ok — {result['value']:.3g} solves/s at "
            f"success {result['success_rate']} (floors "
            f"{contract['floor_solves_per_s']:.3g} / {contract['floor_success_rate']})"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
