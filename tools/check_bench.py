"""TPU-side bench regression gate (VERDICT r1 item 3; r3 item 3 made it total).

Two phases, both on the real chip via ``./ci.sh bench``:

1. **Headline** — runs ``python bench.py``, parses its one JSON line, gates
   throughput + success against ``BENCH_CONTRACT.json["headline"]``.
2. **Sweep suite** — runs ``python tools/bench_suite.py`` (one JSON line per
   segment: parking/tube/stochastic/racing/dynamic/wind/MHE tiers) and gates
   EVERY segment against the ``floors`` / ``ceilings`` of the matching
   contract entry. A contract entry with a ``floors`` dict and no suite line
   is itself a failure — recorded numbers cannot silently stop being
   measured.

The floors are deliberately loose (80% of recorded throughput, absolute
quality gates) so run-to-run TPU noise doesn't flake the gate, while a
refactor that halves any number cannot land silently. All subprocess and
parse failures are reported as clean gate failures, not tracebacks
(round-3 advisor finding).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(cmd, timeout):
    """Run a subprocess, returning (json_lines, ok)."""
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, cwd=ROOT
        )
    except subprocess.TimeoutExpired:
        print(f"BENCH GATE: {' '.join(cmd[-2:])} timed out", file=sys.stderr)
        return [], False
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    lines = []
    for line in proc.stdout.strip().splitlines():
        if line.startswith("{"):
            try:
                lines.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0:
        print(
            f"BENCH GATE: {' '.join(str(c) for c in cmd[1:])} exited "
            f"{proc.returncode}", file=sys.stderr,
        )
        return lines, False
    return lines, True


def check_headline(contract) -> bool:
    lines, ok = _run([sys.executable, str(ROOT / "bench.py")], timeout=1500)
    if not lines:
        print("BENCH GATE: bench.py produced no JSON line", file=sys.stderr)
        return False
    result = lines[-1]
    if result.get("value", 0.0) < contract["floor_solves_per_s"]:
        print(
            f"BENCH GATE: throughput regression — {result['value']:.3g} "
            f"solves/s < floor {contract['floor_solves_per_s']:.3g} "
            f"(recorded {contract['recorded_solves_per_s']:.3g})",
            file=sys.stderr,
        )
        ok = False
    if result.get("success_rate", 0.0) < contract["floor_success_rate"]:
        print(
            f"BENCH GATE: success regression — {result.get('success_rate')} "
            f"< floor {contract['floor_success_rate']} "
            f"(recorded {contract['recorded_success_rate']})",
            file=sys.stderr,
        )
        ok = False
    if ok:
        print(
            f"BENCH GATE: headline ok — {result['value']:.3g} solves/s at "
            f"success {result['success_rate']} (floors "
            f"{contract['floor_solves_per_s']:.3g} / "
            f"{contract['floor_success_rate']})"
        )
    return ok


def check_suite(contract_all) -> bool:
    gated = {
        name: entry
        for name, entry in contract_all.items()
        if isinstance(entry, dict) and ("floors" in entry or "ceilings" in entry)
    }
    if not gated:
        return True
    lines, ok = _run(
        [sys.executable, str(ROOT / "tools" / "bench_suite.py")], timeout=3000
    )
    by_segment = {l["segment"]: l for l in lines if "segment" in l}
    for name, entry in sorted(gated.items()):
        seg = by_segment.get(entry.get("segment", name))
        if seg is None or "error" in seg:
            print(
                f"BENCH GATE: segment '{name}' missing from suite output"
                + (f" ({seg['error']})" if seg else ""),
                file=sys.stderr,
            )
            ok = False
            continue
        seg_ok = True
        for key, floor in entry.get("floors", {}).items():
            val = seg.get(key)
            if val is None or val < floor:
                print(
                    f"BENCH GATE: {name}.{key} = {val} < floor {floor}",
                    file=sys.stderr,
                )
                seg_ok = False
        for key, ceiling in entry.get("ceilings", {}).items():
            val = seg.get(key)
            if val is None or val > ceiling:
                print(
                    f"BENCH GATE: {name}.{key} = {val} > ceiling {ceiling}",
                    file=sys.stderr,
                )
                seg_ok = False
        if seg_ok:
            brief = {
                k: seg[k]
                for k in list(entry.get("floors", {}))
                + list(entry.get("ceilings", {}))
                if k in seg
            }
            print(f"BENCH GATE: {name} ok — {brief}")
        ok = ok and seg_ok
    return ok


def main() -> int:
    contract_all = json.loads((ROOT / "BENCH_CONTRACT.json").read_text())
    ok = check_headline(contract_all["headline"])
    ok = check_suite(contract_all) and ok
    print(f"BENCH GATE: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
