"""One-command gate runner: tests + oracle parity + plan audit + bench.

Usage: python tools/run_all_gates.py
Exit code nonzero if any gate fails; bench JSON printed last.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str]) -> bool:
    print(f"=== {name}: {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd=ROOT)
    ok = r.returncode == 0
    print(f"=== {name}: {'PASS' if ok else 'FAIL'}\n")
    return ok


def main() -> int:
    results = [
        run("tests", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        run("oracle", [sys.executable, "tools/check_oracle.py"]),
        run("plans", [sys.executable, "tools/audit_plans.py"]),
        run("bench", [sys.executable, "bench.py"]),
    ]
    print("ALL GATES:", "PASS" if all(results) else "FAIL")
    return 0 if all(results) else 1


if __name__ == "__main__":
    main()
