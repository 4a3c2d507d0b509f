"""Two-tier-protocol guard: map the modules a change touches to the
SLOW-marked tests that pin them, so the fast per-commit loop
(`pytest -m "not slow"`) cannot go green while a stale slow pin waits
to fail at round close (the r11 mixture incident: a widening was
fast-loop-tested only, and a slow-marked pin caught it days later).

Mechanism: a static import graph over the package and tests/ (regex
over `import`/`from` lines, relative imports resolved), reverse-
transitively closed from the touched files (``git diff --name-only
<base>``, staged + unstaged).  Every slow-marked test FILE inside the
closure is selected and run with ``-m slow`` — only its slow tests,
the exact ones the fast gate deselected.

One deliberate cut: propagation STOPS at ``plans/registry.py``.  The
registry imports every operator module, and the full-registry oracle
sweep (tests/test_oracle_parity.py, slow) re-checks the same surface
the per-commit ``scripts/drive_parity.py`` drive already covers at
sf0.01 — re-running the 30-minute sweep on every operator touch would
just re-fund the fast loop's reason to exist.  Touching registry.py
or a promotions_* module ITSELF still selects the sweep.

Usage:
    python scripts/slow_pins.py --list            # show the selection
    python scripts/slow_pins.py                   # run it (no-op if empty)
    python scripts/slow_pins.py --base HEAD~1     # diff against a ref
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "kafka_avro_order_processing_spark"

#: closure propagation stops AT these modules (they are still selected
#: when touched directly) — see the module docstring.
STOP_MODULES = {f"{PKG}.plans.registry"}

#: touching the harness itself voids the mapping: select everything.
SELECT_ALL_ON = {"tests/conftest.py", "pytest.ini"}

_FROM_RE = re.compile(r"^\s*from\s+([.\w]+)\s+import\s+([^\n(]+|\([^)]*\))",
                      re.M)
_IMPORT_RE = re.compile(r"^\s*import\s+([.\w]+)", re.M)


def _module_of(path: Path) -> str:
    """Dotted module name for a repo file (tests are top-level modules
    — the suite runs with tests/ on sys.path)."""
    rel = path.relative_to(REPO)
    if rel.parts[0] == "tests":
        return rel.stem
    return ".".join(rel.with_suffix("").parts)


def _resolve(raw: str, importer: str) -> str:
    """Resolve a possibly-relative import to a dotted module name."""
    if not raw.startswith("."):
        return raw
    dots = len(raw) - len(raw.lstrip("."))
    base = importer.split(".")[:-dots]  # 1 dot = the current package
    tail = raw.lstrip(".")
    return ".".join(base + ([tail] if tail else []))


def build_graph() -> tuple[dict[str, Path], dict[str, set[str]]]:
    """(module -> file, module -> set of modules importing it)."""
    files: dict[str, Path] = {}
    for pat in (f"{PKG}/**/*.py", "tests/*.py"):
        for p in REPO.glob(pat):
            files[_module_of(p)] = p
    rdeps: dict[str, set[str]] = {m: set() for m in files}
    known = set(files)

    def credit(target: str, mod: str) -> None:
        # credit the module and every parent-package prefix
        parts = target.split(".")
        for i in range(1, len(parts) + 1):
            cand = ".".join(parts[:i])
            if cand in known and cand != mod:
                rdeps[cand].add(mod)

    for mod, path in files.items():
        text = path.read_text(encoding="utf-8")
        for m in _IMPORT_RE.finditer(text):
            credit(_resolve(m.group(1), mod), mod)
        for m in _FROM_RE.finditer(text):
            base = _resolve(m.group(1), mod)
            credit(base, mod)
            # `from pkg.operators import mixture, nb` — each imported
            # NAME may itself be a submodule; credit those edges too
            for name in re.findall(r"[\w]+", m.group(2)):
                if name not in ("import", "as"):
                    credit(f"{base}.{name}", mod)
    return files, rdeps


def closure(seeds: set[str], rdeps: dict[str, set[str]]) -> set[str]:
    """Reverse-transitive closure, not propagating THROUGH stop
    modules (seeds that ARE stop modules still propagate one hop —
    touching registry.py itself must select its dependents)."""
    seen = set(seeds)
    frontier = list(seeds)
    while frontier:
        cur = frontier.pop()
        if cur in STOP_MODULES and cur not in seeds:
            continue  # selected, but do not walk past it
        for dep in rdeps.get(cur, ()):
            if dep not in seen:
                seen.add(dep)
                frontier.append(dep)
    return seen


def touched_files(base: str) -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", base],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout.split()
    return sorted(set(out))


def slow_test_files(files: dict[str, Path]) -> set[str]:
    return {
        mod
        for mod, path in files.items()
        if path.parts[-2] == "tests"
        and "pytest.mark.slow" in path.read_text(encoding="utf-8")
    }


def select(base: str) -> list[Path]:
    touched = touched_files(base)
    files, rdeps = build_graph()
    slow_files = slow_test_files(files)
    if any(t in SELECT_ALL_ON for t in touched):
        return sorted(files[m] for m in slow_files)
    by_path = {str(p.relative_to(REPO)): m for m, p in files.items()}
    seeds = {by_path[t] for t in touched if t in by_path}
    if not seeds:
        return []
    hit = closure(seeds, rdeps) & slow_files
    return sorted(files[m] for m in hit)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default="HEAD",
                    help="git ref to diff against (default HEAD)")
    ap.add_argument("--list", action="store_true",
                    help="print the selection, do not run pytest")
    args = ap.parse_args(argv)
    sel = select(args.base)
    if not sel:
        print("slow_pins: no slow-marked pins reachable from this diff")
        return 0
    rels = [str(p.relative_to(REPO)) for p in sel]
    print("slow_pins: forced slow subset ->", " ".join(rels))
    if args.list:
        return 0
    return subprocess.call(
        [sys.executable, "-m", "pytest", "-m", "slow", "-q", *rels],
        cwd=REPO,
    )


if __name__ == "__main__":
    sys.exit(main())
