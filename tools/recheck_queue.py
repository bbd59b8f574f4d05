"""Generate the driver-window re-check queue from git history.

The grading driver hash-checks only the first 50 registered queries per
round, so each round's window must be chosen deliberately.  Two sets
matter:

1. **never-checked** — registered queries that have not appeared in any
   ``CORRECTNESS_r*.json`` yet (the hard gap the window must close);
2. **changed-since-green** — queries that WERE green in some round N but
   whose registration block (decorator + oracle SQL + function body) in
   ``queries.py`` has changed since the end-of-round-N commit, so the
   green result no longer vouches for the current code.

Rather than hand-maintaining a manifest, this tool derives both sets from
git: it textually extracts each ``@register("name", ...)`` block from
``queries.py`` at HEAD and at each round's snapshot commit, hashes the
blocks, and diffs.  Textual block extraction (not ``inspect.getsource``)
means old revisions never have to be imported.

Module-dependency flagging (r10, transitive since r16): each
registration block's ``from spark_pipeline_spark...import`` statements
are parsed, so green queries whose block imports a CHANGED module are
listed as mechanical canary candidates
(``green_but_imports_changed_module``). The changed-module set is the
REVERSE-TRANSITIVE import closure over the whole package (r16 — a
``graph.py`` change flags queries importing ``dedup.py``, which
wraps it; VERDICT r15 item 1), and covers top-level modules
(``ann_index.py``, ``graph_index.py``), not just ``operators/``.
Remaining limitation: non-import coupling (a sink replay
re-implementing a streaming algebra) is not chased — the
changed-modules list stays printed so those get a human glance.

Usage::

    python tools/recheck_queue.py            # human-readable report
    python tools/recheck_queue.py --json     # machine-readable
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERIES_PATH = "spark_pipeline_spark/queries.py"

# Code state each CORRECTNESS_rN.json was measured against: the last work
# commit of round N — discovered from the driver's own commit messages
# ("round N: end-of-round snapshot" where one exists, else the parent of
# "round N: verdict/..."), so new rounds need no edits here.
_ROUND_COMMIT_OVERRIDES: dict[int, str] = {}


def round_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "-C", str(REPO), "log", "--format=%h %s"],
        capture_output=True,
        text=True,
    ).stdout
    found: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): end-of-round snapshot", subject)
        if m:
            found.setdefault(int(m.group(1)), sha)
            continue
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            # verdict commit carries only driver artifacts; the code the
            # driver ran is its parent (unless a snapshot commit exists)
            found.setdefault(int(m.group(1)), f"{sha}~1")
    found.update(_ROUND_COMMIT_OVERRIDES)
    return found


ROUND_COMMITS = round_commits()

_BLOCK_RE = re.compile(r'^@register\(\s*\n\s*"([a-z0-9_]+)"', re.M)


def _git_show(ref: str, path: str) -> str:
    out = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{ref}:{path}"],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        return ""
    return out.stdout


def extract_blocks(text: str) -> dict[str, str]:
    """Map query name -> its registration block text: the ``@register(``
    decorator (oracle SQL, tags) through the END of the decorated
    function — i.e. up to the first column-0 statement after the
    ``def`` line. Ending at the function boundary (not at the next
    ``@register``) keeps module-level constants/helpers BETWEEN
    registrations out of every block, so inserting a new query or helper
    no longer flags its textual neighbor as changed, and an edit to an
    inter-block helper is reported via the scaffolding hash instead of
    being mis-attributed to an unrelated query.
    """
    lines = text.splitlines(keepends=True)
    # byte offset of each line start
    offs = [0]
    for ln in lines:
        offs.append(offs[-1] + len(ln))
    matches = list(_BLOCK_RE.finditer(text))
    blocks: dict[str, str] = {}
    import bisect

    for m in matches:
        start_line = bisect.bisect_right(offs, m.start()) - 1
        # find the "def " line for this registration, then the first
        # column-0 statement line after it
        i = start_line
        while i < len(lines) and not lines[i].startswith("def "):
            i += 1
        j = i + 1
        while j < len(lines):
            ln = lines[j]
            if ln.strip() and not ln[0] in (" ", "\t", ")", "]", "}"):
                break
            j += 1
        blocks[m.group(1)] = text[m.start() : offs[j]]
    return blocks


def scaffolding(text: str) -> str:
    """Everything in queries.py OUTSIDE the registration blocks —
    module-level constants, SQL-CTE generators, shared frames like
    ``_bm25_scored_frame``. A change here can affect MANY queries, so
    the tool reports it as its own signal rather than guessing an
    attribution."""
    out = text
    for block in extract_blocks(text).values():
        out = out.replace(block, "", 1)
    return out


def _hash(block: str) -> str:
    return hashlib.sha256(block.encode()).hexdigest()[:16]


def _green(entry: dict) -> bool:
    if entry.get("err"):
        return False
    if entry.get("hash_match") is not None:
        return bool(entry["hash_match"])
    return bool(entry.get("rows_match"))


def last_green_rounds() -> dict[str, int]:
    """Query name -> highest round in which the driver marked it green."""
    out: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for name, entry in json.load(open(f)).items():
            if isinstance(entry, dict) and _green(entry):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _module_import_edges() -> dict[str, set[str]]:
    """repo-relative module path -> set of in-package module paths it
    imports (parsed from ``from spark_pipeline_spark... import`` lines).
    Used to chase TRANSITIVE operator→operator coupling: ``dedup.py``
    imports ``graph.py``, so a ``graph.py`` change invalidates the
    greens of every query that imports ``dedup.py`` — the exact gap
    (VERDICT r15 item 1) that let the r15 graph-gate rewrite ship with
    zero window canaries."""
    edges: dict[str, set[str]] = {}
    pkg = REPO / "spark_pipeline_spark"
    for f in pkg.rglob("*.py"):
        rel = str(f.relative_to(REPO))
        edges[rel] = block_module_deps(f.read_text())
    return edges


def changed_modules_since(ref: str) -> list[str]:
    """Modules changed since ``ref`` PLUS every module that transitively
    imports one of them (a re-export or wrapper is as changed as its
    implementation)."""
    out = subprocess.run(
        ["git", "-C", str(REPO), "diff", "--name-only", ref, "HEAD", "--",
         "spark_pipeline_spark"],
        capture_output=True,
        text=True,
    )
    changed = {
        p for p in out.stdout.splitlines()
        if p.endswith(".py")
        # queries.py has its own per-block diffing; __init__ is re-export
        and not p.endswith("queries.py")
    }
    if not changed:
        return []
    edges = _module_import_edges()
    # reverse-transitive closure: any module importing a changed module
    # (directly or through a chain) is itself flagged
    while True:
        grown = {
            m for m, deps in edges.items()
            if m not in changed and deps & changed
        }
        if not grown:
            break
        changed |= grown
    return sorted(changed)


_IMPORT_RE = re.compile(
    r"from spark_pipeline_spark(?:\.(operators|io|functions))?"
    r"(?:\.([a-z_]+))?\s+import\s+([A-Za-z_, \n()]+)"
)


def block_module_deps(block: str) -> set[str]:
    """Repo-relative operator-module paths a registration block imports.

    Derived from the block's own `from spark_pipeline_spark...import`
    statements, so the 'which queries does a module change invalidate'
    question is answered mechanically instead of by hand-picking
    canaries. Package-level imports (`from spark_pipeline_spark.operators
    import text as T`) resolve each imported NAME to its module file.
    """
    deps: set[str] = set()
    for m in _IMPORT_RE.finditer(block):
        pkg, mod, names = m.groups()
        if pkg and mod:  # from ...operators.dedup import X
            deps.add(f"spark_pipeline_spark/{pkg}/{mod}.py")
        elif pkg:  # from ...operators import text as T
            for nm in re.split(r"[,\s]+", names.strip()):
                nm = nm.strip("() ")
                if nm and nm != "as" and (REPO / "spark_pipeline_spark" / pkg / f"{nm}.py").exists():
                    deps.add(f"spark_pipeline_spark/{pkg}/{nm}.py")
        elif mod:  # from spark_pipeline_spark.streaming import X
            deps.add(f"spark_pipeline_spark/{mod}.py")
    return deps


def compute() -> dict:
    head_blocks = extract_blocks((REPO / QUERIES_PATH).read_text())
    greens = last_green_rounds()

    never = [n for n in head_blocks if n not in greens]

    # hash old revisions lazily, one git show per distinct round
    old_blocks: dict[int, dict[str, str]] = {}
    changed: list[dict] = []
    for name, rnd in sorted(greens.items()):
        if name not in head_blocks:
            continue  # renamed/retired
        commit = ROUND_COMMITS.get(rnd)
        if commit is None:
            # CORRECTNESS_rN.json exists but no matching round-N commit —
            # can't diff the block, so surface the gap instead of crashing
            changed.append(
                {"query": name, "green_round": rnd, "reason": "round-commit-unknown"}
            )
            continue
        if rnd not in old_blocks:
            old_blocks[rnd] = extract_blocks(_git_show(commit, QUERIES_PATH))
        old = old_blocks[rnd].get(name)
        if old is None:
            changed.append({"query": name, "green_round": rnd, "reason": "absent-at-green-commit"})
        elif _hash(old) != _hash(head_blocks[name]):
            changed.append({"query": name, "green_round": rnd, "reason": "block-changed"})

    max_round = max(ROUND_COMMITS)
    head_scaffold = _hash(scaffolding((REPO / QUERIES_PATH).read_text()))
    old_text = _git_show(ROUND_COMMITS[max_round], QUERIES_PATH)
    scaffold_changed = _hash(scaffolding(old_text)) != head_scaffold if old_text else True
    changed_mods = changed_modules_since(ROUND_COMMITS[max_round])
    # GREEN queries whose registration block imports a changed operator
    # module: their green no longer vouches for the code path they run —
    # the mechanical answer to 'which canaries does this module change
    # need', closing the tool's former hand-picked-canary limitation.
    # (Transitive operator→operator imports are not chased; a module
    # that re-exports another's behavior still needs a human glance.)
    flagged_names = {c["query"] for c in changed}
    module_invalidated = [
        {"query": n, "green_round": greens[n], "modules": sorted(deps)}
        for n, deps in (
            (n, block_module_deps(head_blocks[n]) & set(changed_mods))
            for n in head_blocks
            if n in greens and n not in flagged_names
        )
        if deps
    ]
    return {
        "registered": len(head_blocks),
        "never_checked": never,
        "changed_since_green": changed,
        "green_but_imports_changed_module": module_invalidated,
        "queries_scaffolding_changed_since_last_round": scaffold_changed,
        "operator_modules_changed_since_last_round": changed_mods,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    r = compute()
    if args.json:
        json.dump(r, sys.stdout, indent=1)
        print()
        return
    print(f"registered queries: {r['registered']}")
    print(f"\nnever driver-checked ({len(r['never_checked'])}):")
    for n in r["never_checked"]:
        print(f"  {n}")
    print(f"\nchanged since green ({len(r['changed_since_green'])}):")
    for c in r["changed_since_green"]:
        print(f"  {c['query']} (green r{c['green_round']}, {c['reason']})")
    print(
        "\nqueries.py scaffolding (inter-block helpers/constants) changed "
        f"since last snapshot: {r['queries_scaffolding_changed_since_last_round']}"
    )
    mods = r["operator_modules_changed_since_last_round"]
    print(f"\noperator modules changed since last snapshot ({len(mods)}):")
    for m in mods:
        print(f"  {m}")
    inv = r["green_but_imports_changed_module"]
    print(
        f"\ngreen queries importing a changed module ({len(inv)}) — "
        "candidates for the canary slots:"
    )
    for c in inv:
        print(f"  {c['query']} (green r{c['green_round']}: {', '.join(c['modules'])})")


if __name__ == "__main__":
    main()
