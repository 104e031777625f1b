#!/usr/bin/env python
"""Round-end evidence gate (round 5; VERDICT r4 task 5).

The committed ``MULTICHIP_FULL.json`` (production-shape multi-chip dryrun)
must be re-stamped whenever anything inside the jitted analysis path
changes — the CLAUDE.md checklist said so, the round-3/4 judges both caught
the record silently outliving kernel changes.  This turns the checklist
into code: :func:`check` fails when the record's commit is not HEAD *and*
any jitted-path file changed since it (doc/test-only commits don't trip
it).  ``bench.py`` runs the gate and folds it into its exit status.

Usage:  python tools/round_check.py      (exit 0 = evidence is current)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Everything that shapes the compiled device programs.  Host-only layers
#: (cli/workflow/gui/export/consensus prose, signal decode, tests, docs)
#: deliberately excluded — they cannot change the HLO.
JITTED_PATHS = (
    "nightcore_analyzer_tpu/models",
    "nightcore_analyzer_tpu/ops",
    "nightcore_analyzer_tpu/parallel",
    "nightcore_analyzer_tpu/batch/corpus.py",
    "nightcore_analyzer_tpu/config.py",
)


def _git(*args: str) -> str:
    return subprocess.run(["git", "-C", REPO, *args], capture_output=True,
                          text=True, timeout=20).stdout.strip()


def check() -> Tuple[bool, str]:
    """(ok, human message).  ok=False when MULTICHIP_FULL.json predates a
    jitted-path change (or is missing/unstamped)."""
    path = os.path.join(REPO, "MULTICHIP_FULL.json")
    try:
        rec = json.load(open(path, encoding="utf-8"))
    except Exception:
        return False, ("MULTICHIP_FULL.json missing/unreadable — run "
                       "NCFA_DRYRUN_FULL=1 python __graft_entry__.py")
    rec_hash = str(rec.get("commit_hash",
                           str(rec.get("commit", "")).split(" ")[0]))
    if not rec_hash or rec_hash == "unknown":
        return False, "MULTICHIP_FULL.json carries no commit stamp — refresh"
    if rec_hash.endswith("-dirty"):
        return False, (f"MULTICHIP_FULL.json was stamped on a dirty tree "
                       f"({rec_hash}) — commit first, then refresh")
    head = _git("rev-parse", "--short", "HEAD")
    if not head:
        return True, "not a git checkout — gate skipped"
    # uncommitted jitted-path edits always count as newer than the stamp
    dirty = _git("status", "--porcelain", "--", *JITTED_PATHS)
    if dirty:
        return False, ("uncommitted jitted-path changes:\n  "
                       + "\n  ".join(dirty.splitlines())
                       + "\n→ commit, re-run NCFA_DRYRUN_FULL=1 "
                         "python __graft_entry__.py")
    if rec_hash == head:
        return True, f"MULTICHIP_FULL.json is at HEAD ({head})"
    # is the stamped commit an ancestor we can diff against?
    probe = subprocess.run(["git", "-C", REPO, "cat-file", "-t", rec_hash],
                           capture_output=True, text=True, timeout=20)
    if probe.returncode != 0:
        return False, (f"MULTICHIP_FULL.json commit {rec_hash} unknown to "
                       "this checkout — refresh")
    changed = _git("diff", "--name-only", f"{rec_hash}..HEAD",
                   "--", *JITTED_PATHS)
    if changed:
        return False, (f"MULTICHIP_FULL.json stamped at {rec_hash} but the "
                       f"jitted path changed since:\n  "
                       + "\n  ".join(changed.splitlines())
                       + "\n→ re-run NCFA_DRYRUN_FULL=1 "
                         "python __graft_entry__.py and commit the record")
    return True, (f"MULTICHIP_FULL.json stamped at {rec_hash} "
                  f"(HEAD {head}; no jitted-path change in between)")


def main() -> int:
    ok, msg = check()
    print(("OK: " if ok else "STALE EVIDENCE: ") + msg,
          file=sys.stdout if ok else sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
