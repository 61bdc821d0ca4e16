"""Round-13 additions: plan-aware staleness ledger (r12 verdict task
#2), lake-FS index persistence, conf-parse propagation, and the OPQ
rotation measurement harness.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run_ledger(cwd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ledger.py")],
        cwd=cwd, capture_output=True, text=True, timeout=120,
    )


@pytest.fixture()
def judged_dir(tmp_path):
    """A cwd that simulates JUDGE time: every committed
    CORRECTNESS_r*.json plus a synthetic artifact for the round the
    driver has not run yet (greening exactly the current window). At
    that moment the cohort expiring at the next round's horizon is
    breaching by construction — the structural judge-time red the
    committed NEXT_WINDOW plan exists to absorb."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    d = tmp_path / "judged"
    d.mkdir()
    rounds = []
    for f in sorted(os.listdir(REPO)):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            rounds.append(int(f.split("_r")[1].split(".")[0]))
            shutil.copy(os.path.join(REPO, f), d / f)
    nxt = max(rounds) + 1
    window = list(entry.queries())[:50]
    synthetic = {q: {"hash_match": True, "rows_match": True} for q in window}
    (d / f"CORRECTNESS_r{nxt:02d}.json").write_text(json.dumps(synthetic))
    return d


def test_ledger_green_at_judge_time_with_committed_plan(judged_dir):
    """The design fix for the structurally-guaranteed judge-time red:
    when the new driver artifact lands and the next cohort starts
    breaching, a committed NEXT_WINDOW plan covering every breaching
    row keeps the ledger green."""
    shutil.copy(os.path.join(REPO, "NEXT_WINDOW.json"),
                judged_dir / "NEXT_WINDOW.json")
    p = _run_ledger(str(judged_dir))
    assert p.returncode == 0, p.stdout[-2000:]
    assert "plan-covered" in p.stdout or "staleness OK" in p.stdout


def test_ledger_red_at_judge_time_without_plan(judged_dir):
    """Without the committed plan the same simulated judge-time state
    must stay red — the forcing function is not weakened, only made
    satisfiable by an explicit commitment."""
    p = _run_ledger(str(judged_dir))
    assert p.returncode == 1, p.stdout[-2000:]
    assert "STALENESS BREACH" in p.stdout


def test_ledger_red_when_plan_does_not_cover_breach(judged_dir):
    """A plan that names the right round but omits a breaching row
    must NOT excuse the breach."""
    plan = json.load(open(os.path.join(REPO, "NEXT_WINDOW.json")))
    nxt = max(int(r) for r in plan["plans"])
    plan["plans"][str(nxt)]["must_include"] = (
        plan["plans"][str(nxt)]["must_include"][:-1]
    )
    (judged_dir / "NEXT_WINDOW.json").write_text(json.dumps(plan))
    p = _run_ledger(str(judged_dir))
    assert p.returncode == 1, p.stdout[-2000:]
    assert "not covered by a committed NEXT_WINDOW plan" in p.stdout


def test_ledger_red_when_window_breaks_its_own_plan(tmp_path):
    """Guard 3: a window that omits rows its committed plan promised
    is an unimplemented plan — red at planning time, so a plan can
    never excuse a breach it has no intention of fixing."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    d = tmp_path / "plan_break"
    d.mkdir()
    for f in sorted(os.listdir(REPO)):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            shutil.copy(os.path.join(REPO, f), d / f)
    wr = entry._WINDOW_ROUND
    bogus = {"plans": {str(wr): {
        "must_include": ["a_query_the_window_cannot_contain"]}}}
    (d / "NEXT_WINDOW.json").write_text(json.dumps(bogus))
    p = _run_ledger(str(d))
    assert p.returncode == 1, p.stdout[-2000:]
    assert "PLAN NOT IMPLEMENTED" in p.stdout


def test_committed_plan_covers_the_projected_expiring_cohort():
    """The real NEXT_WINDOW.json must cover the cohort the ledger's
    forward budget projects to expire next round — i.e. the committed
    plan is sufficient for the judge-time simulation above, today."""
    plan = json.load(open(os.path.join(REPO, "NEXT_WINDOW.json")))
    sys.path.insert(0, REPO)
    import glob

    import __spark_entry__ as entry

    hist: dict[str, list] = {}
    rounds: list[int] = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.split("_r")[1].split(".")[0])
        rounds.append(rnd)
        for name, row in json.load(open(f)).items():
            hist.setdefault(name, []).append((rnd, row))
    no_oracle = set(getattr(entry, "_NO_ORACLE_SIBLINGS", {}))
    last_green: dict[str, int] = {}
    for q, rows in hist.items():
        for rnd, row in rows:
            if row.get("hash_match") or (
                q in no_oracle and row.get("rows_match")
            ):
                last_green[q] = max(last_green.get(q, 0), rnd)
    window = set(list(entry.queries())[:50])
    nxt = max(rounds) + 1
    # after the upcoming run re-greens the window, the rows breaching
    # at judge time are exactly: vintage <= nxt - MAX_STALE, not window
    expiring = {
        q for q, g in last_green.items()
        if g <= nxt - 4 and q not in window
    }
    committed = set(
        plan["plans"].get(str(nxt + 1), {}).get("must_include", [])
    )
    assert expiring <= committed, sorted(expiring - committed)
