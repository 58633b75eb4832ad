#!/usr/bin/env python3
"""SURVEY.md §2 drift check.

Compares the operator registry (every name registered in a `queries` map in
src/main/scala) against SURVEY.md §2's checklist bullets:

  1. every registered query name must have a §2 bullet ([x] or [s]);
  2. every [x] bullet must name a registered query (an [x] claims an
     oracle-checked `queries` entry — [s] bullets may be test-pinned ops
     with no registry entry).

Run: python3 tools/check_survey.py   (exit 1 on drift)
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def registered_queries():
    names = set()
    for src in (ROOT / "src/main/scala").rglob("*.scala"):
        text = src.read_text()
        # Each module declares: val queries: Map[...] = Map("name" -> fn, ...)
        # Scan to the matching close paren by depth (a non-greedy regex to
        # the first ")\n" truncates on any entry line ending with ')').
        for m in re.finditer(r"val queries\s*:\s*Map\[[^\]]+\]\s*=\s*Map\(",
                             text):
            depth, i = 1, m.end()
            while i < len(text) and depth > 0:
                if text[i] == "(":
                    depth += 1
                elif text[i] == ")":
                    depth -= 1
                i += 1
            names.update(
                re.findall(r'"([a-z0-9_]+)"\s*->', text[m.end():i - 1]))
    return names


def survey_bullets():
    text = (ROOT / "SURVEY.md").read_text()
    sec2 = text.split("## §2", 1)[1].split("\n## §", 1)[0]
    checked = set(re.findall(r"- \[x\] `([a-z0-9_]+)`", sec2))
    streaming = set(re.findall(r"- \[s\] `([a-z0-9_]+)`", sec2))
    return checked, streaming


def main():
    queries = registered_queries()
    checked, streaming = survey_bullets()
    bullets = checked | streaming
    missing_bullets = sorted(queries - bullets)
    phantom_checked = sorted(checked - queries)
    ok = True
    if missing_bullets:
        ok = False
        print(f"DRIFT: {len(missing_bullets)} registered queries missing a "
              f"SURVEY §2 bullet: {', '.join(missing_bullets)}")
    if phantom_checked:
        ok = False
        print(f"DRIFT: {len(phantom_checked)} [x] bullets name no registered "
              f"query: {', '.join(phantom_checked)}")
    print(f"registry: {len(queries)} queries; §2: {len(checked)} [x] + "
          f"{len(streaming)} [s] bullets")
    if ok:
        print("== SURVEY §2 in sync ==")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
