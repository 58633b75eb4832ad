#!/usr/bin/env python3
"""SURVEY.md §2 + README inventory drift check.

Compares the operator registry (every name registered in a `queries` map in
src/main/scala) against SURVEY.md §2's checklist bullets:

  1. every registered query name must have a §2 bullet ([x] or [s]);
  2. every [x] bullet must name a registered query (an [x] claims an
     oracle-checked `queries` entry — [s] bullets may be test-pinned ops
     with no registry entry).

And against README.md's inventory claims (the r9 verdict's drift class):

  3. the "Query inventory (N driver-checked operators)" heading count and
     its backticked name list must equal the registry;
  4. the "(M/M at sf0.01)" oracle count in ## Correctness must equal the
     number of registered queries that also have an `oracles` entry.

Run: python3 tools/check_survey.py          (exit 1 on drift)
     python3 tools/check_survey.py --fix    (rewrite README counts/list)
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


def registered_oracles():
    names = set()
    for src in (ROOT / "src/main/scala").rglob("*.scala"):
        text = src.read_text()
        for m in re.finditer(r"val oracles\s*:\s*Map\[[^\]]+\]\s*=\s*Map\(",
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


def check_readme(queries, n_oracle, fix):
    """Returns [] if README matches the registry, else drift messages.
    With fix=True, rewrites the heading, list, and oracle count in place.
    """
    path = ROOT / "README.md"
    text = path.read_text()
    drift = []
    want_list = " ".join(f"`{n}`" for n in sorted(queries))
    head_re = re.compile(r"## Query inventory \((\d+) driver-checked "
                         r"operators\)\n\n(`[^\n]+`)")
    m = head_re.search(text)
    if not m:
        return ["README: no 'Query inventory (N driver-checked operators)' "
                "section found"]
    if int(m.group(1)) != len(queries):
        drift.append(f"README: inventory heading says {m.group(1)} "
                     f"operators, registry has {len(queries)}")
    if m.group(2) != want_list:
        have = set(re.findall(r"`([a-z0-9_]+)`", m.group(2)))
        drift.append(
            "README: inventory list out of sync "
            f"(missing: {', '.join(sorted(queries - have)) or '-'}; "
            f"extra: {', '.join(sorted(have - queries)) or '-'})")
    oc_re = re.compile(r"\((\d+)/(\d+) at sf0\.01\)")
    m2 = oc_re.search(text)
    if not m2:
        drift.append("README: no '(M/M at sf0.01)' oracle count found")
    elif int(m2.group(1)) != n_oracle or int(m2.group(2)) != n_oracle:
        drift.append(f"README: oracle count says {m2.group(0)}, expected "
                     f"({n_oracle}/{n_oracle} at sf0.01)")
    if drift and fix:
        text = head_re.sub(
            f"## Query inventory ({len(queries)} driver-checked "
            f"operators)\n\n{want_list}", text)
        text = oc_re.sub(f"({n_oracle}/{n_oracle} at sf0.01)", text)
        path.write_text(text)
        print(f"README: rewrote inventory ({len(queries)} ops, "
              f"{n_oracle} oracle-checked)")
        return []
    return drift


def survey_bullets():
    text = (ROOT / "SURVEY.md").read_text()
    sec2 = text.split("## §2", 1)[1].split("\n## §", 1)[0]
    checked = set(re.findall(r"- \[x\] `([a-z0-9_]+)`", sec2))
    streaming = set(re.findall(r"- \[s\] `([a-z0-9_]+)`", sec2))
    return checked, streaming


def main():
    fix = "--fix" in sys.argv[1:]
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
    n_oracle = len(queries & registered_oracles())
    for msg in check_readme(queries, n_oracle, fix):
        ok = False
        print(f"DRIFT: {msg}")
    print(f"registry: {len(queries)} queries ({n_oracle} oracle-checked); "
          f"§2: {len(checked)} [x] + {len(streaming)} [s] bullets")
    if ok:
        print("== SURVEY §2 + README in sync ==")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
