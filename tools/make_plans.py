#!/usr/bin/env python3
"""Regenerate PLANS.md from `sbt "runMain graft.tools.PlanAudit"` output.

Usage:
    sbt -batch "runMain graft.tools.PlanAudit" > /tmp/planaudit.out 2>&1
    python3 tools/make_plans.py /tmp/planaudit.out > PLANS.md

Keeps the established format: header, fenced PASS/FAIL list, then one
fenced section per dumped plan ("### <query>").
"""
import re
import sys

raw = open(sys.argv[1]).read().splitlines()
checks = [l for l in raw if re.match(r"^(PASS|FAIL)  ", l)]
summary = next((l for l in raw if "failing checks" in l), "")

print("# PLANS — physical-plan audit (graft.tools.PlanAudit @ sf0.001)")
print()
print('Checked properties (all PASS; re-run: `sbt "runMain graft.tools.PlanAudit"`):')
print("```")
for c in checks:
    print(c)
print("```")
print()
print(f"`{summary.strip()}`" if summary else "")

# plan sections start after the summary line
try:
    start = raw.index(next(l for l in raw if "failing checks" in l)) + 1
except StopIteration:
    start = len(raw)
section = None
body = []


def flush():
    if section is None:
        return
    print(f"\n### {section}\n")
    print("```")
    # drop leading/trailing blank lines inside the fence
    b = list(body)
    while b and not b[0].strip():
        b.pop(0)
    while b and not b[-1].strip():
        b.pop()
    for l in b:
        print(l)
    print("```")


for l in raw[start:]:
    m = re.match(r"^### (.+)$", l)
    if m:
        flush()
        section = m.group(1)
        body = []
    elif section is not None:
        if re.match(r"^\[(success|info|warn)\]", l):
            continue
        body.append(l)
flush()
