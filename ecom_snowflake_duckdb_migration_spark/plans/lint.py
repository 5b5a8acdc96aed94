"""Scale-hazard linter over the physical plan.

``lint(df)`` walks the formatted physical plan and reports the patterns
that work at test scale and melt down at 100 TB — the automated version of
the manual plan audit this engine's test suite applies to every catalog
entry. Mirrors what a reviewer checks: no cartesian products, no global
(partition-less) windows or sorts over unbounded inputs, no row-at-a-time
Python in hot paths, filters actually reaching the parquet scan.

Findings are facts about the plan, not verdicts: a bounded 25-row
broadcast nested-loop join or a global window over an already-aggregated
|months|-row frame is a sanctioned pattern (several catalog entries do
exactly that, with the justification in their docstring) — the linter
surfaces each instance so the justification has to exist.

Severity: "error" = almost never survives a scale-up (cartesian product);
"warn" = survives only when the operator's input is provably bounded;
"info" = worth knowing (Arrow-batched Python, unbounded per-group state).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .inspect import formatted_plan

_TREE_LINE = re.compile(r"^(?P<art>[\s:+\-*()]*?)(?P<label>[A-Za-z][^()]*?)\((?P<id>\d+)\)\s*$")
_DETAIL_HEAD = re.compile(r"^\((\d+)\) (.+?)(?: \[codegen id : \d+\])?$", re.M)

# Row-at-a-time Python evaluation: the 10-100x-slower-than-Arrow path.
_ROW_PYTHON = ("BatchEvalPython",)
# Arrow-batched Python: legitimate for non-SQL semantics, still off-codegen.
_ARROW_PYTHON = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
)


@dataclass(frozen=True)
class Finding:
    severity: str  # error | warn | info
    code: str
    op_id: int  # the numbered operator in .explain('formatted'); 0 = plan-wide
    message: str


def _tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """(indent, op_name, op_id) per tree line, in tree order. The tree
    section ends at the first detail header."""
    nodes = []
    for line in plan.splitlines():
        if _DETAIL_HEAD.match(line):
            break
        m = _TREE_LINE.match(line)
        if m:
            op = m.group("label").strip().split()[0]
            nodes.append((len(m.group("art")), op, int(m.group("id"))))
    return nodes


def _parent(nodes: list[tuple[int, str, int]], idx: int) -> tuple[int, str, int] | None:
    indent = nodes[idx][0]
    for j in range(idx - 1, -1, -1):
        if nodes[j][0] < indent:
            return nodes[j]
    return None


def _details(plan: str) -> dict[int, str]:
    out: dict[int, str] = {}
    matches = list(_DETAIL_HEAD.finditer(plan))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(plan)
        out[int(m.group(1))] = plan[m.start():end]
    return out


def lint(df: DataFrame) -> list[Finding]:
    plan = formatted_plan(df)
    nodes = _tree_nodes(plan)
    details = _details(plan)
    findings: list[Finding] = []

    for idx, (_, op, op_id) in enumerate(nodes):
        if op == "CartesianProduct":
            findings.append(Finding(
                "error", "CARTESIAN", op_id,
                "CartesianProduct: |left| x |right| rows — never survives a "
                "scale-up; add an equi-join key, a band/block key, or "
                "broadcast a provably bounded side"))
        elif op == "BroadcastNestedLoopJoin":
            findings.append(Finding(
                "warn", "BNLJ", op_id,
                "BroadcastNestedLoopJoin: sound only while the build side "
                "is bounded (1-row stats frames, k-row codebooks); anything "
                "growing with the data OOMs the driver at scale"))
        elif op in _ROW_PYTHON:
            findings.append(Finding(
                "warn", "ROW_PYTHON", op_id,
                "Row-at-a-time Python UDF (BatchEvalPython): 10-100x slower "
                "than Arrow; use built-in expressions or a pandas_udf"))
        elif op in _ARROW_PYTHON:
            findings.append(Finding(
                "info", "ARROW_PYTHON", op_id,
                f"{op}: Arrow-batched Python — legitimate off-codegen path; "
                "confirm the semantics genuinely need Python"))
        elif op == "Exchange" and "SinglePartition" in details.get(op_id, ""):
            parent = _parent(nodes, idx)
            if parent and parent[1] == "Sort":
                # a Sort feeding a Window is the window's frame sort
                gp = _parent(nodes, nodes.index(parent))
                if gp and gp[1] in ("Window", "WindowGroupLimit"):
                    parent = gp
            if parent and parent[1] in ("Sort", "Window", "WindowGroupLimit"):
                kind = "SORT" if parent[1] == "Sort" else "WINDOW"
                findings.append(Finding(
                    "warn", f"GLOBAL_{kind}", op_id,
                    f"SinglePartition exchange feeding {parent[1]}: ALL rows "
                    "move to one task — sound only over pre-aggregated "
                    "bounded frames (|days|, |months|); partition the window "
                    "by a series key otherwise"))
            # SinglePartition under a final HashAggregate carries one partial
            # row per task — harmless, not reported.

    # row-preserving ops between a scan and the filter above it (Python
    # eval nodes just append the UDF result column)
    passthrough = {"ColumnarToRow", "InputAdapter", "WholeStageCodegen",
                   "Project", *_ROW_PYTHON, *_ARROW_PYTHON}
    for idx, (_, op, op_id) in enumerate(nodes):
        if op != "Scan":
            continue
        # no PushedFilters line at all (UDF predicates yield none) and
        # "PushedFilters: []" both mean nothing reached the reader
        m = re.search(r"PushedFilters: \[([^\]]*)\]", details.get(op_id, ""))
        if m and m.group(1).strip():
            continue
        # nearest non-passthrough ancestor (scans sit under ColumnarToRow)
        node, i = (None, idx)
        while True:
            p = _parent(nodes, i)
            if p is None or p[1] not in passthrough:
                node = p
                break
            i = nodes.index(p)
        if node and node[1] == "Filter":
            findings.append(Finding(
                "warn", "FILTER_NOT_PUSHED", op_id,
                "Filter sits above a scan with PushedFilters: [] — the "
                "predicate reads every row group; check for casts/UDFs "
                "blocking pushdown"))

    if re.search(r"\bcollect_(list|set)\(", plan):
        findings.append(Finding(
            "info", "UNBOUNDED_GROUP_STATE", 0,
            "collect_list/collect_set accumulate unbounded per-group state; "
            "cap group sizes (slice after sort) or restructure"))

    return findings


def assert_scale_clean(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Raise if ``lint`` reports any error- or warn-severity finding whose
    code is not explicitly allowed. The CI form of the manual plan audit."""
    bad = [f for f in lint(df)
           if f.severity in ("error", "warn") and f.code not in allow]
    assert not bad, "scale hazards: " + "; ".join(
        f"[{f.severity}] {f.code}@{f.op_id}: {f.message}" for f in bad)
