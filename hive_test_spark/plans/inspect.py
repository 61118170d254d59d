"""Physical-plan inspection (SURVEY.md §4): verify that the plans Catalyst
produces are the plans we want at 100 TB — pushdown reaching the scan,
column pruning, broadcast joins on dims, no stray cartesian products.

Used by tools/audit_plans.py and the perf tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@dataclass
class PlanFacts:
    text: str  # formatted mode
    simple: str  # simple mode (carries WholeStageCodegen markers)
    scans: list[dict] = field(default_factory=list)

    @property
    def broadcast_joins(self) -> int:
        return len(re.findall(r"\(\d+\) Broadcast(Hash|NestedLoop)Join", self.text))

    @property
    def sort_merge_joins(self) -> int:
        return len(re.findall(r"\(\d+\) SortMergeJoin", self.text))

    @property
    def cartesian(self) -> int:
        return len(re.findall(r"\(\d+\) CartesianProduct", self.text))

    @property
    def codegen_spans(self) -> int:
        # pre-execution AQE plans hide codegen ids in simple mode; the
        # codegen explain mode reports "Found N WholeStageCodegen subtrees"
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", self.simple)
        if m:
            return int(m.group(1))
        return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", self.simple)))

    @property
    def exchanges(self) -> int:
        return len(re.findall(r"\(\d+\) Exchange", self.text))


def analyze(df: DataFrame) -> PlanFacts:
    facts = PlanFacts(text=explain_str(df, "formatted"), simple=explain_str(df, "codegen"))
    # Detail blocks look like "(1) Scan parquet \nOutput [7]: ...\n...\n\n"
    for m in re.finditer(r"\(\d+\) Scan (parquet|orc|csv|json)[^\n]*\n((?:[^\n]+\n)*)", facts.text):
        block = m.group(2)
        info: dict = {"format": m.group(1)}
        for line in block.splitlines():
            mm = re.match(r"(PushedFilters|ReadSchema|Location|Batched)\s*:\s*(.*)", line)
            if mm:
                info[mm.group(1)] = mm.group(2)
        facts.scans.append(info)
    return facts


def scan_read_columns(facts: PlanFacts) -> list[int]:
    """Number of columns each scan actually reads (ReadSchema pruning)."""
    return [s.get("ReadSchema", "").count(":") for s in facts.scans]


def has_pushed_filters(facts: PlanFacts) -> bool:
    return any(s.get("PushedFilters") not in (None, "", "[]") for s in facts.scans)
