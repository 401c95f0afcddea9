"""Physical-plan audit — the ".explain and iterate" loop as code.

``audit(df)`` parses the formatted physical plan into the handful of
facts that decide whether a pipeline survives a 100x scale-up:
how many exchanges (shuffles) it has, which joins broadcast vs
shuffle, whether any join degenerated into a cartesian product,
whether filters/column pruning reached the parquet scans, how much
of the plan runs inside whole-stage codegen, and where Python
(Arrow/pandas) stages sit. ``assert_scalable(df)`` turns the
red-flag subset into raised errors so pipelines can self-check in
tests and notebooks.

This replaces a custom Catalyst rule (SURVEY §7: none needed) with
something a user can actually act on.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_shuffle_joins: int = 0
    n_cartesian: int = 0
    n_codegen_spans: int = 0
    n_python_stages: int = 0
    scans: list[dict] = field(default_factory=list)

    @property
    def red_flags(self) -> list[str]:
        flags = []
        if self.n_cartesian:
            flags.append(f"{self.n_cartesian} cartesian/nested-loop join(s)")
        for s in self.scans:
            if s["format"] == "parquet" and s["full_schema"]:
                flags.append(f"scan of {s['location']} reads all columns")
        return flags

    def summary(self) -> str:
        lines = [
            f"exchanges={self.n_exchanges} broadcast_joins={self.n_broadcast_joins} "
            f"shuffle_joins={self.n_shuffle_joins} cartesian={self.n_cartesian} "
            f"codegen_spans={self.n_codegen_spans} python_stages={self.n_python_stages}",
        ]
        for s in self.scans:
            lines.append(
                f"scan {s['format']} {s['location']}: cols={s['n_columns']} "
                f"pushed={s['pushed_filters'] or '-'}"
            )
        if self.red_flags:
            lines.append("RED FLAGS: " + "; ".join(self.red_flags))
        return "\n".join(lines)


def _plan_text(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit(df: DataFrame, execute: bool = False) -> PlanAudit:
    """Parse plan facts. With ``execute=True`` the frame is executed
    (collect — test/notebook scale only!) so AQE's FINAL plan is
    audited, including whole-stage-codegen spans, which do not exist
    before adaptive execution picks the physical plan."""
    text = _plan_text(df, "formatted")
    simple = _plan_text(df, "simple")
    out = PlanAudit()
    out.n_exchanges = len(re.findall(r"\bExchange\b", simple))
    out.n_broadcast_joins = len(re.findall(r"BroadcastHashJoin", simple))
    out.n_shuffle_joins = len(
        re.findall(r"SortMergeJoin|ShuffledHashJoin", simple)
    )
    out.n_cartesian = len(
        re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", simple)
    )
    if execute:
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        out.n_codegen_spans = len(set(re.findall(r"\*\((\d+)\)", executed)))
    else:
        out.n_codegen_spans = -1  # unknown pre-execution under AQE
    out.n_python_stages = len(
        re.findall(
            r"FlatMapGroupsIn(?:Pandas|Arrow)|MapInPandas|MapInArrow|ArrowEvalPython|BatchEvalPython",
            simple,
        )
    )

    # per-scan facts from the formatted plan's node sections
    for m in re.finditer(
        r"\(\d+\) Scan (\w+)[^\n]*\n(?:Output[^\n]*\n)?(?:Batched[^\n]*\n)?"
        r"(?:Location: ?([^\n]*)\n)?(?:PushedFilters: ?\[([^\]]*)\][^\n]*\n)?"
        r"(?:ReadSchema: ?([^\n]*)\n)?",
        text,
    ):
        fmt, loc, pushed, schema = m.groups()
        n_cols = schema.count(":") if schema else 0
        out.scans.append(
            {
                "format": fmt,
                "location": (loc or "").strip()[:120],
                "pushed_filters": (pushed or "").strip(),
                "n_columns": n_cols,
                # heuristic: >24 columns read usually means pruning failed
                "full_schema": n_cols > 24,
            }
        )
    return out


def assert_scalable(df: DataFrame) -> PlanAudit:
    """Raise if the plan has a red flag that will not survive scale-up."""
    a = audit(df)
    if a.red_flags:
        raise AssertionError("plan not scale-safe: " + "; ".join(a.red_flags) + "\n" + a.summary())
    return a
