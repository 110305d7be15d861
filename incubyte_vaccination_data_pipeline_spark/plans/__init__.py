"""Physical-plan introspection: the engine's scalability audit surface.

The reference delegates all physical planning to Snowflake and offers
no way to inspect it (`src/utils/snowflake_connector.py:143-164` just
ships SQL text). On Spark the physical plan is first-class, and at the
100 TB design point the *shape* of the plan — do filters reach the
scan, do small dimensions broadcast, how many shuffles, did codegen
compile — is as much a correctness property as the row values. This
module turns ``df.explain()`` text into a structured report so both
tests (``tests/test_plans.py``) and operators can assert on it.

Usage::

    from incubyte_vaccination_data_pipeline_spark.plans import audit
    report = audit(df)
    assert not report.cartesian, "join degraded to a cross product"
    assert report.broadcast_joins >= 2
    assert report.scans[0].pushed_filters
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ScanInfo:
    """One parquet/file scan in the plan."""

    columns: tuple[str, ...]
    pushed_filters: tuple[str, ...]
    partition_filters: tuple[str, ...]
    location: str


@dataclass(frozen=True)
class PlanReport:
    """Structured summary of an executed (physical) plan."""

    text: str
    scans: tuple[ScanInfo, ...] = ()
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    cartesian: bool = False
    nested_loop_joins: int = 0
    exchanges: int = 0
    reused_exchanges: int = 0
    hash_aggregates: int = 0
    sort_aggregates: int = 0
    wholestage_ids: tuple[int, ...] = ()
    adaptive: bool = False
    warnings: tuple[str, ...] = field(default=())

    @property
    def shuffles(self) -> int:
        """Exchanges net of reuse — the actual data movements."""
        return self.exchanges - self.reused_exchanges

    @property
    def codegen(self) -> bool:
        """True if at least one whole-stage compiled."""
        return bool(self.wholestage_ids)


_SCAN_RE = re.compile(
    r"Scan (?:parquet|csv|json)\s*\[([^\]]*)\].*?"
    r"(?:PartitionFilters: \[([^\]]*)\])?,?\s*"
    r"(?:PushedFilters: \[([^\]]*)\])?,?\s*",
    re.DOTALL,
)


def _split_filters(raw: str | None) -> tuple[str, ...]:
    if not raw:
        return ()
    parts, depth, cur = [], 0, []
    for ch in raw:
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        depth += ch in "(["
        depth -= ch in ")]"
        cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return tuple(p for p in parts if p)


def _scan_infos(text: str) -> tuple[ScanInfo, ...]:
    infos = []
    for line in text.splitlines():
        if "Scan parquet" not in line and "Scan csv" not in line and (
            "Scan json" not in line
        ):
            continue
        cols = re.search(r"Scan \w+ \[([^\]]*)\]", line)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", line)
        loc = re.search(r"Location: \S+\[([^\]]*)\]", line)
        infos.append(
            ScanInfo(
                columns=tuple(
                    re.sub(r"#\d+L?", "", c).strip()
                    for c in (cols.group(1).split(",") if cols else [])
                    if c.strip()
                ),
                pushed_filters=_split_filters(pushed and pushed.group(1)),
                partition_filters=_split_filters(part and part.group(1)),
                location=(loc.group(1) if loc else ""),
            )
        )
    return tuple(infos)


def audit(df: DataFrame, execute: bool = False) -> PlanReport:
    """Summarize ``df``'s physical plan.

    With ``execute=True`` the DataFrame's own query is run first so an
    AQE-wrapped plan finalizes (runtime re-planning — coalesced
    shuffles, demoted broadcasts, skew splits — only shows in the
    final plan) and whole-stage codegen ids become visible.
    """
    if execute:
        df.foreach(lambda _row: None)
    text = df._jdf.queryExecution().executedPlan().toString()

    warnings: list[str] = []
    cartesian = "CartesianProduct" in text
    nlj = text.count("BroadcastNestedLoopJoin")
    if cartesian:
        warnings.append("cartesian product: O(n*m) — will not scale")
    if nlj:
        warnings.append("nested-loop join: non-equi condition reached a join")
    scans = _scan_infos(text)
    for s in scans:
        if len(s.columns) > 20:
            warnings.append(
                f"scan reads {len(s.columns)} columns — check projection"
            )

    return PlanReport(
        text=text,
        scans=scans,
        broadcast_joins=text.count("BroadcastHashJoin"),
        sort_merge_joins=text.count("SortMergeJoin"),
        shuffled_hash_joins=text.count("ShuffledHashJoin"),
        cartesian=cartesian,
        nested_loop_joins=nlj,
        exchanges=len(re.findall(r"\bExchange\b", text)),
        reused_exchanges=text.count("ReusedExchange"),
        hash_aggregates=text.count("HashAggregate"),
        sort_aggregates=text.count("SortAggregate"),
        wholestage_ids=tuple(
            sorted({int(m) for m in re.findall(r"\*\((\d+)\)", text)})
        ),
        adaptive="AdaptiveSparkPlan" in text,
        warnings=tuple(warnings),
    )


def assert_scalable(df: DataFrame, max_shuffles: int | None = None) -> PlanReport:
    """Raise ``AssertionError`` if the plan has a shape that would not
    survive a 100x scale-up (cartesian products, nested-loop joins,
    or more shuffles than ``max_shuffles``). Returns the report."""
    report = audit(df)
    assert not report.cartesian, f"cartesian product in plan:\n{report.text}"
    assert not report.nested_loop_joins, (
        f"nested-loop join in plan:\n{report.text}"
    )
    if max_shuffles is not None:
        assert report.shuffles <= max_shuffles, (
            f"{report.shuffles} shuffles > budget {max_shuffles}:\n{report.text}"
        )
    return report
