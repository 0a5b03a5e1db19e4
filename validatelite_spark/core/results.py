"""Result model — ValidateLite-shaped execution results.

Mirrors ExecutionResultSchema / DatasetMetrics
(reference: shared/schema/base.py:242-326, shared/schema/result_schema.py:16-279).
Status is PASSED iff failure *rate* <= rule threshold (the reference's
standard path is threshold=0 → PASSED iff failed==0,
reference: shared/schema/result_schema.py:178-184).

The two-level error taxonomy is preserved: EngineError aborts the run;
RuleExecutionError becomes a per-rule ERROR result and the run continues
(reference: core/engine/rule_engine.py:230-256). Per-rule failure isolation
is mandatory at web scale.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class ExecutionStatus(str, Enum):
    PASSED = "PASSED"
    FAILED = "FAILED"
    ERROR = "ERROR"
    SKIPPED = "SKIPPED"


class EngineError(RuntimeError):
    """System-level error: aborts the whole run."""


class RuleExecutionError(RuntimeError):
    """Per-rule error: becomes an ERROR result, run continues."""


@dataclass
class DatasetMetrics:
    entity_name: str
    total_records: int
    failed_records: int = 0
    processing_time: Optional[float] = None

    @property
    def success_rate(self) -> float:
        if self.total_records == 0:
            return 1.0
        return (self.total_records - self.failed_records) / self.total_records


@dataclass
class RuleResult:
    rule_id: str
    rule_name: str
    rule_type: str
    status: ExecutionStatus
    dataset_metrics: list[DatasetMetrics] = field(default_factory=list)
    execution_time: float = 0.0
    execution_message: Optional[str] = None
    error_message: Optional[str] = None
    sample_data: list[dict[str, Any]] = field(default_factory=list)
    execution_plan: dict[str, Any] = field(default_factory=dict)

    @property
    def total_records(self) -> int:
        return sum(m.total_records for m in self.dataset_metrics)

    @property
    def failed_records(self) -> int:
        return sum(m.failed_records for m in self.dataset_metrics)

    @property
    def passed(self) -> bool:
        return self.status == ExecutionStatus.PASSED

    def to_dict(self) -> dict[str, Any]:
        return {
            "rule_id": self.rule_id,
            "rule_name": self.rule_name,
            "rule_type": self.rule_type,
            "status": self.status.value,
            "total_records": self.total_records,
            "failed_records": self.failed_records,
            "success_rate": (
                1.0 if self.total_records == 0
                else (self.total_records - self.failed_records) / self.total_records
            ),
            "execution_time": self.execution_time,
            "execution_message": self.execution_message,
            "error_message": self.error_message,
            "sample_data": self.sample_data,
            "execution_plan": self.execution_plan,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str)


def status_for(failed: int, total: int, threshold: float) -> ExecutionStatus:
    """PASSED iff failure rate <= threshold (threshold=0 → failed==0)."""
    if total == 0:
        return ExecutionStatus.PASSED
    rate = failed / total
    return ExecutionStatus.PASSED if rate <= threshold else ExecutionStatus.FAILED


#: Spark schema for the metrics table written by the pipeline — mirrors the
#: validation-report payload (reference: docs/schemas/schema_results.schema.json).
METRICS_TABLE_SCHEMA = (
    "rule_id string, rule_name string, rule_type string, status string, "
    "total_records long, failed_records long, success_rate double, "
    "execution_time double, execution_message string, error_message string"
)


def results_to_rows(results: list[RuleResult]) -> list[dict[str, Any]]:
    return [
        {
            "rule_id": r.rule_id,
            "rule_name": r.rule_name,
            "rule_type": r.rule_type,
            "status": r.status.value,
            "total_records": r.total_records,
            "failed_records": r.failed_records,
            "success_rate": (
                1.0 if r.total_records == 0
                else (r.total_records - r.failed_records) / r.total_records
            ),
            "execution_time": r.execution_time,
            "execution_message": r.execution_message,
            "error_message": r.error_message,
        }
        for r in results
    ]
