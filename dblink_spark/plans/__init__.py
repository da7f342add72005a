"""Physical-plan inspection utilities (dblink_spark.plans.audit).

The reference has no optimizer to port (SURVEY.md §4) — our planning is
Catalyst's job. What we own is *verifying* the plans Catalyst produces are
the ones we want: filters pushed into scans, columns pruned, small sides
broadcast, no gratuitous shuffles. `audit` turns those properties into
assertions and a CLI report.
"""

from dblink_spark.plans.audit import (  # noqa: F401
    audit_plan,
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    formatted_plan,
    scan_infos,
)
