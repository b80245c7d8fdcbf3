"""Small Ray Data runtime helpers (log hygiene, context tweaks)."""

from __future__ import annotations

import logging
import re

# The empty-schema variant of the executor's schema-divergence warning:
# "... new schema: . This may lead ..." — str(pa.schema([])) is "", so
# the message shows a bare dot where a typed schema would list fields.
_EMPTY_SCHEMA_WARNING = re.compile(
    r"RefBundle with a different schema .*new schema: \. This may lead"
)


class _DropEmptySchemaWarning(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        return not _EMPTY_SCHEMA_WARNING.search(record.getMessage())


def install_empty_schema_warning_filter() -> None:
    """Silence ONLY the benign empty-schema divergence warning.

    Ray's sort/shuffle reduce emits ZERO-COLUMN empty blocks for empty
    range partitions (reproducible: ``ds.sort(k)`` with more blocks than
    distinct keys yields ``pa.table({})`` reduce outputs; groupby /
    map_groups inherit them), and the streaming executor then logs
    "Operator produced a RefBundle with a different schema … new
    schema: ." once per such block — which buries real signal in bench
    tails. The blocks are provably benign (zero rows, zero columns,
    dropped at collection; ray/data/_internal/execution/
    streaming_executor_state.py:794 already ignores the mirror case of
    an empty OLD schema). This filter drops exactly that message; a
    divergence between two TYPED schemas still warns. Idempotent."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _DropEmptySchemaWarning) for f in logger.filters):
        logger.addFilter(_DropEmptySchemaWarning())
