"""Core value types of the HTTP-enrichment engine.

Re-expresses (Spark-first, no code translation) the observable data model of
the reference connector:

- completion-state enum: reference
  ``table/lookup/HttpCompletionState.java:21-27``
- response wrapper (rows + error + headers + status + state): reference
  ``table/lookup/HttpRowDataWrapper.java:36-51``
- metadata columns (virtual, appended after physical columns): reference
  ``table/lookup/HttpLookupTableSource.java:345-359``
- sink request entry (method, payload bytes): reference
  ``sink/HttpSinkRequestEntry.java:36-50``
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Mapping, Optional, Sequence

from pyspark.sql import types as T


class HttpCompletionState(str, Enum):
    """Terminal state of one lookup HTTP interaction.

    Values match the reference verbatim (``HttpCompletionState.java:21-27``)
    because they are user-visible via the ``http-completion-state`` metadata
    column.
    """

    SUCCESS = "SUCCESS"
    HTTP_ERROR_STATUS = "HTTP_ERROR_STATUS"
    EXCEPTION = "EXCEPTION"
    UNABLE_TO_DESERIALIZE_RESPONSE = "UNABLE_TO_DESERIALIZE_RESPONSE"
    IGNORE_STATUS_CODE = "IGNORE_STATUS_CODE"


@dataclass
class HttpLookupResult:
    """Everything one lookup call produced (reference ``HttpRowDataWrapper``).

    ``rows`` holds zero or more decoded result dicts (single-value responses
    produce one, array responses produce N — reference
    ``JavaNetHttpPollingClient.java:340-376``).
    """

    rows: Sequence[Mapping[str, Any]] = field(default_factory=tuple)
    error_string: Optional[str] = None
    status_code: Optional[int] = None
    headers: Optional[Mapping[str, Sequence[str]]] = None
    completion_state: HttpCompletionState = HttpCompletionState.SUCCESS


@dataclass(frozen=True)
class HttpSinkRequestEntry:
    """One buffered sink element: HTTP method + serialized payload bytes."""

    method: str
    payload: bytes

    @property
    def size_in_bytes(self) -> int:
        return len(self.payload)


# --- metadata columns -------------------------------------------------------

#: Names/types of the virtual metadata columns a lookup join can append,
#: in the reference's declaration order (``HttpLookupTableSource.java:345-359``).
METADATA_FIELDS: tuple = (
    T.StructField("error-string", T.StringType(), True),
    T.StructField("http-status-code", T.IntegerType(), True),
    T.StructField(
        "http-headers",
        T.MapType(T.StringType(), T.ArrayType(T.StringType())),
        True,
    ),
    T.StructField("http-completion-state", T.StringType(), True),
)

METADATA_COLUMN_NAMES: tuple = tuple(f.name for f in METADATA_FIELDS)


def metadata_schema(requested: Sequence[str] | None = None) -> T.StructType:
    """Schema of the requested metadata columns (metadata pushdown: only
    requested columns are computed — reference
    ``HttpLookupTableSource.java:302-340``)."""
    names = set(METADATA_COLUMN_NAMES if requested is None else requested)
    unknown = names - set(METADATA_COLUMN_NAMES)
    if unknown:
        raise ValueError(
            f"Unknown metadata columns {sorted(unknown)}; "
            f"available: {list(METADATA_COLUMN_NAMES)}"
        )
    return T.StructType([f for f in METADATA_FIELDS if f.name in names])
