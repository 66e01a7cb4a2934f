"""Pure-Python helpers mirroring the reference's ``src/helpers/index.ts``.

Behavioral parity targets (SURVEY.md §2.A):

* A12 subject normalization — ``stringToUpperCamelCase``
  (reference ``src/helpers/index.ts:8-10``): uppercase the first
  character, uppercase any character following one of ``- _ `` (space),
  dropping the separator. ``event-code-c`` → ``EventCodeC``,
  ``my_event`` → ``MyEvent``, ``already Upper`` → ``AlreadyUpper``.
* ``toArray`` (reference ``src/helpers/index.ts:4-6``): wrap a non-list
  value in a single-element list; pass lists through.
* ``getParsedJson`` (reference ``src/helpers/index.ts:12-21``): parse a
  JSON string; any failure (or non-object result, or null input) yields
  ``None`` so the caller can silently drop the record (A3).
"""

from __future__ import annotations

import json
from typing import Any, TypeVar

T = TypeVar("T")

_SEPARATORS = frozenset("-_ ")


def to_upper_camel_case(value: str) -> str:
    """Normalize an event subject to UpperCamelCase (A12).

    Uppercases the first character and any character that follows a
    ``-``, ``_`` or space separator; separators themselves are removed.
    Consecutive separators collapse. Other characters pass through
    unchanged (so ``myEventName`` → ``MyEventName``).
    """
    out: list[str] = []
    upper_next = True
    for ch in value:
        if ch in _SEPARATORS:
            upper_next = True
            continue
        out.append(ch.upper() if upper_next else ch)
        upper_next = False
    return "".join(out)


def to_array(value: T | list[T]) -> list[T]:
    """Wrap a scalar in a list; pass lists through (``toArray``)."""
    if isinstance(value, list):
        return value
    return [value]


def get_parsed_json(value: Any) -> dict | None:
    """Parse a JSON message value; return ``None`` for anything invalid.

    Mirrors the reference's drop-corrupt contract (A3): ``None`` input,
    bytes that don't decode, strings that don't parse, and JSON that is
    not an object all map to ``None``. Callers drop ``None`` silently.
    """
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        try:
            value = value.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(value, dict):
        return value
    if not isinstance(value, str):
        return None
    try:
        parsed = json.loads(value)
    except (json.JSONDecodeError, ValueError):
        return None
    if not isinstance(parsed, dict):
        return None
    return parsed
