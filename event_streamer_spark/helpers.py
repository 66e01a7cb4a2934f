"""Pure-Python helpers mirroring the reference's ``src/helpers/index.ts``.

Behavioral parity targets (SURVEY.md §2.A):

* A12 subject normalization — ``stringToUpperCamelCase``
  (reference ``src/helpers/index.ts:8-10``): uppercase the first
  character, uppercase any character following one of ``- _ `` (space),
  dropping the separator. ``event-code-c`` → ``EventCodeC``,
  ``my_event`` → ``MyEvent``, ``already Upper`` → ``AlreadyUpper``.
* ``toArray`` (reference ``src/helpers/index.ts:4-6``): ``null`` → empty
  list, lists pass through, anything else wraps in a one-element list.
* ``getParsedJson`` (reference ``src/helpers/index.ts:12-21``): parse a
  JSON string, returning **whatever** the parse yields (objects, arrays,
  numbers, strings — reference returns ``JSON.parse``'s value); only
  parse failures and null input yield ``None``, which callers drop
  silently (A3). Non-dict content dispatches to catch-all routes like
  the reference (``content.code`` is undefined → matches
  ``eventName == null``). Note: the *declarative* Spark path
  (``envelope.parse_stream`` via ``from_json``) only parses objects —
  arrays/scalars land in the corrupt column there; that is an
  engine-side difference of the scale path, not of this helper.
"""

from __future__ import annotations

import json
import re
from typing import Any, TypeVar

T = TypeVar("T")

_SEP_THEN_CHAR = re.compile(r"[-_ ].")


def to_upper_camel_case(value: str) -> str:
    """Normalize an event subject to UpperCamelCase (A12).

    Exact mirror of the reference
    (``charAt(0).toUpperCase() + slice(1).replace(/[-_ ]./g,
    x => x[1].toUpperCase())``), including its edge behavior: the
    replacement uppercases the single character after a separator and
    drops that separator, scanning non-overlapping matches — so
    ``'a--b'`` → ``'A-b'`` (the second ``-`` is the "uppercased" char),
    ``'-abc'`` → ``'-abc'`` (leading separator is position 0, kept),
    and a trailing separator is kept (no following char to match).
    """
    if not value:
        return value
    return value[0].upper() + _SEP_THEN_CHAR.sub(
        lambda m: m.group(0)[1].upper(), value[1:]
    )


def to_array(value: T | list[T] | None) -> list[T]:
    """``null`` → ``[]``; lists pass through; scalars wrap (``toArray``)."""
    if value is None:
        return []
    if isinstance(value, list):
        return value
    return [value]


def get_parsed_json(value: Any) -> Any:
    """Parse a JSON message value; return ``None`` only when unparseable.

    Mirrors the reference exactly: the parsed value is returned whatever
    its type (object, array, number, string, boolean) — the reference
    returns ``JSON.parse``'s result and lets dispatch handle non-object
    content via catch-all routes. ``None`` input, undecodable bytes, and
    parse failures yield ``None`` (dropped silently, A3); JSON ``null``
    also yields ``None`` and is likewise dropped, matching the
    reference's ``content != null`` guard.
    """
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        try:
            value = value.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(value, (dict, list)):
        return value
    if not isinstance(value, str):
        return None
    try:
        return json.loads(value)
    except (json.JSONDecodeError, ValueError):
        return None


def hadoop_path_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on whatever filesystem Spark resolves it
    to (local, HDFS, S3A, ...) — the Hadoop FS API, not ``os.path``, so
    checkpoint/state paths behave identically on a real cluster.

    Used to distinguish "state not created yet" from real IO errors:
    callers check existence FIRST and then let genuine read failures
    (corrupt files, permission errors) propagate instead of swallowing
    them as empty state.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))
