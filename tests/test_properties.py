"""Property-based tests (hypothesis) for the pure-Python kernel."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from event_streamer_spark.debug import Debug, debug
from event_streamer_spark.helpers import (
    get_parsed_json,
    to_array,
    to_upper_camel_case,
)

ident = st.text(alphabet=string.ascii_letters + "-_ ", max_size=40)


@given(ident)
@settings(max_examples=200)
def test_camel_case_idempotent_without_separator_runs(s):
    # reference-exact normalization is idempotent only when no
    # consecutive/leading/trailing separators survive the first pass
    once = to_upper_camel_case(s)
    if not set(once) & set("-_ "):
        assert to_upper_camel_case(once) == once


@given(ident)
@settings(max_examples=200)
def test_camel_case_drops_isolated_separators(s):
    # single separators between word chars are always consumed
    import re
    if not re.search(r"[-_ ][-_ ]|^[-_ ]|[-_ ]$", s):
        assert not set(to_upper_camel_case(s)) & set("-_ ")


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_get_parsed_json_never_raises(s):
    # reference returns whatever JSON.parse yields (any JSON type);
    # the only contract is: never raise, unparseable -> None
    import json as _json
    out = get_parsed_json(s)
    if out is not None:
        _json.dumps(out)  # any parsed value is JSON-serializable


@given(st.dictionaries(st.text(max_size=10), st.integers(), max_size=5))
@settings(max_examples=100)
def test_get_parsed_json_roundtrip(d):
    assert get_parsed_json(json.dumps(d)) == d


@given(st.one_of(st.integers(), st.lists(st.integers(), max_size=5)))
def test_to_array_always_list(v):
    out = to_array(v)
    assert isinstance(out, list)
    assert to_array(out) == out  # idempotent on lists


def test_debug_gating_never_raises():
    for level in Debug:
        debug(level, "msg")  # unconfigured → silent, no raise
