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
def test_camel_case_idempotent(s):
    once = to_upper_camel_case(s)
    assert to_upper_camel_case(once) == once


@given(ident)
@settings(max_examples=200)
def test_camel_case_no_separators_out(s):
    assert not set(to_upper_camel_case(s)) & set("-_ ")


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_get_parsed_json_never_raises(s):
    out = get_parsed_json(s)
    assert out is None or isinstance(out, dict)


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
