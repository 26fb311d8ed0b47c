"""Unit tests for the spark-submit job entry points' argument handling."""

from __future__ import annotations

import pytest

from jobs.maintain_job import _coerce_bound, parse_delete_spec


def test_parse_delete_spec_plain():
    assert parse_delete_spec("score:10:20") == ("score", 10, 20)
    assert parse_delete_spec("score:1.5:2.5") == ("score", 1.5, 2.5)
    assert parse_delete_spec("lang:aa:zz") == ("lang", "aa", "zz")


def test_parse_delete_spec_open_bounds():
    assert parse_delete_spec("score::20") == ("score", None, 20)
    assert parse_delete_spec("score:10:") == ("score", 10, None)


def test_parse_delete_spec_quoted_forces_string():
    # quoted numeric-looking bound stays a string
    assert parse_delete_spec("id:'100':'200'") == ("id", "100", "200")


def test_parse_delete_spec_quoted_colon():
    # the documented string-forcing syntax with colons INSIDE the bound
    assert parse_delete_spec("ts:'12:00':'13:00'") == ("ts", "12:00", "13:00")
    assert parse_delete_spec('ts:"a:b":"c:d"') == ("ts", "a:b", "c:d")


def test_parse_delete_spec_rejects_bad_arity():
    with pytest.raises(ValueError):
        parse_delete_spec("score:10")
    with pytest.raises(ValueError):
        parse_delete_spec("a:b:c:d")


def test_coerce_bound():
    assert _coerce_bound(None) is None
    assert _coerce_bound("") is None
    assert _coerce_bound("7") == 7
    assert _coerce_bound("7.5") == 7.5
    assert _coerce_bound("'7'") == "7"
    assert _coerce_bound("abc") == "abc"
