"""Hypothesis property tests for the pure-Python parity-sensitive
logic: threshold arithmetic (RowBased.calcErrorCountThreshold
semantics) and variable substitution. These run without a
SparkSession, so they explore far more of the input space than the
example-based specs at negligible cost."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from data_validator_spark.substitution import VarSubstitution, VarSubstitutionError
from data_validator_spark.validators.base import (
    calc_error_count_threshold,
    parse_threshold,
)

NAMES = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(st.integers(min_value=1, max_value=10**12), st.integers(min_value=0, max_value=100))
def test_percent_threshold_matches_fraction(row_count, pct):
    """'N%' and the same fraction as a decimal must agree (the two
    spellings multiply in different float orders — pct*(rc/100) vs
    (pct/100)*rc — so after truncation they may differ by at most one
    error; anything larger is a real semantic divergence)."""
    as_pct = calc_error_count_threshold(f"{pct}%", row_count)
    if 0 < pct < 100:
        as_frac = calc_error_count_threshold(str(pct / 100.0), row_count)
        assert abs(as_pct - as_frac) <= 1
    # both spellings stay within one count of the exact rational value
    exact = row_count * pct // 100
    assert abs(as_pct - exact) <= 1


@given(st.integers(min_value=1, max_value=10**9), st.integers(min_value=0, max_value=10**6))
def test_absolute_threshold_is_row_count_independent(row_count, n):
    assert calc_error_count_threshold(str(n), row_count) == (
        n if n >= 1 else 0
    )


@given(st.integers(min_value=0, max_value=10**9))
def test_threshold_none_means_zero_tolerance(row_count):
    assert calc_error_count_threshold(None, row_count) == 0


@given(st.text(max_size=20))
def test_parse_threshold_never_hangs_or_returns_garbage(s):
    """Any string either parses to a float or raises ValueError."""
    try:
        v = parse_threshold(s)
    except ValueError:
        return
    assert v is None or isinstance(v, float)


@given(NAMES, st.one_of(st.integers(), st.floats(allow_nan=False), st.text(max_size=10)))
def test_exact_variable_reference_preserves_type(name, value):
    vs = VarSubstitution()
    vs.add(name, value)
    assert vs.replace(f"${name}") == value
    assert vs.replace(f"${{{name}}}") == value


@given(NAMES, st.text(alphabet=st.characters(blacklist_characters="$`\\"), max_size=20))
def test_substitution_embeds_str_form(name, value):
    vs = VarSubstitution()
    vs.add(name, value)
    out = vs.replace(f"prefix ${{{name}}} suffix")
    assert out == f"prefix {value} suffix"


@given(NAMES)
def test_undefined_variable_raises(name):
    vs = VarSubstitution()
    with pytest.raises(VarSubstitutionError):
        vs.replace_string(f"x ${name} y")


@given(
    NAMES,
    st.recursive(
        st.one_of(st.integers(), st.text(max_size=8)),
        lambda inner: st.one_of(
            st.lists(inner, max_size=3),
            st.dictionaries(st.text(max_size=5), inner, max_size=3),
        ),
        max_leaves=10,
    ),
)
def test_deep_replace_preserves_structure(name, config):
    """Substituting into a config with no $refs is the identity."""
    vs = VarSubstitution()
    vs.add(name, "v")

    def clean(x):
        if isinstance(x, str):
            return x.replace("$", "")
        if isinstance(x, list):
            return [clean(i) for i in x]
        if isinstance(x, dict):
            return {clean(k): clean(v) for k, v in x.items()}
        return x

    cfg = clean(config)
    assert vs.replace(cfg) == cfg
