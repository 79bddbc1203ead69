"""Property-based tests (hypothesis) for the pure-Python CSVW kernel:
format microsyntaxes, lexical validation, URI templates. These pin the
kernel's invariants over the whole input space, not just the suite's
fixtures - cheap (no Spark) and they guard the compiled path too, since
the Arrow normalizer calls these exact functions."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from csvweb_spark.csvw.convert import lexical_valid
from csvweb_spark.csvw.formats import (DateFormat, FormatError,
                                       NumericFormat)
from csvweb_spark.csvw.model import Column, Datatype
from csvweb_spark.csvw.uritemplate import (BindingError, compile_template,
                                           resolve_against_base)


# ---------------------------------------------------------------------------
# numeric formats
# ---------------------------------------------------------------------------


@given(st.integers(min_value=-(10 ** 15), max_value=10 ** 15))
def test_default_grouped_numeric_roundtrip(n):
    """Python's thousands grouping is always a valid default-format
    numeric, and normalization strips the grouping exactly."""
    fmt = NumericFormat(group_char=",")
    lit = f"{n:,}"
    assert fmt.is_valid(lit)
    assert fmt.normalize(lit) == str(n)


@given(st.integers(min_value=0, max_value=10 ** 15),
       st.integers(min_value=0, max_value=999999))
def test_european_decimal_normalizes_to_xsd(n, frac):
    """decimalChar=',' groupChar='.': normalize swaps to the XSD '.'
    form and drops the group char, preserving the lexical digits."""
    fmt = NumericFormat(decimal_char=",", group_char=".")
    lit = f"{n:,}".replace(",", ".") + f",{frac}"
    assert fmt.is_valid(lit)
    assert fmt.normalize(lit) == f"{n}.{frac}"


@given(st.integers(min_value=0, max_value=10 ** 12),
       st.integers(min_value=0, max_value=99))
def test_pattern_numeric_accepts_exact_shape(n, cents):
    """UAX#35 pattern '#,##0.00': correctly grouped two-decimal literals
    validate; dropping the required fraction digit invalidates."""
    fmt = NumericFormat(pattern="#,##0.00")
    lit = f"{n:,}.{cents:02d}"
    assert fmt.is_valid(lit)
    assert not fmt.is_valid(f"{n:,}.{cents:02d}0")  # 3 frac digits > max
    assert not fmt.is_valid(f"{n:,}")               # missing required frac


@given(st.integers(min_value=1000, max_value=10 ** 12))
def test_pattern_numeric_requires_grouping(n):
    """With a grouped pattern, an ungrouped integer longer than the
    primary group size must be rejected."""
    fmt = NumericFormat(pattern="#,##0.00")
    assert not fmt.is_valid(f"{n}.00")


@given(st.text(alphabet="0123456789,.", min_size=1, max_size=20))
def test_numeric_normalize_idempotent(s):
    """For any accepted default-format literal, normalization is
    idempotent (the normalized form is itself valid and fixed)."""
    fmt = NumericFormat(group_char=",")
    if fmt.is_valid(s):
        once = fmt.normalize(s)
        assert fmt.is_valid(once)
        assert fmt.normalize(once) == once


# ---------------------------------------------------------------------------
# date formats
# ---------------------------------------------------------------------------


@given(st.dates(min_value=datetime.date(1, 1, 1),
                max_value=datetime.date(9999, 12, 31)))
def test_date_format_roundtrip(d):
    fmt = DateFormat("dd/MM/yyyy")
    lit = f"{d.day:02d}/{d.month:02d}/{d.year:04d}"
    assert fmt.is_valid(lit)
    assert fmt.normalize(lit) == d.isoformat()


@given(st.integers(min_value=2000, max_value=2100))
def test_date_format_rejects_impossible_dates(y):
    fmt = DateFormat("yyyy-MM-dd")
    assert not fmt.is_valid(f"{y:04d}-02-31")
    assert not fmt.is_valid(f"{y:04d}-13-01")
    with __import__("pytest").raises(FormatError):
        fmt.normalize(f"{y:04d}-02-31")


# ---------------------------------------------------------------------------
# lexical validation (W3C cell-parsing step 8)
# ---------------------------------------------------------------------------

_RANGES = {"byte": (-128, 127), "short": (-32768, 32767),
           "int": (-2 ** 31, 2 ** 31 - 1),
           "unsignedByte": (0, 255)}


@given(st.sampled_from(sorted(_RANGES)),
       st.integers(min_value=-10 ** 10, max_value=10 ** 10))
def test_bounded_integer_bases_check_range(base, i):
    col = Column(name="c", datatype=Datatype(base=base))
    lo, hi = _RANGES[base]
    assert lexical_valid(str(i), col) == (lo <= i <= hi)


@given(st.integers(min_value=-10 ** 30, max_value=10 ** 30))
def test_integer_base_accepts_all_integers(i):
    col = Column(name="c", datatype=Datatype(base="integer"))
    assert lexical_valid(str(i), col)
    assert not lexical_valid(f"{i}.5", col)


@given(st.integers(min_value=-10 ** 6, max_value=10 ** 6),
       st.integers(min_value=10, max_value=10 ** 6))
def test_minimum_constraint_is_exact(i, lo):
    col = Column(name="c", datatype=Datatype(
        base="integer", constraints=[("minimum", lo)]))
    assert lexical_valid(str(i), col) == (i >= lo)


# ---------------------------------------------------------------------------
# URI templates
# ---------------------------------------------------------------------------

_lit = st.text(
    alphabet=st.characters(blacklist_characters="{}", min_codepoint=32,
                           max_codepoint=126),
    max_size=12)
_val = st.text(
    alphabet=st.characters(blacklist_characters="{},", min_codepoint=33,
                           max_codepoint=126),
    min_size=1, max_size=12)


@given(_lit, _val, _lit)
def test_template_resolution_is_concatenation(pre, val, post):
    """The reference's resolver does no percent-encoding: the resolved
    IRI is literally prefix + value + suffix."""
    t = compile_template(pre + "{v}" + post)
    assert t.variables == ("v",)
    assert t.resolve({"v": val}.get) == pre + val + post


@given(_lit)
def test_template_missing_binding_raises(pre):
    t = compile_template(pre + "{v}")
    import pytest
    with pytest.raises(BindingError):
        t.resolve(lambda _v: None)
    with pytest.raises(BindingError):
        t.resolve(lambda _v: "")


@given(st.sampled_from(["http://ex.org/a/b", "https://h/x?q=1"]), _val)
@settings(max_examples=30)
def test_absolute_iris_pass_through_base_resolution(base, path):
    absolute = "http://other.example/" + path
    assert resolve_against_base(base, absolute) == absolute
