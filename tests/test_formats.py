"""Format-specification parity tests.

The (pattern, input, valid, normalized) rows are ported verbatim from the
reference's own test tables (SURVEY.md §5 layer 3):
  dates     /root/reference/src/DataDock.CsvWeb.Tests/DateFormatSpecificationSpec.cs:13-28
  times     /root/reference/src/DataDock.CsvWeb.Tests/TimeFormatSpecificationSpec.cs:11-49
  datetimes /root/reference/src/DataDock.CsvWeb.Tests/DateTimeFormatSpecificationSpec.cs:11-52
"""

import pytest

from csvweb_spark.csvw.formats import (
    BooleanFormat,
    DateFormat,
    DateTimeFormat,
    NumericFormat,
    TimeFormat,
    format_double_csharp,
)

DATE_CASES = [
    ("yyyy-MM-dd", "2015-03-22", True, "2015-03-22"),
    ("yyyyMMdd", "20150322", True, "2015-03-22"),
    ("dd-MM-yyyy", "22-03-2015", True, "2015-03-22"),
    ("d-M-yyyy", "22-3-2015", True, "2015-03-22"),
    ("MM-dd-yyyy", "03-22-2015", True, "2015-03-22"),
    ("M-d-yyyy", "3-22-2015", True, "2015-03-22"),
    ("dd/MM/yyyy", "22/03/2015", True, "2015-03-22"),
    ("d/M/yyyy", "22/3/2015", True, "2015-03-22"),
    ("MM/dd/yyyy", "03/22/2015", True, "2015-03-22"),
    ("M/d/yyyy", "3/22/2015", True, "2015-03-22"),
    ("dd.MM.yyyy", "22.03.2015", True, "2015-03-22"),
    ("d.M.yyyy", "22.3.2015", True, "2015-03-22"),
    ("MM.dd.yyyy", "03.22.2015", True, "2015-03-22"),
    ("M.d.yyyy", "3.22.2015", True, "2015-03-22"),
    ("u-MM-dd", "2015-03-22", True, "2015-03-22"),
]

TIME_CASES = [
    ("HH:mm:ss.SSS", "15:02:37.143", True, "15:02:37.143"),
    ("HH:mm:ss", "15:02:37", True, "15:02:37"),
    ("HH:mm", "15:02", True, "15:02:00"),
    ("HH:mm:ss.S", "15:02:37.1", True, "15:02:37.1"),
    ("HHmmss", "150237", True, "15:02:37"),
    ("HHmm", "1502", True, "15:02:00"),
    ("HH:mm:ss.SSSX", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSX", "15:02:37.143-08", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSX", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSXX", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSXX", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSXX", "15:02:37.143-0800", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSXX", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSZ", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSZ", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSZ", "15:02:37.143-0800", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSZ", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSXXX", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSXXX", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSXXX", "15:02:37.143-0800", False, None),
    ("HH:mm:ss.SSSXXX", "15:02:37.143+0530", False, None),
    ("HH:mm:ss.SSSXXX", "15:02:37.143-08:00", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSXXX", "15:02:37.143+05:30", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSx", "15:02:37.143Z", False, None),
    ("HH:mm:ss.SSSx", "15:02:37.143+00", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSx", "15:02:37.143-08", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSx", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSxx", "15:02:37.143Z", False, None),
    ("HH:mm:ss.SSSxx", "15:02:37.143+0000", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSxx", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSxx", "15:02:37.143-0800", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSxx", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSxxx", "15:02:37.143Z", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143+00:00", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSxxx", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143-0800", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143+0530", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143-08:00", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSxxx", "15:02:37.143+05:30", True, "15:02:37.143+05:30"),
]

DATETIME_CASES = [
    ("yyyy-MM-ddTHH:mm:ss.SSS", "2015-03-15T15:02:37.143", True, "2015-03-15T15:02:37.143"),
    ("yyyy-MM-ddTHH:mm:ss", "2015-03-15T15:02:37", True, "2015-03-15T15:02:37"),
    ("yyyy-MM-ddTHH:mm", "2015-03-15T15:02", True, "2015-03-15T15:02:00"),
    ("dd-MM-yyyy HH:mm:ss.S", "15-03-2015 15:02:37.1", True, "2015-03-15T15:02:37.1"),
    ("d/M/yyyy HH:mm:ss", "15/3/2015 15:02:37", True, "2015-03-15T15:02:37"),
    ("M/d/yyyy HHmmss", "3/15/2015 150237", True, "2015-03-15T15:02:37"),
    ("dd.MM.yyyy HH:mm", "15.03.2015 15:02", True, "2015-03-15T15:02:00"),
    ("M.d.yyyy HHmm", "3.15.2015 1502", True, "2015-03-15T15:02:00"),
    ("yyyy-MM-ddTHH:mm:ss.SSSX", "2015-03-15T15:02:37.143Z", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSX", "2015-03-15T15:02:37.143-08", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSX", "2015-03-15T15:02:37.143+0530", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXX", "2015-03-15T15:02:37.143Z", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXX", "2015-03-15T15:02:37.143-08", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSXX", "2015-03-15T15:02:37.143-0800", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXX", "2015-03-15T15:02:37.143+0530", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSZ", "2015-03-15T15:02:37.143Z", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSZ", "2015-03-15T15:02:37.143-08", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSZ", "2015-03-15T15:02:37.143-0800", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSZ", "2015-03-15T15:02:37.143+0530", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143Z", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143-08", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143-0800", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143+0530", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143-08:00", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143+05:30", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSx", "2015-03-15T15:02:37.143Z", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSx", "2015-03-15T15:02:37.143+00", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSx", "2015-03-15T15:02:37.143-08", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSx", "2015-03-15T15:02:37.143+0530", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSxx", "2015-03-15T15:02:37.143Z", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSxx", "2015-03-15T15:02:37.143+0000", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSxx", "2015-03-15T15:02:37.143-08", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSxx", "2015-03-15T15:02:37.143-0800", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSxx", "2015-03-15T15:02:37.143+0530", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143Z", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143+00:00", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143-08", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143-0800", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143+0530", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143-08:00", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSxxx", "2015-03-15T15:02:37.143+05:30", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-M-dTH:m:sZ", "2019-03-16T15:03:23Z", True, "2019-03-16T15:03:23Z"),
]


@pytest.mark.parametrize("fmt,inp,valid,normalized", DATE_CASES)
def test_date_format(fmt, inp, valid, normalized):
    spec = DateFormat(fmt)
    assert spec.is_valid(inp) == valid
    if valid:
        assert spec.normalize(inp) == normalized


@pytest.mark.parametrize("fmt,inp,valid,normalized", TIME_CASES)
def test_time_format(fmt, inp, valid, normalized):
    spec = TimeFormat(fmt)
    assert spec.is_valid(inp) == valid
    if valid:
        assert spec.normalize(inp) == normalized


@pytest.mark.parametrize("fmt,inp,valid,normalized", DATETIME_CASES)
def test_datetime_format(fmt, inp, valid, normalized):
    spec = DateTimeFormat(fmt)
    assert spec.is_valid(inp) == valid
    if valid:
        assert spec.normalize(inp) == normalized


def test_boolean_format():
    spec = BooleanFormat("Y|N")
    assert spec.normalize("Y") == "true"
    assert spec.normalize("N") == "false"
    assert spec.is_valid("Y") and spec.is_valid("N") and not spec.is_valid("y")


def test_numeric_normalize_is_string_transform():
    # W3C csv2rdf numeric normalization: group strip + decimal swap only,
    # lexical form otherwise preserved (suite tests 158/283)
    spec = NumericFormat(decimal_char=",", group_char=".")
    assert spec.normalize("1.234,50") == "1234.50"
    assert spec.normalize("+1,5") == "+1.5"


def test_numeric_normalize_percent_scaling():
    spec = NumericFormat()
    assert spec.normalize("123%") == "1.23"
    assert spec.normalize("-123‰") == "-0.123"
    # exponent form preserved modulo the lowercase marker (suite test158)
    assert spec.normalize("1.5E2") == "1.5e2"


def test_numeric_default_regex_quirk():
    # the reference's default regex requires an E/%/‰ suffix; ours makes it
    # optional (W3C validation semantics - the reference never calls
    # IsValid during conversion, so conversion parity is unaffected)
    spec = NumericFormat()
    assert spec.is_valid("42.5")
    assert spec.is_valid("42.5E0")
    assert spec.is_valid("NaN")
    assert spec.is_valid("-INF")
    assert spec.is_valid("50%")


def test_format_double_csharp():
    assert format_double_csharp(150.0) == "150"
    assert format_double_csharp(1e-7) == "1E-07"
    assert format_double_csharp(1e15) == "1E+15"
    assert format_double_csharp(1.5e20) == "1.5E+20"
    assert format_double_csharp(0.0001) == "0.0001"
    assert format_double_csharp(-2.5) == "-2.5"
    assert format_double_csharp(123456789012345.0) == "123456789012345"
