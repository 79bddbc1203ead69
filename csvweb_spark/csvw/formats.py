"""CSVW datatype `format` specifications: validation + lexical normalization.

Re-implements, in pure Python (vectorizable via pandas .map / .str.extract),
the semantics of the reference's NodaTime-backed format specs:

- boolean  "true|false" literal pair   (Metadata/BooleanFormatSpecification.cs)
- date     Unicode pattern -> ISO date (Metadata/DateFormatSpecification.cs:12-27)
- time     incl. offset tokens         (Metadata/TimeFormatSpecification.cs:12-55)
- datetime date+time combination       (Metadata/DateTimeFormatSpecification.cs:12-37)
- numeric  decimalChar/groupChar/pattern (Metadata/NumericFormatSpecification.cs)

Load-bearing quirks replicated exactly (verified against the reference's own
96 format test rows, Tests/{Date,Time,DateTime}FormatSpecificationSpec.cs):

* Offset tokens map as in TimeFormatSpecification.GetNodaTimePattern (lines
  27-35): X ~ {Z, +-HH, +-HHmm}; XX and Z ~ {Z, +-HHmm}; XXX ~ {Z, +-HH:mm};
  x ~ {+-HH, +-HHmm}; xx ~ {+-HHmm}; xxx ~ {+-HH:mm}.
* Normalized offsets use NodaTime's extended-ISO "general" form: zero ->
  "Z"; otherwise +-HH with the ":mm" suffix only when minutes are non-zero
  ("+09:00" -> "+09", "+0530" -> "+05:30").
* Fractional seconds are parsed per the 'S' count then trailing zeros are
  trimmed on output ('F' pattern semantics); ".000" disappears entirely.
* Numeric normalization strips the group char, swaps the decimal char, and
  round-trips through a binary double iff the literal contains 'E', else
  through an exact decimal (scale preserved) - mirroring double.Parse vs
  decimal.Parse in NumericFormatSpecification.Normalize.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation
from typing import Optional


class FormatError(Exception):
    """Raised by Normalize on invalid input (maps to a cell conversion error,
    Rdf/Converter.cs:456-461)."""


class FormatSpecification:
    def is_valid(self, literal: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def normalize(self, literal: str) -> str:  # pragma: no cover - interface
        raise NotImplementedError


class BooleanFormat(FormatSpecification):
    """'trueLiteral|falseLiteral' pair; normalizes to 'true'/'false'."""

    def __init__(self, fmt: str):
        parts = fmt.split("|")
        self.true_format = parts[0]
        self.false_format = parts[1] if len(parts) > 1 else ""

    def is_valid(self, literal: str) -> bool:
        return literal == self.true_format or literal == self.false_format

    def normalize(self, literal: str) -> str:
        if literal == self.true_format:
            return "true"
        if literal == self.false_format:
            return "false"
        raise FormatError(
            f"Could not parse cell value '{literal}' as a boolean according to "
            "the column format specification."
        )


# --- Unicode date/time pattern -> regex compilation -------------------------

# Offset-token alternatives (see module docstring). Each yields named groups
# off_sign/off_h/off_m or off_z.
_OFFSET_RE = {
    "X": r"(?:(?P<off_z>Z)|(?P<off_sign>[+-])(?P<off_h>\d{2})(?P<off_m>\d{2})?)",
    "XX": r"(?:(?P<off_z>Z)|(?P<off_sign>[+-])(?P<off_h>\d{2})(?P<off_m>\d{2}))",
    "XXX": r"(?:(?P<off_z>Z)|(?P<off_sign>[+-])(?P<off_h>\d{2}):(?P<off_m>\d{2}))",
    "x": r"(?P<off_sign>[+-])(?P<off_h>\d{2})(?P<off_m>\d{2})?",
    "xx": r"(?P<off_sign>[+-])(?P<off_h>\d{2})(?P<off_m>\d{2})",
    "xxx": r"(?P<off_sign>[+-])(?P<off_h>\d{2}):(?P<off_m>\d{2})",
}
# 'Z' pattern letter maps to NodaTime o<Z+HHmm>, i.e. same acceptance as XX.
_OFFSET_ALIASES = {"Z": "XX", "ZZ": "XX", "ZZZ": "XX"}

_FIELD_RES = {
    "yyyy": r"(?P<year>\d{4})",
    "u": r"(?P<year>-?\d{1,9})",  # NodaTime 'u': signed year, variable width
    "MM": r"(?P<month>\d{2})",
    "M": r"(?P<month>\d{1,2})",
    "dd": r"(?P<day>\d{2})",
    "d": r"(?P<day>\d{1,2})",
    "HH": r"(?P<hour>\d{2})",
    "H": r"(?P<hour>\d{1,2})",
    "mm": r"(?P<minute>\d{2})",
    "m": r"(?P<minute>\d{1,2})",
    "ss": r"(?P<second>\d{2})",
    "s": r"(?P<second>\d{1,2})",
}


def _compile_pattern(pattern: str) -> tuple[re.Pattern, bool]:
    """Translate a CSVW Unicode date/time pattern into an anchored regex.

    Returns (compiled_regex, has_offset). Mirrors the token mapping of
    TimeFormatSpecification.GetNodaTimePattern / LocalDate(Time)Pattern."""
    out = []
    i = 0
    has_offset = False
    n = len(pattern)
    while i < n:
        c = pattern[i]
        j = i
        while j < n and pattern[j] == c:
            j += 1
        run = pattern[i:j]
        if c in "Xx":
            key = run if run in _OFFSET_RE else ("X" if c == "X" else "x")
            out.append(_OFFSET_RE[key])
            has_offset = True
        elif c == "Z":
            out.append(_OFFSET_RE[_OFFSET_ALIASES.get(run, "XX")])
            has_offset = True
        elif c == "S":
            # fraction of a second; preceded by a literal '.' already emitted
            out.append(rf"(?P<frac>\d{{1,{len(run)}}})")
        elif run in _FIELD_RES:
            out.append(_FIELD_RES[run])
        elif c == "y":
            out.append(r"(?P<year>\d{" + str(len(run)) + r"})")
        elif c == "u":
            out.append(_FIELD_RES["u"])
        elif c == "T":
            # literal date/time separator (NodaTime treats 'T' as a literal)
            out.append("T" * len(run))
        elif c.isalpha():
            raise FormatError(f"Unsupported pattern field '{run}' in '{pattern}'")
        else:
            out.append(re.escape(run))
        i = j
    return re.compile("^" + "".join(out) + "$"), has_offset


def _norm_offset(m: re.Match, style: str = "short") -> str:
    if m.groupdict().get("off_z"):
        return "Z"
    sign = m.group("off_sign")
    h = int(m.group("off_h"))
    mm = int(m.group("off_m") or 0)
    if h == 0 and mm == 0:
        return "Z"
    if style == "full":
        return f"{sign}{h:02d}:{mm:02d}"
    return f"{sign}{h:02d}:{mm:02d}" if mm else f"{sign}{h:02d}"


def _norm_frac(m: re.Match) -> str:
    frac = (m.groupdict().get("frac") or "").rstrip("0")
    return f".{frac}" if frac else ""


_DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _valid_date(y: int, mo: int, d: int) -> bool:
    if not 1 <= mo <= 12:
        return False
    dim = _DAYS_IN_MONTH[mo - 1]
    if mo == 2 and (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)):
        dim = 29
    return 1 <= d <= dim


class DateFormat(FormatSpecification):
    def __init__(self, fmt: str):
        self._regex, self.has_offset = _compile_pattern(fmt)

    def _parse(self, literal: str) -> Optional[re.Match]:
        m = self._regex.match(literal)
        if m is None:
            return None
        g = m.groupdict()
        if not _valid_date(int(g["year"]), int(g["month"]), int(g["day"])):
            return None
        return m

    def is_valid(self, literal: str) -> bool:
        return self._parse(literal) is not None

    def normalize(self, literal: str) -> str:
        m = self._parse(literal)
        if m is None:
            raise FormatError(f"Cannot parse '{literal}' as date")
        g = m.groupdict()
        out = f"{int(g['year']):04d}-{int(g['month']):02d}-{int(g['day']):02d}"
        if self.has_offset:
            # dates keep the XSD full-form timezone (Z / +-HH:MM) - unlike
            # NodaTime's short offset form used for times/dateTimes
            if g.get("off_z"):
                out += "Z"
            elif g.get("off_sign"):
                h, mm = int(g["off_h"]), int(g.get("off_m") or 0)
                out += "Z" if h == 0 and mm == 0 else \
                    f"{g['off_sign']}{h:02d}:{mm:02d}"
        return out


class TimeFormat(FormatSpecification):
    # 'short' renders +09:00 as +09 (NodaTime/reference); 'full' keeps
    # minutes (W3C suite expected graphs) - toggled by the converter mode
    offset_style = "short"

    def __init__(self, fmt: str):
        self._regex, self.has_offset = _compile_pattern(fmt)

    def _parse(self, literal: str) -> Optional[re.Match]:
        m = self._regex.match(literal)
        if m is None:
            return None
        g = m.groupdict()
        if int(g.get("hour") or 0) > 23 or int(g.get("minute") or 0) > 59 \
                or int(g.get("second") or 0) > 59:
            return None
        return m

    def is_valid(self, literal: str) -> bool:
        return self._parse(literal) is not None

    def normalize(self, literal: str) -> str:
        m = self._parse(literal)
        if m is None:
            raise FormatError(f"Cannot parse '{literal}' as time")
        g = m.groupdict()
        base = (
            f"{int(g.get('hour') or 0):02d}:{int(g.get('minute') or 0):02d}"
            f":{int(g.get('second') or 0):02d}{_norm_frac(m)}"
        )
        return base + (_norm_offset(m, self.offset_style)
                       if self.has_offset else "")


class DateTimeFormat(FormatSpecification):
    offset_style = "short"  # see TimeFormat

    def __init__(self, fmt: str):
        self._regex, self.has_offset = _compile_pattern(fmt)

    def _parse(self, literal: str) -> Optional[re.Match]:
        m = self._regex.match(literal)
        if m is None:
            return None
        g = m.groupdict()
        if not _valid_date(int(g["year"]), int(g["month"]), int(g["day"])):
            return None
        if int(g.get("hour") or 0) > 23 or int(g.get("minute") or 0) > 59 \
                or int(g.get("second") or 0) > 59:
            return None
        return m

    def is_valid(self, literal: str) -> bool:
        return self._parse(literal) is not None

    def normalize(self, literal: str) -> str:
        m = self._parse(literal)
        if m is None:
            raise FormatError(f"Cannot parse '{literal}' as dateTime")
        g = m.groupdict()
        s = (
            f"{int(g['year']):04d}-{int(g['month']):02d}-{int(g['day']):02d}"
            f"T{int(g.get('hour') or 0):02d}:{int(g.get('minute') or 0):02d}"
            f":{int(g.get('second') or 0):02d}{_norm_frac(m)}"
        )
        return s + (_norm_offset(m, self.offset_style)
                    if self.has_offset else "")


# --- numeric -----------------------------------------------------------------


def format_double_csharp(d: float) -> str:
    """Shortest-round-trip double rendering matching .NET invariant
    double.ToString(): scientific iff decimal exponent >= 15 or < -5,
    uppercase 'E' with a signed 2+-digit exponent, no trailing '.0'."""
    if d != d:
        return "NaN"
    if d == float("inf"):
        return "Infinity"
    if d == float("-inf"):
        return "-Infinity"
    r = repr(float(d))
    neg = r.startswith("-")
    if neg:
        r = r[1:]
    if "e" in r:
        mant, exp = r.split("e")
        exp10 = int(exp)
    else:
        mant, exp10 = r, 0
    digits = mant.replace(".", "").lstrip("0") or "0"
    if "." in mant:
        int_len = len(mant.split(".")[0].lstrip("0") or "")
    else:
        int_len = len(mant.lstrip("0") or "")
    # decimal exponent of the leading digit
    if mant.lstrip("0").startswith("."):
        # 0.00xyz form: count zeros after the point
        frac = mant.split(".")[1]
        lead_zeros = len(frac) - len(frac.lstrip("0"))
        dec_exp = -lead_zeros - 1 + exp10
    else:
        dec_exp = (int_len - 1 if int_len > 0 else 0) + exp10
    digits = digits.rstrip("0") or "0"
    sign = "-" if neg else ""
    if digits == "0":
        return "0"
    if dec_exp >= 15 or dec_exp < -5:
        mant_out = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        return f"{sign}{mant_out}E{'+' if dec_exp >= 0 else '-'}{abs(dec_exp):02d}"
    if dec_exp >= len(digits) - 1:
        return sign + digits + "0" * (dec_exp - len(digits) + 1)
    if dec_exp >= 0:
        return sign + digits[: dec_exp + 1] + "." + digits[dec_exp + 1:]
    return sign + "0." + "0" * (-dec_exp - 1) + digits


def format_decimal_csharp(dec: Decimal) -> str:
    """decimal.ToString(InvariantCulture): plain notation, scale preserved."""
    sign, digits, exp = dec.as_tuple()
    s = "".join(map(str, digits))
    if exp >= 0:
        out = s + "0" * exp
    elif -exp < len(s):
        out = s[:exp] + "." + s[exp:]
    else:
        out = "0." + "0" * (-exp - len(s)) + s
    return ("-" if sign else "") + out


class NumericFormat(FormatSpecification):
    """decimalChar/groupChar/pattern numeric format
    (Metadata/NumericFormatSpecification.cs). Note the explicit `pattern`
    regex is UNANCHORED in the reference (MakePatternRegex) - substring
    match - replicated here."""

    def __init__(self, decimal_char: str = ".", group_char: Optional[str] = ",",
                 pattern: Optional[str] = None):
        self.decimal_char = decimal_char
        self.group_char = group_char
        self.pattern = pattern
        self._validate_pattern()
        self._make_regex()

    def _validate_pattern(self):
        if self.pattern is None:
            return
        valid = {"0", "#", self.decimal_char, "E", "+", "%", "‰"}
        if self.group_char:
            valid.add(self.group_char)
        if any(c not in valid for c in self.pattern):
            raise FormatError("Invalid pattern for numeric format specification.")

    def _make_regex(self):
        if self.pattern:
            self._parts = self._parse_pattern(self.pattern)
            self._regex = None
        else:
            grp = "|" + re.escape(self.group_char) if self.group_char else ""
            dec = re.escape(self.decimal_char)
            # reference regex (NumericFormatSpecification.MakePatternRegex)
            # with the E/%/permille suffix made OPTIONAL - W3C validation
            # accepts plain numbers (suite test158); the reference never
            # invokes IsValid during conversion so no parity is lost
            self._regex = re.compile(
                r"^(((\+|-)?\d(\d" + grp + r")*(" + dec + r"\d+)?"
                r"((E(\+|-)?\d+)|%|‰)?)|NaN|(-)?INF)$"
            )
            self._parts = None

    def _parse_pattern(self, pattern: str) -> dict:
        """UAX#35-lite decomposition of a number pattern into prefix/suffix
        literals, integer/fraction min-max digit counts, grouping
        availability per part, and exponent minimum digits."""
        mant, has_exp, exp = pattern.partition("E")
        first = min((mant.index(c) for c in "#0" if c in mant),
                    default=len(mant))
        last = max((mant.rindex(c) for c in "#0" if c in mant), default=-1)
        prefix, digits, suffix = mant[:first], mant[first:last + 1], mant[last + 1:]
        int_part, has_dec, frac_part = digits.partition(self.decimal_char)
        grp = self.group_char
        primary = secondary = None
        if grp and grp in int_part:
            runs = int_part.split(grp)
            primary = len(runs[-1])
            secondary = len(runs[-2]) if len(runs) > 2 else primary
        return {
            "primary_grp": primary,
            "secondary_grp": secondary,
            "prefix": prefix,
            "suffix": suffix,
            "min_int": int_part.count("0"),
            "int_grouped": bool(grp) and grp in int_part,
            "has_frac": bool(has_dec),
            "min_frac": frac_part.count("0"),
            "max_frac": frac_part.count("0") + frac_part.count("#"),
            "frac_grouped": bool(grp) and grp in frac_part,
            "has_exp": bool(has_exp),
            "min_exp": max(exp.count("0"), 1) if has_exp else 0,
            "max_exp": (exp.count("0") + exp.count("#")) if has_exp else 0,
        }

    def _match_pattern(self, literal: str) -> bool:
        p = self._parts
        s = literal
        if not s.startswith(p["prefix"]):
            return False
        s = s[len(p["prefix"]):]
        if p["suffix"]:
            if not s.endswith(p["suffix"]):
                return False
            s = s[:len(s) - len(p["suffix"])]
        # sign accepted even when not in the pattern (UAX35)
        if "+" not in p["prefix"] and "-" not in p["prefix"] and s[:1] in "+-":
            s = s[1:]
        if p["has_exp"]:
            m = re.match(r"^(.*)[eE]([+-]?\d+)$", s)
            if not m:
                return False
            ed = len(m.group(2).lstrip("+-"))
            if ed < p["min_exp"] or ed > max(p["max_exp"], p["min_exp"]):
                return False
            s = m.group(1)
        elif re.search(r"[eE][+-]?\d+$", s):
            return False
        int_s, has_dec, frac_s = s.partition(self.decimal_char)
        if has_dec and not p["has_frac"]:
            return False
        grp = self.group_char

        def digits(part, grouped):
            if grouped and grp:
                if part.startswith(grp) or part.endswith(grp) or grp + grp in part:
                    return None
                part = part.replace(grp, "")
            return part if part.isdigit() or part == "" else None

        if p["int_grouped"] and grp:
            chunks = int_s.split(grp)
            if any(not c.isdigit() for c in chunks if c != "") or "" in chunks:
                return False
            primary, secondary = p["primary_grp"], p["secondary_grp"]
            if len(chunks) == 1:
                if len(chunks[0]) > primary:
                    return False  # grouping required beyond the primary size
            else:
                if len(chunks[-1]) != primary:
                    return False
                if any(len(c) != secondary for c in chunks[1:-1]):
                    return False
                if not 1 <= len(chunks[0]) <= secondary:
                    return False
        di = digits(int_s, p["int_grouped"])
        if di is None or len(di) < p["min_int"]:
            return False
        if not di and not has_dec:
            return False
        if has_dec:
            df = digits(frac_s, p["frac_grouped"])
            if df is None or not (p["min_frac"] <= len(df) <= p["max_frac"]):
                return False
        elif p["min_frac"] > 0:
            return False
        return True

    def is_valid(self, literal: str) -> bool:
        if self._parts is not None:
            return self._match_pattern(literal)
        g = self.group_char
        if g and (g + g in literal or literal.endswith(g)
                  or literal.startswith(g)):
            return False
        return bool(self._regex.match(literal))

    def normalize(self, literal: str) -> str:
        """W3C csv2rdf numeric normalization is a STRING transform: strip
        the group char, swap the decimal char for '.', and scale by 1/100
        (percent) or 1/1000 (permille); the lexical form is otherwise
        preserved (signs, trailing zeros, exponent case - see suite tests
        158/283). Only the percent path round-trips through Decimal."""
        if self.group_char:
            literal = literal.replace(self.group_char, "")
        literal = literal.replace(self.decimal_char, ".")
        factor = 1
        if "%" in literal:
            factor, literal = 100, literal.replace("%", "")
        elif "‰" in literal:
            factor, literal = 1000, literal.replace("‰", "")
        literal = literal.strip()
        # exponent marker is emitted lowercase (suite test158)
        literal = re.sub(r"(?<=\d)E(?=[+-]?\d)", "e", literal)
        if factor == 1:
            return literal
        try:
            return format_decimal_csharp(Decimal(literal) / Decimal(factor))
        except (ValueError, InvalidOperation) as ex:
            raise FormatError(f"Cannot parse '{literal}' as a number: {ex}")


class RegexFormat(FormatSpecification):
    """W3C: for datatypes without a dedicated format microsyntax, `format`
    is a regular expression the full value must match; normalization is
    identity. (The reference raises NotImplementedException instead,
    Parsing/JsonMetadataParser.cs:647.)"""

    def __init__(self, fmt):
        if not isinstance(fmt, str):
            raise FormatError("format must be a string regular expression")
        try:
            self._regex = re.compile(fmt)
        except re.error as ex:
            raise FormatError(f"invalid regular expression format: {ex}")

    def is_valid(self, literal: str) -> bool:
        return self._regex.fullmatch(literal) is not None

    def normalize(self, literal: str) -> str:
        return literal


_NUMERIC_BASES = {"number", "decimal", "double", "float", "integer", "long",
                  "int", "short", "byte", "nonNegativeInteger",
                  "positiveInteger", "unsignedLong", "unsignedInt",
                  "unsignedShort", "unsignedByte", "nonPositiveInteger",
                  "negativeInteger"}


def make_format(base: str, fmt) -> FormatSpecification:
    """Format dispatch per base datatype. The reference supports only
    boolean/date/time/datetime/number-family (Parsing/JsonMetadataParser.cs:
    612-649); per W3C, integer-family formats are number patterns and every
    other base takes a regular expression. Malformed formats raise
    FormatError, which the metadata parser downgrades to a warning (format
    ignored - W3C behavior)."""
    if base == "boolean":
        if not isinstance(fmt, str):
            raise FormatError("boolean format must be a 'true|false' string")
        return BooleanFormat(fmt)
    if base in ("date", "time", "datetime", "dateTime", "dateTimeStamp"):
        if not isinstance(fmt, str):
            raise FormatError("date/time format must be a pattern string")
        try:
            if base == "date":
                return DateFormat(fmt)
            if base == "time":
                return TimeFormat(fmt)
            return DateTimeFormat(fmt)
        except re.error as ex:
            raise FormatError(f"bad date/time pattern: {ex}")
    if base in ("duration", "dayTimeDuration", "yearMonthDuration"):
        return RegexFormat(fmt)
    if base in ("gDay", "gMonth", "gMonthDay", "gYear", "gYearMonth"):
        # date-field patterns for Gregorian parts / duration regexes: treat
        # as opaque - values validate against the base lexical space only
        class _AcceptAll(FormatSpecification):
            def is_valid(self, literal):
                return True

            def normalize(self, literal):
                return literal
        return _AcceptAll()
    if base in _NUMERIC_BASES:
        if isinstance(fmt, dict):
            return NumericFormat(
                decimal_char=(fmt.get("decimalChar") or ".")[:1] or ".",
                group_char=((fmt.get("groupChar") or ",")[:1] or ","),
                pattern=fmt.get("pattern"),
            )
        if not isinstance(fmt, str):
            raise FormatError("numeric format must be a string or object")
        return NumericFormat(pattern=fmt)
    return RegexFormat(fmt)
