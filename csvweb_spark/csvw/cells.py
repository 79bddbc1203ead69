"""Cell-value normalization - the CSVW 'parse cell' algorithm.

Pure-function re-implementation of Rdf/CellParser.cs:53-149 (the W3C
tabular-data-model cell parsing steps 1-7; steps 8-9 are TODO/stubbed in the
reference and therefore deliberately absent here too).

Order of operations (load-bearing, see CellParser.cs):
 1. line-ending/tab -> space unless base retains line endings (lines 69-73)
 2. trim + collapse \\s+ unless base retains leading/trailing ws (75-79)
 3. empty -> column default (81-84)
 4. if separator: whole-value null check FIRST, then split, per-token trim
    unless base in {string, anyAtomicType}, then per-token steps (88-113)
 5. per token/value: empty -> default, null-list -> None (122-136)

Used both by the per-page Python kernel (csvw/convert.py) and mirrored as
Spark column expressions in operators/triples.py - tests assert the two
agree on the reference's golden fixtures.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from .model import (
    Column,
    ConversionError,
    DATATYPE_ANNOTATIONS,
    RETAINS_LEADING_TRAILING_WS,
    RETAINS_LEADING_TRAILING_WS_IN_LIST,
    RETAINS_LINE_ENDINGS,
)

_WS_RUN = re.compile(r"\s+")


@dataclass
class CellValue:
    raw: Optional[str] = None
    normalized: Optional[str] = None
    is_list: bool = False
    value_list: Optional[list] = None
    value: Optional[str] = None
    errors: list = field(default_factory=list)


def _apply_value_steps(cell: CellValue, s: Optional[str], column: Column) -> None:
    """Steps 6-7 per value (CellParser.cs:122-149)."""
    if s == "":
        s = column.default
    if s is not None and s in column.null_values:
        s = None
        if column.separator is None and column.required:
            cell.errors.append("Got NULL value for a required cell")
    if cell.is_list:
        cell.value_list.append(s)
    else:
        cell.value = s


def normalize_cell(raw: Optional[str], column: Column) -> CellValue:
    """CellParser.NormalizeCellValue(rawValue, column, datatype)."""
    base = column.base
    if base not in DATATYPE_ANNOTATIONS:
        raise ConversionError(f"Unrecognized cell base datatype ID: {base}")
    cell = CellValue(raw=raw)
    if raw is None:
        return cell

    s = raw
    if base not in RETAINS_LINE_ENDINGS:
        s = s.replace("\r", " ").replace("\n", " ").replace("\t", " ")
    if base not in RETAINS_LEADING_TRAILING_WS:
        s = _WS_RUN.sub(" ", s.strip())
    if s == "":
        s = column.default
    cell.normalized = s

    if column.separator is not None:
        cell.is_list = True
        # 5.1 whole-value null check happens before the split
        if s is None or s in column.null_values:
            cell.value_list = None
        else:
            cell.value_list = []
            for tok in s.split(column.separator):
                if base not in RETAINS_LEADING_TRAILING_WS_IN_LIST:
                    tok = tok.strip()
                _apply_value_steps(cell, tok, column)
    else:
        _apply_value_steps(cell, s, column)
    return cell
