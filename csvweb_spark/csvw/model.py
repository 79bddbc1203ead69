"""CSVW annotated-table object model, flattened for distributed execution.

Re-expresses the reference's metadata object model
(/root/reference/src/DataDock.CsvWeb/Metadata/*.cs) as plain Python
dataclasses.  The key design difference from the reference: the reference
resolves inherited properties (aboutUrl/propertyUrl/valueUrl/datatype/
default/lang/null/separator, Metadata/InheritedPropertyContainer.cs:26-101)
lazily per getter call at row time; we resolve the whole chain
Column -> Schema -> Table -> TableGroup ONCE at plan time on the driver so
the per-column effective config can be broadcast to executors and compiled
into Spark column expressions.

Everything here is tiny driver-side metadata - never a per-row structure.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from .context import CSVW_NS, RDF_NS, XSD_NS
from .formats import FormatSpecification

# The 48 datatype-annotation -> IRI registrations of
# Metadata/DatatypeAnnotation.cs:48-109 (public CSVW vocabulary data).
DATATYPE_ANNOTATIONS: dict[str, str] = {
    "number": XSD_NS + "double",
    "binary": XSD_NS + "base64Binary",
    "datetime": XSD_NS + "dateTime",
    "any": XSD_NS + "anyAtomicType",
    "anyAtomicType": XSD_NS + "anyAtomicType",
    "anyURI": XSD_NS + "anyURI",
    "base64Binary": XSD_NS + "base64Binary",
    "boolean": XSD_NS + "boolean",
    "date": XSD_NS + "date",
    "dateTime": XSD_NS + "dateTime",
    "dateTimeStamp": XSD_NS + "dateTimeStamp",
    "decimal": XSD_NS + "decimal",
    "integer": XSD_NS + "integer",
    "long": XSD_NS + "long",
    "int": XSD_NS + "int",
    "short": XSD_NS + "short",
    "byte": XSD_NS + "byte",
    "nonNegativeInteger": XSD_NS + "nonNegativeInteger",
    "positiveInteger": XSD_NS + "positiveInteger",
    "unsignedLong": XSD_NS + "unsignedLong",
    "unsignedInt": XSD_NS + "unsignedInt",
    "unsignedShort": XSD_NS + "unsignedShort",
    "unsignedByte": XSD_NS + "unsignedByte",
    "nonPositiveInteger": XSD_NS + "nonPositiveInteger",
    "negativeInteger": XSD_NS + "negativeInteger",
    "double": XSD_NS + "double",
    "duration": XSD_NS + "duration",
    "dayTimeDuration": XSD_NS + "dayTimeDuration",
    "yearMonthDuration": XSD_NS + "yearMonthDuration",
    "float": XSD_NS + "float",
    "gDay": XSD_NS + "gDay",
    "gMonth": XSD_NS + "gMonth",
    "gMonthDay": XSD_NS + "gMonthDay",
    "gYear": XSD_NS + "gYear",
    "gYearMonth": XSD_NS + "gYearMonth",
    "hexBinary": XSD_NS + "hexBinary",
    "QName": XSD_NS + "QName",
    "string": XSD_NS + "string",
    "langString": RDF_NS + "langString",
    "normalizedString": XSD_NS + "normalizedString",
    "token": XSD_NS + "token",
    "language": XSD_NS + "language",
    "Name": XSD_NS + "Name",
    "NMTOKEN": XSD_NS + "NMTOKEN",
    "xml": RDF_NS + "XMLLiteral",
    "html": RDF_NS + "HTML",
    "json": CSVW_NS + "JSON",
    "time": XSD_NS + "time",
}

XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DATE = XSD_NS + "date"
XSD_DATETIME = XSD_NS + "dateTime"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_DOUBLE = XSD_NS + "double"

# CellParser whitespace classes (Rdf/CellParser.cs:36-51).
RETAINS_LINE_ENDINGS = {"string", "json", "html", "any", "anyAtomicType"}
RETAINS_LEADING_TRAILING_WS = {
    "string", "json", "html", "any", "anyAtomicType", "normalizedString",
}
RETAINS_LEADING_TRAILING_WS_IN_LIST = {"string", "any", "anyAtomicType"}


def register_annotation(name: str, iri: str, *,
                        retains_line_endings: Optional[bool] = None,
                        retains_leading_trailing_ws: Optional[bool] = None,
                        retains_ws_in_list: Optional[bool] = None) -> None:
    """Public datatype-extension point - the named counterpart of the
    reference's DatatypeAnnotation.RegisterAnnotation
    (Metadata/DatatypeAnnotation.cs:111-118), which lets users map a new
    datatype annotation to its IRI before parsing metadata that uses it.

    Registration mutates the module-level registry IN PLACE, so every
    consumer sees it immediately: metadata parsing accepts the annotation
    (parse_meta), Datatype.iri resolves it, and BOTH conversion paths -
    the pure-Python kernel (cells.py) and the compiled Spark expressions
    (operators/triples.py) - type literals with the registered IRI. The
    whitespace flags slot the annotation into the reference's CellParser
    whitespace classes (Rdf/CellParser.cs:36-51); each flag defaults to
    None = LEAVE MEMBERSHIP UNCHANGED (review fix: an unconditional
    discard meant re-registering a built-in like 'string' just to remap
    its IRI silently stripped its whitespace semantics process-wide - the
    reference's RegisterAnnotation only sets the dictionary entry). For a
    brand-new name, unchanged membership means full trimming +
    line-ending collapse, matching every non-string built-in.
    Re-registering a name overwrites its IRI, like the reference's
    dictionary setter. Unregistered annotations keep raising
    MetadataParseError/ConversionError - parity with the reference's
    KeyNotFound behavior."""
    DATATYPE_ANNOTATIONS[name] = iri
    for flag, group in ((retains_line_endings, RETAINS_LINE_ENDINGS),
                        (retains_leading_trailing_ws,
                         RETAINS_LEADING_TRAILING_WS),
                        (retains_ws_in_list,
                         RETAINS_LEADING_TRAILING_WS_IN_LIST)):
        if flag is None:
            continue
        if flag:
            group.add(name)
        else:
            group.discard(name)


class MetadataParseError(Exception):
    """Mirror of DataDock.CsvWeb.Parsing.MetadataParseException."""


class ConversionError(Exception):
    """Mirror of Rdf/Converter.cs ConversionError (Converter.cs:810-813)."""


@dataclass
class Datatype:
    """Per Metadata/DatatypeDescription.cs: Id overrides the registry IRI
    (Rdf/Converter.cs:561-575); Base picks the annotation; Format drives
    lexical normalization; constraints are parsed but never enforced
    (Rdf/Converter.cs:527-531)."""

    base: str = "string"
    id: Optional[str] = None  # absolute IRI overriding the registry lookup
    format: Optional[FormatSpecification] = None
    constraints: list = field(default_factory=list)  # parsed, never enforced

    @property
    def iri(self) -> str:
        if self.id is not None:
            return self.id
        try:
            return DATATYPE_ANNOTATIONS[self.base]
        except KeyError:
            raise ConversionError(
                f"Could not determine the correct IRI for the datatype annotation {self.base}"
            )


@dataclass
class Dialect:
    """CSV dialect with the CSVW defaults (Metadata/Dialect.cs:8-23).

    Only the subset the reference's converter consumes (commentPrefix,
    delimiter, encoding, header/headerRowCount, skipBlankRows, skipColumns -
    Rdf/Converter.cs:296-306,375,491-511) affects conversion; the rest is
    carried for metadata fidelity but deliberately unapplied, matching the
    reference."""

    comment_prefix: str = "#"
    # the reference defaults commentPrefix to '#' (Dialect.cs:10) while the
    # W3C default dialect has NO comment handling; converters in 'w3c'
    # escaping mode only honor an explicitly-declared prefix
    comment_prefix_explicit: bool = False
    delimiter: str = ","
    double_quote: bool = True
    encoding: str = "utf-8"
    header: bool = True
    header_row_count: Optional[int] = None
    line_terminators: tuple = ("\r\n", "\n")
    quote_char: Optional[str] = '"'
    skip_blank_rows: bool = False
    skip_columns: int = 0
    skip_initial_space: bool = False
    skip_rows: int = 0
    trim: Optional[str] = None  # 'true'|'false'|'start'|'end' - parsed, unapplied

    def effective_header_row_count(self) -> int:
        if self.header_row_count is not None:
            return self.header_row_count
        return 1 if self.header else 0


@dataclass
class Column:
    """Flat effective column config - all inherited properties already
    resolved along Column -> Schema -> Table -> TableGroup."""

    name: Optional[str] = None
    titles: list = field(default_factory=list)  # [(lang, value)]
    suppress_output: bool = False
    virtual: bool = False
    # -- inherited properties (resolved) --
    about_url: Optional[str] = None     # URI template string
    property_url: Optional[str] = None  # URI template string
    value_url: Optional[str] = None     # URI template string
    datatype: Optional[Datatype] = None
    default: Optional[str] = None
    lang: Optional[str] = None
    null_values: tuple = ("",)  # default {""} per InheritedPropertyContainer.cs:34
    separator: Optional[str] = None
    ordered: bool = False   # list cells emit rdf:List when true (W3C; the
                            # reference leaves this TODO, Converter.cs:430-432)
    required: bool = False  # 'required' is never parsed by the reference -> False

    @property
    def base(self) -> str:
        return self.datatype.base if self.datatype is not None else "string"

    @property
    def datatype_iri(self) -> str:
        return self.datatype.iri if self.datatype is not None else XSD_STRING


@dataclass
class Table:
    url: str = ""
    id: Optional[str] = None
    columns: Optional[list[Column]] = None  # None => infer from header
    dialect: Dialect = field(default_factory=Dialect)
    suppress_output: bool = False
    common_properties: dict = field(default_factory=dict)
    notes: Optional[list] = None
    row_titles: list = field(default_factory=list)  # schema rowTitles names
    # True when the metadata document carried a tableSchema: under W3C
    # semantics header-derived columns then get positional _col.N names
    # (suite tests 100/107/130); a bare/undescribed csv derives names from
    # the header (reference behavior, always used in 'reference' mode)
    had_schema: bool = False
    # inherited-property values captured at table/schema level, used when
    # columns are inferred from the CSV header at conversion time
    # (Rdf/Converter.cs:512-525 creates bare ColumnDescriptions whose
    # getters then fall back up the chain)
    inherited: dict = field(default_factory=dict)

    def make_inferred_column(self, name: Optional[str], col_number: int) -> Column:
        """A column created from a CSV header cell (Converter.cs:512-525) or
        a default column for headerless overflow cells (Converter.cs:473-483)."""
        if name is None:
            # CreateDefaultColumn: name _col.N, string datatype, default ""
            return Column(
                name=f"_col.{col_number}",
                datatype=Datatype(base="string"),
                default="",
                lang=None,
                about_url=self.inherited.get("about_url"),
                property_url=self.inherited.get("property_url"),
                value_url=self.inherited.get("value_url"),
                null_values=self.inherited.get("null_values", ("",)),
                separator=self.inherited.get("separator"),
            )
        return Column(
            name=name,
            about_url=self.inherited.get("about_url"),
            property_url=self.inherited.get("property_url"),
            value_url=self.inherited.get("value_url"),
            datatype=self.inherited.get("datatype"),
            default=self.inherited.get("default"),
            lang=self.inherited.get("lang"),
            null_values=self.inherited.get("null_values", ("",)),
            separator=self.inherited.get("separator"),
        )


@dataclass
class TableGroup:
    id: Optional[str] = None
    tables: list[Table] = field(default_factory=list)
    dialect: Optional[Dialect] = None
    common_properties: dict = field(default_factory=dict)
    notes: Optional[list] = None
