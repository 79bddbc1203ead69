"""Metadata normalization + parsing tests (mirrors JsonMetadataParserSpec)."""

import pytest

from csvweb_spark.csvw.model import MetadataParseError
from csvweb_spark.csvw.normalize_meta import (
    expand_curie,
    expand_url,
    is_common_property,
    is_valid_language_tag,
    load_metadata_json,
)
from csvweb_spark.csvw.parse_meta import parse_metadata

BASE = "http://example.org/metadata.json"


def test_minimal_metadata_infers_nothing():
    g = parse_metadata('{"url": "countries.csv"}', BASE)
    assert len(g.tables) == 1
    t = g.tables[0]
    assert t.url == "http://example.org/countries.csv"
    assert t.columns is None  # inferred at conversion time


def test_columns_names_datatypes_inheritance():
    g = parse_metadata(
        """{
          "url": "t.csv",
          "tableSchema": {
            "aboutUrl": "http://example.org/r/{id}",
            "columns": [
              {"name": "id"},
              {"name": "lat", "datatype": "decimal"},
              {"titles": "Label Col"},
              {"name": "overridden", "aboutUrl": "http://example.org/o/{id}"}
            ]
          }
        }""",
        BASE,
    )
    cols = g.tables[0].columns
    assert [c.name for c in cols] == ["id", "lat", "Label Col", "overridden"]
    assert cols[1].base == "decimal"
    assert cols[0].about_url == "http://example.org/r/{id}"
    assert cols[3].about_url == "http://example.org/o/{id}"


def test_titles_fallback_to_und_language():
    g = parse_metadata(
        '{"url":"t.csv","tableSchema":{"columns":[{"titles":{"de":"Spalte"}}]}}',
        BASE,
    )
    # no default language, no 'und' entry -> positional _col.N name
    assert g.tables[0].columns[0].name == "_col.1"


def test_underscore_column_name_ignored_with_warning():
    # W3C: names starting with '_' are reserved -> warning + positional name
    # (the reference instead raises, JsonMetadataParser.cs:314-318; we keep
    # the lenient W3C behavior for suite parity)
    g = parse_metadata(
        '{"url":"t.csv","tableSchema":{"columns":[{"name":"_bad"}]}}', BASE)
    assert g.tables[0].columns[0].name == "_col.1"


def test_virtual_default_and_null():
    g = parse_metadata(
        """{"url":"t.csv","tableSchema":{"columns":[
            {"name":"n","null":["NA","-"],"separator":";"},
            {"name":"v","virtual":true,"default":"foo"}
        ]}}""",
        BASE,
    )
    n, v = g.tables[0].columns
    assert v.virtual and v.default == "foo"
    assert n.null_values == ("NA", "-") and n.separator == ";"


def test_datatype_format_object():
    g = parse_metadata(
        """{"url":"t.csv","tableSchema":{"columns":[
            {"name":"d","datatype":{"base":"date","format":"M/d/yyyy"}},
            {"name":"x","datatype":{"base":"number",
                "format":{"decimalChar":",","groupChar":".","pattern":null}}}
        ]}}""",
        BASE,
    )
    d, x = g.tables[0].columns
    assert d.datatype.format.normalize("3/22/2015") == "2015-03-22"
    assert x.datatype.format.normalize("1.234,5") == "1234.5"


def test_dialect_parse_and_defaults():
    g = parse_metadata(
        '{"url":"t.csv","dialect":{"delimiter":";","header":false,'
        '"skipColumns":2,"commentPrefix":"%"}}',
        BASE,
    )
    d = g.tables[0].dialect
    assert d.delimiter == ";" and d.effective_header_row_count() == 0
    assert d.skip_columns == 2 and d.comment_prefix == "%"
    # defaults
    g2 = parse_metadata('{"url":"t.csv"}', BASE)
    assert g2.tables[0].dialect.effective_header_row_count() == 1


def test_table_group_with_tables_array():
    g = parse_metadata(
        '{"tables":[{"url":"a.csv"},{"url":"b.csv","suppressOutput":true}]}',
        BASE,
    )
    assert len(g.tables) == 2
    assert g.tables[1].suppress_output


def test_common_properties_normalized():
    g = parse_metadata(
        '{"url":"t.csv","dc:title":"Hello","@context":'
        '["http://www.w3.org/ns/csvw",{"@language":"en"}]}',
        BASE,
    )
    cp = g.tables[0].common_properties
    assert cp["dc:title"] == {"@value": "Hello", "@language": "en"}


def test_trailing_commas_and_bom_tolerated():
    obj = load_metadata_json('﻿{"url": "t.csv", "x": [1, 2,], }')
    assert obj["url"] == "t.csv"


def test_expand_curie_and_url():
    assert expand_curie("dc:title") == "http://purl.org/dc/terms/title"
    assert expand_curie("http://x/y") == "http://x/y"
    assert expand_curie("_:b0") == "_:b0"
    assert expand_url("dc:title") == "http://purl.org/dc/terms/title"
    with pytest.raises(MetadataParseError):
        expand_url("nonexistent")


def test_language_tags():
    assert is_valid_language_tag("en")
    assert is_valid_language_tag("en-GB")
    assert is_valid_language_tag("zh-Hant-TW")
    assert not is_valid_language_tag("not a tag")
    assert not is_valid_language_tag("123")


def test_common_property_detection():
    assert is_common_property("dc:title")
    assert not is_common_property("http://example.org/x")
    assert not is_common_property("url")


def test_register_annotation_flows_through_both_paths(spark):
    """register_annotation (the DatatypeAnnotation.RegisterAnnotation
    counterpart, Metadata/DatatypeAnnotation.cs:111-118): a user-registered
    datatype must resolve in metadata parsing, the Python kernel AND the
    compiled Spark path - and disappear again when unregistered."""
    import json

    from csvweb_spark.csvw.convert import MODE_MINIMAL, PageConverter
    from csvweb_spark.csvw.model import (
        DATATYPE_ANNOTATIONS, ConversionError, Datatype, register_annotation)
    from csvweb_spark.operators.triples import convert_table_group_spark

    name, iri = "temperature", "http://example.org/dt/temperature"
    assert name not in DATATYPE_ANNOTATIONS
    with pytest.raises(ConversionError):
        Datatype(base=name).iri

    meta = json.dumps({
        "@context": "http://www.w3.org/ns/csvw",
        "url": "http://t.example.org/t.csv",
        "tableSchema": {"columns": [
            {"name": "city"},
            {"name": "temp", "datatype": name},
        ]},
    })
    csv_text = "city,temp\nOslo,  -4.5  \n"
    try:
        register_annotation(name, iri)
        assert Datatype(base=name).iri == iri
        group = parse_metadata(meta, "http://t.example.org/meta.json")
        table = group.tables[0]
        assert table.columns[1].datatype.iri == iri

        kern = PageConverter(mode=MODE_MINIMAL).convert_table(table, csv_text)
        k_typed = [t for t in kern.triples if t.obj_datatype == iri]
        assert len(k_typed) == 1
        # non-string annotation: whitespace-trimmed like the reference's
        # default CellParser class (value not in any RETAINS set)
        assert k_typed[0].obj == "-4.5"

        pages = spark.createDataFrame([(table.url, csv_text)],
                                      "url string, text string")
        out = convert_table_group_spark(pages, table, mode=MODE_MINIMAL,
                                        scope_by_url=False)
        s_typed = [r for r in out.collect() if r.obj_datatype == iri]
        assert len(s_typed) == 1
        assert s_typed[0].obj == "-4.5"
    finally:
        del DATATYPE_ANNOTATIONS[name]
    with pytest.raises(ConversionError):
        Datatype(base=name).iri

    # re-registering a built-in to remap its IRI must NOT strip its
    # whitespace-class membership (review fix: flags default to
    # leave-unchanged, like the reference's dictionary-only setter)
    from csvweb_spark.csvw.model import (RETAINS_LEADING_TRAILING_WS,
                                         RETAINS_LINE_ENDINGS)
    orig_iri = DATATYPE_ANNOTATIONS["string"]
    try:
        register_annotation("string", "http://example.org/dt/mystr")
        assert "string" in RETAINS_LINE_ENDINGS
        assert "string" in RETAINS_LEADING_TRAILING_WS
        assert DATATYPE_ANNOTATIONS["string"] == "http://example.org/dt/mystr"
    finally:
        DATATYPE_ANNOTATIONS["string"] = orig_iri
