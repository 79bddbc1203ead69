"""SHACL-core validation over the triple table (operators/shacl.py)."""

import pytest

from csvweb_spark.operators.shacl import (RDF_TYPE, conforms,
                                          validate_shapes)

XSD = "http://www.w3.org/2001/XMLSchema#"


def _kg(spark):
    """A small graph with one violation per constraint family.

    ex:C1 conformant; ex:C2 two names (maxCount); ex:C3 no name
    (minCount) + nation typed wrong class; ex:C4 name is an IRI
    (datatype/nodeKind) + balance out of range + phone pattern miss
    + status outside sh:in + missing has_value marker."""
    rows = [
        # subj, pred, obj, obj_kind, obj_datatype
        ("ex:C1", RDF_TYPE, "ex:Customer", "iri", None),
        ("ex:C1", "ex:name", "alice", "literal", XSD + "string"),
        ("ex:C1", "ex:nation", "ex:N1", "iri", None),
        ("ex:C1", "ex:bal", "10.5", "literal", XSD + "decimal"),
        ("ex:C1", "ex:phone", "25-989-741", "literal", XSD + "string"),
        ("ex:C1", "ex:status", "active", "literal", XSD + "string"),
        ("ex:C1", "ex:tag", "ex:Verified", "iri", None),

        ("ex:C2", RDF_TYPE, "ex:Customer", "iri", None),
        ("ex:C2", "ex:name", "bob", "literal", XSD + "string"),
        ("ex:C2", "ex:name", "robert", "literal", XSD + "string"),
        ("ex:C2", "ex:nation", "ex:N1", "iri", None),
        ("ex:C2", "ex:bal", "0", "literal", XSD + "decimal"),
        ("ex:C2", "ex:phone", "11-1", "literal", XSD + "string"),
        ("ex:C2", "ex:status", "dormant", "literal", XSD + "string"),
        ("ex:C2", "ex:tag", "ex:Verified", "iri", None),

        ("ex:C3", RDF_TYPE, "ex:Customer", "iri", None),
        ("ex:C3", "ex:nation", "ex:N9", "iri", None),
        ("ex:C3", "ex:bal", "1", "literal", XSD + "decimal"),
        ("ex:C3", "ex:phone", "33-3", "literal", XSD + "string"),
        ("ex:C3", "ex:status", "active", "literal", XSD + "string"),
        ("ex:C3", "ex:tag", "ex:Verified", "iri", None),

        ("ex:C4", RDF_TYPE, "ex:Customer", "iri", None),
        ("ex:C4", "ex:name", "ex:NotALiteral", "iri", None),
        ("ex:C4", "ex:nation", "ex:N1", "iri", None),
        ("ex:C4", "ex:bal", "-3", "literal", XSD + "decimal"),
        ("ex:C4", "ex:phone", "x-bad", "literal", XSD + "string"),
        ("ex:C4", "ex:status", "zombie", "literal", XSD + "string"),

        ("ex:N1", RDF_TYPE, "ex:Nation", "iri", None),
        ("ex:N9", RDF_TYPE, "ex:Region", "iri", None),
        # a non-customer node: never a focus
        ("ex:X", "ex:name", "ignored", "literal", XSD + "string"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string")


SHAPE = {
    "shape": "ex:CustomerShape",
    "target_class": "ex:Customer",
    "properties": [
        {"path": "ex:name", "min_count": 1, "max_count": 1,
         "datatype": XSD + "string", "node_kind": "literal"},
        {"path": "ex:nation", "class": "ex:Nation"},
        {"path": "ex:bal", "min_inclusive": 0, "max_inclusive": 100},
        {"path": "ex:phone", "pattern": r"^[0-9]{2}-"},
        {"path": "ex:status", "in": ["active", "dormant"]},
        {"path": "ex:tag", "has_value": "ex:Verified"},
    ],
}


def test_validate_shapes_all_families(spark):
    got = {(r.shape, r.focus, r.path, r.constraint, r.value)
           for r in validate_shapes(_kg(spark), [SHAPE]).collect()}
    s = "ex:CustomerShape"
    assert got == {
        (s, "ex:C2", "ex:name", "maxCount", "2"),
        (s, "ex:C3", "ex:name", "minCount", "0"),
        (s, "ex:C4", "ex:name", "datatype", "ex:NotALiteral"),
        (s, "ex:C4", "ex:name", "nodeKind", "ex:NotALiteral"),
        (s, "ex:C3", "ex:nation", "class", "ex:N9"),
        (s, "ex:C4", "ex:bal", "minInclusive", "-3"),
        (s, "ex:C4", "ex:phone", "pattern", "x-bad"),
        (s, "ex:C4", "ex:status", "in", "zombie"),
        (s, "ex:C4", "ex:tag", "hasValue", None),
    }


def test_conforms_and_clean_subset(spark):
    kg = _kg(spark)
    assert not conforms(kg, [SHAPE])
    clean = kg.where(~kg.subj.isin("ex:C2", "ex:C3", "ex:C4"))
    assert conforms(clean, [SHAPE])
    assert validate_shapes(clean, [SHAPE]).count() == 0


def test_target_node_and_subjects_of(spark):
    kg = _kg(spark)
    # explicit node target: C3 only -> its two violations
    shape = dict(SHAPE, target_class=None, target_node=["ex:C3"])
    got = {(r.focus, r.path, r.constraint)
           for r in validate_shapes(kg, [shape]).collect()}
    assert got == {("ex:C3", "ex:name", "minCount"),
                   ("ex:C3", "ex:nation", "class")}
    # subjects-of target: every node with ex:name INCLUDING ex:X
    shape2 = {"shape": "s2", "target_subjects_of": "ex:name",
              "properties": [{"path": "ex:tag", "min_count": 1}]}
    got2 = {r.focus for r in validate_shapes(kg, [shape2]).collect()}
    assert got2 == {"ex:C4", "ex:X"}  # C1/C2 have the tag


def test_pattern_is_find_not_fullmatch(spark):
    from pyspark.sql import functions as F  # noqa: F401
    kg = _kg(spark)
    shape = {"shape": "s", "target_class": "ex:Customer",
             "properties": [{"path": "ex:phone", "pattern": "9"}]}
    # '9' must FIND anywhere (sh:pattern semantics): only phones
    # without any 9 violate
    got = {r.value for r in validate_shapes(kg, [shape]).collect()}
    assert got == {"11-1", "33-3", "x-bad"}


def test_shape_validation_errors(spark):
    kg = _kg(spark)
    with pytest.raises(ValueError, match="exactly one target"):
        validate_shapes(kg, [{"shape": "s", "properties": []}])
    with pytest.raises(ValueError, match="exactly one target"):
        validate_shapes(kg, [{"shape": "s", "target_class": "ex:C",
                              "target_node": ["ex:C1"], "properties": []}])
    with pytest.raises(ValueError, match="unknown constraint"):
        validate_shapes(kg, [{"shape": "s", "target_class": "ex:Customer",
                              "properties": [{"path": "p", "min_cnt": 1}]}])


def test_validation_plan_shape(spark):
    """No Python eval nodes; cardinality is a partial-aggregated count."""
    plan = validate_shapes(_kg(spark), [SHAPE])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


# -------------------------------------------------- incremental

def test_incremental_equals_full_on_affected(spark):
    from pyspark.sql import functions as F
    from csvweb_spark.operators.shacl import (affected_focus,
                                              validate_shapes_incremental)
    store = _kg(spark)
    # delta: a new customer with a minCount violation, plus a typing
    # that FIXES C3's sh:class violation (ex:N9 becomes a Nation)
    delta = spark.createDataFrame(
        [("ex:C5", RDF_TYPE, "ex:Customer", "iri", None),
         ("ex:C5", "ex:nation", "ex:N1", "iri", None),
         ("ex:N9", RDF_TYPE, "ex:Nation", "iri", None)],
        store.schema)
    aff = {r.focus for r in
           affected_focus(store, delta, [SHAPE]).collect()}
    # delta subjects + remote holders of ex:nation -> ex:N9 (C3)
    assert aff == {"ex:C5", "ex:N9", "ex:C3"}
    incr = validate_shapes_incremental(store, delta, [SHAPE])
    got = {(r.focus, r.path, r.constraint) for r in incr.collect()}
    # C5: no name/bal/phone/status/tag at all -> minCount + hasValue
    assert ("ex:C5", "ex:name", "minCount") in got
    assert ("ex:C5", "ex:tag", "hasValue") in got
    # C3's class violation is GONE (N9 now typed) but its name
    # minCount remains
    assert ("ex:C3", "ex:nation", "class") not in got
    assert ("ex:C3", "ex:name", "minCount") in got
    # equality with the full report restricted to affected nodes
    from csvweb_spark.operators.shacl import validate_shapes
    full = validate_shapes(store.unionByName(delta), [SHAPE]) \
        .where(F.col("focus").isin(*aff))
    assert sorted(map(tuple, incr.collect())) == \
        sorted(map(tuple, full.collect()))
    # and NO rows for unaffected nodes (C2/C4 violations untouched)
    assert not any(f in ("ex:C2", "ex:C4") for f, *_ in
                   {tuple(r) for r in incr.collect()})


# ------------------------------------------------------ logical constraints


def _lt(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string")


_RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_shacl_logical_or_not_and(spark):
    from csvweb_spark.operators.shacl import validate_shapes
    X = "http://www.w3.org/2001/XMLSchema#"
    t = _lt(spark, [
        ("ex:a", _RT, "ex:T", "iri", None, None),
        ("ex:b", _RT, "ex:T", "iri", None, None),
        # ex:a conforms to the or (iri branch); ex:b fails both
        ("ex:a", "ex:c", "mailto:x", "iri", None, None),
        ("ex:b", "ex:c", "bad", "literal", X + "string", None),
        # not(in): ex:b carries a forbidden status
        ("ex:a", "ex:s", "active", "literal", X + "string", None),
        ("ex:b", "ex:s", "spam", "literal", X + "string", None),
        # and(range): ex:a in range, ex:b out
        ("ex:a", "ex:n", "50", "literal", X + "decimal", None),
        ("ex:b", "ex:n", "150", "literal", X + "decimal", None),
    ])
    shapes = [{"shape": "s", "target_class": "ex:T",
               "properties": [
                   {"path": "ex:c", "or": [{"pattern": "^[0-9]{2}-"},
                                           {"node_kind": "iri"}]},
                   {"path": "ex:s", "not": {"in": ["deleted", "spam"]}},
                   {"path": "ex:n", "and": [{"min_inclusive": 0},
                                            {"max_inclusive": 100}]},
               ]}]
    rep = validate_shapes(t, shapes)
    got = {(r.focus, r.constraint, r.value) for r in rep.collect()}
    assert got == {("ex:b", "or", "bad"), ("ex:b", "not", "spam"),
                   ("ex:b", "and", "150")}


def test_shacl_unique_lang_and_branch_validation(spark):
    import pytest
    from csvweb_spark.operators.shacl import validate_shapes
    t = _lt(spark, [
        ("ex:a", _RT, "ex:T", "iri", None, None),
        ("ex:a", "ex:l", "hello", "literal", None, "en"),
        ("ex:a", "ex:l", "hi", "literal", None, "en"),      # dup en
        ("ex:a", "ex:l", "salut", "literal", None, "fr"),
        ("ex:b", _RT, "ex:T", "iri", None, None),
        ("ex:b", "ex:l", "x", "literal", None, "en"),
    ])
    shapes = [{"shape": "s", "target_class": "ex:T",
               "properties": [{"path": "ex:l", "unique_lang": True}]}]
    rep = validate_shapes(t, shapes)
    got = {(r.focus, r.constraint, r.value) for r in rep.collect()}
    assert got == {("ex:a", "uniqueLang", "en")}
    # join-requiring keys are rejected inside logical branches
    bad = [{"shape": "s", "target_class": "ex:T",
            "properties": [{"path": "ex:l",
                            "not": {"has_value": "x"}}]}]
    with pytest.raises(ValueError, match="join-free"):
        validate_shapes(t, bad).collect()
