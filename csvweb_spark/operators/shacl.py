"""SHACL-core shape validation over the materialized triple table.

The reference emits a raw CSVW conversion graph and performs no shape
checking (constraint annotations are explicitly non-enforced,
/root/reference/src/DataDock.CsvWeb/Metadata/ColumnDescription.cs - the
csv2rdf spec says converters MUST ignore them); a KG-construction
pipeline at web scale needs the complementary gate: validate the
CONSTRUCTED graph against W3C SHACL node shapes before publishing, so
bad extractions surface as a violation report instead of corrupt
downstream joins.

Implemented core-constraint subset (the set whose semantics are pure
relational algebra - W3C SHACL REC 2017, section 4):

* targets      - sh:targetClass, sh:targetNode, sh:targetSubjectsOf
* cardinality  - sh:minCount / sh:maxCount      (4.2.1 / 4.2.2)
* value type   - sh:datatype, sh:nodeKind, sh:class  (4.1.x)
* value range  - sh:minInclusive / sh:maxInclusive   (4.3.x, numeric)
* string       - sh:pattern (4.4.4), sh:in (4.5.2), sh:hasValue (4.5.1)

Report rows follow sh:ValidationResult's core properties: one row per
violation with (shape, focus, path, constraint, value) - `value` is
sh:value for value-level violations and the offending cardinality
(as a decimal string) for count violations, NULL for hasValue (whose
failure is the ABSENCE of a value).

Scale shape: validation of a 10^12-triple KG must be a constant number
of scans, never per-shape driver loops over collected data. Each
property constraint compiles to
  values   = triples.filter(pred == path) JOIN focus (subj equi-join)
  counts   = values.groupBy(focus).count()          -- map-side combined
  minCount = focus LEFT JOIN counts, filter n < k   -- catches n == 0
  value-*  = one narrow filter over `values` (zero shuffle)
  sh:class = values LEFT ANTI JOIN type-triples     -- set membership
The per-shape frames union into one report; Catalyst sees every branch
share the same triple scan. Shapes are schema-sized (10^1-10^3), so the
loop below is driver-side plan construction, not data iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_REPORT_COLS = ("shape", "focus", "path", "constraint", "value")

#: property-constraint keys understood by validate_shapes
_PROP_KEYS = {"path", "min_count", "max_count", "datatype", "node_kind",
              "class", "pattern", "in", "has_value",
              "min_inclusive", "max_inclusive",
              "not", "or", "and", "unique_lang"}

#: join-free value-level keys allowed INSIDE sh:not / sh:or / sh:and
#: branches (each compiles to a boolean Column over one value row -
#: sh:class/sh:hasValue/cardinality need joins and are rejected there)
_LOGICAL_KEYS = {"datatype", "node_kind", "pattern", "in",
                 "min_inclusive", "max_inclusive"}


def _value_conforms(branch: dict) -> "F.Column":
    """Compile a join-free value-constraint dict to a boolean Column
    over a value row (obj, obj_kind, obj_datatype): True = the value
    node CONFORMS to every constraint in the dict. The building
    block of the sh:not / sh:or / sh:and compilers - logical
    composition stays one narrow filter, zero extra scans."""
    unknown = set(branch) - _LOGICAL_KEYS
    if unknown:
        raise ValueError(
            f"logical branch: unsupported keys {sorted(unknown)} "
            f"(join-free value constraints only: "
            f"{sorted(_LOGICAL_KEYS)})")
    conds = []
    if branch.get("datatype") is not None:
        conds.append((F.col("obj_kind") == "literal")
                     & F.col("obj_datatype").isNotNull()
                     & (F.col("obj_datatype") == branch["datatype"]))
    if branch.get("node_kind") is not None:
        conds.append(F.col("obj_kind") == branch["node_kind"])
    if branch.get("pattern") is not None:
        rx = ".*(?:" + branch["pattern"] + ").*"
        conds.append(F.col("obj").rlike(rx))
    if branch.get("in") is not None:
        conds.append(F.col("obj").isin(list(branch["in"])))
    if branch.get("min_inclusive") is not None:
        v = F.col("obj").try_cast("double")
        conds.append(v.isNotNull()
                     & (v >= float(branch["min_inclusive"])))
    if branch.get("max_inclusive") is not None:
        v = F.col("obj").try_cast("double")
        conds.append(v.isNotNull()
                     & (v <= float(branch["max_inclusive"])))
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def _focus_nodes(triples: DataFrame, shape: dict) -> DataFrame:
    """The shape's target set as a 1-column (focus) frame, distinct.

    Exactly one of target_class / target_node / target_subjects_of must
    be present (SHACL allows unions of targets; restrict to one per
    shape dict - declare two dicts sharing a name for a union)."""
    keys = [k for k in ("target_class", "target_node", "target_subjects_of")
            if shape.get(k) is not None]
    if len(keys) != 1:
        raise ValueError(
            f"shape {shape.get('shape')!r} needs exactly one target "
            f"(target_class / target_node / target_subjects_of), got {keys}")
    if keys[0] == "target_class":
        return (triples
                .where((F.col("pred") == RDF_TYPE)
                       & (F.col("obj") == shape["target_class"]))
                .select(F.col("subj").alias("focus")).distinct())
    if keys[0] == "target_subjects_of":
        return (triples.where(F.col("pred") == shape["target_subjects_of"])
                .select(F.col("subj").alias("focus")).distinct())
    nodes = list(shape["target_node"])
    return triples.sparkSession.createDataFrame(
        [(n,) for n in nodes], "focus string").distinct()


def _report(shape_name: str, df: DataFrame, path, constraint: str,
            value) -> DataFrame:
    return df.select(
        F.lit(shape_name).alias("shape"), F.col("focus"),
        F.lit(path).alias("path"), F.lit(constraint).alias("constraint"),
        value.cast("string").alias("value"))


def validate_shapes(triples: DataFrame, shapes: list[dict],
                    type_pred: str = RDF_TYPE,
                    focus_filter: DataFrame | None = None) -> DataFrame:
    """Validate `triples` against `shapes`; return the violation report
    (shape, focus, path, constraint, value) - EMPTY means conformant
    (sh:conforms true).

    Each shape dict: {"shape": name, one target key, "properties":
    [{"path": p, <constraint keys>}...]}. Constraint keys: min_count,
    max_count, datatype, node_kind ('iri'|'literal'|'bnode'), class,
    pattern (Java regex, sh:pattern unanchored-find semantics), in
    (list), has_value, min_inclusive / max_inclusive (numeric).
    datatype / node_kind require the triples frame to carry
    obj_datatype / obj_kind columns (the engine's serializer schema).

    `focus_filter` (1-column frame of node IRIs) restricts every
    shape's target set by a semi-join - the incremental-revalidation
    hook (see validate_shapes_incremental)."""
    spark = triples.sparkSession
    reports: list[DataFrame] = []
    type_triples = None  # built lazily, shared by every sh:class
    for shape in shapes:
        name = shape.get("shape", "_:shape")
        unknown = set().union(*(set(p) for p in shape.get("properties", [])
                                )) - _PROP_KEYS if shape.get("properties") \
            else set()
        if unknown:
            raise ValueError(f"shape {name!r}: unknown constraint keys "
                             f"{sorted(unknown)}")
        focus = _focus_nodes(triples, shape)
        if focus_filter is not None:
            flt = focus_filter.select(
                F.col(focus_filter.columns[0]).alias("focus")).distinct()
            focus = focus.join(flt, "focus", "left_semi")
        for prop in shape.get("properties", []):
            path = prop["path"]
            extra = [c for c in ("obj_kind", "obj_datatype", "obj_lang")
                     if c in triples.columns]
            # RDF graphs are SETS: a provenance-duplicated assertion
            # (same s/p/o from many pages) is ONE triple, so both the
            # cardinality counts and the value checks run over the
            # distinct value nodes - counting rows would make merged
            # entities violate maxCount spuriously
            vals = (triples.where(F.col("pred") == path)
                    .select(F.col("subj").alias("focus"), "obj", *extra)
                    .distinct()
                    .join(focus, "focus"))
            # ---- cardinality: LEFT join so absent values count as 0
            if prop.get("min_count") is not None \
                    or prop.get("max_count") is not None:
                counts = vals.groupBy("focus").agg(
                    F.count(F.lit(1)).alias("_n"))
                n = (focus.join(counts, "focus", "left")
                     .withColumn("_n", F.coalesce("_n", F.lit(0))))
                if prop.get("min_count") is not None:
                    reports.append(_report(
                        name, n.where(F.col("_n") < prop["min_count"]),
                        path, "minCount", F.col("_n")))
                if prop.get("max_count") is not None:
                    reports.append(_report(
                        name, n.where(F.col("_n") > prop["max_count"]),
                        path, "maxCount", F.col("_n")))
            # ---- value-level constraints: narrow filters over vals
            if prop.get("datatype") is not None:
                bad = vals.where(
                    (F.col("obj_kind") != "literal")
                    | F.col("obj_datatype").isNull()
                    | (F.col("obj_datatype") != prop["datatype"]))
                reports.append(_report(name, bad, path, "datatype",
                                       F.col("obj")))
            if prop.get("node_kind") is not None:
                reports.append(_report(
                    name, vals.where(F.col("obj_kind") != prop["node_kind"]),
                    path, "nodeKind", F.col("obj")))
            if prop.get("pattern") is not None:
                # sh:pattern is a FIND, not a full match - wrap unanchored
                rx = f".*(?:{prop['pattern']}).*"
                reports.append(_report(
                    name, vals.where(~F.col("obj").rlike(rx)),
                    path, "pattern", F.col("obj")))
            if prop.get("in") is not None:
                reports.append(_report(
                    name, vals.where(~F.col("obj").isin(list(prop["in"]))),
                    path, "in", F.col("obj")))
            if prop.get("min_inclusive") is not None:
                v = F.col("obj").try_cast("double")
                reports.append(_report(
                    name,
                    vals.where(v.isNull()
                               | (v < float(prop["min_inclusive"]))),
                    path, "minInclusive", F.col("obj")))
            if prop.get("max_inclusive") is not None:
                v = F.col("obj").try_cast("double")
                reports.append(_report(
                    name,
                    vals.where(v.isNull()
                               | (v > float(prop["max_inclusive"]))),
                    path, "maxInclusive", F.col("obj")))
            if prop.get("class") is not None:
                if type_triples is None:
                    type_triples = (triples
                                    .where(F.col("pred") == type_pred)
                                    .select(F.col("subj").alias("_node"),
                                            F.col("obj").alias("_cls")))
                member = type_triples.where(F.col("_cls") == prop["class"]) \
                    .select(F.col("_node").alias("obj"))
                bad = vals.join(member, "obj", "left_anti")
                reports.append(_report(name, bad, path, "class",
                                       F.col("obj")))
            if prop.get("has_value") is not None:
                holders = (vals.where(F.col("obj") == prop["has_value"])
                           .select("focus").distinct())
                missing = focus.join(holders, "focus", "left_anti")
                reports.append(_report(name, missing, path, "hasValue",
                                       F.lit(None)))
            # ---- logical constraint components (SHACL 4.6): still one
            # narrow filter each - _value_conforms composes the join-
            # free value predicates into a single boolean expression
            if prop.get("not") is not None:
                reports.append(_report(
                    name, vals.where(_value_conforms(prop["not"])),
                    path, "not", F.col("obj")))
            if prop.get("or") is not None:
                any_ok = F.lit(False)
                for branch in prop["or"]:
                    any_ok = any_ok | _value_conforms(branch)
                reports.append(_report(name, vals.where(~any_ok), path,
                                       "or", F.col("obj")))
            if prop.get("and") is not None:
                all_ok = F.lit(True)
                for branch in prop["and"]:
                    all_ok = all_ok & _value_conforms(branch)
                reports.append(_report(name, vals.where(~all_ok), path,
                                       "and", F.col("obj")))
            # ---- sh:uniqueLang (4.2.3): no two values of the path may
            # share a language tag; one map-side-combinable count over
            # (focus, lang), violation value = the duplicated tag
            if prop.get("unique_lang"):
                if "obj_lang" not in triples.columns:
                    raise ValueError(
                        "unique_lang requires an obj_lang column")
                dup = (vals.where(F.col("obj_lang").isNotNull()
                                  & (F.col("obj_lang") != ""))
                       .groupBy("focus", "obj_lang")
                       .agg(F.count(F.lit(1)).alias("_n"))
                       .where(F.col("_n") > 1))
                reports.append(_report(name, dup, path, "uniqueLang",
                                       F.col("obj_lang")))
    if not reports:
        return spark.createDataFrame(
            [], "shape string, focus string, path string, "
                "constraint string, value string")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(*_REPORT_COLS)


def affected_focus(store: DataFrame, delta: DataFrame,
                   shapes: list[dict],
                   type_pred: str = RDF_TYPE) -> DataFrame:
    """The focus nodes whose verdict can CHANGE when the additive
    `delta` merges into `store` (1 column, `focus`):

    * every delta subject (new values shift counts, new typing creates
      focus membership or class membership);
    * every subject - in store OR delta - holding a class-constrained
      property whose VALUE is newly typed by the delta (a remote typing
      can fix another node's sh:class violation).

    Additive deltas only - the same monotonicity contract as
    rdfs_closure_incremental (entail.py); retractions need a full
    revalidation of the retracted subjects' neighborhoods."""
    aff = delta.select(F.col("subj").alias("focus")).distinct()
    class_paths = sorted({p["path"] for shape in shapes
                          for p in shape.get("properties", [])
                          if p.get("class") is not None})
    if class_paths:
        typed = (delta.where(F.col("pred") == type_pred)
                 .select(F.col("subj").alias("obj")).distinct())
        updated = store.select("subj", "pred", "obj").unionByName(
            delta.select("subj", "pred", "obj"))
        remote = (updated.where(F.col("pred").isin(class_paths))
                  .join(typed, "obj", "left_semi")
                  .select(F.col("subj").alias("focus")))
        aff = aff.unionByName(remote).distinct()
    return aff


def validate_shapes_incremental(store: DataFrame, delta: DataFrame,
                                shapes: list[dict],
                                type_pred: str = RDF_TYPE) -> DataFrame:
    """Delta-proportional revalidation: the violation report of
    store+delta RESTRICTED to `affected_focus` - by construction equal
    to the full report's rows for those nodes, so the caller replaces
    exactly the affected nodes' rows in its materialized report and
    touches nothing else.

    Scale shape: the focus side shrinks to O(delta) via the semi-join
    pushed into every shape's target scan; against a subj-bucketed
    store (plans/bucketed.py) the value joins are zero-exchange, making
    daily KG deltas validate without rescanning 10^12 rows' worth of
    shuffle."""
    updated = store.unionByName(delta)
    return validate_shapes(
        updated, shapes, type_pred,
        focus_filter=affected_focus(store, delta, shapes, type_pred))


def conforms(triples: DataFrame, shapes: list[dict],
             type_pred: str = RDF_TYPE) -> bool:
    """sh:conforms - True when the report is empty. One limit(1) probe,
    so the first violation short-circuits every remaining scan."""
    return validate_shapes(triples, shapes, type_pred).limit(1).count() == 0
