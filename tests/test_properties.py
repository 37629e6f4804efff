"""Property-based tests (hypothesis): invariants that unit fixtures
can't sweep — random unicode inputs through the Python golden twins
and the Catalyst expressions.

SURVEY §5.2: the reference's tests are example-based; the per-row
invariants here (token-count parity, packer budget/round-trip) are the
contracts the 10^12-doc job relies on for EVERY row, so they get
generative coverage.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgc.segment import segment_document_py
from kgc.tokenizer import count_tokens_py, split_tokens_py

# printable-ish unicode incl. whitespace variety, accents, punctuation
_CHARS = (
    "".join(chr(c) for c in range(0x20, 0x7F))
    + "".join(chr(c) for c in range(0xA0, 0x180))
    + "".join(chr(c) for c in range(0x2018, 0x2020))
    + "\t\n\r"
)
TEXT = st.text(alphabet=_CHARS, max_size=400)


class TestTokenizerProperties:
    @given(TEXT)
    @settings(max_examples=300, deadline=None)
    def test_count_is_fields_count(self, t):
        # count_tokens_py == len(strings.Fields): runs of non-whitespace
        assert count_tokens_py(t) == len(t.split())

    @given(TEXT)
    @settings(max_examples=300, deadline=None)
    def test_split_tokens_never_empty_or_separator(self, t):
        import unicodedata

        toks = split_tokens_py(t)
        for tok in toks:
            assert tok != ""
            for ch in tok:
                assert not ch.isspace()
                assert not unicodedata.category(ch).startswith("P")

    @given(TEXT)
    @settings(max_examples=300, deadline=None)
    def test_split_tokens_preserve_order_and_content(self, t):
        # concatenated tokens == input minus whitespace and punctuation
        import unicodedata

        kept = "".join(
            ch
            for ch in t
            if not ch.isspace() and not unicodedata.category(ch).startswith("P")
        )
        assert "".join(split_tokens_py(t)) == kept


WORDS = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8),
    min_size=0,
    max_size=60,
)


class TestPackerProperties:
    @given(st.lists(WORDS.map(" ".join), min_size=1, max_size=8), st.integers(2, 40))
    @settings(max_examples=200, deadline=None)
    def test_budget_respected_and_content_preserved(self, texts, max_tokens):
        spans = [
            {"kind": "paragraph", "text": t, "media_ref": None, "offset": i}
            for i, t in enumerate(texts)
        ]
        segs = segment_document_py(spans, max_tokens=max_tokens)
        # 1. every segment respects the budget (split chunks are ≤
        #    budget by construction too)
        for s in segs:
            assert s["n_tokens"] <= max_tokens, (s, max_tokens)
        # 2. no token lost or invented.  NOT order: the reference's
        #    no-flush-before-oversized branch (segmenter.go, replicated
        #    branch-exact) emits an oversized element's chunks BEFORE
        #    the open buffer, so order flips around oversized spans.
        got = sorted(w for s in segs for w in s["seg_text"].split())
        want = sorted(w for t in texts for w in t.split())
        assert got == want
        # 3. order IS preserved when nothing is oversized
        if all(len(t.split()) <= max_tokens for t in texts):
            got_o = [w for s in segs for w in s["seg_text"].split()]
            want_o = [w for t in texts for w in t.split()]
            assert got_o == want_o
        # 4. seg_ids are contiguous from 0
        assert [s["seg_id"] for s in segs] == list(range(len(segs)))

    @given(WORDS, st.integers(1, 10))
    @settings(max_examples=200, deadline=None)
    def test_single_oversized_span_splits_cleanly(self, words, max_tokens):
        text = " ".join(words)
        spans = [{"kind": "paragraph", "text": text, "media_ref": None, "offset": 0}]
        segs = segment_document_py(spans, max_tokens=max_tokens)
        got = [w for s in segs for w in s["seg_text"].split()]
        assert got == words
        for s in segs:
            assert s["n_tokens"] <= max_tokens


_JL_KEYS = st.sampled_from(
    ["name", "startDate", "datePublished", "keywords", "a", "b", "été"]
)
_JL_SCALARS = st.one_of(
    st.text(alphabet=_CHARS, max_size=24),
    st.integers(-10**6, 10**6),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.none(),
    st.sampled_from(["2024-02-29", "2023-02-29", "2024-13-01", ""]),
)
_JL_VALUES = st.recursive(
    _JL_SCALARS,
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(keys=_JL_KEYS, values=kids, max_size=3),
    ),
    max_leaves=12,
)
_JL_NODE = st.dictionaries(keys=_JL_KEYS, values=_JL_VALUES, max_size=5)


class TestJsonldFlattenParity:
    """The distributed from_jsonld kernel must equal the trusted
    driver-side fixture loader (kgc.golden.flatten_node) on EVERY
    @id-free JSON-LD node, not just the two committed fixtures —
    generative coverage over nested dicts/lists/scalars including
    date-typed predicates and empty-string drops."""

    @given(_JL_NODE)
    @settings(max_examples=300, deadline=None)
    def test_matches_golden_flatten(self, node):
        from kgc.golden import flatten_node
        from kgc.triples import flatten_jsonld_node

        got = flatten_jsonld_node("d1", 3, node)
        want = [(s, p, o, t) for _, _, s, p, o, t in flatten_node("d1", 3, node)]
        assert got == want


class TestSparqlParserTotality:
    """The front-end's contract is parse-or-ValueError — a silent
    mis-parse OR an unhandled IndexError against a 10^12-row table are
    both unacceptable.  Fuzz arbitrary token soup (heavy on the
    grammar's own punctuation) and assert totality."""

    @given(
        st.text(
            alphabet=_CHARS + '{}()?<>"*+|.,;!&=/^' + "SELECTWHEREUNIONVALUESGRAPHBINDFILTERINF",
            max_size=120,
        )
    )
    @settings(max_examples=500, deadline=None)
    def test_parse_sparql_never_crashes(self, s):
        from kgc.graph import parse_sparql

        try:
            parse_sparql(s)
        except ValueError:
            pass

    @given(st.text(alphabet=_CHARS + '{}()?<>"', max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_parse_with_valid_prefix_never_crashes(self, tail):
        from kgc.graph import parse_sparql

        try:
            parse_sparql("SELECT ?a WHERE { ?a p ?b . " + tail)
        except ValueError:
            pass


class TestSparqlDifferential:
    """Differential testing of the SPARQL ALGEBRA: random tiny KGs and
    random connected queries, evaluated by the engine (_solve_where on
    a hand-built q dict — the parser has its own totality fuzz) AND by
    a naive nested-loop reference evaluator with spec bag semantics.
    Covers the join planner's selectivity reorder, flat-OPTIONAL left
    joins, UNION distribution (fast and general paths), the
    compatibility join over possibly-unbound shared variables (the
    r4-advice fix), and FILTER error-propagation (unbound → drop)."""

    _SUBS = ["s0", "s1", "s2"]
    _PREDS = ["p0", "p1"]
    _OBJS = ["o0", "o1", "s0", "s1"]  # overlap with subjects → chains

    # ---- naive reference evaluator (bag semantics) ----

    @staticmethod
    def _match(pat, row, binding, unbound_matches=False):
        b = dict(binding)
        for term, val in zip(pat, row):
            if term.startswith("?"):
                name = term[1:]
                if name in b:
                    if b[name] is None:
                        if not unbound_matches:
                            return None
                        b[name] = val
                    elif b[name] != val:
                        return None
                else:
                    b[name] = val
            elif term != val:
                return None
        return b

    @classmethod
    def _solve_bgp(cls, rows, pats):
        sols = [dict()]
        for pat in pats:
            sols = [
                m for b in sols for row in rows
                if (m := cls._match(pat, row, b)) is not None
            ]
        return sols

    @classmethod
    def _naive_minus(cls, rows, sols, mpat):
        mvars = {t[1:] for t in mpat if t.startswith("?")}
        msols = cls._solve_bgp(rows, [mpat])
        out = []
        for b in sols:
            shared = [v for v in mvars if v in b]
            if not shared:
                out.append(b)  # disjoint domains: MINUS removes nothing
                continue
            hit = any(
                all(b[v] is None or b[v] == m[v] for v in shared)
                and any(b[v] is not None for v in shared)  # dom overlap
                for m in msols
            )
            if not hit:
                out.append(b)
        return out

    @classmethod
    def _naive_exists(cls, rows, sols, positive, epat):
        evars = {t[1:] for t in epat if t.startswith("?")}
        out = []
        for b in sols:
            shared = [v for v in evars if v in b]
            sub = {v: b[v] for v in shared if b[v] is not None}
            sat = any(
                cls._match(epat, row, sub) is not None for row in rows
            )
            if sat == positive:
                out.append(b)
        return out

    @classmethod
    def _naive(cls, rows, required, optionals, union_block, values_spec,
               minus_pat, exists_spec, binds, distinct, filters):
        sols = cls._solve_bgp(rows, required)
        for opt in optionals:
            ovars = [t[1:] for t in opt if t.startswith("?")]
            nxt = []
            for b in sols:
                ms = [
                    m for row in rows
                    if (m := cls._match(opt, row, b)) is not None
                ]
                if ms:
                    nxt.extend(ms)
                else:
                    b2 = dict(b)
                    for v in ovars:
                        b2.setdefault(v, None)
                    nxt.append(b2)
            sols = nxt
        if union_block:
            block_vars = sorted({
                t[1:] for bp in union_block for t in bp if t.startswith("?")
            })
            block = []
            for bp in union_block:
                for u in cls._solve_bgp(rows, [bp]):
                    block.append({v: u.get(v) for v in block_vars})
            nxt = []
            for b in sols:
                for u in block:
                    shared = [v for v in block_vars if v in b]
                    if all(
                        b[v] is None or u[v] is None or b[v] == u[v]
                        for v in shared
                    ):
                        merged = dict(b)
                        for v in block_vars:
                            if merged.get(v) is None:
                                merged[v] = u[v]
                        nxt.append(merged)
            sols = nxt
        if values_spec is not None:
            vvars, vrows = values_spec
            nxt = []
            for b in sols:
                for vr in vrows:
                    u = dict(zip(vvars, vr))
                    if all(
                        b.get(v) is None or u[v] is None or b[v] == u[v]
                        for v in vvars if v in b
                    ):
                        merged = dict(b)
                        for v in vvars:
                            if merged.get(v) is None:
                                merged[v] = u[v]
                        nxt.append(merged)
            sols = nxt
        if minus_pat is not None:
            sols = cls._naive_minus(rows, sols, minus_pat)
        if exists_spec is not None:
            sols = cls._naive_exists(rows, sols, *exists_spec)
        for new_var, src_var, suffix in binds:
            sols = [
                {**b, new_var: (None if b.get(src_var) is None
                                else b[src_var] + suffix)}
                for b in sols
            ]
        for var, op, const in filters:
            import operator as _op

            f = {"=": _op.eq, "!=": _op.ne, "<": _op.lt, ">": _op.gt}[op]
            sols = [
                b for b in sols
                if b.get(var) is not None and f(b[var], const)
            ]
        if distinct:
            seen, out = set(), []
            for b in sols:
                key = tuple(sorted(b.items(), key=lambda kv: kv[0]))
                if key not in seen:
                    seen.add(key)
                    out.append(b)
            sols = out
        return sols

    # ---- strategies ----

    @staticmethod
    def _term(draw, pool, vars_, p_var):
        import hypothesis.strategies as _st

        if draw(_st.floats(0, 1)) < p_var:
            return "?" + draw(_st.sampled_from(vars_))
        return draw(_st.sampled_from(pool))

    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_engine_equals_naive(self, spark, data):
        from kgc.graph import _finish_select, _solve_where

        draw = data.draw
        rows = draw(
            st.lists(
                st.tuples(
                    st.sampled_from(self._SUBS),
                    st.sampled_from(self._PREDS),
                    st.sampled_from(self._OBJS),
                ),
                min_size=0, max_size=10,
            )
        )
        vars_ = ["a", "b", "c"]
        p1 = (
            self._term(draw, self._SUBS, vars_[:1], 0.8),
            draw(st.sampled_from(self._PREDS)),
            self._term(draw, self._OBJS, vars_[1:2], 0.8),
        )
        req_vars = [t[1:] for t in p1 if t.startswith("?")]
        if not req_vars:
            # keep the group connectable: force one variable
            p1 = (p1[0], p1[1], "?b")
            req_vars = ["b"]
        required = [p1]
        if draw(st.booleans()):
            shared = draw(st.sampled_from(req_vars))
            p2 = (
                "?" + shared,
                draw(st.sampled_from(self._PREDS)),
                self._term(draw, self._OBJS, ["c"], 0.7),
            )
            required.append(p2)
            req_vars = sorted({
                t[1:] for p in required for t in p if t.startswith("?")
            })
        optionals = []
        if draw(st.booleans()):
            shared = draw(st.sampled_from(req_vars))
            optionals.append((
                "?" + shared, draw(st.sampled_from(self._PREDS)), "?optv",
            ))
        all_vars = req_vars + (["optv"] if optionals else [])
        union_block = None
        if draw(st.booleans()):
            # each branch shares >= 1 var with the solution; the shared
            # var may be the OPTIONAL one (nullable -> compat join)
            branches = []
            for _ in range(2):
                shared = draw(st.sampled_from(all_vars))
                branches.append((
                    "?" + shared,
                    draw(st.sampled_from(self._PREDS)),
                    self._term(draw, self._OBJS, ["u"], 0.5),
                ))
            union_block = branches
        values_spec = None
        if draw(st.booleans()):
            vvars = [draw(st.sampled_from(all_vars))]
            vrows = draw(
                st.lists(
                    st.tuples(
                        st.one_of(st.none(), st.sampled_from(self._OBJS))
                    ),
                    min_size=1, max_size=3,
                )
            )
            values_spec = (vvars, vrows)
        binds = []
        if draw(st.booleans()):
            binds.append((
                "bv", draw(st.sampled_from(all_vars)), "_sfx",
            ))
        distinct = draw(st.booleans())
        minus_pat = None
        if draw(st.booleans()):
            shared = draw(st.sampled_from(all_vars))
            minus_pat = (
                "?" + shared,
                draw(st.sampled_from(self._PREDS)),
                self._term(draw, self._OBJS, ["m"], 0.5),
            )
        exists_spec = None
        if draw(st.booleans()):
            shared = draw(st.sampled_from(all_vars))
            exists_spec = (
                draw(st.booleans()),
                (
                    "?" + shared,
                    draw(st.sampled_from(self._PREDS)),
                    self._term(draw, self._OBJS, ["x"], 0.5),
                ),
            )
        filters = []
        if draw(st.booleans()):
            filters.append((
                draw(st.sampled_from(req_vars)),
                draw(st.sampled_from(["=", "!=", "<", ">"])),
                draw(st.sampled_from(self._OBJS)),
            ))

        df = spark.createDataFrame(
            rows or [("zz", "zz", "zz")],  # createDataFrame needs >=1 row
            "subj string, pred string, obj string",
        )
        if not rows:
            df = df.filter("subj <> 'zz'")
        q = {
            "select": None, "distinct": distinct,
            "patterns": required, "optional": list(optionals),
            "optional_groups": [], "filters": [
                ("cmp", "?" + v, op, c) for v, op, c in filters
            ],
            "order": [], "limit": None, "offset": None,
            "unions": [[([b], []) for b in union_block]] if union_block else [],
            "minus": [([minus_pat], [])] if minus_pat is not None else [],
            "values": [values_spec] if values_spec is not None else [],
            "exists": [
                (exists_spec[0], [exists_spec[1]], [])
            ] if exists_spec is not None else [],
            "binds": [
                (nv, ("fn", "CONCAT", [("var", sv), ("lit", sfx)]))
                for nv, sv, sfx in binds
            ],
            "subqueries": [],
        }
        sol, nullable = _solve_where(df, q)
        sol, _ = _finish_select(sol, q, nullable)
        def keyed(rows_):
            return sorted(
                rows_,
                key=lambda t: [(k, v is None, v or "") for k, v in t],
            )

        got = keyed(
            tuple(sorted(r.asDict().items())) for r in sol.collect()
        )
        want_rows = self._naive(
            rows, required, optionals, union_block, values_spec,
            minus_pat, exists_spec, binds, distinct, filters,
        )
        cols = set(sol.columns)
        want = keyed(
            tuple(sorted((k, v) for k, v in b.items() if k in cols))
            for b in want_rows
        )
        assert got == want, (rows, q, got, want)


class TestPathDifferential:
    """Differential testing of the property-path expansion: every path
    form evaluated by the engine (sparql_query text → _expand_property_
    paths) AND by a naive closure/composition evaluator, compared as
    solution MULTISETS (closure forms are distinct-pair per SPARQL ALP
    semantics; bag forms — inverse/alternation/negation/sequences —
    preserve input multiplicity)."""

    _SUBS = ["s0", "s1", "s2"]
    _PREDS = ["p0", "p1"]
    _OBJS = ["o0", "s0", "s1", "s2"]  # heavy overlap → real chains/cycles

    @classmethod
    def _naive_path(cls, rows, form):
        def E(p):
            return [(s, o) for s, pr, o in rows if pr == p]

        terms = sorted({t for s, _, o in rows for t in (s, o)})
        ident = [(t, t) for t in terms]

        def close_set(pairs):
            got = set(pairs)
            while True:
                new = {
                    (a, d) for (a, b) in got for (c, d) in got if b == c
                } - got
                if not new:
                    return sorted(got)
                got |= new

        def compose_set(e1, e2):
            return sorted({
                (a, d) for (a, b) in set(e1) for (c, d) in set(e2) if b == c
            })

        if form == "plus":
            return "p0+", close_set(E("p0"))
        if form == "star":
            return "p0*", close_set(E("p0")) + ident
        if form == "opt":
            return "p0?", E("p0") + ident
        if form == "inv":
            return "^p0", [(o, s) for s, o in E("p0")]
        if form == "alt":
            return "p0|p1", [
                (s, o) for s, p, o in rows if p in ("p0", "p1")
            ]
        if form == "neg":
            return "!(p0)", [(s, o) for s, p, o in rows if p != "p0"]
        if form == "seq":
            return "p0/p1", [
                (a, d) for a, b in E("p0") for c, d in E("p1") if b == c
            ]
        if form == "seqinv":
            inv = [(o, s) for s, o in E("p0")]
            return "^p0/p1", [
                (a, d) for a, b in inv for c, d in E("p1") if b == c
            ]
        comp = compose_set(E("p0"), E("p1"))
        if form == "gplus":
            return "(p0/p1)+", close_set(comp)
        if form == "gstar":
            return "(p0/p1)*", close_set(comp) + ident
        return "(p0/p1)?", comp + ident  # gopt

    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_path_engine_equals_naive(self, spark, data):
        from kgc.graph import sparql_query

        draw = data.draw
        rows = draw(
            st.lists(
                st.tuples(
                    st.sampled_from(self._SUBS),
                    st.sampled_from(self._PREDS),
                    st.sampled_from(self._OBJS),
                ),
                min_size=0, max_size=8,
            )
        )
        form = draw(st.sampled_from([
            "plus", "star", "opt", "inv", "alt", "neg", "seq", "seqinv",
            "gplus", "gstar", "gopt",
        ]))
        path_txt, pairs = self._naive_path(rows, form)
        s_t = draw(st.sampled_from(["?s", "s0", "s1"]))
        o_t = draw(st.sampled_from(["?o", "o0", "s0"]))
        if not s_t.startswith("?") and not o_t.startswith("?"):
            o_t = "?o"  # keep >= 1 variable
        df = spark.createDataFrame(
            rows or [("zz", "zz", "zz")],
            "subj string, pred string, obj string",
        )
        if not rows:
            df = df.filter("subj <> 'zz'")
        sol = sparql_query(
            df, f"SELECT * WHERE {{ {s_t} {path_txt} {o_t} }}"
        )
        want = pairs
        if not s_t.startswith("?"):
            want = [(a, b) for a, b in want if a == s_t]
        if not o_t.startswith("?"):
            want = [(a, b) for a, b in want if b == o_t]
        proj = []
        for a, b in want:
            row = {}
            if s_t.startswith("?"):
                row["s"] = a
            if o_t.startswith("?"):
                row["o"] = b
            proj.append(tuple(sorted(row.items())))
        got = sorted(
            tuple(sorted(r.asDict().items())) for r in sol.collect()
        )
        assert got == sorted(proj), (rows, form, s_t, o_t, got, proj)


class TestAggregateDifferential:
    """Differential testing of sparql_aggregate: random rows, one
    grouped pattern, the full aggregate menu (incl. COUNT DISTINCT,
    sorted GROUP_CONCAT with separator, an expression aggregate, and
    HAVING) vs a naive per-group evaluator."""

    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["s0", "s1", "s2"]),
                st.sampled_from(["p0", "p1"]),
                st.sampled_from(["o0", "o1", "oo22"]),
            ),
            min_size=0, max_size=12,
        ),
        st.booleans(),
    )
    @settings(max_examples=30, deadline=None)
    def test_aggregate_engine_equals_naive(self, spark, rows, having):
        from kgc.graph import sparql_aggregate

        df = spark.createDataFrame(
            rows or [("zz", "zz", "zz")],
            "subj string, pred string, obj string",
        )
        if not rows:
            df = df.filter("subj <> 'zz'")
        text = (
            "SELECT ?g (COUNT(?v) AS ?n) (COUNT(DISTINCT ?v) AS ?nd) "
            "(MIN(?v) AS ?mn) (MAX(?v) AS ?mx) "
            '(GROUP_CONCAT(?v; SEPARATOR=",") AS ?cc) '
            "(SUM(STRLEN(?v)) AS ?sl) "
            "WHERE { ?g p0 ?v } GROUP BY ?g"
        )
        if having:
            text += " HAVING (?n >= 2)"
        got = sorted(
            (r.g, r.n, r.nd, r.mn, r.mx, r.cc, int(r.sl))
            for r in sparql_aggregate(df, text).collect()
        )
        groups: dict = {}
        for s, p, o in rows:
            if p == "p0":
                groups.setdefault(s, []).append(o)
        want = sorted(
            (
                g, len(vs), len(set(vs)), min(vs), max(vs),
                ",".join(sorted(vs)), sum(len(v) for v in vs),
            )
            for g, vs in groups.items()
            if not having or len(vs) >= 2
        )
        assert got == want, (rows, got, want)


class TestSubqueryConstructDifferential:
    """Differential coverage for the two remaining compiled forms:
    aggregate subqueries joined into the outer group, and CONSTRUCT
    template instantiation (NULL-dropping, RDF set semantics)."""

    _ROWS = st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.sampled_from(["p0", "p1"]),
            st.sampled_from(["o0", "o1", "s0"]),
        ),
        min_size=0, max_size=10,
    )

    @staticmethod
    def _df(spark, rows):
        df = spark.createDataFrame(
            rows or [("zz", "zz", "zz")],
            "subj string, pred string, obj string",
        )
        return df.filter("subj <> 'zz'") if not rows else df

    @given(_ROWS)
    @settings(max_examples=30, deadline=None)
    def test_aggregate_subquery_equals_naive(self, spark, rows):
        from kgc.graph import sparql_query

        sol = sparql_query(
            self._df(spark, rows),
            "SELECT ?a ?v ?n WHERE { ?a p1 ?v "
            "{ SELECT ?a (COUNT(?x) AS ?n) WHERE { ?a p0 ?x } "
            "GROUP BY ?a } }",
        ).collect()
        got = sorted((r.a, r.v, r.n) for r in sol)
        counts: dict = {}
        for s, p, o in rows:
            if p == "p0":
                counts[s] = counts.get(s, 0) + 1
        want = sorted(
            (s, o, counts[s]) for s, p, o in rows
            if p == "p1" and s in counts
        )
        assert got == want, (rows, got, want)

    @given(_ROWS, st.booleans())
    @settings(max_examples=30, deadline=None)
    def test_construct_equals_naive(self, spark, rows, with_opt):
        from kgc.graph import sparql_construct

        text = "CONSTRUCT { ?a derived ?v . ?v origin ?a } WHERE { ?a p0 ?v"
        if with_opt:
            # optional var in the template: unmatched rows drop that
            # instantiation (spec), matched ones emit it
            text = (
                "CONSTRUCT { ?a derived ?v . ?a extra ?w } "
                "WHERE { ?a p0 ?v OPTIONAL { ?a p1 ?w }"
            )
        got = sorted(
            (r.subj, r.pred, r.obj)
            for r in sparql_construct(self._df(spark, rows), text + " }")
            .collect()
        )
        base = [(s, o) for s, p, o in rows if p == "p0"]
        trip = set()
        if with_opt:
            p1 = {}
            for s, p, o in rows:
                if p == "p1":
                    p1.setdefault(s, []).append(o)
            for a, v in base:
                trip.add((a, "derived", v))
                for w in p1.get(a, []):
                    trip.add((a, "extra", w))
        else:
            for a, v in base:
                trip.add((a, "derived", v))
                trip.add((v, "origin", a))
        assert got == sorted(trip), (rows, got, trip)
