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
