"""Unit tests for tokenizer + segmenter reference parity.

Each flush-rule branch of segmenter.go:27-104 gets its own test
(SURVEY.md §7 'What's hard').
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kgc.segment import segment_document_py, split_large_element_py, segment_documents
from kgc.tokenizer import count_tokens, count_tokens_py, split_tokens, split_tokens_py


def _spans(*texts, kind="paragraph"):
    return [
        {"kind": kind, "text": t, "media_ref": None, "offset": i}
        for i, t in enumerate(texts)
    ]


class TestTokenizerPy:
    def test_count_tokens(self):
        assert count_tokens_py("a b  c") == 3
        assert count_tokens_py("  ") == 0
        assert count_tokens_py("") == 0
        assert count_tokens_py(None) == 0
        assert count_tokens_py("mot\tmot\nmot") == 3

    def test_split_tokens_punct_is_category_P_only(self):
        # Go unicode.IsPunct: '.' ',' '-' are P; '$' '+' '=' are S (kept).
        assert split_tokens_py("a.b,c-d") == ["a", "b", "c", "d"]
        assert split_tokens_py("x$y+z=w") == ["x$y+z=w"]
        assert split_tokens_py("l'arrêt, dit-il.") == ["l", "arrêt", "dit", "il"]
        assert split_tokens_py("") == []


class TestTokenizerSpark:
    def test_matches_python(self, spark):
        # trailing '\n'/'\t' regression: Spark trim strips only ASCII
        # spaces, so the old split(trim(x)) count read "hello world\n"
        # as 3 tokens (phantom '' element)
        texts = ["a b  c", "", "  ", "l'arrêt, dit-il.", "x$y+z=w", "a.b,c-d", None,
                 "hello world\n", "\ttabbed lead", "mid\nnewline\n", " \n\t "]
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        rows = df.select(
            count_tokens("t").alias("n"), split_tokens("t").alias("toks")
        ).collect()
        for t, r in zip(texts, rows):
            assert r["n"] == count_tokens_py(t), t
            assert r["toks"] == split_tokens_py(t), t


class TestSegmenterBranches:
    def test_simple_pack(self):
        segs = segment_document_py(_spans("a b", "c d", "e"), max_tokens=10)
        assert len(segs) == 1
        assert segs[0]["seg_text"] == "a b\nc d\ne\n"
        assert segs[0]["span_ids"] == [0, 1, 2]
        assert segs[0]["n_tokens"] == 5

    def test_overflow_flushes_then_starts_fresh(self):
        # segmenter.go:39-50: 2nd span overflows → flush ['a b'], fresh buf
        segs = segment_document_py(_spans("a b", "c d e"), max_tokens=4)
        assert [s["seg_text"] for s in segs] == ["a b\n", "c d e\n"]

    def test_exact_budget_flushes_immediately(self):
        # segmenter.go:57-64: buffer reaching == max flushes at once
        segs = segment_document_py(_spans("a b", "c d", "e f"), max_tokens=4)
        assert [s["seg_text"] for s in segs] == ["a b\nc d\n", "e f\n"]
        assert segs[0]["n_tokens"] == 4

    def test_oversized_does_not_flush_open_buffer(self):
        # segmenter.go:35-38: chunks of the big span appear BEFORE the
        # still-open buffer's flush.
        big = " ".join(f"w{i}" for i in range(7))
        segs = segment_document_py(_spans("a b", big, "c"), max_tokens=5)
        texts = [s["seg_text"] for s in segs]
        assert texts[0] == "w0 w1 w2 w3 w4 "
        assert texts[1] == "w5 w6 "
        assert texts[2] == "a b\nc\n"  # buffer kept accumulating across
        assert segs[0]["meta_type"] == "paragraph"
        assert segs[2]["meta_type"] is None

    def test_split_chunks_word_budget(self):
        chunks = split_large_element_py("a b c d e f g", "page", 3)
        assert [c["text"] for c in chunks] == ["a b c ", "d e f ", "g "]

    def test_split_byte_advance_multibyte(self):
        # accented chars are 2 UTF-8 bytes; advance is byte-based
        text = "é é é é"
        chunks = split_large_element_py(text, "paragraph", 2)
        assert [c["text"] for c in chunks] == ["é é ", "é é "]

    def test_empty_spans_contribute_newline(self):
        segs = segment_document_py(_spans("", "a"), max_tokens=10)
        assert segs[0]["seg_text"] == "\na\n"

    def test_media_spans_cost_zero(self):
        spans = [
            {"kind": "paragraph", "text": "a b", "media_ref": None, "offset": 0},
            {"kind": "image", "text": None, "media_ref": "blob://x", "offset": 1},
            {"kind": "paragraph", "text": "c", "media_ref": None, "offset": 2},
        ]
        segs = segment_document_py(spans, max_tokens=10)
        assert len(segs) == 1
        assert segs[0]["span_ids"] == [0, 1, 2]
        assert segs[0]["seg_text"] == "a b\n\nc\n"

    def test_every_segment_within_budget(self):
        # property: n_tokens <= max for all packed segments
        import random

        rng = random.Random(7)
        for _ in range(50):
            spans = _spans(
                *(
                    " ".join("w" for _ in range(rng.randint(0, 12)))
                    for _ in range(rng.randint(0, 15))
                )
            )
            for s in segment_document_py(spans, max_tokens=8):
                assert s["n_tokens"] <= 8


class TestSegmenterSpark:
    def test_spark_matches_python(self, spark):
        from kgc.synth import generate_documents

        docs = generate_documents(spark, n_docs=40, seed=7).cache()
        out = segment_documents(docs, max_tokens=30)
        got = {
            (r["doc_id"], r["seg_id"]): (r["seg_text"], tuple(r["span_ids"]))
            for r in out.collect()
        }
        for row in docs.collect():
            spans = [s.asDict() for s in row["spans"]]
            for seg in segment_document_py(spans, max_tokens=30):
                key = (row["doc_id"], seg["seg_id"])
                assert key in got
                assert got[key] == (seg["seg_text"], tuple(seg["span_ids"]))
        # equal cardinality → exact match both ways
        n_py = sum(
            len(segment_document_py([s.asDict() for s in r["spans"]], 30))
            for r in docs.collect()
        )
        assert len(got) == n_py
