"""Golden JSON-LD fixtures → canonical triples (+ raw-response replay store).

The reference commits real end-to-end outputs (`test/*.jsonld`,
`{"@context": "https://schema.org", "@graph": [...]}` per
cmd/cli/main.go:205-208).  We normalize each `@graph` node into typed
triples (doc_id, seg_id, subj, pred, obj, obj_type) — every key/value is
one triple; nested objects become deterministic blank nodes
(SURVEY.md §1.5).

For P/R evaluation the pipeline needs the *pre-normalization* view: what
the LLM returned before converter.go:250-369 reshaped it.  `raw_props`
inverts that normalization (mentions lose their injected @type,
events/timeline startDate→date, keywords string→list, timeline
ItemList→flat event list, author Person→string) so the Spark E3 stage is
genuinely exercised: it must re-normalize the raw shapes back into
exactly the golden triples.
"""

from __future__ import annotations

import json
import pathlib
import re
from typing import Any

GOLDEN_DIR = pathlib.Path("/root/reference/test")
GOLDEN_FILES = {
    "analyzed_transcription.txt": GOLDEN_DIR / "analyzed_transcription.txt.jsonld",
    "jean1.pdf": GOLDEN_DIR / "jean1.pdf.jsonld",
}

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_DATE_PREDS = {"startDate", "datePublished"}


def is_valid_date(s: str) -> bool:
    """isValidDate twin (converter.go:377-380): time.Parse('2006-01-02')."""
    if not isinstance(s, str) or not _DATE_RE.match(s):
        return False
    y, m, d = int(s[:4]), int(s[5:7]), int(s[8:10])
    if not (1 <= m <= 12):
        return False
    days = [31, 29 if (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)) else 28,
            31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1]
    return 1 <= d <= days


def seg_subject(doc_id: str, seg_id: int) -> str:
    return f"seg:{doc_id}#{seg_id}"


def flatten_node(
    doc_id: str, seg_id: int, node: dict[str, Any]
) -> list[tuple[str, int, str, str, str, str]]:
    """One @graph node → triples.  Blank-node ids are path-deterministic
    so the Spark normalizer can reproduce them exactly."""
    out: list[tuple[str, int, str, str, str, str]] = []
    subj = seg_subject(doc_id, seg_id)

    def emit(s: str, p: str, o: Any) -> None:
        if isinstance(o, bool):
            out.append((doc_id, seg_id, s, p, "true" if o else "false", "literal"))
        elif isinstance(o, (int, float)):
            o = int(o) if isinstance(o, float) and o.is_integer() else o
            out.append((doc_id, seg_id, s, p, str(o), "literal"))
        elif isinstance(o, str):
            if o == "":
                return  # converter.go:363-369 drops empties
            t = "date" if p in _DATE_PREDS and is_valid_date(o) else "literal"
            out.append((doc_id, seg_id, s, p, o, t))
        elif isinstance(o, dict):
            b = f"{s}/{p}"
            out.append((doc_id, seg_id, s, p, b, "node"))
            for k, v in o.items():
                if k == "@context":
                    continue
                emit(b, k, v)
        elif isinstance(o, list):
            for i, item in enumerate(o):
                if isinstance(item, dict):
                    b = f"{s}/{p}/{i}"
                    out.append((doc_id, seg_id, s, p, b, "node"))
                    for k, v in item.items():
                        if k == "@context":
                            continue
                        emit(b, k, v)
                else:
                    emit(s, p, item)

    for key, val in node.items():
        if key == "@context":
            continue
        emit(subj, key, val)
    return out


def load_golden_triples(name: str) -> list[tuple[str, int, str, str, str, str]]:
    data = json.loads(GOLDEN_FILES[name].read_text(encoding="utf-8"))
    triples: list[tuple[str, int, str, str, str, str]] = []
    for seg_id, node in enumerate(data["@graph"]):
        triples.extend(flatten_node(name, seg_id, node))
    return triples


# ----------------------------------------------------- inverse-normalize ---
def raw_props(node: dict[str, Any]) -> dict[str, Any]:
    """Invert converter.go:250-369 on one golden node → the raw LLM
    response shape that extractProperties parsed."""
    raw: dict[str, Any] = {}
    for key, val in node.items():
        if key in ("@context", "@type"):
            continue
        if key in ("mentions", "locations"):
            raw[key] = [
                {k: v for k, v in m.items() if k != "@type"} for m in val
            ]
        elif key == "events":
            raw[key] = [
                {
                    **{k: v for k, v in e.items() if k not in ("@type", "startDate")},
                    **({"date": e["startDate"]} if "startDate" in e else {}),
                }
                for e in val
            ]
        elif key == "timeline":
            items = val.get("itemListElement", []) if isinstance(val, dict) else val
            raw[key] = [
                {
                    **{
                        k: v
                        for k, v in li.get("item", {}).items()
                        if k not in ("@type", "startDate")
                    },
                    **(
                        {"date": li["item"]["startDate"]}
                        if isinstance(li.get("item"), dict) and "startDate" in li["item"]
                        else {}
                    ),
                }
                for li in items
            ]
        elif key == "keywords":
            raw[key] = [k for k in val.split(", ")] if isinstance(val, str) else val
        elif key == "author":
            raw[key] = val.get("name") if isinstance(val, dict) else val
        else:
            raw[key] = val
    return raw


def load_pdf_page_spans(name: str = "jean1.pdf") -> list[dict[str, Any]]:
    """Reconstructed page spans for the PDF fixture (R8, pdf.go:38-52).

    Page i = the i-th @graph node's top-level string fields joined in
    sorted-key order — a deterministic page-shaped stand-in corpus
    that does not depend on the 964 KB binary.  The REAL raw-byte
    decode lives in kgc.pdf (pure-stdlib extractor); q_golden_pr_pdf
    and parsers.pdf_to_spans use it — this reconstruction remains for
    the packer-alignment unit test.
    """
    data = json.loads(GOLDEN_FILES[name].read_text(encoding="utf-8"))
    spans = []
    for i, node in enumerate(data["@graph"]):
        text = " ".join(
            v
            for k, v in sorted(node.items())
            if isinstance(v, str) and not k.startswith("@")
        )
        spans.append(
            {
                "kind": "pdf_page",
                "text": text,
                "media_ref": f"{name}#page={i + 1}",
                "offset": i,
            }
        )
    return spans


def load_replay_store(name: str) -> list[dict[str, Any]]:
    """[{doc_id, seg_id, main_type, props_json}] — the 'cached LLM'
    extraction store for deterministic replay (SURVEY.md §7 phase 1)."""
    data = json.loads(GOLDEN_FILES[name].read_text(encoding="utf-8"))
    rows = []
    for seg_id, node in enumerate(data["@graph"]):
        rows.append(
            {
                "doc_id": name,
                "seg_id": seg_id,
                "main_type": node.get("@type", "Thing"),
                "props_json": json.dumps(raw_props(node), ensure_ascii=False),
            }
        )
    return rows
