"""ARD (Alignment Research Dataset) JSONL source.

The reference ingests ARD records — JSONL with schema ``{title,
authors, date_published, text, abstract, url}`` identical across all 12
example sources (``data/raw/ard_examples/*.jsonl.example.json``) — via a
gzip-aware line iterator (``merge.py:11-20`` ``iter_jsonl``:
suffix-dispatch gzip.open vs open, skip blank lines).

Here the same records become the interleaved-doc table (DOCS_SCHEMA):
``ray.data.read_json`` streams the lines (Arrow's JSON reader handles
``.gz`` transparently and skips blank lines for free, SURVEY.md S3/F3);
a vectorized map converts each record to a document whose text is one
text span per paragraph, with ``doc_id`` derived from the record's url
or index (the ARD analogue of the filename-stem paper_id,
``extract.py:68``).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import ray.data as rd

from ..schemas import DOCS_SCHEMA

_SLUG_RE = re.compile(r"[^a-z0-9]+")


def _slug(url: str, title: str, idx: int) -> str:
    base = url or title or f"record_{idx}"
    s = _SLUG_RE.sub("_", base.lower()).strip("_")
    return s[-64:] if s else f"record_{idx}"


def ard_records_to_docs(batch: pa.Table) -> pa.Table:
    """ARD record batch -> DOCS_SCHEMA batch (one text span per paragraph)."""
    names = batch.column_names

    def col(name, default=""):
        if name in names:
            return batch.column(name).to_pylist()
        return [default] * batch.num_rows

    titles = col("title")
    texts = col("text")
    urls = col("url")
    # ISO dates are strings in the data model (SURVEY.md §1.2: never
    # parsed); Arrow's JSON reader may have inferred timestamps
    dates = [d if isinstance(d, str) else (str(d) if d is not None else "unknown")
             for d in col("date_published", "unknown")]
    authors = col("authors", None)
    rows = []
    for i in range(batch.num_rows):
        text = texts[i] or ""
        paragraphs = [p.strip() for p in text.split("\n") if p.strip()] or [""]
        doc_id = _slug(urls[i] or "", titles[i] or "", i)
        spans = [
            {"kind": "text", "text": p, "media_ref": "", "offset": j}
            for j, p in enumerate(paragraphs)
        ]
        rows.append({
            "doc_id": doc_id,
            "spans": spans,
            "title": titles[i] or "",
            "authors": list(authors[i]) if authors and authors[i] else [],
            "date_published": dates[i] or "unknown",
            "url": urls[i] or "",
        })
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def read_ard_jsonl(paths: str | list[str], **kwargs) -> rd.Dataset:
    """Read ARD JSONL (plain or .gz) into the interleaved-doc table."""
    ds = rd.read_json(paths, **kwargs)
    return ds.map_batches(ard_records_to_docs, batch_format="pyarrow",
                          batch_size=512)


def write_ard_jsonl(rows: list[dict], path: str) -> None:
    """Fixture helper: write ARD-shaped records (gzip if path ends .gz)."""
    import gzip

    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
