"""Document ingestion tests: jsonl/csv/parquet corpora → tokenized TOKB
blocks, token-identical to applying the tokenizer directly."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from tokcodec.functions.text import tokenize
from tokcodec.pipelines.ingest import ingest_documents
from tokcodec.sources.sink import read_tokb

DOCS = [
    {"doc_id": "a1", "text": "the quick brown fox", "source": "web"},
    {"doc_id": "b2", "text": "jumps over the lazy dog", "source": "book"},
    {"doc_id": "c3", "text": "", "source": "web"},
    {"doc_id": "d4", "text": "pack my box with five dozen jugs", "source": "web"},
]


def _expected() -> pa.Table:
    batch = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in DOCS]),
            "text": pa.array([d["text"] for d in DOCS]),
            "source": pa.array([d["source"] for d in DOCS]),
        }
    )
    return tokenize(batch)


def _read_back(out_dir: str) -> pa.Table:
    got = read_tokb(out_dir).to_arrow_refs()
    import ray

    tabs = [ray.get(r) for r in got]
    return pa.concat_tables(tabs).sort_by("doc_id")


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "parquet"])
def test_ingest_formats_token_identical(ray_session, tmp_path, fmt):
    src = tmp_path / f"docs.{fmt}"
    if fmt == "jsonl":
        src.write_text("\n".join(json.dumps(d) for d in DOCS) + "\n")
    elif fmt == "csv":
        pacsv.write_csv(
            pa.table(
                {
                    "doc_id": [d["doc_id"] for d in DOCS],
                    "text": [d["text"] for d in DOCS],
                    "source": [d["source"] for d in DOCS],
                }
            ),
            str(src),
        )
    else:
        pq.write_table(
            pa.table(
                {
                    "doc_id": [d["doc_id"] for d in DOCS],
                    "text": [d["text"] for d in DOCS],
                    "source": [d["source"] for d in DOCS],
                }
            ),
            str(src),
        )
    out = str(tmp_path / "out")
    summary = ingest_documents(str(src), out, fmt=fmt)
    assert summary["rows"] == len(DOCS)
    got = _read_back(out)
    want = _expected().sort_by("doc_id")
    assert got.select(want.column_names).equals(want)


def test_ingest_files_one_doc_per_file(ray_session, tmp_path):
    """fmt="files": one document per file, doc_id = path relative to
    the input root, source = "unknown" (no source column exists),
    token-identical to tokenizing the same texts directly; a non-utf8
    byte degrades to U+FFFD instead of killing the run."""
    src = tmp_path / "corpus"
    src.mkdir()
    for d in DOCS:
        (src / f"{d['doc_id']}.txt").write_text(d["text"])
    (src / "z9.txt").write_bytes(b"bad \xff byte")
    # same BASENAME in two subdirectories: ids are root-relative paths,
    # so these are distinct docs, not a silent doc_id collision
    for sub, body in (("a", "alpha body"), ("b", "beta body")):
        (src / sub).mkdir()
        (src / sub / "dup.txt").write_text(body)
    out = str(tmp_path / "out_files")
    summary = ingest_documents(str(src), out, fmt="files")
    assert summary["rows"] == len(DOCS) + 3
    got = _read_back(out)
    want_batch = pa.table(
        {
            "doc_id": pa.array(
                [f"{d['doc_id']}.txt" for d in DOCS]
                + ["z9.txt", "a/dup.txt", "b/dup.txt"]
            ),
            "text": pa.array(
                [d["text"] for d in DOCS]
                + ["bad � byte", "alpha body", "beta body"]
            ),
        }
    )
    want = tokenize(want_batch).sort_by("doc_id")
    assert got.select(want.column_names).equals(want)
    assert got.column("source").to_pylist() == ["unknown"] * (len(DOCS) + 3)


def test_ingest_missing_text_col_fails_fast(ray_session, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text('{"doc_id": "x", "body": "hello"}\n')
    with pytest.raises(ValueError, match="missing required column 'text'"):
        ingest_documents(str(src), str(tmp_path / "out"))


def test_ingest_int_ids_become_strings(ray_session, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text('{"doc_id": 7, "text": "seven lucky words here"}\n')
    out = str(tmp_path / "out")
    ingest_documents(str(src), out)
    got = _read_back(out)
    assert got.column("doc_id").to_pylist() == ["7"]
    assert got.column("source").to_pylist() == ["unknown"]


def test_ingest_refuses_used_out_dir(ray_session, tmp_path):
    """Block names key on executor task ids — re-ingesting over a used
    dir would leave the first run's extra blocks in place and decode
    would mix both corpora."""
    src = tmp_path / "docs.jsonl"
    src.write_text('{"doc_id": "a", "text": "hello world"}\n')
    out = str(tmp_path / "out")
    ingest_documents(str(src), out)
    with pytest.raises(ValueError, match="fresh directory"):
        ingest_documents(str(src), out)
